package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques for the 100 TB posture (SURVEY.md §7.1.8): bucketed
  * co-located joins (pre-shuffle once at write time, join forever without an
  * exchange) and deterministic salting for skewed keys (AQE's skew-join
  * splitting is the first line of defense; salting is the explicit fallback
  * when one key dominates an aggregation).
  */
object ScaleTechniques {

  /** Write a DataFrame bucketed+sorted by the join key. Joining two tables
    * bucketed the same way runs shuffle-free: each task zips bucket i with
    * bucket i (verified by plan assertion in tests).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Row-unique salt in [0, n): derived from the row's physical position so
    * even fully duplicate rows (the classic skew shape — millions of copies
    * of one (key, value) pair) spread across all n buckets. Content-derived
    * hashing would give duplicates identical salts, defeating the spread.
    */
  private def rowSalt(saltBuckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int")

  /** Salted equi-join for a skewed LEFT side: left rows get a row-unique salt
    * in [0, n); the (small or uniform) right side is replicated n ways so
    * every (key, salt) partner exists. Result set is identical to the plain
    * join; the skewed key's rows now spread across n reducers instead of one.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(saltBuckets))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }

  /** Salted two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Works for any commutative
    * re-aggregatable pair (partialAgg over rows, finalAgg over partials).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, saltBuckets: Int): DataFrame =
    df.withColumn("_salt", rowSalt(saltBuckets))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial_sum"), count(lit(1)).as("_partial_cnt"))
      .groupBy(col(key))
      .agg(sum("_partial_sum").as("total"), sum("_partial_cnt").cast("long").as("cnt"))
}
