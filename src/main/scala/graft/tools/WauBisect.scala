package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** r11 verdict #7: events_wau read +8% superlinear at the 30x->100x step
  * (3.33x data -> 3.59x wall) — the only tranche op over linear. Bisect the
  * operator's three stages at N in {10, 30, 100} copies of the sf0.1 events
  * fixture (same re-keying as ScaleCheck: new users per copy):
  *
  *   act      distinct (user_id, day)            — scan + first shuffle
  *   explode  act x7 anchor days, count          — the row expansion
  *   wau      full op (join spine + countDistinct per day)
  *
  * If `wau` alone grows superlinearly the distinct-aggregate shuffle is the
  * growth term; if all three track the data, the r11 reading was fixed
  * overhead/noise. Outcome recorded in ARCHITECTURE.md.
  */
object WauBisect {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.ensure(spark, dir)
    val base = spark.table("events")

    def at(n: Int): Unit = {
      val copies = spark.range(n).select(col("id").as("copy"))
      val ev = base.crossJoin(copies)
        .withColumn("user_id", col("user_id") + col("copy") * 100000000L)
        .drop("copy").repartition(32)
        .localCheckpoint(true)
      val act = ev.select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val c = f
        println(f"[waubisect] n=$n%3d $tag%-8s wall=${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$c")
      }
      time("act")(act.count())
      time("explode")(act.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("anchor")).count())
      val spine = act.select(col("day").as("anchor")).distinct()
      time("wau")(act.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("anchor"))
        .join(broadcast(spine), "anchor")
        .groupBy(col("anchor").as("day"))
        .agg(countDistinct("user_id").as("wau"))
        .count())
      ev.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      }
    }
    at(10); at(10) // warm JIT, then measure 10 again via the 30/100 ratios
    at(30)
    at(100)
    spark.stop()
  }
}
