package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestHarness

class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("bucketed tables join without a shuffle exchange") {
    graft.Tables.ensure(spark, SparkTestHarness.sfDir)
    spark.sql("DROP TABLE IF EXISTS b_orders"); spark.sql("DROP TABLE IF EXISTS b_lineitem")
    ScaleTechniques.writeBucketed(
      spark.table("orders").select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    ScaleTechniques.writeBucketed(
      spark.table("lineitem").select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n${plan.take(2000)}")
      // same result as the unbucketed join
      assert(joined.count() ==
        spark.table("orders").join(spark.table("lineitem"),
          col("o_orderkey") === col("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted equi-join returns exactly the plain join result on skewed data") {
    import spark.implicits._
    // 90% of left rows share one key, and the hot rows are exact DUPLICATES
    // (content-derived salting would collapse them into one bucket).
    val left = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, if (i <= 1800) "hot" else s"v$i")).toDF("k", "v")
    val right = (1 to 2000).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "rv").collect().map(_.toString).sorted
    val salted = ScaleTechniques.saltedEquiJoin(left, right, "k", "rk", 8)
      .select("k", "v", "rv").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("row-position salting spreads duplicate hot rows across buckets") {
    import spark.implicits._
    val dupes = Seq.fill(1000)((1L, 1.0)).toDF("k", "v").repartition(4)
    val salted = ScaleTechniques.saltedAgg(dupes, "k", "v", 8)
    val out = salted.collect()
    assert(out.length == 1 && out.head.getDouble(1) == 1000.0 && out.head.getLong(2) == 1000L)
  }

  test("salted aggregation equals direct aggregation") {
    graft.Tables.ensure(spark, SparkTestHarness.sfDir)
    val li = spark.table("lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = ScaleTechniques.saltedAgg(li, "l_returnflag", "l_quantity", 8)
      .select(col("l_returnflag"), round(col("total"), 2).as("total"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
