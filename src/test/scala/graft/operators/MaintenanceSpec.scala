package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestHarness

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.sfDir

  private def op(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("events_dedup_window: kept bounded by events; window boundary splits correctly") {
    val out = op("events_dedup_window").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (t, n, kept) =>
      assert(kept >= 1 && kept <= n, s"$t: kept=$kept of $n")
    }
    // Constructed frame (same window arithmetic as the op, applied to a
    // local dataset): 3 events inside one 5-minute window + 1 just past the
    // boundary => 2 survivors.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = Seq(
      (1L, "2024-01-01 00:00:10", 7L, "click"),
      (2L, "2024-01-01 00:01:10", 7L, "click"),
      (3L, "2024-01-01 00:04:59", 7L, "click"),
      (4L, "2024-01-01 00:05:01", 7L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type", "win").orderBy(col("ts"), col("event_id"))
    val kept = e
      .withColumn("win", expr("unix_micros(cast(ts as timestamp)) div 300000000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("pipeline_compact_plan: bins partition all files, rows conserved") {
    val out = op("pipeline_compact_plan").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val totalRows = out.map(_._3).sum
    val nFiles = out.map(_._2).sum
    assert(totalRows == spark.table("documents").count())
    assert(nFiles >= 1 && out.map(_._1).distinct.length == out.length)
    // every bin except possibly the last holds >= target-worth of rows once
    // its last file lands (greedy cumulative packing: bin changes only after
    // the running total crosses a 120-row boundary)
    assert(out.sortBy(_._1).init.forall(_._3 >= 1))
  }

  test("agg_key_skew: report fields are internally consistent") {
    val r = op("agg_key_skew").collect()(0)
    val (nKeys, total, maxCnt, p50, p99, skew) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nKeys > 0 && total >= nKeys)
    assert(p50 <= p99 && p99 <= maxCnt)
    assert(skew == maxCnt * 1000L * nKeys / total)
    assert(skew >= 1000L) // max >= avg always
  }
}
