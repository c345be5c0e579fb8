package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestHarness
import java.time.LocalDateTime

/** Geofencing: zone tagging via the blocked spatial join (boundary rows ->
  * 'outside'), batch transition detection, and streaming parity — the
  * stateful operator must emit the same transitions when the same rows
  * arrive split across micro-batches (state carries the last zone).
  */
class GeofenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private val base = LocalDateTime.of(2024, 5, 1, 0, 0)
  private def t(minutes: Long) = java.sql.Timestamp.valueOf(base.plusMinutes(minutes))

  private def zones = {
    import spark.implicits._
    Seq(("A", 0.0, 0.0, 5.0, 5.0), ("B", 5.0, 0.0, 10.0, 5.0))
      .toDF("zone", "x1", "y1", "x2", "y2")
      .withColumn("geom", call_function("st_makeenvelope",
        col("x1"), col("y1"), col("x2"), col("y2")))
      .select("zone", "geom")
  }

  // user 1 walks A -> A -> B -> outside -> B; user 2 stays in A
  private def events = {
    import spark.implicits._
    Seq(
      (1L, t(0), 1L, 1.0, 1.0), (2L, t(1), 1L, 2.0, 2.0),
      (3L, t(2), 1L, 6.0, 1.0), (4L, t(3), 1L, 20.0, 20.0), (5L, t(4), 1L, 7.0, 3.0),
      (6L, t(0), 2L, 1.0, 1.0), (7L, t(5), 2L, 4.0, 4.0))
      .toDF("event_id", "ts", "user_id", "px", "py")
  }

  private val expected = Seq(
    (1L, 3L, "A", "B"), (1L, 4L, "B", "outside"), (1L, 5L, "outside", "B"))

  test("batch: tag via spatial join, detect per-user transitions") {
    val tagged = Geofence.tagZones(events, "event_id", col("px"), col("py"),
      zones, "zone", col("geom"), cellSize = 5.0)
    // boundary-exclusive containment: a point ON a shared zone edge is
    // 'outside' by the documented half-open convention
    val onEdge = Geofence.tagZones(
      events.limit(1).withColumn("px", lit(5.0)).withColumn("py", lit(1.0)),
      "event_id", col("px"), col("py"), zones, "zone", col("geom"), 5.0)
    assert(onEdge.collect().head.getAs[String]("zone") == "outside")
    val out = Geofence.zoneTransitions(tagged.select("user_id", "ts", "event_id", "zone"))
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getString(4))).toSeq
    assert(out == expected)
  }

  test("tagZones is a pure projection for broadcast-sized zone sets: zero exchanges (r14)") {
    import spark.implicits._
    val tagged = Geofence.tagZones(events, "event_id", col("px"), col("py"),
      zones, "zone", col("geom"), cellSize = 5.0)
    val plan = tagged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"broadcast-sized zone tagging must not shuffle events, got:\n$plan")
    // the blocked fallback (forced via cap 0) tags identically
    val viaJoin = Geofence.tagZones(events, "event_id", col("px"), col("py"),
      zones, "zone", col("geom"), cellSize = 5.0, broadcastZoneCap = 0)
    def tags(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "zone").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tags(tagged) == tags(viaJoin), "projection and blocked paths must agree")
    // overlapping zones: min zone name wins deterministically in BOTH paths
    val overlapping = Seq(("B", 0.0, 0.0, 5.0, 5.0), ("A", 0.0, 0.0, 5.0, 5.0))
      .toDF("zone", "x1", "y1", "x2", "y2")
      .withColumn("geom", call_function("st_makeenvelope",
        col("x1"), col("y1"), col("x2"), col("y2")))
      .select("zone", "geom")
    for (cap <- Seq(0, 4096)) {
      val got = Geofence.tagZones(events.where(col("event_id") === 1L),
        "event_id", col("px"), col("py"), overlapping, "zone", col("geom"),
        cellSize = 5.0, broadcastZoneCap = cap)
        .collect().head.getAs[String]("zone")
      assert(got == "A", s"cap=$cap: overlap resolves to min zone name")
    }
    // empty zone table: everything 'outside', no job beyond the metadata read
    val noZones = Geofence.tagZones(events, "event_id", col("px"), col("py"),
      zones.where(lit(false)), "zone", col("geom"), cellSize = 5.0)
    assert(noZones.select("zone").distinct().collect().map(_.getString(0)).toSeq == Seq("outside"))
  }

  test("streaming: same transitions when rows split across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val tagged = Geofence.tagZones(events, "event_id", col("px"), col("py"),
      zones, "zone", col("geom"), cellSize = 5.0)
      .select(col("user_id"), col("ts"), col("event_id"), col("zone"))
      .as[GeoTagged].collect().sortBy(_.event_id)
    val ms = MemoryStream[GeoTagged]
    val q = Geofence.transitionsStream(ms.toDS())
      .writeStream.format("memory").queryName("geo_trans").outputMode("append").start()
    try {
      // split mid-move: user 1's B-entry (event 3) lands in batch 2, so the
      // transition is only detectable via state carried from batch 1
      ms.addData(tagged.filter(_.event_id <= 2).toSeq)
      q.processAllAvailable()
      ms.addData(tagged.filter(_.event_id > 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("geo_trans")
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getString(4))).toSeq
    assert(streamed == expected, s"streaming parity: $streamed")
  }
}
