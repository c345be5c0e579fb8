package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkTestHarness, Tables}
import java.time.LocalDateTime

/** Top-level so Spark can derive an encoder. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming-batch parity: the same EventStreams transforms over (a) the
  * driver `events` fixture as a batch DataFrame and (b) a MemoryStream replay
  * of the same rows must agree (FIXTURES.md B.5).
  *
  * Append-mode streams only emit windows the watermark has passed, so each
  * replay appends a far-future sentinel event (user_id=FlushUser) that closes
  * every fixture window; the sentinel's own (still-open) windows are excluded
  * from the comparison.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val FlushUser = 999999L

  private def fixtureEvents = {
    Tables.ensure(spark, SparkTestHarness.sfDir)
    spark.table("events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  private def flushEvent(rows: Seq[Ev]): Ev = {
    val maxTs = rows.map(_.ts.getTime).max
    Ev(-1L, new java.sql.Timestamp(maxTs + 7L * 24 * 3600 * 1000), FlushUser, "flush", 0.0)
  }

  private def streamOf(rows: Seq[Ev],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String) = {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows :+ flushEvent(rows))
    EventStreams.runToMemory(spark, ms.toDF(), transform, name)
  }

  test("tumbling window: streaming result equals batch result on the fixture") {
    import spark.implicits._
    val rows = fixtureEvents.as[Ev].collect().toSeq
    val streamed = streamOf(rows, EventStreams.tumblingAgg(_, "1 hour", "1 minute"), "t_tumbling")
      .filter(col("event_type") =!= "flush").orderBy("h", "event_type").collect()
    val batch = EventStreams.tumblingAgg(fixtureEvents, "1 hour", "1 minute")
      .orderBy("h", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("session windows: streaming equals batch; sessions respect the gap") {
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    def ev(id: Long, minutes: Long, user: Long) =
      Ev(id, java.sql.Timestamp.valueOf(base.plusMinutes(minutes)), user, "click", 1.0)
    // user 1: two sessions (45-minute gap > 30); user 2: one session
    val rows = Seq(ev(1, 0, 1), ev(2, 10, 1), ev(3, 55, 1), ev(4, 0, 2), ev(5, 29, 2))
    val streamed = streamOf(rows, EventStreams.sessionAgg(_, "30 minutes", "1 minute"), "t_sessions")
      .filter(col("user_id") =!= FlushUser).orderBy("user_id", "session_start").collect()
    assert(streamed.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 2L), (1L, 1L), (2L, 2L)))
    val batch = EventStreams.sessionAgg(spark.createDataFrame(rows), "30 minutes", "1 minute")
      .orderBy("user_id", "session_start").collect()
    assert(streamed.sameElements(batch))
  }

  test("dedup within watermark removes replayed event_ids") {
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    val rows = Seq(
      Ev(1, java.sql.Timestamp.valueOf(base), 1, "click", 1.0),
      Ev(1, java.sql.Timestamp.valueOf(base.plusMinutes(1)), 1, "click", 1.0), // dup id
      Ev(2, java.sql.Timestamp.valueOf(base.plusMinutes(2)), 1, "view", 2.0))
    val out = streamOf(rows, EventStreams.dedup(_, "1 hour"), "t_dedup")
      .filter(col("user_id") =!= FlushUser)
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    def ev(id: Long, user: Long, v: Double) =
      Ev(id, java.sql.Timestamp.valueOf(base.plusMinutes(id)), user, "click", v)
    val ms = MemoryStream[Ev]
    val q = EventStreams.statefulUserTotals(ms.toDF()).writeStream
      .format("memory").queryName("t_stateful").outputMode("append").start()
    ms.addData(Seq(ev(1, 1, 1.0), ev(2, 1, 2.0), ev(3, 2, 5.0)))
    q.processAllAvailable()
    ms.addData(Seq(ev(4, 1, 3.0))) // second batch: user 1 state must carry over
    q.processAllAvailable()
    q.stop()
    val byBatch = spark.table("t_stateful").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(byBatch.contains((1L, 2L, 3.0)))  // after batch 1
    assert(byBatch.contains((1L, 3L, 6.0)))  // cumulative after batch 2
    assert(byBatch.contains((2L, 1L, 5.0)))
  }

  test("streaming heavy hitters honor the Misra-Gries guarantee across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[Ev]
    def ev(id: Long, tpe: String) =
      Ev(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, tpe, 0.0)
    // skewed multiset: 'hot' 40, 'warm' 20, 12 cold singletons
    val rows = (1 to 40).map(i => ev(i, "hot")) ++
      (41 to 60).map(i => ev(i, "warm")) ++
      (61 to 72).map(i => ev(i, s"cold_$i"))
    val q = EventStreams.heavyHitters(ms.toDF(), capacity = 4, shards = 2).writeStream
      .format("memory").queryName("t_hh").outputMode("update").start()
    // two batches so state must carry over
    ms.addData(rows.take(30)); q.processAllAvailable()
    ms.addData(rows.drop(30)); q.processAllAvailable()
    q.stop()
    // keep each shard's LAST report (update mode re-emits per batch)
    val finalRows = spark.table("t_hh").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val latestTotal = finalRows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val survivors = finalRows.filter { case (s, _, _, tot) => tot == latestTotal(s) }
    // MG guarantee per shard: any type with true count > shard_total/capacity
    // survives with count_min <= true <= count_min + decremented slack
    val hot = survivors.filter(_._2 == "hot")
    val warm = survivors.filter(_._2 == "warm")
    assert(hot.nonEmpty && warm.nonEmpty,
      s"hot/warm missing from survivors: ${survivors.mkString(",")}")
    assert(hot.head._3 <= 40 && hot.head._3 >= 40 - latestTotal(hot.head._1) / 4)
    assert(warm.head._3 <= 20 && warm.head._3 >= 20 - latestTotal(warm.head._1) / 4)
  }

  test("stateful funnel: streaming thresholds equal a brute-force batch reference") {
    import spark.implicits._
    val rows = fixtureEvents.as[Ev].collect().toSeq
    // Out-of-order replay WITHIN the watermark contract: all rows arrive
    // reversed in one batch (so nothing is >1h late), then the sentinel
    // advances the watermark past every user's horizon and the event-time
    // timeouts finalize the groups.
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = EventStreams.statefulFunnel(ms.toDF(), horizonSeconds = 3600L).writeStream
      .format("memory").queryName("t_funnel").outputMode("append").start()
    ms.addData(rows.reverse); q.processAllAvailable()
    // Two sentinel batches: the first advances the watermark past every
    // user's horizon; the second delivers rows to the stateful operator
    // UNDER that watermark so the event-time timeouts fire (timed-out
    // groups are only processed in batches whose rows reach the operator).
    val f1 = flushEvent(rows)
    ms.addData(Seq(f1)); q.processAllAvailable()
    ms.addData(Seq(f1.copy(event_id = -2L,
      ts = new java.sql.Timestamp(f1.ts.getTime + 7L * 24 * 3600 * 1000))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_funnel").collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    // Brute force over the same rows.
    val expected = rows.filter(e => Set("signup", "click", "purchase")(e.event_type))
      .groupBy(_.user_id).toSeq.map { case (u, es) =>
        def minOf(tpe: String, after: Option[Long]) = {
          val c = es.filter(e => e.event_type == tpe && after.forall(e.ts.getTime > _))
            .map(_.ts.getTime)
          if (c.isEmpty) None else Some(c.min)
        }
        val t1 = minOf("signup", None)
        val t2 = t1.flatMap(x => minOf("click", Some(x)))
        val t3 = t2.flatMap(x => minOf("purchase", Some(x)))
        (u, t1, t2, t3)
      }.sortBy(_._1)
    val missing = expected.map(_._1).toSet -- streamed.map(_._1).toSet
    assert(streamed.length === expected.length,
      s"missing users: $missing; extra: ${streamed.map(_._1).toSet -- expected.map(_._1).toSet}")
    assert(streamed.toSeq === expected)
  }

  test("file source -> windowed agg -> parquet sink: full streaming pipeline") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    // two "arriving" files of events
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    def ev(id: Long, minutes: Long, typ: String) =
      Ev(id, java.sql.Timestamp.valueOf(base.plusMinutes(minutes)), 1L, typ, 1.0)
    Seq(ev(1, 0, "click"), ev(2, 10, "view")).toDF().coalesce(1).write.mode("append").parquet(srcDir)
    Seq(ev(3, 20, "click"), ev(4, 200, "flush")).toDF().coalesce(1).write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(srcDir)
    val q = EventStreams.tumblingAgg(stream, "1 hour", "1 minute")
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckptDir)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(sinkDir).filter(col("event_type") =!= "flush")
      .orderBy("h", "event_type").collect()
    // hour window 00:00 closed by the fresh file's 03:20 event
    assert(out.map(r => (r.getAs[Any]("event_type").toString, r.getLong(2))).toSeq ==
      Seq(("click", 2L), ("view", 1L)))
  }

  test("checkpoint recovery: a restarted query resumes exactly-once, no duplicate windows") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ckpt-src").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-ckpt-sink").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt-ckpt").toString
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    def ev(id: Long, minutes: Long, typ: String) =
      Ev(id, java.sql.Timestamp.valueOf(base.plusMinutes(minutes)), 1L, typ, 1.0)
    def startQuery() = {
      val stream = spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(srcDir)
      EventStreams.tumblingAgg(stream, "1 hour", "1 minute")
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    // first run: hour 00 events + an hour-02 event that closes hour 00
    Seq(ev(1, 0, "click"), ev(2, 10, "view"), ev(3, 125, "late")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // second run, SAME checkpoint: new files close hour 02 as well
    Seq(ev(4, 130, "late"), ev(5, 400, "flush")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(sinkDir).filter(col("event_type") =!= "flush")
      .select(col("h"), col("event_type"), col("c")).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime, r.getString(1), r.getLong(2))).sorted.toSeq
    // exactly one row per (window, type) despite the restart — hour-00 windows
    // emitted by run 1 are NOT re-emitted by run 2; the hour-02 'late' count
    // includes events from both runs (state recovered from the checkpoint).
    assert(out == Seq(
      (LocalDateTime.of(2024, 3, 1, 0, 0), "click", 1L),
      (LocalDateTime.of(2024, 3, 1, 0, 0), "view", 1L),
      (LocalDateTime.of(2024, 3, 1, 2, 0), "late", 2L)))
  }

  test("funnel checkpoint recovery: state survives a restart, finalization is exactly-once") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-funnel-src").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-funnel-sink").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    def ev(id: Long, minutes: Long, user: Long, typ: String) =
      Ev(id, java.sql.Timestamp.valueOf(base.plusMinutes(minutes)), user, typ, 1.0)
    def at(minutes: Long) =
      java.sql.Timestamp.valueOf(base.plusMinutes(minutes)).getTime
    def startQuery() = {
      val stream = spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(srcDir)
      EventStreams.statefulFunnel(stream, horizonSeconds = 3600L)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    // Run 1: user 1 signs up; user 2 signs up and clicks. Nothing finalizes
    // (no watermark movement past any horizon) — all of it is in-flight
    // group state when the query stops.
    Seq(ev(1, 0, 1, "signup"), ev(2, 0, 2, "signup"), ev(3, 5, 2, "click")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // Run 2, SAME checkpoint: user 1's click and purchase arrive. The final
    // thresholds depend on run-1 state (the signup) having been recovered.
    val q2 = startQuery()
    Seq(ev(4, 10, 1, "click"), ev(5, 20, 1, "purchase")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    q2.processAllAvailable()
    // Two flush batches, as the in-memory funnel test: the first advances
    // the watermark past every horizon, the second delivers operator-visible
    // rows under that watermark so the event-time timeouts fire.
    Seq(ev(6, 7L * 24 * 60, FlushUser, "flush")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    q2.processAllAvailable()
    Seq(ev(7, 14L * 24 * 60, FlushUser, "flush")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(sinkDir).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1).toSeq
    // Exactly one finalized row per funnel user despite the restart; user 1's
    // thresholds combine run-1 state (signup) with run-2 events.
    assert(out == Seq(
      (1L, Some(at(0)), Some(at(10)), Some(at(20))),
      (2L, Some(at(0)), Some(at(5)), None)))
  }

  test("sliding windows emit one row per covering window") {
    val base = LocalDateTime.of(2024, 3, 1, 1, 45)
    val rows = Seq(Ev(1, java.sql.Timestamp.valueOf(base), 1, "click", 1.0))
    val out = streamOf(rows, EventStreams.slidingAgg(_, "1 hour", "30 minutes", "1 minute"), "t_sliding")
      .filter(col("event_type") =!= "flush")
    // one event at 01:45 falls into the windows starting 01:00 and 01:30
    assert(out.select("ws").collect().map(_.getTimestamp(0).toLocalDateTime).sorted.toSeq ==
      Seq(LocalDateTime.of(2024, 3, 1, 1, 0), LocalDateTime.of(2024, 3, 1, 1, 30)))
  }

  test("stream-stream interval join: streaming equals batch on the fixture") {
    import spark.implicits._
    val rows = fixtureEvents.as[Ev].collect().toSeq
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("purchase_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairs(streamOf(rows, EventStreams.viewToPurchaseJoin(_), "t_ssjoin"))
    val batch = pairs(EventStreams.viewToPurchaseJoin(fixtureEvents))
    assert(batch.nonEmpty, "fixture should contain view->purchase pairs within 30 minutes")
    assert(streamed == batch)
  }

  test("stream-stream LEFT OUTER interval join emits null-matched purchases after watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val matched = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
      Ev(2, ts("2024-01-01 10:10:00"), 7, "purchase", 5.0), // view 10 min before
      Ev(3, ts("2024-01-01 10:05:00"), 8, "purchase", 9.0)) // user 8 never views
    val ms = MemoryStream[Ev]
    val q = EventStreams.viewToPurchaseLeftJoin(ms.toDF())
      .writeStream.format("memory").queryName("t_ssleft").outputMode("append").start()
    try {
      ms.addData(matched)
      q.processAllAvailable()
      // The unmatched purchase cannot emit yet: a matching view could still
      // arrive within the watermark. Far-future events on BOTH sides (the
      // global watermark is the min across the two watermarked branches, so
      // a view alone would not move the purchases side) close the window,
      // and one more batch triggers the state eviction that emits the
      // null-matched row.
      ms.addData(Seq(Ev(98, ts("2024-01-02 10:00:00"), 999, "view", 0.0),
        Ev(99, ts("2024-01-02 10:00:00"), 999, "purchase", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(Ev(96, ts("2024-01-02 12:00:00"), 999, "view", 0.0),
        Ev(97, ts("2024-01-02 12:00:00"), 999, "purchase", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_ssleft").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .filter(_._1 < 90).toSet
    assert(out.contains((2L, 1L)), s"matched purchase missing: $out")
    assert(out.contains((3L, -1L)), s"unmatched purchase should emit with null view after watermark: $out")
    // and streaming equals the batch left join on the same rows
    val batch = EventStreams.viewToPurchaseLeftJoin(matched.toDF())
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == batch)
  }

  test("stream-static broadcast join: streaming equals batch on the fixture") {
    import spark.implicits._
    val rows = fixtureEvents.as[Ev].collect().toSeq
    val dim = spark.range(0, 150).select(col("id").as("dim_key"),
      concat(lit("grp_"), (col("id") % 7).cast("string")).as("dim_label"))
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(3))).toMap
    val streamed = keyed(streamOf(rows, EventStreams.enrichWithDim(_, dim), "t_stjoin")
      .filter(col("user_id") =!= FlushUser))
    val batch = keyed(EventStreams.enrichWithDim(fixtureEvents, dim))
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}

/** Streaming as-of enrichment: the streaming face of
  * TemporalJoins.asofBackward (buffer-within-watermark finalization).
  */
class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("out-of-order arrival: a click arriving after its purchase still matches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val base = LocalDateTime.of(2024, 3, 1, 12, 0)
    def at(minutes: Long) = java.sql.Timestamp.valueOf(base.plusMinutes(minutes))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = EventStreams.streamingAsof(ms.toDF(), watermark = "1 hour").writeStream
      .format("memory").queryName("t_asof_ooo").outputMode("append").start()
    // batch 1: the purchase arrives FIRST (its matching click is still in flight)
    ms.addData(Seq(Ev(10, at(30), 1, "purchase", 99.0))); q.processAllAvailable()
    // batch 2: the earlier-ts click arrives late but inside the watermark
    ms.addData(Seq(Ev(11, at(20), 1, "click", 5.0))); q.processAllAvailable()
    // sentinel batches advance the watermark and fire the timeouts
    ms.addData(Seq(Ev(-1, at(300), 999, "flush", 0.0))); q.processAllAvailable()
    ms.addData(Seq(Ev(-2, at(600), 999, "flush", 0.0))); q.processAllAvailable()
    q.stop()
    val out = spark.table("t_asof_ooo").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq((10L, Some(at(20).getTime), Some(5.0))))
  }

  test("fixture parity with the batch as-of join (shuffled replay)") {
    import spark.implicits._
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val fixtureEvents = spark.table("events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val rows = fixtureEvents.as[Ev].collect().toSeq
    implicit val sql = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = EventStreams.streamingAsof(ms.toDF(), watermark = "240 hours").writeStream
      .format("memory").queryName("t_asof_parity").outputMode("append").start()
    // reversed single-batch replay: everything is in-watermark out-of-order
    ms.addData(rows.reverse); q.processAllAvailable()
    val maxTs = rows.map(_.ts.getTime).max
    def flush(id: Long, plusDays: Long) =
      Ev(id, new java.sql.Timestamp(maxTs + plusDays * 24 * 3600 * 1000), 999999L, "flush", 0.0)
    ms.addData(Seq(flush(-1, 30))); q.processAllAvailable()
    ms.addData(Seq(flush(-2, 60))); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_asof_parity").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq.sortBy(_._1)
    val purchases = fixtureEvents.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = fixtureEvents.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val batch = graft.operators.TemporalJoins
      .asofBackward(purchases, clicks, "user_id", "ts", Seq("value"))
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.sql.Timestamp]("matched_ts")).map(_.getTime),
        Option(r.get(r.fieldIndex("matched_value"))).map(_.asInstanceOf[Double])))
      .toSeq.sortBy(_._1)
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"stream $s vs batch $b") }
  }
}
