package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestHarness

/** Edge semantics of the as-of join the DuckDB oracle can't isolate:
  * inclusive bounds, same-timestamp tie-breaks, and the no-prior-match case.
  */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Double)], right: Seq[(Long, Long, Double)]) = {
    val l = left.toDF("user_id", "ts", "value")
    val r = right.toDF("user_id", "ts", "value")
    TemporalJoins.asofBackward(l, r, key = "user_id", tsCol = "ts", payload = Seq("value"))
      .select("user_id", "ts", "value", "matched_ts", "matched_value")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2))
  }

  test("as-of picks the latest right row at-or-before each left row") {
    val out = run(
      left = Seq((1L, 10L, 1.0), (1L, 20L, 2.0)),
      right = Seq((1L, 5L, 50.0), (1L, 15L, 150.0), (1L, 25L, 250.0)))
    assert(out === Seq(
      (1L, 10L, 1.0, Some(5L), Some(50.0)),
      (1L, 20L, 2.0, Some(15L), Some(150.0))))
  }

  test("bound is inclusive: a right row AT the left timestamp matches") {
    val out = run(left = Seq((1L, 10L, 1.0)), right = Seq((1L, 10L, 99.0)))
    assert(out === Seq((1L, 10L, 1.0, Some(10L), Some(99.0))))
  }

  test("no prior right row yields null match; keys never cross") {
    val out = run(
      left = Seq((1L, 10L, 1.0), (2L, 10L, 2.0)),
      right = Seq((1L, 20L, 50.0), (2L, 5L, 60.0)))
    assert(out === Seq(
      (1L, 10L, 1.0, None, None),
      (2L, 10L, 2.0, Some(5L), Some(60.0))))
  }

  test("ties on the right timestamp resolve to the payload-max row (the oracle's tie-break)") {
    val out = run(
      left = Seq((1L, 10L, 1.0)),
      right = Seq((1L, 5L, 3.0), (1L, 5L, 7.0), (1L, 5L, 5.0)))
    assert(out === Seq((1L, 10L, 1.0, Some(5L), Some(7.0))))
  }

  test("as-of join matches a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val right = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val out = run(left, right)
    assert(out.length === left.length)
    // Brute force: per left row, the right rows at-or-before its ts on the
    // key; match ts = their max ts; match value = max value at that ts.
    val expected = left.map { case (k, ts, v) =>
      val prior = right.filter(r => r._1 == k && r._2 <= ts)
      val mts = prior.map(_._2).maxOption
      val mv = mts.map(t => prior.filter(_._2 == t).map(_._3).max)
      (k, ts, v, mts, mv)
    }.sortBy(t => (t._1, t._2))
    // Both sides may contain duplicate (key, ts, value) left rows; compare as
    // sorted multisets.
    assert(out.toSeq.sorted === expected.sorted)
  }

  private def runFwd(left: Seq[(Long, Long, Double)], right: Seq[(Long, Long, Double)]) = {
    val l = left.toDF("user_id", "ts", "value")
    val r = right.toDF("user_id", "ts", "value")
    TemporalJoins.asofForward(l, r, key = "user_id", tsCol = "ts", payload = Seq("value"))
      .select("user_id", "ts", "value", "matched_ts", "matched_value")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2))
  }

  test("forward as-of picks the earliest right row at-or-after each left row, inclusive") {
    val out = runFwd(
      left = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0)),
      right = Seq((1L, 15L, 150.0), (1L, 20L, 200.0)))
    assert(out === Seq(
      (1L, 10L, 1.0, Some(15L), Some(150.0)),
      (1L, 20L, 2.0, Some(20L), Some(200.0)),  // inclusive: same-ts right matches
      (1L, 30L, 3.0, None, None)))             // nothing follows
  }

  test("forward as-of ties on the right timestamp resolve to the payload-min row") {
    val out = runFwd(
      left = Seq((1L, 10L, 1.0)),
      right = Seq((1L, 15L, 7.0), (1L, 15L, 3.0), (1L, 15L, 5.0)))
    assert(out === Seq((1L, 10L, 1.0, Some(15L), Some(3.0))))
  }

  test("forward as-of: a null payload loses a same-timestamp tie to a non-null one") {
    val l = Seq((1L, 10L, 1.0)).toDF("user_id", "ts", "value")
    val r = Seq((1L, 15L, Option.empty[Double]), (1L, 15L, Some(5.0)))
      .toDF("user_id", "ts", "value")
    val row = TemporalJoins.asofForward(l, r, "user_id", "ts", Seq("value"))
      .select("matched_ts", "matched_value").collect().head
    assert(row.getLong(0) === 15L)
    assert(row.getDouble(1) === 5.0) // MIN-ignoring-nulls, like the oracle
  }

  test("both as-of directions: NULL keys and NULL timestamps never match (oracle join semantics)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("user_id", LongType, nullable = true),
      StructField("ts", LongType, nullable = true), StructField("value", DoubleType, nullable = true)))
    def df(rows: Seq[(Option[Long], Option[Long], Double)]) =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          Row(r._1.map(Long.box).orNull, r._2.map(Long.box).orNull, r._3)): _*), schema)
    // NULL-key left + NULL-key right at matching times; NULL-ts left; NULL-ts right.
    val l = df(Seq((None, Some(10L), 1.0), (Some(1L), None, 2.0), (Some(1L), Some(10L), 3.0)))
    val r = df(Seq((None, Some(5L), 50.0), (None, Some(15L), 60.0),
      (Some(1L), None, 70.0), (Some(1L), Some(8L), 80.0), (Some(1L), Some(12L), 90.0)))
    def collectMatches(out: org.apache.spark.sql.DataFrame) =
      out.select("value", "matched_ts", "matched_value").collect()
        .map(x => (x.getDouble(0), Option(x.get(1)), Option(x.get(2)))).sortBy(_._1)
    val back = collectMatches(TemporalJoins.asofBackward(l, r, "user_id", "ts", Seq("value")))
    assert(back === Seq(
      (1.0, None, None),             // NULL-key left: no match despite NULL-key rights
      (2.0, None, None),             // NULL-ts left: no match
      (3.0, Some(8L), Some(80.0)))) // normal row unaffected (NULL-ts right skipped)
    val fwd = collectMatches(TemporalJoins.asofForward(l, r, "user_id", "ts", Seq("value")))
    assert(fwd === Seq(
      (1.0, None, None),
      (2.0, None, None),
      (3.0, Some(12L), Some(90.0))))
  }

  test("forward as-of matches a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val right = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val out = runFwd(left, right)
    assert(out.length === left.length)
    val expected = left.map { case (k, ts, v) =>
      val next = right.filter(r => r._1 == k && r._2 >= ts)
      val mts = next.map(_._2).minOption
      val mv = mts.map(t => next.filter(_._2 == t).map(_._3).min)
      (k, ts, v, mts, mv)
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq.sorted === expected.sorted)
  }

  test("globalNtile matches the windowed NTILE for every remainder case") {
    import org.apache.spark.sql.expressions.{Window => W}
    for (total <- Seq(1, 5, 7, 12); n <- Seq(1, 3, 4)) {
      val df = spark.range(total.toLong).toDF("v")
      val expected = df.select($"v",
          ntile(n).over(W.orderBy("v")).as("tile"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      val got = Windows.globalNtile(df, n, Seq($"v"), "tile")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      assert(got.toSeq === expected.toSeq, s"total=$total n=$n")
    }
  }

  test("globalNtile is exact on shuffled multi-partition data and never leaves Tungsten") {
    import org.apache.spark.sql.expressions.{Window => W}
    // Random keys across many partitions: if the offsets branch saw different
    // range bounds than the row branch (exchange not reused), tiles would be
    // wrong here with near-certainty.
    val df = spark.range(20000).select(
      (hash($"id") % 1000000).as("v"), $"id".as("k"))
      .repartition(17)
    val expected = df.select($"k",
        ntile(7).over(W.orderBy($"v", $"k")).as("tile"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val out = Windows.globalNtile(df, 7, Seq($"v", $"k"), "tile")
    val got = out.select($"k", $"tile")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.toSeq === expected.toSeq)
    // Stays in the DataFrame world: no RDD round trip in the plan.
    assert(!out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      "globalNtile must not convert to RDD[Row]")
  }

  test("a latest right row with a NULL payload reports (its ts, null) — not an older row's payload") {
    val l = Seq((1L, 10L, 1.0)).toDF("user_id", "ts", "value")
    val r = Seq((1L, 3L, Some(30.0)), (1L, 8L, Option.empty[Double]))
      .toDF("user_id", "ts", "value")
    val row = TemporalJoins.asofBackward(l, r, "user_id", "ts", Seq("value"))
      .select("matched_ts", "matched_value").collect().head
    assert(row.getLong(0) === 8L)   // the latest row's ts...
    assert(row.isNullAt(1))         // ...and ITS payload, which is null
  }

  private def runNearest(left: Seq[(Long, Long, Double)], right: Seq[(Long, Long, Double)]) = {
    val l = left.toDF("user_id", "ts", "value")
    val r = right.toDF("user_id", "ts", "value")
    TemporalJoins.asofNearest(l, r, key = "user_id", tsCol = "ts", payload = Seq("value"))
      .select("user_id", "ts", "value", "matched_ts", "matched_dir", "matched_value")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[String]),
        Option(x.get(5)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2))
  }

  test("nearest as-of picks the closer direction; equal gaps resolve backward") {
    val out = runNearest(
      left = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0)),
      right = Seq((1L, 7L, 70.0), (1L, 21L, 210.0), (1L, 40L, 400.0)))
    assert(out === Seq(
      (1L, 10L, 1.0, Some(7L), Some("b"), Some(70.0)),    // 3 back vs 11 fwd
      (1L, 20L, 2.0, Some(21L), Some("f"), Some(210.0)),  // 13 back vs 1 fwd
      (1L, 30L, 3.0, Some(21L), Some("b"), Some(210.0)))) // 9 back vs 10 fwd
    val tie = runNearest(
      left = Seq((1L, 10L, 1.0)),
      right = Seq((1L, 5L, 50.0), (1L, 15L, 150.0)))       // gap 5 both ways
    assert(tie === Seq((1L, 10L, 1.0, Some(5L), Some("b"), Some(50.0))))
  }

  test("nearest as-of falls back to the only populated direction, null when neither") {
    val out = runNearest(
      left = Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0)),
      right = Seq((1L, 50L, 500.0), (2L, 4L, 40.0)))
    assert(out === Seq(
      (1L, 10L, 1.0, Some(50L), Some("f"), Some(500.0)),
      (2L, 10L, 2.0, Some(4L), Some("b"), Some(40.0)),
      (3L, 10L, 3.0, None, None, None)))
  }

  test("nearest as-of matches a brute-force reference on randomized data") {
    val rnd = new scala.util.Random(13)
    val left = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val right = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
    val out = runNearest(left, right)
    assert(out.length === left.length)
    val expected = left.map { case (k, ts, v) =>
      val prior = right.filter(r => r._1 == k && r._2 <= ts)
      val next = right.filter(r => r._1 == k && r._2 >= ts)
      val bts = prior.map(_._2).maxOption
      val fts = next.map(_._2).minOption
      val mts = (bts, fts) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) => if (f - ts < ts - b) Some(f) else Some(b)
      }
      val dir = mts.map(t => if (t <= ts) "b" else "f")
      val mv = mts.map { t =>
        if (t <= ts) prior.filter(_._2 == t).map(_._3).max
        else next.filter(_._2 == t).map(_._3).min
      }
      (k, ts, v, mts, dir, mv)
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq.sorted === expected.sorted)
  }

  test("left columns beyond the key/ts survive and payload name collisions do not clobber them") {
    val l = Seq((1L, 10L, 123.0, "keep")).toDF("user_id", "ts", "value", "tag")
    val r = Seq((1L, 5L, 9.0)).toDF("user_id", "ts", "value")
    val row = TemporalJoins.asofBackward(l, r, "user_id", "ts", Seq("value"))
      .select("value", "tag", "matched_value").collect().head
    assert(row.getDouble(0) === 123.0) // left's own `value`, not the right's
    assert(row.getString(1) === "keep")
    assert(row.getDouble(2) === 9.0)
  }
}
