package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkTestHarness, Tables}
import java.nio.file.{Files, Paths}

/** Round-6 regression guard: the driver regenerates the test fixtures between
  * rounds and has already flipped `events.ts` from TIMESTAMP(NANOS) to
  * timestamp[us] once, which (with a dtype hard-coded in registration) killed
  * every table-backed oracle. `Tables.ensure` must register the SAME
  * normalized view (`ts: timestamp_ntz`, identical values) no matter which
  * physical dtype the fixture arrives with.
  */
class FixtureDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  /** Build a fixture dir: symlink the 9 non-events tables from sf0.001 and
    * write an events.parquet whose ts column is produced by `tsCol`.
    */
  private def fixtureDir(tag: String)(tsCol: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$tag")
    Tables.all.filter(_ != "events").foreach { n =>
      Files.createSymbolicLink(
        dir.resolve(s"$n.parquet"),
        Paths.get(s"${SparkTestHarness.sfDir}/$n.parquet"))
    }
    spark.read.parquet(s"${SparkTestHarness.sfDir}/events.parquet")
      .withColumn("ts", tsCol)
      .coalesce(1).write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  test("events.ts registers as timestamp_ntz with identical values for ntz, instant, and long fixtures") {
    // Baseline: whatever dtype the current driver fixtures use.
    Tables.ensure(spark, SparkTestHarness.sfDir)
    val expected = spark.table("events")
      .select(col("event_id"), col("ts").cast("string"))
      .orderBy("event_id").limit(50).collect().toSeq

    val variants = Seq(
      // timestamp[us], isAdjustedToUTC=false — the post-round-6 fixture shape
      "ntz" -> fixtureDir("ntz")(col("ts").cast(TimestampNTZType)),
      // instant micros (isAdjustedToUTC=true); session tz is UTC so values align
      "instant" -> fixtureDir("instant")(col("ts").cast(TimestampType)),
      // int64 nanos — what a TIMESTAMP(NANOS) fixture looks like through
      // spark.sql.legacy.parquet.nanosAsLong (the pre-round-6 shape)
      "long" -> fixtureDir("long")(
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L)))

    variants.foreach { case (tag, dir) =>
      Tables.ensure(spark, dir)
      val ev = spark.table("events")
      assert(ev.schema("ts").dataType == TimestampNTZType, s"variant $tag dtype")
      val got = ev.select(col("event_id"), col("ts").cast("string"))
        .orderBy("event_id").limit(50).collect().toSeq
      assert(got == expected, s"variant $tag values")
    }
    // leave the shared session registered against the standard test dir
    Tables.ensure(spark, SparkTestHarness.sfDir)
  }

  test("schemaReport names every table with observed dtypes") {
    val report = Tables.schemaReport(spark, SparkTestHarness.sfDir)
    Tables.all.foreach(n => assert(report.contains(s"$n: "), s"missing $n"))
    assert(report.contains("ts:timestamp"))
  }
}
