package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe for the r8 digest-key change to the exact-dedup family:
  * group by md5(text) vs group by text, measuring SHUFFLE WRITE BYTES —
  * the quantity the change targets (the map-side partial aggregate means
  * row COUNTS match; what shrinks is the bytes per shuffled row, from
  * whole-document keys to 32-byte digests).
  *
  * Usage: sbt "runMain graft.tools.ShuffleBytesProbe [sfDir]"
  */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")

    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleWrite += t.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(label: String, df: => DataFrame): Long = {
      shuffleWrite = 0L
      val t0 = System.nanoTime()
      df.collect()
      Thread.sleep(500) // let the listener bus drain
      val w = shuffleWrite
      println(f"[shuffle] $label%-12s write=${w / 1024.0}%10.1f KiB  wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      w
    }

    def run(key: org.apache.spark.sql.Column): DataFrame =
      docs.groupBy(key)
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
        .select(col("keep_id"), col("copies")).orderBy("keep_id")

    // warm both shapes once (scan cache, codegen), then measure
    run(col("text")).count(); run(md5(col("text"))).count()
    val byText = measure("text-key", run(col("text")))
    val byDigest = measure("digest-key", run(md5(col("text"))))
    println(f"[shuffle] digest/text byte ratio = ${byDigest.toDouble / byText}%.3f")
    spark.stop()
  }
}
