package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Scratch profiler for operator hotspots (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("PROFILE_WARM_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "pipeline_clean_corpus", "dedup_jaccard", "dedup_minhash_lsh",
      "tpch_h18", "tpch_h21", "join_inner_h03", "win_rownum", "tpch_h05")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = SparkEntry.queries
    // mimic bench: warm on sf0.001 first
    Tables.ensure(spark, warmDir)
    names.foreach(n => q(n)(spark, warmDir).count())
    Tables.ensure(spark, dir)
    // Warm the page cache + vectorized-reader JIT with a full no-op read.
    Tables.all.foreach(n => spark.table(n).write.mode("overwrite").format("noop").save())
    for (name <- names; i <- 1 to 3)
      time(s"$name run$i")(q(name)(spark, dir).count())
    spark.stop()
  }
}
