package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Scratch profiler for operator hotspots (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.ensure(spark, dir)
    spark.table("lineitem").count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = SparkEntry.queries
    for (name <- Seq("join_inner_h03", "agg_h01", "dedup_minhash_lsh"); i <- 1 to 3)
      time(s"$name run$i")(q(name)(spark, dir).count())
    spark.stop()
  }
}
