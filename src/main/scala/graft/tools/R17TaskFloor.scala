package graft.tools

import graft.{GraftSession, Tables}

/** Floor probe: per-task fixed cost on this host. Times (a) empty-stage
  * jobs at several task counts, (b) a file-scan count over each normalized
  * fixture table (task count = file count), so scheduler overhead and
  * parquet-reader-open overhead are separable.
  *
  * Run: sbt "runMain graft.tools.R17TaskFloor"
  */
object R17TaskFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    def med(f: => Unit): Double = {
      (1 to 3).foreach(_ => f)
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(3)
    }
    Seq(1, 4, 8, 16, 32, 64).foreach { n =>
      val t = med { spark.sparkContext.parallelize(1 to n, n).count(): Unit }
      println(f"[floor] empty-stage n=$n%-3d  $t%.4f s")
    }
    Seq("region", "nation", "supplier", "customer", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tn =>
      val df = spark.table(tn)
      val parts = df.rdd.getNumPartitions
      val t = med { df.count(): Unit }
      println(f"[floor] scan-count $tn%-12s tasks=$parts%-3d  $t%.4f s")
    }
    spark.stop()
  }
}
