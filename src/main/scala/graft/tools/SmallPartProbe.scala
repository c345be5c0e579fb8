package graft.tools
import graft.{GraftSession, SparkEntry, Tables}
/** A/B shuffle partition count for statically-pinned small plans: plan the
  * same optimized tree under adaptive-off clones with partitions=32 vs 8
  * and time repeated count-collects.
  */
object SmallPartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_h05", "join_inner_h03", "join_self_nation", "join_left_hist", "tpch_h09", "win_rownum")
    Seq(("8", "128m"), ("8", "16m"), ("8", "8m")).foreach { case (parts, mpb) =>
      val clone = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
      clone.conf.set("spark.sql.adaptive.enabled", "false")
      clone.conf.set("spark.sql.shuffle.partitions", parts)
      clone.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      names.foreach { n =>
        val op = SparkEntry.allOps.find(_.name == n).get
        val opt = op.run(spark, sfDir).groupBy().count().queryExecution.optimizedPlan
        def once(): Double = {
          val df = org.apache.spark.sql.GraftDatasetShim.ofRows(clone, opt)
          df.queryExecution.executedPlan
          val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e6
        }
        (1 to 3).foreach(_ => once())
        val med = (1 to 5).map(_ => once()).sorted.apply(2)
        println(f"[parts=$parts%s mpb=$mpb%s] $n%-20s $med%6.0f ms")
      }
    }
    spark.stop()
  }
}
