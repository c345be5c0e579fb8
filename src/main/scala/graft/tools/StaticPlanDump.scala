package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Scratch: print the pinned executedPlan for the named queries. */
object StaticPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val qs = SparkEntry.queries
    args.foreach { n =>
      println(s"===== $n =====")
      println(qs(n)(spark, sfDir).queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
