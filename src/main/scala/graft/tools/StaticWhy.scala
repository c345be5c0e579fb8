package graft.tools
import graft.{GraftSession, SparkEntry, Tables}
object StaticWhy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val clone = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    args.foreach { n =>
      val op = SparkEntry.allOps.find(_.name == n).get
      val opt = op.run(spark, sfDir).queryExecution.optimizedPlan
      val df = org.apache.spark.sql.GraftDatasetShim.ofRows(clone, opt)
      println(s"===== $n (static plan) =====")
      println(df.queryExecution.executedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
