package graft.tools
import graft.{GraftSession, SparkEntry, Tables}
object ClassProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val cl = java.lang.management.ManagementFactory.getClassLoadingMXBean
    def jit = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val n = args.headOption.getOrElse("tpch_h05")
    val op = SparkEntry.allOps.find(_.name == n).get
    (1 to 2).foreach(_ => graft.engine.PlanCache.count(spark, s"cp:$n")(op.run(spark, sfDir)))
    (1 to 6).foreach { i =>
      val (c0, j0, t0) = (cl.getLoadedClassCount, jit, System.nanoTime())
      graft.engine.PlanCache.count(spark, s"cp:$n")(op.run(spark, sfDir))
      println(f"call$i%d wall=${(System.nanoTime()-t0)/1e6}%6.0fms classes+${cl.getLoadedClassCount - c0}%5d jit+${jit - j0}%5dms")
    }
    spark.stop()
  }
}
