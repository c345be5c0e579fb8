package graft.tools

import graft.{Bench, GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch probe: which headline queries pin a static (adaptive-bypassed)
  * plan under the PlanCache shape rule. Run:
  * sbt "runMain graft.tools.StaticEligibility"
  */
object StaticEligibility {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val qs = SparkEntry.queries
    Bench.headline.foreach { n =>
      val df = qs(n)(spark, sfDir)
      val static = !df.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec]
      println(f"[probe] $n%-24s static=$static")
    }
    spark.stop()
  }
}
