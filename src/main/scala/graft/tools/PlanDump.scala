package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Scratch: dump the AQE-final plan of one op (not part of the driver contract). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
