package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import java.nio.file.{Files, Paths}

/** Optimization-round plan artifacts: write `.explain("formatted")` for the
  * named queries (post-execution, so AQE plans are final) to
  * plans/r17/<query>_<suffix>.txt.
  *
  * Run: sbt "runMain graft.tools.R17PlanDump <suffix> q1 [q2 ...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object R17PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val out = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r17"))
    Files.createDirectories(out)
    val queries = SparkEntry.queries
    names.foreach { name =>
      try {
        val df = queries(name)(spark, sfDir)
        df.collect() // finalize adaptive plans before formatting
        val text = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out.resolve(s"${name}_$suffix.txt"), text)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
