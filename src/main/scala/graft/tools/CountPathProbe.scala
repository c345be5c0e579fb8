package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry, Tables}

/** A/B the bench action paths for a few headline queries: (a) cached df +
  * `.count()` per call (the r6 bench path), (b) `PlanCache.count` fresh-plan
  * path (r7 candidate). Prints per-call wall and HotSpot-JIT deltas so a
  * codegen/JIT churn regression is visible directly.
  */
object CountPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    val names = if (args.nonEmpty) args.toSeq else Seq("tpch_h05", "join_inner_h03", "win_rownum")
    val byName = SparkEntry.allOps.map(op => op.name -> op).toMap
    names.foreach { n =>
      val op = byName(n)
      // warm both paths once
      val cached = graft.engine.PlanCache.get(spark, s"probeA:$n")(op.run(spark, sfDir))
      cached.count(); graft.engine.PlanCache.count(spark, s"probeB:$n")(op.run(spark, sfDir))
      Seq("cached.count" -> (() => { cached.count(); () }),
          "PlanCache.count" -> (() => { graft.engine.PlanCache.count(spark, s"probeB:$n")(op.run(spark, sfDir)); () }))
        .foreach { case (label, f) =>
          val times = (1 to 4).map { _ =>
            val (j0, t0) = (jitMs, System.nanoTime())
            f()
            ((System.nanoTime() - t0) / 1e6, jitMs - j0)
          }
          println(f"$n%-16s $label%-16s " +
            times.map { case (ms, j) => f"$ms%6.0fms(j$j%4d)" }.mkString(" "))
        }
    }
    spark.stop()
  }
}
