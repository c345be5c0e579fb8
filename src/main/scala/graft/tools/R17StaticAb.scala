package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.GraftDatasetShim

/** A/B the count-wrapped optimized plan (the bench's repeated-action shape)
  * under (a) the live adaptive session vs (b) an adaptive-off clone with an
  * optional shuffle-partition override — i.e. measure exactly what a
  * PlanCache static pin would buy for queries the eligibility rule currently
  * rejects, before touching the rule.
  *
  * Run: sbt "runMain graft.tools.R17StaticAb [parts] q1 [q2 ...]"
  */
object R17StaticAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = args.headOption.flatMap(_.toIntOption)
    val names = (if (parts.isDefined) args.drop(1) else args).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val clone = GraftDatasetShim.cloneSession(spark)
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    parts.foreach(p => clone.conf.set("spark.sql.shuffle.partitions", p.toString))
    val ops = SparkEntry.allOps.map(o => o.name -> o).toMap
    names.foreach { n =>
      val wrapped = ops(n).run(spark, sfDir).groupBy().count()
      val optimized = wrapped.queryExecution.optimizedPlan
      def run(s: org.apache.spark.sql.SparkSession, static: Boolean): Double = {
        def once(): Double = {
          val d = GraftDatasetShim.ofRowsPreOptimized(s, optimized)
          if (static) { d.queryExecution.executedPlan; () }
          val t0 = System.nanoTime()
          d.collect()
          (System.nanoTime() - t0) / 1e9
        }
        (1 to 3).foreach(_ => once())
        (1 to 7).map(_ => once()).sorted.apply(3)
      }
      // interleave the warm phases so JIT state is comparable
      val a = run(spark, static = false)
      val b = run(clone, static = true)
      val a2 = run(spark, static = false)
      println(f"[staticab] $n%-22s adaptive=$a%.3f/$a2%.3f  static=$b%.3f  " +
        f"delta=${(b - math.min(a, a2)) * 1000}%+.0f ms")
    }
    spark.stop()
  }
}
