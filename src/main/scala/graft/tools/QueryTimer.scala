package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Ad-hoc timing harness for individual inventory queries — the inner loop
  * for plan iteration that `graft.Bench` (all headliners, 2 warm + 3 timed
  * passes) is too coarse for.
  *
  * Run: sbt "runMain graft.tools.QueryTimer q1 [q2 ...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_TIMER_PASSES (3).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.get("SPARK_GRAFT_TIMER_PASSES").flatMap(_.toIntOption).getOrElse(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val queries = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_jaccard")
    names.foreach { name =>
      val q = queries(name)
      (1 to 2).foreach(_ => q(spark, sfDir).count()) // warm: codegen + JIT
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val rows = q(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = times.map(_._1).sorted.apply(times.length / 2)
      println(f"[timer] $name%-24s median=$med%.3f s  rows=${times.head._2}  " +
        s"all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
