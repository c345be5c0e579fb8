package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Does a repeated query re-COMPILE its generated code every execution, or
  * hit the Janino cache? (scratch tool) Prints, per iteration, the deltas of
  * HotSpot JIT time, Janino compilation time, and generated-source bytes
  * (from Spark's CodegenMetrics). Nonzero janino/source deltas on warm
  * iterations = the source text is changing run-to-run (cache miss).
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val name = args.headOption.getOrElse("tpch_h05")
    val q = SparkEntry.queries(name)

    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    import org.apache.spark.metrics.source.CodegenMetrics._
    (1 to 8).foreach { i =>
      val (j0, c0, s0) = (jitMs, METRIC_COMPILATION_TIME.getCount, METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount)
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e6
      println(f"[jit] $name iter$i wall=$wall%6.0f ms  jit+=${jitMs - j0}%5d ms  " +
        f"janino+=${METRIC_COMPILATION_TIME.getCount - c0}%5d ms  bytecode+=${METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount - s0}%7d B")
    }
    spark.stop()
  }
}
