package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Poor-man's sampling profiler for the repeated-count path: samples every
  * thread's top-of-stack frames at ~5 ms while a query loops, then prints
  * the hottest driver-side frames (executor task threads filtered out).
  * Target: the ~200 ms driver gap StageBreakdown shows between the map
  * stages finishing and the result-stage submission.
  *
  * Run: sbt "runMain graft.tools.DriverHotspots [query] [loops]"
  */
object DriverHotspots {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("join_inner_h03")
    val loops = args.lift(1).flatMap(_.toIntOption).getOrElse(30)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val q = SparkEntry.countQueries(name)
    (1 to 5).foreach(_ => q(spark, sfDir))

    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          val tn = t.getName
          // Driver-side only: skip executor task threads and idle pools.
          if (!tn.startsWith("Executor task launch") && st.nonEmpty &&
              t.getState == Thread.State.RUNNABLE) {
            // Skip obviously-idle frames (socket/park) that report RUNNABLE.
            val top = st.take(8).map(f => s"${f.getClassName}.${f.getMethodName}")
            val sig = s"[$tn] ${top.mkString(" <- ")}"
            if (!sig.contains("socketAccept") && !sig.contains("epollWait") &&
                !sig.contains("SamplerSelf"))
              counts.merge(sig.take(400), 1, (a, b) => a + b)
          }
        }
        Thread.sleep(5)
      }
    }, "SamplerSelf")
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to loops).foreach(_ => q(spark, sfDir))
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(50)
    println(f"[hot] $name x$loops wall=$wall%.2f s (${wall / loops * 1000}%.0f ms/call)")
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (sig, n) =>
      println(f"[hot] $n%5d  $sig")
    }
    spark.stop()
  }
}
