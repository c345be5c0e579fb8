package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import graft.engine.PlanCache
import org.apache.spark.scheduler._

/** Decompose the per-call floor of the repeated PlanCache.count path
  * (scratch tool): for each query, steady-state medians of (a) dataset
  * rooting + physical planning, (b) the collect itself, plus listener-side
  * job/stage/task counts and the scheduler-delay share — where do the fixed
  * ~40 ms/query go?
  *
  * Run: sbt "runMain graft.tools.FloorProbe topk cte_h15 ..."
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else Seq("topk", "win_running_sum", "agg_distinct")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var deserMs = 0L
    @volatile var gapFirstLaunchMs = 0L
    val listener = new SparkListener {
      private var jobSubmit = 0L
      private var firstLaunch = 0L
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs += 1; jobSubmit = j.time; firstLaunch = 0L }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages += 1
      override def onTaskStart(t: SparkListenerTaskStart): Unit = synchronized {
        if (firstLaunch == 0L) {
          firstLaunch = t.taskInfo.launchTime
          gapFirstLaunchMs += firstLaunch - jobSubmit
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        tasks += 1
        taskMs += t.taskInfo.duration
        if (t.taskMetrics != null)
          deserMs += t.taskMetrics.executorDeserializeTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // absolute per-job floor in this JVM: a 1-row, 1-task local job
    (1 to 30).foreach(_ => spark.range(1).count())
    val f0 = System.nanoTime()
    (1 to 20).foreach(_ => spark.range(1).count())
    println(f"[floor] range(1).count absolute floor = ${(System.nanoTime() - f0) / 20 / 1e6}%.1f ms/job")

    names.foreach { name =>
      val key = s"floor:$name"
      def build = SparkEntry.queries(name)(spark, sfDir)
      (1 to 30).foreach(_ => PlanCache.count(spark, key)(build)) // steady state incl. JIT
      Thread.sleep(300)
      jobs = 0; stages = 0; tasks = 0; taskMs = 0; deserMs = 0; gapFirstLaunchMs = 0
      val c0 = System.nanoTime()
      (1 to 10).foreach(_ => PlanCache.count(spark, key)(build))
      val realMs = (System.nanoTime() - c0) / 10 / 1e6
      Thread.sleep(300)
      println(f"[floor] $name%-18s PlanCache.count real path = $realMs%.1f ms/call  " +
        f"(jobs=${jobs / 10} stages=${stages / 10} tasks=${tasks / 10} taskSum=${taskMs / 10} ms)")
      // replicate count()'s cached branch with a phase split: root+plan vs run
      val wrapped = build.groupBy().count()
      val optimized = wrapped.queryExecution.optimizedPlan
      Thread.sleep(400) // let the listener bus drain
      jobs = 0; stages = 0; tasks = 0; taskMs = 0; deserMs = 0; gapFirstLaunchMs = 0
      val n = 10
      var planNs = 0L; var runNs = 0L
      val t0 = System.nanoTime()
      (1 to n).foreach { _ =>
        val p0 = System.nanoTime()
        val d = org.apache.spark.sql.GraftDatasetShim.ofRows(spark, optimized)
        d.queryExecution.executedPlan
        val p1 = System.nanoTime()
        d.collect()
        val p2 = System.nanoTime()
        planNs += p1 - p0; runNs += p2 - p1
      }
      val wallMs = (System.nanoTime() - t0) / 1e6 / n
      Thread.sleep(400) // let the listener bus drain
      println(f"[floor] $name%-18s wall=$wallMs%6.1f ms/call  plan=${planNs / n / 1e6}%5.1f  " +
        f"run=${runNs / n / 1e6}%5.1f  jobs=${jobs / n}  " +
        f"stages=${stages / n}  tasks=${tasks / n}  taskSum=${taskMs / n}%4d ms  " +
        f"deser=${deserMs / n}%3d ms  submit->firstTask=${gapFirstLaunchMs / n}%3d ms")
    }
    spark.stop()
  }
}
