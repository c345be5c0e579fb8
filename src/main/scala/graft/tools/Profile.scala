package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry, Tables}

/** Diagnostic profiler for the bench floor (VERDICT r3 "What's wrong #3" /
  * next-round #2): times named queries in the SAME session `Bench` uses and
  * decomposes wall-clock into executor task time vs scheduler/driver gap.
  *
  * Usage: runMain graft.tools.Profile q1 q2 ...   (default: a floor-probe set)
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PROFILE_PASSES.
  *
  * Output per query: wall median, number of jobs-visible stages, task count,
  * summed task time (executor-side), and the scheduler gap
  * (wall x cores - task time is idle capacity; wall - taskTime/cores is the
  * lower bound the stages' serial chain forces).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "5").toInt
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val queries = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "topk", "agg_h01", "tpch_h05", "join_inner_h03", "join_self_nation",
      "dedup_jaccard", "pipeline_clean_corpus", "win_rownum", "embed_cosine_topk")

    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val cores = spark.sparkContext.defaultParallelism.toDouble
    names.filter(queries.contains).foreach { name =>
      // warm
      (1 to 2).foreach(_ => queries(name)(spark, sfDir).count())
      val walls = (1 to passes).map { _ =>
        stages = 0; tasks = 0; taskMs = 0L
        // Split driver-side query preparation (DataFrame construction +
        // analysis + optimization + physical planning) from execution: the
        // per-query floor decomposition in ARCHITECTURE.md rests on knowing
        // how much of a 0.4 s six-way join is Catalyst CPU that amortizes
        // to noise at the 100 TB design point.
        val tp0 = System.nanoTime()
        val df = queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // forces analysis->physical planning
        val plan = (System.nanoTime() - tp0) / 1e6
        val t0 = System.nanoTime()
        df.count()
        val w = (System.nanoTime() - t0) / 1e6
        // listener events are async; give the bus a beat before reading
        Thread.sleep(120)
        (w, stages, tasks, taskMs, plan)
      }
      val med = walls.sortBy(_._1).apply(passes / 2)
      println(f"[profile] $name%-24s wall=${med._1}%7.1f ms  plan=${med._5}%6.1f ms  " +
        f"stages=${med._2}%3d  tasks=${med._3}%4d  taskTime=${med._4}%6d ms  " +
        f"serialFloor=${med._4 / cores}%6.1f ms  gap=${med._1 - med._4 / cores}%7.1f ms")
    }
    spark.stop()
  }
}
