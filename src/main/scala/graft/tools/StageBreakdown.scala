package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage wall/task accounting for one query — where does a multi-stage
  * pipeline's latency actually go (task compute vs stage-launch gaps)?
  *
  * Run: sbt "runMain graft.tools.StageBreakdown <query>"
  */
object StageBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val name = args.headOption.getOrElse("pipeline_clean_corpus")
    val q = SparkEntry.queries(name)
    (1 to 4).foreach(_ => q(spark, sfDir).count()) // steady state

    final case class St(name: String, submitted: Long, completed: Long,
        tasks: Int, taskTimeMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      private val taskMs = mutable.Map.empty[Int, Long].withDefaultValue(0L)
      private val taskN = mutable.Map.empty[Int, Int].withDefaultValue(0)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        taskMs(t.stageId) += t.taskInfo.duration
        taskN(t.stageId) += 1
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val i = s.stageInfo
        val rdds = i.rddInfos.map(_.name).distinct.mkString(">")
        stages += St(rdds.take(90),
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          taskN(i.stageId), taskMs(i.stageId))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    q(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    val first = stages.map(_.submitted).min
    println(f"[stages] $name wall=$wall%.3f s, ${stages.length} stages")
    stages.sortBy(_.submitted).foreach { s =>
      println(f"[stages] +${(s.submitted - first) / 1000.0}%6.3f..+${(s.completed - first) / 1000.0}%6.3f " +
        f"wall=${(s.completed - s.submitted) / 1000.0}%6.3f tasks=${s.tasks}%3d taskSum=${s.taskTimeMs / 1000.0}%6.3f  ${s.name}")
    }
    val spanMs = stages.map(_.completed).max - first
    println(f"[stages] stage-span=${spanMs / 1000.0}%.3f s, gaps=${wall - spanMs / 1000.0}%.3f s")
    spark.stop()
  }
}
