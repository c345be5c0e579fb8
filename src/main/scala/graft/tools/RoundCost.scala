package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Micro-probe for the per-stage-round fixed cost (scratch tool): times warm
  * queries of increasing stage depth (0, 1, 2, 3 shuffles) under AQE on/off.
  * The per-shuffle delta is the scheduler+replan overhead every extra
  * exchange costs a sub-second query, independent of data volume.
  */
object RoundCost {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeMedian(f: () => Unit, n: Int = 7): Double = {
      (1 to 3).foreach(_ => f())
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(n / 2)
    }

    val base = spark.range(100000).select(col("id"), (col("id") % 97).as("k"))
    def depth(d: Int): () => Unit = () => {
      var df = base
      (1 to d).foreach { i => df = df.groupBy((col("k") + i).as("k")).agg(count(lit(1)).as("c"))
        .select(col("k"), col("c").as("id")).withColumnRenamed("id", s"v$i").withColumnRenamed("k", "k") }
      df.count(): Unit
    }

    Seq(true, false).foreach { aqe =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t = (0 to 3).map(d => d -> timeMedian(depth(d)))
      val deltas = t.sliding(2).map { case Seq((_, a), (_, b)) => b - a }.toSeq
      println(f"[roundcost] aqe=$aqe  " + t.map { case (d, ms) => f"d$d=$ms%.0f ms" }.mkString("  ") +
        "  per-extra-shuffle: " + deltas.map(d => f"$d%+.0f").mkString(", "))
    }
    spark.stop()
  }
}

/** Bare-job floor: one 1-task RDD job, no SQL. */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val rdd = sc.parallelize(1 to 1, 1)
    (1 to 20).foreach(_ => rdd.count())
    val ts = (1 to 21).map { _ =>
      val t0 = System.nanoTime(); rdd.count(); (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[jobfloor] 1-task job: p50=${ts(10)}%.1f ms  p10=${ts(2)}%.1f  p90=${ts(18)}%.1f")
    val rdd32 = sc.parallelize(1 to 32, 32)
    (1 to 10).foreach(_ => rdd32.count())
    val t2 = (1 to 21).map { _ =>
      val t0 = System.nanoTime(); rdd32.count(); (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[jobfloor] 32-task job: p50=${t2(10)}%.1f ms  p10=${t2(2)}%.1f  p90=${t2(18)}%.1f")
    spark.stop()
  }
}
