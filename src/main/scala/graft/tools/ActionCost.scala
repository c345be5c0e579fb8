package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** A/B the bench ACTION (scratch tool): `df.count()` (adds a global-agg
  * exchange + one more stage round per query, but lets the optimizer prune
  * unread columns and top-level sorts) vs materializing every output row of
  * the plan as-is via toRdd (what a client fetching results — or DuckDB's
  * fetchall — actually pays: full expressions, full sort, no extra agg).
  *
  * Run: sbt "runMain graft.tools.ActionCost q1 q2 ..."
  */
object ActionCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val q = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "tpch_h05", "join_self_nation", "join_inner_h03", "cte_h15",
      "join_theta", "win_rownum", "text_stats", "text_fingerprint",
      "dedup_jaccard", "events_hourly")

    def materialize(name: String): Unit = {
      val rdd = q(name)(spark, sfDir).queryExecution.toRdd
      spark.sparkContext.runJob(rdd, (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      }): Unit
    }
    def count(name: String): Unit = { q(name)(spark, sfDir).count(): Unit }

    def med(f: String => Unit, name: String): Double = {
      (1 to 3).foreach(_ => f(name))
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(name); (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(2)
    }
    names.foreach { n =>
      val c = med(count, n)
      val m = med(materialize, n)
      println(f"[action] $n%-24s count=$c%.0f ms  materialize=$m%.0f ms  delta=${m - c}%+.0f")
    }
    spark.stop()
  }
}
