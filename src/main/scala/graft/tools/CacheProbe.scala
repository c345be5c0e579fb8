package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** What does re-preparing a repeated statement cost vs re-executing a cached
  * (already-analyzed) DataFrame? (scratch tool) The delta is the ceiling a
  * prepared-statement plan cache can recover per execution.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    val q = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "tpch_h05", "join_self_nation", "join_inner_h03", "subq_scalar",
      "cte_h15", "tpch_h09", "win_rownum", "dedup_jaccard", "embed_cosine_topk",
      "events_hourly", "tpch_h21", "join_left_hist")

    def med(f: () => Unit): Double = {
      (1 to 3).foreach(_ => f())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(2)
    }
    names.foreach { n =>
      val fresh = med(() => { q(n)(spark, sfDir).count(): Unit })
      val df = q(n)(spark, sfDir)
      val cached = med(() => { df.count(): Unit })
      println(f"[cache] $n%-24s fresh=$fresh%5.0f ms  cached=$cached%5.0f ms  delta=${cached - fresh}%+5.0f")
    }
    spark.stop()
  }
}
