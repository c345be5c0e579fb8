package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.GraftDatasetShim

/** Measure the all-broadcast static plan hypothesis: for the bench join
  * family, does re-planning the optimized tree under (adaptive off,
  * autoBroadcastJoinThreshold raised to the small-input bound, size-scaled
  * shuffle partitions) — i.e. turning the remaining shuffled join into a
  * broadcast join — beat the current static pin? A/B interleaved within
  * each pass so host noise hits both sides alike.
  *
  * Run: sbt "runMain graft.tools.BroadcastProbe [q1 q2 ...]"
  */
object BroadcastProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("join_inner_h03", "join_self_nation", "join_left_hist",
        "tpch_h05", "tpch_h09", "tpch_h18", "subq_scalar", "cte_h15")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val ops = SparkEntry.allOps.map(o => o.name -> o).toMap

    // A: the current bench path (PlanCache.count — static pin + scaled parts).
    def runA(name: String): Unit = {
      graft.engine.PlanCache.count(spark, s"op:$name:$sfDir")(ops(name).run(spark, sfDir)); ()
    }

    // B: fresh dataset over the same optimized plan, planned under a clone
    // with broadcast threshold raised to the small-input bound and the same
    // scaled partitions the static pin uses.
    val bClone = GraftDatasetShim.cloneSession(spark)
    bClone.conf.set("spark.sql.adaptive.enabled", "false")
    bClone.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
    bClone.conf.set("spark.sql.shuffle.partitions", "8")
    val bPlans = names.map { n =>
      val wrapped = ops(n).run(spark, sfDir).groupBy().count()
      n -> wrapped.queryExecution.optimizedPlan
    }.toMap
    def runB(name: String): Unit = {
      val d = GraftDatasetShim.ofRows(bClone, bPlans(name))
      d.queryExecution.executedPlan
      d.collect()(0).getLong(0); ()
    }

    // Warm both paths.
    (1 to 3).foreach { _ => names.foreach { n => runA(n); runB(n) } }
    val as = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val bs = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to 7).foreach { _ =>
      names.foreach { n =>
        var t0 = System.nanoTime(); runA(n); as(n) ::= (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); runB(n); bs(n) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    names.foreach { n =>
      val (a, b) = (med(as(n)), med(bs(n)))
      println(f"[bcast] $n%-20s current=$a%.3f  allBcast=$b%.3f  delta=${(b - a) * 1000}%+.0f ms")
    }
    // Show the B plan shape of the first query for eyeballing.
    val d = GraftDatasetShim.ofRows(bClone, bPlans(names.head))
    println(s"[bcast] ${names.head} B-plan:\n" +
      d.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
