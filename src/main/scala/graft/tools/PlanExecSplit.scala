package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.GraftDatasetShim

/** Split the static count path's per-call cost into physical planning
  * (ofRows + force executedPlan: strategies, preparations, codegen lookup)
  * vs execution (collect), per bench join-family query. If planning is a
  * large slice, memoizing the physical plan and executing a clone per call
  * is the next latency lever.
  *
  * Run: sbt "runMain graft.tools.PlanExecSplit"
  */
object PlanExecSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("join_inner_h03", "join_self_nation", "join_left_hist",
        "tpch_h05", "tpch_h09", "tpch_h18", "subq_scalar", "cte_h15", "win_rownum")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val ops = SparkEntry.allOps.map(o => o.name -> o).toMap

    val clone = GraftDatasetShim.cloneSession(spark)
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    clone.conf.set("spark.sql.shuffle.partitions", "8")
    val plans = names.map { n =>
      n -> ops(n).run(spark, sfDir).groupBy().count().queryExecution.optimizedPlan
    }.toMap

    def one(n: String): (Double, Double) = {
      var t0 = System.nanoTime()
      val d = GraftDatasetShim.ofRows(clone, plans(n))
      d.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      d.collect()(0).getLong(0)
      val tExec = (System.nanoTime() - t0) / 1e9
      (tPlan, tExec)
    }
    (1 to 3).foreach(_ => names.foreach(one))
    val acc = collection.mutable.Map[String, List[(Double, Double)]]().withDefaultValue(Nil)
    (1 to 7).foreach(_ => names.foreach(n => acc(n) ::= one(n)))
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    var (sp, se) = (0.0, 0.0)
    names.foreach { n =>
      val (p, e) = (med(acc(n).map(_._1)), med(acc(n).map(_._2)))
      sp += p; se += e
      println(f"[split] $n%-20s plan=${p * 1000}%6.1f ms  exec=${e * 1000}%6.1f ms")
    }
    println(f"[split] TOTAL                plan=${sp * 1000}%6.1f ms  exec=${se * 1000}%6.1f ms")
    spark.stop()
  }
}
