package graft.plans

import graft.{SparkTestHarness, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape pins for queries whose intended exchange profile a
  * planner change could silently regress (VERDICT r14 #6). Plans are built
  * under an adaptive-off clone (same approach as PlanCache's static probe)
  * so the inventory is the static planner's — instance counts, not the
  * AQE-doubled plan-string counts PLANS.md's summary lines show.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)

  private def staticPlan(name: String): SparkPlan = {
    val probe = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
    probe.conf.set("spark.sql.adaptive.enabled", "false")
    graft.Tables.ensure(probe, SparkTestHarness.sfDir)
    SparkEntry.queries(name)(probe, SparkTestHarness.sfDir)
      .queryExecution.executedPlan
  }

  test("join_theta: ONE reused fact shuffle + the agg exchange, SHJ, " +
      "no nested loop (the PLANS.md inventory)") {
    val all = nodes(staticPlan("join_theta"))
    val shuffles = all.collect { case e: ShuffleExchangeExec => e }
    val reused = all.collect { case r: ReusedExchangeExec => r }
    // (1) repartition(k) — both self-join sides read it; (2) COUNT's
    // SinglePartition exchange. Nothing else moves data.
    assert(shuffles.size == 2,
      s"expected exactly 2 shuffle instances, got ${shuffles.size}:\n${shuffles.mkString("\n")}")
    assert(reused.nonEmpty, "the self-join's second side must REUSE the fact shuffle")
    assert(all.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "theta join must run as a shuffled hash join on the equi key")
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
      !all.exists(_.isInstanceOf[CartesianProductExec]),
      "the <> predicate must ride the equi join, never a nested loop")
    // broadcasting a self-join side would orphan the shared exchange
    assert(!all.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "no broadcast: a broadcast build of a self-join side re-scans the relation")
  }

  private def scansOf(all: Seq[SparkPlan], table: String) = all.collect {
    case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.inputFiles.exists(_.contains(table)) => f
  }

  test("tpch_h05: lineitem streams through broadcast joins — no fact " +
      "broadcast, no fact shuffle under the local size gate (r16 shape)") {
    val all = nodes(staticPlan("tpch_h05"))
    val bc = all.collect { case b: BroadcastExchangeExec => b }
    // the fact must never sit under a broadcast exchange, whatever the
    // gate decides
    assert(!bc.exists(_.exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("lineitem"))
      case _ => false
    }), "lineitem must stream, not broadcast")
    // at test SF the SizeGate fires: orders + customer broadcast, so the
    // only shuffles left are the n_name aggregate and the result sort
    val shuffles = all.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2,
      s"expected agg + sort exchanges only, got ${shuffles.size}:\n${shuffles.mkString("\n")}")
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]) &&
      !all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }

  test("join_left_hist: customer-side shuffled hash join; the ORDERS fact " +
      "is never broadcast (r15 verdict shape, measured in r16 to beat the " +
      "gated-broadcast alternative)") {
    val all = nodes(staticPlan("join_left_hist"))
    assert(all.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "the left join must run as a shuffled hash join")
    val bc = all.collect { case b: BroadcastExchangeExec => b }
    assert(!bc.exists(_.exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("orders"))
      case _ => false
    }), "orders must shuffle, not broadcast (driver hash build per execution)")
  }

  test("cte_h15: the CTE materializes ONE lineitem scan (shared, not " +
      "re-planned per reference)") {
    val all = nodes(staticPlan("cte_h15"))
    val lineitemScans = scansOf(all, "lineitem")
    assert(lineitemScans.size == 1,
      s"expected exactly one lineitem scan, got ${lineitemScans.size}")
  }

  test("join_self_nation: dimension pre-reduction keeps both reduced dims " +
      "broadcast and the fact un-broadcast (r15 shape)") {
    val all = nodes(staticPlan("join_self_nation"))
    val bc = all.collect { case b: BroadcastExchangeExec => b }
    assert(bc.size >= 2, "supplier x n1 and customer x n2 pre-joins broadcast")
    // the fact side must never sit under a broadcast exchange
    val factBroadcast = bc.exists(_.exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("lineitem"))
      case _ => false
    })
    assert(!factBroadcast, "lineitem must stream, not broadcast")
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]) &&
      !all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
