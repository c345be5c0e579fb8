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
