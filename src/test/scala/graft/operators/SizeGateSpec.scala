package graft.operators

import graft.{SparkTestHarness, Tables}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** The size-gated broadcast: dimension-sized inputs broadcast, anything
  * over the gate falls back to a pinned shuffle-hash hint — the 100 TB
  * fallback is exercised here by shrinking the threshold below the local
  * fixture size (the same decision a huge estimate triggers at scale).
  */
class SizeGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  // adaptive-off clone so the static planner's node inventory is inspectable
  // (an unexecuted AdaptiveSparkPlanExec hides its input plan from exists)
  private lazy val probeSession = {
    val p = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
    p.conf.set("spark.sql.adaptive.enabled", "false")
    Tables.ensure(p, SparkTestHarness.sfDir)
    p
  }

  private def plan(df: org.apache.spark.sql.DataFrame) = {
    val probe = probeSession.table("lineitem").select("l_orderkey")
      .join(df, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
    probe.queryExecution.executedPlan
  }

  test("under the gate: broadcast; over the gate: shuffle, never a fact broadcast") {
    val o = probeSession.table("orders").select("o_orderkey")
    assert(SizeGate.isDimensionSized(o), "local fixture is under the default gate")
    assert(!SizeGate.isDimensionSized(o, thresholdBytes = 1L),
      "a 1-byte gate models the 100 TB estimate")

    val gated = plan(SizeGate.broadcastIfSmall(o))
    assert(gated.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "under the gate the join side broadcasts")

    val fallback = plan(SizeGate.broadcastIfSmall(o, thresholdBytes = 1L))
    assert(!fallback.exists {
      case b: BroadcastExchangeExec => b.exists {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.exists(_.contains("orders"))
        case _ => false
      }
      case _ => false
    }, "over the gate the side must not broadcast")
    assert(fallback.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "over the gate the pinned fallback is a shuffled hash join")
  }
}
