package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Prepared-plan cache contract: pure repeats reuse the plan, commands
  * bypass and flush, sessions are isolated.
  */
class PlanCacheSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession.local()

  test("repeated pure statements reuse the analyzed DataFrame") {
    val s = spark.newSession()
    val a = PlanCache.sql(s, "SELECT 1 + 1 AS two")
    val b = PlanCache.sql(s, "SELECT 1 + 1 AS two")
    assert(a eq b, "second prepare of the same text must be a cache hit")
    assert(b.collect().head.getInt(0) == 2)
  }

  test("a command is never cached and flushes the session's cache") {
    val s = spark.newSession()
    s.sql("CREATE OR REPLACE TEMPORARY VIEW pc_v AS SELECT 1 AS x")
    val before = PlanCache.sql(s, "SELECT x FROM pc_v")
    assert(before.collect().head.getInt(0) == 1)
    // Command through the cache: executes, is not cached, invalidates.
    val c1 = PlanCache.sql(s, "CREATE OR REPLACE TEMPORARY VIEW pc_v AS SELECT 2 AS x")
    val c2 = PlanCache.sql(s, "CREATE OR REPLACE TEMPORARY VIEW pc_v AS SELECT 2 AS x")
    assert(!(c1 eq c2), "commands must re-execute, not hit the cache")
    val after = PlanCache.sql(s, "SELECT x FROM pc_v")
    assert(!(before eq after), "cached plan must not survive a command")
    assert(after.collect().head.getInt(0) == 2,
      "post-command read must see the new view definition")
  }

  test("sessions do not share cache entries") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val a = PlanCache.sql(s1, "SELECT 41 + 1 AS v")
    val b = PlanCache.sql(s2, "SELECT 41 + 1 AS v")
    assert(!(a eq b), "cache keys are per session")
  }

  test("explicit invalidate drops entries") {
    val s = spark.newSession()
    val a = PlanCache.sql(s, "SELECT 'inv' AS v")
    PlanCache.invalidate(s)
    val b = PlanCache.sql(s, "SELECT 'inv' AS v")
    assert(!(a eq b))
  }

  test("side-effecting operators are excluded from the op-level cache") {
    val effectful = graft.SparkEntry.allOps.filter(!_.cacheable).map(_.name).toSet
    assert(Set("ddl_ctas", "dml_insert", "dml_overwrite", "scan_csv",
      "scan_json", "scan_partitioned", "multimodal_decode").subsetOf(effectful))
  }

  test("cached plans root at the optimized tree") {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val s = spark.newSession()
    s.range(10).createOrReplaceTempView("pc_opt")
    // 1+1 folds at optimize time: the cached dataset's own logical plan must
    // already carry the folded literal (it IS the optimized tree), so
    // per-call actions re-optimize a converged plan.
    val df = PlanCache.sql(s, "SELECT id, 1 + 1 AS two FROM pc_opt WHERE id < 5")
    val folded = df.queryExecution.logical.collectFirst {
      case p: Project => p.projectList.exists(_.toString.contains("2 AS two"))
    }
    assert(folded.contains(true),
      s"expected folded literal in cached root, got:\n${df.queryExecution.logical}")
    assert(df.count() == 5)
  }

  test("broadcast-only plans pin a static plan; shuffled-join plans stay adaptive") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val s = GraftSession.local().newSession()
    graft.Tables.ensure(s, graft.SparkTestHarness.sfDir)
    // All joins broadcast (leaf dims under the threshold) => static plan.
    val bcast = PlanCache.sql(s,
      "SELECT n_name, COUNT(*) AS c FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY n_name")
    assert(!bcast.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "broadcast-only plan should bypass adaptive execution")
    assert(bcast.count() > 0)
    // A merge/hash-shuffle join (broadcast disabled) => keeps AQE.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = PlanCache.sql(s,
        "SELECT COUNT(*) AS c FROM orders JOIN customer ON o_custkey = c_custkey")
      assert(shuffled.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "shuffled-join plan must keep adaptive execution")
      assert(shuffled.count() == 1)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
  }
}
