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
    // A merge/hash-shuffle join (broadcast disabled) over a SMALL total
    // input pins static too (the size-bounded rule): AQE has nothing
    // worth re-deciding under 256 MB of scan.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smallShuffled = PlanCache.sql(s,
        "SELECT COUNT(*) AS c FROM orders JOIN customer ON o_custkey = c_custkey")
      assert(!smallShuffled.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "small-input shuffled-join plan should pin static under the size bound")
      assert(smallShuffled.count() == 1)
      // Same query with the size bound off => models the at-scale posture:
      // shuffled joins keep adaptive execution.
      s.conf.set("spark.graft.planCache.staticMaxInputBytes", "0")
      PlanCache.invalidate(s)
      val shuffled = PlanCache.sql(s,
        "SELECT COUNT(*) AS c FROM orders JOIN customer ON o_custkey = c_custkey")
      assert(shuffled.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "shuffled-join plan must keep adaptive execution beyond the size bound")
      assert(shuffled.count() == 1)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
      s.conf.unset("spark.graft.planCache.staticMaxInputBytes")
    }
  }

  test("broadcast-join-chain builds pin static under the size bound; pre-shuffled builds stay adaptive") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val s = GraftSession.local().newSession()
    graft.Tables.ensure(s, graft.SparkTestHarness.sfDir)
    // r17 relaxation: a broadcast build whose subtree is itself a pure
    // broadcast-join chain (dimension pre-reduction, the h05/h07 star
    // shapes) has nothing AQE can re-decide — the adaptive path executes
    // the identical BHJ chain. Under the size bound it must pin static.
    val chain = PlanCache.sql(s,
      "SELECT COUNT(*) AS c FROM lineitem JOIN " +
      "(SELECT s_suppkey, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey) sn " +
      "ON l_suppkey = sn.s_suppkey")
    assert(!chain.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "broadcast-join-chain build should pin static under the size bound")
    assert(chain.count() == 1)
    // The h07 self-join op carries a REUSED broadcast (the shared
    // nation-filter subtree) as a leaf — reused-broadcast leaves add no
    // input bytes and must not defeat the size bound.
    val selfNation = graft.SparkEntry.allOps.find(_.name == "join_self_nation").get
    val sn = PlanCache.get(s, "spec:join_self_nation")(
      selfNation.run(s, graft.SparkTestHarness.sfDir))
    assert(!sn.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "reused-broadcast dimension chain (h07 shape) should pin static under the size bound")
    sn.collect() // executes the pinned plan (0 rows at the spec SF — fine)
    // A broadcast build fed by a SHUFFLE that does not shrink through an
    // aggregate stays adaptive (the join_theta blocker, unchanged): its
    // build volume is per-instance map output, not leaf-bounded.
    val preShuffled = PlanCache.sql(s,
      "SELECT /*+ BROADCAST(t) */ COUNT(*) AS c FROM lineitem JOIN " +
      "(SELECT o_orderkey FROM orders DISTRIBUTE BY o_orderkey) t " +
      "ON l_orderkey = t.o_orderkey")
    assert(preShuffled.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "pre-shuffled broadcast build must keep adaptive execution")
    assert(preShuffled.count() == 1)
  }

  test("small-input pin boundary: agg must TOP a shuffle-fed build; generator builds stay blocked") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val s = GraftSession.local().newSession()
    graft.Tables.ensure(s, graft.SparkTestHarness.sfDir)
    // r17 ADVICE: under the small-input bound the r17 rule admitted any
    // shuffle-fed build with an aggregate ANYWHERE below — including one
    // where a join ABOVE the agg can re-expand rows, exactly the case where
    // a shuffle stage boundary exists for AQE to re-decide from. The build
    // here is agg(orders) ⋈ customer — aggregate below, join on top — and
    // must keep adaptive execution.
    val aggBelowJoin = PlanCache.sql(s,
      "SELECT /*+ BROADCAST(t) */ COUNT(*) AS c FROM lineitem JOIN " +
      "(SELECT c_custkey AS k FROM customer JOIN " +
      "(SELECT o_custkey FROM orders DISTRIBUTE BY o_custkey) g " +
      "ON g.o_custkey = c_custkey) t ON l_orderkey = t.k")
    assert(aggBelowJoin.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "shuffle-fed build with a join above (not topped by an aggregate) must keep adaptive execution")
    assert(aggBelowJoin.count() == 1)
    // An aggregate that TOPS the build (modulo project) still pins — the
    // r16 scalar-correlation shape the allowance exists for.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val aggTopped = PlanCache.sql(s,
        "SELECT COUNT(*) AS c FROM nation JOIN " +
        "(SELECT o_custkey AS k, COUNT(*) AS oc FROM orders GROUP BY o_custkey) t " +
        "ON n_nationkey = t.k % 25")
      // (broadcast disabled, so this goes through the small-input shuffled
      // path — the point is the plan still pins static, agg subtree and all)
      assert(!aggTopped.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "agg-topped shapes must still pin static under the size bound")
      assert(aggTopped.count() == 1)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
      PlanCache.invalidate(s)
    }
    // Generator-bearing (explode) broadcast build: blocked both by the
    // plan-wide rowMultiplier gate and by the explicit generator arm of the
    // derived-build rule (r17 verdict #7 — the belt-and-braces arm exists so
    // a future rowMultiplier edit cannot silently widen the small-input
    // allowance to exploded builds).
    val genBuild = PlanCache.sql(s,
      "SELECT /*+ BROADCAST(t) */ COUNT(*) AS c FROM part JOIN " +
      "(SELECT explode(split(r_name, ' ')) AS w FROM region) t " +
      "ON p_name LIKE concat('%', t.w, '%')")
    assert(genBuild.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "generator-bearing broadcast build must keep adaptive execution")
    assert(genBuild.count() == 1)
  }

  test("row-multiplying plans never take the small-input static pin") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val s = GraftSession.local().newSession()
    graft.Tables.ensure(s, graft.SparkTestHarness.sfDir)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // A cross join multiplies rows far beyond the leaf file bytes the
      // size bound reads (the ScaleCheck replicated-view shape: 10 MB of
      // scan becomes 10x the rows mid-plan). Such plans must keep adaptive
      // execution, whose runtime stage sizes see the true volume —
      // pinning them ran tpch_h18 at 4 partitions for a 6M-row join.
      val multiplied = PlanCache.sql(s,
        "SELECT COUNT(*) AS c FROM orders CROSS JOIN (SELECT * FROM region LIMIT 3) r " +
        "JOIN customer ON o_custkey = c_custkey")
      assert(multiplied.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "cross-join-multiplied plan must keep adaptive execution")
      assert(multiplied.count() == 1)
      // An exploded (Generate) plan under the bound is likewise excluded.
      val exploded = PlanCache.sql(s,
        "SELECT COUNT(*) AS c FROM (SELECT explode(split(p_name, ' ')) AS w, p_partkey FROM part) t " +
        "JOIN part ON t.p_partkey = part.p_partkey")
      assert(exploded.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "generator-multiplied plan must keep adaptive execution")
      assert(exploded.count() == 1)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
      PlanCache.invalidate(s)
    }
  }

  test("static-plan probe never leaks into concurrent planning in the same session") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val s = GraftSession.local().newSession()
    graft.Tables.ensure(s, graft.SparkTestHarness.sfDir)
    // One thread hammers prepare() (whose probe plans adaptive-off); the
    // other keeps planning fresh statements on the live session. With the
    // old flip-and-restore probe this raced (a statement planned in the
    // window pinned static); under the clone-based probe every live-session
    // plan must stay adaptive. 40 rounds made the old race fire reliably.
    val rounds = 40
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val leaked = new java.util.concurrent.atomic.AtomicInteger(0)
    pool.submit(new Runnable { def run(): Unit = {
      start.await()
      (0 until rounds).foreach { i =>
        PlanCache.invalidate(s) // force a fresh probe every round
        PlanCache.sql(s,
          s"SELECT n_name, COUNT(*) AS c FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY n_name HAVING COUNT(*) > $i")
      }
    }})
    pool.submit(new Runnable { def run(): Unit = {
      start.await()
      (0 until rounds).foreach { i =>
        // Planned directly on the live session, NOT through the cache: must
        // always resolve adaptive. Distinct literal per round defeats any
        // Catalyst-level reuse.
        val df = s.sql(s"SELECT o_orderpriority, COUNT(*) AS c FROM orders WHERE o_shippriority >= -$i GROUP BY o_orderpriority")
        if (!df.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec])
          leaked.incrementAndGet(): Unit
      }
    }})
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "concurrent planning timed out")
    assert(leaked.get == 0,
      s"${leaked.get}/$rounds live-session plans lost adaptive execution during probes")
  }

  test("count path returns the same value as count() and re-executes full work per call") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val s = GraftSession.local().newSession()
    graft.Tables.ensure(s, graft.SparkTestHarness.sfDir)
    val q = "SELECT o_orderpriority, COUNT(*) AS c FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY o_orderpriority"
    val expected = s.sql(q).count()
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
    }
    def measured(body: => Long): (Long, Int) = {
      s.sparkContext.addSparkListener(listener)
      stages.set(0)
      try {
        val v = body
        // listener events are async: wait until the stage count stops moving
        var last = -1
        var same = 0
        while (same < 3) { // 3 quiet polls = 300 ms with no new events
          Thread.sleep(100)
          val now = stages.get
          if (now == last) same += 1 else { same = 0; last = now }
        }
        (v, stages.get)
      } finally s.sparkContext.removeSparkListener(listener)
    }
    val (v1, stages1) = measured(PlanCache.count(s, "cnt:test")(s.sql(q)))
    val (v2, stages2) = measured(PlanCache.count(s, "cnt:test")(s.sql(q)))
    assert(v1 == expected && v2 == expected)
    // A fresh physical plan per call means fresh shuffle dependencies: the
    // second call must run the SAME stages, not skip map stages via shuffle
    // output reuse (that would make the repeated-action path elide work).
    assert(stages1 > 0)
    // the context is shared with every other suite — a stray background
    // stage (async listener stragglers, daemon flushes) can pollute one
    // window; a mismatch gets ONE clean re-measurement before failing
    val stages2Final =
      if (stages2 == stages1) stages2
      else measured(PlanCache.count(s, "cnt:test")(s.sql(q)))._2
    assert(stages2Final == stages1,
      s"second count ran $stages2Final stages vs $stages1 — work was reused, not re-executed")
    // Commands invalidate the memoized count plan alongside the plan cache.
    PlanCache.invalidate(s)
    val (v3, _) = measured(PlanCache.count(s, "cnt:test")(s.sql(q)))
    assert(v3 == expected)
  }
}
