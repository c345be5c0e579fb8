package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, CommandResult}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/** Session-scoped prepared-plan cache: repeated statement texts reuse a
  * DataFrame rooted at the OPTIMIZED logical plan instead of re-running
  * parse + analysis + full optimization, the fixed per-statement Catalyst
  * cost (~15-120 ms/statement measured on the TPC-H shapes at sf0.1 —
  * `graft.tools.CacheProbe`). The optimized root matters beyond the first
  * call: any action that re-wraps the plan (`count()` adds an aggregate,
  * `write` a command) re-runs the optimizer over the whole tree per call,
  * and over a pre-converged tree that run is one cheap fixpoint. The
  * reference engine gets the same effect from its prepared-statement reuse
  * (`/root/reference/src/duckdb/duckdb_statement.cpp` re-prepare path); on a
  * 100 TB cluster the win is latency-per-statement for the dashboard/repeat
  * workloads a long-lived server actually serves.
  *
  * Correctness contract:
  *   - Only pure queries are cached. A statement that resolves to a command
  *     (DDL/DML — anything that can change catalog or data) is never cached
  *     AND invalidates the session's cache, so a cached SELECT can never
  *     read a view/table definition from before the command.
  *   - Engine-managed mutations outside the SQL path (ATTACH/DETACH,
  *     IMPORT DATABASE, SET — SETs can re-fold GIZMOSQL_* pseudo-function
  *     literals) call [[invalidate]] explicitly.
  *   - Keys are per SparkSession (sessions are isolated `newSession`s), held
  *     weakly so closed sessions collect.
  */
object PlanCache {
  // An executed plan can pin its broadcast relations (up to
  // autoBroadcastJoinThreshold each) until evicted, so the bound is heap
  // protection as much as plan bookkeeping; eviction drops the reference
  // and the ContextCleaner reclaims the blocks.
  private val MaxEntries = 64

  private def newLru(): java.util.Map[String, DataFrame] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, DataFrame](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, DataFrame]): Boolean =
          size() > MaxEntries
      })

  // Weak identity keys, same rationale as Tables.registered.
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Map[String, DataFrame]]())

  private def store(spark: SparkSession): java.util.Map[String, DataFrame] =
    bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) { m = newLru(); bySession.put(spark, m) }
      m
    }

  /** Reuse the DataFrame prepared for `key` in this session, or build it.
    * The caller vouches that `build` is pure (no eager side effects) —
    * engine surfaces mark side-effecting operators uncacheable.
    */
  def get(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = store(spark)
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val df = prepare(spark, build)
      m.put(key, df)
      df
    }
  }

  /** Plan-shape-based adaptive bypass, decided once per prepared plan.
    *
    * Adaptive execution materializes a query stage at every exchange and
    * re-optimizes between stages — ~50-75 ms of driver dead time per round
    * (`graft.tools.JitProbe`/`Profile`, sf0.1). That buys runtime join
    * re-strategy, partition coalescing, and skew splitting — all properties
    * of SHUFFLED joins. A plan whose joins all resolved to broadcasts at
    * planning time has nothing for AQE to re-decide, so it runs the static
    * plan and skips the per-stage rounds entirely. Its remaining shuffles
    * are aggregation/sort/window exchanges (capped at 3 per fragment —
    * longer pipelines keep AQE's between-stage coalescing), where adaptivity
    * only buys coalescing of already-small outputs.
    *
    * Scope: the pin lives on THIS dataset's QueryExecution, so it serves the
    * direct-action paths — the server's collect/Arrow fetch of a prepared
    * statement, `Verify`'s writes. An action that re-wraps the plan in a new
    * operator (`count()`) plans its wrapper fresh under the session conf and
    * runs adaptive as usual.
    *
    * The probe is size-based, so it self-scales: the same query over 1000x
    * the data exceeds `autoBroadcastJoinThreshold`, plans a shuffled join,
    * and keeps full adaptive execution. Two trades: the allowed shuffles are
    * not runtime-coalesced and run at the configured
    * `spark.sql.shuffle.partitions` (the knob a real deployment sizes
    * anyway, with map-side partial aggregation shrinking what moves), and
    * the probe briefly flips the session's adaptive flag — a statement
    * planned concurrently in the same session during that window would pin
    * static too (slower, never wrong).
    */
  private def prepare(spark: SparkSession, build: => DataFrame): DataFrame = {
    val built = build
    // Root the cached dataset at the OPTIMIZED plan. Actions re-wrap a
    // DataFrame's logical plan in a fresh operator (`count()` adds an
    // aggregate, `write` a command) and re-run the full optimizer over the
    // whole tree on every call — 15-120 ms/statement on the TPC-H shapes.
    // Rooted at the converged tree, those per-call optimizer runs re-visit
    // an already-optimal plan and converge in one cheap pass, which is what
    // a re-executed prepared statement should pay. Rules are idempotent by
    // Catalyst's own contract (enforced for Once-batches in its test
    // harness), and the full DuckDB oracle runs against the cached form.
    val optimized = built.queryExecution.optimizedPlan
    def snapped: DataFrame =
      org.apache.spark.sql.GraftDatasetShim.ofRows(spark, optimized)
    val df = snapped
    if (spark.conf.get("spark.sql.adaptive.enabled", "true") != "true") return df
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // Forcing executedPlan under adaptive-off pins the static plan on this
    // QueryExecution (plans are cached per Dataset), so the eligible branch
    // returns `df` as-is and every later action runs the static plan.
    val eligible = try {
      def fragments(p: SparkPlan): Seq[SparkPlan] = p +: p.subqueries.flatMap(fragments)
      val all = fragments(df.queryExecution.executedPlan)
      val shuffledJoin = all.exists(_.exists {
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _ => false
      })
      // Broadcast builds must be LEAF dimensions: scan + filter/project only,
      // nothing derived. A derived build side (aggregate, explode, join, or
      // an exchange feeding it) marks a plan where the static planner is
      // about to hash-build a computed relation on the driver — the shapes
      // where adaptive execution earns its rounds (measured: join_theta
      // 0.15 s adaptive vs 0.41 s static when the planner broadcast a
      // 600k-row pre-shuffled side; dedup_minhash_lsh recomputed its whole
      // minhash aggregation as a broadcast build). Small file scans are the
      // one thing the static planner can size honestly.
      val derivedBuild = all.exists(_.exists {
        case b: BroadcastExchangeExec => b.child.exists {
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
          case _: org.apache.spark.sql.execution.GenerateExec => true
          case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
          case _: org.apache.spark.sql.execution.exchange.Exchange => true
          case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
          case _ => false
        }
        case _ => false
      })
      !shuffledJoin && !derivedBuild && all.forall(
        _.collect { case e: ShuffleExchangeExec => e }.size <= 3)
    } catch { case scala.util.control.NonFatal(_) => false }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // Ineligible: this df's physical plan is already pinned adaptive-off, so
    // hand back a sibling over the same optimized tree — its executedPlan is
    // still unforced and resolves adaptive at first use.
    if (eligible) df else snapped
  }

  /** Run a SQL text through the cache. Commands execute eagerly in
    * `spark.sql` — they are detected from the analyzed plan, never cached,
    * and flush the session's cache (they may have changed what cached plans
    * resolved against).
    */
  def sql(spark: SparkSession, text: String): DataFrame = {
    val m = store(spark)
    val hit = m.get(text)
    if (hit != null) hit
    else {
      val df = spark.sql(text)
      val isCommand = df.queryExecution.analyzed.collectFirst {
        case c: Command => c
        case r: CommandResult => r
      }.isDefined
      if (isCommand) { invalidate(spark); df }
      else {
        val prepared = prepare(spark, df)
        m.put(text, prepared)
        prepared
      }
    }
  }

  def invalidate(spark: SparkSession): Unit = bySession.remove(spark)
}
