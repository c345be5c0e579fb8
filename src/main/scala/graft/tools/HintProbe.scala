package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** A/B the fact-join strategy: the current plans broadcast full
  * lineitem/orders scans (single-threaded driver hash build per call —
  * DriverHotspots shows LongToUnsafeRowMap.append dominating); does forcing
  * the canonical dims-broadcast/facts-shuffle shape win? Interleaved passes,
  * fresh dataset per call, live session (AQE on) — measures the end-to-end
  * latency a user's ad-hoc statement sees.
  *
  * Run: sbt "runMain graft.tools.HintProbe"
  */
object HintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val oracle = SparkEntry.oracleSql
    // (name, hint clause injected after SELECT)
    val allCases = Seq(
      "join_inner_h03" -> "/*+ BROADCAST(customer), SHUFFLE_HASH(lineitem) */",
      "tpch_h09" -> "/*+ SHUFFLE_HASH(lineitem), SHUFFLE_HASH(orders) */",
      "tpch_h09#l" -> "/*+ SHUFFLE_HASH(lineitem) */",
      "tpch_h09#o" -> "/*+ SHUFFLE_HASH(orders) */",
      "join_self_nation" -> "/*+ SHUFFLE_HASH(lineitem), SHUFFLE_HASH(orders) */",
      "join_self_nation#l" -> "/*+ SHUFFLE_HASH(lineitem) */",
      "join_self_nation#o" -> "/*+ SHUFFLE_HASH(orders) */",
      "join_left_hist" -> "/*+ SHUFFLE_HASH(orders) */",
      "tpch_h18" -> "/*+ SHUFFLE_HASH(orders) */",
      "tpch_h05" -> "/*+ SHUFFLE_HASH(lineitem), SHUFFLE_HASH(orders) */",
      "tpch_h05#l" -> "/*+ SHUFFLE_HASH(lineitem) */",
      "tpch_h05#o" -> "/*+ SHUFFLE_HASH(orders) */",
      "tpch_h05#m" -> "/*+ SHUFFLE_MERGE(lineitem) */",
      "tpch_h09#m" -> "/*+ SHUFFLE_MERGE(orders) */")
    val cases = (if (args.nonEmpty) allCases.filter(c => args.exists(a => c._1.startsWith(a)))
      else allCases.filterNot(_._1.contains("#")))
    def runSql(sql: String): Unit = { spark.sql(sql).count(); () }
    def spark1(name: String): String = {
      // The oracle SQL is ANSI enough for Spark on these shapes. A "#x"
      // suffix names a hint variant of the same base query.
      oracle(name.takeWhile(_ != '#'))
    }
    def hinted(name: String, h: String): String = {
      val s = spark1(name)
      val i = s.indexOf("SELECT")
      s.substring(0, i + 6) + " " + h + s.substring(i + 6)
    }
    val mode = sys.env.getOrElse("SPARK_GRAFT_HINT_MODE", "live")
    if (mode == "live") {
      cases.foreach { case (n, h) => runSql(spark1(n)); runSql(hinted(n, h)) } // warm
      cases.foreach { case (n, h) => runSql(spark1(n)); runSql(hinted(n, h)) }
      val as = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      val bs = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      (1 to 7).foreach { _ =>
        cases.foreach { case (n, h) =>
          var t0 = System.nanoTime(); runSql(spark1(n)); as(n) ::= (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); runSql(hinted(n, h)); bs(n) ::= (System.nanoTime() - t0) / 1e9
        }
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      cases.foreach { case (n, _) =>
        val (a, b) = (med(as(n)), med(bs(n)))
        println(f"[hint] $n%-20s plain=$a%.3f  hinted=$b%.3f  delta=${(b - a) * 1000}%+.0f ms")
      }
    } else {
      // Bench-path A/B: both variants count-wrapped, planned static under an
      // adaptive-off clone at the scaled partition count, fresh dataset per
      // call — exactly PlanCache.count's static branch.
      val clone = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
      clone.conf.set("spark.sql.adaptive.enabled", "false")
      clone.conf.set("spark.sql.shuffle.partitions", "8")
      val ops = SparkEntry.allOps.map(o => o.name -> o).toMap
      def planOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy().count().queryExecution.optimizedPlan
      val plans = cases.map { case (n, h) =>
        n -> (planOf(ops(n.takeWhile(_ != '#')).run(spark, sfDir)), planOf(spark.sql(hinted(n, h))))
      }.toMap
      def runPlan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
        val d = org.apache.spark.sql.GraftDatasetShim.ofRows(clone, p)
        d.queryExecution.executedPlan
        d.collect()(0).getLong(0); ()
      }
      (1 to 3).foreach(_ => plans.foreach { case (_, (a, b)) => runPlan(a); runPlan(b) })
      val as = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      val bs = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      (1 to 7).foreach { _ =>
        cases.foreach { case (n, _) =>
          val (pa, pb) = plans(n)
          var t0 = System.nanoTime(); runPlan(pa); as(n) ::= (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); runPlan(pb); bs(n) ::= (System.nanoTime() - t0) / 1e9
        }
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      cases.foreach { case (n, _) =>
        val (a, b) = (med(as(n)), med(bs(n)))
        println(f"[hint-static] $n%-20s plain=$a%.3f  hinted=$b%.3f  delta=${(b - a) * 1000}%+.0f ms")
      }
      if (sys.env.contains("SPARK_GRAFT_HINT_DUMP")) cases.foreach { case (n, _) =>
        val d = org.apache.spark.sql.GraftDatasetShim.ofRows(clone, plans(n)._2)
        println(s"===== $n hinted =====")
        println(d.queryExecution.executedPlan.treeString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("FileScan"))
          .map(_.take(220)).mkString("\n"))
      }
    }
    spark.stop()
  }
}
