package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}
import graft.operators.{Money, SizeGate}

/** r17 candidate shapes, A/B'd against the shipping implementations in one
  * window (count-action medians, interleaved) + row-equality sanity.
  *
  * Run: sbt "runMain graft.tools.R17Shapes [name ...]"
  */
object R17Shapes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    def ts(s: String) = to_timestamp(lit(s)).cast("timestamp_ntz")

    // join_self_nation v2: pre-join orders with the nation-reduced customer
    // dim BEFORE broadcasting, so the fact-side broadcast build shrinks from
    // |orders| (150k rows) to |orders of 2-nation customers| (~8%), and the
    // lineitem probe prunes on BOTH dims at the first two joins.
    def selfNationV2(s: SparkSession): DataFrame = {
      val n1 = s.table("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = s.table("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val suppNation = broadcast(s.table("supplier")
        .join(n1, col("s_nationkey") === col("n1_key"))
        .select(col("s_suppkey"), col("supp_nation")))
      val custNation = broadcast(s.table("customer")
        .join(n2, col("c_nationkey") === col("n2_key"))
        .select(col("c_custkey"), col("cust_nation")))
      // Gate on ORDERS (the bounding input): the joined build is at most
      // orders-sized under unique custkeys, and the gate fails at scale.
      val ordCust = s.table("orders").select("o_orderkey", "o_custkey")
        .join(custNation, col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      val ordSide =
        if (SizeGate.isDimensionSized(s.table("orders"))) broadcast(ordCust)
        else ordCust.hint("shuffle_hash")
      s.table("lineitem")
        .join(suppNation, col("s_suppkey") === col("l_suppkey"))
        .join(ordSide, col("o_orderkey") === col("l_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(Money.revDec), 2).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }

    // join_left_hist v2: aggregate orders by o_custkey BEFORE the join
    // (guide §2.3 — aggregate before you shuffle), then attach counts to
    // customer. sum(coalesce(k,0)) per c_custkey reproduces the original
    // COUNT(o_orderkey) exactly, including duplicate-custkey fan-out.
    def leftHistV2(s: SparkSession): DataFrame = {
      val oCnt = s.table("orders").groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("k"))
      s.table("customer").select("c_custkey").hint("shuffle_hash")
        .join(oCnt, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(sum(coalesce(col("k"), lit(0L))).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }

    // v3: same but the pre-aggregated orders side broadcast under the gate.
    def leftHistV3(s: SparkSession): DataFrame = {
      val oCnt = s.table("orders").groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("k"))
      val oSide =
        if (SizeGate.isDimensionSized(s.table("orders"))) broadcast(oCnt)
        else oCnt.hint("shuffle_hash")
      s.table("customer").select("c_custkey")
        .join(oSide, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(sum(coalesce(col("k"), lit(0L))).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }

    // join_inner_h03 v2: pre-aggregate filtered lineitem revenue by orderkey
    // before the fact-fact join (map-side partial agg shrinks the shuffle).
    def h03V2(s: SparkSession): DataFrame = {
      val rev = s.table("lineitem")
        .filter(col("l_shipdate") > ts("1997-01-01"))
        .groupBy(col("l_orderkey"))
        .agg(sum(Money.revDec).as("rev"))
      broadcast(s.table("customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey"))
        .join(s.table("orders").filter(col("o_orderdate") < ts("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("c_custkey") === col("o_custkey"))
        .hint("shuffle_hash")
        .join(rev, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("rev")), 2).cast("double").as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("odate"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }

    // events_hourly probe: double sum instead of decimal (NOT a shipping
    // candidate unless exact on the fixture — quantifies decimal agg cost).
    def eventsDouble(s: SparkSession): DataFrame = {
      s.table("events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("v"))
        .orderBy("h", "event_type")
    }

    val q = SparkEntry.queries
    def med(f: () => Unit): Double = {
      (1 to 3).foreach(_ => f())
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }.sorted.apply(3)
    }
    val variants: Seq[(String, String, SparkSession => DataFrame)] = Seq(
      ("join_self_nation", "v2-ordCustBcast", selfNationV2 _),
      ("join_left_hist", "v2-preAggShj", leftHistV2 _),
      ("join_left_hist", "v3-preAggBcast", leftHistV3 _),
      ("join_inner_h03", "v2-preAggRev", h03V2 _),
      ("events_hourly", "probe-doubleSum", eventsDouble _))
    val wanted = if (args.nonEmpty) args.toSet else variants.map(_._2).toSet
    // Route BOTH sides through the bench's PlanCache.count path so the A/B
    // compares execution, not per-call re-analysis (the shipping side is
    // plan-cached; an uncached alt pays ~50-150 ms of Catalyst per call).
    val cq = SparkEntry.countQueries
    variants.filter(v => wanted(v._2)).foreach { case (base, label, alt) =>
      val cur = med(() => { cq(base)(spark, sfDir): Unit })
      val a = med(() => {
        graft.engine.PlanCache.count(spark, s"r17alt:$base:$label")(alt(spark)): Unit
      })
      val cur2 = med(() => { cq(base)(spark, sfDir): Unit })
      val curRows = q(base)(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val altRows = alt(spark).collect().map(_.toString).sorted.toSeq
      println(f"[shapes] $base%-18s $label%-16s cur=$cur%5.0f/$cur2%5.0f ms  alt=$a%5.0f ms  " +
        f"delta=${a - math.min(cur, cur2)}%+5.0f  rowsEqual=${curRows == altRows}")
    }
    spark.stop()
  }
}
