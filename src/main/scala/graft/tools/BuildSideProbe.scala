package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compare build-side choices for the DataFrame-coded fact joins (h03,
  * join_self_nation) and the SQL h05, through the bench's static path.
  * Variants reconstruct the op with different shuffle_hash/broadcast hint
  * placements — the build side is the hinted relation.
  */
object BuildSideProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    def ts(s: String) = lit(java.time.LocalDateTime.parse(s)).cast("timestamp_ntz")
    def t(n: String) = spark.table(n)

    def h03(lineitemHint: Boolean, leftHint: Boolean): DataFrame = {
      val customer = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = t("orders").filter(col("o_orderdate") < ts("1998-01-01T00:00"))
      val lineitem0 = t("lineitem").filter(col("l_shipdate") > ts("1997-01-01T00:00"))
      val lineitem = if (lineitemHint) lineitem0.hint("shuffle_hash") else lineitem0
      val left0 = broadcast(customer).join(orders, col("c_custkey") === col("o_custkey"))
      val left = if (leftHint) left0.hint("shuffle_hash") else left0
      left.join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("odate"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }

    def selfNation(ordersHint: Boolean, suppBcast: Boolean): DataFrame = {
      val n1 = t("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val supp0 = t("supplier").join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      val supp = if (suppBcast) broadcast(supp0) else supp0
      val orders0 = t("orders")
      val orders = if (ordersHint) orders0.hint("shuffle_hash") else orders0
      supp.join(t("lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(orders, col("o_orderkey") === col("l_orderkey"))
        .join(t("customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }

    // Canonical star shape: the fact streams, dimension SCANS build — no
    // derived broadcast (keeps static-pin eligibility), nothing pinned on
    // the fact side.
    def selfNationStar(): DataFrame = {
      val n1 = t("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t("lineitem")
        .join(broadcast(t("supplier")), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(t("orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t("customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }

    def h18(v: Int): DataFrame = {
      val qty0 = t("lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q")).filter(col("q") > 150)
      val qty = v match {
        case 1 => qty0.hint("shuffle_hash") // build the tiny HAVING side per partition
        case 2 => broadcast(qty0)
        case _ => qty0
      }
      qty.join(t("orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t("customer").select("c_custkey"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("odate"),
          round(col("o_totalprice"), 2).as("price"),
          round(col("q"), 2).as("total_qty"))
        .orderBy(col("price").desc, col("o_orderkey")).limit(20)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "h18 plain" -> (() => h18(0)),
      "h18 shj qty" -> (() => h18(1)),
      "h18 bcast qty" -> (() => h18(2)),
      "sn star" -> (() => selfNationStar()),
      "h03 plain" -> (() => h03(false, false)),
      "h03 build=lineitem" -> (() => h03(true, false)),
      "h03 build=cust*ord" -> (() => h03(false, true)),
      "sn plain" -> (() => selfNation(false, false)),
      "sn build=orders" -> (() => selfNation(true, false)),
      "sn bcast supp" -> (() => selfNation(false, true)),
      "sn orders+supp" -> (() => selfNation(true, true)))

    val clone = org.apache.spark.sql.GraftDatasetShim.cloneSession(spark)
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    clone.conf.set("spark.sql.shuffle.partitions", "8")
    val plans = variants.map { case (n, f) =>
      n -> f().groupBy().count().queryExecution.optimizedPlan
    }
    def runPlan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
      val d = org.apache.spark.sql.GraftDatasetShim.ofRows(clone, p)
      d.queryExecution.executedPlan
      d.collect()(0).getLong(0); ()
    }
    (1 to 3).foreach(_ => plans.foreach { case (_, p) => runPlan(p) })
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to 7).foreach { _ =>
      plans.foreach { case (n, p) =>
        val t0 = System.nanoTime(); runPlan(p); acc(n) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    plans.foreach { case (n, _) =>
      println(f"[bside] $n%-22s ${med(acc(n))}%.3f s")
    }
    // Result equivalence across variants.
    val r0 = h03(false, false).collect().map(_.toString).sorted.toSeq
    assert(h03(true, false).collect().map(_.toString).sorted.toSeq == r0)
    assert(h03(false, true).collect().map(_.toString).sorted.toSeq == r0)
    val s0 = selfNation(false, false).collect().map(_.toString).sorted.toSeq
    assert(selfNation(true, true).collect().map(_.toString).sorted.toSeq == s0)
    assert(selfNationStar().collect().map(_.toString).sorted.toSeq == s0)
    println("[bside] variant results identical")
    spark.stop()
  }
}
