package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}

/** Prototype alternative join shapes against the current implementations
  * (scratch tool): flatten sequential broadcast chains into star probes so
  * independent dimension builds materialize concurrently (fewer sequential
  * stage rounds).
  */
object AltShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensure(spark, sfDir)
    def ts(s: String) = to_timestamp(lit(s)).cast("timestamp_ntz")

    def h05Alt(s: SparkSession): DataFrame = {
      val asiaN = s.table("nation").join(
        broadcast(s.table("region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")).select("n_nationkey", "n_name")
      val supp = s.table("supplier").join(broadcast(asiaN), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = s.table("customer").join(broadcast(asiaN.select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = s.table("orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      s.table("lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    def selfNationAlt(s: SparkSession): DataFrame = {
      val n1 = s.table("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = s.table("nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val supp = s.table("supplier").join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = s.table("customer").join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .select(col("c_custkey"), col("cust_nation"))
      val ord = s.table("orders").join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      s.table("lineitem")
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("o_orderkey") === col("l_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }

    val q = SparkEntry.queries
    def med(f: () => Unit): Double = {
      (1 to 3).foreach(_ => f())
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(3)
    }
    Seq(
      ("tpch_h05", () => { q("tpch_h05")(spark, sfDir).count(): Unit },
        () => { h05Alt(spark).count(): Unit }),
      ("join_self_nation", () => { q("join_self_nation")(spark, sfDir).count(): Unit },
        () => { selfNationAlt(spark).count(): Unit })
    ).foreach { case (n, cur, alt) =>
      val c = med(cur); val a = med(alt)
      println(f"[alt] $n%-20s current=$c%5.0f ms  star=$a%5.0f ms  delta=${a - c}%+5.0f")
    }
    // sanity: same results
    val curRows = q("tpch_h05")(spark, sfDir).collect().map(_.toString).sorted
    val altRows = h05Alt(spark).collect().map(_.toString).sorted
    println(s"[alt] h05 rows equal: ${curRows.sameElements(altRows)} (${curRows.length})")
    val c2 = q("join_self_nation")(spark, sfDir).collect().map(_.toString).sorted
    val a2 = selfNationAlt(spark).collect().map(_.toString).sorted
    println(s"[alt] self_nation rows equal: ${c2.sameElements(a2)} (${c2.length})")
    spark.stop()
  }
}
