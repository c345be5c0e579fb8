package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Relational.ts

/** Set operations, sorts/top-k, and CTEs (SURVEY.md §2.B "Set operations",
  * "Sorts / limits / top-k", "CTEs, derived tables, subqueries").
  *
  * NULL-ordering parity: the reference declares NULLS SORTED AT END
  * (`duckdb_sql_info.cpp:226-227`) while Spark's ascending default is NULLS
  * FIRST — every sort over nullable keys here states its null order
  * explicitly on both sides.
  */
object SetsSortsCtes {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table(name)
  }

  val ops: Seq[Op] = Seq(
    // ORDER BY + LIMIT compiles to TakeOrderedAndProject (distributed top-k:
    // per-partition heaps, no global sort).
    Op("topk",
      "SELECT s_name, ROUND(s_acctbal,2) AS bal FROM supplier ORDER BY bal DESC, s_name LIMIT 10") { (s, d) =>
      t(s, d, "supplier")
        .select(col("s_name"), round(col("s_acctbal"), 2).as("bal"))
        .orderBy(col("bal").desc, col("s_name")).limit(10)
    },

    Op("sort_nulls",
      "SELECT c_custkey, NULLIF(c_mktsegment,'BUILDING') AS seg FROM customer ORDER BY seg NULLS FIRST, c_custkey LIMIT 100") { (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
        .orderBy(col("seg").asc_nulls_first, col("c_custkey")).limit(100)
    },

    Op("set_intersect",
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    Op("set_union",
      "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k")
    },

    Op("set_union_all",
      "SELECT COUNT(*) AS n FROM (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier) t") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .agg(count(lit(1)).as("n"))
    },

    Op("set_except",
      "SELECT k FROM (SELECT DISTINCT c_nationkey AS k FROM customer EXCEPT SELECT n_nationkey FROM nation WHERE n_regionkey=0) t ORDER BY k") { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k")).distinct()
        .except(t(s, d, "nation").filter(col("n_regionkey") === 0).select(col("n_nationkey").as("k")))
        .orderBy("k")
    },

    // TPC-H h15: CTE reused both as join input and inside a scalar subquery.
    // Spark inlines a CTE into each consumer, so the naive agg-then-rejoin
    // formulation re-expanded `revenue` into three lineitem scans / nine
    // shuffles (PLANS.md r8). Instead the scalar MAX rides a global window
    // over the aggregate OUTPUT: one lineitem scan, one suppkey shuffle,
    // then a single-partition pass over one-row-per-active-supplier — the
    // same row set DuckDB's CTE materialization holds single-node. At
    // cluster scale the window input is |suppliers| rows, not the fact
    // table; that stays a deliberate single task because re-deriving the
    // max any other way re-expands the CTE subtree in Spark's DAG model.
    Op("cte_h15",
      s"WITH revenue AS (SELECT l_suppkey AS supplier_no, CAST(ROUND(SUM(${Money.SqlRev}),2) AS DOUBLE) AS total_revenue " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_revenue FROM supplier JOIN revenue ON s_suppkey=supplier_no " +
      "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) ORDER BY s_suppkey") { (s, d) =>
      val revenue = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01T00:00") && col("l_shipdate") < ts("1996-04-01T00:00"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(Money.revDec), 2).cast("double").as("total_revenue"))
      val best = revenue
        .withColumn("m", max(col("total_revenue")).over(Window.partitionBy()))
        .filter(col("total_revenue") === col("m"))
      t(s, d, "supplier")
        .join(best, col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // Position-independent union: Spark unionByName ↔ DuckDB UNION ALL BY NAME.
    Op("set_union_byname",
      "SELECT k, v FROM (SELECT r_regionkey AS k, r_name AS v FROM region " +
      "UNION ALL BY NAME SELECT n_name AS v, n_nationkey+100 AS k FROM nation) t ORDER BY k") { (s, d) =>
      val a = t(s, d, "region").select(col("r_regionkey").as("k"), col("r_name").as("v"))
      val b = t(s, d, "nation").select(col("n_name").as("v"), (col("n_nationkey") + 100).as("k"))
      a.unionByName(b).orderBy("k")
    },

    // Recursive CTE (Spark 4 + DuckDB, same syntax): expand each region into
    // a numbered series and aggregate it back.
    Op("cte_recursive",
      "WITH RECURSIVE r(k, n) AS (SELECT r_regionkey, 1 FROM region " +
      "UNION ALL SELECT k, n+1 FROM r WHERE n < k+2) " +
      "SELECT k, CAST(COUNT(*) AS BIGINT) AS steps, CAST(SUM(n) AS BIGINT) AS total FROM r GROUP BY k ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("WITH RECURSIVE r(k, n) AS (SELECT r_regionkey, 1 FROM region " +
        "UNION ALL SELECT k, n+1 FROM r WHERE n < k+2) " +
        "SELECT k, COUNT(*) AS steps, SUM(n) AS total FROM r GROUP BY k ORDER BY k")
    }
  )
}
