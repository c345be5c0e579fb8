package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** File-format sources and DDL/DML (SURVEY.md §2.B "Scans / sources / sinks"
  * and "DDL / DML"): CSV and JSON scans (the reference's `read_csv_auto` /
  * `read_json_auto` surface, gated-function list
  * `admin_command_guard.cpp:107-115`) and CTAS/INSERT through the SQL door.
  *
  * The CSV/JSON ops first materialize a deterministic file under /tmp (sink
  * direction — `COPY ... TO` equivalent) then scan it back, so one op
  * exercises both the writer and the reader; the DuckDB oracle reads the
  * same files.
  */
object SourceOps {

  /** Shared scratch dir for sink-then-scan ops (also `multimodal_decode`). */
  val ioDir = "/tmp/graft_io"

  private def deleteManagedTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    // a stale location from a previous JVM would fail CREATE (the in-memory
    // catalog resets but the filesystem does not)
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  val ops: Seq[Op] = Seq(
    Op.effectful("scan_csv",
      s"SELECT CAST(r_regionkey AS INTEGER) AS k, r_name AS name " +
      s"FROM read_csv_auto('$ioDir/region_csv/*.csv', header=true) ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      s.table("region").orderBy("r_regionkey")
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$ioDir/region_csv")
      s.read.schema("r_regionkey INT, r_name STRING").option("header", "true")
        .csv(s"$ioDir/region_csv")
        .select(col("r_regionkey").as("k"), col("r_name").as("name"))
        .orderBy("k")
    },

    // ORC sink + scan (the other columnar format Spark ships natively).
    // DuckDB has no ORC reader, so the oracle reads the SOURCE parquet
    // table instead: the check is a write→read ROUND-TRIP — any value the
    // ORC path corrupts or retypes diverges from the parquet original.
    Op.effectful("scan_orc",
      "SELECT n_nationkey AS k, n_name AS name, n_regionkey AS rk " +
      "FROM nation ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      s.table("nation")
        .write.mode("overwrite").orc(s"$ioDir/nation_orc")
      s.read.orc(s"$ioDir/nation_orc")
        .select(col("n_nationkey").as("k"), col("n_name").as("name"),
          col("n_regionkey").as("rk"))
        .orderBy("k")
    },

    Op.effectful("scan_json",
      s"SELECT CAST(n_nationkey AS INTEGER) AS k, n_name AS name, CAST(n_regionkey AS INTEGER) AS rk " +
      s"FROM read_json_auto('$ioDir/nation_json/*.json') ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      s.table("nation").orderBy("n_nationkey")
        .coalesce(1).write.mode("overwrite").json(s"$ioDir/nation_json")
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(s"$ioDir/nation_json")
        .select(col("n_nationkey").as("k"), col("n_name").as("name"), col("n_regionkey").as("rk"))
        .orderBy("k")
    },

    // CTAS through the SQL front door (temporary view flavor — the
    // reference's `CREATE TABLE ... AS` on its temp catalog).
    Op.effectful("ddl_ctas",
      "SELECT s_nationkey, COUNT(*) AS big FROM (SELECT * FROM supplier WHERE s_acctbal > 5000) t " +
      "GROUP BY s_nationkey ORDER BY s_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("CREATE OR REPLACE TEMPORARY VIEW big_suppliers AS SELECT * FROM supplier WHERE s_acctbal > 5000")
      s.sql("SELECT s_nationkey, COUNT(*) AS big FROM big_suppliers GROUP BY s_nationkey ORDER BY s_nationkey")
    },

    // Hive-partitioned parquet sink + pruned scan: the write lays out
    // o_orderstatus=<v>/ directories and the filtered read-back prunes to one
    // partition (PartitionFilters in the plan) — the layout/pruning pair that
    // carries a 100 TB dataset. DuckDB reads the same files with
    // hive_partitioning.
    Op.effectful("scan_partitioned",
      s"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, " +
      s"CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))),2) AS DOUBLE) AS total " +
      s"FROM read_parquet('$ioDir/orders_part/*/*.parquet', hive_partitioning=1) " +
      s"WHERE o_orderstatus='F' GROUP BY o_orderstatus ORDER BY o_orderstatus") { (s, d) =>
      Tables.ensure(s, d)
      s.table("orders")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$ioDir/orders_part")
      s.read.parquet(s"$ioDir/orders_part")
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum(Money.dec2("o_totalprice")), 2).cast("double").as("total"))
        .orderBy("o_orderstatus")
    },

    // UPDATE-equivalent on immutable storage: INSERT OVERWRITE with a
    // CASE-rewritten projection — the explicit form of what the engine's
    // RowDml copy-on-write path (dml_update/dml_delete/dml_merge below) now
    // does for real UPDATE/DELETE/MERGE statements.
    Op.effectful("dml_overwrite",
      "SELECT k, name FROM (SELECT r_regionkey AS k, " +
      "CASE WHEN r_regionkey = 2 THEN 'ASIA-PACIFIC' ELSE r_name END AS name FROM region) t ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_upd_target")
      s.table("region").write.saveAsTable("graft_upd_target")
      s.sql("INSERT OVERWRITE TABLE graft_upd_target " +
        "SELECT r_regionkey, CASE WHEN r_regionkey = 2 THEN 'ASIA-PACIFIC' ELSE r_name END FROM region")
      s.table("graft_upd_target")
        .select(col("r_regionkey").as("k"), col("r_name").as("name")).orderBy("k")
    },

    // Managed-table DDL + INSERT INTO (affected-row DML path,
    // SURVEY.md §2.A rows 7-8), read back in full.
    Op.effectful("dml_insert",
      "SELECT k, name FROM (SELECT r_regionkey AS k, r_name AS name FROM region " +
      "UNION ALL SELECT 99, 'ATLANTIS') t ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_dml_target")
      s.table("region")
        .select(col("r_regionkey").as("k"), col("r_name").as("name"))
        .write.saveAsTable("graft_dml_target")
      s.sql("INSERT INTO graft_dml_target VALUES (99, 'ATLANTIS')")
      s.table("graft_dml_target").orderBy("k")
    },

    // Row-level UPDATE via the engine's copy-on-write path (RowDml): parsed
    // by Spark's parser, executed as read -> CASE projection -> partition-
    // scoped INSERT OVERWRITE; affected count checked in DmlSpec. The oracle
    // recomputes the post-state from the immutable fixture.
    Op.effectful("dml_update",
      "SELECT s_suppkey, CASE WHEN s_nationkey = 3 THEN s_name || '_ADJ' ELSE s_name END AS s_name, " +
      "s_nationkey, CASE WHEN s_nationkey = 3 THEN s_acctbal + 100 ELSE s_acctbal END AS s_acctbal " +
      "FROM supplier ORDER BY s_suppkey") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_cow_upd")
      s.table("supplier").write.saveAsTable("graft_cow_upd")
      graft.sources.RowDml.execute(s,
        "UPDATE graft_cow_upd SET s_name = CONCAT(s_name, '_ADJ'), s_acctbal = s_acctbal + 100 " +
        "WHERE s_nationkey = 3")
      s.table("graft_cow_upd").orderBy("s_suppkey")
    },

    // Row-level DELETE via copy-on-write (kept rows rewritten, affected
    // partitions only on partitioned targets; see DmlSpec).
    Op.effectful("dml_delete",
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer " +
      "WHERE NOT (c_acctbal < 0 AND c_mktsegment = 'BUILDING') ORDER BY c_custkey") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_cow_del")
      s.table("customer").write.saveAsTable("graft_cow_del")
      graft.sources.RowDml.execute(s,
        "DELETE FROM graft_cow_del WHERE c_acctbal < 0 AND c_mktsegment = 'BUILDING'")
      s.table("graft_cow_del").orderBy("c_custkey")
    },

    // MERGE (upsert): matched rows take the source's name, unmatched source
    // rows insert — the full-outer-join copy-on-write form.
    Op.effectful("dml_merge",
      "SELECT n_nationkey, CASE WHEN n_nationkey = 0 THEN 'N_ZERO' WHEN n_nationkey = 24 THEN 'N_LAST' " +
      "ELSE n_name END AS n_name, n_regionkey FROM nation " +
      "UNION ALL SELECT 99, 'N_NEW', 2 ORDER BY n_nationkey") { (s, d) =>
      import s.implicits._
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_cow_tgt")
      s.table("nation").write.saveAsTable("graft_cow_tgt")
      Seq((0, "N_ZERO", 0), (24, "N_LAST", 4), (99, "N_NEW", 2))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_cow_src")
      graft.sources.RowDml.execute(s,
        "MERGE INTO graft_cow_tgt t USING graft_cow_src s ON t.n_nationkey = s.n_nationkey " +
        "WHEN MATCHED THEN UPDATE SET n_name = s.n_name " +
        "WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey) " +
        "VALUES (s.n_nationkey, s.n_name, s.n_regionkey)")
      s.table("graft_cow_tgt").orderBy("n_nationkey")
    },

    // MERGE with WHEN NOT MATCHED BY SOURCE (r12): matched rows (region 2)
    // update from the source, unmatched region-0 rows are deleted by the
    // first NMBS action, every other unmatched row takes the second NMBS
    // action's target-only update. Oracle = the post-state as a SELECT.
    Op.effectful("dml_merge_by_source",
      "SELECT n_nationkey, CASE WHEN n_regionkey = 2 THEN 'IN_SRC' " +
      "ELSE n_name || '_STALE' END AS n_name, n_regionkey FROM nation " +
      "WHERE n_regionkey <> 0 ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_nmbs_tgt")
      s.table("nation").write.saveAsTable("graft_nmbs_tgt")
      s.sql("SELECT n_nationkey FROM nation WHERE n_regionkey = 2")
        .createOrReplaceTempView("graft_nmbs_src")
      graft.sources.RowDml.execute(s,
        "MERGE INTO graft_nmbs_tgt t USING graft_nmbs_src s ON t.n_nationkey = s.n_nationkey " +
        "WHEN MATCHED THEN UPDATE SET n_name = 'IN_SRC' " +
        "WHEN NOT MATCHED BY SOURCE AND t.n_regionkey = 0 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_name = CONCAT(n_name, '_STALE')")
      s.table("graft_nmbs_tgt").orderBy("n_nationkey")
    },

    // MERGE ... RETURNING (r12): the affected-row stream itself is the op
    // result — post-image for updates, pre-image for deletes, discriminated
    // by merge_action. The oracle recomputes all three classes per row.
    Op.effectful("dml_merge_returning",
      "SELECT n_nationkey, CASE WHEN n_regionkey = 2 THEN 'IN_SRC' " +
      "WHEN n_regionkey = 0 THEN n_name ELSE n_name || '_STALE' END AS n_name, " +
      "CASE WHEN n_regionkey = 0 THEN 'DELETE' ELSE 'UPDATE' END AS merge_action " +
      "FROM nation ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_mret_tgt")
      s.table("nation").write.saveAsTable("graft_mret_tgt")
      s.sql("SELECT n_nationkey FROM nation WHERE n_regionkey = 2")
        .createOrReplaceTempView("graft_mret_src")
      graft.sources.RowDml.execute(s,
        "MERGE INTO graft_mret_tgt t USING graft_mret_src s ON t.n_nationkey = s.n_nationkey " +
        "WHEN MATCHED THEN UPDATE SET n_name = 'IN_SRC' " +
        "WHEN NOT MATCHED BY SOURCE AND t.n_regionkey = 0 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n_name = CONCAT(n_name, '_STALE') " +
        "RETURNING n_nationkey, n_name, merge_action")
        .orderBy("n_nationkey")
    },

    // DuckDB upsert: INSERT ... ON CONFLICT (k) DO UPDATE, desugared to
    // MERGE by plans.OnConflictRewrite and executed by the copy-on-write
    // path. Oracle = the expected post-upsert state as a SELECT (the
    // dml_merge pattern: DuckDB describes the result, Spark produces it).
    Op.effectful("dml_upsert",
      "SELECT n_nationkey, CASE WHEN n_nationkey = 3 THEN 'N_UPSERT' ELSE n_name END AS n_name, " +
      "CASE WHEN n_nationkey = 3 THEN 77 ELSE n_regionkey END AS n_regionkey FROM nation " +
      "UNION ALL SELECT 88, 'N_FRESH', 1 ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      deleteManagedTable(s, "graft_ups_tgt")
      s.table("nation").write.saveAsTable("graft_ups_tgt")
      val merged = graft.plans.OnConflictRewrite.rewrite(
        "INSERT INTO graft_ups_tgt (n_nationkey, n_name, n_regionkey) " +
        "VALUES (3, 'N_UPSERT', 77), (88, 'N_FRESH', 1) " +
        "ON CONFLICT (n_nationkey) DO UPDATE SET n_name = excluded.n_name, " +
        "n_regionkey = excluded.n_regionkey", s)
      graft.sources.RowDml.execute(s, merged)
      s.table("graft_ups_tgt").orderBy("n_nationkey")
    }
  )
}
