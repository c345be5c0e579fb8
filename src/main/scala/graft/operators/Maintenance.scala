package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset maintenance + operability diagnostics: the jobs a pipeline team
  * runs AROUND the data rather than on it — small-file compaction planning,
  * join-key skew measurement, and telemetry event dedup. Each is
  * oracle-checked like every other op.
  */
object Maintenance {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("documents")
  }

  val ops: Seq[Op] = Seq(

    // Small-file compaction planning: per-file row counts of a real
    // multi-file parquet dataset (written here, then listed back via
    // input_file_name), greedily packed into target-size bins by cumulative
    // count in filename order — the plan an OPTIMIZE/rewrite job executes
    // with one `repartition`-per-bin write. Scale: the per-FILE aggregate
    // distributes over the data; the prefix-sum window runs over the file
    // LISTING (one row per file — metadata-sized, like a catalog's file
    // manifest), not over rows. Oracle: DuckDB lists the same directory
    // with read_parquet(..., filename=true) and replays the same binning.
    Op.effectful("pipeline_compact_plan", {
      val dir = s"${SourceOps.ioDir}/compact_src"
      "WITH f AS (SELECT REGEXP_EXTRACT(filename, '([^/]+)$', 1) AS fname, " +
      s"CAST(COUNT(*) AS BIGINT) AS cnt FROM read_parquet('$dir/*.parquet', filename=true) GROUP BY 1), " +
      "o AS (SELECT fname, cnt, COALESCE(SUM(cnt) OVER " +
      "(ORDER BY fname ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM f) " +
      "SELECT CAST(cum // 120 AS INTEGER) AS bin, CAST(COUNT(*) AS BIGINT) AS n_files, " +
      "CAST(SUM(cnt) AS BIGINT) AS n_rows FROM o GROUP BY 1 ORDER BY 1"
    }) { (s, d) =>
      val dir = s"${SourceOps.ioDir}/compact_src"
      docs(s, d).select("doc_id", "source", "text")
        .repartition(13, col("doc_id"))
        .write.mode("overwrite").parquet(dir)
      val perFile = s.read.parquet(dir)
        .withColumn("fname", regexp_extract(input_file_name(), "([^/]+)$", 1))
        .groupBy("fname").agg(count(lit(1)).as("cnt"))
      val wCum = Window.orderBy("fname").rowsBetween(Window.unboundedPreceding, -1)
      perFile
        .withColumn("cum", coalesce(sum("cnt").over(wCum), lit(0L)))
        .select(expr("cast(cum div 120 as int)").as("bin"), col("cnt"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_files"), sum("cnt").cast("long").as("n_rows"))
        .orderBy("bin")
    },

    // Join-key skew report: the diagnostic run BEFORE choosing between a
    // plain shuffle join, AQE skew splitting, and explicit salting
    // (ScaleTechniques.saltedEquiJoin). One row: key cardinality, max and
    // quantile per-key counts, and max/avg ratio in integer milli-units
    // (1000 = perfectly uniform). Scale: one map-side-combined count per
    // key, then a single-row aggregate — nothing driver-side.
    Op("agg_key_skew",
      "WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY 1) " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total, " +
      "CAST(MAX(cnt) AS BIGINT) AS max_cnt, " +
      "CAST(QUANTILE_DISC(cnt, 0.5) AS BIGINT) AS p50_cnt, " +
      "CAST(QUANTILE_DISC(cnt, 0.99) AS BIGINT) AS p99_cnt, " +
      "CAST(MAX(cnt) * 1000 * COUNT(*) // SUM(cnt) AS BIGINT) AS skew_milli " +
      "FROM c") { (s, d) =>
      Tables.ensure(s, d)
      s.table("orders").groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"), sum("cnt").cast("long").as("total"),
          max("cnt").as("max_cnt"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)").cast("long").as("p50_cnt"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)").cast("long").as("p99_cnt"))
        .select(col("n_keys"), col("total"), col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
          expr("max_cnt * 1000L * n_keys div total").as("skew_milli"))
    },

    // Partition-layout advisor: for each candidate partition key of the
    // fact table, the distinct-partition count, integer-average and max
    // partition sizes, a skew ratio in milli-units, and a CASE verdict —
    // the table a lakehouse layout review reads before choosing
    // PARTITIONED BY (too few partitions = no pruning; too many small ones
    // = file explosion + listing cost; skewed = stragglers). Scale: one
    // group-count per candidate (map-side combined) collapsed to a 1-row
    // summary; the union is 3 rows. The thresholds are deliberate
    // rules-of-thumb constants — the point is the measured inputs.
    Op("pipeline_partition_advice", {
      def cand(label: String, key: String) =
        s"(SELECT '$label' AS candidate, CAST(COUNT(*) AS BIGINT) AS n_parts, " +
        "CAST(SUM(cnt) // COUNT(*) AS BIGINT) AS rows_avg, CAST(MAX(cnt) AS BIGINT) AS rows_max " +
        s"FROM (SELECT $key AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1) g)"
      "WITH u AS (" + Seq(
        cand("l_returnflag", "l_returnflag"),
        cand("l_shipdate_month", "CAST(DATE_TRUNC('month', l_shipdate) AS DATE)"),
        cand("l_suppkey", "l_suppkey")).mkString(" UNION ALL ") + ") " +
      "SELECT candidate, n_parts, rows_avg, rows_max, " +
      "CAST((rows_max * 1000) // rows_avg AS BIGINT) AS skew_milli, " +
      "CASE WHEN n_parts < 8 THEN 'too-few' WHEN rows_avg < 1000 THEN 'too-small' " +
      "WHEN (rows_max * 1000) // rows_avg > 3000 THEN 'skewed' ELSE 'ok' END AS verdict " +
      "FROM u ORDER BY candidate"
    }) { (s, d) =>
      Tables.ensure(s, d)
      def cand(label: String, key: org.apache.spark.sql.Column): DataFrame =
        s.table("lineitem").groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_parts"),
            expr("CAST(SUM(cnt) div COUNT(*) AS BIGINT)").as("rows_avg"),
            max("cnt").as("rows_max"))
          .select(lit(label).as("candidate"), col("n_parts"), col("rows_avg"), col("rows_max"))
      cand("l_returnflag", col("l_returnflag"))
        .unionByName(cand("l_shipdate_month", date_trunc("month", col("l_shipdate")).cast("date")))
        .unionByName(cand("l_suppkey", col("l_suppkey")))
        .select(col("candidate"), col("n_parts"), col("rows_avg"), col("rows_max"),
          expr("CAST((rows_max * 1000) div rows_avg AS BIGINT)").as("skew_milli"),
          expr("CASE WHEN n_parts < 8 THEN 'too-few' WHEN rows_avg < 1000 THEN 'too-small' " +
            "WHEN (rows_max * 1000) div rows_avg > 3000 THEN 'skewed' ELSE 'ok' END").as("verdict"))
        .orderBy("candidate")
    },

    // Corpus snapshot diff: what changed between two dataset versions, by
    // content hash — the audit table a crawl-over-crawl pipeline publishes
    // with every release (and the input to incremental reprocessing: only
    // `changed`+`added` need re-embedding/re-scoring). The v2 snapshot is
    // derived deterministically from the fixture (every 10th doc removed,
    // every 7th rewritten, every 13th re-keyed in as new) so the oracle can
    // rebuild it; the OPERATOR is the full-outer join + md5 compare, which
    // scales as one doc_id-keyed exchange regardless of snapshot contents.
    Op("corpus_delta_report",
      "WITH v1 AS (SELECT doc_id, MD5(text) AS h FROM documents), " +
      "v2 AS (SELECT doc_id, MD5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev' ELSE text END) AS h " +
      "FROM documents WHERE doc_id % 10 <> 0 " +
      "UNION ALL SELECT doc_id + 1000000 AS doc_id, MD5(text) AS h FROM documents WHERE doc_id % 13 = 0) " +
      "SELECT CAST(SUM(CASE WHEN v2.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
      "CAST(SUM(CASE WHEN v1.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added, " +
      "CAST(SUM(CASE WHEN v1.h IS NOT NULL AND v2.h IS NOT NULL AND v1.h <> v2.h THEN 1 ELSE 0 END) AS BIGINT) AS n_changed, " +
      "CAST(SUM(CASE WHEN v1.h = v2.h THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged " +
      "FROM v1 FULL JOIN v2 USING (doc_id)") { (s, d) =>
      val v1 = docs(s, d).select(col("doc_id"), md5(col("text")).as("h1"))
      val base = docs(s, d)
      val v2 = base.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev")))
            .otherwise(col("text"))).as("h2"))
        .unionByName(base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), md5(col("text")).as("h2")))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .agg(
          sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("h1").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("h1").isNotNull && col("h2").isNotNull && col("h1") =!= col("h2"), 1L)
            .otherwise(0L)).as("n_changed"),
          sum(when(col("h1") === col("h2"), 1L).otherwise(0L)).as("n_unchanged"))
    },

    // Quality-gate calibration sweep: survivor counts at each candidate
    // min-token threshold in ONE corpus pass (docs cross-joined with the
    // tiny broadcast threshold list, conditional sums per threshold) — the
    // table a pipeline owner reads before picking the gate, instead of
    // re-running the filter per candidate value.
    Op("pipeline_quality_sweep",
      "WITH d AS (SELECT LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents), " +
      "t AS (SELECT UNNEST([20, 40, 60, 80, 100]) AS thr) " +
      "SELECT CAST(thr AS INTEGER) AS thr, " +
      "CAST(SUM(CASE WHEN n_tok >= thr THEN 1 ELSE 0 END) AS BIGINT) AS survivors " +
      "FROM d, t GROUP BY 1 ORDER BY 1") { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val nt = docs(s, d).select(size(tokens(col("text"))).as("n_tok"))
      val thr = s.range(1, 6).select((col("id") * 20).cast("int").as("thr"))
      nt.crossJoin(broadcast(thr))
        .groupBy("thr")
        .agg(sum(when(col("n_tok") >= col("thr"), 1L).otherwise(0L)).as("survivors"))
        .orderBy("thr")
    },

    // Telemetry event dedup over tumbling 5-minute windows: keep the first
    // event per (user, type, window) — the standard at-least-once-ingest
    // repair before event analytics. Exact micros arithmetic (EPOCH_US ↔
    // unix_micros, the as-of join policy) so the window assignment is
    // bit-identical cross-engine. Scale: one exchange — the dedup window
    // partitions on (user_id, event_type, win), unskewed keys; the
    // per-type collapse rides a second tiny aggregate.
    Op("events_dedup_window",
      "WITH e AS (SELECT event_type, user_id, ts, event_id, " +
      "EPOCH_US(ts) // 300000000 AS win FROM events), " +
      "k AS (SELECT event_type, ROW_NUMBER() OVER " +
      "(PARTITION BY user_id, event_type, win ORDER BY ts, event_id) AS rn FROM e) " +
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, " +
      "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept " +
      "FROM k GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.ensure(s, d)
      val w = Window.partitionBy("user_id", "event_type", "win")
        .orderBy(col("ts"), col("event_id"))
      s.table("events")
        .withColumn("win", expr("unix_micros(cast(ts as timestamp)) div 300000000"))
        .withColumn("rn", row_number().over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).cast("long").as("n_kept"))
        .orderBy("event_type")
    }
  )
}
