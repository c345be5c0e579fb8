package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational surface beyond the core families: inline VALUES relations,
  * UNPIVOT (wide→long reshaping), explicit EXISTS subqueries, and
  * deterministic hash sampling.
  *
  * Hash sampling is the 100 TB-scale technique of note here: unlike
  * TABLESAMPLE it is reproducible across engines and runs, pushes down as an
  * ordinary filter (no reservoir state), and samples consistently for the
  * same key — exactly what a training-data pipeline needs for held-out
  * splits.
  */
object CoverageOps {

  val ops: Seq[Op] = Seq(
    Op("values_inline",
      "SELECT v.k AS k, v.lab AS lab, r_name FROM (VALUES (0,'amer'),(1,'emea'),(2,'apac')) AS v(k,lab) " +
      "JOIN region ON r_regionkey = v.k ORDER BY k") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT v.k AS k, v.lab AS lab, r_name FROM VALUES (0,'amer'),(1,'emea'),(2,'apac') AS v(k,lab) " +
        "JOIN region ON r_regionkey = v.k ORDER BY k")
    },

    Op("unpivot_metrics",
      "WITH a AS (SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(MIN(n_nationkey) AS BIGINT) AS mn, " +
      "CAST(MAX(n_nationkey) AS BIGINT) AS mx FROM nation GROUP BY n_regionkey) " +
      "SELECT n_regionkey, metric, val FROM a UNPIVOT (val FOR metric IN (cnt, mn, mx)) " +
      "ORDER BY n_regionkey, metric") { (s, d) =>
      Tables.ensure(s, d)
      s.table("nation")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("cnt"),
          min("n_nationkey").cast("long").as("mn"),
          max("n_nationkey").cast("long").as("mx"))
        .unpivot(Array(col("n_regionkey")), Array(col("cnt"), col("mn"), col("mx")), "metric", "val")
        .orderBy("n_regionkey", "metric")
    },

    Op("subq_exists",
      "SELECT r_regionkey, r_name FROM region WHERE EXISTS " +
      "(SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey >= 20) ORDER BY r_regionkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT r_regionkey, r_name FROM region WHERE EXISTS " +
        "(SELECT 1 FROM nation WHERE n_regionkey = r_regionkey AND n_nationkey >= 20) ORDER BY r_regionkey")
    },

    // Multimodal decode stage, oracle-checked: synthetic media written as a
    // binary-column parquet, decoded via the distributed mapPartitions codec
    // (stubbed as hex60(HEX(bytes)) arithmetic — SQL-expressible, so DuckDB
    // recomputes the dims from the same bytes). A real codec keeps the same
    // Spark plumbing but loses the oracle, by design.
    Op.effectful("multimodal_decode",
      "WITH m AS (SELECT media_id, kind, " +
      s"${TextPipeline.hex60Sql("HEX(bytes)")} AS h FROM read_parquet('${SourceOps.ioDir}/media/*.parquet')) " +
      "SELECT media_id, kind, CAST(h % 1920 + 1 AS INTEGER) AS width, " +
      "CAST((h // 1920) % 1080 + 1 AS INTEGER) AS height FROM m ORDER BY media_id") { (s, d) =>
      val mediaDir = s"${SourceOps.ioDir}/media"
      val media = graft.multimodal.Multimodal.syntheticMedia(s, 200)
      media.select("media_id", "kind", "bytes")
        .write.mode("overwrite").parquet(mediaDir)
      graft.multimodal.Multimodal.decode(s.read.parquet(mediaDir).withColumn("meta", lit(null).cast(graft.multimodal.Multimodal.metaType)))
        .select(col("media_id"), col("kind"), col("meta.width").as("width"), col("meta.height").as("height"))
        .orderBy("media_id")
    },

    // LATERAL correlated derived table (per-row subquery; Catalyst
    // decorrelates it into a join).
    Op("subq_lateral",
      "SELECT r_regionkey, r_name, t.c FROM region, LATERAL " +
      "(SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nation WHERE n_regionkey = r_regionkey) t " +
      "ORDER BY r_regionkey") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT r_regionkey, r_name, t.c FROM region, LATERAL " +
        "(SELECT COUNT(*) AS c FROM nation WHERE n_regionkey = r_regionkey) t " +
        "ORDER BY r_regionkey")
    },

    // ANY_VALUE — deterministic here because each group holds exactly one
    // distinct value (n_name is functionally dependent on n_nationkey).
    Op("agg_any_value",
      "SELECT n_nationkey, ANY_VALUE(n_name) AS nm, CAST(COUNT(*) AS BIGINT) AS c " +
      "FROM nation GROUP BY n_nationkey ORDER BY n_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.table("nation").groupBy("n_nationkey")
        .agg(any_value(col("n_name")).as("nm"), count(lit(1)).as("c"))
        .orderBy("n_nationkey")
    },

    // Prefix/suffix/containment predicates.
    Op("fn_string5",
      "SELECT p_partkey, STARTS_WITH(p_type,'STA') AS sw, ENDS_WITH(p_brand,'1') AS ew, " +
      "CONTAINS(p_name,'red') AS ct FROM part ORDER BY p_partkey LIMIT 100") { (s, d) =>
      Tables.ensure(s, d)
      s.table("part").orderBy("p_partkey").limit(100).select(
        col("p_partkey"),
        startswith(col("p_type"), lit("STA")).as("sw"),
        endswith(col("p_brand"), lit("1")).as("ew"),
        contains(col("p_name"), lit("red")).as("ct"))
    },

    // grouping_id bitmask over ROLLUP levels (Spark grouping_id(a,b) ==
    // DuckDB GROUPING(a,b): first key is the high bit in both).
    Op("agg_grouping_id",
      "SELECT COALESCE(CAST(n_regionkey AS VARCHAR),'ALL') AS rk, COALESCE(n_name,'ALL') AS nm, " +
      "CAST(GROUPING(n_regionkey, n_name) AS BIGINT) AS gid, CAST(COUNT(*) AS BIGINT) AS c " +
      "FROM nation GROUP BY ROLLUP(n_regionkey, n_name) ORDER BY gid, rk, nm") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT COALESCE(CAST(n_regionkey AS STRING),'ALL') AS rk, COALESCE(n_name,'ALL') AS nm, " +
        "grouping_id(n_regionkey, n_name) AS gid, COUNT(*) AS c " +
        "FROM nation GROUP BY ROLLUP(n_regionkey, n_name) ORDER BY gid, rk, nm")
    },

    // DuckDB's LEFT-less SEMI JOIN / ANTI JOIN spellings: ONE text runs
    // natively on DuckDB and through `plans.JoinKeywords` here, which adds
    // the LEFT qualifier Spark's parser requires.
    {
      val sameText =
        "SELECT r_regionkey, r_name FROM region SEMI JOIN nation " +
        "ON n_regionkey = r_regionkey AND n_nationkey >= 20 ORDER BY r_regionkey"
      Op("join_semi_sql", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },
    {
      val sameText =
        "SELECT r_regionkey, r_name FROM region ANTI JOIN nation " +
        "ON n_regionkey = r_regionkey AND n_nationkey >= 23 ORDER BY r_regionkey"
      Op("join_anti_sql", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // PIVOT with multiple aggregates per pivot value.
    Op("pivot_multi",
      "SELECT o_orderpriority, CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS f_c, " +
      "CAST(ROUND(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0.00 AS DECIMAL(12,2)) END),2) AS DOUBLE) AS f_t, " +
      "CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS o_c, " +
      "CAST(ROUND(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0.00 AS DECIMAL(12,2)) END),2) AS DOUBLE) AS o_t " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority") { (s, d) =>
      Tables.ensure(s, d)
      // the pivoted SUM runs over the decimal-cast column (Money): exact,
      // so any partitioning of orders yields the same cents
      s.sql("SELECT o_orderpriority, COALESCE(f_c, 0) AS f_c, CAST(ROUND(COALESCE(f_t, 0),2) AS DOUBLE) AS f_t, " +
        "COALESCE(o_c, 0) AS o_c, CAST(ROUND(COALESCE(o_t, 0),2) AS DOUBLE) AS o_t " +
        "FROM (SELECT * FROM (SELECT o_orderpriority, o_orderstatus, CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice FROM orders) " +
        "PIVOT (COUNT(*) AS c, SUM(o_totalprice) AS t FOR o_orderstatus IN ('F' AS f, 'O' AS o))) " +
        "ORDER BY o_orderpriority")
    },

    // Pagination: ORDER BY ... LIMIT ... OFFSET (deterministic tie-break).
    Op("topk_offset",
      "SELECT s_suppkey, ROUND(s_acctbal,2) AS bal FROM supplier " +
      "ORDER BY s_acctbal DESC, s_suppkey LIMIT 10 OFFSET 10") { (s, d) =>
      Tables.ensure(s, d)
      s.table("supplier")
        .select(col("s_suppkey"), round(col("s_acctbal"), 2).as("bal"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        .offset(10).limit(10)
    },

    // arg-max/arg-min aggregates (MAX_BY/MIN_BY); the max balance is unique
    // per nation in this data (verified at sf0.01 and sf0.1).
    Op("agg_argmax",
      "SELECT s_nationkey, MAX_BY(s_name, s_acctbal) AS richest, MIN_BY(s_name, s_acctbal) AS poorest " +
      "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey") { (s, d) =>
      Tables.ensure(s, d)
      s.table("supplier")
        .groupBy("s_nationkey")
        .agg(max_by(col("s_name"), col("s_acctbal")).as("richest"),
          min_by(col("s_name"), col("s_acctbal")).as("poorest"))
        .orderBy("s_nationkey")
    },

    Op("join_using",
      "SELECT rk, n_name, r_name FROM (SELECT n_regionkey AS rk, n_name FROM nation) a " +
      "JOIN (SELECT r_regionkey AS rk, r_name FROM region) b USING (rk) ORDER BY n_name") { (s, d) =>
      Tables.ensure(s, d)
      s.sql("SELECT rk, n_name, r_name FROM (SELECT n_regionkey AS rk, n_name FROM nation) a " +
        "JOIN (SELECT r_regionkey AS rk, r_name FROM region) b USING (rk) ORDER BY n_name")
    },

    // 5% deterministic sample of orders by key hash; aggregate over the
    // sample. The md5-derived hash makes the very same rows land in the
    // sample in any engine.
    Op("sample_hash",
      s"SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
      s"ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*),2) AS avg_price FROM orders " +
      s"WHERE ${TextPipeline.hex60Sql("CAST(o_orderkey AS VARCHAR)")} % 20 = 0") { (s, d) =>
      Tables.ensure(s, d)
      s.table("orders")
        .filter(TextPipeline.md5Hash60(col("o_orderkey").cast("string")) % 20 === 0)
        .agg(count(lit(1)).as("n"),
          round(sum(Money.dec2("o_totalprice")).cast("double") / count(lit(1)), 2).as("avg_price"))
    },

    // The multimodal FEATURE stage end-to-end: binary media -> fixed-width
    // float vector through the real mapPartitions pipeline (the shape a
    // real codec amortizes per-JVM init in), oracle-checked because the
    // stub featurizer is hex60 arithmetic any SQL engine can recompute.
    // Features surface as exact integer milli-values (each stored float is
    // k/1000 with k < 1000, so round(f*1000) recovers k exactly) — the
    // float-vs-double division ulp trap never arises.
    Op.effectful("multimodal_features", {
      val hm = s"(${TextPipeline.hex60Sql("HEX(bytes)")} % 1000000007)"
      "WITH m AS (SELECT media_id, " + hm + " AS hm " +
      s"FROM read_parquet('${SourceOps.ioDir}/media_f/*.parquet')) " +
      "SELECT media_id, " +
      (0 until 8).map(i => s"CAST((hm * ${i * 2 + 1} + $i) % 1000 AS INTEGER) AS f$i").mkString(", ") +
      " FROM m ORDER BY media_id"
    }) { (s, d) =>
      val mediaDir = s"${SourceOps.ioDir}/media_f"
      graft.multimodal.Multimodal.syntheticMedia(s, 200)
        .select("media_id", "kind", "bytes")
        .write.mode("overwrite").parquet(mediaDir)
      val media = s.read.parquet(mediaDir)
        .withColumn("meta", lit(null).cast(graft.multimodal.Multimodal.metaType))
      graft.multimodal.Multimodal.extractFeatures(media)
        .select(col("media_id") +:
          (0 until 8).map(i => round(col("features")(i) * 1000).cast("int").as(s"f$i")): _*)
        .orderBy("media_id")
    },

    // The multimodal RESIZE stage end-to-end (same contract as
    // multimodal_decode/features): binary media through the real
    // mapPartitions resize, value-checked because the stub transform is
    // byte-arithmetic any SQL engine can recompute — output length is
    // prefix + min(16, input length), the prefix itself round-trips as the
    // exact 14-byte ASCII tag, and the meta struct carries the target dims.
    Op.effectful("multimodal_resize",
      "SELECT media_id, 64 AS width, 48 AS height, " +
      "CAST(14 + LEAST(OCTET_LENGTH(bytes), 16) AS INTEGER) AS out_len, " +
      "'resized:64x48:' AS prefix " +
      s"FROM read_parquet('${SourceOps.ioDir}/media_r/*.parquet') ORDER BY media_id") { (s, d) =>
      val mediaDir = s"${SourceOps.ioDir}/media_r"
      graft.multimodal.Multimodal.syntheticMedia(s, 200)
        .select("media_id", "kind", "bytes")
        .write.mode("overwrite").parquet(mediaDir)
      val media = s.read.parquet(mediaDir)
        .withColumn("meta", lit(null).cast(graft.multimodal.Multimodal.metaType))
      graft.multimodal.Multimodal.resize(media, 64, 48)
        .select(col("media_id"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          length(col("bytes")).cast("int").as("out_len"),
          substring(col("bytes"), 1, 14).cast("string").as("prefix"))
        .orderBy("media_id")
    },

    // The multimodal FRAME-SAMPLE stage end-to-end (video semantics: one
    // output row per sampled frame through the real flatMap-shaped
    // mapPartitions). The stub samples 4 evenly-sized chunks; each frame is
    // a byte-slice of the input, so the oracle recomputes every frame's
    // length and 60-bit content hash by slicing the HEX string (2 hex chars
    // per byte — DuckDB has no blob substring, the hex round-trip is the
    // portable spelling).
    Op.effectful("multimodal_frames", {
      val flen = "LEAST(sz, len - frame_no*sz)"
      "WITH m AS (SELECT media_id, bytes, OCTET_LENGTH(bytes) AS len, " +
      "GREATEST(OCTET_LENGTH(bytes) // 4, 1) AS sz " +
      s"FROM read_parquet('${SourceOps.ioDir}/media_s/*.parquet')), " +
      "f AS (SELECT media_id, UNNEST(GENERATE_SERIES(0, 3)) AS frame_no, len, sz, bytes FROM m), " +
      "g AS (SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no, " +
      s"CAST($flen AS INTEGER) AS frame_len, " +
      s"SUBSTRING(HEX(bytes), CAST(frame_no*sz*2 + 1 AS INTEGER), CAST($flen*2 AS INTEGER)) AS fh " +
      "FROM f WHERE frame_no*sz < len) " +
      s"SELECT media_id, frame_no, frame_len, ${TextPipeline.hex60Sql("fh")} AS frame_h60 " +
      "FROM g ORDER BY media_id, frame_no"
    }) { (s, d) =>
      val mediaDir = s"${SourceOps.ioDir}/media_s"
      graft.multimodal.Multimodal.syntheticMedia(s, 200)
        .select("media_id", "kind", "bytes")
        .write.mode("overwrite").parquet(mediaDir)
      val media = s.read.parquet(mediaDir)
        .withColumn("meta", lit(null).cast(graft.multimodal.Multimodal.metaType))
      graft.multimodal.Multimodal.sampleFrames(media, 4)
        .select(col("media_id"), col("frame_no"),
          length(col("frame")).cast("int").as("frame_len"),
          TextPipeline.md5Hash60(hex(col("frame"))).as("frame_h60"))
        .orderBy("media_id", "frame_no")
    },

    // REAL compressed-container metadata (multimodal.MediaMeta): MP3 and
    // ADTS-AAC frame-header walkers, an MP4/ISO-BMFF box walker, a FLAC
    // STREAMINFO block walker (r12), and a RIFF/WAVE chunk walker (r13) —
    // the byte-arithmetic half of audio/video handling, implemented for
    // real while decode stays environment-stubbed. Fixture bytes are VALID
    // containers synthesized deterministically, so every parsed fact
    // (bitrate, frame count, per-frame-exact duration, track layout,
    // channel/bps fields) has a closed integer form the oracle recomputes
    // without parsing — the differential test is parser-vs-construction.
    // media_id % 5 picks the format (k = media_id // 5 is the per-format
    // stream index every layout keys on): 0 = MPEG-1 L3 @32 kHz (36
    // ms/frame, ID3v2 on alternating streams), 1 = ftyp+moov with 1-2
    // traks, 2 = ADTS AAC-LC @32 kHz (32 ms/frame), 3 = FLAC (total
    // samples -> exact 250 ms steps), 4 = PCM WAV @16 kHz (odd-size LIST
    // chunk exercises even-padding).
    Op.effectful("multimodal_container_meta",
      s"WITH m AS (SELECT media_id, media_id % 5 AS f, media_id // 5 AS k " +
      s"FROM read_parquet('${SourceOps.ioDir}/media_meta/*.parquet')) " +
      "SELECT media_id, " +
      "CASE WHEN f = 0 THEN 'mp3' WHEN f = 1 THEN 'mp4' WHEN f = 2 THEN 'aac' " +
      "WHEN f = 3 THEN 'flac' ELSE 'wav' END AS container, " +
      "CASE WHEN f = 0 THEN CAST(32 + 8*(k % 5) AS INTEGER) END AS bitrate_kbps, " +
      "CASE WHEN f IN (0, 2, 3) THEN CAST(32000 AS INTEGER) " +
      "WHEN f = 4 THEN CAST(16000 AS INTEGER) END AS sample_rate, " +
      "CASE WHEN f = 0 THEN CAST(2 AS INTEGER) WHEN f IN (2, 3, 4) THEN CAST(1 + k % 2 AS INTEGER) END AS channels, " +
      "CASE WHEN f IN (3, 4) THEN CAST(16 AS INTEGER) END AS bits_per_sample, " +
      "CASE WHEN f = 0 THEN CAST(5 + k % 7 AS INTEGER) WHEN f = 2 THEN CAST(4 + k % 6 AS INTEGER) END AS frames, " +
      "CASE WHEN f = 1 THEN CAST(1 + k % 2 AS INTEGER) END AS tracks, " +
      "CASE WHEN f = 1 THEN TRUE END AS has_video, " +
      "CASE WHEN f = 1 THEN (k % 2 = 1) END AS has_audio, " +
      "CASE WHEN f = 0 THEN CAST((5 + k % 7) * 36 AS BIGINT) " +
      "WHEN f = 1 THEN CAST((k+1) * 500 AS BIGINT) " +
      "WHEN f = 2 THEN CAST((4 + k % 6) * 32 AS BIGINT) " +
      "ELSE CAST((k+1) * 250 AS BIGINT) END AS duration_ms " +
      "FROM m ORDER BY media_id") { (s, d) =>
      val mediaDir = s"${SourceOps.ioDir}/media_meta"
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.BinaryType, nullable = true)))
      val rows = (0L until 80L).map { id =>
        val bytes = (id % 5) match {
          case 0 => graft.multimodal.MediaMeta.syntheticMp3(id / 5)
          case 1 => graft.multimodal.MediaMeta.syntheticMp4(id / 5)
          case 2 => graft.multimodal.MediaMeta.syntheticAac(id / 5)
          case 3 => graft.multimodal.MediaMeta.syntheticFlac(id / 5)
          case _ => graft.multimodal.MediaMeta.syntheticWav(id / 5)
        }
        org.apache.spark.sql.Row(id, bytes)
      }
      s.createDataFrame(rows.asJava, schema).write.mode("overwrite").parquet(mediaDir)
      graft.multimodal.MediaMeta.containerMeta(s.read.parquet(mediaDir))
        .orderBy("media_id")
    },

    // Dialect-compat proof: ONE SQL text, spelled in the reference engine's
    // DuckDB dialect (string_split / list_* / regexp_matches), runs verbatim
    // on BOTH engines — Spark resolves the spellings through the
    // DuckDbCompat alias table (plans/DuckDbCompat.scala: pure Catalyst
    // expressions, no UDFs, so the whole row stays codegen'd). This is the
    // migration contract made executable: a reference user's query text
    // works unchanged.
    {
      val sameText =
        "SELECT doc_id, " +
        "list_contains(string_split(text, ' '), 'vector') AS has_vector, " +
        // Array-typed outputs are stringified (array_to_string on BOTH
        // engines): the driver's comparator sorts result columns with
        // pandas, which cannot hash a numpy.ndarray cell — the same harness
        // rule embed_sq8 handles with an md5 digest (Embeddings.scala).
        "array_to_string(list_slice(string_split(text, ' '), 1, 3), ',') AS first3, " +
        "CAST(list_unique(string_split(text, ' ')) AS INTEGER) AS n_unique, " +
        "array_to_string(list_sort(list_distinct(list_slice(string_split(text, ' '), 1, 5))), ',') AS first5_sorted, " +
        "regexp_matches(text, 'vector|stream') AS mentions, " +
        "CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok, " +
        "CAST(strpos(text, 'vector') AS INTEGER) AS vec_pos, " +
        "array_to_string(list_slice(string_split(text, ' '), 1, 3), '_') AS first3_joined, " +
        "array_to_string(list_concat(list_slice(string_split(text, ' '), 1, 1), list_value('|')), ',') AS head_bar " +
        "FROM documents WHERE doc_id < 20 ORDER BY doc_id"
      Op("compat_duckdb_sql", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // COLLATE: the reference preloads DuckDB's icu extension for all users
    // (`gizmosql_library.cpp:814-819`); ONE DuckDB-dialect text runs
    // natively there and through plans.CollateRewrite here (NOCASE →
    // UTF8_LCASE, NOACCENT → UNICODE_AI, NOCASE.NOACCENT → UNICODE_CI_AI —
    // Spark 4's native collations). Equality probes cover all three modes
    // (constants on purpose: order-independent); the rank column pins the
    // case-insensitive ORDERING with a binary tie-break. Verified NOCASE is
    // unicode-aware in DuckDB 1.0 (Ärger = ärger), matching UTF8_LCASE.
    {
      val duckText =
        "WITH t(s) AS (VALUES ('apple'),('APPLE'),('Apple'),('banana'),('BANANA'),('cherry'),('Date')) " +
        "SELECT s, " +
        "CASE WHEN s COLLATE NOCASE = 'Apple' THEN 1 ELSE 0 END AS eq_ci, " +
        "CASE WHEN 'Ärger' COLLATE NOCASE = 'ärger' THEN 1 ELSE 0 END AS ci_unicode, " +
        "CASE WHEN 'Äpfel' COLLATE NOACCENT = 'Apfel' THEN 1 ELSE 0 END AS eq_ai, " +
        "CASE WHEN 'ÄPFEL' COLLATE NOCASE.NOACCENT = 'äpfel' THEN 1 ELSE 0 END AS eq_ci_ai, " +
        "CAST(RANK() OVER (ORDER BY s COLLATE NOCASE, s) AS BIGINT) AS r_ci " +
        "FROM t ORDER BY s"
      Op("compat_collate", duckText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(duckText))
      }
    },

    // QUALIFY, the DuckDB-dialect clause Spark's parser lacks: ONE text with
    // both the inline-window and alias-referencing forms runs natively on
    // DuckDB and through `plans.QualifyRewrite` here (the statement pipeline
    // applies the same rewrite for server users, QualifyRewriteSpec). The
    // desugared shape is the standard windowed-subquery filter, so the plan
    // is identical to hand-written per-group top-k.
    {
      val sameText =
        "SELECT source, doc_id, n_chars, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rn " +
        "FROM documents " +
        "QUALIFY rn <= 3 AND ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) >= 1 " +
        "ORDER BY source, rn"
      Op("compat_qualify", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.QualifyRewrite.rewrite(sameText))
      }
    },

    // DuckDB's star modifier spelling: `* EXCLUDE (...)` (the reference's
    // own code emits it) — one text, DuckDB native, Spark via the
    // StarExclude keyword rewrite (Spark spells it EXCEPT).
    {
      val sameText =
        "SELECT * EXCLUDE (text) FROM documents WHERE doc_id < 10 ORDER BY doc_id"
      Op("compat_exclude", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.StarExclude.rewrite(sameText))
      }
    },

    // DuckDB's ASOF JOIN syntax: ONE text runs natively on DuckDB (which
    // executes ASOF as a first-class operator) and on Spark through
    // `plans.AsofJoinRewrite`, which desugars it into the canonical
    // union + one-window carry-forward — the same single-shuffle shape as
    // TemporalJoins.asofBackward, never a join-then-filter pair explosion.
    // The right side is aggregated to unique (user_id, ts) so the match is
    // well-defined on both engines (DuckDB's equal-ts tie pick is
    // unspecified; ours is deterministic).
    {
      val sameText =
        "SELECT p.event_id, EPOCH_US(p.ts) AS ts_us, ROUND(p.value, 2) AS pvalue, " +
        "EPOCH_US(c.ts) AS click_ts_us, ROUND(c.cv, 2) AS click_value " +
        "FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
        "ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS cv FROM events " +
        "WHERE event_type = 'click' GROUP BY user_id, ts) c " +
        "ON p.user_id = c.user_id AND p.ts >= c.ts " +
        "ORDER BY p.event_id"
      Op("compat_asof_sql", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText, s))
      }
    },

    // DuckDB's `* REPLACE (...)` star modifier, combined with EXCLUDE in one
    // text: DuckDB executes both natively; Spark gets them via StarExclude +
    // StarReplace (the replaced columns leave the star and re-enter as
    // aliased expressions — name-identical output, order-insensitive
    // comparator).
    {
      val sameText =
        "SELECT * EXCLUDE (text) REPLACE (n_chars * 2 AS n_chars, upper(source) AS source) " +
        "FROM documents WHERE doc_id < 10 ORDER BY doc_id"
      Op("compat_replace", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // DuckDB's bracket list syntax: literals and comprehensions in ONE text
    // — DuckDB parses them natively, Spark gets transform/filter via
    // `plans.ListSyntax` (subscripts deliberately untouched: 1-based vs
    // 0-based semantics must not silently flip).
    {
      val sameText =
        // Stringified outputs (comparator cannot sort array cells — see
        // compat_duckdb_sql note); the bracket syntax itself is still the
        // thing under test, now nested in call position.
        "SELECT doc_id, array_to_string([3, 1, 4], ',') AS nums, " +
        "array_to_string([upper(t) FOR t IN string_split(text, ' ') IF strpos(t, 'a') > 0], ',') AS a_words, " +
        "array_to_string([length(t) FOR t IN list_slice(string_split(text, ' '), 1, 5)], ',') AS head_lens " +
        "FROM documents WHERE doc_id < 20 ORDER BY doc_id"
      Op("compat_list_syntax", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // DuckDB's SELECT DISTINCT ON (exprs): one row per distinct key, pick
    // governed by ORDER BY — DuckDB executes it natively, Spark through
    // `plans.DistinctOnRewrite`'s windowed-subquery desugar. The ORDER BY
    // carries a unique tie-break so the pick is cross-engine deterministic.
    {
      val sameText =
        "SELECT DISTINCT ON (source) doc_id, source, n_chars " +
        "FROM documents ORDER BY source, n_chars DESC, doc_id"
      Op("compat_distinct_on", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // The SQL-standard named WINDOW clause: both engines parse it natively,
    // so ONE text runs verbatim on both — reference users' window-heavy
    // queries port unchanged.
    {
      val sameText =
        "SELECT doc_id, source, CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn, " +
        "CAST(SUM(n_chars) OVER w AS BIGINT) AS run_chars, " +
        "CAST(COUNT(*) OVER w2 AS BIGINT) AS src_docs " +
        "FROM documents WHERE doc_id < 50 " +
        "WINDOW w AS (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "w2 AS (PARTITION BY source) " +
        "ORDER BY source, doc_id"
      Op("win_named_window", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // DuckDB's COLUMNS() star expression: one text, DuckDB native, Spark
    // via `plans.ColumnsRewrite` (per-column expansion named after the
    // column, matching DuckDB's own auto-naming).
    {
      val sameText =
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, MIN(COLUMNS('n_.*key')) FROM nation"
      Op("compat_columns", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText, s))
      }
    },

    // DuckDB's aggregate spellings — arg_max/arg_min, string_agg,
    // quantile_cont/quantile_disc — registered as native Catalyst aggregate
    // aliases (DuckDbCompat), so ONE text runs verbatim on both engines.
    // Determinism by construction: arg_max/arg_min order on o_orderkey
    // (globally unique, so the picked arg is well-defined); string_agg runs
    // on single-row groups (region key is unique — element order never
    // matters); quantile_disc semantics probed against DuckDB (both engines
    // use the SQL-standard smallest-value-with-cume_dist>=q rule, verified
    // on the q=0.9/n=4 case that separates it from the floor(q*(n-1))
    // rule).
    {
      val sameText =
        "SELECT o_custkey % 10 AS bucket, " +
        "arg_max(o_orderdate, o_orderkey) AS last_by_key, " +
        "arg_min(o_orderdate, o_orderkey) AS first_by_key, " +
        "ROUND(quantile_cont(o_totalprice, 0.5), 2) AS med_price, " +
        "CAST(quantile_disc(o_orderkey, 0.25) AS BIGINT) AS qd_key " +
        "FROM orders GROUP BY 1 ORDER BY 1"
      Op("compat_agg_aliases", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // string_agg alias wiring on single-element groups (one text, verbatim
    // both engines — deterministic because each group has exactly one row).
    {
      val sameText =
        "SELECT r_regionkey, string_agg(r_name, ';') AS nm " +
        "FROM region GROUP BY r_regionkey ORDER BY r_regionkey"
      Op("compat_string_agg", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // DuckDB's C-style datetime formatting and printf: strftime/strptime
    // run through the bind-time %-code → Java-pattern translation
    // (DuckDbCompat.StrfTime), printf maps onto format_string (both engines
    // consume C %-codes). ONE text, verbatim on both engines.
    {
      val sameText =
        "SELECT o_orderkey, " +
        "strftime(CAST(o_orderdate AS TIMESTAMP), '%Y/%m/%d') AS ymd, " +
        "strftime(CAST(o_orderdate AS TIMESTAMP), '%d %b %Y') AS dmy, " +
        // STRING: the one varchar spelling BOTH parsers accept (Spark
        // rejects bare VARCHAR; DuckDB aliases STRING to VARCHAR)
        "CAST(strptime('2024-03-05 14:30:09', '%Y-%m-%d %H:%M:%S') AS STRING) AS parsed, " +
        "printf('%s/%d', o_orderstatus, o_orderkey % 7) AS tagged " +
        "FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey"
      Op("compat_strftime", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // Hash/hex/log aliases, ONE text verbatim on both engines.
    // log(x) is base-10 here exactly as in DuckDB (the 1-arg builtin was
    // re-pointed per the migration contract). list_zip is value-checked in
    // DuckDbCompatSpec instead: DuckDB 1.0 zips into UNNAMED structs its
    // own binder can't field-access, so no one text reads a zip on both.
    {
      val sameText =
        "SELECT doc_id, sha256(source) AS sh, to_hex(doc_id) AS hx, " +
        "ROUND(log(n_chars), 3) AS lg10, ROUND(log(2, n_chars), 3) AS lg2, " +
        "array_to_string(string_to_array(source, '_'), '/') AS src_parts " +
        "FROM documents WHERE doc_id < 40 AND n_chars > 0 ORDER BY doc_id"
      Op("compat_hash_log", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // DuckDB's ALL shorthands — GROUP BY ALL groups on every non-aggregate
    // select item, ORDER BY ALL sorts by all columns left-to-right. Both
    // engines parse both natively (Spark 4 added them), so ONE text runs
    // verbatim.
    {
      val sameText =
        "SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total " +
        "FROM orders GROUP BY ALL ORDER BY ALL"
      Op("compat_order_by_all", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // DuckDB's string-similarity family — levenshtein/editdist3 map onto
    // Spark's builtin; damerau_levenshtein (TRUE DL), hamming, jaccard,
    // jaro(-winkler) are native codegen expressions
    // (plans/StringDistances.scala) registered under the DuckDB names, so
    // ONE text runs verbatim on both engines. Doubles are ROUNDed: the
    // formulas are identical, rounding only absorbs last-ulp noise.
    {
      val sameText =
        "SELECT p_partkey, " +
        "CAST(levenshtein(p_type, 'PROMO BURNISHED COPPER') AS INTEGER) AS lev, " +
        "CAST(editdist3(p_brand, 'Brand#13') AS INTEGER) AS ed3, " +
        "CAST(damerau_levenshtein(p_brand, 'Brand#31') AS INTEGER) AS dl, " +
        "CAST(hamming(substring(p_brand, 1, 7), 'Brand#2') AS INTEGER) AS ham, " +
        "ROUND(jaccard(p_name, p_type), 6) AS jac, " +
        "ROUND(jaro_similarity(p_name, p_type), 6) AS js, " +
        "ROUND(jaro_winkler_similarity(p_brand, 'Brand#11'), 6) AS jw " +
        "FROM part ORDER BY p_partkey LIMIT 200"
      Op("fn_strdist", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // DuckDB's date_diff (BOUNDARIES-crossed, not complete intervals —
    // date_diff('month', Jan 31, Feb 1) = 1), dayname/monthname full
    // names, and time_bucket on the 2000-01-03 origin grid. The quoted
    // date_diff spelling is parser-shadowed in Spark, so the text goes
    // through the dialect chain (plans/FunctionRenames.scala).
    {
      val sameText =
        "SELECT o_orderkey, " +
        "date_diff('day', DATE '1995-01-01', o_orderdate) AS dd_day, " +
        "date_diff('month', DATE '1995-01-01', o_orderdate) AS dd_mon, " +
        "date_diff('week', DATE '1995-01-01', o_orderdate) AS dd_wk, " +
        "date_diff('quarter', DATE '1995-01-01', o_orderdate) AS dd_q, " +
        "date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS dd_hr, " +
        "dayname(o_orderdate) AS dn, monthname(o_orderdate) AS mn, " +
        "CAST(time_bucket(INTERVAL '1 week', o_orderdate) AS DATE) AS wk_b, " +
        "CAST(time_bucket(INTERVAL '3 months', o_orderdate) AS DATE) AS q_b " +
        "FROM orders ORDER BY o_orderkey LIMIT 200"
      Op("fn_datetime4", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // Misc DuckDB spellings: fmt-style format(), to_base, gcd/lcm,
    // ord/unicode, prefix/suffix, base64 round-trip,
    // regexp_split_to_array — each a registry alias onto a codegen'd
    // builtin or a small native expression (plans/DateCompat.scala).
    {
      val sameText =
        "SELECT n_nationkey, " +
        "format('{}-{}', n_name, n_regionkey) AS fmt, " +
        "to_base(n_nationkey + 1, 2) AS b2, " +
        "CAST(gcd(n_nationkey, 12) AS BIGINT) AS g, " +
        "CAST(lcm(n_nationkey + 1, 6) AS BIGINT) AS l, " +
        "CAST(ord(n_name) AS INTEGER) AS o, " +
        "CAST(unicode(n_name) AS INTEGER) AS u, " +
        "prefix(n_name, 'A') AS pre, suffix(n_name, 'A') AS suf, " +
        // to_base64 is spec-covered only: DuckDB 1.0 won't implicit-cast a
        // VARCHAR COLUMN to BLOB (literals yes), and the explicit cast
        // spellings differ per engine (BLOB vs BINARY) — no one text runs
        // on both.
        "array_to_string(regexp_split_to_array(n_name, 'A'), '|') AS sp " +
        "FROM nation ORDER BY n_nationkey"
      Op("fn_dialect_misc", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // Predicate spellings both engines parse natively — ILIKE / NOT ILIKE
    // (case-insensitive LIKE) and IS [NOT] DISTINCT FROM (null-safe
    // equality) — ONE text, verbatim on both.
    {
      val sameText =
        "SELECT n_nationkey, n_name ILIKE '%an%' AS il, " +
        "n_name NOT ILIKE 'a%' AS nil, " +
        "n_regionkey IS DISTINCT FROM 1 AS idf, " +
        "NULLIF(n_regionkey, 2) IS NOT DISTINCT FROM NULL AS indf " +
        "FROM nation ORDER BY n_nationkey"
      Op("compat_predicates", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(sameText)
      }
    },

    // DuckDB's SIMILAR TO (anchored plain regex — % is LITERAL, probed) and
    // GLOB (*/?/[class], anchored) onto Spark's infix RLIKE with explicit
    // anchors and a glob→regex translation (plans/SimilarToRewrite.scala).
    // ONE text: DuckDB executes the operators natively.
    {
      val sameText =
        "SELECT p_partkey, " +
        "p_type SIMILAR TO '.*BRUSHED.*' AS sim, " +
        "p_type NOT SIMILAR TO 'PROMO.*' AS nsim, " +
        "p_brand SIMILAR TO 'Brand#[14].' AS simc, " +
        "p_brand GLOB 'Brand#1*' AS g1, " +
        "p_name GLOB '*o[rl]d*' AS g2, " +
        "p_type GLOB '?TANDARD*' AS g3 " +
        "FROM part ORDER BY p_partkey LIMIT 200"
      Op("compat_similar_glob", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    },

    // DuckDB operator spellings — integer division //, power **, bare
    // VARCHAR casts, bracket slices on strings and lists (1-based
    // inclusive, negatives from the end, open ends), string-literal
    // subscripts, and generate_series as a table function. ONE text:
    // DuckDB executes all of it natively; Spark gets `plans.OperatorSyntax`
    // + `graft_slice` + the TVF rewrite. The list slice digests through
    // md5(array_to_string(...)) per the harness's no-raw-array rule.
    {
      val sameText =
        "SELECT CAST(7 // 2 AS BIGINT) AS idiv, " +
        "1 + 2 ** 3 AS pw, " +
        "'abcdef'[2:4] AS sl, " +
        "'abcdef'[-3:] AS sneg, " +
        "'abc'[2] AS ch, " +
        "123::VARCHAR AS vc, " +
        "md5(array_to_string([10,20,30,40][2:3], ',')) AS ls_md5, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM generate_series(1, 5)) AS gs_n"
      Op("compat_operator_syntax", sameText) { (s, d) =>
        Tables.ensure(s, d)
        s.sql(graft.plans.Dialect.rewrite(sameText))
      }
    }
  )
}
