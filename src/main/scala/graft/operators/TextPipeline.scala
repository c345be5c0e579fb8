package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Training-data text pipeline over `documents`: exact + near deduplication,
  * quality scoring, token counting, language ID, fingerprinting.
  *
  * Scale design: every operator is a groupBy/join on a derived key (text,
  * shingle, band-bucket) — no driver-side materialization anywhere, so each
  * distributes as ordinary shuffles; MinHash banding turns the quadratic
  * near-dup problem into an equi-join on bucket ids.
  */
object TextPipeline {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("documents")
  }

  /** Distinct 3-gram *identities* per doc as 64-bit hashes: (doc_id, gram).
    * Fully codegen path: posexplode the word list (one interpreted `split`
    * only), then form each trigram's hash from (word, lead1, lead2) via a
    * window — avoiding the interpreted `transform`+`concat_ws` lambda that
    * costs ~1 ms/doc. Hash identity stands in for string identity
    * (64-bit collisions are negligible at any realistic gram count).
    */
  private def shingleHashes(d: DataFrame): DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    d.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), col("w"),
        lead(col("w"), 1).over(byPos).as("w1"), lead(col("w"), 2).over(byPos).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), xxhash64(col("w"), col("w1"), col("w2")).as("gram"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs above `threshold`.
    * Shuffles on `gram` (the inverted index) then on the pair — both standard
    * equi-joins; at 100 TB you'd pre-filter with MinHash banding (below) and
    * feed only candidate pairs through this exact verifier.
    */
  def jaccardPairs(d: DataFrame, threshold: Double): DataFrame = {
    val g = shingleHashes(d)
    val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    pairs
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
  }

  /** MinHash signatures: `numHashes` permutations approximated by seeded
    * xxhash64 over each shingle; signature[j] = min_g hash(j, g). Pure
    * higher-order expressions — one codegen'd projection per row.
    */
  def minhashSignature(gramsCol: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      j => array_min(transform(gramsCol, g => xxhash64(j, g))))

  /** LSH candidate pairs: split the signature into `bands` bands of `rowsPer`
    * hashes, bucket docs by (band, hash-of-band), and equi-join buckets.
    * This is the 100 TB path: cost is O(docs x bands) + a shuffle on bucket id,
    * never O(docs^2).
    */
  def minhashCandidates(d: DataFrame, numHashes: Int = 16, bands: Int = 8): DataFrame = {
    val rowsPer = numHashes / bands
    // Stay codegen-friendly: higher-order lambdas (transform/aggregate) fall
    // back to interpreted eval, so the hot path hashes each shingle ONCE with
    // a codegen'd xxhash64 and derives the `numHashes` permutations by
    // re-hashing (hash, k) — never a nested lambda over the gram list.
    // All permutations are computed as parallel min-aggregates in ONE
    // hash aggregation over the (doc, gram-hash) rows: no row explosion, one
    // shuffle of docs x numHashes minima, fully whole-stage-codegen.
    val gramHash = shingleHashes(d).withColumnRenamed("gram", "h")
    val sigCols = (0 until numHashes).map(j => min(xxhash64(col("h"), lit(j))).as(s"m$j"))
    val sig = gramHash.groupBy("doc_id").agg(sigCols.head, sigCols.drop(1): _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rowsPer until (b + 1) * rowsPer).map(j => col(s"m$j")): _*).as(s"band$b")
    }
    val buckets = sig.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(b => col(s"band$b")): _*)))
      .toDF("doc_id", "band", "bucket")
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * xxhash64(token) signs. Distributed as two hash aggregations
    * (doc_id x bit, then doc_id) — no driver involvement, scales linearly.
    */
  def simhash(d: DataFrame): DataFrame = {
    val tok = d.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    tok
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(63))).as("bit"))
      .select(col("doc_id"), col("bit"),
        expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END").as("vote"))
      .groupBy("doc_id", "bit").agg(sum("vote").as("v"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN v > 0 THEN shiftleft(1L, bit) ELSE 0L END")).as("simhash"))
  }

  /** End-to-end corpus cleaning — the composition a training-data pipeline
    * actually runs: quality gate (token count + stopword ratio) → exact
    * near-dup detection on the survivors → drop the higher doc_id of each
    * confirmed pair → surviving corpus. Every stage is the distributed
    * operator defined above; nothing touches the driver.
    */
  def cleanCorpus(d: DataFrame, minTokens: Int, minStopRatio: Double,
      dupThreshold: Double): DataFrame = {
    val quality = d.filter(size(tokens(col("text"))) >= minTokens &&
      stopwordRatio(col("text"), Seq("the", "a", "of", "and", "in")) >= minStopRatio)
    val dups = jaccardPairs(quality, dupThreshold).select(col("id_b").as("doc_id")).distinct()
    quality.join(dups, Seq("doc_id"), "left_anti").select("doc_id")
  }

  val ops: Seq[Op] = Seq(
    Op("pipeline_clean_corpus",
      "WITH q AS (SELECT doc_id, text FROM documents WHERE LEN(STRING_SPLIT(text,' ')) >= 20 " +
      "AND CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), w -> w IN ('the','a','of','and','in'))) AS DOUBLE)/LEN(STRING_SPLIT(text,' ')) >= 0.02), " +
      "w AS (SELECT doc_id, STRING_SPLIT(text,' ') AS words FROM q), " +
      "g AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEN(words) AS INTEGER)-2), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS gram FROM w), " +
      "sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id), " +
      "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter FROM g a JOIN g b ON a.gram=b.gram AND a.doc_id < b.doc_id GROUP BY 1,2), " +
      "dups AS (SELECT DISTINCT id_b FROM pairs JOIN sz sa ON sa.doc_id=id_a JOIN sz sb ON sb.doc_id=id_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.n+sb.n-inter) >= 0.5) " +
      "SELECT doc_id FROM q WHERE doc_id NOT IN (SELECT id_b FROM dups) ORDER BY doc_id") { (s, d) =>
      cleanCorpus(docs(s, d), 20, 0.02, 0.5).orderBy("doc_id")
    },

    Op("dedup_exact",
      "SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS copies FROM documents GROUP BY text ORDER BY keep_id") { (s, d) =>
      docs(s, d).groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
        .select(col("keep_id"), col("copies"))
        .orderBy("keep_id")
    },

    Op("dedup_jaccard",
      "WITH w AS (SELECT doc_id, STRING_SPLIT(text,' ') AS words FROM documents), " +
      "g AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEN(words) AS INTEGER)-2), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS gram FROM w), " +
      "sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id), " +
      "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter FROM g a JOIN g b ON a.gram=b.gram AND a.doc_id < b.doc_id GROUP BY 1,2) " +
      "SELECT id_a, id_b, ROUND(CAST(inter AS DOUBLE)/(sa.n+sb.n-inter),4) AS jaccard FROM pairs " +
      "JOIN sz sa ON sa.doc_id=id_a JOIN sz sb ON sb.doc_id=id_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.n+sb.n-inter) >= 0.12 ORDER BY id_a, id_b") { (s, d) =>
      jaccardPairs(docs(s, d), 0.12).orderBy("id_a", "id_b")
    },

    Op.rowsOnly("dedup_minhash_lsh") { (s, d) =>
      minhashCandidates(docs(s, d)).orderBy("id_a", "id_b")
    },

    Op.rowsOnly("dedup_simhash") { (s, d) =>
      simhash(docs(s, d)).orderBy("doc_id")
    },

    Op("text_stats",
      "SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS n_char, CAST(LEN(STRING_SPLIT(text,' ')) AS INTEGER) AS n_tok, " +
      "ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(text,' '), w -> w IN ('the','a','of','and','in'))) AS DOUBLE)/LEN(STRING_SPLIT(text,' ')),4) AS stop_ratio, " +
      "ROUND(CAST(LENGTH(REGEXP_REPLACE(text,'[a-z ]','','g')) AS DOUBLE)/LENGTH(text),4) AS nonalpha_ratio " +
      "FROM documents ORDER BY doc_id") { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        length(col("text")).as("n_char"),
        size(tokens(col("text"))).as("n_tok"),
        round(stopwordRatio(col("text"), Seq("the", "a", "of", "and", "in")), 4).as("stop_ratio"),
        round(nonAlphaRatio(col("text")), 4).as("nonalpha_ratio")
      ).orderBy("doc_id")
    },

    Op("text_langid",
      "WITH t AS (SELECT doc_id, STRING_SPLIT(LOWER(text),' ') AS w FROM documents), " +
      "s AS (SELECT doc_id, CAST(LEN(LIST_FILTER(w, x -> x IN ('the','a','and','of'))) AS INTEGER) AS en, " +
      "CAST(LEN(LIST_FILTER(w, x -> x IN ('el','la','de','y'))) AS INTEGER) AS es, " +
      "CAST(LEN(LIST_FILTER(w, x -> x IN ('der','und','die','das'))) AS INTEGER) AS de FROM t) " +
      "SELECT doc_id, CASE WHEN en >= es AND en >= de THEN 'en' WHEN es >= de THEN 'es' ELSE 'de' END AS pred, en, es, de FROM s ORDER BY doc_id") { (s, d) =>
      val w = tokens(lower(col("text")))
      val scored = docs(s, d).select(
        col("doc_id"),
        wordHits(w, langMarkers(0)._2).as("en"),
        wordHits(w, langMarkers(1)._2).as("es"),
        wordHits(w, langMarkers(2)._2).as("de"))
      scored.select(
        col("doc_id"),
        when(col("en") >= col("es") && col("en") >= col("de"), "en")
          .when(col("es") >= col("de"), "es").otherwise("de").as("pred"),
        col("en"), col("es"), col("de")
      ).orderBy("doc_id")
    },

    Op("text_tokens",
      "SELECT doc_id, CAST(LEN(STRING_SPLIT(text,' ')) AS INTEGER) AS ws_tokens, " +
      "CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text),'[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpeish FROM documents ORDER BY doc_id") { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        bpeishCount(col("text")).as("bpeish")
      ).orderBy("doc_id")
    },

    Op("text_fingerprint",
      "SELECT doc_id, CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LENGTH(text) AS INTEGER)), i -> i * ASCII(text[i]))) % 1000000007 AS BIGINT) AS fp " +
      "FROM documents ORDER BY doc_id") { (s, d) =>
      docs(s, d).select(col("doc_id"), fingerprint(col("text")).as("fp")).orderBy("doc_id")
    }
  )
}
