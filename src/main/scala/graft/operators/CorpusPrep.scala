package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Second-wave corpus preparation + retrieval operators (additive
  * training-pipeline scope): BM25 ranked retrieval, hybrid lexical+vector
  * fusion, line-level dedup, tokenizer-training pair counts, and
  * perplexity-bucket curriculum assignment.
  *
  * Scale design notes per op inline; the common float policy is the
  * `text_lm_score` one — every per-term double contribution is quantized to
  * an integer micro/milli grid BEFORE any order-dependent sum, so
  * cross-engine reductions are BIGINT arithmetic.
  */
object CorpusPrep {

  // ---- BPE building blocks shared by pipeline_bpe_train / _apply ----------
  // Corpus rides a double-space encoding (' a  b  c ') so one sequential
  // REPLACE of ' w1  w2 ' implements greedy left-to-right non-overlapping
  // merge with identical semantics in both engines (see bpe_train's op doc).

  private def bpePairsSql(c: String, p: String) =
    s"$p AS (SELECT SPLIT_PART(bg,' ',1) AS w1, SPLIT_PART(bg,' ',2) AS w2, " +
    "CAST(COUNT(*) AS BIGINT) AS cnt FROM (SELECT UNNEST(LIST_TRANSFORM(" +
    "GENERATE_SERIES(1, CAST(LEN(ws) AS INTEGER)-1), i -> ws[i] || ' ' || ws[i+1])) AS bg " +
    s"FROM (SELECT STRING_SPLIT(TRIM(s),'  ') AS ws FROM $c) tt) b GROUP BY 1, 2)"

  private def bpeSelSql(p: String, sel: String) =
    s"$sel AS (SELECT w1, w2, cnt FROM $p ORDER BY cnt DESC, w1, w2 LIMIT 1)"

  // `c.* REPLACE (...)` keeps whatever columns the chain carries (doc_id
  // alone for train; doc_id/source/nb for apply).
  private def bpeMergeSql(c: String, sel: String, next: String) =
    s"$next AS (SELECT $c.* REPLACE (REPLACE(s, ' '||$sel.w1||'  '||$sel.w2||' ', " +
    s"' '||$sel.w1||'_'||$sel.w2||' ') AS s) FROM $c, $sel)"

  private def bpePairCounts(c: DataFrame): DataFrame = c
    .select(split(trim(col("s")), "  ").as("ws"))
    .filter(size(col("ws")) >= 2)
    .select(explode(arrays_zip(
      slice(col("ws"), lit(1), size(col("ws")) - 1).as("w0"),
      slice(col("ws"), lit(2), size(col("ws")) - 1).as("s1"))).as("t"))
    .select(col("t.w0").as("w1"), col("t.s1").as("w2"))
    .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  private def bpeSelect1(p: DataFrame): DataFrame =
    p.orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)

  private def bpeApplyMerge(c: DataFrame, sel: DataFrame): DataFrame =
    c.crossJoin(broadcast(sel))
      .withColumn("s", expr(
        "replace(s, concat(' ', w1, '  ', w2, ' '), concat(' ', w1, '_', w2, ' '))"))
      .drop("w1", "w2", "cnt")

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("documents")
  }
  private def emb(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("embeddings")
  }

  /** The fixed demo query for the retrieval ops: terms drawn from the
    * fixture vocabulary. A production call parameterizes these; the oracle
    * needs one concrete instance.
    */
  private val queryTerms = Seq("vector", "query", "join", "stream")

  /** Okapi BM25 (k1=1.2, b=0.75) per-document scores for [[queryTerms]] over
    * `d` (doc_id, text), as integer micro-units: (doc_id, c) where
    * bm25 = c / 1e6. Shape: doc length rides the explode as a grouping key
    * (no separate length join); document frequency of the <=4 query terms is
    * a tiny broadcast; corpus stats (avgdl, N) are a broadcast single-row
    * aggregate. The corpus-side explode filters to query terms BEFORE the
    * aggregate, so the shuffled slice is O(matching tokens), not O(corpus).
    * Per-term contributions quantize to micro-units before the per-doc sum
    * (order-independent BIGINT reduction, the lm_score float policy).
    */
  private[operators] def bm25Micro(d: DataFrame): DataFrame = {
    val nPart = d.sparkSession.sessionState.conf.numShufflePartitions
    val ws = tokens(col("text"))
    val tf = d.repartition(nPart, col("doc_id"))
      .select(col("doc_id"), size(ws).cast("long").as("dl"), explode(ws).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = d.select(size(ws).cast("long").as("dl"))
      .agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"),
        count(lit(1)).as("n_docs"))
    // Exactly the oracle's double expression tree: every operand cast to
    // double before it meets another, identical association on both engines.
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val norm = lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))
    val den = col("tf").cast("double") + lit(1.2) * norm
    val c = round(idf * ((col("tf").cast("double") * lit(2.2)) / den) * lit(1000000.0))
      .cast("long")
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), c.as("c"))
      .groupBy("doc_id").agg(sum("c").as("c"))
  }

  /** The oracle-side rendering of [[bm25Micro]] as DuckDB CTEs (`tf`/`sc`
    * bound to the given source relation). Kept next to the Scala so the two
    * expression trees stay in lock-step.
    */
  private def bm25OracleCtes(rel: String): String =
    s"d AS (SELECT doc_id, STRING_SPLIT(text,' ') AS ws FROM $rel), " +
    "st AS (SELECT CAST(SUM(LEN(ws)) AS DOUBLE)/COUNT(*) AS avgdl, COUNT(*) AS n_docs FROM d), " +
    "w AS (SELECT doc_id, CAST(LEN(ws) AS BIGINT) AS dl, UNNEST(ws) AS term FROM d), " +
    "tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM w " +
    "WHERE term IN ('vector','query','join','stream') GROUP BY 1,2,3), " +
    "dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1), " +
    "sc AS (SELECT tf.doc_id, CAST(ROUND(" +
    "LN(1.0 + (CAST(st.n_docs - dfreq.df AS DOUBLE) + 0.5)/(CAST(dfreq.df AS DOUBLE) + 0.5)) * " +
    "((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE)/st.avgdl)))) " +
    "* 1000000.0) AS BIGINT) AS c FROM tf JOIN dfreq USING (term), st), " +
    "bm AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS c FROM sc GROUP BY doc_id)"

  /** Per-document line-dedup accounting over (doc_id, text): the corpus cut
    * into fixed 8-token lines, each line's first occurrence (by doc_id,
    * then position) kept, repeats counted per document. Three exchanges:
    * doc_id (pre-explode spread), line content (the occurrence window),
    * and the per-doc collapse.
    */
  private[operators] def lineDedupStats(d: DataFrame): DataFrame = {
    val nPart = d.sparkSession.sessionState.conf.numShufflePartitions
    val ws = tokens(col("text"))
    val lines = d.filter(size(ws) > 0)
      .repartition(nPart, col("doc_id"))
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), ceil(size(col("ws")) / lit(8.0)).cast("int") - 1)).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("line_no"),
        array_join(slice(col("ws"), col("i") * 8 + 1, lit(8)), " ").as("line"))
    val occ = row_number().over(Window.partitionBy("line").orderBy("doc_id", "line_no"))
    lines.withColumn("occ", occ)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dup_lines"))
  }

  /** Adjacent token-pair frequencies over (doc_id, text) — the count table
    * one BPE merge iteration ranks. The triRows zip-with-shifted-slice shape
    * (codegen, no window, no lambda); the count is map-side combined so only
    * (pair, partial) rows shuffle.
    */
  private[operators] def bpePairs(d: DataFrame): DataFrame = {
    val nPart = d.sparkSession.sessionState.conf.numShufflePartitions
    val ws = tokens(col("text"))
    d.filter(size(ws) >= 2)
      .repartition(nPart, col("doc_id"))
      .select(ws.as("w0"), slice(ws, lit(2), greatest(size(ws) - 1, lit(0))).as("s1"))
      .select(explode(arrays_zip(col("w0"), col("s1"))).as("t"))
      .filter(col("t.s1").isNotNull)
      .select(col("t.w0").as("w1"), col("t.s1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
  }

  /** Distributed Misra-Gries heavy-hitters summary over a token RDD: at most
    * `k` counters per partition, merged with the mergeable-summaries rule
    * (Agarwal et al., PODS'12): sum counters, then subtract the (k+1)-th
    * largest count and drop non-positives. Guarantees after any merge tree:
    * every term with true count > N/k survives, and every surviving estimate
    * underestimates by at most N/k. One pass, O(k) memory per partition,
    * treeAggregate merge — the 100 TB frequent-items path (exact top-k by
    * groupBy is a full vocabulary shuffle; this never shuffles tokens at
    * all).
    */
  private[operators] def misraGries(
      toks: org.apache.spark.rdd.RDD[String], k: Int): Map[String, Long] = {
    import scala.collection.mutable
    def seqOp(m: mutable.HashMap[String, Long], t: String): mutable.HashMap[String, Long] = {
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // Classic MG decrement: all k counters drop by 1 (the arriving
          // token's implicit counter included), zeros evicted. Each O(k)
          // decrement is paid for by k+1 prior arrivals — amortized O(1).
          m.keys.toList.foreach { key =>
            val nv = m(key) - 1L
            if (nv > 0L) m.update(key, nv) else m.remove(key)
          }
      }
      m
    }
    def combOp(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > k) {
        val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
        a.keys.toList.foreach { key =>
          val nv = a(key) - cut
          if (nv > 0L) a.update(key, nv) else a.remove(key)
        }
      }
      a
    }
    toks.treeAggregate(mutable.HashMap.empty[String, Long])(seqOp, combOp).toMap
  }

  val ops: Seq[Op] = Seq(

    // BM25 ranked retrieval: the lexical half of every retrieval/RAG stack
    // and the standard relevance filter for query-targeted corpus slices.
    // Top-10 documents for the fixed query-term set.
    Op("text_bm25_topk",
      s"WITH ${bm25OracleCtes("documents")} " +
      "SELECT doc_id, CAST(c AS BIGINT)/1000000.0 AS bm25 FROM bm " +
      "ORDER BY bm25 DESC, doc_id LIMIT 10") { (s, d) =>
      bm25Micro(docs(s, d).select("doc_id", "text"))
        .select(col("doc_id"), (col("c") / 1000000.0).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    },

    // Hybrid retrieval via reciprocal rank fusion (k=60): BM25 lexical
    // ranking fused with cosine vector ranking over the embedded slice of
    // the corpus (documents joined to embeddings on doc_id = vec_id; at
    // sf0.1 only a subset of docs is embedded — the universe is that
    // subset, the realistic hybrid-index shape). Each ranking contributes
    // its top-100 list; RRF = sum of 1/(60+rank) over the lists containing
    // the doc. Scale: each top-100 is a distributed TakeOrdered (no global
    // window over data — ranks are assigned on the 100-row result), the
    // fusion is a tiny full-outer join. The 1/(60+r) divisions are exact
    // same-operand IEEE on both engines; ranks are integers.
    Op("embed_hybrid_rrf",
      "WITH u AS (SELECT d.doc_id, d.text, CAST(e.embedding AS DOUBLE[]) AS v " +
      "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id WHERE d.doc_id <> 0), " +
      bm25OracleCtes("u") + ", " +
      "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0), " +
      "rb AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r FROM bm QUALIFY r <= 100), " +
      "rc AS (SELECT u.doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(LIST_COSINE_SIMILARITY(u.v, q.qv), 6) DESC, u.doc_id) AS r " +
      "FROM u, q QUALIFY r <= 100), " +
      "f AS (SELECT COALESCE(rb.doc_id, rc.doc_id) AS doc_id, " +
      "CAST(COALESCE(rb.r, 0) AS INTEGER) AS r_bm25, CAST(COALESCE(rc.r, 0) AS INTEGER) AS r_cos, " +
      "COALESCE(1.0/(60+rb.r), 0) + COALESCE(1.0/(60+rc.r), 0) AS rrf FROM rb FULL JOIN rc ON rb.doc_id = rc.doc_id) " +
      "SELECT doc_id, r_bm25, r_cos, ROUND(rrf, 6) AS rrf FROM f " +
      "ORDER BY rrf DESC, doc_id LIMIT 10") { (s, d) =>
      val u = docs(s, d).filter(col("doc_id") =!= 0)
        .join(emb(s, d).select(col("vec_id"), asDouble(col("embedding")).as("v")),
          col("doc_id") === col("vec_id"))
      val qv = emb(s, d).filter(col("vec_id") === 0)
        .select(asDouble(col("embedding"))).first().getSeq[Double](0)
      // Ranks via distributed top-k then row_number over the 100-row result
      // (same ordering => the global ranks), not a global window over data.
      val rb = bm25Micro(u.select("doc_id", "text"))
        .orderBy(col("c").desc, col("doc_id")).limit(100)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("c").desc, col("doc_id"))).as("r"))
      val rc = u.select(col("doc_id"), round(cosine(col("v"), typedLit(qv)), 6).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(100)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).as("r"))
      rb.as("rb").join(rc.as("rc"), col("rb.doc_id") === col("rc.doc_id"), "full")
        .select(
          coalesce(col("rb.doc_id"), col("rc.doc_id")).as("doc_id"),
          coalesce(col("rb.r"), lit(0)).cast("int").as("r_bm25"),
          coalesce(col("rc.r"), lit(0)).cast("int").as("r_cos"),
          (coalesce(lit(1.0) / (lit(60) + col("rb.r")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rc.r")), lit(0.0))).as("rrf"))
        .select(col("doc_id"), col("r_bm25"), col("r_cos"), round(col("rrf"), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
    },

    // C4-style line-level dedup accounting: the corpus cut into fixed
    // 8-token lines (the fixture text has no newlines; on real data the
    // splitter is `split(text, '\n')` and everything downstream is
    // unchanged), each line's first occurrence (by doc_id, then position)
    // kept, repeats counted per document. Scale: one groupBy-free explode
    // keyed on doc_id, a window over the `line` clustering (distributes by
    // line content), and a per-doc collapse — three exchanges end-to-end,
    // all on unskewed keys.
    Op("dedup_lines",
      "WITH d AS (SELECT doc_id, STRING_SPLIT(text,' ') AS ws FROM documents WHERE LEN(STRING_SPLIT(text,' ')) > 0), " +
      "e AS (SELECT doc_id, ws, UNNEST(RANGE(0, CAST(CEIL(LEN(ws)/8.0) AS BIGINT))) AS i FROM d), " +
      "l AS (SELECT doc_id, i AS line_no, ARRAY_TO_STRING(LIST_SLICE(ws, i*8+1, i*8+8), ' ') AS line FROM e), " +
      "k AS (SELECT doc_id, line_no, ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS occ FROM l) " +
      "SELECT doc_id, COUNT(*) AS n_lines, CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines " +
      "FROM k GROUP BY doc_id ORDER BY doc_id") { (s, d) =>
      lineDedupStats(docs(s, d)).orderBy("doc_id")
    },

    // One BPE-merge candidate scan: adjacent token-pair frequencies across
    // the corpus, top-20 — the inner loop of tokenizer training (each BPE
    // iteration merges the most frequent pair and recounts). Scale: the
    // pair explode is the triRows shape (zip the token array with its own
    // shifted slice — codegen, no window, no lambda) feeding one
    // map-side-combined count; only (pair, partial-count) rows shuffle.
    Op("pipeline_bpe_pairs",
      "WITH d AS (SELECT doc_id, STRING_SPLIT(text,' ') AS ws FROM documents WHERE LEN(STRING_SPLIT(text,' ')) >= 2), " +
      "p AS (SELECT UNNEST(LIST_ZIP(LIST_SLICE(ws, 1, LEN(ws)-1), LIST_SLICE(ws, 2, LEN(ws)))) AS z FROM d) " +
      "SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS cnt FROM p " +
      "GROUP BY 1, 2 ORDER BY cnt DESC, w1, w2 LIMIT 20") { (s, d) =>
      bpePairs(docs(s, d)).orderBy(col("cnt").desc, col("w1"), col("w2")).limit(20)
    },

    // Three full BPE training iterations — the merge TABLE, not just one
    // candidate scan (pipeline_bpe_pairs is the inner loop; this drives
    // it): each round counts adjacent symbol pairs over the CURRENT corpus,
    // merges the most frequent pair (ties lexicographic) everywhere, and
    // recounts over the merged corpus, so later rounds can select pairs
    // containing earlier merges — the actual BPE recursion. The corpus
    // rides a double-space encoding (' a  b  c ') so one sequential
    // REPLACE of ' w1  w2 ' with ' w1_w2 ' implements greedy left-to-right
    // non-overlapping merge with IDENTICAL semantics in both engines
    // (' a  a  a ' merges once — the classic overlap case), while the
    // doubled separators keep adjacent matches from consuming each other's
    // boundary space. Scale: each iteration is one pair-count aggregation
    // (map-side combined, only (pair, count) rows shuffle) plus a
    // broadcast of the 1-row selection into a codegen REPLACE projection —
    // no corpus shuffle anywhere; production trainers amortize further by
    // batching many non-interacting merges per scan.
    Op("pipeline_bpe_train", {
      "WITH c0 AS (SELECT doc_id, ' ' || REPLACE(text,' ','  ') || ' ' AS s FROM documents), " +
      bpePairsSql("c0", "p1") + ", " + bpeSelSql("p1", "s1") + ", " + bpeMergeSql("c0", "s1", "c1") + ", " +
      bpePairsSql("c1", "p2") + ", " + bpeSelSql("p2", "s2") + ", " + bpeMergeSql("c1", "s2", "c2") + ", " +
      bpePairsSql("c2", "p3") + ", " + bpeSelSql("p3", "s3") + " " +
      "SELECT 1 AS iteration, w1, w2, cnt FROM s1 " +
      "UNION ALL SELECT 2, w1, w2, cnt FROM s2 " +
      "UNION ALL SELECT 3, w1, w2, cnt FROM s3 ORDER BY iteration"
    }) { (s, d) =>
      val c0 = docs(s, d).select(col("doc_id"),
        expr("concat(' ', replace(text, ' ', '  '), ' ')").as("s"))
      val s1 = bpeSelect1(bpePairCounts(c0)); val c1 = bpeApplyMerge(c0, s1)
      val s2 = bpeSelect1(bpePairCounts(c1)); val c2 = bpeApplyMerge(c1, s2)
      val s3 = bpeSelect1(bpePairCounts(c2))
      s1.withColumn("iteration", lit(1))
        .unionByName(s2.withColumn("iteration", lit(2)))
        .unionByName(s3.withColumn("iteration", lit(3)))
        .select(col("iteration"), col("w1"), col("w2"), col("cnt"))
        .orderBy("iteration")
    },

    // BPE ENCODE with the trained merge table — the other half of the
    // tokenizer story (pipeline_bpe_train learns the merges; this measures
    // what they buy on the corpus): apply the three learned merges in
    // training order to every document and report per-source token counts
    // before/after, merged-pair count, and the compression ratio — the
    // number a tokenizer owner tracks per data source to see where a
    // vocabulary actually compresses. Scale: each merge application is a
    // broadcast of the 1-row selection into a codegen REPLACE projection
    // (no corpus shuffle); the per-source rollup is one aggregation.
    // Exactness: token counts are integers; ratio floor-divides to micros.
    Op("pipeline_bpe_apply", {
      "WITH c0 AS (SELECT doc_id, source, LEN(STRING_SPLIT(text,' ')) AS nb, " +
      "' ' || REPLACE(text,' ','  ') || ' ' AS s FROM documents), " +
      bpePairsSql("c0", "p1") + ", " + bpeSelSql("p1", "s1") + ", " + bpeMergeSql("c0", "s1", "c1") + ", " +
      bpePairsSql("c1", "p2") + ", " + bpeSelSql("p2", "s2") + ", " + bpeMergeSql("c1", "s2", "c2") + ", " +
      bpePairsSql("c2", "p3") + ", " + bpeSelSql("p3", "s3") + ", " + bpeMergeSql("c2", "s3", "c3") + " " +
      "SELECT source, CAST(SUM(nb) AS BIGINT) AS toks_before, " +
      "CAST(SUM(LEN(STRING_SPLIT(TRIM(s),'  '))) AS BIGINT) AS toks_after, " +
      "CAST(SUM(nb) - SUM(LEN(STRING_SPLIT(TRIM(s),'  '))) AS BIGINT) AS merged, " +
      "CAST(FLOOR(1000000.0 * SUM(LEN(STRING_SPLIT(TRIM(s),'  '))) / SUM(nb)) AS BIGINT) AS ratio_micro " +
      "FROM c3 GROUP BY source ORDER BY source"
    }) { (s, d) =>
      // nb rides the chain from c0 (REPLACE keeps extra columns), so the
      // before-count needs no join back against the corpus.
      val c0 = docs(s, d).select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nb"),
        expr("concat(' ', replace(text, ' ', '  '), ' ')").as("s"))
      val s1 = bpeSelect1(bpePairCounts(c0)); val c1 = bpeApplyMerge(c0, s1)
      val s2 = bpeSelect1(bpePairCounts(c1)); val c2 = bpeApplyMerge(c1, s2)
      val s3 = bpeSelect1(bpePairCounts(c2)); val c3 = bpeApplyMerge(c2, s3)
      c3.select(col("source"), col("nb"),
          size(split(trim(col("s")), "  ")).cast("long").as("na"))
        .groupBy("source")
        .agg(sum("nb").as("toks_before"), sum("na").as("toks_after"),
          (sum("nb") - sum("na")).as("merged"),
          floor(lit(1000000.0) * sum("na") / sum("nb")).cast("long").as("ratio_micro"))
        .orderBy("source")
    },

    // CCNet-style perplexity bucketing: documents split into head/middle/
    // tail terciles of unigram LM score WITHIN each language — the
    // filtering signal CCNet feeds from its LM. Exact per-language NTILE at
    // scale via [[Windows.groupedNtile]]: a plain partitioned window puts
    // each language on one task (a dominant language = most of the corpus
    // on one core); the grouped form range-partitions over (lang, score)
    // so big languages span partitions. LM scores are the text_lm_score
    // integer-milli quantization, so ordering keys are cross-engine exact.
    Op("text_ppl_buckets",
      "WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text,' ')) AS term FROM documents), " +
      "c AS (SELECT term, COUNT(*) AS cnt FROM w GROUP BY 1), " +
      "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c), " +
      "q AS (SELECT w.doc_id, CAST(ROUND(LOG10(CAST(c.cnt AS DOUBLE)/t.total)*1000) AS BIGINT) AS logq " +
      "FROM w JOIN c USING (term), t), " +
      "lm AS (SELECT doc_id, (CAST(SUM(logq) AS BIGINT)/1000.0)/COUNT(*) AS lm_score FROM q GROUP BY doc_id) " +
      "SELECT doc_id, d.lang, CAST(NTILE(3) OVER (PARTITION BY d.lang ORDER BY lm.lm_score, doc_id) AS INTEGER) AS ppl_bucket " +
      "FROM lm JOIN documents d USING (doc_id) ORDER BY doc_id") { (s, d) =>
      val nPart = s.sessionState.conf.numShufflePartitions
      val w = docs(s, d).repartition(nPart, col("doc_id"))
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val cnts = w.groupBy("term").agg(count(lit(1)).as("cnt"))
      val total = cnts.agg(sum("cnt").as("total"))
      val lm = w.join(broadcast(cnts.crossJoin(total)), "term")
        .select(col("doc_id"),
          round(log10(col("cnt").cast("double") / col("total")) * 1000).cast("long").as("logq"))
        .groupBy("doc_id")
        .agg(((sum("logq") / 1000.0) / count(lit(1))).as("lm_score"))
      val withLang = lm.join(docs(s, d).select("doc_id", "lang"), "doc_id")
      Windows.groupedNtile(withLang, 3, Seq("lang"),
          Seq(col("lm_score"), col("doc_id")), "ppl_bucket")
        .select("doc_id", "lang", "ppl_bucket")
        .orderBy("doc_id")
    },

    // Z-order (Morton) multi-dimensional clustering stats: lineitem keyed by
    // the interleaved bits of (l_partkey, l_suppkey) via the native codegen
    // `graft_zorder` expression, bucketed into 256 curve segments. Each
    // segment's min/max on BOTH keys stays tight — the per-file range
    // property behind lakehouse Z-order layout (a 2-D selective scan prunes
    // segments a single-key sort can only prune on its leading column; the
    // pruning win is measured in ZOrderSpec). Scale: the z-value is one
    // per-row codegen expression; the bucket aggregate is one map-side-
    // combined shuffle; a real layout pass follows it with
    // repartitionByRange(zv).write — no extra exchange beyond the write's.
    // Oracle: the same binary-magic-numbers interleave (public-domain bit
    // hack) spelled in portable SQL.
    Op("pipeline_zorder", {
      "WITH a AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
      "l_partkey % 65536 AS x, l_suppkey % 65536 AS y FROM lineitem), " +
      "b AS (SELECT *, (x | (x << 8)) & 16711935 AS xa, (y | (y << 8)) & 16711935 AS ya FROM a), " +
      "c AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb, (ya | (ya << 4)) & 252645135 AS yb FROM b), " +
      "e AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc, (yb | (yb << 2)) & 858993459 AS yc FROM c), " +
      "f AS (SELECT *, (xc | (xc << 1)) & 1431655765 AS xd, (yc | (yc << 1)) & 1431655765 AS yd FROM e), " +
      "z AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, (xd | (yd << 1)) AS zv FROM f), " +
      "g AS (SELECT *, CAST(NTILE(64) OVER (ORDER BY zv, l_orderkey, l_linenumber) AS INTEGER) AS z_seg FROM z) " +
      "SELECT z_seg, CAST(COUNT(*) AS BIGINT) AS n, " +
      "MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk, " +
      "MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk " +
      "FROM g GROUP BY 1 ORDER BY 1"
    }) { (s, d) =>
      Tables.ensure(s, d)
      val zdf = s.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.plans.ZOrderValue.zorder(
            col("l_partkey") % 65536, col("l_suppkey") % 65536).as("zv"))
      // 64 equal-count curve segments — exactly the file boundaries a
      // Z-ordered `repartitionByRange(zv).write` would produce, via the
      // distributed globalNtile (no single-task window).
      Windows.globalNtile(zdf, 64,
          Seq(col("zv"), col("l_orderkey"), col("l_linenumber")), "z_seg")
        .groupBy("z_seg")
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
        .orderBy("z_seg")
    },

    // Interpolated bigram language-model scoring (the CCNet-style LM signal
    // one order up from `text_lm_score`'s unigram): per-document mean log10
    // of p(w2|w1) = 0.9·c(w1 w2)/c(w1) + 0.1·c(w2)/N. Scale: bigrams come
    // from the zip-with-shifted-slice explode (codegen, no window); the
    // bigram-count join shuffles on the bigram key — the bigram table is
    // O(vocab²) and must NOT be broadcast, unlike the bounded unigram vocab,
    // which is — so the probe side shuffles once by bigram and never by the
    // (hot) unigram keys. Per-bigram contributions quantize to integer
    // milli-units before the per-doc sum (the lm_score float policy).
    Op("text_lm_bigram",
      "WITH s AS (SELECT doc_id, STRING_SPLIT(text,' ') AS ws FROM documents), " +
      "b AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEN(ws) AS INTEGER)-1), " +
      "i -> ws[i] || ' ' || ws[i+1])) AS bg FROM s), " +
      "w AS (SELECT doc_id, UNNEST(ws) AS wd FROM s), " +
      "c1 AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1), " +
      "t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c1), " +
      "c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1), " +
      "q AS (SELECT b.doc_id, CAST(ROUND(LOG10(0.9*CAST(c2.c AS DOUBLE)/u1.c + 0.1*CAST(u2.c AS DOUBLE)/t.total)*1000) AS BIGINT) AS lq " +
      "FROM b JOIN c2 USING (bg) " +
      "JOIN c1 u1 ON u1.wd = SPLIT_PART(b.bg, ' ', 1) " +
      "JOIN c1 u2 ON u2.wd = SPLIT_PART(b.bg, ' ', 2), t) " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, " +
      "(CAST(SUM(lq) AS BIGINT)/1000.0)/COUNT(*) AS lm2_score " +
      "FROM q GROUP BY 1 ORDER BY doc_id") { (s, d) =>
      val nPart = s.sessionState.conf.numShufflePartitions
      val sdf = docs(s, d).repartition(nPart, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("ws"))
      val bigrams = sdf.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1).as("w0"),
          slice(col("ws"), lit(2), size(col("ws")) - 1).as("s1"))).as("t"))
        .select(col("doc_id"), col("t.w0").as("w1"), col("t.s1").as("w2"),
          concat_ws(" ", col("t.w0"), col("t.s1")).as("bg"))
      val w = sdf.select(col("doc_id"), explode(col("ws")).as("wd"))
      val c1 = w.groupBy("wd").agg(count(lit(1)).as("c"))
      val total = c1.agg(sum("c").cast("long").as("total"))
      val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c2"))
      bigrams.join(c2, "bg")
        .join(broadcast(c1.select(col("wd").as("w1"), col("c").as("cu1"))), "w1")
        .join(broadcast(c1.select(col("wd").as("w2"), col("c").as("cu2"))), "w2")
        .crossJoin(broadcast(total))
        .select(col("doc_id"),
          round(log10(lit(0.9) * col("c2").cast("double") / col("cu1") +
            lit(0.1) * col("cu2").cast("double") / col("total")) * 1000)
            .cast("long").as("lq"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          ((sum("lq") / 1000.0) / count(lit(1))).as("lm2_score"))
        .orderBy("doc_id")
    },

    // PMI collocation mining — the statistical phrase detector (word2vec's
    // phrase pass, NLTK's collocation finder): score every adjacent word
    // pair by log10(p(w1,w2) / (p(w1)p(w2))) and keep the top-30 with
    // count >= 5. High-PMI pairs are the multiword units a tokenizer or
    // phrase-merging pass should treat as one symbol. Scale shape mirrors
    // text_lm_bigram: bigram counts group on the bigram key (map-side
    // combined, never broadcast — the table is O(vocab²)); the bounded
    // unigram vocab and the two scalar totals broadcast. Float policy:
    // PMI quantizes to integer milli-units from all-integer inputs in the
    // same written order both engines (the lm_score pattern), so the top-k
    // boundary cannot flip on a last-ulp difference.
    Op("text_pmi_topk",
      "WITH s AS (SELECT doc_id, STRING_SPLIT(text,' ') AS ws FROM documents), " +
      "w AS (SELECT UNNEST(ws) AS wd FROM s), " +
      "c1 AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1), " +
      "nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nut FROM c1), " +
      "b AS (SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEN(ws) AS INTEGER)-1), " +
      "i -> ws[i] || ' ' || ws[i+1])) AS bg FROM s), " +
      "c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM b GROUP BY 1), " +
      "nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS nbt FROM c2) " +
      "SELECT SPLIT_PART(bg,' ',1) AS w1, SPLIT_PART(bg,' ',2) AS w2, c12, " +
      "CAST(ROUND(LOG10(CAST(c12 AS DOUBLE) * nu.nut * nu.nut / " +
      "(CAST(nb.nbt AS DOUBLE) * u1.c * u2.c)) * 1000) AS BIGINT) AS pmi_milli " +
      "FROM c2 JOIN c1 u1 ON u1.wd = SPLIT_PART(bg,' ',1) " +
      "JOIN c1 u2 ON u2.wd = SPLIT_PART(bg,' ',2), nu, nb " +
      "WHERE c12 >= 5 ORDER BY pmi_milli DESC, w1, w2 LIMIT 30") { (s, d) =>
      val sdf = docs(s, d).select(col("doc_id"), tokens(col("text")).as("ws"))
      val c1 = sdf.select(explode(col("ws")).as("wd"))
        .groupBy("wd").agg(count(lit(1)).as("c"))
      val nu = c1.agg(sum("c").cast("long").as("nut"))
      val c2 = sdf.filter(size(col("ws")) >= 2)
        .select(explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1).as("w0"),
          slice(col("ws"), lit(2), size(col("ws")) - 1).as("s1"))).as("t"))
        .select(col("t.w0").as("w1"), col("t.s1").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val nb = c2.agg(sum("c12").cast("long").as("nbt"))
      c2.filter(col("c12") >= 5)
        .join(broadcast(c1.select(col("wd").as("w1"), col("c").as("cu1"))), "w1")
        .join(broadcast(c1.select(col("wd").as("w2"), col("c").as("cu2"))), "w2")
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c12"),
          round(log10(col("c12").cast("double") * col("nut") * col("nut") /
            (col("nbt").cast("double") * col("cu1") * col("cu2"))) * 1000)
            .cast("long").as("pmi_milli"))
        .orderBy(col("pmi_milli").desc, col("w1"), col("w2")).limit(30)
    },

    // Misra-Gries heavy hitters: the sketch side of frequent-terms (exact
    // top-k by df is `text_vocab`; this is the one-pass bounded-memory path
    // that needs NO token shuffle at any corpus size). Error-bound oracle
    // (the agg_approx_distinct pattern): the sketch must (a) retain every
    // term with true count > N/k and (b) underestimate any retained term by
    // at most N/k — both checked here against exact counts (the exact side
    // is the verification harness, driver-collected over the fixture's
    // bounded vocabulary; the SKETCH never shuffles or collects tokens).
    // k=16 < the fixture's 31-term vocabulary, so the decrement/merge path
    // genuinely exercises; N/16.0 is a power-of-two division, exact in both
    // engines. The oracle recomputes n_exact_heavy from scratch in SQL.
    Op.eager("text_heavy_hitters",
      "WITH w AS (SELECT UNNEST(STRING_SPLIT(text,' ')) AS wd FROM documents), " +
      "c AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1), " +
      "t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c) " +
      "SELECT 1 AS all_heavy_present, 1 AS underest_within_bound, " +
      "(SELECT CAST(COUNT(*) AS BIGINT) FROM c, t WHERE c.c > t.n/16.0) AS n_exact_heavy") { (s, d) =>
      val k = 16
      val toks = docs(s, d).select(explode(tokens(col("text"))).as("wd"))
      val sketch = misraGries(toks.rdd.map(_.getString(0)), k)
      val exact = toks.groupBy("wd").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = exact.values.sum
      val bound = n.toDouble / k
      val heavy = exact.collect { case (t, c) if c > bound => t }.toSet
      val allPresent = if (heavy.forall(sketch.contains)) 1 else 0
      val withinBound = if (sketch.forall { case (t, est) =>
        val ex = exact.getOrElse(t, 0L)
        est <= ex && (ex - est) <= bound
      }) 1 else 0
      import s.implicits._
      Seq((allPresent, withinBound, heavy.size.toLong))
        .toDF("all_heavy_present", "underest_within_bound", "n_exact_heavy")
    }
  )
}
