package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Scale experiment: replicate the sf0.1 fixture N times (union of re-keyed
  * copies, repartitioned so scans parallelize like a real multi-file
  * dataset) and measure how the headline plans scale. Linear-or-better
  * wall-time growth with unchanged plan shapes is the evidence that the
  * partitioning/broadcast choices hold at larger SFs.
  *
  * Run: sbt "runMain graft.tools.ScaleCheck [N]"  (default 10 ≈ SF1)
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.ensure(spark, dir)

    // Re-key each copy so join/group cardinalities scale realistically
    // (orders/lineitem keys shifted per copy; dimension tables stay as-is,
    // mirroring how TPC-H scales facts but not nations/regions).
    val copies = spark.range(n).select(col("id").as("copy"))
    def scaled(table: String, keyCols: Seq[String], shift: Long,
        withCopy: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
      val big = spark.table(table).crossJoin(copies)
      val rekeyed = keyCols.foldLeft(big) { (df, k) =>
        df.withColumn(k, col(k) + col("copy") * shift)
      }
      withCopy(rekeyed).drop("copy").repartition(32).createOrReplaceTempView(table)
    }
    scaled("lineitem", Seq("l_orderkey"), 100000000L)
    scaled("orders", Seq("o_orderkey", "o_custkey"), 100000000L)
    scaled("customer", Seq("c_custkey"), 100000000L)
    // Documents: re-key AND salt the text per copy by RENAMING each token
    // with a copy suffix. This preserves every intra-copy similarity exactly
    // (trigram sets are isomorphic to the originals) while making copies
    // pairwise disjoint — so the near-duplicate *rate* stays constant and
    // dup pairs scale linearly, like a real crawl. (An earlier version
    // inserted a shared copy token between words; that made every same-copy
    // doc pair ~50% similar — trigrams of the form (c7, w, c7) — and blew
    // the LSH candidate set up quadratically: 299 s vs 13 s at 10x.)
    scaled("documents", Seq("doc_id"), 1000000L, _.withColumn("text",
      array_join(transform(split(col("text"), " "),
        x => concat(x, lit("c"), col("copy"))), " ")))
    // Events: new users per copy (user_id shifted) so per-user event density
    // — and thus per-partition window/as-of work — stays constant while the
    // user population scales, like a growing product.
    scaled("events", Seq("event_id", "user_id"), 100000000L)
    // Embeddings: per-copy sign-flip pattern on the components (the text
    // salting lesson, vector edition): copies of the same vector must be
    // mutually DISSIMILAR, or cross-copy near-dup clusters grow with N and
    // the LSH candidate set blows up quadratically. Flipping a hash-chosen
    // half of the signs makes cross-copy cosine ~0 while every intra-copy
    // similarity is preserved exactly (|x| and pairwise angles within a copy
    // are sign-pattern invariant), so dup pairs scale linearly.
    scaled("embeddings", Seq("vec_id"), 1000000L, _.withColumn("embedding",
      expr("transform(embedding, (x, i) -> x * (1 - 2 * cast(abs(hash(copy, i)) % 2 as int)))")))

    println(s"[scale] lineitem rows: ${spark.table("lineitem").count()}, " +
      s"documents rows: ${spark.table("documents").count()}, " +
      s"embeddings rows: ${spark.table("embeddings").count()}")

    val queries = SparkEntry.queries
    val names = Seq("agg_h01", "agg_global_h06", "join_inner_h03", "join_left_hist",
      "join_theta", "tpch_h18", "win_rownum", "topk",
      "dedup_exact", "dedup_exact_norm",
      "dedup_minhash_lsh", "dedup_simhash", "dedup_jaccard", "dedup_clusters",
      "text_stats", "text_repetition", "corpus_mixture", "text_boilerplate",
      "pipeline_pack_sequences", "dedup_keep_best",
      "pipeline_clean_corpus", "text_contamination", "join_asof", "join_time_range",
      "events_funnel",
      "pipeline_incremental_dedup",
      "pipeline_train_split", "pipeline_budget_sample", "pipeline_chunk_overlap",
      "text_quality_flags", "text_tfidf_topk", "corpus_source_overlap",
      "corpus_quality_report", "text_lm_score", "dedup_minhash_error",
      "pipeline_shard", "corpus_length_hist",
      "dedup_substring", "text_oov_rate", "pipeline_curriculum",
      "pipeline_dataset_card", "join_asof_nearest",
      "text_entropy", "events_anomaly", "corpus_dedup_funnel",
      "dedup_lines", "pipeline_bpe_pairs", "text_bm25_topk",
      "embed_hybrid_rrf", "text_ppl_buckets", "dedup_containment",
      "embed_pq_rerank", "events_markov", "pipeline_bloom_gate",
      "pipeline_zorder", "text_lm_bigram", "text_heavy_hitters",
      "agg_key_skew", "events_dedup_window", "events_gapfill",
      "corpus_delta_report", "pipeline_quality_sweep", "text_html_extract",
      "embed_cosine_topk", "embed_knn", "embed_sq8_rerank", "embed_bucket_stats",
      "embed_centroid_stats", "embed_kmeans_iter", "embed_kmeans_train",
      "pipeline_dsir_weights", "compat_asof_sql", "win_frame_exclude",
      "pipeline_vocab_coverage", "corpus_growth_curve", "pipeline_cluster_sample",
      "embed_mmr_rerank", "pipeline_coreset", "dedup_editdist",
      "text_winnow", "text_pmi_topk", "embed_ivfpq_topk",
      "pipeline_bpe_train", "text_rake_topk", "embed_bq_rerank",
      "embed_matryoshka", "events_top_paths", "events_power_curve",
      "events_inter_arrival", "pipeline_partition_advice",
      "corpus_ngram_novelty", "corpus_zipf_fit", "events_funnel_time",
      "corpus_lang_confusion", "corpus_js_divergence",
      "corpus_length_outliers", "events_value_stats",
      "embed_norm_stats", "embed_anisotropy", "pipeline_mixture_rebalance",
      "dedup_winnow_pairs", "events_user_lifecycle",
      "text_burstiness", "embed_dim_variance", "corpus_template_detect",
      "events_session_stats", "dedup_cluster_sizes",
      "embed_label_quality", "embed_label_outliers", "pipeline_bpe_apply",
      "events_attribution", "events_props_stats",
      "events_cohort_ltv", "corpus_winsorize", "events_stickiness",
      "events_wau") ++
      // The ORACLE op pins the fixture's 8x16 band shape, whose candidate
      // set grows ~n^2/2^8 — at 30x (60k vectors, ~2e8 candidate pairs) it
      // OOMs the JVM by design. Past 10x only the auto-sized library path
      // below is the supported shape.
      (if (n <= 10) Seq("dedup_embed_lsh", "embed_threshold_sweep") else Seq.empty)
    // Optional args after N: restrict to the named ops (fast re-check).
    val only = args.drop(1).toSet
    names.filter(n => only.isEmpty || only.contains(n)).foreach { name =>
      // warm codegen once, then measure
      try {
        queries(name)(spark, dir).count()
        val t0 = System.nanoTime()
        queries(name)(spark, dir).count()
        println(f"[scale] $name at ${n}x: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable => println(s"[scale] $name FAILED: ${e.getMessage}") }
    }

    // The document salt rewrites EVERY token with a copy suffix, so the
    // oracle-pinned quality gate's stopword list ('the' etc.) matches
    // nothing at scale: the `pipeline_clean_corpus` / `corpus_dedup_funnel`
    // measurements above run an EMPTY-gate pipeline (view generation +
    // predicates only; measured: 0 of 50k docs pass at 10x). The honest
    // scale measurement passes the salted stopword variants to the library
    // path, which restores the fixture's ~80% pass rate — every copy's docs
    // match their own 5 variants — without breaking copy-disjointness (no
    // cross-copy gram sharing is introduced, so LSH candidates stay linear).
    // Fresh DataFrame per action (the named loop's protocol): measuring a
    // second count() on the SAME instance under-reports by an order of
    // magnitude here. Note the harness artifact in these two numbers: the
    // scaled corpus is a VIRTUAL view (crossJoin + per-token salt), so each
    // plan pays view regeneration once per consumer branch — cleanCorpus's
    // quality filter feeds two branches (signatures + anti-join probe) and
    // pays it twice, while dedupFunnel's text-clustering window materializes
    // the view into one reused exchange. On stored data both shapes pay one
    // cheap scan; the signature+verify work itself is the ~0.5-1.5 s part.
    // Grid-blocked spatial join at synthetic scale: 50k*N deterministic
    // points against 500 5x5-degree envelopes over a 100x100 space with
    // cellSize=5 (each polygon covers <=4 cells; candidates per point =
    // polys sharing its cell). The cost driver at scale is the per-
    // candidate exact predicate (one WKB parse per test — a real geo
    // engine caches decoded geometries per partition; documented trade).
    if (only.isEmpty || only.contains("spatial_join")) {
      val nPts = 50000L * n
      val pts = spark.range(nPts).select(col("id"),
        (pmod(col("id") * 7919, lit(100000)) / lit(1000.0)).as("x"),
        (pmod(col("id") * 104729, lit(100000)) / lit(1000.0)).as("y"))
      val polys = spark.range(500).select(col("id").as("gid"),
        call_function("st_makeenvelope",
          pmod(col("id") * 31, lit(95)).cast("double"),
          pmod(col("id") * 17, lit(95)).cast("double"),
          pmod(col("id") * 31, lit(95)).cast("double") + 5.0,
          pmod(col("id") * 17, lit(95)).cast("double") + 5.0).as("geom"))
      val j = graft.operators.SpatialJoin.pointInPolygon(
        pts, polys, col("x"), col("y"), col("geom"), cellSize = 5.0)
      j.count() // warm codegen
      val t0 = System.nanoTime()
      val pairs = j.count()
      println(f"[scale] spatial_join_pip at ${n}x: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($pairs pairs from $nPts pts x 500 polys)")
    }

    // Polygon-polygon blocked join (r14): 20k*N 0.6-degree envelopes per
    // side over a space that grows with sqrt(N) per axis — CONSTANT
    // density, so the true pair count (and the right cost) is linear in N;
    // growth above linear would mean the canonical-cell plan, not the
    // data, is superlinear.
    if (only.isEmpty || only.contains("spatial_join_poly")) {
      val nPolys = 20000L * n
      val spanMilli = math.round(100000.0 * math.sqrt(n.toDouble))
      def side(mx: Long, my: Long, ox: Long, oy: Long, id: String, g: String) =
        spark.range(nPolys).select(col("id").as(id),
          call_function("st_makeenvelope",
            (pmod(col("id") * mx + ox, lit(spanMilli)) / lit(1000.0)),
            (pmod(col("id") * my + oy, lit(spanMilli)) / lit(1000.0)),
            (pmod(col("id") * mx + ox, lit(spanMilli)) / lit(1000.0)) + 0.6,
            (pmod(col("id") * my + oy, lit(spanMilli)) / lit(1000.0)) + 0.6).as(g))
      val a = side(7919L, 104729L, 0L, 0L, "aid", "ageom")
      val b = side(104729L, 7919L, 13L, 7L, "bid", "bgeom")
      val j = graft.operators.SpatialJoin.polygonJoin(
        a, col("ageom"), b, col("bgeom"), cellSize = 1.0)
      j.count() // warm codegen
      val t0 = System.nanoTime()
      val pairs = j.count()
      println(f"[scale] spatial_join_poly at ${n}x: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($pairs pairs from $nPolys x $nPolys envelopes)")
    }

    // The library-path blocks below run only on a FULL sweep — a named-op
    // re-check (args after N) stays focused on the named ops.
    if (only.isEmpty) {
    {
      val stops = for (w <- Seq("the", "a", "of", "and", "in"); c <- 0 until n)
        yield s"${w}c$c"
      val d = spark.table("documents")
      def cc() = graft.operators.TextPipeline.cleanCorpus(d, 20, 0.02, 0.5, stops)
      cc().count() // warm codegen + page cache
      var t0 = System.nanoTime()
      val ccRows = cc().count()
      println(f"[scale] cleanCorpus salted-gate at ${n}x: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($ccRows survivors)")
      def fn() = graft.operators.TextPipeline.dedupFunnel(d, stops)
      fn().count() // warm codegen
      t0 = System.nanoTime()
      fn().count()
      println(f"[scale] dedupFunnel salted-gate at ${n}x: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // The fixed 8-bit-band LSH above collides randomly once the corpus
    // outgrows its 256-value bucket space (candidates ~ n^2/2^bits). The
    // scale posture is the NO-KNOB path: lshDedup with no explicit shape
    // derives bits >= log2(corpus) from a cheap count (HyperplaneLsh
    // .autoShape) and scales bands to hold recall in the high-similarity
    // regime. Measure it.
    {
      val auto = graft.operators.Embeddings.lshDedup(
        spark, spark.table("embeddings"), 0.9)
      auto.count() // warm codegen
      val t0 = System.nanoTime()
      val rows = auto.count()
      val (bits, bands) = graft.plans.HyperplaneLsh.autoShape(
        spark.table("embeddings").count())
      println(f"[scale] dedup_embed_lsh auto(${bits}x$bands) thr=0.9 at ${n}x: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($rows pairs)")
    }

    // Semantic dedup's scale path: the ORACLE op pins 8 centroids for
    // cross-engine determinism; the LIBRARY default (r11: moved into
    // Embeddings.semanticDedup itself) derives k ~ sqrt(n) centroids
    // sampled evenly across the id space, making assignment (n*k) and
    // in-cell pairing (n^2/k) BOTH ~n^1.5. Measure the library default.
    {
      val e = spark.table("embeddings")
      val k = math.max(8L, math.sqrt(e.count().toDouble).toLong)
      val sd = graft.operators.Embeddings.semanticDedup(e, 0.4)
      sd.count() // warm codegen
      val t0 = System.nanoTime()
      val removed = sd.count()
      println(f"[scale] dedup_semantic auto(k=$k) at ${n}x: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($removed removed)")
    }

    // Bucketed co-located join: pay the shuffle once at write time, join
    // shuffle-free afterwards — the pre-partitioning strategy for repeated
    // fact-fact joins at scale.
    // DROP alone is not enough: a stale location from a previous JVM fails
    // the CREATE (the in-memory catalog resets, the filesystem does not).
    Seq("sc_orders", "sc_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    graft.operators.ScaleTechniques.writeBucketed(
      spark.table("orders").select("o_orderkey", "o_totalprice"), "sc_orders", "o_orderkey", 32)
    graft.operators.ScaleTechniques.writeBucketed(
      spark.table("lineitem").select("l_orderkey", "l_quantity"), "sc_lineitem", "l_orderkey", 32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bucketed = spark.table("sc_orders")
      .join(spark.table("sc_lineitem"), col("o_orderkey") === col("l_orderkey"))
    val t0 = System.nanoTime()
    val cnt = bucketed.count()
    val shuffleFree = !bucketed.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
    println(f"[scale] bucketed ${n}x fact-fact join: $cnt%d rows in ${(System.nanoTime() - t0) / 1e9}%.2f s, shuffle-free=$shuffleFree")
    }
    spark.stop()
  }
}
