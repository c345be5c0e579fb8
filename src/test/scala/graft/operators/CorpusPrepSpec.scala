package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestHarness

/** Properties of the second-wave corpus ops the DuckDB oracle can't express:
  * groupedNtile's exact equivalence to the per-partition window form, and
  * structural invariants of the retrieval/dedup outputs.
  */
class CorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.sfDir
  import spark.implicits._

  private def op(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("groupedNtile matches windowed per-group NTILE for every remainder case") {
    import org.apache.spark.sql.expressions.{Window => W}
    for (n <- Seq(1, 3, 4)) {
      // Uneven group sizes: 1, 5, 7, 12 rows — hits every total%n case.
      val rows = for {
        (g, total) <- Seq(("a", 1), ("b", 5), ("c", 7), ("d", 12))
        i <- 0 until total
      } yield (g, i.toLong)
      val df = rows.toDF("g", "v")
      val expected = df.select($"g", $"v",
          ntile(n).over(W.partitionBy("g").orderBy("v")).as("tile"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
      val got = Windows.groupedNtile(df, n, Seq("g"), Seq($"v"), "tile")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
      assert(got.toSeq === expected.toSeq, s"n=$n")
    }
  }

  test("groupedNtile is exact when one dominant group spans many partitions") {
    import org.apache.spark.sql.expressions.{Window => W}
    // 90% of rows in one group (the dominant-language shape the operator
    // exists for), shuffled input; plus several small groups, one of which
    // will share range partitions with its neighbors.
    val df = spark.range(20000).select(
        when($"id" % 10 =!= 0, lit("big")).otherwise(concat(lit("s"), $"id" % 7)).as("g"),
        (hash($"id") % 1000000).cast("long").as("v"),
        $"id".as("k"))
      .repartition(17)
    val expected = df.select($"g", $"k",
        ntile(5).over(W.partitionBy("g").orderBy($"v", $"k")).as("tile"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val out = Windows.groupedNtile(df, 5, Seq("g"), Seq($"v", $"k"), "tile")
    val got = out.select($"g", $"k", $"tile")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.toSeq === expected.toSeq)
    assert(!out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      "groupedNtile must not convert to RDD[Row]")
  }

  test("dedup_lines charges repeats to later docs and keeps first occurrences clean") {
    // Constructed corpus: doc 20 is an exact copy of doc 10 (every line a
    // repeat); doc 30 shares only its first 8-token line with doc 10; doc 40
    // is unique. Lines are 8 tokens, so each text below is 2 lines.
    val a = "t1 t2 t3 t4 t5 t6 t7 t8 u1 u2 u3 u4 u5 u6 u7 u8"
    val c = "t1 t2 t3 t4 t5 t6 t7 t8 x1 x2 x3 x4 x5 x6 x7 x8"
    val d = Seq((10L, a), (20L, a), (30L, c), (40L, "y1 y2 y3"))
      .toDF("doc_id", "text")
    val got = CorpusPrep.lineDedupStats(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(10L -> ((2L, 0L)), 20L -> ((2L, 2L)),
      30L -> ((2L, 1L)), 40L -> ((1L, 0L))), s"got $got")
    // Fixture smoke: dup counts bounded by line counts.
    val fx = op("dedup_lines").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(fx.nonEmpty && fx.forall { case (n, dd) => dd >= 0 && dd <= n })
  }

  test("embed_hybrid_rrf scores decompose into the published rank formula") {
    val rows = op("embed_hybrid_rrf")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 10)
    rows.foreach { case (id, rb, rc, rrf) =>
      assert(rb >= 0 && rb <= 100 && rc >= 0 && rc <= 100)
      assert(rb > 0 || rc > 0, s"doc $id in fused output but in neither list")
      val want = (if (rb > 0) 1.0 / (60 + rb) else 0.0) +
        (if (rc > 0) 1.0 / (60 + rc) else 0.0)
      assert(math.abs(rrf - want) < 1e-6, s"doc $id rrf $rrf != $want")
    }
    // Descending fusion order.
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
  }

  test("bm25 scoring: more query-term mass outranks less; absent terms score nothing") {
    // Monotonicity probe on a constructed corpus via the reusable scorer:
    // doc 1 (all four query terms, twice) > doc 2 (one term, once); doc 3
    // (no query terms) must not appear at all.
    val d = Seq(
      (1L, "vector query join stream vector query join stream"),
      (2L, "vector table table table table table table table"),
      (3L, "table part region nation order line item scan")).toDF("doc_id", "text")
    val scores = CorpusPrep.bm25Micro(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scores.keySet == Set(1L, 2L))
    assert(scores(1L) > scores(2L))
    assert(scores(2L) > 0)
    // Fixture smoke: the op's output is sorted by score descending.
    val top = op("text_bm25_topk").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
    assert(top.forall(_._2 > 0))
  }

  test("bpePairs counts adjacent pairs exactly (constructed corpus)") {
    // "a b" appears 2+1 = 3 times, "b a" 2, "b c" 1; the 1-token doc
    // contributes nothing.
    val d = Seq((1L, "a b a b a"), (2L, "a b c"), (3L, "c")).toDF("doc_id", "text")
    val got = CorpusPrep.bpePairs(d)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "b") -> 3L, ("b", "a") -> 2L, ("b", "c") -> 1L))
  }

  test("containmentPairs flags a quoted short doc that Jaccard under-scores") {
    // Doc 2 is doc 1's first 12 tokens verbatim (10 trigrams, all inside
    // doc 1's 38): containment of the short side = 1.0 while Jaccard is
    // 10/38 ~ 0.26 — the directed metric catches what the symmetric one
    // misses. Doc 3 shares nothing.
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val d = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val got = TextPipeline.containmentPairs(d, 0.5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, math.rint(10.0 / 38 * 10000) / 10000, 1.0)), s"got ${got.toSeq}")
    assert(TextPipeline.jaccardPairs(d, 0.5).collect().isEmpty,
      "Jaccard at the same threshold must miss the quoted pair")
  }

  test("events_markov probabilities are conditional distributions per from_type") {
    val rows = op("events_markov")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val pSum = ts.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 0.01, s"$from p-sum $pSum") // 4dp rounding slack
      ts.foreach { case (_, _, cnt, p) => assert(cnt > 0 && p > 0) }
    }
  }

  test("DuckDB-dialect aliases: literal split semantics and vector parity") {
    // string_split must split on the LITERAL separator even when it is a
    // regex metacharacter (the \\Q...\\E quoting in DuckDbCompat).
    val r = spark.sql("SELECT string_split('a.b|c.d', '.') AS s, " +
      "string_split('a.b|c.d', '|') AS p").collect().head
    assert(r.getSeq[String](0) == Seq("a", "b|c", "d"))
    assert(r.getSeq[String](1) == Seq("a.b", "c.d"))
    // list_* aliases resolve and agree with the Spark-native spellings.
    val r2 = spark.sql(
      "SELECT list_contains(list_value(1, 2, 3), 2) AS c, " +
      "list_slice(list_value(1, 2, 3, 4), 2, 3) AS sl, " +
      "list_transform(list_value(1, 2), x -> x * 10) AS t, " +
      "list_append(list_value(1), 9) AS ap, " +
      "regexp_matches('graft', 'gr.ft') AS m").collect().head
    assert(r2.getBoolean(0) && r2.getSeq[Int](1) == Seq(2, 3))
    assert(r2.getSeq[Int](2) == Seq(10, 20) && r2.getSeq[Int](3) == Seq(1, 9))
    assert(r2.getBoolean(4))
    // Vector aliases ride the native codegen expressions bit-for-bit.
    val v = spark.sql(
      "SELECT list_cosine_similarity(array(1.0d, 2.0d), array(2.0d, 1.0d)) = " +
      "graft_cosine(array(1.0d, 2.0d), array(2.0d, 1.0d)) AS ceq, " +
      "list_inner_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ip, " +
      "list_distance(array(0.0d, 3.0d), array(4.0d, 0.0d)) AS d").collect().head
    assert(v.getBoolean(0) && v.getDouble(1) == 11.0 && v.getDouble(2) == 5.0)
  }

  test("misraGries retains every heavy hitter within bound on a skewed corpus") {
    // Constructed Zipf-ish skew: term_i appears ~40000/i times over a
    // 500-term vocabulary — unlike the near-uniform fixture, several terms
    // exceed N/k, so the PRESENCE guarantee is exercised non-vacuously
    // (the fixture-backed oracle exercises the decrement/merge and bound).
    val k = 20
    val toks = spark.sparkContext.parallelize(
      (1 to 500).flatMap(i => Seq.fill(40000 / i)(s"t$i")), 8)
    val sketch = CorpusPrep.misraGries(toks, k)
    val exact = (1 to 500).map(i => s"t$i" -> (40000 / i).toLong).toMap
    val n = exact.values.sum
    val bound = n.toDouble / k
    val heavy = exact.collect { case (t, c) if c > bound => t }.toSet
    assert(heavy.nonEmpty && heavy.size < k, s"want a non-trivial heavy set, got ${heavy.size}")
    assert(sketch.size <= k)
    heavy.foreach(t => assert(sketch.contains(t), s"heavy term $t evicted"))
    sketch.foreach { case (t, est) =>
      val ex = exact(t)
      assert(est <= ex && ex - est <= bound, s"$t: est=$est exact=$ex bound=$bound")
    }
  }

  test("text_ppl_buckets covers every doc once with buckets 1..3 per language") {
    val out = op("text_ppl_buckets")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val nDocs = spark.table("documents").count()
    assert(out.length.toLong == nDocs)
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(t => t._3 >= 1 && t._3 <= 3))
    // Within each language the tercile sizes differ by at most 1 (NTILE's
    // contract) — the property the grouped two-phase arithmetic must keep.
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._3).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"lang $lang tercile sizes $sizes")
    }
  }
}
