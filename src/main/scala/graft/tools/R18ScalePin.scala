package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}
import java.nio.file.{Files, Paths}

/** VERDICT r17 #3: prove the 8c≈32c core-ratio at sf0.1 is a small-scale
  * artifact (per-query stage-wave latency floor), not a parallelism bug, by
  * timing the heaviest queries on a ~sf1 MATERIALIZED dataset at local[8]
  * vs local[32].
  *
  * Phase 1 (once): write /tmp/graft_sf1 — the sf0.1 fixture replicated N=10×
  * as real parquet files, re-keyed per copy the ScaleCheck way (facts get
  * shifted keys; document text is token-salted per copy so intra-copy
  * similarity is preserved exactly while copies stay pairwise disjoint —
  * near-dup pairs scale linearly like a real crawl; embedding copies get a
  * hash-chosen sign-flip pattern so cross-copy cosine ~ 0). Materialized to
  * parquet — not ScaleCheck's cross-join views — so scans, pushdown and the
  * PlanCache input-size probe see a real on-disk dataset.
  *
  * Phase 2: for each core count (8, then 32), a fresh local[c] session runs
  * each probe query 2 warm + 3 timed passes through the same
  * PlanCache.count path the bench times; per-query medians and the
  * c8/c32 ratio go to tools/scale_c8_vs_c32_sf1.json.
  *
  * Run: sbt "runMain graft.tools.R18ScalePin [copies]"
  */
object R18ScalePin {
  private val probeQueries = Seq(
    "dedup_jaccard", "pipeline_clean_corpus", "dedup_minhash_lsh",
    "tpch_h21", "tpch_h09")

  def generate(copies: Int, outDir: String): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, "/root/testdata/sf0.1")
    val cps = spark.range(copies).select(col("id").as("copy"))
    def write(table: String, keyShifts: Map[String, Long],
        extra: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): Unit = {
      val big = spark.table(table).crossJoin(cps)
      val rekeyed = keyShifts.foldLeft(big) { case (df, (k, shift)) =>
        df.withColumn(k, col(k) + col("copy") * shift)
      }
      extra(rekeyed).drop("copy").repartition(16)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    val K = 100000000L
    write("lineitem", Map("l_orderkey" -> K, "l_partkey" -> K, "l_suppkey" -> K))
    write("orders", Map("o_orderkey" -> K, "o_custkey" -> K))
    write("customer", Map("c_custkey" -> K))
    write("supplier", Map("s_suppkey" -> K))
    write("part", Map("p_partkey" -> K))
    // Token-salt per copy, PRESERVING stopwords: ScaleCheck's salt-every-
    // token recipe turns "the" into "thec3", so the stopword-ratio quality
    // gate rejects every scaled doc and pipeline_clean_corpus runs over an
    // EMPTY corpus (found r18: c8=0.29 s at "sf1" — faster than sf0.1).
    // Unsalted stopwords create a few cross-copy shared trigrams (3
    // consecutive stopwords), bounded and rare — near-dup pairs still scale
    // linearly.
    write("documents", Map("doc_id" -> 1000000L), _.withColumn("text",
      array_join(transform(split(col("text"), " "),
        x => when(x.isin("the", "a", "of", "and", "in"), x)
          .otherwise(concat(x, lit("c"), col("copy")))), " ")))
    write("events", Map("event_id" -> K, "user_id" -> K))
    write("embeddings", Map("vec_id" -> 1000000L), _.withColumn("embedding",
      expr("transform(embedding, (x, i) -> x * (1 - 2 * cast(abs(hash(copy, i)) % 2 as int)))")))
    // dimensions stay as-is
    for (t <- Seq("nation", "region"))
      spark.table(t).repartition(1).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    println(s"[scalepin] generated $outDir at ${copies}x")
    spark.stop()
  }

  private def timeAt(cores: Int, dir: String): Map[String, Double] = {
    val spark = GraftSession.builder(s"local[$cores]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, dir)
    val qs = SparkEntry.countQueries
    val out = probeQueries.map { name =>
      for (_ <- 1 to 2) qs(name)(spark, dir) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(spark, dir)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[scalepin] c$cores $name%-24s ${ts.map(t => f"$t%.2f").mkString(", ")}")
      name -> ts(2)
    }.toMap
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val dir = s"/tmp/graft_sf1"
    if (!Files.exists(Paths.get(s"$dir/lineitem.parquet"))) generate(copies, dir)
    val c8 = timeAt(8, dir)
    val c32 = timeAt(32, dir)
    val perQuery = probeQueries.map { n =>
      f""""$n":{"c8":${c8(n)}%.3f,"c32":${c32(n)}%.3f,"ratio":${c8(n) / c32(n)}%.2f}"""
    }.mkString(",")
    val json = s"""{"copies":$copies,"dir":"$dir","protocol":"median of 5 warm passes per core count, PlanCache.count path","per_query":{$perQuery}}"""
    println(json)
    Files.write(Paths.get("tools/scale_c8_vs_c32_sf1.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
