package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.VectorFunctions._

/** r18: the grouped-pair-generation lever on hyperplane-LSH candidate
  * pairs (Embeddings.lshCandidates) — structurally identical to the
  * measured minhash bandPairs win (tiny members: one long id; bucket rows
  * from a posexplode; self-join on (band, bucket); trailing distinct).
  * Timed end-to-end through the dedup_embed_lsh shape (candidates + exact
  * cosine verify) via PlanCache.count, counts asserted identical.
  *
  *   join  bucket self-join (shipped)
  *   agg   groupBy(band, bucket) sorted collect_list + chained generators
  *   cur   Embeddings.lshDedup as shipped (sanity anchor = join)
  *
  * Run: sbt "runMain graft.tools.R18LshPairsAb [rounds] [sfDirOrDir]"
  */
object R18LshPairsAb {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(9)
    val sfDir = args.drop(1).headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val threshold = 0.9
    def e = spark.table("embeddings")
    val (bpb, nb) = graft.plans.HyperplaneLsh.autoShape(e.count())
    System.err.println(s"[lp] shape: bitsPerBand=$bpb bands=$nb @$sfDir")

    def buckets: DataFrame = e.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), posexplode(lshBuckets(col("v"), bpb, nb)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    def candJoin: DataFrame = {
      val b = buckets
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
    }
    def candAgg: DataFrame = buckets
      .groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("vec_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")))
      .select(col("col").as("id_a"),
        explode(slice(col("ds"), col("pos") + lit(2), size(col("ds")))).as("id_b"))
      .distinct()
    def verified(cand: DataFrame): DataFrame = {
      val va = e.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("va"))
      val vb = e.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("vb"))
      cand.join(va, "id_a").join(vb, "id_b")
        .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cos"))
        .filter(col("cos") >= threshold)
        .orderBy("id_a", "id_b")
    }

    // The verified output can be empty at high thresholds (timing still
    // valid — candidates are generated and verified); assert equivalence on
    // the CANDIDATE sets directly, once, so the equality check is not
    // trivially satisfied by an empty result.
    val nJoin = candJoin.count()
    val nAgg = candAgg.count()
    System.err.println(s"[lp] candidate counts: join=$nJoin agg=$nAgg")
    require(nJoin == nAgg, s"candidate sets diverge: join=$nJoin agg=$nAgg")
    require(candJoin.exceptAll(candAgg).isEmpty && candAgg.exceptAll(candJoin).isEmpty,
      "candidate multisets diverge")

    def pc(key: String)(build: => DataFrame): Long =
      graft.engine.PlanCache.count(spark, s"r18lp:$key:$sfDir")(build)
    val variants: Seq[(String, () => Long)] = Seq(
      "join" -> (() => pc("join")(verified(candJoin))),
      "agg" -> (() => pc("agg")(verified(candAgg))),
      "cur" -> (() => pc("cur")(
        graft.operators.Embeddings.lshDedup(spark, e, threshold))))
    for (_ <- 1 to 2; (_, f) <- variants) f()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    var counts = Map.empty[String, Long]
    for (r <- 1 to rounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ dt
      counts += name -> n
      System.err.println(f"[lp] round $r $name%-5s $dt%.3f s (n=$n)")
    }
    require(counts.values.toSet.size == 1, s"variant results diverge: $counts")
    println(variants.map { case (name, _) =>
      val ts = times(name).sorted
      f"$name=${ts(ts.size / 2)}%.3f"
    }.mkString(s"medians @$sfDir: ", "  ", s"  counts: $counts"))
  }
}
