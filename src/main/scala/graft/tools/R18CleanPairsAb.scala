package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._

/** r18: the minhash grouped-pair-generation lever applied to
  * pipeline_clean_corpus's (band, bucket) self-join — the pipeline's
  * dominant phase (0.256 s marginal of 0.688 at sf0.1, R18CleanPhases).
  * The shipped join reads the bucket exchange twice (ReusedExchange) and
  * carries each member's gram array `gs` through the join twice; the
  * candidate rewrite groups each bucket once and emits strictly-later
  * member pairs via chained generators, arrays riding in the group list.
  *
  *   join  shipped: bucket self-join, a.doc_id < b.doc_id, inline
  *         array_intersect verify
  *   agg   groupBy(band, bucket) + sort_array(collect_list(struct(doc_id,
  *         n, gs))) + posexplode/explode(slice) pairs, same inline verify
  *   cur   TextPipeline.cleanCorpus as shipped (sanity anchor = join)
  *
  * All variants end in the same survivors anti-join and are timed through
  * PlanCache.count (the bench path); survivor counts asserted identical.
  *
  * Run: sbt "runMain graft.tools.R18CleanPairsAb [rounds] [sfDirOrDir]"
  */
object R18CleanPairsAb {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(9)
    val sfDir = args.drop(1).headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    import graft.operators.TextPipeline.MinHashParams._
    val threshold = 0.5
    val stopwords = Seq("the", "a", "of", "and", "in")

    def quality = spark.table("documents")
      .filter(size(tokens(col("text"))) >= 20 &&
        stopwordRatio(col("text"), stopwords) >= 0.02)

    def buckets(d: DataFrame): DataFrame = {
      val ws = tokens(col("text"))
      val n = d.sparkSession.sessionState.conf.numShufflePartitions
      val tri = d.filter(col("doc_id").isNotNull)
        .repartition(n, col("doc_id"))
        .select(col("doc_id"), ws.as("w0"),
          slice(ws, lit(2), greatest(size(ws) - 1, lit(0))).as("s1"),
          slice(ws, lit(3), greatest(size(ws) - 2, lit(0))).as("s2"))
        .select(col("doc_id"), explode(arrays_zip(col("w0"), col("s1"), col("s2"))).as("t"))
        .filter(col("t.s2").isNotNull)
        .select(col("doc_id"),
          conv(substring(md5(concat_ws(" ", col("t.w0"), col("t.s1"), col("t.s2"))), 1, 15), 16, 10)
            .cast("long").as("g"))
        .dropDuplicates("doc_id", "g")
      val sigCols = (0 until numHashes).map(j =>
        min((lit(A(j)) * (col("g") % P) + lit(B(j))) % P).as(s"m$j")) ++
        Seq(count(lit(1)).as("n"))
      val doc = tri.groupBy("doc_id").agg(collect_list(col("g")).as("gs"), sigCols: _*)
      val bandCols = (0 until bands).map(b =>
        (col(s"m${2 * b}") * P + col(s"m${2 * b + 1}")).as(s"band$b"))
      doc.select(col("doc_id") +: col("gs") +: col("n") +: bandCols: _*)
        .select(col("doc_id") +: posexplode(
          array((0 until bands).map(b => col(s"band$b")): _*)) +: Seq(col("gs"), col("n")): _*)
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    }

    val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    def dupsJoin(b: DataFrame): DataFrame =
      b.as("a").hint("shuffle_hash").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id"), col("a.n").as("na"), col("b.n").as("nb"),
          size(array_intersect(col("a.gs"), col("b.gs"))).as("inter"))
        .filter(jac >= threshold)
        .select("doc_id")
    def dupsAgg(b: DataFrame): DataFrame =
      b.groupBy("band", "bucket")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n"), col("gs")))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(col("ds"), posexplode(col("ds")))
        .select(col("col").as("a"),
          explode(slice(col("ds"), col("pos") + lit(2), size(col("ds")))).as("b"))
        .select(col("b.doc_id").as("doc_id"), col("a.n").as("na"), col("b.n").as("nb"),
          size(array_intersect(col("a.gs"), col("b.gs"))).as("inter"))
        .filter(jac >= threshold)
        .select("doc_id")

    def pc(key: String)(build: => DataFrame): Long =
      graft.engine.PlanCache.count(spark, s"r18cp:$key:$sfDir")(build)
    val variants: Seq[(String, () => Long)] = Seq(
      "join" -> (() => pc("join")(
        quality.join(dupsJoin(buckets(quality)), Seq("doc_id"), "left_anti").select("doc_id"))),
      "agg" -> (() => pc("agg")(
        quality.join(dupsAgg(buckets(quality)), Seq("doc_id"), "left_anti").select("doc_id"))),
      "cur" -> (() => pc("cur")(graft.operators.TextPipeline
        .cleanCorpus(spark.table("documents"), 20, 0.02, 0.5))))
    for (_ <- 1 to 2; (_, f) <- variants) f()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    var counts = Map.empty[String, Long]
    for (r <- 1 to rounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ dt
      counts += name -> n
      System.err.println(f"[cp] round $r $name%-5s $dt%.3f s (n=$n)")
    }
    require(counts.values.toSet.size == 1, s"variant results diverge: $counts")
    println(variants.map { case (name, _) =>
      val ts = times(name).sorted
      f"$name=${ts(ts.size / 2)}%.3f"
    }.mkString(s"medians @$sfDir: ", "  ", s"  counts: $counts"))
  }
}
