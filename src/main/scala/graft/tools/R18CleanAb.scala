package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._

/** Interleaved same-window A/B of pipeline_clean_corpus shapes (r18):
  *
  *   cur  shipped shape: survivors = quality ANTI dups — documents scanned
  *        and tokenized TWICE (once into the signature pipeline, once as the
  *        anti-join probe side)
  *   v1   survivors from the bucket rows themselves (band 0 = exactly one
  *        row per quality doc): one corpus scan total; the probe side is a
  *        shuffle-read of the already-computed signature pipeline
  *   v2   v1 + size-bound prefilter before array_intersect: a candidate
  *        pair whose jaccard UPPER BOUND min(na,nb)/(na+nb-min) is below the
  *        threshold cannot pass, so skip its intersect entirely
  *
  * All three return identical survivor id sets (asserted per round).
  * Run: sbt "runMain graft.tools.R18CleanAb [rounds]"
  */
object R18CleanAb {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def dupsOf(b: DataFrame, sizePrefilter: Boolean): DataFrame = {
      val joined = b.as("a").hint("shuffle_hash").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      val pre = if (sizePrefilter)
        joined.filter(least(col("a.n"), col("b.n")).cast("double") /
          (col("a.n") + col("b.n") - least(col("a.n"), col("b.n"))) >= threshold)
      else joined
      pre.select(col("b.doc_id").as("doc_id"), col("a.n").as("na"), col("b.n").as("nb"),
          size(array_intersect(col("a.gs"), col("b.gs"))).as("inter"))
        .filter(jac >= threshold)
        .select("doc_id")
    }

    def cur(): Long = {
      val b = buckets(quality)
      quality.join(dupsOf(b, sizePrefilter = false), Seq("doc_id"), "left_anti")
        .select("doc_id").count()
    }
    def v(sizePrefilter: Boolean)(): Long = {
      val b = buckets(quality)
      b.filter(col("band") === 0).select("doc_id")
        .join(dupsOf(b, sizePrefilter), Seq("doc_id"), "left_anti")
        .count()
    }
    val variants: Seq[(String, () => Long)] = Seq(
      "cur" -> (() => cur()), "v1" -> v(false), "v2" -> v(true),
      "op" -> (() => graft.operators.TextPipeline
        .cleanCorpus(spark.table("documents"), 20, 0.02, 0.5).count()))
    for (_ <- 1 to 2; (_, f) <- variants) f()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    var counts = Map.empty[String, Long]
    for (r <- 1 to rounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      counts += name -> n
      System.err.println(f"[ab] round $r $name%-4s ${(System.nanoTime() - t0) / 1e9}%.3f (n=$n)")
    }
    println(variants.map { case (n, _) =>
      val ts = times(n).sorted; f"$n=${ts(ts.size / 2)}%.3f"
    }.mkString("medians: ", "  ", s"  counts: $counts"))
    spark.stop()
  }
}
