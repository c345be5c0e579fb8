package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._

/** Phase split of pipeline_clean_corpus (VERDICT r17 #5): time cumulative
  * prefixes of the cleanCorpus pipeline with the noop sink (guide §1.4) to
  * see where the 0.48 s goes — quality gate, trigram index, signature
  * aggregate, band self-join, or the final anti-join.
  *
  * Run: sbt "runMain graft.tools.R18CleanPhases [rounds]"
  */
object R18CleanPhases {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    import graft.operators.TextPipeline.MinHashParams._

    val stopwords = Seq("the", "a", "of", "and", "in")
    def quality = spark.table("documents")
      .filter(size(tokens(col("text"))) >= 20 &&
        stopwordRatio(col("text"), stopwords) >= 0.02)

    def tri(d: DataFrame): DataFrame = {
      val ws = tokens(col("text"))
      val n = d.sparkSession.sessionState.conf.numShufflePartitions
      d.filter(col("doc_id").isNotNull)
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
    }

    def doc(d: DataFrame): DataFrame = {
      val sigCols = (0 until numHashes).map(j =>
        min((lit(A(j)) * (col("g") % P) + lit(B(j))) % P).as(s"m$j")) ++
        Seq(count(lit(1)).as("n"))
      tri(d).groupBy("doc_id").agg(collect_list(col("g")).as("gs"), sigCols: _*)
    }

    def buckets(d: DataFrame): DataFrame = {
      val bandCols = (0 until bands).map(b =>
        (col(s"m${2 * b}") * P + col(s"m${2 * b + 1}")).as(s"band$b"))
      doc(d).select(col("doc_id") +: col("gs") +: col("n") +: bandCols: _*)
        .select(col("doc_id") +: posexplode(
          array((0 until bands).map(b => col(s"band$b")): _*)) +: Seq(col("gs"), col("n")): _*)
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    }

    def dups(d: DataFrame): DataFrame = {
      val b = buckets(d)
      val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      b.as("a").hint("shuffle_hash").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id"), col("a.n").as("na"), col("b.n").as("nb"),
          size(array_intersect(col("a.gs"), col("b.gs"))).as("inter"))
        .filter(jac >= 0.5)
        .select("doc_id")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val phases: Seq[(String, () => Unit)] = Seq(
      "quality" -> (() => noop(quality.select("doc_id"))),
      "tri_index" -> (() => noop(tri(quality))),
      "sig_agg" -> (() => noop(doc(quality).drop("gs"))),
      "sig_agg_gs" -> (() => noop(doc(quality))),
      "buckets" -> (() => noop(buckets(quality))),
      "dups_join" -> (() => noop(dups(quality))),
      "full" -> (() => { graft.operators.TextPipeline
        .cleanCorpus(spark.table("documents"), 20, 0.02, 0.5).count(); () }))
    for (_ <- 1 to 2; (_, f) <- phases) f() // warm
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    for (r <- 1 to rounds; (name, f) <- phases) {
      val t0 = System.nanoTime()
      f()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    println(phases.map { case (n, _) =>
      val ts = times(n).sorted; f"$n=${ts(ts.size / 2)}%.3f"
    }.mkString("medians: ", "  ", ""))
    spark.stop()
  }
}
