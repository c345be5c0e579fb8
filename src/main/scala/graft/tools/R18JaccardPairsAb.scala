package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.TextPipeline

/** r18: the minhash banded-join lever applied to dedup_jaccard's PAIR stage.
  * The gated benign path self-joins the pinned gram index on `gram` and
  * re-shuffles every within-gram pair row into the (id_a, id_b, na, nb)
  * aggregate. Candidate rewrite: groupBy(gram) + sort_array(collect_list(
  * struct(doc_id, n))) over the index's existing gram clustering (no new
  * exchange), then chained generators emit each group's strictly-later
  * pairs once — no self-join, one index scan instead of two.
  *
  * Variants (identical results asserted per round):
  *   join  pinned-index self-join (the shipped r15-r18 cold branch)
  *   agg   groupBy(gram) collect_list + posexplode/explode(slice) pairs
  *
  * Both run the FULL gated jaccard end-to-end (index build + checkpoint +
  * pair stage + threshold), timed whole-call like the bench sees it (the
  * call is Op.eager — uncacheable, so PlanCache timing does not apply).
  *
  * Run: sbt "runMain graft.tools.R18JaccardPairsAb [rounds] [sfDirOrDir]"
  */
object R18JaccardPairsAb {
  private def triGram(d: DataFrame): DataFrame = {
    val ws = graft.functions.TextFunctions.tokens(col("text"))
    val n = d.sparkSession.sessionState.conf.numShufflePartitions
    d.filter(col("doc_id").isNotNull)
      .repartition(n, col("doc_id"))
      .select(col("doc_id"), ws.as("w0"),
        slice(ws, lit(2), greatest(size(ws) - 1, lit(0))).as("s1"),
        slice(ws, lit(3), greatest(size(ws) - 2, lit(0))).as("s2"))
      .select(col("doc_id"), explode(arrays_zip(col("w0"), col("s1"), col("s2"))).as("t"))
      .filter(col("t.s2").isNotNull)
      .select(col("doc_id"),
        xxhash64(col("t.w0"), col("t.s1"), col("t.s2")).as("gram"))
  }

  // The shipped index build: dedup, per-doc n window, gram clustering,
  // df window, df>=2, pinned.
  private def pinnedIndex(d: DataFrame): DataFrame =
    triGram(d)
      .dropDuplicates("doc_id", "gram")
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .repartition(col("gram"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("df") >= 2)
      .localCheckpoint(true)

  private def free(g2: DataFrame): Unit =
    g2.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    }

  private def pairAgg(pairRows: DataFrame, threshold: Double): DataFrame = {
    val pairs = pairRows
      .groupBy(
        least(col("ld"), col("rd")).as("id_a"),
        greatest(col("ld"), col("rd")).as("id_b"),
        when(col("ld") < col("rd"), col("ln")).otherwise(col("rn")).as("na"),
        when(col("ld") < col("rd"), col("rn")).otherwise(col("ln")).as("nb"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    pairs.filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
  }

  private def joinVariant(d: DataFrame, threshold: Double): Long = {
    val g2 = pinnedIndex(d)
    val cold = g2.drop("df")
    val pairRows = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
      .hint("shuffle_hash")
      .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
      .filter(col("ld") < col("rd"))
      .select("ld", "rd", "ln", "rn")
    val n = pairAgg(pairRows, threshold).count()
    free(g2)
    n
  }

  private def aggVariant(d: DataFrame, threshold: Double): Long = {
    val g2 = pinnedIndex(d)
    val pairRows = g2
      .groupBy("gram")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .select(col("ds"), posexplode(col("ds")))
      .select(col("col.doc_id").as("ld"), col("col.n").as("ln"),
        explode(slice(col("ds"), col("pos") + lit(2), size(col("ds")))).as("r"))
      .select(col("ld"), col("r.doc_id").as("rd"), col("ln"), col("r.n").as("rn"))
    val n = pairAgg(pairRows, threshold).count()
    free(g2)
    n
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(9)
    val sfDir = args.drop(1).headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")
    val variants: Seq[(String, () => Long)] = Seq(
      "join" -> (() => joinVariant(docs, 0.12)),
      "agg" -> (() => aggVariant(docs, 0.12)),
      "cur" -> (() => TextPipeline.jaccardPairsGated(docs, 0.12, 1 << 12, 16).count()))
    for (_ <- 1 to 2; (_, f) <- variants) f()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    var counts = Map.empty[String, Long]
    for (r <- 1 to rounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ dt
      counts += name -> n
      System.err.println(f"[jp] round $r $name%-5s $dt%.3f s (n=$n)")
    }
    require(counts.values.toSet.size == 1, s"variant results diverge: $counts")
    println(variants.map { case (name, _) =>
      val ts = times(name).sorted
      f"$name=${ts(ts.size / 2)}%.3f"
    }.mkString(s"medians @$sfDir: ", "  ", s"  counts: $counts"))
  }
}
