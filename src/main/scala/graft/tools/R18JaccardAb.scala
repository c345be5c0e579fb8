package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.TextPipeline

/** Interleaved same-window A/B of the jaccard gram-index build shapes
  * (r18 change 2 candidates). Four variants of the full gated pipeline,
  * differing only in how (doc_id, gram, n, df>=2) is produced:
  *
  *   ww  doc window + gram window        (the r15-r17 shape)
  *   aw  doc collect_set agg + gram window
  *   wa  doc window + gram count/collect_list agg
  *   aa  doc agg + gram agg              (the r18 candidate)
  *
  * Each run builds the index, checkpoints, runs the cold self-join + pair
  * aggregate + threshold filter, and counts. Variants interleave per round
  * so host drift hits all equally; report per-variant medians.
  *
  * Run: sbt "runMain graft.tools.R18JaccardAb [rounds]"
  */
object R18JaccardAb {
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

  // (doc_id, gram, n) — old shape: dedup aggregate + per-doc window count
  private def docWindow(d: DataFrame): DataFrame =
    triGram(d)
      .dropDuplicates("doc_id", "gram")
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))

  // (doc_id, gram, n) — new shape: one collect_set aggregate + explode
  private def docAgg(d: DataFrame): DataFrame =
    triGram(d)
      .groupBy("doc_id").agg(collect_set(col("gram")).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("gram"),
        size(col("gs")).cast("long").as("n"))

  // (doc_id, gram, n, df) with df>=2 — old shape: repartition + window
  private def dfWindow(g: DataFrame): DataFrame =
    g.repartition(col("gram"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("df") >= 2)

  // same — new shape: groupBy(gram) aggregate + explode
  private def dfAgg(g: DataFrame): DataFrame =
    g.groupBy("gram")
      .agg(count(lit(1)).as("df"), collect_list(struct(col("doc_id"), col("n"))).as("ds"))
      .filter(col("df") >= 2)
      .select(col("gram"), col("df"), explode(col("ds")).as("dn"))
      .select(col("dn.doc_id").as("doc_id"), col("gram"), col("dn.n").as("n"), col("df"))

  private def run(g2raw: DataFrame, threshold: Double): Long = {
    val g2 = g2raw.localCheckpoint(true)
    val cold = g2.drop("df")
    val pairs = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
      .hint("shuffle_hash")
      .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
      .filter(col("ld") < col("rd"))
      .groupBy(
        least(col("ld"), col("rd")).as("id_a"),
        greatest(col("ld"), col("rd")).as("id_b"),
        when(col("ld") < col("rd"), col("ln")).otherwise(col("rn")).as("na"),
        when(col("ld") < col("rd"), col("rn")).otherwise(col("ln")).as("nb"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    val n = pairs.filter(jac >= threshold).count()
    g2.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val docs = spark.table("documents")
    val variants: Seq[(String, () => Long)] = Seq(
      "ww" -> (() => run(dfWindow(docWindow(docs)), 0.12)),
      "aw" -> (() => run(dfWindow(docAgg(docs)), 0.12)),
      "wa" -> (() => run(dfAgg(docWindow(docs)), 0.12)),
      "aa" -> (() => run(dfAgg(docAgg(docs)), 0.12)),
      "cur" -> (() => TextPipeline.jaccardPairsGated(docs, 0.12, 1 << 12, 16).count()))
    // warm every variant twice
    for (_ <- 1 to 2; (_, f) <- variants) f()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    var counts = Map.empty[String, Long]
    for (r <- 1 to rounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ dt
      counts += name -> n
      System.err.println(f"[ab] round $r $name%-4s $dt%.3f s (n=$n)")
    }
    println(variants.map { case (name, _) =>
      val ts = times(name).sorted
      f"$name=${ts(ts.size / 2)}%.3f"
    }.mkString("medians: ", "  ", s"  counts: $counts"))
  }
}
