package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.TextPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Phase accounting for one dedup_jaccard call on the gated path: where do
  * the ~0.7 s go — the gram-index build+checkpoint, the max-df probe, the
  * cold join, or the final count?  Plus A/Bs of candidate changes.
  *
  * Run: sbt "runMain graft.tools.R17JaccardPhases"
  */
object R17JaccardPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val docs = spark.table("documents").select("doc_id", "text")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jphase] $label%-28s ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
      r
    }

    (1 to 2).foreach { _ => // warm + one reported pass
      println("[jphase] ---- pass ----")
      val g2 = timed("g2 build+checkpoint") {
        TextPipeline.shingleHashes(docs)
          .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
          .filter(col("df") >= 2)
          .localCheckpoint(true)
      }
      val anyHot = timed("max-df probe (isEmpty)") {
        !g2.filter(col("df") > (1 << 12)).isEmpty
      }
      val pairs = timed("cold join + agg (lazy plan)") {
        val cold = g2.drop("df")
        val p = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
          .hint("shuffle_hash")
          .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")),
            Seq("gram"))
          .filter(col("ld") < col("rd"))
          .select("ld", "rd", "ln", "rn")
          .groupBy(
            least(col("ld"), col("rd")).as("id_a"),
            greatest(col("ld"), col("rd")).as("id_b"),
            when(col("ld") < col("rd"), col("ln")).otherwise(col("rn")).as("na"),
            when(col("ld") < col("rd"), col("rn")).otherwise(col("ln")).as("nb"))
          .agg(count(lit(1)).as("inter"))
        val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
        p.filter(jac >= 0.12)
          .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
      }
      val result = timed("result checkpoint") { pairs.localCheckpoint(true) }
      timed("unpersist g2") {
        g2.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        }
      }
      timed("final count") { result.count() }
      result.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      }
      println(s"[jphase] anyHot=$anyHot")
    }

    // A/B: per-row array-distinct gram build (no distinct agg, no window
    // sort) vs the shipping shingleHashes — same (doc_id, gram, n) rows.
    def shingleArr(d: org.apache.spark.sql.DataFrame) = {
      val n = d.sparkSession.sessionState.conf.numShufflePartitions
      d.filter(col("doc_id").isNotNull)
        .repartition(n, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("ws")) // = TextFunctions.tokens
        .select(col("doc_id"),
          array_distinct(when(size(col("ws")) >= 3,
            expr("transform(sequence(0, size(ws) - 3), i -> xxhash64(ws[i], ws[i+1], ws[i+2]))"))
            .otherwise(lit(Array.empty[Long]))).as("grams"))
        .select(col("doc_id"), size(col("grams")).as("n"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), col("gram"), col("n"))
        .repartition(col("gram"))
    }
    def med(f: () => Unit): Double = {
      (1 to 2).foreach(_ => f())
      (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }.sorted.apply(2)
    }
    val cur = med(() => { TextPipeline.shingleHashes(docs).write.format("noop")
      .mode("overwrite").save() })
    val arr = med(() => { shingleArr(docs).write.format("noop").mode("overwrite").save() })
    println(f"[jphase] shingle noop: current=$cur%6.1f ms  array=$arr%6.1f ms")
    val a = TextPipeline.shingleHashes(docs).collect().map(_.toString).sorted.toSeq
    val b = shingleArr(docs).collect().map(_.toString).sorted.toSeq
    println(s"[jphase] shingle rows equal: ${a == b} (${a.length} vs ${b.length})")
    spark.stop()
  }
}
