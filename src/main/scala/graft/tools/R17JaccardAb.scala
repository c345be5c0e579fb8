package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.TextPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved A/B: gated jaccard with the old isEmpty max-df probe vs the
  * shipping Observation-fused probe. Full call per iteration (build +
  * probe + join + result checkpoint + count + unpersist), medians of 7.
  */
object R17JaccardAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensure(spark, sfDir)
    val docs = spark.table("documents").select("doc_id", "text")

    def coldJoin(g2: DataFrame): DataFrame = {
      val cold = g2.drop("df")
      val p = cold.select(col("gram"), col("doc_id").as("ld"), col("n").as("ln"))
        .hint("shuffle_hash")
        .join(cold.select(col("gram"), col("doc_id").as("rd"), col("n").as("rn")), Seq("gram"))
        .filter(col("ld") < col("rd"))
        .select("ld", "rd", "ln", "rn")
        .groupBy(
          least(col("ld"), col("rd")).as("id_a"),
          greatest(col("ld"), col("rd")).as("id_b"),
          when(col("ld") < col("rd"), col("ln")).otherwise(col("rn")).as("na"),
          when(col("ld") < col("rd"), col("rn")).otherwise(col("ln")).as("nb"))
        .agg(count(lit(1)).as("inter"))
      val jac = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
      p.filter(jac >= 0.12).select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
    }
    def unpin(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      }

    def oldForm(): Long = {
      val g2 = TextPipeline.shingleHashes(docs)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
        .filter(col("df") >= 2)
        .localCheckpoint(true)
      val anyHot = !g2.filter(col("df") > (1 << 12)).isEmpty
      require(!anyHot)
      val result = coldJoin(g2).localCheckpoint(true)
      unpin(g2)
      val n = result.count()
      unpin(result)
      n
    }
    def newForm(): Long = {
      val r = TextPipeline.jaccardPairsGated(docs, 0.12, 1 << 12, 16)
      val n = r.count()
      unpin(r)
      n
    }
    def med(f: () => Long): Double = {
      (1 to 3).foreach(_ => f())
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e6
      }.sorted.apply(3)
    }
    val o1 = med(oldForm _)
    val n1 = med(newForm _)
    val o2 = med(oldForm _)
    val n2 = med(newForm _)
    println(f"[jab] old(isEmpty)=$o1%6.1f/$o2%6.1f ms  new(observe)=$n1%6.1f/$n2%6.1f ms")
    spark.stop()
  }
}
