package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.operators.TextPipeline

/** Streaming ingestion dedup — the streaming face of
  * `TextPipeline.incrementalDedup`: every micro-batch of arriving documents
  * is gated against the accumulated corpus (exact text, then MinHash-LSH
  * near-dup with inline Jaccard verify) and only survivors are appended.
  *
  * State lives in the corpus store itself (a parquet directory), NOT in
  * Spark streaming state — the production shape: the corpus is the durable
  * side table every batch job also reads, any job can rebuild or compact
  * it, and a query restart needs no state migration (foreachBatch re-reads
  * the store). Per-batch cost is O(batch × bands) band-bucket collisions
  * against the stored side, never O(corpus) — at 100 TB the stored side's
  * signatures come from a bucket table written at ingest time (see the
  * incrementalDedup scale note); here they are recomputed per batch because
  * the fixture corpus is small.
  *
  * Within-batch policy: exact duplicates inside one micro-batch keep the
  * lowest doc_id; near-dups inside one batch are both admitted (documented
  * contract — the periodic compaction's full `cleanCorpus` pass removes
  * them; production systems accept this window to keep the ingest path a
  * pure equi-join).
  */
object StreamingDedup {

  /** Survivors of `batch` against the current `corpusDir` contents:
    * intra-batch exact dedup (keep lowest doc_id), then the cross-side
    * exact + near-dup gates.
    */
  def gate(spark: SparkSession, batch: DataFrame, corpusDir: String,
      threshold: Double): DataFrame = {
    val distinctBatch = batch
      .withColumn("__rk", row_number().over(
        // partition key = md5(text): the rows must shuffle whole either
        // way (they survive into the corpus), but the window's partition/
        // sort key is 32 bytes instead of the document
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
          .orderBy("doc_id")))
      .filter(col("__rk") === 1).drop("__rk")
    val existing = readCorpus(spark, corpusDir, batch.schema)
    val surviving = TextPipeline.dedupGate(existing, distinctBatch, threshold)
    distinctBatch.join(surviving, Seq("doc_id"), "left_semi")
  }

  /** The corpus store, empty-safe: before the first append the directory
    * has no parquet footers, so supply the batch's schema explicitly.
    */
  private def readCorpus(spark: SparkSession, corpusDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val hasData = {
      val d = new java.io.File(corpusDir)
      d.isDirectory && d.listFiles().exists(f =>
        f.getName.endsWith(".parquet") && f.length() > 0)
    }
    if (hasData) spark.read.schema(schema).parquet(corpusDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
  }

  /** The writer: add a trigger/checkpointLocation and `.start()` (a
    * checkpoint makes restarts exactly-once at the source; the append
    * itself is the usual foreachBatch at-least-once contract). Each
    * micro-batch appends its survivors to `corpusDir` — so later batches
    * are gated against earlier batches' survivors as well as the seed
    * corpus.
    */
  def ingest(input: DataFrame, corpusDir: String,
      threshold: Double): DataStreamWriter[Row] =
    input.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        gate(spark, batch, corpusDir, threshold)
          .write.mode("append").parquet(corpusDir)
      }
}
