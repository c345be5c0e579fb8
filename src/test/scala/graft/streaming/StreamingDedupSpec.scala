package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestHarness
import graft.operators.TextPipeline

/** Top-level so Spark can derive an encoder. */
case class SDoc(doc_id: Long, text: String)

/** The streaming ingestion-dedup face: each micro-batch gated against the
  * accumulated corpus store, survivors appended — must equal a sequential
  * batch fold of the same gate over the same batches.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("streaming ingestion dedup equals the sequential batch fold") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val base = (1 to 40).map(i => s"w$i")
    val nearOfBase = base.dropRight(1) :+ "zz" // trigram Jaccard ~0.9
    val other = (1 to 40).map(i => s"v$i")
    val third = (1 to 40).map(i => s"q$i")
    val nearOfThird = third.dropRight(1) :+ "zz"
    val fresh = (1 to 40).map(i => s"f$i")
    def doc(id: Long, ws: Seq[String]) = SDoc(id, ws.mkString(" "))

    val seed = Seq(doc(0, base), doc(2, other))
    // batch1: an exact dup of the seed, a near dup of the seed, one fresh.
    val batch1 = Seq(doc(11, base), doc(13, nearOfBase), doc(15, third))
    // batch2: a near dup of batch1's SURVIVOR (so the gate must see earlier
    // batches' appends, not just the seed), an intra-batch exact pair
    // (lowest id wins), and nothing else.
    val batch2 = Seq(doc(21, nearOfThird), doc(23, fresh), doc(25, fresh))

    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup-ckpt").toString
    seed.toDF().write.mode("overwrite").parquet(dir)

    val ms = MemoryStream[SDoc]
    val q = StreamingDedup.ingest(ms.toDF(), dir, threshold = 0.5)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet

    // Sequential batch fold with the same gate = the reference semantics.
    var corpus = seed.toDF()
    Seq(batch1, batch2).foreach { b =>
      val batch = b.toDF()
      val distinctBatch = batch
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("text").orderBy("doc_id")))
        .filter(col("__rk") === 1).drop("__rk")
      val ids = TextPipeline.dedupGate(corpus, distinctBatch, 0.5)
      corpus = corpus.unionByName(distinctBatch.join(ids, Seq("doc_id"), "left_semi"))
    }
    val want = corpus.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(got == want, s"stream $got vs fold $want")
    // And the fold itself behaves as designed: exact dup 11 and near dup 13
    // rejected against the seed; 15 admitted; 21 rejected against 15's
    // append; intra-batch exact pair keeps 23 only.
    assert(want == Set(0L, 2L, 15L, 23L))
  }
}
