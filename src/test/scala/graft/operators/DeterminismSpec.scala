package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestHarness}

/** Partitioning-invariance: the operators whose float policy claims
  * "order-independent reduction" (integer-quantized contributions, exact
  * sums divided once) must return IDENTICAL rows when the same query runs
  * under a different shuffle layout — more partitions means different
  * accumulation order in every aggregate, which is exactly what flips a
  * naive float sum's last ulp. A failure here means an oracle only passes
  * by partition-count luck.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  // the ops built on the quantized-float / exact-integer contracts, plus a
  // float-rounding aggregate and the 3-deep kmeans chain
  private val ops = Seq(
    "text_lm_score", "text_entropy", "pipeline_dsir_weights",
    "embed_kmeans_train", "win_frame_exclude", "events_anomaly",
    "pipeline_vocab_coverage", "corpus_growth_curve", "agg_stats",
    "text_lm_bigram")

  test("quantized-float operators are invariant under a different shuffle layout") {
    val dir = SparkTestHarness.sfDir
    val queries = SparkEntry.queries
    // independent session: same catalog/data, different parallelism — every
    // exchange hashes into 5 partitions instead of 32, reordering every
    // partial-aggregate merge
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "5")
    graft.Tables.ensure(alt, dir)
    ops.foreach { name =>
      val base = queries(name)(spark, dir).collect().map(_.toString).sorted
      val other = queries(name)(alt, dir).collect().map(_.toString).sorted
      assert(base.length == other.length, s"$name: row count differs")
      base.zip(other).zipWithIndex.foreach { case ((b, o), i) =>
        assert(b == o, s"$name row $i differs under repartitioning:\n  32p: $b\n   5p: $o")
      }
    }
  }
}
