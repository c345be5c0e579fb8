package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestHarness

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private lazy val media = Multimodal.syntheticMedia(spark, 30).repartition(4)

  test("decode fills typed metadata and preserves schema") {
    val decoded = Multimodal.decode(media)
    assert(decoded.schema == Multimodal.mediaSchema)
    val m = decoded.filter(col("bytes").isNotNull).select("meta.width", "meta.height").collect()
    assert(m.nonEmpty && m.forall(r => r.getInt(0) > 0 && r.getInt(1) > 0))
  }

  test("decode is deterministic across partitionings") {
    val a = Multimodal.decode(media.repartition(1)).select("media_id", "meta.width")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Multimodal.decode(media.repartition(7)).select("media_id", "meta.width")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("feature extraction yields fixed-width vectors compatible with similarity ops") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq == Seq("media_id", "features"))
    val lens = feats.filter(col("features").isNotNull)
      .select(size(col("features"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(8))
    // pluggable into the vector ops
    val withCos = feats.select(col("media_id"),
      graft.functions.VectorFunctions.cosine(
        col("features").cast("array<double>"), col("features").cast("array<double>")).as("self"))
    assert(withCos.collect().forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("frame sampling explodes one row per frame") {
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.groupBy("media_id").count().collect().forall(_.getLong(1) <= 4))
    assert(frames.filter(col("frame").isNull).count() == 0)
  }

  test("resize rewrites bytes and metadata") {
    val resized = Multimodal.resize(media, 224, 224)
    val m = resized.filter(col("bytes").isNotNull).select("meta.width", "meta.height").distinct().collect()
    assert(m.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((224, 224)))
  }
}
