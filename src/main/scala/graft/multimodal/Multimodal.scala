package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample stages as distributed `mapPartitions` transforms.
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * container) behind `FakeCodec` — a deterministic pure function of the
  * bytes — so the Spark-side contract (schema, partitioning, batch iteration,
  * null handling) is real and tested, and a real codec drops in by replacing
  * one function.
  */
object Multimodal {

  /** media table schema: (media_id, kind, bytes, meta{width,height,format}). */
  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", metaType, nullable = true)))

  /** STUB codec: deterministic stand-ins for decode/resize/frame ops.
    * Replace with a real codec (JavaCPP/FFmpeg/ImageIO) in production; every
    * function is pure bytes→value so the distribution story is unchanged.
    */
  object FakeCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
    }
    /** 8-float "embedding" of the media content. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = java.util.Arrays.hashCode(bytes).toLong
      Array.tabulate(8)(i => (((h * (i * 2 + 1) + i) % 1000).toFloat) / 1000f)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      (s"resized:${w}x$h:".getBytes ++ bytes.take(16))
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      bytes.grouped(math.max(bytes.length / math.max(everyN, 1), 1)).take(everyN).toSeq
  }

  /** Decode stage: fills `meta` from the raw bytes. Runs per-partition so a
    * real codec can amortize per-JVM init (model load, native lib) across
    * the partition — the same shape `mapInPandas` gives Python.
    */
  def decode(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes == null) Row(r.getLong(0), r.getString(1), null, null)
        else {
          val (w, h) = FakeCodec.decodeDims(bytes)
          Row(r.getLong(0), r.getString(1), bytes, Row(w, h, r.getString(1) + "/raw"))
        }
      }
    }(enc)
  }

  /** Feature extraction: binary -> fixed-width float vector, ready for the
    * `embeddings`-style similarity operators.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val featSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = RowEncoder.encoderFor(featSchema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        Row(r.getLong(0), if (bytes == null) null else FakeCodec.features(bytes).toSeq)
      }
    }(enc)
  }

  /** Resize stage (image semantics): bytes -> bytes, metadata updated. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes == null) Row(r.getLong(0), r.getString(1), null, null)
        else Row(r.getLong(0), r.getString(1), FakeCodec.resize(bytes, w, h), Row(w, h, "resized"))
      }
    }(enc)
  }

  /** Frame sampling (video semantics): one output row per sampled frame. */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes == null) Iterator.empty
        else FakeCodec.sampleFrames(bytes, frames).iterator.zipWithIndex.map {
          case (f, i) => Row(r.getLong(0), i, f)
        }
      }
    }(enc)
  }

  /** Deterministic synthetic media fixture (no binary test data ships with
    * the driver tables).
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until n).map { i =>
      val bytes = Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j) % 127).toByte)
      Row(i.toLong, if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
        bytes, null)
    }
    spark.createDataFrame(rows.asJava, mediaSchema)
  }
}
