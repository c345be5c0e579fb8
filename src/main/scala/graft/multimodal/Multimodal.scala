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
    *
    * The stub hash is the engine's cross-engine 60-bit md5 hash over the
    * UPPERCASE hex of the bytes — i.e. exactly `hex60(HEX(bytes))` in SQL —
    * so the decode stage is value-checkable by the DuckDB oracle
    * (`multimodal_decode` in SparkEntry).
    */
  object FakeCodec {
    private val hexUpper = "0123456789ABCDEF".toCharArray
    // One digest per thread, reset per call — the per-partition amortization
    // the mapPartitions shape exists for (no per-row provider lookup).
    private val md5Local: ThreadLocal[java.security.MessageDigest] =
      ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

    /** First 15 hex digits of md5(HEX(bytes)) as a 60-bit Long — i.e. the
      * first 8 digest bytes big-endian, dropped low nibble. Lookup-table hex
      * encoding; no per-byte Formatter allocation.
      */
    def h60(bytes: Array[Byte]): Long = {
      val hex = new Array[Byte](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        hex(2 * i) = hexUpper(b >> 4).toByte
        hex(2 * i + 1) = hexUpper(b & 15).toByte
        i += 1
      }
      val md = md5Local.get()
      md.reset()
      val digest = md.digest(hex)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (digest(j) & 0xffL); j += 1 }
      v >>> 4
    }
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = h60(bytes)
      ((h % 1920).toInt + 1, ((h / 1920) % 1080).toInt + 1)
    }
    /** 8-float "embedding" of the media content. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val hm = h60(bytes) % 1000000007L
      Array.tabulate(8)(i => (((hm * (i * 2 + 1) + i) % 1000).toFloat) / 1000f)
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
