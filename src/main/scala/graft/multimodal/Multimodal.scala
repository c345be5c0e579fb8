package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample stages as distributed `mapPartitions` transforms.
  *
  * IMAGES are handled by a REAL codec ([[Multimodal.ImageCodec]] —
  * javax.imageio is part of the JDK, so PNG/JPEG/BMP/GIF decode, statistics
  * and bilinear resize need no external library). Audio/video codec work
  * stays STUBBED behind `FakeCodec` — a deterministic pure function of the
  * bytes (no JDK codec exists and the container has no media libraries) —
  * so the Spark-side contract (schema, partitioning, batch iteration, null
  * handling) is identical across all modalities, and the oracle-checked ops
  * keep the cross-engine-recomputable stub.
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
    /** The stub is for SYNTHETIC fixture bytes only. Real media arrives
      * with a container magic number; if one shows up here the caller has
      * routed genuine media into the stub path — fail loudly with the
      * right redirection instead of returning plausible-looking fake
      * dims/features nobody would ever know were fake.
      */
    private val magics: Seq[(Array[Int], String, String)] = Seq(
      (Array(0x89, 0x50, 0x4E, 0x47), "PNG", "ImageCodec (real JDK decode)"),
      (Array(0xFF, 0xD8, 0xFF), "JPEG", "ImageCodec (real JDK decode)"),
      (Array(0x47, 0x49, 0x46, 0x38), "GIF", "ImageCodec (real JDK decode)"),
      (Array(0x42, 0x4D), "BMP", "ImageCodec (real JDK decode)"),
      (Array(0x52, 0x49, 0x46, 0x46), "RIFF (WAV/AVI)", "AudioCodec for WAV; video is declared out of scope"),
      (Array(0x49, 0x44, 0x33), "MP3 (ID3)", "compressed audio decode is declared out of scope"),
      (Array(0x4F, 0x67, 0x67, 0x53), "OGG", "compressed audio decode is declared out of scope"),
      (Array(0x1A, 0x45, 0xDF, 0xA3), "Matroska/WebM", "video decode is declared out of scope"),
      (Array(0x66, 0x6C, 0x61, 0x43), "FLAC", "compressed audio decode is declared out of scope"))

    private def requireStubBytes(bytes: Array[Byte]): Unit = {
      magics.find { case (m, _, _) =>
        bytes.length >= m.length + 4 &&
          m.indices.forall(i => (bytes(i) & 0xff) == m(i))
      }.orElse {
        // MP4-family: 'ftyp' at offset 4
        if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
            bytes(6) == 'y' && bytes(7) == 'p')
          Some((Array.empty[Int], "MP4/MOV", "video decode is declared out of scope"))
        else None
      }.foreach { case (_, fmt, redirect) =>
        throw new UnsupportedOperationException(
          s"FakeCodec is a deterministic STUB for synthetic fixture bytes; " +
          s"these bytes are real $fmt media — $redirect")
      }
    }

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
      requireStubBytes(bytes)
      val h = h60(bytes)
      ((h % 1920).toInt + 1, ((h / 1920) % 1080).toInt + 1)
    }
    /** 8-float "embedding" of the media content. */
    def features(bytes: Array[Byte]): Array[Float] = {
      requireStubBytes(bytes)
      val hm = h60(bytes) % 1000000007L
      Array.tabulate(8)(i => (((hm * (i * 2 + 1) + i) % 1000).toFloat) / 1000f)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      requireStubBytes(bytes)
      s"resized:${w}x$h:".getBytes ++ bytes.take(16)
    }
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
      requireStubBytes(bytes)
      bytes.grouped(math.max(bytes.length / math.max(everyN, 1), 1)).take(everyN).toSeq
    }
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

  /** REAL image codec — javax.imageio ships in the JDK, so PNG/JPEG/BMP/GIF
    * decode, feature extraction, and resize need no external library at
    * all. Audio/video stay behind [[FakeCodec]] (no JDK codec exists);
    * images no longer do. Every function is pure bytes→value and total:
    * undecodable bytes yield None, surfacing as NULL rows — the same
    * contract as the stub.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    private def read(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] =
      read(bytes).map(img => (img.getWidth, img.getHeight))

    /** (width, height, meanR, meanG, meanB, meanLuma) — the deterministic
      * per-image statistics a curation filter keys on (blank/over-dark
      * detection, aspect gating) before any learned embedding.
      */
    def features(bytes: Array[Byte]): Option[Array[Float]] =
      read(bytes).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (r, g, b) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val (mr, mg, mb) = (r.toFloat / n, g.toFloat / n, b.toFloat / n)
        Array(w.toFloat, h.toFloat, mr, mg, mb, 0.299f * mr + 0.587f * mg + 0.114f * mb)
      }

    /** Frames of an animated GIF (or any multi-frame container ImageIO can
      * read), each re-encoded as PNG — the real frame-sampling path for the
      * web's most common animated format. Single-frame images yield one
      * frame; undecodable bytes none.
      */
    def frames(bytes: Array[Byte], everyN: Int = 1): Seq[Array[Byte]] =
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq.empty
        val reader = readers.next()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n by math.max(everyN, 1)).map { i =>
          val bos = new ByteArrayOutputStream()
          ImageIO.write(reader.read(i), "png", bos)
          bos.toByteArray
        }
      } catch { case _: Exception => Seq.empty }

    /** Bilinear resize via Graphics2D, re-encoded as PNG. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      read(bytes).map { img =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, w, h, null)
        g2.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
  }

  /** Real-decode stages: the image rows go through [[ImageCodec]]; the same
    * mapPartitions shape as the stub stages, so the distribution story is
    * identical — only the codec is now real.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val dims = if (bytes == null) None else ImageCodec.decodeDims(bytes)
        dims match {
          case Some((w, h)) => Row(r.getLong(0), r.getString(1), bytes, Row(w, h, "image/decoded"))
          case None => Row(r.getLong(0), r.getString(1), bytes, null)
        }
      }
    }(enc)
  }

  def imageFeatures(media: DataFrame): DataFrame = {
    val featSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = RowEncoder.encoderFor(featSchema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val f = if (bytes == null) None else ImageCodec.features(bytes)
        Row(r.getLong(0), f.map(_.toSeq).orNull)
      }
    }(enc)
  }

  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val out = if (bytes == null) None else ImageCodec.resize(bytes, w, h)
        out match {
          case Some(b) => Row(r.getLong(0), r.getString(1), b, Row(w, h, "image/png"))
          case None => Row(r.getLong(0), r.getString(1), null, null)
        }
      }
    }(enc)
  }

  /** REAL audio codec — javax.sound.sampled is also JDK-built-in, so WAV
    * (PCM) decode needs no external library either. Only compressed
    * formats (mp3/aac) and video remain stubbed.
    */
  object AudioCodec {
    import javax.sound.sampled.AudioSystem
    import java.io.ByteArrayInputStream

    /** (sampleRate, channels, nFrames, rms, zeroCrossings) from PCM WAV
      * bytes; None when not decodable audio. RMS and zero-crossings are
      * the standard silence/clipping gates a curation filter keys on.
      */
    def features(bytes: Array[Byte]): Option[(Float, Int, Long, Double, Long)] =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val data = in.readAllBytes()
        val n = data.length / (bytesPerSample * fmt.getChannels)
        var sumSq = 0.0
        var crossings = 0L
        var prevSign = 0
        var i = 0
        while (i < n) {
          // first channel, 16-bit little-endian PCM (the WAV default)
          val off = i * bytesPerSample * fmt.getChannels
          val s = ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toDouble / 32768.0
          sumSq += s * s
          val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
          i += 1
        }
        Some((fmt.getSampleRate, fmt.getChannels, n.toLong,
          math.sqrt(sumSq / math.max(n, 1)), crossings))
      } catch { case _: Exception => None }
  }

  /** (media_id, sample_rate, channels, n_frames, rms, zero_crossings) for
    * every decodable WAV; NULLs otherwise. Same mapPartitions shape.
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", FloatType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        (if (bytes == null) None else AudioCodec.features(bytes)) match {
          case Some((sr, ch, nf, rms, zc)) => Row(r.getLong(0), sr, ch, nf, rms, zc)
          case None => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) over the REAL decoded image: bilinear
    * 8x8 downsample, per-pixel luma, one bit per pixel against the mean —
    * the standard cheap perceptual fingerprint (near-duplicate images keep
    * small Hamming distance under re-encode/resize/brightness jitter).
    */
  def aHash(bytes: Array[Byte]): Option[Long] =
    ImageCodec.resize(bytes, 8, 8).flatMap { small =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
        val lumas = new Array[Double](64)
        var i = 0
        while (i < 64) {
          val p = img.getRGB(i % 8, i / 8)
          lumas(i) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
          i += 1
        }
        val mean = lumas.sum / 64
        var h = 0L
        i = 0
        while (i < 64) { if (lumas(i) >= mean) h |= (1L << i); i += 1 }
        Some(h)
      } catch { case _: Exception => None }
    }

  /** (media_id, ahash) for every decodable image. */
  def imageHashes(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        Row(r.getLong(0), (if (bytes == null) None else aHash(bytes)).map(Long.box).orNull)
      }
    }(enc)
  }

  /** Near-duplicate image pairs by perceptual hash, at scale: the 64-bit
    * aHash splits into FOUR 16-bit bands; by pigeonhole, any pair within
    * Hamming distance 3 agrees on at least one band, so candidates come
    * from four band-bucket equi-joins (O(images x 4), never all-pairs) and
    * only candidates pay the exact popcount verify — the same
    * banding-then-verify shape as MinHash-LSH and SimHash text dedup.
    */
  def nearDupImages(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole guarantees recall only up to Hamming 3")
    val hashes = imageHashes(media).filter(col("ahash").isNotNull)
    val banded = hashes.select(col("media_id"), col("ahash"),
        explode(expr("array(0, 1, 2, 3)")).as("band"))
      .withColumn("bucket", expr("(ahash >> (band * 16)) & 65535"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    pairs.withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
  }

  /** REAL frame sampling for animated images: one output row per GIF frame
    * (every `everyN`-th), each a standalone PNG — same exploded shape as
    * the stub [[sampleFrames]], real bytes.
    */
  def sampleImageFrames(media: DataFrame, everyN: Int = 1): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes == null) Iterator.empty
        else ImageCodec.frames(bytes, everyN).iterator.zipWithIndex.map {
          case (f, i) => Row(r.getLong(0), i, f)
        }
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
