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

  test("the stub codec REFUSES real media bytes with an explicit redirect") {
    // nobody may mistake FakeCodec for a codec: real container magics fail
    // loudly, pointing at the real JDK codec or the declared gap
    def realPng: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val mp3 = "ID3".getBytes ++ Array.fill[Byte](32)(0x7)
    val mp4 = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes ++ Array.fill[Byte](16)(0)
    val png = realPng
    def err(f: => Any): String =
      intercept[UnsupportedOperationException](f).getMessage
    assert(err(Multimodal.FakeCodec.decodeDims(png)).contains("ImageCodec"))
    assert(err(Multimodal.FakeCodec.features(mp3)).contains("out of scope"))
    assert(err(Multimodal.FakeCodec.sampleFrames(mp4, 4)).contains("video"))
    assert(err(Multimodal.FakeCodec.resize(png, 2, 2)).contains("STUB"))
    // the distributed stage surfaces the same error (wrapped by Spark)
    import scala.jdk.CollectionConverters._
    val realMedia = spark.createDataFrame(
      List(org.apache.spark.sql.Row(1L, "image", png, null)).asJava,
      Multimodal.mediaSchema)
    val e = intercept[Exception](Multimodal.decode(realMedia).collect())
    assert(e.toString.contains("STUB") ||
      Option(e.getCause).exists(_.toString.contains("STUB")))
    // synthetic fixture bytes still pass (no magic)
    assert(Multimodal.FakeCodec.decodeDims(Array.tabulate[Byte](64)(_.toByte))._1 > 0)
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

/** The REAL image path: javax.imageio decode/features/resize over PNGs and
  * JPEGs generated in-test — no external library, exact expected values.
  */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    val data = rows.map { case (id, b) =>
      org.apache.spark.sql.Row(id, "image", b, null)
    }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      Multimodal.mediaSchema).repartition(3)
  }

  test("decodeImages reads real PNG dimensions; garbage bytes yield null meta") {
    val df = mediaDf(Seq(
      (1L, png(12, 8, 0xff0000)), (2L, png(3, 5, 0x00ff00)),
      (3L, Array[Byte](1, 2, 3)))) // not an image
    val out = Multimodal.decodeImages(df).collect().map(r => r.getLong(0) -> r.getStruct(3)).toMap
    assert(out(1L).getInt(0) == 12 && out(1L).getInt(1) == 8)
    assert(out(2L).getInt(0) == 3 && out(2L).getInt(1) == 5)
    assert(out(3L) == null)
  }

  test("imageFeatures: exact means for solid-color images") {
    val df = mediaDf(Seq((1L, png(10, 10, 0xff0000)), (2L, png(4, 4, 0x0000ff))))
    val out = Multimodal.imageFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val red = out(1L)
    assert(red(0) == 10f && red(1) == 10f && red(2) == 255f && red(3) == 0f && red(4) == 0f)
    assert(math.abs(red(5) - 0.299f * 255) < 0.01)
    val blue = out(2L)
    assert(blue(2) == 0f && blue(4) == 255f)
  }

  test("resizeImages produces a real PNG at the target size, color preserved") {
    val df = mediaDf(Seq((1L, png(16, 16, 0x00ff00))))
    val out = Multimodal.resizeImages(df, 4, 4).collect().head
    val bytes = out.getAs[Array[Byte]]("bytes")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 4 && img.getHeight == 4)
    assert((img.getRGB(2, 2) & 0xffffff) == 0x00ff00) // solid green survives bilinear
    assert(out.getStruct(3).getString(2) == "image/png")
  }

  test("JPEG round-trips through the same codec") {
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 6).foreach(x => img.setRGB(x, y, 0x808080)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val dims = Multimodal.ImageCodec.decodeDims(bos.toByteArray)
    assert(dims.contains((6, 4)))
  }
}

/** Perceptual near-dup images: aHash + 4-band pigeonhole hamming join. */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  /** Half-black/half-white split at column `split` (distinctive structure;
    * jitter moves the boundary slightly for near-duplicates).
    */
  private def splitImg(w: Int, h: Int, split: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, if (x < split) 0xffffff else 0x000000)
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    val data = rows.map { case (id, b) => org.apache.spark.sql.Row(id, "image", b, null) }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      Multimodal.mediaSchema).repartition(3)
  }

  test("aHash is stable under tiny jitter and far for different structure") {
    val base = Multimodal.aHash(splitImg(64, 64, 32)).get
    val jitter = Multimodal.aHash(splitImg(64, 64, 33)).get // 1-px boundary move
    val other = Multimodal.aHash(splitImg(64, 64, 8)).get   // very different split
    assert(java.lang.Long.bitCount(base ^ jitter) <= 3)
    assert(java.lang.Long.bitCount(base ^ other) > 3)
  }

  test("nearDupImages pairs jittered variants only, via the 4-band join") {
    val df = mediaDf(Seq(
      (1L, splitImg(64, 64, 32)), (2L, splitImg(64, 64, 33)), // near-dups
      (3L, splitImg(64, 64, 8)),  (4L, splitImg(64, 64, 9)),  // near-dups
      (5L, splitImg(64, 64, 56)),                             // singleton
      (6L, Array[Byte](9, 9))))                               // undecodable
    val pairs = Multimodal.nearDupImages(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }
}

/** Real WAV decode via javax.sound: features from in-test-generated sines. */
class AudioCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  /** Mono 16-bit PCM WAV of a sine at `hz` for `seconds`, amplitude 0.5. */
  private def sineWav(hz: Double, seconds: Double, rate: Float = 8000f): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (0.5 * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV features: rate, frames, RMS ~ A/sqrt(2), zero-crossings ~ 2f*t") {
    val (sr, ch, nf, rms, zc) = Multimodal.AudioCodec.features(sineWav(440, 1.0)).get
    assert(sr == 8000f && ch == 1 && nf == 8000L)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(zc - 880L) <= 4) // 2 crossings per cycle x 440 cycles
  }

  test("audioFeatures stage: distributed, NULLs for non-audio bytes") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "audio", sineWav(220, 0.5), null),
      org.apache.spark.sql.Row(2L, "audio", Array[Byte](1, 2, 3), null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.mediaSchema).repartition(2)
    val out = Multimodal.audioFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(3) == 4000L && math.abs(out(1L).getLong(5) - 220L) <= 4)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(4))
  }
}

/** Animated-GIF frame extraction through the real codec. */
class GifFramesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def animatedGif(colors: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  test("frames() extracts every GIF frame as a standalone PNG; everyN strides") {
    val gif = animatedGif(Seq(0xff0000, 0x00ff00, 0x0000ff))
    val all = Multimodal.ImageCodec.frames(gif)
    assert(all.length == 3)
    val f0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(all.head))
    assert(f0.getWidth == 8 && f0.getHeight == 8)
    assert(Multimodal.ImageCodec.frames(gif, everyN = 2).length == 2)
    assert(Multimodal.ImageCodec.frames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("sampleImageFrames explodes one row per frame, distributed") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "image", animatedGif(Seq(0xff0000, 0x00ff00)), null),
      org.apache.spark.sql.Row(2L, "image", animatedGif(Seq(0x123456)), null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.mediaSchema).repartition(2)
    val out = Multimodal.sampleImageFrames(df).collect()
    assert(out.count(_.getLong(0) == 1L) == 2 && out.count(_.getLong(0) == 2L) == 1)
    assert(out.forall(r => r.getAs[Array[Byte]](2).nonEmpty))
  }
}
