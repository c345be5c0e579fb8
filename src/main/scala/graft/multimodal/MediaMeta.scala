package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** REAL container-metadata parsing for the compressed formats whose decode
  * is environment-stubbed (no codec libraries exist here; the reference
  * serves media columns as opaque blobs the same way): an MP3 frame-header
  * walker and an MP4/ISO-BMFF box walker. A training-data pipeline needs
  * duration/bitrate/track facts long before it needs samples — this is the
  * part of audio/video handling that is pure byte arithmetic, so it is
  * implemented for real, distributed with the same mapPartitions shape as
  * the image codec stages. Decode itself stays behind the loud stub
  * ([[Multimodal.FakeCodec]]), declared.
  */
object MediaMeta {

  // ---- MP3 (MPEG-1/2/2.5 Layer III frame headers) ---------------------------

  /** Parsed from a frame-header walk: frame count and duration come from
    * iterating every frame (header-declared sizes), not from the first
    * header alone — VBR streams report their true duration this way.
    */
  final case class Mp3Meta(mpegVersion: String, bitrateKbps: Int,
      sampleRate: Int, channels: Int, frames: Int, durationMs: Long)

  // bitrate table (kbps), Layer III: index 1..14; row 0 = MPEG-1, row 1 = MPEG-2/2.5
  private val L3Bitrates: Array[Array[Int]] = Array(
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  private val SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG-1
    2 -> Array(22050, 24000, 16000), // MPEG-2
    0 -> Array(11025, 12000, 8000)) // MPEG-2.5

  /** ID3v2 tag length at the head of the stream (0 when absent). */
  private def id3v2Length(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit size, excludes the 10-byte header
      10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    } else 0

  def parseMp3(bytes: Array[Byte]): Option[Mp3Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var p = id3v2Length(bytes)
    var frames = 0
    var durationUs = 0.0
    var first: Option[(Int, Int, Int, Int)] = None // versionId, bitrate, sr, channels
    // After at least one valid frame, ANY malformed header — lost sync OR
    // sync bits with an invalid layer/bitrate/sample-rate field — ends the
    // walk and returns the accumulated frames (r11 ADVICE: trailing junk can
    // coincidentally start with 0xFFEx; discarding a parsed stream over it
    // was inconsistent with the lost-sync tolerance).
    def done: Option[Mp3Meta] = first.map { case (v, br, sr, ch) =>
      Mp3Meta(versionName(v), br, sr, ch, frames, math.round(durationUs / 1000.0)) }
    while (p + 4 <= bytes.length) {
      val b1 = bytes(p) & 0xff; val b2 = bytes(p + 1) & 0xff
      val sync = b1 == 0xff && (b2 & 0xe0) == 0xe0
      if (!sync) return done
      val versionId = (b2 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layer = (b2 >> 1) & 0x3 // 1 = Layer III
      if (layer != 1 || versionId == 1) return done
      val b3 = bytes(p + 2) & 0xff
      val bitrateIdx = (b3 >> 4) & 0xf
      val srIdx = (b3 >> 2) & 0x3
      if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return done
      val bitrate = L3Bitrates(if (versionId == 3) 0 else 1)(bitrateIdx)
      val sr = SampleRates(versionId)(srIdx)
      val padding = (b3 >> 1) & 0x1
      val channelMode = ((bytes(p + 3) & 0xff) >> 6) & 0x3
      val samplesPerFrame = if (versionId == 3) 1152 else 576
      val frameLen = samplesPerFrame / 8 * bitrate * 1000 / sr + padding
      if (frameLen <= 4) return done
      if (first.isEmpty)
        first = Some((versionId, bitrate, sr, if (channelMode == 3) 1 else 2))
      frames += 1
      durationUs += samplesPerFrame * 1e6 / sr
      p += frameLen
    }
    done
  }

  private def versionName(id: Int): String =
    id match { case 3 => "MPEG-1"; case 2 => "MPEG-2"; case _ => "MPEG-2.5" }

  // ---- AAC (ADTS frame headers) ----------------------------------------------

  final case class AacMeta(sampleRate: Int, channels: Int, frames: Int,
      durationMs: Long)

  private val AdtsSampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** ADTS frame-header walk (r12, same posture as [[parseMp3]]): the 12-bit
    * 0xFFF syncword plus layer bits 00 distinguishes ADTS from an MP3
    * header (layer 01 = MPEG Layer III), so the two walkers are disjoint on
    * valid input. 1024 samples per AAC frame; duration sums per frame.
    * After one valid frame, any malformed header ends the walk and returns
    * the accumulated metadata (trailing-junk tolerance).
    */
  def parseAac(bytes: Array[Byte]): Option[AacMeta] = {
    if (bytes == null || bytes.length < 7) return None
    var p = 0
    var frames = 0
    var durationUs = 0.0
    var first: Option[(Int, Int)] = None // sampleRate, channels
    def done: Option[AacMeta] = first.map { case (sr, ch) =>
      AacMeta(sr, ch, frames, math.round(durationUs / 1000.0)) }
    while (p + 7 <= bytes.length) {
      val b1 = bytes(p) & 0xff; val b2 = bytes(p + 1) & 0xff
      // syncword FFF + layer 00 (an MP3 Layer III header has layer bits 01)
      if (b1 != 0xff || (b2 & 0xf0) != 0xf0 || ((b2 >> 1) & 0x3) != 0) return done
      val b3 = bytes(p + 2) & 0xff
      val srIdx = (b3 >> 2) & 0xf
      if (srIdx >= AdtsSampleRates.length) return done
      val channels = (((b3 & 0x1) << 2) | ((bytes(p + 3) & 0xff) >> 6)) & 0x7
      val frameLen = ((bytes(p + 3) & 0x03) << 11) |
        ((bytes(p + 4) & 0xff) << 3) | ((bytes(p + 5) & 0xff) >> 5)
      if (frameLen < 7 || channels == 0) return done
      val sr = AdtsSampleRates(srIdx)
      if (first.isEmpty) first = Some((sr, channels))
      frames += 1
      durationUs += 1024.0 * 1e6 / sr
      p += frameLen
    }
    done
  }

  // ---- FLAC (STREAMINFO metadata block) ----------------------------------------

  final case class FlacMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long)

  /** FLAC metadata-block walk (r12): "fLaC" magic, then length-prefixed
    * blocks until the last-block flag; STREAMINFO (type 0, first by spec)
    * carries sample rate (20 bits), channels-1 (3), bits-per-sample-1 (5),
    * and the 36-bit total sample count — duration in closed form without
    * touching audio frames.
    */
  def parseFlac(bytes: Array[Byte]): Option[FlacMeta] = {
    if (bytes == null || bytes.length < 4 + 4 + 34) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C') return None
    var p = 4
    while (p + 4 <= bytes.length) {
      val head = bytes(p) & 0xff
      val last = (head & 0x80) != 0
      val typ = head & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      val s = p + 4
      if (s + len > bytes.length) return None
      if (typ == 0) {
        if (len < 34) return None
        val b10 = bytes(s + 10) & 0xff; val b11 = bytes(s + 11) & 0xff
        val b12 = bytes(s + 12) & 0xff; val b13 = bytes(s + 13) & 0xff
        val sr = (b10 << 12) | (b11 << 4) | (b12 >> 4)
        val channels = ((b12 >> 1) & 0x7) + 1
        val bps = (((b12 & 0x1) << 4) | (b13 >> 4)) + 1
        var total = (b13 & 0x0fL) << 32
        total |= ((bytes(s + 14) & 0xffL) << 24) | ((bytes(s + 15) & 0xffL) << 16) |
          ((bytes(s + 16) & 0xffL) << 8) | (bytes(s + 17) & 0xffL)
        if (sr == 0) return None
        return Some(FlacMeta(sr, channels, bps, total,
          total * 1000 / sr))
      }
      if (last) return None // STREAMINFO absent before the last block
      p = s + len
    }
    None
  }

  // ---- MP4 / ISO-BMFF ---------------------------------------------------------

  final case class Mp4Meta(brand: String, timescale: Long, durationMs: Long,
      tracks: Int, hasVideo: Boolean, hasAudio: Boolean)

  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      durationMs: Long)

  /** RIFF/WAVE chunk walk (r13): 'RIFF' + u32le riffSize + 'WAVE', then
    * even-padded chunks of id(4) + u32le size. `fmt ` carries the PCM
    * layout (format/channels/rate/blockAlign/bits), `data`'s byte size
    * over blockAlign gives the exact sample count -> duration. Unknown
    * chunks (LIST, fact, cue) are skipped by size, like the MP4 box walk.
    */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "WAVE")
      return None
    def u32le(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def u16le(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var sampleRate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataBytes = -1L
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = fourcc(bytes, p)
      val size = u32le(p + 4)
      val payload = p + 8
      if (payload + size > bytes.length) return None // truncated chunk
      if (id == "fmt " && size >= 16) {
        channels = u16le(payload + 2)
        sampleRate = u32le(payload + 4).toInt
        blockAlign = u16le(payload + 12)
        bits = u16le(payload + 14)
      } else if (id == "data") dataBytes = size
      p = payload + size.toInt + (size.toInt & 1) // chunks are even-padded
    }
    if (sampleRate <= 0 || blockAlign <= 0 || dataBytes < 0) None
    else Some(WavMeta(sampleRate, channels, bits,
      (dataBytes / blockAlign) * 1000L / sampleRate))
  }

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def u64(b: Array[Byte], p: Int): Long = (u32(b, p) << 32) | u32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the boxes in [from, to), invoking f(type, payloadStart, payloadEnd). */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)
      (f: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p + 8 <= to) {
      var size = u32(b, p)
      val typ = fourcc(b, p + 4)
      var payload = p + 8
      if (size == 1 && p + 16 <= to) { size = u64(b, p + 8); payload = p + 16 }
      if (size == 0) size = (to - p).toLong // box extends to end
      if (size < 8 || p + size > to) return // malformed: stop, keep what we have
      f(typ, payload, p + size.toInt)
      p += size.toInt
    }
  }

  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 12) return None
    var brand: Option[String] = None
    var timescale = 0L
    var duration = 0L
    var tracks = 0
    var hasVideo = false
    var hasAudio = false
    walkBoxes(bytes, 0, bytes.length) { (typ, s, e) =>
      typ match {
        case "ftyp" => if (e - s >= 4) brand = Some(fourcc(bytes, s))
        case "moov" =>
          walkBoxes(bytes, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" if e2 - s2 >= 20 =>
                val version = bytes(s2) & 0xff
                if (version == 1 && e2 - s2 >= 28) {
                  timescale = u32(bytes, s2 + 20)
                  duration = u64(bytes, s2 + 24)
                } else {
                  timescale = u32(bytes, s2 + 12)
                  duration = u32(bytes, s2 + 16)
                }
              case "trak" =>
                tracks += 1
                walkBoxes(bytes, s2, e2) { (t3, s3, e3) =>
                  if (t3 == "mdia") walkBoxes(bytes, s3, e3) { (t4, s4, e4) =>
                    if (t4 == "hdlr" && e4 - s4 >= 12) fourcc(bytes, s4 + 8) match {
                      case "vide" => hasVideo = true
                      case "soun" => hasAudio = true
                      case _ => ()
                    }
                  }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    if (brand.isEmpty && timescale == 0) None
    else Some(Mp4Meta(brand.getOrElse(""), timescale,
      if (timescale == 0) 0L else duration * 1000 / timescale,
      tracks, hasVideo, hasAudio))
  }

  // ---- distributed stage --------------------------------------------------------

  private val metaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("container", StringType, nullable = true),
    StructField("bitrate_kbps", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("frames", IntegerType, nullable = true),
    StructField("tracks", IntegerType, nullable = true),
    StructField("has_video", BooleanType, nullable = true),
    StructField("has_audio", BooleanType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Container metadata per media row (real parsing, one pass per blob;
    * unrecognized bytes yield a null-metadata row rather than an error —
    * crawl corpora are full of junk). Same mapPartitions posture as the
    * image stages: stateless per-row byte work rides the scan partitioning.
    * Dispatch order: magic-prefixed formats first (FLAC, RIFF/WAVE, MP4),
    * then the sync-word walkers (MP3 Layer III vs ADTS AAC — disjoint on
    * the layer bits).
    */
  def containerMeta(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(metaSchema)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("bytes")
        parseFlac(bytes).map(m =>
          Row(id, "flac", null, m.sampleRate, m.channels, m.bitsPerSample,
            null, null, null, null, m.durationMs))
          .orElse(parseWav(bytes).map(m =>
            Row(id, "wav", null, m.sampleRate, m.channels, m.bitsPerSample,
              null, null, null, null, m.durationMs)))
          .orElse(parseMp4(bytes).map(m =>
            Row(id, "mp4", null, null, null, null, null,
              m.tracks, m.hasVideo, m.hasAudio, m.durationMs)))
          .orElse(parseMp3(bytes).map(m =>
            Row(id, "mp3", m.bitrateKbps, m.sampleRate, m.channels, null,
              m.frames, null, null, null, m.durationMs)))
          .orElse(parseAac(bytes).map(m =>
            Row(id, "aac", null, m.sampleRate, m.channels, null,
              m.frames, null, null, null, m.durationMs)))
          .getOrElse(Row(id, null, null, null, null, null, null, null, null,
            null, null))
      }
    }(enc)
  }

  // ---- deterministic synthetic fixtures ----------------------------------------

  /** Valid MPEG-1 Layer III stream: sr=32000 (36 ms/frame exactly), bitrate
    * 32+8*(id%5) kbps, 5+id%7 frames, ID3v2 tag prepended on id%2==1.
    * Every derived fact is integer arithmetic on `id` — the oracle
    * recomputes them without parsing.
    */
  def syntheticMp3(id: Long): Array[Byte] = {
    val bitrateIdx = 1 + (id % 5).toInt // 32,40,48,56,64 kbps
    val bitrate = L3Bitrates(0)(bitrateIdx)
    val frames = 5 + (id % 7).toInt
    val frameLen = 144 * bitrate * 1000 / 32000 // integral for these rates
    val id3 = if (id % 2 == 1) {
      val tag = new Array[Byte](10 + 7)
      tag(0) = 'I'; tag(1) = 'D'; tag(2) = '3'; tag(3) = 4; tag(9) = 7
      tag
    } else Array.empty[Byte]
    val out = new Array[Byte](id3.length + frames * frameLen)
    System.arraycopy(id3, 0, out, 0, id3.length)
    var p = id3.length
    (0 until frames).foreach { f =>
      out(p) = 0xff.toByte
      out(p + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(p + 2) = ((bitrateIdx << 4) | (2 << 2)).toByte // srIdx=2 -> 32000
      out(p + 3) = 0x00 // stereo
      var j = 4
      while (j < frameLen) { out(p + j) = ((id * 31 + f * 7 + j) % 127).toByte; j += 1 }
      p += frameLen
    }
    out
  }

  /** Minimal ISO-BMFF: ftyp(isom) + moov{mvhd(ts=1000, dur=(k+1)*500) +
    * 1+(k%2) traks (vide, then soun)}. Takes the PER-FORMAT stream index k
    * (media_id / nFormats under the fixture dispatch) directly, so both
    * track layouts alternate whatever the dispatch modulus — the r12
    * ADVICE bug was exactly a layout keyed on the raw media_id going
    * constant under the dispatch.
    */
  def syntheticMp4(k: Long): Array[Byte] = {
    val id = k
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4))
    val mvhdPayload = java.nio.ByteBuffer.allocate(100)
    mvhdPayload.position(12) // version/flags + ctime + mtime = 0
    mvhdPayload.putInt(1000).putInt(((id + 1) * 500).toInt)
    val mvhd = box("mvhd", mvhdPayload.array())
    def trak(handler: String): Array[Byte] = {
      val h = java.nio.ByteBuffer.allocate(25)
      h.position(8)
      h.put(handler.getBytes("US-ASCII"))
      box("trak", box("mdia", box("hdlr", h.array())))
    }
    val nTracks = 1 + (id % 2).toInt
    val traks = trak("vide") ++ (if (nTracks == 2) trak("soun") else Array.empty[Byte])
    ftyp ++ box("moov", mvhd ++ traks)
  }

  /** Valid ADTS stream: sr=32000 (32 ms/frame exactly), 1+id%2 channels,
    * 4+id%6 frames of 7+(7+id%9) bytes — all integer arithmetic on `id`.
    */
  def syntheticAac(id: Long): Array[Byte] = {
    val frames = 4 + (id % 6).toInt
    val channels = 1 + (id % 2).toInt
    val frameLen = 7 + 7 + (id % 9).toInt
    val out = new Array[Byte](frames * frameLen)
    var p = 0
    (0 until frames).foreach { f =>
      out(p) = 0xff.toByte
      out(p + 1) = 0xf1.toByte // MPEG-4, layer 00, no CRC
      out(p + 2) = ((1 << 6) | (5 << 2) | (channels >> 2)).toByte // LC, srIdx=5 -> 32000
      out(p + 3) = (((channels & 0x3) << 6) | (frameLen >> 11)).toByte
      out(p + 4) = ((frameLen >> 3) & 0xff).toByte
      out(p + 5) = (((frameLen & 0x7) << 5) | 0x1f).toByte
      out(p + 6) = 0xfc.toByte
      var j = 7
      while (j < frameLen) { out(p + j) = ((id * 17 + f * 5 + j) % 127).toByte; j += 1 }
      p += frameLen
    }
    out
  }

  /** Valid FLAC header: fLaC magic, STREAMINFO (first, per spec), then a
    * last-flagged PADDING block so the walker exercises the block chain.
    * sr=32000, 1+id%2 channels, 16-bit, (id+1)*8000 total samples ->
    * duration (id+1)*250 ms exactly.
    */
  def syntheticFlac(id: Long): Array[Byte] = {
    val channels = 1 + (id % 2).toInt
    val total = (id + 1) * 8000
    val si = new Array[Byte](34)
    // min/max blocksize + frame sizes: arbitrary valid values
    si(0) = 0x10; si(1) = 0x00; si(2) = 0x10; si(3) = 0x00
    val sr = 32000
    si(10) = ((sr >> 12) & 0xff).toByte
    si(11) = ((sr >> 4) & 0xff).toByte
    si(12) = (((sr & 0xf) << 4) | ((channels - 1) << 1) | ((16 - 1) >> 4)).toByte
    si(13) = ((((16 - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte
    si(14) = ((total >> 24) & 0xff).toByte
    si(15) = ((total >> 16) & 0xff).toByte
    si(16) = ((total >> 8) & 0xff).toByte
    si(17) = (total & 0xff).toByte
    val pad = new Array[Byte](6)
    val out = java.nio.ByteBuffer.allocate(4 + 4 + 34 + 4 + pad.length)
    out.put("fLaC".getBytes("US-ASCII"))
    out.put(0x00.toByte).put(0x00.toByte).put(0x00.toByte).put(34.toByte).put(si)
    out.put((0x80 | 0x01).toByte).put(0x00.toByte).put(0x00.toByte) // last PADDING
      .put(pad.length.toByte).put(pad)
    out.array()
  }

  /** Valid PCM WAV: sr=16000, 1+k%2 channels, 16-bit, (k+1)*4000 samples
    * -> exact (k+1)*250 ms; a LIST chunk with an ODD size sits between
    * fmt and data to exercise the even-padding rule.
    */
  def syntheticWav(k: Long): Array[Byte] = {
    val channels = 1 + (k % 2).toInt
    val blockAlign = channels * 2
    val dataBytes = ((k + 1) * 4000).toInt * blockAlign
    val listBytes = 3 // odd on purpose
    val out = java.nio.ByteBuffer.allocate(
      12 + (8 + 16) + (8 + listBytes + 1) + 8 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(out.capacity() - 8)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(16000)
      .putInt(16000 * blockAlign).putShort(blockAlign.toShort).putShort(16)
    out.put("LIST".getBytes("US-ASCII")).putInt(listBytes)
      .put(Array.tabulate[Byte](listBytes + 1)(i => i.toByte)) // +1 = pad byte
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < dataBytes) { out.put(((k * 31 + i) % 127).toByte); i += 1 }
    out.array()
  }
}
