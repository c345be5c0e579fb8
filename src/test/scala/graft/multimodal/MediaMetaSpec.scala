package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Container-metadata parsers: frame-walking (not first-header) duration,
  * ID3v2 skip, junk rejection, ISO-BMFF traversal incl. 64-bit largesize.
  */
class MediaMetaSpec extends AnyFunSuite {

  test("mp3: frame walk counts frames and sums duration; ID3v2 skipped") {
    val plain = MediaMeta.syntheticMp3(0) // 32 kbps, 5 frames, no ID3
    val m = MediaMeta.parseMp3(plain).get
    assert(m.mpegVersion == "MPEG-1" && m.bitrateKbps == 32 && m.sampleRate == 32000)
    assert(m.frames == 5 && m.durationMs == 5 * 36)
    val tagged = MediaMeta.syntheticMp3(1) // ID3v2 present
    val t = MediaMeta.parseMp3(tagged).get
    assert(t.bitrateKbps == 40 && t.frames == 6 && t.durationMs == 6 * 36)
  }

  test("mp3: VBR stream reports true duration from the walk") {
    // splice a 32 kbps stream and a 64 kbps stream: frame count and
    // duration must come from walking both, not from the first header
    val vbr = MediaMeta.syntheticMp3(0) ++ MediaMeta.syntheticMp3(4).drop(0)
    val m = MediaMeta.parseMp3(vbr).get
    assert(m.bitrateKbps == 32, "reported bitrate is the first frame's")
    assert(m.frames == 5 + 9 && m.durationMs == (5 + 9) * 36)
  }

  test("mp3: junk and image bytes are rejected, trailing junk tolerated") {
    assert(MediaMeta.parseMp3(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(MediaMeta.parseMp3(
      Array.tabulate[Byte](64)(j => ((31 + j) % 127).toByte)).isEmpty)
    val withTrailer = MediaMeta.syntheticMp3(2) ++ "TAGjunkjunk".getBytes
    assert(MediaMeta.parseMp3(withTrailer).get.frames == 7)
  }

  test("mp4: ftyp/mvhd/trak walk, 64-bit largesize moov") {
    // syntheticMp4 takes the per-format index k directly (r13): even k ->
    // 1 track, odd k -> 2 tracks (vide+soun), duration (k+1)*500 ms —
    // both layouts alternate whatever the fixture dispatch modulus.
    val m = MediaMeta.parseMp4(MediaMeta.syntheticMp4(0)).get
    assert(m.brand == "isom" && m.timescale == 1000)
    assert(m.durationMs == 500 && m.tracks == 1 && m.hasVideo && !m.hasAudio)
    val two = MediaMeta.parseMp4(MediaMeta.syntheticMp4(1)).get
    assert(two.durationMs == 1000 && two.tracks == 2 && two.hasVideo && two.hasAudio)
    // rebuild the moov as a largesize (size=1 + 64-bit) box
    val orig = MediaMeta.syntheticMp4(0)
    val ftypLen = 16
    val moov = orig.drop(ftypLen)
    val big = java.nio.ByteBuffer.allocate(moov.length + 8)
    big.putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(moov.length + 8L).put(moov.drop(8))
    val reparsed = MediaMeta.parseMp4(orig.take(ftypLen) ++ big.array()).get
    assert(reparsed.durationMs == 500 && reparsed.tracks == 1)
    assert(MediaMeta.parseMp4("not a container at all".getBytes).isEmpty)
  }

  test("wav: RIFF/WAVE chunk walk with odd-size LIST padding (r13)") {
    val m = MediaMeta.parseWav(MediaMeta.syntheticWav(0)).get
    assert(m.sampleRate == 16000 && m.channels == 1 && m.bitsPerSample == 16)
    assert(m.durationMs == 250, "4000 samples at 16 kHz")
    val st = MediaMeta.parseWav(MediaMeta.syntheticWav(3)).get
    assert(st.channels == 2 && st.durationMs == 1000)
    // truncated data chunk, wrong magic, other containers -> None
    assert(MediaMeta.parseWav(MediaMeta.syntheticWav(0).dropRight(100)).isEmpty)
    assert(MediaMeta.parseWav("RIFFxxxxWAVX".getBytes).isEmpty)
    assert(MediaMeta.parseWav(MediaMeta.syntheticFlac(1)).isEmpty)
    assert(MediaMeta.parseFlac(MediaMeta.syntheticWav(1)).isEmpty)
  }

  test("mp3: mid-stream header with sync bits but invalid fields ends the walk (r11 advice)") {
    val base = MediaMeta.syntheticMp3(2) // 7 frames
    // trailing bytes that PASS the sync check but carry bitrateIdx=0
    val fakeSync = Array[Byte](0xff.toByte, 0xfb.toByte, 0x08.toByte, 0x00.toByte)
    val m = MediaMeta.parseMp3(base ++ fakeSync).get
    assert(m.frames == 7, "accumulated frames must survive a junk quasi-header")
  }

  test("aac: ADTS frame walk, disjoint from MP3 on the layer bits (r12)") {
    val m = MediaMeta.parseAac(MediaMeta.syntheticAac(3)).get
    assert(m.sampleRate == 32000 && m.channels == 2 && m.frames == 7)
    assert(m.durationMs == 7 * 32)
    // an MP3 stream is NOT an ADTS stream and vice versa
    assert(MediaMeta.parseAac(MediaMeta.syntheticMp3(2)).isEmpty)
    assert(MediaMeta.parseMp3(MediaMeta.syntheticAac(3)).isEmpty)
    assert(MediaMeta.parseAac("random junk bytes".getBytes).isEmpty)
    // trailing junk after valid frames is tolerated
    val t = MediaMeta.parseAac(MediaMeta.syntheticAac(0) ++ "junk".getBytes).get
    assert(t.frames == 4)
  }

  test("flac: STREAMINFO block walk (r12)") {
    val m = MediaMeta.parseFlac(MediaMeta.syntheticFlac(5)).get
    assert(m.sampleRate == 32000 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.totalSamples == 48000 && m.durationMs == 1500)
    val mono = MediaMeta.parseFlac(MediaMeta.syntheticFlac(2)).get
    assert(mono.channels == 1 && mono.durationMs == 750)
    assert(MediaMeta.parseFlac("fLaX not flac".getBytes).isEmpty)
    assert(MediaMeta.parseFlac(MediaMeta.syntheticMp4(1)).isEmpty)
  }
}
