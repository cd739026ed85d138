package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.validate.AudioProbe

/** FLAC STREAMINFO and MPEG frame-header probes against fixture bytes
  * authored field-by-field from the published specs (builder code
  * independent of the parser), plus the AudioProbeSpec fuzz stance:
  * every prefix of every fixture must parse or fail cleanly — a probe
  * that throws on truncated crawl bytes is an executor killer.
  */
class CodecProbeSpec extends AnyFunSuite {

  // --- builders (spec-driven, mirror of the m7 gate fixture code) ---

  private def flac(channels: Int, rate: Int, bits: Int,
                   nSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x04); out.write(0); out.write(0); out.write(8)
    (1 to 8).foreach(_ => out.write(0x55))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10
    si(10) = ((rate >> 12) & 0xff).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bits - 1) >> 4) & 0x1)).toByte
    si(13) = ((((bits - 1) & 0xf) << 4) | ((nSamples >> 32) & 0xf)).toByte
    si(14) = ((nSamples >> 24) & 0xff).toByte
    si(15) = ((nSamples >> 16) & 0xff).toByte
    si(16) = ((nSamples >> 8) & 0xff).toByte
    si(17) = (nSamples & 0xff).toByte
    out.write(si)
    out.toByteArray
  }

  private def mp3(channels: Int, rateIdx: Int, brIdx: Int, nFrames: Int,
                  id3Bytes: Int = 0, padding: Int = 0): Array[Byte] = {
    val rates = Array(44100, 48000, 32000)
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0)
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      (1 to id3Bytes).foreach(_ => out.write(0))
    }
    for (_ <- 1 to nFrames) {
      val frameLen = 144 * kbps(brIdx) * 1000 / rates(rateIdx) + padding
      out.write(0xff); out.write(0xfa)
      out.write((brIdx << 4) | (rateIdx << 2) | (padding << 1))
      out.write(if (channels == 1) 0xc0 else 0x00)
      (1 to frameLen - 4).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  test("FLAC: STREAMINFO bit unpacking across field extremes") {
    val cases = Seq(
      (2, 44100, 16, 1234567L), (1, 96000, 24, 48000L),
      (8, 8000, 8, 0L), (1, 655350, 32, (1L << 36) - 1), // 20-bit rate max
      (4, 192000, 20, 1L))
    for ((c, r, b, n) <- cases) {
      val m = AudioProbe.flacInfo(flac(c, r, b, n))
      assert(m.contains(AudioProbe.AudioMeta("flac", c, r, b, n)),
        s"flac($c,$r,$b,$n) parsed as $m")
    }
  }

  test("MP3: frame walk counts samples; ID3v2 skipped; padding honored") {
    val m = AudioProbe.mp3Info(mp3(2, 0, 9, 5))
    assert(m.contains(AudioProbe.AudioMeta("mp3", 2, 44100, 0, 5 * 1152L)))
    val mono = AudioProbe.mp3Info(mp3(1, 1, 14, 3, id3Bytes = 128))
    assert(mono.contains(AudioProbe.AudioMeta("mp3", 1, 48000, 0, 3 * 1152L)))
    val padded = AudioProbe.mp3Info(mp3(2, 2, 1, 4, padding = 1))
    assert(padded.contains(AudioProbe.AudioMeta("mp3", 2, 32000, 0, 4 * 1152L)))
  }

  test("unified meta dispatches on container signature") {
    assert(AudioProbe.meta(flac(2, 44100, 16, 10L)).map(_.codec)
      .contains("flac"))
    assert(AudioProbe.meta(mp3(2, 0, 9, 1)).map(_.codec).contains("mp3"))
    assert(AudioProbe.meta("garbage".getBytes("UTF-8")).isEmpty)
    assert(AudioProbe.diagnoseMeta(null) == "file is empty")
    assert(AudioProbe.diagnoseMeta("garbage no sync".getBytes("UTF-8")) ==
      "no audio container or frame sync found")
  }

  test("every prefix of every fixture parses or fails cleanly — no throw") {
    val fixtures = Seq(
      flac(2, 44100, 16, 1234567L),
      mp3(2, 0, 9, 3),
      mp3(1, 1, 14, 2, id3Bytes = 64))
    for (full <- fixtures; n <- 0 to full.length) {
      val prefix = full.take(n)
      AudioProbe.meta(prefix) // must not throw
      val d = AudioProbe.diagnoseMeta(prefix)
      assert(d.nonEmpty)
    }
  }

  test("hostile bytes: lying block sizes and stray syncs end cleanly") {
    // FLAC block with a near-16MB declared length on a tiny payload
    val lying = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x04, -1, -1, -1) ++ Array[Byte](1, 2, 3)
    assert(AudioProbe.flacInfo(lying).isEmpty)
    // a stray 0xFF FB sync inside junk must be REJECTED outright: a
    // lone frame header mid-junk gets no truncation waiver and has no
    // confirming second header, so arbitrary binary cannot probe "ok"
    val stray = ("abc".getBytes("UTF-8") :+ 0xff.toByte :+ 0xfb.toByte) ++
      Array[Byte](0x90.toByte, 0x00) ++ Array.fill[Byte](10)(0x41)
    assert(AudioProbe.mp3Info(stray).isEmpty)
    assert(AudioProbe.diagnoseMeta(stray) ==
      "no audio container or frame sync found")
    // but a genuinely truncated download — the header AT the stream
    // head with its frame cut by EOF — still parses
    val truncated = mp3(2, 0, 9, 1).take(40)
    assert(AudioProbe.mp3Info(truncated).isDefined)
  }
}
