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

  // ---- mp3Inventory: frame-level stream facts + the two de-facto
  //      VBR headers, all hand-derivable from ISO header arithmetic --

  /** One frame with explicit header flags; body zeros except
    * `patches` (absolute offsets within the frame).
    */
  private def mp3Frame(brIdx: Int, rateIdx: Int, mono: Boolean,
                       crc: Boolean = false,
                       patches: Seq[(Int, Array[Byte])] = Nil): Array[Byte] = {
    val rates = Array(44100, 48000, 32000)
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val frameLen = 144 * kbps(brIdx) * 1000 / rates(rateIdx)
    val f = new Array[Byte](frameLen)
    f(0) = 0xff.toByte
    f(1) = (0xfa | (if (crc) 0 else 1)).toByte // v1, layer III
    f(2) = ((brIdx << 4) | (rateIdx << 2)).toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    for ((off, b) <- patches) System.arraycopy(b, 0, f, off, b.length)
    f
  }

  private def u32be(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("mp3Inventory: CBR stream — frames, samples, duration, exact average bitrate") {
    // 10 stereo 128 kbps 44.1 kHz frames: frameLen = 144*128000/44100
    // = 417, spf 1152 → 11520 samples = 261 ms (integer ms)
    val bytes = (0 until 10).map(_ => mp3Frame(9, 0, mono = false))
      .reduce(_ ++ _)
    val inv = AudioProbe.mp3Inventory(bytes).get
    assert(inv.channels == 2 && inv.sampleRateHz == 44100)
    assert(inv.nFrames == 10 && inv.nSamples == 11520L)
    assert(inv.durationMs == 11520L * 1000 / 44100)
    assert(!inv.vbr && inv.vbrHeader.isEmpty &&
      inv.declaredFrames.isEmpty && inv.declaredBytes.isEmpty)
    val expectAvg = 4170 * 8.0 / (11520.0 / 44100) / 1000.0
    assert(math.abs(inv.avgBitrateKbps - expectAvg) < 1e-9)
  }

  test("mp3Inventory: Xing header frame is metadata — excluded, counted, declared fields read") {
    // mono, no CRC → side info 17, tag at frame offset 4 + 17 = 21
    val xing = mp3Frame(5, 0, mono = true, patches = Seq(
      21 -> "Xing".getBytes("US-ASCII"),
      25 -> u32be(0x3), // frames + bytes flags
      29 -> u32be(7L),
      33 -> u32be(12345L)))
    val audio = (0 until 7).map(i =>
      mp3Frame(if (i % 2 == 0) 7 else 9, 0, mono = true))
    val inv = AudioProbe.mp3Inventory(
      xing ++ audio.reduce(_ ++ _)).get
    assert(inv.vbrHeader.contains("xing"))
    assert(inv.declaredFrames.contains(7L) &&
      inv.declaredBytes.contains(12345L))
    // the header frame does not count as audio, and its 64 kbps must
    // not trip the VBR flag — the alternating 96/128 audio frames do
    assert(inv.nFrames == 7 && inv.nSamples == 7 * 1152L && inv.vbr)
  }

  test("mp3Inventory: Info-tagged CBR reports vbr=false; CRC shifts the tag offset") {
    // stereo WITH header CRC → side info 32, tag at 4 + 2 + 32 = 38
    val info = mp3Frame(9, 0, mono = false, crc = true, patches = Seq(
      38 -> "Info".getBytes("US-ASCII"),
      42 -> u32be(0x1),
      46 -> u32be(4L)))
    val audio = (0 until 4).map(_ => mp3Frame(9, 0, mono = false))
    val inv = AudioProbe.mp3Inventory(info ++ audio.reduce(_ ++ _)).get
    assert(inv.vbrHeader.contains("info") && !inv.vbr)
    assert(inv.declaredFrames.contains(4L) && inv.declaredBytes.isEmpty)
    assert(inv.nFrames == 4)
  }

  test("mp3Inventory: VBRI header at its fixed 36-byte offset") {
    val vbri = mp3Frame(9, 0, mono = false, patches = Seq(
      36 -> "VBRI".getBytes("US-ASCII"),
      40 -> Array[Byte](0, 1, 0, 0, 0, 0), // version 1, delay, quality
      46 -> u32be(55555L),
      50 -> u32be(3L)))
    val audio = (0 until 3).map(_ => mp3Frame(9, 0, mono = false))
    val inv = AudioProbe.mp3Inventory(vbri ++ audio.reduce(_ ++ _)).get
    assert(inv.vbrHeader.contains("vbri"))
    assert(inv.declaredFrames.contains(3L) &&
      inv.declaredBytes.contains(55555L))
    assert(inv.nFrames == 3)
  }

  test("oggFlacInfo: BOS-packet header facts; Vorbis and junk stay unknown") {
    // one BOS page: 27-byte header + 1 lacing value + the mapping's
    // signature packet (0x7F FLAC 1 0 nheaders=0) wrapping fLaC +
    // STREAMINFO; the header probe never checks the page CRC
    def oggBos(packet: Array[Byte]): Array[Byte] = {
      require(packet.length < 255)
      val out = new java.io.ByteArrayOutputStream()
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0); out.write(2)
      (0 until 20).foreach(_ => out.write(0)) // granule+serial+seq+crc
      out.write(1); out.write(packet.length)
      out.write(packet)
      out.toByteArray
    }
    val native = flac(2, 44100, 16, 98765L)
    val sig = Array(0x7f.toByte, 'F'.toByte, 'L'.toByte, 'A'.toByte,
      'C'.toByte, 1.toByte, 0.toByte, 0.toByte, 1.toByte)
    // flacInfo wants STREAMINFO first: strip the spec builder's
    // leading padding block, keep fLaC + the STREAMINFO block
    val slim = "fLaC".getBytes("US-ASCII") ++ native.drop(native.length - 38)
    val ogg = oggBos(sig ++ slim)
    val m = AudioProbe.meta(ogg)
    assert(m.contains(AudioProbe.AudioMeta("ogg-flac", 2, 44100, 16, 98765L)),
      m.toString)
    assert(AudioProbe.diagnoseMeta(ogg) == "ok")
    val vorbis = oggBos(Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      Array.fill[Byte](10)(0))
    assert(AudioProbe.meta(vorbis).isEmpty)
    assert(AudioProbe.diagnoseMeta(vorbis).contains("without a FLAC mapping"))
    for (n <- 0 to ogg.length) AudioProbe.meta(ogg.take(n)) // no throw
  }

  test("mp3Inventory: ID3v2 skip, non-MP3 None, never a throw on prefixes") {
    val bytes = mp3(1, 1, 14, 3, id3Bytes = 128)
    val inv = AudioProbe.mp3Inventory(bytes).get
    assert(inv.nFrames == 3 && inv.sampleRateHz == 48000)
    assert(AudioProbe.mp3Inventory("not audio".getBytes).isEmpty)
    assert(AudioProbe.mp3Inventory(null).isEmpty)
    for (n <- 0 to bytes.length)
      AudioProbe.mp3Inventory(bytes.take(n)) // must not throw
  }
}
