package graft.engine

import javax.sound.sampled._

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.validate.AudioProbe

/** AudioProbe vs the JDK's own WAV machinery: the fixtures are written
  * by `AudioSystem.write` and the expected facts cross-checked against
  * `AudioSystem.getAudioFileFormat` — two independent implementations
  * agreeing on the same bytes. Plus hostile-byte fuzzing: a header
  * probe that can throw on a truncated crawl download is an executor
  * killer, so every prefix of a real file must parse or fail cleanly.
  */
class AudioProbeSpec extends AnyFunSuite {

  private def wav(channels: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(
      if (bits == 8) AudioFormat.Encoding.PCM_UNSIGNED
      else AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, bits, channels, channels * bits / 8, rate.toFloat, false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    var i = 0
    while (i < data.length) { data(i) = ((i * 13 + 5) & 0xff).toByte; i += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("info matches AudioSystem.getAudioFileFormat on JDK-authored WAVs") {
    for {
      (c, r, b, f) <- Seq((1, 8000, 16, 123), (2, 44100, 16, 1000),
        (1, 16000, 8, 777), (2, 22050, 8, 50), (1, 48000, 16, 1))
    } {
      val bytes = wav(c, r, b, f)
      val jdk = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      val got = AudioProbe.info(bytes).getOrElse(fail(s"no parse for ($c,$r,$b,$f)"))
      assert(got.channels == jdk.getFormat.getChannels)
      assert(got.sampleRateHz == jdk.getFormat.getSampleRate.toInt)
      assert(got.bitsPerSample == jdk.getFormat.getSampleSizeInBits)
      assert(got.nFrames == jdk.getFrameLength.toLong)
      assert(got.nFrames == f.toLong)
      assert(AudioProbe.diagnose(bytes) == "ok")
    }
  }

  test("durationMs follows frames / rate") {
    assert(AudioProbe.info(wav(1, 1000, 16, 2500)).get.durationMs == 2500L)
    assert(AudioProbe.WavInfo(1, 0, 16, 100).durationMs == 0L)
  }

  test("unknown chunks before fmt are walked over (LIST metadata)") {
    val plain = wav(1, 8000, 16, 64)
    // splice a LIST chunk (10 data bytes) between the RIFF header and
    // the first chunk — metadata-bearing WAVs routinely lead with one
    val listData = "INFOabcdef".getBytes("ISO-8859-1")
    val chunk = "LIST".getBytes("ISO-8859-1") ++
      Array[Byte](listData.length.toByte, 0, 0, 0) ++ listData
    val spliced = plain.take(12) ++ chunk ++ plain.drop(12)
    val got = AudioProbe.info(spliced).getOrElse(fail("LIST chunk broke the walk"))
    assert(got.channels == 1 && got.sampleRateHz == 8000 && got.nFrames == 64L)
  }

  test("odd-sized chunks advance with pad byte (spec alignment rule)") {
    val plain = wav(2, 22050, 16, 32)
    // odd-length unknown chunk: 7 data bytes + 1 pad byte
    val chunk = "junk".getBytes("ISO-8859-1") ++
      Array[Byte](7, 0, 0, 0) ++ "1234567".getBytes("ISO-8859-1") ++
      Array[Byte](0)
    val spliced = plain.take(12) ++ chunk ++ plain.drop(12)
    assert(AudioProbe.info(spliced).exists(_.nFrames == 32L))
  }

  test("declared data size overrunning the payload clamps to bytes present") {
    val full = wav(1, 8000, 16, 100) // 200 data bytes
    val truncated = full.dropRight(60) // 30 frames lost in transit
    val got = AudioProbe.info(truncated).getOrElse(fail("truncation unreadable"))
    assert(got.nFrames == 70L)
  }

  test("every prefix of a real WAV parses or fails cleanly — no throw") {
    val full = wav(2, 44100, 16, 200)
    for (n <- 0 to full.length) {
      val prefix = full.take(n)
      AudioProbe.info(prefix) // must not throw
      val d = AudioProbe.diagnose(prefix)
      assert(d.nonEmpty)
      if (n == full.length) assert(d == "ok")
    }
  }

  test("failure diagnosis classes are stable strings") {
    assert(AudioProbe.diagnose(null) == "file is empty")
    assert(AudioProbe.diagnose(Array.emptyByteArray) == "file is empty")
    assert(AudioProbe.diagnose("not audio".getBytes) == "not a RIFF/WAVE container")
    // RIFF/WAVE with a truncated fmt chunk
    assert(AudioProbe.diagnose(wav(1, 8000, 16, 10).take(24))
      == "wave data chunk missing or fmt truncated")
    // RIFF/WAVE whose only chunk is unknown
    val fmtless = "RIFF0000WAVE".getBytes("ISO-8859-1") ++
      "jnk ".getBytes("ISO-8859-1") ++ Array[Byte](2, 0, 0, 0) ++
      Array[Byte](1, 2)
    assert(AudioProbe.diagnose(fmtless) == "wave fmt chunk missing")
    assert(AudioProbe.info(fmtless).isEmpty)
  }

  test("a lying near-4GB chunk size ends the walk — no overflow, no throw") {
    // declared size 0xFFFFFFFF: an Int offset clamped to MaxValue would
    // make `off + 8` wrap negative and re-enter the loop out of bounds
    val lying = "RIFF0000WAVE".getBytes("ISO-8859-1") ++
      "JUNK".getBytes("ISO-8859-1") ++
      Array[Byte](-1, -1, -1, -1) ++ Array[Byte](1, 2, 3, 4)
    assert(AudioProbe.info(lying).isEmpty)
    assert(AudioProbe.diagnose(lying) == "wave fmt chunk missing")
    // same lie on a chunk BEFORE a valid fmt: fmt is unreachable past
    // the overrun, walk must still end cleanly
    val real = wav(1, 8000, 16, 10)
    val spliced = real.take(12) ++ "JUNK".getBytes("ISO-8859-1") ++
      Array[Byte](-1, -1, -1, -1) ++ real.drop(12)
    assert(AudioProbe.info(spliced).isEmpty)
    assert(AudioProbe.diagnose(spliced) == "wave fmt chunk missing")
  }

  test("degenerate fmt values fail the parse instead of dividing by zero") {
    // hand-built WAV with blockAlign = 0 and zero channels/rate
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmtData = le16(1) ++ le16(0) ++ le32(0) ++ le32(0) ++ le16(0) ++ le16(16)
    val bytes = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmtData ++
      "data".getBytes ++ le32(4) ++ Array[Byte](1, 2, 3, 4)
    assert(AudioProbe.info(bytes).isEmpty)
  }

  // ---- bare AAC (ADTS) --------------------------------------------

  /** Hand-packed ADTS frames (ISO 13818-7 §6.2 bit layout, written
    * field-by-field — independent of the probe's parse).
    */
  private def adtsStream(rateIdx: Int, channels: Int, nFrames: Int,
                         payloadBytes: Int, crc: Boolean = false,
                         blocks: Int = 1): Array[Byte] = {
    val headerLen = if (crc) 9 else 7
    val frameLen = headerLen + payloadBytes
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    for (f <- 0 until nFrames) {
      out += 0xFF.toByte
      out += (0xF0 | (if (crc) 0 else 1)).toByte // MPEG-4, layer 00
      out += (((1 /* LC profile */ ) << 6) | (rateIdx << 2) |
        ((channels >> 2) & 1)).toByte
      out += (((channels & 0x3) << 6) | ((frameLen >> 11) & 0x3)).toByte
      out += ((frameLen >> 3) & 0xff).toByte
      out += (((frameLen & 0x7) << 5) | 0x1f).toByte // fullness hi
      out += ((0xfc | (blocks - 1)) & 0xff).toByte   // fullness lo + blocks
      if (crc) { out += 0; out += 0 }
      for (i <- 0 until payloadBytes) out += ((f * 31 + i) & 0xff).toByte
    }
    out.toArray
  }

  test("ADTS: frame walk recovers rate/channels/samples; CRC and " +
    "multi-block frames count correctly") {
    // 44100 Hz stereo, 5 frames of 1024 samples
    val a = AudioProbe.adtsInfo(adtsStream(4, 2, 5, 64)).get
    assert(a.codec == "aac-adts" && a.channels == 2 &&
      a.sampleRateHz == 44100 && a.nSamples == 5 * 1024L)
    // CRC-protected header (9 bytes) still walks
    val c = AudioProbe.adtsInfo(adtsStream(11, 1, 3, 20, crc = true)).get
    assert(c.sampleRateHz == 8000 && c.channels == 1 &&
      c.nSamples == 3 * 1024L)
    // two raw data blocks per frame double the samples
    val b = AudioProbe.adtsInfo(adtsStream(3, 6, 4, 80, blocks = 2)).get
    assert(b.sampleRateHz == 48000 && b.channels == 6 &&
      b.nSamples == 4 * 2048L)
    // meta() routes it (disjoint from MP3: layer bits differ)
    assert(AudioProbe.meta(adtsStream(4, 2, 5, 64))
      .exists(_.codec == "aac-adts"))
    assert(AudioProbe.diagnoseMeta(adtsStream(4, 2, 5, 64)) == "ok")
  }

  test("ADTS: leading junk resyncs via the two-header confirm; a " +
    "lone sync pattern in junk does not probe as audio") {
    val clean = adtsStream(7, 2, 4, 48)
    val dirty = "leading junk bytes".getBytes("UTF-8") ++ clean
    val a = AudioProbe.adtsInfo(dirty).get
    assert(a.sampleRateHz == 22050 && a.nSamples == 4 * 1024L)
    // a single valid-looking header inside junk (no confirming
    // successor) must not sync
    val lone = Array.fill[Byte](64)(0x20) ++ clean.take(7) ++
      Array.fill[Byte](64)(0x20)
    assert(AudioProbe.adtsInfo(lone).isEmpty)
  }

  test("ADTS: every prefix parses without throwing; junk and " +
    "reserved rate indices refuse") {
    val full = adtsStream(4, 2, 3, 32)
    (0 to full.length).foreach(n => AudioProbe.adtsInfo(full.take(n)))
    // truncated mid-header: only the header-complete frames count
    val cut = AudioProbe.adtsInfo(full.take(80))
    assert(cut.exists(_.nSamples == 2 * 1024L))
    assert(AudioProbe.adtsInfo("no audio at all here".getBytes).isEmpty)
    // reserved sampling_frequency_index (13) refuses
    val bad = adtsStream(4, 2, 2, 16)
    bad(2) = ((1 << 6) | (13 << 2)).toByte
    assert(AudioProbe.adtsInfo(bad).isEmpty ||
      AudioProbe.adtsInfo(bad).exists(_.nSamples == 1024L))
  }
}
