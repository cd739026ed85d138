package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Signal-stats kernel against constructed waveforms whose values are
  * closed-form: full-scale square (clip 1, peak = rms = 32767/32768),
  * exact-bin sine at A = 0.5 sampled through its exact peak
  * (peak_db = −6.0206), silence (floors), and the half/half splice.
  */
class AudioStatsSpec extends SparkSpec {
  import spark.implicits._

  private def wav16(x: Array[Double], rate: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("RIFF".getBytes); w32(36L + x.length * 2)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16L)
    w16(1); w16(1); w32(rate.toLong); w32(rate.toLong * 2); w16(2); w16(16)
    bos.write("data".getBytes); w32(x.length.toLong * 2)
    for (s <- x) {
      val v = math.round(s * 32767).toInt
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
    }
    bos.toByteArray
  }

  private val sr = 8000
  private val full = 32767.0 / 32768.0

  test("square, sine, silence: closed-form peaks, RMS, clip and silence ratios") {
    val square = Array.tabulate(sr)(i => if (i % 2 == 0) 1.0 else -1.0)
    val sq = AudioStats.stats(wav16(square, sr)).get
    assert(sq.nSamples == sr && sq.durationMs == 1000)
    assert(sq.clipRatio == 1.0 && sq.silenceRatio == 0.0)
    assert(math.abs(sq.peakDb - 20 * math.log10(full)) < 1e-9)
    assert(math.abs(sq.rmsDb - 20 * math.log10(full)) < 1e-9)

    // bin-4 sine over 1024n samples passes through sin = 1 exactly at
    // i = 64, and round(0.5·32767) = 16384 → peak is EXACTLY 0.5
    val sine = Array.tabulate(2048)(i =>
      0.5 * math.sin(2 * math.Pi * 4 * i / 1024.0))
    val sn = AudioStats.stats(wav16(sine, sr)).get
    assert(math.abs(sn.peakDb - 20 * math.log10(0.5)) < 1e-9)
    // rms of a full-period sine = A/√2; 16-bit quantization moves it
    // by far less than 0.01 dB
    assert(math.abs(sn.rmsDb - 20 * math.log10(0.5 / math.sqrt(2))) < 0.01)
    assert(sn.clipRatio == 0.0 && sn.silenceRatio < 0.01)

    val silent = AudioStats.stats(wav16(new Array[Double](sr), sr)).get
    assert(silent.peakDb == AudioStats.FloorDb &&
      silent.rmsDb == AudioStats.FloorDb)
    assert(silent.silenceRatio == 1.0 && silent.clipRatio == 0.0)

    val half = AudioStats.stats(wav16(
      new Array[Double](1024) ++ Array.fill(1024)(1.0), sr)).get
    assert(half.silenceRatio == 0.5 && half.clipRatio == 0.5)

    assert(AudioStats.stats("not audio".getBytes).isEmpty)
    assert(AudioStats.stats(Array.empty[Byte]).isEmpty)
  }

  test("8-bit positive-rail clipping is detected (ClipLevel = 127/128)") {
    // 8-bit WAV clamped at +127: pcmMono scales to exactly 127/128 —
    // a 0.999 cutoff would report clip_ratio 0 for a hard-clipped clip
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16b(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val n = 2048
    bos.write("RIFF".getBytes); w32(36L + n)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16L)
    w16b(1); w16b(1); w32(sr.toLong); w32(sr.toLong); w16b(1); w16b(8)
    bos.write("data".getBytes); w32(n.toLong)
    (0 until n).foreach(_ => bos.write(255)) // unsigned 8-bit +rail
    val s = AudioStats.stats(bos.toByteArray).get
    assert(s.clipRatio == 1.0, s.toString)
    assert(math.abs(s.peakDb - 20 * math.log10(127.0 / 128.0)) < 1e-9)
  }

  test("stats measure identically across containers (WAV vs the FLAC the fingerprint shares)") {
    // pcmMono is the shared decode: the FLAC re-encode of the same
    // integers must produce the same stats — pinned transitively by
    // the m21/m28 identity gates; here the WAV face plus struct column
    val sine = Array.tabulate(1024)(i =>
      0.25 * math.sin(2 * math.Pi * 8 * i / 1024.0))
    val df = Seq((1L, wav16(sine, sr)), (2L, "junk".getBytes))
      .toDF("id", "content")
    val got = df.select(col("id"),
        AudioStats.statsCol(col("content")).as("s"))
      .orderBy("id").collect()
    assert(got(0).getStruct(1).getDouble(4) < -10.0) // rms_db of A=0.25
    assert(got(1).isNullAt(1))
  }

  test("statsAndHash agrees with the two standalone kernels (one decode, same numbers)") {
    val sine = wav16(Array.tabulate(16 * 1024)(i =>
      0.5 * math.sin(2 * math.Pi * 4 * i / 1024.0)), sr)
    val (s, h) = AudioStats.statsAndHash(sine).get
    assert(s == AudioStats.stats(sine).get)
    assert(h == AudioFingerprint.spectralHash64(sine))
    assert(h.isDefined)
    assert(AudioStats.statsAndHash("junk".getBytes).isEmpty)
  }

  test("dropDegenerateAudio: silence, slivers, clipped and undecodable drop; real signal survives") {
    val good = wav16(Array.tabulate(2048)(i =>
      0.5 * math.sin(2 * math.Pi * 4 * i / 1024.0)), sr)
    val silent = wav16(new Array[Double](2048), sr)
    val sliver = wav16(Array.fill(128)(0.5), sr) // 16 ms
    val clipped = wav16(Array.tabulate(2048)(i =>
      if (i % 2 == 0) 1.0 else -1.0), sr)
    val batch = Seq(
      (1L, good), (2L, silent), (3L, sliver), (4L, clipped),
      (5L, "undecodable".getBytes)).toDF("id", "content")
    val kept = AudioStats.dropDegenerateAudio(batch, "content")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
