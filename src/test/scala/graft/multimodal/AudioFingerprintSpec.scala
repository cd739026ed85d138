package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spectral audio fingerprint: every expectation THEORY-derived from
  * authored multi-tone WAVs — one tone per frequency band at an exact
  * FFT bin, amplitudes drawn from a 3-level ladder whose power ratios
  * (9×) dwarf quantization noise, so each hash bit reads straight off
  * the level table. Invariances (gain, channel mix, requantization)
  * and the banded near-dup / index faces are pinned on the same
  * fixtures.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val sr = 8000
  private val F = 1024 // frame = segment at n = 8192: exact-bin tones
  private val nSamples = AudioFingerprint.TimeSegments * F

  /** Middle FFT bin of analysis band `b` (exact-bin tone placement). */
  private def bandBinAt(b: Int, rate: Int, frame: Int): Int = {
    val edges = AudioFingerprint.bandEdges(rate).get
    val binHz = rate.toDouble / frame
    val lo = math.max(1, math.ceil(edges(b) / binHz).toInt)
    val hi = math.floor(edges(b + 1) / binHz).toInt
    require(lo <= hi, s"band $b holds no bin at frame=$frame")
    (lo + hi) / 2
  }

  private def bandBin(b: Int): Int = bandBinAt(b, sr, F)

  /** Amplitude ladder: power ratios of 9 between adjacent levels —
    * decisive against 8-bit quantization noise.
    */
  private val levels = Array(0.02, 0.06, 0.18)

  /** Per-segment band-level patterns (no equal ADJACENT levels: every
    * comparison strict, so the expected bits are exact).
    */
  private val patterns: Seq[Seq[Int]] = Seq(
    Seq(0, 1, 2, 1, 2, 1, 2, 1, 2), Seq(2, 1, 0, 1, 0, 1, 0, 1, 0),
    Seq(0, 2, 0, 2, 0, 2, 0, 2, 0), Seq(2, 0, 2, 0, 2, 0, 2, 0, 2),
    Seq(0, 1, 2, 0, 1, 2, 0, 1, 2), Seq(2, 1, 0, 2, 1, 0, 2, 1, 0),
    Seq(1, 2, 0, 1, 2, 0, 1, 2, 0), Seq(1, 0, 2, 1, 0, 2, 1, 0, 2))

  private def samples(gain: Double,
                      pats: Seq[Seq[Int]] = patterns): Array[Double] = {
    val x = new Array[Double](nSamples)
    var t = 0
    while (t < 8) {
      var i = 0
      while (i < F) {
        var s = 0.0
        var b = 0
        while (b < 9) {
          s += levels(pats(t)(b)) *
            math.sin(2.0 * math.Pi * bandBin(b) * i / F)
          b += 1
        }
        x(t * F + i) = s * gain
        i += 1
      }
      t += 1
    }
    x
  }

  private def expectedHash(pats: Seq[Seq[Int]]): Long = {
    var h = 0L
    for (t <- 0 until 8; b <- 0 until 8)
      h = (h << 1) | (if (pats(t)(b) < pats(t)(b + 1)) 1L else 0L)
    h
  }

  /** Integer-PCM WAV writer (the inverse of pcmMono, independent code). */
  private def wav(x: Array[Double], rate: Int, bits: Int,
                  channels: Int = 1,
                  chanGain: Int => Double = _ => 1.0): Array[Byte] = {
    val bps = bits / 8
    val dataLen = x.length * bps * channels
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("RIFF".getBytes); w32(36L + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16L)
    w16(1); w16(channels); w32(rate.toLong)
    w32(rate.toLong * bps * channels); w16(bps * channels); w16(bits)
    bos.write("data".getBytes); w32(dataLen.toLong)
    val full = (1L << (bits - 1)) - 1
    for (s <- x; c <- 0 until channels) {
      val v = math.round(s * chanGain(c) * full)
      if (bits == 8) bos.write((v + 128).toInt & 0xff)
      else (0 until bps).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    }
    bos.toByteArray
  }

  test("multi-tone fixture hashes to the level-table bits exactly") {
    val got = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16))
    assert(got.contains(expectedHash(patterns)),
      f"got ${got.getOrElse(0L)}%016x expected ${expectedHash(patterns)}%016x")
  }

  test("gain invariance: a quarter-volume copy hashes identically") {
    val a = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16))
    val b = AudioFingerprint.spectralHash64(wav(samples(0.25), sr, 16))
    assert(a == b && a.nonEmpty)
  }

  test("requantization: the 8-bit re-encode hashes identically") {
    val a = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16))
    val b = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 8))
    assert(a == b && a.nonEmpty, s"16-bit $a vs 8-bit $b")
  }

  test("wider widths: 24/32-bit encodes hash identically") {
    val a = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16))
    assert(AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 24)) == a)
    assert(AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 32)) == a)
  }

  /** IEEE-float (format 3) or WAVE_FORMAT_EXTENSIBLE WAV writer. */
  private def wavFloat(x: Array[Double], rate: Int, bits: Int,
                       extensible: Boolean = false): Array[Byte] = {
    val bps = bits / 8
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val fmtLen = if (extensible) 40 else 16
    bos.write("RIFF".getBytes); w32(20L + fmtLen + x.length * bps)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(fmtLen.toLong)
    w16(if (extensible) 0xFFFE else 3); w16(1); w32(rate.toLong)
    w32(rate.toLong * bps); w16(bps); w16(bits)
    if (extensible) {
      w16(22); w16(bits); w32(4L) // cbSize, valid bits, channel mask
      w16(3); w16(0)              // SubFormat GUID: format 3 leading
      w32(0x00100000L); w32(0xAA000080L); w32(0x719B3800L)
    }
    bos.write("data".getBytes); w32(x.length.toLong * bps)
    for (s <- x) {
      if (bits == 32) w32(java.lang.Float.floatToIntBits(s.toFloat) & 0xFFFFFFFFL)
      else (0 until 8).foreach(i => bos.write(
        ((java.lang.Double.doubleToLongBits(s) >> (8 * i)) & 0xff).toInt))
    }
    bos.toByteArray
  }

  test("float32/float64 and WAVE_FORMAT_EXTENSIBLE encodes hash identically") {
    val a = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16))
    assert(AudioFingerprint.spectralHash64(
      wavFloat(samples(1.0), sr, 32)) == a, "float32")
    assert(AudioFingerprint.spectralHash64(
      wavFloat(samples(1.0), sr, 64)) == a, "float64")
    assert(AudioFingerprint.spectralHash64(
      wavFloat(samples(1.0), sr, 32, extensible = true)) == a, "extensible")
  }

  test("channel mix: stereo with an attenuated right channel hashes identically") {
    val a = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16))
    val st = wav(samples(1.0), sr, 16, channels = 2,
      chanGain = c => if (c == 0) 1.0 else 0.5)
    assert(AudioFingerprint.spectralHash64(st) == a)
  }

  test("silence hashes to 0 (relative snap kills fp residue)") {
    val z = AudioFingerprint.spectralHash64(
      wav(new Array[Double](nSamples), sr, 16))
    assert(z.contains(0L))
  }

  test("complemented level patterns flip every bit (Hamming 64)") {
    val comp = patterns.map(_.map(2 - _))
    val a = AudioFingerprint.spectralHash64(wav(samples(1.0), sr, 16)).get
    val b = AudioFingerprint.spectralHash64(wav(samples(1.0, comp), sr, 16)).get
    assert(java.lang.Long.bitCount(a ^ b) == 64)
  }

  test("resample robustness: the same program at 16 kHz hashes identically") {
    // the analysis bands are ABSOLUTE in Hz, so material occupying the
    // same bands hashes identically regardless of the recording's
    // sample rate — synthesize the same level table at 16 kHz / 2048-
    // sample frames (tones at that grid's own exact bins)
    val sr2 = 16000
    val f2 = 2048
    val x = new Array[Double](8 * f2)
    for (t <- 0 until 8; i <- 0 until f2) {
      var s = 0.0
      for (b <- 0 until 9)
        s += levels(patterns(t)(b)) *
          math.sin(2.0 * math.Pi * bandBinAt(b, sr2, f2) * i / f2)
      x(t * f2 + i) = s
    }
    val got = AudioFingerprint.spectralHash64(wav(x, sr2, 16))
    assert(got.contains(expectedHash(patterns)))
  }

  test("non-WAV, float-format, too-short and band-starved payloads hash to None") {
    assert(AudioFingerprint.spectralHash64(null).isEmpty)
    assert(AudioFingerprint.spectralHash64("not audio".getBytes).isEmpty)
    // shorter than 8 × 128 samples
    assert(AudioFingerprint.spectralHash64(
      wav(new Array[Double](512), sr, 16)).isEmpty)
    // 600 Hz sample rate: Nyquist headroom 270 Hz < the 300 Hz band floor
    assert(AudioFingerprint.spectralHash64(
      wav(new Array[Double](nSamples), 600, 16)).isEmpty)
  }

  test("pcmMono: an ID3v2 tag prefix is skipped (synchsafe size), then the real container parses") {
    val body = wav(samples(1.0), sr, 16)
    // 300-byte tag payload: synchsafe 300 = (2 << 7) | 44
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 2, 44) ++
      Array.fill[Byte](300)(0x41)
    val base = AudioFingerprint.spectralHash64(body)
    assert(AudioFingerprint.spectralHash64(id3 ++ body) == base && base.nonEmpty)
    // a tag that swallows the whole file → None, no wrap
    assert(AudioFingerprint.pcmMono(id3.take(10)).isEmpty)
  }

  test("pcmMono: hostile chunk sizes end the walk, never wrap or crash") {
    val good = wav(samples(1.0), sr, 16)
    // lie in the fmt chunk's declared size: 0xFFFFFFFF pushes the next
    // offset past the file — the walk must stop (no fmt+data → None)
    val lied = good.clone()
    // fmt size field sits at offset 16 (RIFF(12) + "fmt "(4))
    lied(16) = -1; lied(17) = -1; lied(18) = -1; lied(19) = -1
    assert(AudioFingerprint.pcmMono(lied).isEmpty)
    // truncated mid-header and mid-data payloads return what exists
    assert(AudioFingerprint.pcmMono(good.take(20)).isEmpty)
    val half = AudioFingerprint.pcmMono(good.take(good.length / 2))
    assert(half.forall(_._1.length < samples(1.0).length))
    // a data chunk before fmt-less EOF: no fmt → None
    val noFmt = good.take(12) ++ good.drop(12 + 8 + 16) // excise fmt
    assert(AudioFingerprint.pcmMono(noFmt).isEmpty)
  }

  test("pcmMono: 16-bit samples round-trip within quantization") {
    val x = Array.tabulate(256)(i => math.sin(i / 10.0) * 0.8)
    val (got, rate) = AudioFingerprint.pcmMono(wav(x, 44100, 16)).get
    assert(rate == 44100 && got.length == x.length)
    assert(x.indices.forall(i => math.abs(got(i) - x(i)) < 1e-3))
  }

  // ---- windowed sub-fingerprints (excerpt robustness) ----------------

  /** One-second blocks, each with its own stationary level pattern;
    * tones are GLOBAL-phase sines at exact bins (bin_b cycles per
    * 1024 samples), so every 1024-sample frame inside a block sees the
    * exact-bin spectrum regardless of where the frame starts.
    */
  private def blockClip(pats: Seq[Seq[Int]], gain: Double = 1.0): Array[Double] = {
    val x = new Array[Double](pats.length * sr)
    for (j <- pats.indices; i <- 0 until sr) {
      var s = 0.0
      for (b <- 0 until 9)
        s += levels(pats(j)(b)) *
          math.sin(2.0 * math.Pi * bandBin(b) * (j.toLong * sr + i) / F)
      x(j * sr + i) = s * gain
    }
    x
  }

  /** Expected hash of a 2 s window spanning blocks (pa, pb): segments
    * 0–3 sit in pa's second, 4–7 in pb's (window = 16000 samples at
    * 8 kHz, segment = 2000, one 1024-sample frame each).
    */
  private def windowHash(pa: Seq[Int], pb: Seq[Int]): Long = {
    var h = 0L
    for (t <- 0 until 8; b <- 0 until 8) {
      val p = if (t < 4) pa else pb
      h = (h << 1) | (if (p(b) < p(b + 1)) 1L else 0L)
    }
    h
  }

  test("windowHashes: every 2s window's bits read off the two blocks it spans") {
    val pats = patterns.take(6) // 6 s clip → 5 windows at 1 s hop
    val got = AudioFingerprint.windowHashes(wav(blockClip(pats), sr, 16)).get
    val want = (0 until 5).map(k => windowHash(pats(k), pats(k + 1)))
    assert(got == want, s"got ${got.map(_.toHexString)} want ${want.map(_.toHexString)}")
    assert(got.distinct.length == 5, "window hashes must be distinct here")
  }

  test("windowHashes: a clip shorter than one window falls back to the whole-clip hash") {
    val short = samples(1.0) // 8192 samples < 16000
    val viaWindows = AudioFingerprint.windowHashes(wav(short, sr, 16)).get
    val whole = AudioFingerprint.spectralHash64(wav(short, sr, 16)).get
    assert(viaWindows == Seq(whole))
  }

  test("excerpt matching: a hop-aligned cut reaches full coverage; whole-clip hashing cannot see it") {
    val pats = patterns.take(6)
    val full = blockClip(pats)
    val excerpt = full.slice(2 * sr, 5 * sr) // blocks 2..4, cut on hops
    // the excerpt's windows ARE original windows 2 and 3 — exact
    assert(AudioFingerprint.windowHashes(wav(excerpt, sr, 16)).get ==
      Seq(windowHash(pats(2), pats(3)), windowHash(pats(3), pats(4))))
    val comp = patterns.map(_.map(2 - _)).take(6)
    val df = Seq(
      (0L, wav(full, sr, 16)),
      (1L, wav(excerpt, sr, 16)),
      (2L, wav(blockClip(comp), sr, 16)), // different recording
      (3L, "junk".getBytes)
    ).toDF("audio_id", "content")
    val pairs = AudioFingerprint.nearDuplicateAudioExcerpts(
      df, "audio_id", "content")
    val got = pairs.select("id_a", "id_b", "n_windows_a", "n_windows_b",
        "matched_a", "matched_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    pairs.unpersist()
    assert(got == Set((0L, 1L, 5L, 2L, 2L, 2L)))
    // the alignment-sensitive whole-clip hashes of full vs excerpt
    // differ — the reason the windowed face exists
    assert(AudioFingerprint.spectralHash64(wav(full, sr, 16)) !=
      AudioFingerprint.spectralHash64(wav(excerpt, sr, 16)))
  }

  test("excerpt index: an excerpt of an indexed recording drops; new content survives") {
    val pats = patterns.take(6)
    val index = AudioFingerprint.buildAudioWindowIndex(
      Seq((100L, wav(blockClip(pats), sr, 16))).toDF("audio_id", "content"),
      "audio_id", "content")
    val comp = patterns.map(_.map(2 - _)).take(6)
    val batch = Seq(
      (0L, wav(blockClip(pats).slice(2 * sr, 5 * sr), sr, 16)), // excerpt
      (1L, wav(blockClip(comp), sr, 16)),                        // new
      (2L, Array[Byte](9, 9, 9))                                 // junk
    ).toDF("audio_id", "content")
    val kept = AudioFingerprint.dropNearDuplicateAudioExcerpts(batch, index,
        "audio_id", "content")
      .select("audio_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("nearDuplicateAudio: copies pair up, the complement and broken bytes do not") {
    val comp = patterns.map(_.map(2 - _))
    val df = Seq(
      (0L, wav(samples(1.0), sr, 16)),
      (1L, wav(samples(0.25), sr, 16)),     // gain copy
      (2L, wav(samples(1.0), sr, 8)),       // requantized copy
      (3L, wav(samples(1.0, comp), sr, 16)), // different recording
      (4L, "junk".getBytes)                  // undecodable
    ).toDF("audio_id", "content")
    val pairs = AudioFingerprint.nearDuplicateAudio(df, "audio_id", "content",
        maxHamming = 4)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((0L, 1L, 0), (0L, 2L, 0), (1L, 2L, 0)))
  }

  test("curateAudio: validate → exact → perceptual → index, metrics per stage") {
    val comp = patterns.map(_.map(2 - _))
    val base = wav(samples(1.0), sr, 16)
    val batch = Seq(
      (0L, base),
      (1L, base.clone()),               // byte copy → exact stage
      (2L, wav(samples(0.25), sr, 16)), // gain copy → perceptual stage
      (3L, wav(samples(1.0, comp), sr, 16)),
      (4L, "junk".getBytes)             // unfingerprint-able → validate
    ).toDF("audio_id", "content")
    val r = MediaPipeline.curateAudio(batch,
      MediaPipeline.Config("audio_id", "content"))
    assert(r.kept.select("audio_id").as[Long].collect().toSet == Set(0L, 3L))
    assert(r.metrics == Seq("n_received" -> 5L, "n_valid" -> 4L,
      "n_exact_kept" -> 3L, "n_near_kept" -> 2L, "n_final" -> 2L))
    // seen index holding the complement removes it at the final stage
    val idx = AudioFingerprint.buildAudioIndex(
      Seq((100L, wav(samples(1.0, comp), sr, 16)))
        .toDF("audio_id", "content"), "audio_id", "content")
    val r2 = MediaPipeline.curateAudio(batch,
      MediaPipeline.Config("audio_id", "content"), Some(idx))
    assert(r2.kept.select("audio_id").as[Long].collect().toSet == Set(0L))
    assert(r2.metrics.last == ("n_final" -> 1L))
  }

  test("curateAudio statsGate: silent clips exit at the signal stage, one decode pays both") {
    val comp = patterns.map(_.map(2 - _))
    val base = wav(samples(1.0), sr, 16)
    // 8 s of digital silence: fingerprints fine (hash of zero bands)?
    // no — silence has no decisive band energies but DOES decode, so
    // it passes validation; only the stats gate can drop it
    val silent = wav(new Array[Double](8 * 1024 * 2), sr, 16)
    val batch = Seq(
      (0L, base),
      (1L, silent),
      (2L, wav(samples(1.0, comp), sr, 16)),
      (3L, "junk".getBytes)
    ).toDF("audio_id", "content")
    val r = MediaPipeline.curateAudio(batch,
      MediaPipeline.Config("audio_id", "content"),
      statsGate = Some(AudioStats.Gate()))
    assert(r.kept.select("audio_id").as[Long].collect().toSet ==
      Set(0L, 2L))
    assert(r.metrics == Seq("n_received" -> 4L, "n_valid" -> 3L,
      "n_signal" -> 2L, "n_exact_kept" -> 2L, "n_near_kept" -> 2L,
      "n_final" -> 2L))
    // without the gate, metrics keep their original five-entry shape
    val r0 = MediaPipeline.curateAudio(batch,
      MediaPipeline.Config("audio_id", "content"))
    assert(r0.metrics.map(_._1) == Seq("n_received", "n_valid",
      "n_exact_kept", "n_near_kept", "n_final"))
  }

  test("dropNearDuplicateAudio: seen copies drop, new recordings and undecodables survive") {
    val comp = patterns.map(_.map(2 - _))
    val index = AudioFingerprint.buildAudioIndex(
      Seq((100L, wav(samples(1.0), sr, 16))).toDF("audio_id", "content"),
      "audio_id", "content")
    val batch = Seq(
      (0L, wav(samples(0.25), sr, 16)),      // copy of the indexed clip
      (1L, wav(samples(1.0, comp), sr, 16)), // new recording
      (2L, Array[Byte](1, 2, 3))             // undecodable: must survive
    ).toDF("audio_id", "content")
    val kept = AudioFingerprint.dropNearDuplicateAudio(batch, index,
        "audio_id", "content", maxHamming = 4)
      .select("audio_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }
}
