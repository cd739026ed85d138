package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual AUDIO fingerprinting — a 64-bit spectral band-energy
  * hash in the spirit of the Philips robust hash (Haitsma & Kalker
  * 2002, "A Highly Robust Audio Fingerprinting System"), shaped like
  * [[ImageHash]]'s dHash so the whole banded near-dup / persisted
  * index machinery applies unchanged to audio payloads: re-encoded
  * (requantized), gain-scaled or channel-mixed copies of the same
  * recording land within a few Hamming bits of each other, which
  * byte-digest dedup can never see.
  *
  * Pipeline per clip: WAV PCM decode (the container [[
  * graft.engine.validate.AudioProbe]] header-probes; integer PCM at
  * 8/16/24/32 bits, any channel count — channels average to mono) →
  * split into [[TimeSegments]] equal time segments → per segment, a
  * power spectrum summed over non-overlapping RECTANGULAR frames of
  * the largest power-of-two length ≤ the segment (rectangular, not
  * Hann: a tone at an exact FFT bin then lands in exactly one bin,
  * which makes fixture hashes hand-derivable; leakage on non-bin
  * content spreads energy smoothly and costs nothing for hashing) →
  * [[Bands]] log-spaced frequency bands over 300–3000 Hz (the
  * telephone band, per the Philips paper — present at every common
  * sample rate) → one bit per adjacent band pair, `E(t,b) < E(t,b+1)`
  * (the dHash convention), packed segment-major MSB-first into
  * 8 segments × 8 comparisons = 64 bits.
  *
  * Invariances (spec-pinned): a uniform gain scales every band energy
  * by the same factor, so every comparison — and the hash — is
  * untouched; requantizing to a different bit depth adds a noise
  * floor orders below any decisive energy gap. Band energies below
  * `1e-12 ×` the segment's maximum snap to exactly 0 first (the
  * [[ImageHash.phash64]] stance): a silent band's FFT residue is fp
  * noise, and without the snap noise-vs-noise comparisons would turn
  * into pseudorandom bits. The snap is RELATIVE, preserving the gain
  * invariance.
  *
  * Scale shape: hashing is a pure map over audio bytes (the PCM
  * decode + one FFT pass over the clip IS the bill); everything
  * downstream shuffles 8-byte hashes, never samples —
  * [[nearDuplicateAudio]] and the [[buildAudioIndex]] /
  * [[dropNearDuplicateAudio]] incremental pair reuse the banded
  * pigeonhole join of [[ImageHash]].
  */
object AudioFingerprint {

  /** Time segments (hash rows) and frequency bands (giving
    * `Bands - 1 = 8` comparisons per segment).
    */
  val TimeSegments = 8
  val Bands = 9

  /** Band edges in Hz: `Bands` log-spaced intervals over the Philips
    * 300–3000 Hz range, clamped to what the clip's sample rate can
    * represent (Nyquist × 0.9 headroom). Public: fixture authors need
    * the exact edges to place in-band tones.
    */
  def bandEdges(sampleRate: Int): Option[Array[Double]] = {
    val fLo = 300.0
    val fHi = math.min(3000.0, sampleRate * 0.45)
    if (fHi <= fLo) return None
    Some(Array.tabulate(Bands + 1)(b =>
      fLo * math.pow(fHi / fLo, b.toDouble / Bands)))
  }

  /** Mono samples in [-1, 1] + sample rate from one RIFF/WAVE payload:
    * integer PCM (format 1; 8-bit unsigned, 16/24/32-bit signed
    * little-endian), IEEE float (format 3; 32/64-bit), or
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE — the real format code lives in
    * the first two SubFormat GUID bytes) wrapping either — or a FLAC
    * stream, native OR Ogg-encapsulated ([[OggFlac]], `.oga`),
    * decoded losslessly by [[FlacDecode]] (a FLAC re-encode of the
    * same recording therefore hashes IDENTICALLY to its WAV, in
    * either container).
    * Channels average to mono. None on any other container or codec,
    * and None on a structurally corrupt FLAC (the fingerprint column
    * contract is NULL-for-undecodable; [[FlacDecode.decode]] itself
    * stays fail-loud for decoder consumers).
    */
  def pcmMono(bytes: Array[Byte]): Option[(Array[Double], Int)] = {
    if (bytes == null || bytes.length < 12) return None
    // files in the wild often lead with an ID3v2 tag (10-byte header,
    // 28-bit synchsafe size) before the real container magic — skip it
    if (bytes.length > 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val skip = 10L + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
      return if (skip >= bytes.length) None
      else pcmMono(java.util.Arrays.copyOfRange(
        bytes, skip.toInt, bytes.length))
    }
    if (FlacDecode.isFlac(bytes))
      return scala.util.Try(FlacDecode.decode(bytes)).toOption.flatten
        .map(a => (a.mono, a.sampleRateHz))
    // Ogg-FLAC (.oga): the page layer unwraps to the same frames, so
    // a re-containerized FLAC hashes identically to its native form
    if (OggFlac.isOgg(bytes))
      return scala.util.Try(OggFlac.decode(bytes)).toOption.flatten
        .map(a => (a.mono, a.sampleRateHz))
    def tag(off: Int) =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int) = (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // the AudioProbe chunk-walk stance: Long offsets, hostile sizes
    // end the walk by exceeding the length, never wrap
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None          // start, length
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val o = off.toInt
      val id = tag(o)
      val declared = u32(o + 4)
      val start = o + 8
      val avail = math.min(declared, (bytes.length - start).toLong)
      if (id == "fmt " && fmt.isEmpty && avail >= 16) {
        // WAVE_FORMAT_EXTENSIBLE: the real code is the SubFormat
        // GUID's leading two bytes (fmt is 40 bytes: cbSize at +16,
        // valid bits, channel mask, then the GUID at +24)
        val raw = u16(start)
        val format =
          if (raw == 0xFFFE && avail >= 26) u16(start + 24) else raw
        fmt = Some((format, u16(start + 2), u32(start + 4).toInt,
          u16(start + 14)))
      } else if (id == "data" && data.isEmpty) {
        data = Some((start, avail.toInt))
      }
      off += 8L + declared + (declared & 1L)
    }
    for {
      (format, channels, rate, bits) <- fmt
      (dStart, dLen) <- data
      if channels >= 1 && rate >= 1 &&
        ((format == 1 && Set(8, 16, 24, 32).contains(bits)) ||
          (format == 3 && Set(32, 64).contains(bits)))
    } yield {
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * channels
      val nFrames = dLen / frameBytes
      val out = new Array[Double](nFrames)
      val scale = (1L << (bits - 1)).toDouble // 128, 32768, 2^23, 2^31
      var i = 0
      while (i < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val p = dStart + i * frameBytes + c * bytesPerSample
          if (format == 3) {
            // IEEE float samples are already in [-1, 1]
            acc +=
              (if (bits == 32)
                java.lang.Float.intBitsToFloat((
                  (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
                    ((bytes(p + 2) & 0xff) << 16) |
                    ((bytes(p + 3) & 0xff) << 24)).toInt).toDouble
              else
                java.lang.Double.longBitsToDouble(
                  (0 until 8).map(j =>
                    (bytes(p + j) & 0xffL) << (8 * j)).reduce(_ | _)))
          } else {
            // 8-bit WAV is UNSIGNED centered at 128; wider widths are
            // signed little-endian (top byte sign-extends via the
            // plain `.toLong` shift)
            val v: Long = bits match {
              case 8 => (bytes(p) & 0xffL) - 128L
              case 16 => ((bytes(p) & 0xffL) |
                (bytes(p + 1).toLong << 8)).toShort.toLong
              case 24 => (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
                (bytes(p + 2).toLong << 16)
              case _ => (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
                ((bytes(p + 2) & 0xffL) << 16) | (bytes(p + 3).toLong << 24)
            }
            acc += v.toDouble / scale
          }
          c += 1
        }
        out(i) = acc / channels
        i += 1
      }
      (out, rate)
    }
  }

  /** In-place iterative radix-2 FFT (Cooley–Tukey, the textbook
    * public algorithm). `re.length` must be a power of two.
    */
  private[multimodal] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2: $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Largest power of two ≤ `x` (x ≥ 1). */
  private def pow2Floor(x: Int): Int =
    java.lang.Integer.highestOneBit(x)

  /** Minimum samples per segment for a usable spectrum. */
  private val MinFrame = 128

  /** 64-bit spectral band-energy hash of one WAV payload; None when
    * the payload is not PCM WAV, is shorter than
    * `TimeSegments × 128` samples, or its sample rate cannot cover
    * the analysis band.
    */
  def spectralHash64(bytes: Array[Byte]): Option[Long] = {
    val decoded = pcmMono(bytes)
    if (decoded.isEmpty) return None
    val (x, sr) = decoded.get
    hashRange(x, 0, x.length, sr)
  }

  /** The hash kernel over a sample range — shared by the whole-clip
    * hash, the windowed sub-fingerprints, and [[AudioStats]]'s
    * one-decode stats+hash kernel.
    */
  private[multimodal] def hashRange(x: Array[Double], from: Int,
                                    until: Int, sr: Int): Option[Long] = {
    val edges = bandEdges(sr).getOrElse(return None)
    val len = until - from
    if (len < TimeSegments * MinFrame) return None
    var hash = 0L
    var t = 0
    while (t < TimeSegments) {
      val s0 = from + (t.toLong * len / TimeSegments).toInt
      val s1 = from + ((t + 1).toLong * len / TimeSegments).toInt
      val f = math.min(4096, pow2Floor(s1 - s0))
      val half = f / 2
      val power = new Array[Double](half)
      var fs = s0
      while (fs + f <= s1) {
        val re = java.util.Arrays.copyOfRange(x, fs, fs + f)
        val im = new Array[Double](f)
        fft(re, im)
        var k = 0
        while (k < half) {
          power(k) += re(k) * re(k) + im(k) * im(k)
          k += 1
        }
        fs += f
      }
      val binHz = sr.toDouble / f
      val e = new Array[Double](Bands)
      var b = 0
      while (b < Bands) {
        var k = math.max(1, math.ceil(edges(b) / binHz).toInt)
        val kEnd = math.min(half - 1, math.floor(edges(b + 1) / binHz).toInt)
        while (k <= kEnd) { e(b) += power(k); k += 1 }
        b += 1
      }
      // relative snap: silent bands are fp residue, not signal
      var eMax = 0.0
      b = 0
      while (b < Bands) { if (e(b) > eMax) eMax = e(b); b += 1 }
      b = 0
      while (b < Bands) { if (e(b) < 1e-12 * eMax) e(b) = 0.0; b += 1 }
      b = 0
      while (b < Bands - 1) {
        hash = (hash << 1) | (if (e(b) < e(b + 1)) 1L else 0L)
        b += 1
      }
      t += 1
    }
    Some(hash)
  }

  /** Windowed sub-fingerprints — the trim/excerpt-robust face. The
    * whole-clip hash's 8-segment grid is ALIGNMENT-SENSITIVE: cutting
    * ten seconds off the front shifts every segment boundary and
    * changes the hash. Sub-fingerprints hash consecutive FIXED-length
    * windows (`windowSeconds`, hop = half a window), so the clip's
    * signature is a SET of hashes and an excerpt shares the windows of
    * the span it kept: a cut at a hop multiple reproduces interior
    * window hashes EXACTLY; an arbitrary cut shifts windows by at most
    * half a hop, which locally-stationary audio and the Hamming budget
    * absorb. Matching composes through [[SetSignature]] exactly like
    * video frame hashes.
    *
    * Clips shorter than one window fall back to a single whole-clip
    * hash, so short content stays matchable. None when the payload is
    * not PCM WAV or cannot hash at all.
    */
  def windowHashes(bytes: Array[Byte],
                   windowSeconds: Double = 2.0): Option[Seq[Long]] = {
    require(windowSeconds > 0, s"windowSeconds must be positive: $windowSeconds")
    val decoded = pcmMono(bytes)
    if (decoded.isEmpty) return None
    val (x, sr) = decoded.get
    val w = math.max(TimeSegments * MinFrame, (windowSeconds * sr).toInt)
    val hop = w / 2
    if (x.length < w)
      return hashRange(x, 0, x.length, sr).map(Seq(_))
    val out = Seq.newBuilder[Long]
    var off = 0
    while (off + w <= x.length) {
      hashRange(x, off, off + w, sr).foreach(out += _)
      off += hop
    }
    val hs = out.result()
    if (hs.isEmpty) None else Some(hs)
  }

  private def windowSigUdf(windowSeconds: Double) = udf { (bytes: Array[Byte]) =>
    windowHashes(bytes, windowSeconds).map(_.toArray).orNull
  }

  /** Window-hash signature as an `array<bigint>` column (NULL when
    * undecodable).
    */
  def windowSignature(bytesCol: Column,
                      windowSeconds: Double = 2.0): Column =
    windowSigUdf(windowSeconds)(bytesCol)

  /** Excerpt-robust near-dup pairs over window signatures:
    * `(id_a, id_b, n_windows_a, n_windows_b, matched_a, matched_b)`
    * for pairs where the better-covered side reaches `minMatchFrac` —
    * an excerpt reaches frac 1 on its own side ([[SetSignature]]
    * containment semantics). Returned frame is persisted +
    * materialized; callers may `unpersist()`.
    */
  def nearDuplicateAudioExcerpts(df: DataFrame, idCol: String,
                                 bytesCol: String,
                                 maxHamming: Int = 4,
                                 minMatchFrac: Double = 0.5,
                                 windowSeconds: Double = 2.0,
                                 maxBucket: Int = 1 << 12): DataFrame =
    SetSignature.nearDuplicatesBySignature(
      df.select(col(idCol).as("__sid"),
        explode(windowSignature(col(bytesCol), windowSeconds)).as("__sh")),
      "__sid", "__sh", maxHamming, minMatchFrac, maxBucket,
      outNames = Seq("id_a", "id_b", "n_windows_a", "n_windows_b",
        "matched_a", "matched_b"))

  /** Persisted window-signature index — `(audio_id, whash)` rows, the
    * excerpt-matchable analogue of [[buildAudioIndex]].
    */
  def buildAudioWindowIndex(df: DataFrame, idCol: String, bytesCol: String,
                            windowSeconds: Double = 2.0): DataFrame =
    df.select(col(idCol).as("audio_id"),
        explode(windowSignature(col(bytesCol), windowSeconds)).as("whash"))
      .distinct()

  /** Incremental excerpt dedup against a [[buildAudioWindowIndex]]
    * frame: batch clips covered at `minMatchFrac` drop (an excerpt of
    * an indexed recording drops even though the whole-clip hash never
    * would); clips with no signature survive.
    */
  def dropNearDuplicateAudioExcerpts(batch: DataFrame, index: DataFrame,
                                     idCol: String, bytesCol: String,
                                     maxHamming: Int = 4,
                                     minMatchFrac: Double = 0.5,
                                     windowSeconds: Double = 2.0,
                                     maxBucket: Int = 1 << 12): DataFrame = {
    require(index.columns.toSeq.contains("audio_id") &&
      index.columns.toSeq.contains("whash"),
      "index must be a buildAudioWindowIndex frame with (audio_id, whash)")
    val covered = SetSignature.coveredIds(
      batch.select(col(idCol).as("__sid"),
        explode(windowSignature(col(bytesCol), windowSeconds)).as("__sh")),
      index, "__sid", "__sh", "whash", maxHamming, minMatchFrac, maxBucket)
    batch.join(covered, col(idCol) === col("__covered_id"), "left_anti")
  }

  private val hashUdf = udf { (bytes: Array[Byte]) =>
    spectralHash64(bytes).map(java.lang.Long.valueOf).orNull
  }

  /** Spectral hash as a column over binary WAV content (NULL when
    * undecodable or too short — callers decide drop-vs-report).
    */
  def spectralHash(bytesCol: Column): Column = hashUdf(bytesCol)

  /** Near-duplicate audio pairs `(id_a, id_b, hamming)` — hash the
    * binary column, then the banded Hamming join shared with images
    * ([[ImageHash.nearDuplicatesByHash]]). Undecodable clips drop out.
    */
  def nearDuplicateAudio(df: DataFrame, idCol: String, bytesCol: String,
                         maxHamming: Int = 4): DataFrame = {
    val hashed = df
      .select(col(idCol).as("audio_id"),
        spectralHash(col(bytesCol)).as("ahash"))
      .filter(col("ahash").isNotNull)
    ImageHash.nearDuplicatesByHash(hashed, "audio_id", "ahash", maxHamming)
  }

  /** Persisted audio signature index — `(audio_id, ahash)`, the audio
    * face of [[ImageHash.buildImageIndex]]: build once, append per
    * batch, probe without re-decoding seen samples.
    */
  def buildAudioIndex(df: DataFrame, idCol: String, bytesCol: String)
  : DataFrame =
    df.select(col(idCol).as("audio_id"),
        spectralHash(col(bytesCol)).as("ahash"))
      .filter(col("ahash").isNotNull)

  /** Incremental audio dedup against a [[buildAudioIndex]] frame:
    * drop batch clips within `maxHamming` bits of ANY index entry;
    * undecodable clips survive (nothing to match them by).
    */
  def dropNearDuplicateAudio(batch: DataFrame, index: DataFrame,
                             idCol: String, bytesCol: String,
                             maxHamming: Int = 4,
                             maxBucket: Int = 1 << 12): DataFrame = {
    require(index.columns.toSeq.contains("audio_id") &&
      index.columns.toSeq.contains("ahash"),
      "index must be a buildAudioIndex frame with (audio_id, ahash)")
    val hashed = batch.withColumn("__graft_ah",
      spectralHash(col(bytesCol)))
    ImageHash.dropNearDuplicatesByHash(hashed, index, idCol,
        "__graft_ah", "ahash", maxHamming, maxBucket)
      .drop("__graft_ah")
  }
}
