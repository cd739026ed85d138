package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signal-level audio curation statistics — the quality gate a speech/
  * audio corpus needs BEFORE any content fingerprinting: a clip that
  * is silence, wall-to-wall clipping, or a near-empty sliver carries
  * no training signal, and at 100 TB the drop must be decided from
  * one cheap pass over samples the fingerprint pipeline decodes
  * anyway. Rides [[AudioFingerprint.pcmMono]], so every container the
  * fingerprint understands (WAV int/float/extensible, FLAC, Ogg-FLAC,
  * ID3-prefixed) measures identically.
  *
  * Definitions (all plain sample math — no psychoacoustic model, so
  * every value is derivable by hand for a constructed fixture):
  *
  *  - `peak` = max |x|; `peak_db` = 20·log10(peak), floored at
  *    [[FloorDb]] (silence has no finite dB);
  *  - `rms_db` = 20·log10(sqrt(mean x²)), same floor — the plain
  *    power loudness (LUFS-style gating would need the ITU K-filter,
  *    a modeling choice this deliberately is not);
  *  - `clip_ratio` = fraction of samples with |x| ≥ [[ClipLevel]]
  *    (digital full scale minus headroom — a hard-clipped recording
  *    parks a large fraction of its samples there);
  *  - `silence_ratio` = fraction with |x| < [[SilenceLevel]]
  *    (−60 dBFS, the conventional silence gate);
  *  - `duration_ms` = samples · 1000 / rate.
  *
  * Scale shape: one map over audio bytes (the decode IS the bill,
  * shared with fingerprinting); output is a handful of doubles per
  * clip — filters on them are codegen'd column predicates.
  */
object AudioStats {

  /** dB floor reported for silent signals (20·log10(0) = −∞). */
  val FloorDb: Double = -120.0

  /** |x| at or above this counts as clipped: 127/128 exactly — the
    * POSITIVE full-scale rail of the coarsest supported depth
    * (8-bit), since [[AudioFingerprint.pcmMono]] scales +full-scale
    * to (2^(bits−1)−1)/2^(bits−1). A higher cutoff (e.g. 0.999) would
    * silently miss positive-rail clipping in 8-bit audio entirely.
    * ≈ −0.068 dBFS.
    */
  val ClipLevel: Double = 127.0 / 128.0

  /** |x| below this counts as silence (−60 dBFS). */
  val SilenceLevel: Double = 0.001

  final case class Stats(
      nSamples: Long, sampleRateHz: Int, durationMs: Long,
      peakDb: Double, rmsDb: Double,
      clipRatio: Double, silenceRatio: Double)

  private def db(v: Double): Double =
    if (v <= 0.0) FloorDb else math.max(FloorDb, 20.0 * math.log10(v))

  /** Stats for one payload; None when undecodable or empty. */
  def stats(bytes: Array[Byte]): Option[Stats] = {
    val decoded = AudioFingerprint.pcmMono(bytes)
    if (decoded.isEmpty) return None
    val (x, sr) = decoded.get
    if (x.length == 0 || sr <= 0) return None
    var peak = 0.0
    var sumSq = 0.0
    var clipped = 0L
    var silent = 0L
    var i = 0
    while (i < x.length) {
      val a = math.abs(x(i))
      if (a > peak) peak = a
      sumSq += x(i) * x(i)
      if (a >= ClipLevel) clipped += 1
      if (a < SilenceLevel) silent += 1
      i += 1
    }
    val n = x.length.toLong
    Some(Stats(n, sr, n * 1000L / sr,
      db(peak), db(math.sqrt(sumSq / n)),
      clipped.toDouble / n, silent.toDouble / n))
  }

  /** The degenerate-clip gate thresholds, the composed-pipeline form
    * (see [[dropDegenerateAudio]] for the standalone face).
    */
  final case class Gate(minDurationMs: Long = 200,
                        maxSilenceRatio: Double = 0.95,
                        maxClipRatio: Double = 0.1,
                        minRmsDb: Double = -50.0)

  /** Stats + the whole-clip spectral hash off ONE pcm decode — the
    * composed pipeline ([[MediaPipeline.curateAudio]] with a stats
    * gate) must not pay the decode twice. The hash is None when the
    * clip is too short / the rate cannot cover the analysis band
    * (the [[AudioFingerprint.spectralHash64]] contract); stats still
    * report for it.
    */
  def statsAndHash(bytes: Array[Byte]): Option[(Stats, Option[Long])] = {
    val decoded = AudioFingerprint.pcmMono(bytes)
    if (decoded.isEmpty) return None
    val (x, sr) = decoded.get
    if (x.length == 0 || sr <= 0) return None
    // the stats() loop inlined over THIS decode — calling stats(bytes)
    // would pay pcmMono a second time
    var peak = 0.0
    var sumSq = 0.0
    var clipped = 0L
    var silent = 0L
    var i = 0
    while (i < x.length) {
      val a = math.abs(x(i))
      if (a > peak) peak = a
      sumSq += x(i) * x(i)
      if (a >= ClipLevel) clipped += 1
      if (a < SilenceLevel) silent += 1
      i += 1
    }
    val n = x.length.toLong
    Some((Stats(n, sr, n * 1000L / sr,
      db(peak), db(math.sqrt(sumSq / n)),
      clipped.toDouble / n, silent.toDouble / n),
      AudioFingerprint.hashRange(x, 0, x.length, sr)))
  }

  private val statsUdf = udf { (bytes: Array[Byte]) =>
    stats(bytes).map(s => (s.nSamples, s.sampleRateHz, s.durationMs,
      s.peakDb, s.rmsDb, s.clipRatio, s.silenceRatio))
  }

  /** Stats as a struct column `(n_samples, rate, duration_ms,
    * peak_db, rms_db, clip_ratio, silence_ratio)`; NULL when
    * undecodable (callers decide drop-vs-report).
    */
  def statsCol(bytesCol: Column): Column = statsUdf(bytesCol)

  /** Drop clips with no usable signal: shorter than `minDurationMs`,
    * more silence than `maxSilenceRatio`, more clipping than
    * `maxClipRatio`, or quieter than `minRmsDb`. Undecodable clips
    * DROP here (unlike the dedup faces — a quality gate that passes
    * what it cannot measure is not a gate); route them to a
    * dead-letter report first if they must be kept.
    */
  def dropDegenerateAudio(df: DataFrame, bytesCol: String,
                          minDurationMs: Long = 200,
                          maxSilenceRatio: Double = 0.95,
                          maxClipRatio: Double = 0.1,
                          minRmsDb: Double = -50.0): DataFrame = {
    require(!df.columns.contains("__graft_astats"),
      "input already has a reserved '__graft_astats' column")
    df.withColumn("__graft_astats", statsCol(col(bytesCol)))
      .filter(col("__graft_astats").isNotNull &&
        col("__graft_astats._3") >= minDurationMs &&
        col("__graft_astats._7") <= maxSilenceRatio &&
        col("__graft_astats._6") <= maxClipRatio &&
        col("__graft_astats._5") >= minRmsDb)
      .drop("__graft_astats")
  }
}
