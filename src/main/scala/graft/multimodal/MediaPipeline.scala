package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints.Truncatable

/** The composed image-corpus curation program — the media face of
  * [[graft.ops.CurationPipeline]]: validate → exact dedup →
  * perceptual near-dup → (optional) dedup against the seen-corpus
  * index, one call, with per-stage metrics. Each stage's survivor
  * frame is checkpoint-truncated before the next ([[graft.ops
  * .Checkpoints]]): every stage re-derives from a MATERIALIZED
  * snapshot, so the ImageIO decode UDFs run once per stage, not once
  * per downstream subtree.
  *
  * Stage order is deliberate and cheapest-first:
  *  1. VALIDATE — decode the header ([[graft.engine.validate
  *     .ImageProbe]]): undecodable payloads and images under the
  *     minimum dimensions drop (crawls are full of 1×1 trackers);
  *  2. EXACT dedup — sha-256 over the bytes, smallest id per digest
  *     survives (byte-identical copies never reach the perceptual
  *     join);
  *  3. PERCEPTUAL near-dup — dHash + the banded Hamming join
  *     ([[ImageHash.nearDuplicatesByHash]]); within each matched pair
  *     the larger id drops (greedy, pair-local — the
  *     [[graft.ops.Dedup.dropNearDuplicates]] default, transitive
  *     closure deliberately NOT applied to images: chains of
  *     borderline-similar photos are usually distinct shots);
  *  4. SEEN-INDEX dedup — [[ImageHash.dropNearDuplicateImages]]
  *     against a persisted [[ImageHash.buildImageIndex]] frame, when
  *     one is supplied.
  *
  * Scale shape: stages 2–4 shuffle digests and 8-byte hashes only;
  * stage 1 is the one full-payload pass (the decode bill). Metrics
  * are stage-level counts (one count per materialized snapshot).
  */
object MediaPipeline {

  final case class Config(
      idCol: String,
      bytesCol: String,
      minWidth: Int = 8,
      minHeight: Int = 8,
      maxHamming: Int = 4,
      maxBucket: Int = 1 << 12)

  final case class Result(kept: DataFrame, metrics: Seq[(String, Long)])

  def curateImages(df: DataFrame, cfg: Config,
                   seenIndex: Option[DataFrame] = None,
                   statsGate: Option[ImageStats.Gate] = None): Result = {
    require(cfg.minWidth >= 1 && cfg.minHeight >= 1,
      s"minimum dimensions must be positive: ${cfg.minWidth}x${cfg.minHeight}")
    val id = col(cfg.idCol)
    val nReceived = df.count()

    // 1. validate (+ optional signal gate). Without a gate the stage
    // is a header-only probe (no pixel decode); with one, the decode
    // is paid ONCE for stats + hash ([[ImageStats.statsAndHash]], the
    // curateAudio shape) and the hash carried through — stages 3/4
    // must never re-decode a pixel.
    val (probed, nValid, signalMetric) = statsGate match {
      case None =>
        val dims = udf { (bytes: Array[Byte]) =>
          graft.engine.validate.ImageProbe.dimensions(bytes)
        }
        val p = df
          .withColumn("__wh", dims(col(cfg.bytesCol)))
          .filter(col("__wh").isNotNull &&
            col("__wh._1") >= cfg.minWidth && col("__wh._2") >= cfg.minHeight)
          .drop("__wh")
          .truncated
        (p, p.count(), Nil)
      case Some(g) =>
        val comb = udf { (bytes: Array[Byte]) =>
          ImageStats.statsAndHash(bytes).map { case (s, h) =>
            (h.map(java.lang.Long.valueOf).orNull, s.width, s.height,
              s.meanLuma, s.stdLuma, s.laplacianVar)
          }
        }
        val valid = df
          .withColumn("__sg", comb(col(cfg.bytesCol)))
          .filter(col("__sg").isNotNull)
          .truncated
        val v = valid.count()
        val gated = valid
          .filter(col("__sg._2") >= cfg.minWidth &&
            col("__sg._3") >= cfg.minHeight &&
            col("__sg._6") >= g.minLaplacianVar &&
            col("__sg._5") >= g.minStdLuma &&
            col("__sg._4").between(g.minMeanLuma, g.maxMeanLuma))
          .withColumn("__ih", col("__sg._1"))
          .drop("__sg")
          .truncated
        (gated, v, Seq("n_signal" -> gated.count()))
    }

    // 2. exact dedup: digest the bytes, smallest id per digest wins
    val digested = probed.withColumn("__dg", sha2(col(cfg.bytesCol), 256))
    val keepers = digested.groupBy("__dg").agg(min(id).as("__keep"))
    val exact = digested
      .join(keepers, digested("__dg") === keepers("__dg") &&
        id === col("__keep"), "left_semi")
      .drop("__dg")
      .truncated
    val nExact = exact.count()

    // 3. perceptual near-dup within the batch: hash the exact
    // survivors ONCE (unless the gate already carried it), then a
    // pair-local greedy drop; undecodable rows keep a NULL hash and
    // ride through stages 3/4 untouched
    val exactH =
      if (statsGate.isDefined) exact
      else exact.withColumn("__ih", ImageHash.dhash(col(cfg.bytesCol)))
        .truncated
    val losers = ImageHash.nearDuplicatesByHash(
        exactH.select(id.as("__pid"), col("__ih").as("__ph"))
          .filter(col("__ph").isNotNull),
        "__pid", "__ph", cfg.maxHamming, cfg.maxBucket)
      .select(col("id_b").as("__loser")).distinct()
    val near = exactH
      .join(losers, id === col("__loser"), "left_anti")
      .truncated
    val nNear = near.count()

    // 4. optional seen-corpus index — probes with the CARRIED hashes
    val (kept, nFinal) = seenIndex match {
      case Some(idx) =>
        val k = ImageHash.dropNearDuplicatesByHash(near, idx,
          cfg.idCol, "__ih", "dhash", cfg.maxHamming, cfg.maxBucket)
          .truncated
        (k, k.count())
      case None => (near, nNear)
    }

    Result(kept.drop("__ih"), Seq(
      "n_received" -> nReceived,
      "n_valid" -> nValid,
      "n_exact_kept" -> nExact,
      "n_near_kept" -> nNear,
      "n_final" -> nFinal) ++ signalMetric)
  }

  /** The audio face: same stage order, with the spectral hash
    * ([[AudioFingerprint.spectralHash]]) computed ONCE at validation
    * and carried through — decodable means fingerprintable here, and
    * stages 3/4 consume the carried hash instead of re-decoding.
    * `seenIndex` is a [[AudioFingerprint.buildAudioIndex]] frame.
    */
  def curateAudio(df: DataFrame, cfg: Config,
                  seenIndex: Option[DataFrame] = None,
                  statsGate: Option[AudioStats.Gate] = None): Result = {
    val id = col(cfg.idCol)
    val nReceived = df.count()
    // with a stats gate, the decode is paid ONCE: stats + the
    // whole-clip hash off a single pcmMono pass
    // ([[AudioStats.statsAndHash]]); without one, behavior and
    // metrics are exactly the pre-gate shape
    val (probed, nValid, signalMetric) = statsGate match {
      case None =>
        val p = df
          .withColumn("__mh",
            AudioFingerprint.spectralHash(col(cfg.bytesCol)))
          .filter(col("__mh").isNotNull)
          .truncated
        (p, p.count(), Nil)
      case Some(g) =>
        val comb = udf { (bytes: Array[Byte]) =>
          AudioStats.statsAndHash(bytes).map { case (s, h) =>
            (h.map(java.lang.Long.valueOf).orNull, s.durationMs,
              s.rmsDb, s.clipRatio, s.silenceRatio)
          }
        }
        val valid = df
          .withColumn("__sg", comb(col(cfg.bytesCol)))
          .filter(col("__sg").isNotNull && col("__sg._1").isNotNull)
          .truncated
        val v = valid.count()
        val gated = valid
          .filter(col("__sg._2") >= g.minDurationMs &&
            col("__sg._5") <= g.maxSilenceRatio &&
            col("__sg._4") <= g.maxClipRatio &&
            col("__sg._3") >= g.minRmsDb)
          .withColumn("__mh", col("__sg._1"))
          .drop("__sg")
          .truncated
        (gated, v, Seq("n_signal" -> gated.count()))
    }
    val digested = probed.withColumn("__dg", sha2(col(cfg.bytesCol), 256))
    val keepers = digested.groupBy("__dg").agg(min(id).as("__keep"))
    val exact = digested
      .join(keepers, digested("__dg") === keepers("__dg") &&
        id === col("__keep"), "left_semi")
      .drop("__dg")
      .truncated
    val nExact = exact.count()
    val losers = ImageHash.nearDuplicatesByHash(
        exact.select(id.as("__pid"), col("__mh").as("__ph")),
        "__pid", "__ph", cfg.maxHamming, cfg.maxBucket)
      .select(col("id_b").as("__loser")).distinct()
    val near = exact.join(losers, id === col("__loser"), "left_anti")
      .truncated
    val nNear = near.count()
    val (kept, nFinal) = seenIndex match {
      case Some(idx) =>
        val k = ImageHash.dropNearDuplicatesByHash(near, idx,
          cfg.idCol, "__mh", "ahash", cfg.maxHamming, cfg.maxBucket)
          .truncated
        (k, k.count())
      case None => (near, nNear)
    }
    Result(kept.drop("__mh"), Seq(
      "n_received" -> nReceived,
      "n_valid" -> nValid) ++ signalMetric ++ Seq(
      "n_exact_kept" -> nExact,
      "n_near_kept" -> nNear,
      "n_final" -> nFinal))
  }

  /** The video face: validation = a decodable frame-hash signature
    * ([[VideoFrameHash.signature]], computed once and carried);
    * perceptual dedup is set-signature coverage — within the batch the
    * larger id of each covered pair drops, then batch clips covered by
    * the [[VideoFrameHash.buildVideoIndex]] `seenIndex` drop.
    */
  def curateVideos(df: DataFrame, cfg: Config,
                   seenIndex: Option[DataFrame] = None,
                   minMatchFrac: Double = 0.5,
                   maxFrames: Int = VideoFrameHash.DefaultMaxFrames): Result = {
    val id = col(cfg.idCol)
    val nReceived = df.count()
    val probed = df
      .withColumn("__sig",
        VideoFrameHash.signature(col(cfg.bytesCol), maxFrames))
      .filter(col("__sig").isNotNull)
      .truncated
    val nValid = probed.count()
    val digested = probed.withColumn("__dg", sha2(col(cfg.bytesCol), 256))
    val keepers = digested.groupBy("__dg").agg(min(id).as("__keep"))
    val exact = digested
      .join(keepers, digested("__dg") === keepers("__dg") &&
        id === col("__keep"), "left_semi")
      .drop("__dg")
      .truncated
    val nExact = exact.count()
    val pairs = SetSignature.nearDuplicatesBySignature(
      exact.select(id.as("__sid"), explode(col("__sig")).as("__sh")),
      "__sid", "__sh", cfg.maxHamming, minMatchFrac, cfg.maxBucket)
    val losers = pairs.select(col("id_b").as("__loser")).distinct()
    val near = exact.join(losers, id === col("__loser"), "left_anti")
      .truncated
    pairs.unpersist()
    val nNear = near.count()
    val (kept, nFinal) = seenIndex match {
      case Some(idx) =>
        val covered = SetSignature.coveredIds(
          near.select(id.as("__sid"), explode(col("__sig")).as("__sh")),
          idx, "__sid", "__sh", "fhash", cfg.maxHamming, minMatchFrac,
          cfg.maxBucket)
        val k = near.join(covered, id === col("__covered_id"), "left_anti")
          .truncated
        (k, k.count())
      case None => (near, nNear)
    }
    Result(kept.drop("__sig"), Seq(
      "n_received" -> nReceived,
      "n_valid" -> nValid,
      "n_exact_kept" -> nExact,
      "n_near_kept" -> nNear,
      "n_final" -> nFinal))
  }

  /** The bring-your-own-frames face of [[curateVideos]] — for codecs
    * the pure-JVM walk cannot decode (H.264-in-MP4 keyframes from an
    * external extractor): `batch` is the video table keyed by
    * `cfg.idCol`; `frames` its `(cfg.idCol, cfg.bytesCol)` frame-image
    * rows. Same stages, same metric names, so dashboards and callers
    * compose across extraction paths:
    *
    *  1. VALIDATE — videos with at least one decodable frame
    *     ([[VideoFrameHash.signatureFromFrames]]; frame-less videos
    *     drop, matching the payload face's NULL-signature drop);
    *  2. EXACT — identical keyframe-hash SETS collapse to the
    *     smallest id (the byte-digest analogue when there are no
    *     payload bytes to digest: a re-extracted copy of the same
    *     clip carries the same frame images, hence the same set);
    *  3. PERCEPTUAL — the [[SetSignature]] pair join at
    *     `minMatchFrac` coverage, larger id drops (pair-local greedy,
    *     the payload face's rule);
    *  4. SEEN-INDEX — [[SetSignature.coveredIds]] against a
    *     [[VideoFrameHash.buildVideoIndex]]-shaped frame, built by
    *     EITHER face.
    *
    * Scale shape: frame images are touched once (the stage-1 hash
    * projection is checkpoint-truncated); everything after shuffles
    * 8-byte hashes and digests only.
    */
  def curateVideosFromFrames(batch: DataFrame, frames: DataFrame,
                             cfg: Config,
                             seenIndex: Option[DataFrame] = None,
                             minMatchFrac: Double = 0.5): Result = {
    val id = col(cfg.idCol)
    val nReceived = batch.count()
    // one decode+hash pass over frame images, materialized: every
    // later stage reads 8-byte hash rows off this snapshot
    val sigs = VideoFrameHash.signatureFromFrames(
        frames, cfg.idCol, cfg.bytesCol)
      .truncated
    val sigSets = sigs.groupBy("video_id")
      .agg(sort_array(collect_set(col("fhash"))).as("__sigset"))
      .withColumn("__dg", sha2(concat_ws(",",
        transform(col("__sigset"), h => h.cast("string"))), 256))
    val probed = batch
      .join(sigSets.select(col("video_id").as("__vid"), col("__dg")),
        id === col("__vid"), "inner")
      .drop("__vid")
      .truncated
    val nValid = probed.count()
    val keepers = probed.groupBy("__dg").agg(min(id).as("__keep"))
    val exact = probed
      .join(keepers, probed("__dg") === keepers("__dg") &&
        id === col("__keep"), "left_semi")
      .drop("__dg")
      .truncated
    val nExact = exact.count()
    val exactSigs = sigs.join(exact.select(id.as("__kid")),
      col("video_id") === col("__kid"), "left_semi")
    val pairs = SetSignature.nearDuplicatesBySignature(
      exactSigs.select(col("video_id").as("__sid"),
        col("fhash").as("__sh")),
      "__sid", "__sh", cfg.maxHamming, minMatchFrac, cfg.maxBucket)
    val losers = pairs.select(col("id_b").as("__loser")).distinct()
    val near = exact.join(losers, id === col("__loser"), "left_anti")
      .truncated
    pairs.unpersist()
    val nNear = near.count()
    val (kept, nFinal) = seenIndex match {
      case Some(idx) =>
        val nearSigs = sigs.join(near.select(id.as("__kid")),
          col("video_id") === col("__kid"), "left_semi")
        val covered = SetSignature.coveredIds(
          nearSigs.select(col("video_id").as("__sid"),
            col("fhash").as("__sh")),
          idx, "__sid", "__sh", "fhash", cfg.maxHamming, minMatchFrac,
          cfg.maxBucket)
        val k = near.join(covered, id === col("__covered_id"), "left_anti")
          .truncated
        (k, k.count())
      case None => (near, nNear)
    }
    Result(kept, Seq(
      "n_received" -> nReceived,
      "n_valid" -> nValid,
      "n_exact_kept" -> nExact,
      "n_near_kept" -> nNear,
      "n_final" -> nFinal))
  }
}
