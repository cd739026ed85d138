package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Video near-duplicate detection by frame-sampled perceptual
  * hashing: decode a bounded sample of frames, dHash each
  * ([[ImageHash.dhash64]] — the shared image kernel), and treat the
  * set of frame hashes as the clip's signature. A re-encoded, re-muxed
  * or trimmed copy shares most frame hashes with the original; two
  * different clips share none — which byte digests and header
  * metadata ([[graft.engine.validate.VideoProbe]]) can never see.
  *
  * Container support is MJPEG-in-AVI — the RIFF chunk walk
  * `VideoProbe.aviInfo` already does (little-endian `RIFF('AVI ')`
  * tree, frames as `##dc`/`##db` chunks inside the `movi` LIST,
  * optionally nested in `rec ` LISTs, per the Microsoft AVI RIFF
  * spec), with each frame a complete JPEG the JVM decodes natively.
  * That makes the whole path pure-JVM and deterministic; other codecs
  * need native decoders this container intentionally stubs out.
  *
  * Frame sampling is EVEN across the clip (`maxFrames` indices at
  * `floor(i·n/maxFrames)`), so two copies of the same stream sample
  * the same frames regardless of how their chunks are laid out, and
  * the per-clip decode bill is bounded by `maxFrames`, not duration.
  *
  * Scale shape: signature extraction is a pure map over video bytes
  * (bounded frame decodes per clip); the near-dup join shuffles only
  * `(band key, video_id, 8-byte frame hash)` tuples through the
  * banded pigeonhole join shared with images/audio — never pixels,
  * never payloads. The skew cap bounds placeholder-frame fan-out
  * exactly like [[ImageHash]].
  */
object VideoFrameHash {

  /** Default number of frames sampled per clip. */
  val DefaultMaxFrames = 8

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "

  /** Offsets + lengths of every video frame chunk (`##dc`/`##db`)
    * inside the AVI's `movi` LIST(s), in stream order. The walk is
    * bounds-checked with Long offsets (the [[graft.engine.validate
    * .AudioProbe]] stance: hostile sizes end the walk, never wrap).
    */
  private def frameChunks(b: Array[Byte]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    def walk(start: Long, end: Long, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        val o = off.toInt
        val id = tag(b, o)
        val declared = u32le(b, o + 4)
        val avail = math.min(declared, end - (o + 8))
        if (id == "LIST" && avail >= 4) {
          val sub = tag(b, o + 8)
          if (sub == "movi" || (inMovi && sub == "rec "))
            walk(o + 12L, o + 8L + avail, inMovi = true, depth + 1)
        } else if (inMovi && isFrameId(id) && avail > 0) {
          out += ((o + 8, avail.toInt))
        }
        off += 8L + declared + (declared & 1L)
      }
    }
    if (isAvi(b)) walk(12L, b.length.toLong, inMovi = false, 0)
    out.result()
  }

  /** dHashes of up to `maxFrames` evenly-sampled frames of one AVI
    * payload, in sample order; None when the payload is not AVI or
    * holds no frame chunks. Frames that fail to decode are skipped
    * (a signature survives partial corruption).
    */
  def frameHashes(bytes: Array[Byte],
                  maxFrames: Int = DefaultMaxFrames): Option[Seq[Long]] = {
    require(maxFrames >= 1, s"maxFrames must be positive: $maxFrames")
    val chunks = frameChunks(bytes)
    if (chunks.isEmpty) return None
    val n = chunks.length
    val picks =
      if (n <= maxFrames) chunks
      else Vector.tabulate(maxFrames)(i => chunks((i.toLong * n / maxFrames).toInt))
    Some(picks.flatMap { case (off, len) =>
      ImageHash.dhash64(java.util.Arrays.copyOfRange(bytes, off, off + len))
    })
  }

  private def sigUdf(maxFrames: Int) = udf { (bytes: Array[Byte]) =>
    frameHashes(bytes, maxFrames).filter(_.nonEmpty).map(_.toArray).orNull
  }

  /** Frame-hash signature as an `array<bigint>` column (NULL when the
    * payload is not a frame-bearing AVI or no sampled frame decodes).
    */
  def signature(bytesCol: Column,
                maxFrames: Int = DefaultMaxFrames): Column =
    sigUdf(maxFrames)(bytesCol)

  /** Near-duplicate video pairs: `(vid_a, vid_b, n_frames_a,
    * n_frames_b, matched_a, matched_b)` where `matched_x` counts
    * side-x signature hashes with a within-`maxHamming` partner on
    * the other side, for pairs where the better-covered side reaches
    * `minMatchFrac` of its signature. A re-muxed/re-encoded copy
    * matches every frame (frac 1); a clip CONTAINED in a longer one
    * still reaches frac 1 on its own side — `greatest` of the two
    * coverages is the decision value by design.
    *
    * Candidate generation is the banded pigeonhole join over FRAME
    * hashes (recall 1 within the Hamming budget), then matches
    * aggregate per video pair — only band keys and 8-byte hashes
    * shuffle. The returned frame is persisted + MATERIALIZED (small:
    * matched pairs only) so the exploded signature frame — whose
    * recompute would re-decode every sampled frame — can be released
    * before returning (the [[graft.ops.Dedup.minhashCandidates]]
    * pattern); callers may `unpersist()` it when done.
    */
  def nearDuplicateVideos(df: DataFrame, idCol: String, bytesCol: String,
                          maxHamming: Int = 4,
                          minMatchFrac: Double = 0.5,
                          maxFrames: Int = DefaultMaxFrames,
                          maxBucket: Int = 1 << 12): DataFrame =
    SetSignature.nearDuplicatesBySignature(
      df.select(col(idCol).as("__sid"),
        explode(signature(col(bytesCol), maxFrames)).as("__sh")),
      "__sid", "__sh", maxHamming, minMatchFrac, maxBucket,
      outNames = Seq("vid_a", "vid_b", "n_frames_a", "n_frames_b",
        "matched_a", "matched_b"))

  /** Frame-hash signature rows from EXTERNALLY-extracted frames — the
    * bring-your-own-frames face for codecs outside the pure-JVM MJPEG
    * walk. H.264-in-MP4 — what video actually ships as — needs a
    * native decoder this engine deliberately does not guess at; the
    * realistic pipeline extracts keyframes out-of-band (ffmpeg
    * `-skip_frame nokey`, a GPU decode stage, …) and hands the engine
    * `(video_id, frame image bytes)` rows. Each frame dHashes through
    * the SAME [[ImageHash.dhash64]] kernel the MJPEG walk uses, so on
    * byte-identical frame images the two faces produce IDENTICAL
    * signatures (spec-pinned) and every downstream face — the pair
    * join, the persisted index, the incremental drop — composes
    * unchanged across extraction paths. Output schema IS the
    * [[buildVideoIndex]] schema (`(video_id, fhash)`, distinct);
    * frames that fail to decode drop (a signature survives partial
    * corruption, the [[frameHashes]] stance).
    *
    * Scale shape: one pure map over frame bytes (the decode+hash is
    * the bill), then an 8-byte-hash dedup — frame payloads never
    * shuffle past the hash projection.
    */
  def signatureFromFrames(frames: DataFrame, idCol: String,
                          frameBytesCol: String): DataFrame =
    frames.select(col(idCol).as("video_id"),
        ImageHash.dhash(col(frameBytesCol)).as("fhash"))
      .filter(col("fhash").isNotNull)
      .distinct()

  /** [[nearDuplicateVideos]] over externally-extracted frames: same
    * six-column output, same containment semantics — a clip whose
    * frames are a subset of a longer one reaches frac 1 on its own
    * side. Videos with no decodable frame pair with nothing.
    */
  def nearDuplicateVideosFromFrames(frames: DataFrame, idCol: String,
                                    frameBytesCol: String,
                                    maxHamming: Int = 4,
                                    minMatchFrac: Double = 0.5,
                                    maxBucket: Int = 1 << 12): DataFrame =
    SetSignature.nearDuplicatesBySignature(
      frames.select(col(idCol).as("__sid"),
        ImageHash.dhash(col(frameBytesCol)).as("__sh")),
      "__sid", "__sh", maxHamming, minMatchFrac, maxBucket,
      outNames = Seq("vid_a", "vid_b", "n_frames_a", "n_frames_b",
        "matched_a", "matched_b"))

  /** Incremental dedup for BYO-frame videos against a
    * [[buildVideoIndex]]-shaped frame — the index may have been built
    * by EITHER face (the MJPEG walk or [[signatureFromFrames]]); the
    * hashes are the same kernel. `batch` is any frame keyed by
    * `idCol` (the video payload/metadata table); `batchFrames` its
    * externally-extracted `(idCol, frame bytes)` rows. Batch videos
    * covered at `minMatchFrac` drop; videos with no decodable frame
    * survive (nothing to match them by).
    */
  def dropNearDuplicateVideosFromFrames(batch: DataFrame,
                                        batchFrames: DataFrame,
                                        index: DataFrame,
                                        idCol: String,
                                        frameBytesCol: String,
                                        maxHamming: Int = 4,
                                        minMatchFrac: Double = 0.5,
                                        maxBucket: Int = 1 << 12): DataFrame = {
    require(index.columns.toSeq.contains("video_id") &&
      index.columns.toSeq.contains("fhash"),
      "index must be a buildVideoIndex frame with (video_id, fhash)")
    val covered = SetSignature.coveredIds(
      batchFrames.select(col(idCol).as("__sid"),
        ImageHash.dhash(col(frameBytesCol)).as("__sh")),
      index, "__sid", "__sh", "fhash", maxHamming, minMatchFrac, maxBucket)
    batch.join(covered, col(idCol) === col("__covered_id"), "left_anti")
  }

  /** Persisted video signature index — one `(video_id, fhash)` row
    * per sampled frame hash, the video face of
    * [[ImageHash.buildImageIndex]]: build once over the seen corpus,
    * append per batch, probe without re-decoding a seen frame.
    */
  def buildVideoIndex(df: DataFrame, idCol: String, bytesCol: String,
                      maxFrames: Int = DefaultMaxFrames): DataFrame =
    df.select(col(idCol).as("video_id"),
        explode(signature(col(bytesCol), maxFrames)).as("fhash"))
      .distinct()

  /** Incremental video dedup against a [[buildVideoIndex]] frame:
    * drop batch clips whose sampled frame hashes are covered at
    * `minMatchFrac` by within-`maxHamming` index hashes (coverage on
    * the BATCH side — a clip fully contained in an indexed one
    * drops). Clips with no decodable signature survive (nothing to
    * match them by — the [[ImageHash]] stance).
    */
  def dropNearDuplicateVideos(batch: DataFrame, index: DataFrame,
                              idCol: String, bytesCol: String,
                              maxHamming: Int = 4,
                              minMatchFrac: Double = 0.5,
                              maxFrames: Int = DefaultMaxFrames,
                              maxBucket: Int = 1 << 12): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1]: $minMatchFrac")
    require(index.columns.toSeq.contains("video_id") &&
      index.columns.toSeq.contains("fhash"),
      "index must be a buildVideoIndex frame with (video_id, fhash)")
    // fully lazy, like dropNearDuplicateImages: the signature subtree
    // appears on both the probe and the output side of the anti join —
    // the bounded per-clip decode is paid twice in exchange for a
    // single self-cleaning plan (no persist to leak past the return)
    val covered = SetSignature.coveredIds(
      batch.select(col(idCol).as("__sid"),
        explode(signature(col(bytesCol), maxFrames)).as("__sh")),
      index, "__sid", "__sh", "fhash", maxHamming, minMatchFrac, maxBucket)
    batch.join(covered, col(idCol) === col("__covered_id"), "left_anti")
  }
}