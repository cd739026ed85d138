package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal video curation statistics from sampled frame hashes — the
  * video face of the degenerate-content gates ([[AudioStats]],
  * [[ImageStats]]): a "video" whose frames never change is a
  * slideshow/static screen capture carrying one image's worth of
  * signal, and a hard-cut count separates single-shot clips from
  * montage content. Both read off CONSECUTIVE-frame Hamming
  * distances over the same dHashes the dedup signature already
  * computes — no second decode.
  *
  *  - `n_cuts` — consecutive sampled pairs with distance >
  *    `cutHamming` (a hard cut between samples; with even sampling
  *    this undercounts rapid montage, which is fine for a gate);
  *  - `static_ratio` — fraction of consecutive pairs with distance ≤
  *    `staticHamming` (1.0 = nothing ever changes);
  *  - single-frame/empty signatures report 0 cuts, static 1.0 (one
  *    image IS static content).
  *
  * Two faces, same arithmetic: the MJPEG payload walk (a UDF over
  * [[VideoFrameHash.frameHashes]]) and BYO frames (externally
  * extracted keyframes with an ORDER column — pure column
  * expressions: `sort_array` + `zip_with` + `bit_count`, no UDF).
  */
object VideoStats {

  final case class Stats(nFrames: Int, nCuts: Int, staticRatio: Double)

  /** The shared kernel over an ordered hash sequence. */
  def fromHashes(hashes: Seq[Long], cutHamming: Int,
                 staticHamming: Int): Stats = {
    require(cutHamming >= 0 && staticHamming >= 0,
      "hamming thresholds must be >= 0")
    if (hashes.length < 2)
      return Stats(hashes.length, 0, 1.0)
    var cuts = 0
    var static0 = 0
    var i = 1
    while (i < hashes.length) {
      val d = java.lang.Long.bitCount(hashes(i - 1) ^ hashes(i))
      if (d > cutHamming) cuts += 1
      if (d <= staticHamming) static0 += 1
      i += 1
    }
    Stats(hashes.length, cuts, static0.toDouble / (hashes.length - 1))
  }

  private def statsUdf(maxFrames: Int, cutHamming: Int,
                       staticHamming: Int) = udf { (bytes: Array[Byte]) =>
    VideoFrameHash.frameHashes(bytes, maxFrames).filter(_.nonEmpty)
      .map { hs =>
        val s = fromHashes(hs, cutHamming, staticHamming)
        (s.nFrames, s.nCuts, s.staticRatio)
      }
  }

  /** Stats as a struct column `(n_frames, n_cuts, static_ratio)` over
    * MJPEG-AVI payload bytes; NULL when no frame decodes.
    */
  def statsCol(bytesCol: Column,
               maxFrames: Int = VideoFrameHash.DefaultMaxFrames,
               cutHamming: Int = 16,
               staticHamming: Int = 2): Column =
    statsUdf(maxFrames, cutHamming, staticHamming)(bytesCol)

  /** The BYO-frames face: `(idCol, orderCol, frameBytesCol)` rows →
    * one row per video `(idCol, n_frames, n_cuts, static_ratio)`.
    * Pure column expressions — frames hash once, consecutive
    * distances come from `zip_with` + `bit_count` over the
    * order-sorted hash array. Videos with no decodable frame emit no
    * row (nothing to measure).
    */
  def statsFromFrames(frames: DataFrame, idCol: String, orderCol: String,
                      frameBytesCol: String,
                      cutHamming: Int = 16,
                      staticHamming: Int = 2): DataFrame = {
    require(cutHamming >= 0 && staticHamming >= 0,
      "hamming thresholds must be >= 0")
    val hashed = frames.select(col(idCol),
        col(orderCol).cast("long").as("__ord"),
        ImageHash.dhash(col(frameBytesCol)).as("__fh"))
      .filter(col("__fh").isNotNull)
    val arr = hashed.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__ord"), col("__fh"))))
        .getField("__fh").as("__hs"))
    val n = size(col("__hs"))
    // consecutive distances: zip the array against itself shifted one
    val dists = zip_with(
      slice(col("__hs"), lit(1), greatest(n - 1, lit(0))),
      slice(col("__hs"), lit(2), greatest(n - 1, lit(0))),
      (a, b) => bit_count(a.bitwiseXOR(b)))
    arr.select(col(idCol),
      n.as("n_frames"),
      coalesce(size(filter(dists, d => d > cutHamming))
        .cast("int"), lit(0)).as("n_cuts"),
      when(n < 2, lit(1.0)).otherwise(
        size(filter(dists, d => d <= staticHamming)).cast("double") /
          (n - 1)).as("static_ratio"))
  }

  /** Drop static/slideshow videos: clips whose `static_ratio` is at
    * or above `maxStaticRatio` over ≥ 2 sampled frames. A clip with
    * only ONE decodable frame SURVIVES this gate — one pair of frames
    * is the minimum evidence of "nothing changes", and a real video
    * whose other samples failed to decode must not die on a
    * vacuous 1.0 (route slivers to the dimension/duration gates).
    * Payload face; clips with NO decodable signature DROP (the
    * stats-gate stance).
    */
  def dropStaticVideos(df: DataFrame, bytesCol: String,
                       maxStaticRatio: Double = 0.999,
                       maxFrames: Int = VideoFrameHash.DefaultMaxFrames,
                       staticHamming: Int = 2): DataFrame = {
    require(!df.columns.contains("__graft_vstats"),
      "input already has a reserved '__graft_vstats' column")
    df.withColumn("__graft_vstats",
        statsCol(col(bytesCol), maxFrames, staticHamming = staticHamming))
      .filter(col("__graft_vstats").isNotNull &&
        (col("__graft_vstats._1") < 2 ||
          col("__graft_vstats._3") < maxStaticRatio))
      .drop("__graft_vstats")
  }
}
