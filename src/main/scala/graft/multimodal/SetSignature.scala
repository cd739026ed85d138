package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Set-of-hashes signature matching — the medium-agnostic core shared
  * by video ([[VideoFrameHash]]: sampled-frame dHashes) and windowed
  * audio ([[AudioFingerprint]]: sub-fingerprint hashes): a document's
  * signature is a SET of 64-bit perceptual hashes, two documents are
  * near-duplicates when enough of one side's hashes have a
  * within-Hamming partner on the other. Containment falls out for
  * free: an excerpt/subset clip reaches full coverage on its own side
  * even when the longer document does not.
  *
  * Candidate generation is the banded pigeonhole join of
  * [[ImageHash]] over the individual hashes (recall 1 within the
  * budget), matches then aggregate per document pair — only band keys
  * and 8-byte hashes shuffle, with the hot-bucket skew cap bounding
  * placeholder fan-out.
  */
object SetSignature {

  /** Near-duplicate pairs over a signature frame (`(idCol, hashCol)`,
    * one row per signature hash): six columns named by `outNames` —
    * id_a, id_b, the two signature sizes, and the two matched counts —
    * for pairs where the better-covered side reaches `minMatchFrac`.
    * The returned frame is persisted + MATERIALIZED (small: matched
    * pairs only) so the exploded band frame can be released before
    * returning; callers may `unpersist()` it when done.
    */
  def nearDuplicatesBySignature(sigFrame: DataFrame, idCol: String,
                                hashCol: String, maxHamming: Int,
                                minMatchFrac: Double, maxBucket: Int,
                                outNames: Seq[String] = Seq("id_a", "id_b",
                                  "n_a", "n_b", "matched_a", "matched_b"))
  : DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1]: $minMatchFrac")
    require(outNames.length == 6, s"outNames needs 6 entries: $outNames")
    val sigs = sigFrame
      .select(col(idCol).as("__vid"), col(hashCol).as("__fh"))
      .filter(col("__fh").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = sigs.groupBy("__vid").agg(count(lit(1)).as("__nf"))
      val banded = ImageHash.capBuckets(
        sigs.select(col("__vid"), col("__fh"),
            explode(ImageHash.bandStructs(col("__fh"), maxHamming))
              .as("__band"))
          .select(col("__vid"), col("__fh"),
            col("__band.blk").as("__blk"), col("__band.key").as("__key")),
        maxBucket)
      val a = banded.alias("a")
      val b = banded.alias("b")
      val matched = a.join(b,
          col("a.__blk") === col("b.__blk") &&
            col("a.__key") === col("b.__key") &&
            col("a.__vid") < col("b.__vid"))
        .filter(F.hamming(col("a.__fh"), col("b.__fh"))
          .cast("int") <= maxHamming)
        .select(col("a.__vid").as("__va"), col("b.__vid").as("__vb"),
          col("a.__fh").as("__fa"), col("b.__fh").as("__fb"))
        .groupBy("__va", "__vb")
        .agg(countDistinct("__fa").as("__ma"),
          countDistinct("__fb").as("__mb"))
      val out = matched
        .join(counts.toDF("__va", "__na"), Seq("__va"))
        .join(counts.toDF("__vb", "__nb"), Seq("__vb"))
        .filter(greatest(
          col("__ma").cast("double") / col("__na"),
          col("__mb").cast("double") / col("__nb")) >= minMatchFrac)
        .select(col("__va").as(outNames(0)), col("__vb").as(outNames(1)),
          col("__na").as(outNames(2)), col("__nb").as(outNames(3)),
          col("__ma").as(outNames(4)), col("__mb").as(outNames(5)))
        .persist()
      out.count()
      out
    } finally { sigs.unpersist(); () }
  }

  /** Ids of batch documents whose signature is covered at
    * `minMatchFrac` by within-`maxHamming` index hashes (coverage on
    * the BATCH side — a document contained in an indexed one drops).
    * Fully lazy, one column `__covered_id`; callers anti-join. The
    * skew cap applies to the SEEN side, as in [[ImageHash]].
    */
  def coveredIds(batchSigs: DataFrame, indexSigs: DataFrame,
                 batchIdCol: String, batchHashCol: String,
                 indexHashCol: String, maxHamming: Int,
                 minMatchFrac: Double, maxBucket: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1]: $minMatchFrac")
    val sigs = batchSigs
      .select(col(batchIdCol).as("__vid"), col(batchHashCol).as("__fh"))
      .filter(col("__fh").isNotNull)
      .distinct()
    val counts = sigs.groupBy("__vid").agg(count(lit(1)).as("__nf"))
    val probe = sigs.select(col("__vid"), col("__fh"),
      explode(ImageHash.bandStructs(col("__fh"), maxHamming)).as("__band"))
    val seen = ImageHash.capBuckets(
      indexSigs
        .select(col(indexHashCol).as("__sh"))
        .filter(col("__sh").isNotNull)
        .select(col("__sh"),
          explode(ImageHash.bandStructs(col("__sh"), maxHamming))
            .as("__sband"))
        .select(col("__sh"), col("__sband.blk").as("__blk"),
          col("__sband.key").as("__key")),
      maxBucket)
    probe.join(seen,
        col("__band.blk") === col("__blk") &&
          col("__band.key") === col("__key"))
      .filter(F.hamming(col("__fh"), col("__sh"))
        .cast("int") <= maxHamming)
      .select(col("__vid"), col("__fh")).distinct()
      .groupBy("__vid").agg(count(lit(1)).as("__m"))
      .join(counts, Seq("__vid"))
      .filter(col("__m").cast("double") / col("__nf") >= minMatchFrac)
      .select(col("__vid").as("__covered_id"))
  }
}
