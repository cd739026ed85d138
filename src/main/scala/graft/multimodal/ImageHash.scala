package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Perceptual image hashing — difference hash (dHash, public
  * algorithm: Krawetz 2013, "Kind of Like That") — extending the
  * near-duplicate family to IMAGE payloads: re-encoded, resized or
  * slightly-retouched copies of the same picture land within a few
  * Hamming bits of each other, which byte-digest dedup can never see.
  *
  * Pipeline per image: full decode ([[ImageDecode]]: ImageIO's
  * PNG/JPEG/GIF/BMP plus the pure-JVM lossless-WebP path) → integer
  * luma
  * (`(299r+587g+114b)/1000`, floor) → box-average downscale to a
  * 9×8 grid (integer mean, floor; NO Graphics2D resampling — its
  * interpolation is platform-dependent and would break cross-machine
  * determinism) → one bit per horizontal neighbor pair
  * (`left < right`), packed row-major MSB-first into 64 bits.
  *
  * Near-dup candidates use the SimHash banding shape
  * ([[graft.ops.Dedup]]): the 64-bit hash splits into
  * `maxHamming + 1` contiguous blocks, so any pair within the
  * distance budget shares at least one untouched block (pigeonhole)
  * — recall 1 by construction, then the exact `bit_count(xor)`
  * verify prunes false candidates. No pairwise scan, no cartesian.
  *
  * Scale shape: hashing is a pure map over image bytes (the
  * mapPartitions-batch decode cost IS the bill, ~ms per image); the
  * candidate join shuffles only `(block_key, id, hash)` tuples —
  * 8-byte hashes, never pixels.
  */
object ImageHash {
  ImageIoDefaults.ensure() // memory-backed ImageIO streams in this JVM

  /** Bits per row (comparisons) and rows of the hash grid. */
  val HashW = 8
  val HashH = 8

  /** 64-bit dHash of one encoded image; None when the payload is
    * empty or no decoder handles it ([[ImageDecode]]: ImageIO formats
    * plus lossless WebP).
    */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    ImageDecode.decode(bytes).flatMap(dhash64FromImage)

  /** The dHash kernel over an ALREADY-DECODED image — the shared face
    * for one-decode compositions ([[ImageStats.statsAndHash]]): the
    * decode is the per-image bill, so stats + hash must split one.
    */
  def dhash64FromImage(img: java.awt.image.BufferedImage): Option[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < 1 || h < 1) return None
    val gw = HashW + 1
    val gh = HashH
    val cells = Array.ofDim[Long](gh, gw)
    var cy = 0
    while (cy < gh) {
      val y0 = (cy.toLong * h / gh).toInt
      val y1 = math.max(((cy + 1).toLong * h / gh).toInt, y0 + 1)
      var cx = 0
      while (cx < gw) {
        val x0 = (cx.toLong * w / gw).toInt
        val x1 = math.max(((cx + 1).toLong * w / gw).toInt, x0 + 1)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sum += (299L * r + 587L * g + 114L * b) / 1000L
            n += 1
            x += 1
          }
          y += 1
        }
        cells(cy)(cx) = if (n == 0) 0L else sum / n
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var i = 0
    while (i < gh) {
      var j = 0
      while (j < HashW) {
        hash = (hash << 1) |
          (if (cells(i)(j) < cells(i)(j + 1)) 1L else 0L)
        j += 1
      }
      i += 1
    }
    Some(hash)
  }

  /** dHash AFTER undoing the declared EXIF orientation (TIFF 6.0 tag
    * 274, values 2–8: mirrors, 180°, transposes, 90°/270°) — a phone
    * photo STORED rotated-with-a-tag dedups against its upright
    * re-encode, which plain [[dhash64]] cannot see (the hash is not
    * rotation-invariant by design). No tag / value 1 → plain dHash;
    * the orientation read ([[graft.engine.validate.ExifProbe]]) is a
    * header walk on the same bytes the decode already loads.
    */
  def orientedDhash64(bytes: Array[Byte]): Option[Long] = {
    val o = graft.engine.validate.ExifProbe.info(bytes)
      .flatMap(_.orientation).getOrElse(1)
    ImageDecode.decode(bytes).flatMap { img =>
      dhash64FromImage(if (o >= 2 && o <= 8) reorient(img, o) else img)
    }
  }

  /** Undo TIFF orientation `o` (2–8): the returned image displays
    * upright. Direct pixel remap — the images here are already
    * decoded, and the hash reads every pixel once anyway.
    */
  private def reorient(img: java.awt.image.BufferedImage,
                       o: Int): java.awt.image.BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val swap = o >= 5 // transposes and 90/270 rotations swap axes
    val out = new java.awt.image.BufferedImage(
      if (swap) h else w, if (swap) w else h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dy) = o match {
          case 2 => (w - 1 - x, y)         // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y) // rotate 180
          case 4 => (x, h - 1 - y)         // mirror vertical
          case 5 => (y, x)                 // transpose
          case 6 => (h - 1 - y, x)         // rotate 90 CW to display
          case 7 => (h - 1 - y, w - 1 - x) // transverse
          case _ => (y, w - 1 - x)         // 8: rotate 270 CW
        }
        out.setRGB(dx, dy, img.getRGB(x, y))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-PAGE dHashes of a multi-image container — multi-page TIFF
    * (the scanner class's other shipping form) and animated GIF
    * frames, via the reader's own page index; single-image payloads
    * yield one hash, undecodable pages drop. Pairs with
    * [[graft.engine.read.Pdf.images]]' hashes so a 3-page scanned
    * TIFF dedups against its 3-page PDF sibling page by page.
    */
  def pageDhashes64(bytes: Array[Byte]): Seq[Long] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    // single-image magic-routed formats (no ImageIO reader)
    if (WebP.isWebP(bytes) || Ico.isIco(bytes))
      return dhash64(bytes).toSeq
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        // no raster reader: a PDF's embedded images ARE its pages in
        // this keyspace (Pdf.images cheap-refuses everything else),
        // so one column serves TIFF books and PDF scans alike
        return graft.engine.read.Pdf.images(bytes)
          .flatMap(i => dhash64(i.bytes))
      val r = readers.next()
      try {
        r.setInput(iis, false, true)
        val n = try math.max(1, r.getNumImages(true))
        catch { case _: Exception => 1 }
        (0 until math.min(n, 256)).flatMap { i =>
          try dhash64FromImage(r.read(i))
          catch { case _: Exception => None } // torn page: drops
        }
      } finally r.dispose()
    } catch { case _: Exception => Seq.empty }
    finally iis.close()
  }

  private val dhashUdf = udf { (bytes: Array[Byte]) =>
    dhash64(bytes).map(java.lang.Long.valueOf).orNull
  }

  private val pageDhashesUdf = udf { (bytes: Array[Byte]) =>
    pageDhashes64(bytes)
  }

  /** [[pageDhashes64]] as a column (`array<bigint>`, empty when
    * nothing decodes).
    */
  def pageDhashes(bytesCol: Column): Column = pageDhashesUdf(bytesCol)

  private val orientedDhashUdf = udf { (bytes: Array[Byte]) =>
    orientedDhash64(bytes).map(java.lang.Long.valueOf).orNull
  }

  /** [[orientedDhash64]] as a column (NULL when undecodable). */
  def orientedDhash(bytesCol: Column): Column = orientedDhashUdf(bytesCol)

  /** dHash as a column over binary image content (NULL when
    * undecodable — callers decide drop-vs-report, like ImageProbe).
    */
  def dhash(bytesCol: Column): Column = dhashUdf(bytesCol)

  /** Side of the luma grid pHash transforms (32×32, the published
    * size) and of the retained low-frequency block (8×8 → 64 bits).
    */
  val PhashGrid = 32
  val PhashBlock = 8

  /** Box-averaged integer luma grid (the dhash cell kernel at
    * `side`×`side`) — shared so both hashes downscale identically.
    */
  private def lumaGrid(img: java.awt.image.BufferedImage,
                       side: Int): Array[Array[Double]] = {
    val w = img.getWidth
    val h = img.getHeight
    val cells = Array.ofDim[Double](side, side)
    var cy = 0
    while (cy < side) {
      val y0 = (cy.toLong * h / side).toInt
      val y1 = math.max(((cy + 1).toLong * h / side).toInt, y0 + 1)
      var cx = 0
      while (cx < side) {
        val x0 = (cx.toLong * w / side).toInt
        val x1 = math.max(((cx + 1).toLong * w / side).toInt, x0 + 1)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sum += (299L * r + 587L * g + 114L * b) / 1000L
            n += 1
            x += 1
          }
          y += 1
        }
        cells(cy)(cx) = if (n == 0) 0.0 else sum.toDouble / n
        cx += 1
      }
      cy += 1
    }
    cells
  }

  /** 64-bit pHash (DCT hash, public algorithm: Krawetz 2011, "Looks
    * Like It"; the python `imagehash` formulation): decode → 32×32
    * box-averaged luma → 2-D DCT-II (orthonormal, separable; plain
    * O(n³) matrix form — n = 32, cost is trivial next to the decode) →
    * keep the top-left 8×8 low-frequency block → one bit per AC
    * coefficient, `coef > median(AC block)`, packed row-major
    * MSB-first with the DC slot fixed to 0 (DC is brightness, not
    * structure; excluding it keeps the hash brightness-invariant and
    * makes the flat image exactly 0).
    *
    * Deterministic everywhere: JVM floating point is strict (JLS 17+),
    * the DCT basis is computed identically on every executor, and the
    * median of 64 doubles has no tie-order dependence (ties produce
    * `false` bits on both sides of the comparison).
    *
    * dHash vs pHash in this library: dHash is ~3× cheaper and catches
    * re-encodes/resizes; pHash's frequency basis additionally survives
    * small blurs, gamma shifts and uniform contrast changes (any
    * positive linear luma map scales every coefficient together, so
    * the `> median` bits are invariant — spec-pinned).
    */
  def phash64(bytes: Array[Byte]): Option[Long] = {
    val img = ImageDecode.decode(bytes).orNull
    if (img == null) return None
    if (img.getWidth < 1 || img.getHeight < 1) return None
    val n = PhashGrid
    val cells = lumaGrid(img, n)
    // DCT-II along rows then columns with the orthonormal basis
    // C(k) = sqrt((k==0 ? 1 : 2) / n) * cos(pi * (2x + 1) * k / (2n))
    val basis = Array.tabulate(n, n) { (k, x) =>
      math.sqrt((if (k == 0) 1.0 else 2.0) / n) *
        math.cos(math.Pi * (2 * x + 1) * k / (2.0 * n))
    }
    val m = PhashBlock
    val rowPass = Array.ofDim[Double](n, m)
    var y = 0
    while (y < n) {
      var k = 0
      while (k < m) {
        var s = 0.0
        var x = 0
        while (x < n) { s += basis(k)(x) * cells(y)(x); x += 1 }
        rowPass(y)(k) = s
        k += 1
      }
      y += 1
    }
    val block = Array.ofDim[Double](m, m)
    var ky = 0
    while (ky < m) {
      var kx = 0
      while (kx < m) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += basis(ky)(yy) * rowPass(yy)(kx); yy += 1 }
        block(ky)(kx) = s
        kx += 1
      }
      ky += 1
    }
    // Bits over the 63 AC coefficients only (DC carries brightness,
    // not structure; its slot packs as 0). Coefficients within 1e-8 ×
    // |DC| of zero snap to exactly 0 first: a flat or near-flat image's
    // AC terms are fp noise around 0, and without the snap the median
    // comparison would turn that noise into pseudorandom bits. The
    // snap threshold is RELATIVE to DC, so it scales with any uniform
    // contrast map and preserves the invariance property.
    val dcMag = math.max(1.0, math.abs(block(0)(0)))
    val flat = new Array[Double](m * m)
    var i = 0
    while (i < m * m) {
      val c = block(i / m)(i % m)
      flat(i) = if (math.abs(c) < 1e-8 * dcMag) 0.0 else c
      i += 1
    }
    val ac = java.util.Arrays.copyOfRange(flat, 1, m * m)
    java.util.Arrays.sort(ac)
    val median = ac(ac.length / 2) // middle of 63
    var hash = 0L
    i = 0
    while (i < m * m) {
      hash = (hash << 1) |
        (if (i > 0 && flat(i) > median) 1L else 0L)
      i += 1
    }
    Some(hash)
  }

  private val phashUdf = udf { (bytes: Array[Byte]) =>
    phash64(bytes).map(java.lang.Long.valueOf).orNull
  }

  /** pHash as a column over binary image content (NULL when
    * undecodable). Everything downstream of a 64-bit hash —
    * [[nearDuplicatesByHash]], [[buildImageIndex]]'s banding,
    * [[dropNearDuplicateImages]]'s probe — is hash-agnostic and works
    * unchanged on pHash values.
    */
  def phash(bytesCol: Column): Column = phashUdf(bytesCol)

  /** Hamming distance between two 64-bit hash columns. */
  def hamming(a: Column, b: Column): Column =
    F.hamming(a, b).cast("int")

  /** The shared block decomposition: `maxHamming + 1` contiguous bit
    * ranges as one exploded `(blk, key)` struct array. Width 64 (the
    * maxHamming = 0 single-block case) needs the explicit -1L mask —
    * `(1L << 64) - 1` silently wraps to 0 on the JVM (shifts are mod
    * 64) and would collapse every key to 0, degenerating the banded
    * equi-join into a cross join.
    */
  private[multimodal] def bandStructs(h: Column, maxHamming: Int): Column = {
    val nBlocks = maxHamming + 1
    val blocks = (0 until nBlocks).map { k =>
      val lo = k * 64 / nBlocks
      val hi = (k + 1) * 64 / nBlocks
      (k, lo, hi - lo)
    }
    array(blocks.map { case (k, lo, width) =>
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(k).as("blk"),
        shiftrightunsigned(h, lo).bitwiseAND(lit(mask)).as("key"))
    }: _*)
  }

  /** Drop `(blk, key)` buckets holding more than `maxBucket` hashes —
    * the SimHash skew cap ([[graft.ops.Dedup]]): crawls are full of
    * blank/flat placeholder images that all hash identically, and one
    * such bucket would otherwise emit a quadratic pair explosion
    * through a single reducer. Pairs inside a dropped bucket can
    * still meet through their other blocks; a pair ONLY reachable via
    * over-cap buckets is missed — the documented recall trade, sized
    * by the cap.
    */
  private[multimodal] def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    val hot = banded.groupBy("__blk", "__key")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBucket)
      .select("__blk", "__key")
    banded.join(broadcast(hot), Seq("__blk", "__key"), "left_anti")
  }

  /** Near-duplicate pairs among pre-computed 64-bit hashes:
    * `(id_a, id_b, hamming)` with `id_a < id_b`, Hamming ≤
    * `maxHamming`. Banded candidate generation (blocks =
    * `maxHamming + 1`, contiguous bit ranges) + exact verify; each
    * pair is emitted once (DISTINCT over banded matches — a close
    * pair can share several blocks).
    */
  def nearDuplicatesByHash(df: DataFrame, idCol: String, hashCol: String,
                           maxHamming: Int,
                           maxBucket: Int = 1 << 12): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    require(maxBucket >= 1, s"maxBucket must be positive: $maxBucket")
    val banded = capBuckets(
      df.select(col(idCol).as("__id"), col(hashCol).as("__h"),
          explode(bandStructs(col(hashCol), maxHamming)).as("__band"))
        .select(col("__id"), col("__h"),
          col("__band.blk").as("__blk"), col("__band.key").as("__key")),
      maxBucket)
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.__blk") === col("b.__blk") &&
          col("a.__key") === col("b.__key") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        hamming(col("a.__h"), col("b.__h")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** End-to-end image near-dup: hash the binary column, then
    * [[nearDuplicatesByHash]]. Undecodable images drop out (they can
    * match nothing).
    */
  def nearDuplicateImages(df: DataFrame, idCol: String, bytesCol: String,
                          maxHamming: Int = 4): DataFrame = {
    val hashed = df
      .select(col(idCol).as("img_id"), dhash(col(bytesCol)).as("dhash"))
      .filter(col("dhash").isNotNull)
    nearDuplicatesByHash(hashed, "img_id", "dhash", maxHamming)
  }

  /** Persisted image signature index — `(img_id, dhash)` rows, the
    * image analogue of the text MinHash signature index
    * ([[graft.ops.Dedup]]): build once over the seen corpus, append
    * per batch (`write.mode("append")`), and incoming batches probe it
    * WITHOUT ever re-decoding a seen pixel. Undecodable images are
    * absent (they can never match).
    */
  def buildImageIndex(df: DataFrame, idCol: String, bytesCol: String)
  : DataFrame =
    df.select(col(idCol).as("img_id"), dhash(col(bytesCol)).as("dhash"))
      .filter(col("dhash").isNotNull)

  /** Incremental image dedup: drop batch images within `maxHamming`
    * bits of ANY index entry. The batch is hashed once; both sides
    * band into `maxHamming + 1` blocks and equi-join on `(block,
    * key)` (pigeonhole recall 1), the exact popcount verify runs on
    * the candidates, and a left-anti join returns the survivors with
    * their original columns. Only 8-byte hashes shuffle; the index
    * side's pixels were paid for when it was built. Undecodable batch
    * images SURVIVE (nothing to match them by — route them to a
    * validator, not the dedupper).
    */
  def dropNearDuplicateImages(batch: DataFrame, index: DataFrame,
                              idCol: String, bytesCol: String,
                              maxHamming: Int = 4,
                              maxBucket: Int = 1 << 12): DataFrame = {
    require(index.columns.toSeq.contains("img_id") &&
      index.columns.toSeq.contains("dhash"),
      "index must be a buildImageIndex frame with (img_id, dhash)")
    val hashed = batch.withColumn("__graft_dh", dhash(col(bytesCol)))
    dropNearDuplicatesByHash(hashed, index, idCol, "__graft_dh", "dhash",
        maxHamming, maxBucket)
      .drop("__graft_dh")
  }

  /** The generic incremental face over PRECOMPUTED 64-bit hashes —
    * the medium-agnostic core of [[dropNearDuplicateImages]], shared
    * with audio ([[AudioFingerprint.dropNearDuplicateAudio]]) and any
    * other 64-bit perceptual signature: drop `batch` rows whose
    * `batchHashCol` is within `maxHamming` bits of any `indexHashCol`
    * value. Batch rows with a NULL hash SURVIVE (nothing to match
    * them by — route them to a validator, not the dedupper); the
    * skew cap applies to the SEEN side, where a crawl's million
    * identical placeholders accumulate.
    */
  def dropNearDuplicatesByHash(batch: DataFrame, index: DataFrame,
                               idCol: String, batchHashCol: String,
                               indexHashCol: String,
                               maxHamming: Int = 4,
                               maxBucket: Int = 1 << 12): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64): $maxHamming")
    require(maxBucket >= 1, s"maxBucket must be positive: $maxBucket")
    val probe = batch.filter(col(batchHashCol).isNotNull)
      .select(col(idCol).as("__bid"), col(batchHashCol).as("__bh"),
        explode(bandStructs(col(batchHashCol), maxHamming)).as("__band"))
    val seen = capBuckets(
      index.filter(col(indexHashCol).isNotNull)
        .select(col(indexHashCol).as("__sh"),
          explode(bandStructs(col(indexHashCol), maxHamming)).as("__sband"))
        .select(col("__sh"), col("__sband.blk").as("__blk"),
          col("__sband.key").as("__key")),
      maxBucket)
    val dupIds = probe.join(seen,
        col("__band.blk") === col("__blk") &&
          col("__band.key") === col("__key"))
      .filter(F.hamming(col("__bh"), col("__sh"))
        .cast("int") <= maxHamming)
      .select(col("__bid")).distinct()
    batch.join(dupIds, col(idCol) === col("__bid"), "left_anti")
  }
}
