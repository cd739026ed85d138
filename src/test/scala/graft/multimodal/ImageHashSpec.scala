package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def grayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhash64: hand-derived bit patterns on 9x8 gray images") {
    // one pixel per grid cell: bits read straight off the pixel table
    assert(ImageHash.dhash64(grayPng(9, 8, (x, _) => 28 * x)) ==
      Some(-1L)) // strictly increasing rows -> all ones
    assert(ImageHash.dhash64(grayPng(9, 8, (_, _) => 77)) == Some(0L))
    assert(ImageHash.dhash64(
      grayPng(9, 8, (x, _) => if (x % 2 == 1) 255 else 0)) ==
      Some(0xAAAAAAAAAAAAAAAAL))
  }

  test("dhash64: scale invariance and decode failure") {
    val small = ImageHash.dhash64(grayPng(9, 8, (x, _) => 28 * x))
    val big = ImageHash.dhash64(grayPng(36, 32, (x, _) => 7 * x))
    // same gradient at 4x the resolution -> identical hash
    assert(small == big && small.isDefined)
    assert(ImageHash.dhash64(Array[Byte](1, 2, 3)) == None)
    assert(ImageHash.dhash64(Array.empty[Byte]) == None)
    assert(ImageHash.dhash64(null) == None)
    // the Column form yields NULL for undecodable payloads
    val out = Seq((1L, grayPng(9, 8, (_, _) => 9)), (2L, Array[Byte](0)))
      .toDF("id", "content")
      .select($"id", ImageHash.dhash($"content").as("h"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L))
  }

  /** Minimal little-endian EXIF APP1 (one IFD0 entry: Orientation) —
    * a second independent TIFF transcription, spliced after a real
    * JPEG's SOI so the payload both decodes AND declares rotation.
    */
  private def withOrientation(jpeg: Array[Byte], o: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16(v >>> 16)
    val tiff = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++
      le16(1) ++
      le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(o) ++ le16(0) ++
      le32(0)
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = app1.length + 2
    jpeg.take(2) ++ Array(0xFF.toByte, 0xE1.toByte,
      (len >> 8).toByte, (len & 0xFF).toByte) ++ app1 ++ jpeg.drop(2)
  }

  private def grayJpeg(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("orientedDhash64: every EXIF orientation undoes to the upright " +
    "hash; plain dhash cannot see it") {
    // upright: the strictly-increasing 28-step ramp (hash -1); the
    // step dwarfs JPEG noise so every comparison stays stable.
    // STORED pixels for orientation o, from the TIFF 6.0 wording
    // (independent of ImageHash.reorient): stored(x,y) sits at
    // visual position computed here.
    val up = (x: Int, _: Int) => 28 * x
    def stored(o: Int): Array[Byte] = {
      val (w, h) = if (o >= 5) (8, 9) else (9, 8)
      grayJpeg(w, h, (x, y) => o match {
        case 2 => up(9 - 1 - x, y)         // visually mirrored H
        case 3 => up(9 - 1 - x, 8 - 1 - y) // 180
        case 4 => up(x, 8 - 1 - y)         // mirrored V
        // o >= 5: stored dims are (8 wide, 9 tall) — the visual axes
        // swap, so the constants below are the STORED height/width
        case 5 => up(y, x)                 // transpose
        case 6 => up(9 - 1 - y, x)         // needs 90 CW to display
        case 7 => up(9 - 1 - y, 8 - 1 - x) // transverse
        case _ => up(y, 8 - 1 - x)         // 8: needs 270 CW
      })
    }
    for (o <- 2 to 8) {
      val b = withOrientation(stored(o), o)
      assert(ImageHash.orientedDhash64(b) == Some(-1L), s"orientation $o")
    }
    // plain dhash on the o=6 stored form reads the vertical gradient
    // (rows constant): NOT the upright hash
    assert(ImageHash.dhash64(withOrientation(stored(6), 6)) != Some(-1L))
    // no tag / orientation 1: oriented == plain
    val plainJpeg = grayJpeg(9, 8, up)
    assert(ImageHash.orientedDhash64(plainJpeg) ==
      ImageHash.dhash64(plainJpeg))
    assert(ImageHash.orientedDhash64(withOrientation(plainJpeg, 1)) ==
      ImageHash.dhash64(plainJpeg))
    // undecodable: None; the column face is NULL
    assert(ImageHash.orientedDhash64(Array[Byte](1, 2)) == None)
    val out = Seq((1L, withOrientation(stored(6), 6)), (2L, Array[Byte](0)))
      .toDF("id", "content")
      .select($"id", ImageHash.orientedDhash($"content").as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(-1L) && out(2L).isEmpty)
  }

  test("pageDhashes64: multi-page TIFF and GIF frames hash per page; " +
    "singles yield one") {
    import graft.queries.TiffFixture
    val two = TiffFixture.multiPageRgbTiff(Seq(
      (9, 8, (i: Int) => 28 * (i % 9)),
      (9, 8, (_: Int) => 77)))
    assert(ImageHash.pageDhashes64(two) == Seq(-1L, 0L))
    // page order matters: the reversed book is a different document
    val rev = TiffFixture.multiPageRgbTiff(Seq(
      (9, 8, (_: Int) => 77),
      (9, 8, (i: Int) => 28 * (i % 9))))
    assert(ImageHash.pageDhashes64(rev) == Seq(0L, -1L))
    // single-page TIFF / PNG: one hash, equal to dhash64
    val one = TiffFixture.rgbTiff(9, 8, i => 28 * (i % 9))
    assert(ImageHash.pageDhashes64(one) == Seq(-1L))
    val png = grayPng(9, 8, (x, _) => 28 * x)
    assert(ImageHash.pageDhashes64(png) == Seq(-1L))
    // animated GIF: one hash per frame
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios); w.prepareWriteSequence(null)
    for (_ <- 0 until 3) {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9)
        img.setRGB(x, y, 0x4D4D4D)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    assert(ImageHash.pageDhashes64(bos.toByteArray) == Seq(0L, 0L, 0L))
    // PDFs join the same keyspace: embedded images ARE the pages
    val pdf = graft.queries.PdfFixture.imagePdf(Seq(("A",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      graft.queries.PdfFixture.flate(
        Array.tabulate[Byte](72)(i => (28 * (i % 9)).toByte)))))
    assert(ImageHash.pageDhashes64(pdf) == Seq(-1L))
    // junk/null: empty, never a throw; torn second page drops it
    assert(ImageHash.pageDhashes64("junk".getBytes).isEmpty)
    assert(ImageHash.pageDhashes64(null).isEmpty)
    val torn = java.util.Arrays.copyOfRange(two, 0, two.length - 40)
    assert(ImageHash.pageDhashes64(torn).headOption.contains(-1L))
  }

  test("nearDuplicatesByHash: recall-1 banding, exact verify, one row per pair") {
    val rows = Seq(
      (1L, 0L), (2L, 1L), // hamming 1
      (3L, 0xFFL), // hamming(1,3)=7, (2,3)=7 -> out at max 4; (3,4) = 0
      (4L, 0xFFL),
      (5L, 0xFFFFFFFFFFFFFFFFL)) // far from everything except 3,4? 56 bits
    val out = ImageHash.nearDuplicatesByHash(
        rows.toDF("id", "h"), "id", "h", maxHamming = 4)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 2L, 1), (3L, 4L, 0)))
    intercept[IllegalArgumentException] {
      ImageHash.nearDuplicatesByHash(rows.toDF("id", "h"), "id", "h", 64)
    }
  }

  test("nearDuplicateImages: retouched and resized copies pair up") {
    val stripes = (x: Int, _: Int) => if (x % 2 == 1) 255 else 0
    val df = Seq(
      (10L, grayPng(9, 8, stripes)),
      (11L, grayPng(9, 8, (x, y) =>
        if (x == 0 && y == 0) 255 else stripes(x, y))),
      (12L, grayPng(9, 8, (x, _) => 28 * x)),
      (13L, Array[Byte](9, 9, 9))) // undecodable drops out
      .toDF("img_id", "content")
    val pairs = ImageHash.nearDuplicateImages(df, "img_id", "content", 4)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((10L, 11L, 1)))
  }

  test("image index: append-equivalence and pass-through of undecodables") {
    val stripes = (x: Int, _: Int) => if (x % 2 == 1) 255 else 0
    val seenA = Seq((100L, grayPng(9, 8, stripes))).toDF("img_id", "content")
    val seenB = Seq((101L, grayPng(9, 8, (x, _) => 28 * x)))
      .toDF("img_id", "content")
    val batch = Seq(
      (1L, grayPng(9, 8, stripes)), // dup of seen 100
      (2L, grayPng(18, 16, (x, _) => 14 * x)), // resized dup of seen 101
      (3L, grayPng(9, 8, (_, _) => 50)), // novel
      (4L, Array[Byte](1))) // undecodable -> survives
      .toDF("img_id", "content")
    // one-shot index == appended per-batch indexes
    val oneShot = ImageHash.buildImageIndex(
      seenA.union(seenB), "img_id", "content")
    val appended = ImageHash.buildImageIndex(seenA, "img_id", "content")
      .union(ImageHash.buildImageIndex(seenB, "img_id", "content"))
    for (idx <- Seq(oneShot, appended)) {
      val kept = ImageHash.dropNearDuplicateImages(batch, idx,
          "img_id", "content", 4)
        .select("img_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(3L, 4L))
    }
    intercept[IllegalArgumentException] {
      ImageHash.dropNearDuplicateImages(batch,
        seenA.withColumnRenamed("content", "c2"), "img_id", "content", 4)
    }
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("phash64: flat image hashes to 0 and undecodables to None") {
    // all-equal luma -> every DCT coefficient equals the median ->
    // every strict '>' bit false
    assert(ImageHash.phash64(grayPng(40, 40, (_, _) => 128)) == Some(0L))
    assert(ImageHash.phash64(Array[Byte](9, 9)) == None)
    assert(ImageHash.phash64(null) == None)
  }

  /** Pseudorandom 8×8-pixel blocks — broad spectrum WITH low-frequency
    * energy, the content class pHash is built for (pure high-frequency
    * texture like a fine checkerboard lives outside the kept 8×8 DCT
    * block by design).
    */
  private def blocky(mul: Int)(x: Int, y: Int): Int =
    20 + ((x / 8) * mul + (y / 8) * 17) % 90

  test("phash64: invariant under uniform contrast scaling, unlike raw luma") {
    // doubling every luma value scales each DCT coefficient AND the
    // median by exactly 2 (exact in binary fp), and the zero-snap
    // threshold is relative to DC — every comparison bit is preserved
    val base = ImageHash.phash64(grayPng(64, 64, blocky(31)))
    val scaled = ImageHash.phash64(grayPng(64, 64,
      (x, y) => 2 * blocky(31)(x, y)))
    assert(base.isDefined && base == scaled)
    assert(base.get != 0L)
  }

  test("phash64: brightness shift exact, resize stable, inversion far") {
    val a = ImageHash.phash64(grayPng(64, 64, blocky(31))).get
    // +40 luma everywhere moves ONLY the (excluded) DC term
    val bright = ImageHash.phash64(grayPng(64, 64,
      (x, y) => blocky(31)(x, y) + 40)).get
    assert(a == bright)
    // same pattern rendered at 2x the resolution
    val big = ImageHash.phash64(grayPng(128, 128,
      (x, y) => blocky(31)(x / 2, y / 2))).get
    assert(hamming(a, big) <= 6, s"resize moved ${hamming(a, big)} bits")
    // inversion negates every AC coefficient: non-tied bits flip
    val inv = ImageHash.phash64(grayPng(64, 64,
      (x, y) => 255 - blocky(31)(x, y))).get
    assert(hamming(a, inv) >= 24, s"inversion only moved ${hamming(a, inv)} bits")
    // an unrelated pseudorandom pattern is far
    val other = ImageHash.phash64(grayPng(64, 64, blocky(53))).get
    assert(hamming(a, other) >= 16, s"unrelated at ${hamming(a, other)} bits")
  }

  test("phash plugs into the hash-agnostic near-dup machinery") {
    val df = Seq(
      (1L, grayPng(64, 64, blocky(31))),
      (2L, grayPng(64, 64, (x, y) => blocky(31)(x, y) + 11)), // brightness shift
      (3L, grayPng(64, 64, blocky(53)))) // unrelated
      .toDF("img_id", "content")
    val hashed = df.select($"img_id",
      ImageHash.phash($"content").as("ph")).filter($"ph".isNotNull)
    val pairs = ImageHash.nearDuplicatesByHash(hashed, "img_id", "ph", 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
