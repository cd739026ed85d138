package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media travel as opaque `binary` columns
  * with typed metadata alongside. The real decode (image/audio libs)
  * is not available in this container, so the "decode" here is a
  * QUERY-LOCAL deterministic pseudo-decode expressed as column ops:
  * byte length, content hash, and character-derived pseudo-dimensions.
  * (Deliberately NOT [[graft.multimodal.MediaDecoder.decodeStub]]'s
  * byte-based formula — `ascii()` works on codepoints and is what the
  * DuckDB oracle can mirror exactly; the stub decoder has its own unit
  * tests.) What the query proves end-to-end: binary payloads flow
  * through scans/groupBys without materializing on the driver, and
  * metadata extraction is a single codegen'd pass.
  */
object MultimodalQueries {

  /** m4 fixture: REAL encoded images (png/jpg/gif/bmp via ImageIO) plus
    * the three failure classes, with the expected dimensions/diagnosis
    * stored alongside the bytes at generation time — the m3
    * stored-expected-columns pattern. Spark must recover (w, h) from
    * the BYTES through the real [[graft.engine.validate.ImageProbe]]
    * header read (`image_validator.py:187-225`); the oracle just reads
    * the expected columns back. */
  private val m4Dir = "/tmp/graft_gate_m4_images"

  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** m10/m11 fixture: gray PNGs authored pixel-by-pixel so every dHash
    * bit is hand-derivable. Gray pixels make luma EXACT (r=g=b=v →
    * (299v+587v+114v)/1000 = v), and 9×8 images map one pixel per
    * hash-grid cell (no averaging), so the bit rules read straight off
    * the pixel table:
    *
    *  - img 0 "grad9":   v(x,y) = 28·x, strictly increasing rows →
    *    every left<right bit 1 → hash 0xFFFFFFFFFFFFFFFF (= -1L);
    *  - img 1 "flat":    v = 77 everywhere → no strict increase →
    *    hash 0L;
    *  - img 2 "stripes": v = 255 for odd x else 0 → row bits
    *    10101010 (j even: 0<255 → 1; j odd: 255<0 → 0) → 0xAA per
    *    row → hash 0xAAAAAAAAAAAAAAAAL (= -6148914691236517206);
    *  - img 3 "stripes1px": stripes with pixel (0,0) set to 255 →
    *    row 0 cells 255,255,0,… flips ONLY bit j=0 (255<255 false)
    *    → row 0 = 0x2A → hash 0x2AAAAAAAAAAAAAAAL
    *    (= 3074457345618258602); Hamming to img 2 = 1;
    *  - img 4 "grad18":  18×16, v(x,y) = 14·x — each 2×2 box
    *    averages to exact means that stay strictly increasing
    *    left-to-right → all bits 1 → hash -1L; Hamming to img 0 = 0
    *    (scale-invariance: same picture at 2× resolution);
    *  - img 5 "broken":  truncated bytes → NULL hash, drops out.
    *
    * Expected near-dup pairs at maxHamming = 4: (0,4) hamming 0 and
    * (2,3) hamming 1 — every other pair is ≥ 31 bits apart
    * (flat↔stripes flips stripes' 32 one-bits, grad↔stripes its 32
    * zero-bits, flat↔stripes1px the 31 one-bits of 0x2AAA…).
    */
  private def grayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = v(x, y) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  private val m13Dir = "/tmp/graft_gate_m13_phash"

  /** Pseudorandom 8×8-pixel gray blocks (the ImageHashSpec pattern) —
    * broad spectrum with low-frequency energy, pHash's content class.
    */
  private def blockyPng(side: Int, scale: Int, mul: Int,
                        shift: Int = 0): Array[Byte] =
    grayPng(side, side, (x, y) =>
      20 + shift + (((x / scale) / 8 * mul + ((y / scale) / 8) * 17) % 90))

  /** m13 fixture — every expectation theory-derived:
    *  - img1 = img0 + uniform brightness: only the EXCLUDED DC term
    *    moves → identical hash;
    *  - img2 = img0 rendered at 2× resolution with 2×2 pixel
    *    replication: every 32×32 box-average cell lies fully inside
    *    one replicated block on BOTH sizes (8 | cell boundaries), so
    *    the luma grids are IDENTICAL → identical hash;
    *  - img3 = a different pseudorandom block pattern → far (≥16 bits,
    *    spec-pinned for these exact constants);
    *  - img4 = flat → zero AC energy → hash 0, and popcount(base) ≈ 31
    *    bits away from img0;
    *  - img5 = truncated bytes → undecodable → NULL → -1 sentinels.
    */
  private def writeM13Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (0L, blockyPng(64, 1, 31)),
      (1L, blockyPng(64, 1, 31, shift = 11)),
      (2L, blockyPng(128, 2, 31)),
      (3L, blockyPng(64, 1, 53)),
      (4L, grayPng(64, 64, (_, _) => 128)),
      (5L, blockyPng(64, 1, 31).take(24)))
    s.createDataset(rows).toDF("img_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m13Dir)
  }

  private val m10Dir = "/tmp/graft_gate_m10_images"

  private def writeM10Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val stripes = (x: Int, _: Int) => if (x % 2 == 1) 255 else 0
    val rows: Seq[(Long, Array[Byte], Long)] = Seq(
      (0L, grayPng(9, 8, (x, _) => 28 * x), -1L),
      (1L, grayPng(9, 8, (_, _) => 77), 0L),
      (2L, grayPng(9, 8, stripes), 0xAAAAAAAAAAAAAAAAL),
      (3L, grayPng(9, 8, (x, y) =>
        if (x == 0 && y == 0) 255 else stripes(x, y)),
        0x2AAAAAAAAAAAAAAAL),
      (4L, grayPng(18, 16, (x, _) => 14 * x), -1L))
    val broken = Seq((5L, rows.head._2.take(20), -999L))
    s.createDataset(rows ++ broken)
      .toDF("img_id", "content", "exp_hash")
      .coalesce(1).write.mode("overwrite").parquet(m10Dir)
  }

  private def writeM4Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val good: Seq[(Long, Array[Byte], Option[Int], Option[Int], String)] =
      for {
        (fmt, fi) <- Seq("png", "jpg", "gif", "bmp").zipWithIndex
        i <- 0 until 5
        w = 16 + 13 * i + fi
        h = 16 + 7 * i
      } yield ((fi * 10 + i).toLong, encodeImage(fmt, w, h),
        Some(w), Some(h), "ok")
    // Failure classes, matching ImageProbe.diagnose verbatim: empty
    // payload; non-image bytes; a PNG truncated mid-IHDR (signature
    // matches so a reader is selected, but the header read fails).
    val bad: Seq[(Long, Array[Byte], Option[Int], Option[Int], String)] = Seq(
      (100L, Array.emptyByteArray, None, None, "file is empty"),
      (101L, "definitely not an image".getBytes("UTF-8"), None, None,
        "not a recognized image format"),
      (102L, encodeImage("png", 32, 32).take(20), None, None,
        "image header could not be decoded"))
    s.createDataset(good ++ bad)
      .toDF("img_id", "payload", "exp_w", "exp_h", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m4Dir)
  }

  // -- m70 fixture: HEIC/AVIF metadata probe — the two dominant
  //    modern image classes ImageIO cannot see; containers from the
  //    INDEPENDENT HeifFixture box writer. Dimensions resolve the
  //    PRIMARY item via pitm+ipma (a phone HEIC leads with its
  //    thumbnail's ispe); pixel decode is a recorded skip. ----------
  private val m70Dir = "/tmp/graft_gate_m70_heif"

  private def writeM70Fixture(s: SparkSession): Unit = {
    import s.implicits._
    // phone shape: thumbnail ispe before the primary's in ipco
    val heic = HeifFixture.heif("heic", Seq("mif1", "heic"), Some(1),
      Seq(HeifFixture.codecConfig("hvcC"),
        HeifFixture.ispe(32, 24), HeifFixture.ispe(4032, 3024)),
      Seq(1 -> Seq(1, 3), 2 -> Seq(1, 2)))
    val avif = HeifFixture.heif("avif", Seq("avif", "mif1"), Some(1),
      Seq(HeifFixture.codecConfig("av1C"), HeifFixture.ispe(123, 77)),
      Seq(1 -> Seq(1, 2)))
    val bare = HeifFixture.heif("mif1", Seq("mif1"), Some(1),
      Seq(HeifFixture.ispe(640, 480)), Seq(1 -> Seq(1)))
    val torn = java.util.Arrays.copyOfRange(heic, 0, 40)
    val rows: Seq[(Long, Array[Byte], String, Int, Int, String)] = Seq(
      (0L, heic, "heic", 4032, 3024, "ok"),
      (1L, avif, "avif", 123, 77, "ok"),
      (2L, bare, "heif", 640, 480, "ok"),
      (3L, torn, "heic", -1, -1, "image header could not be decoded"),
      (4L, encodeImage("png", 9, 8), "other", 9, 8, "ok"),
      (5L, "not media".getBytes("UTF-8"), "other", -1, -1,
        "not a recognized image format"))
    s.createDataset(rows).toDF("img_id", "payload", "exp_format",
        "exp_w", "exp_h", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m70Dir)
  }

  // -- m73 fixture: web image classes — ICO favicons (BMP-DIB and
  //    PNG members, via the independent IcoFixture writer over the
  //    JDK's own BMP encoding) through the SAME decode/dHash kernels
  //    as every raster format, and SVG dimension inventory
  //    (rasterization is a recorded skip). The ICO ramp carries the
  //    SAME dhash literal as its bare PNG twin row. -----------------
  private val m73Dir = "/tmp/graft_gate_m73_webimg"

  private def writeM73Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def dhashOfRows(v: Int => Int): Long = {
      var hash = 0L
      for (_ <- 0 until 8; j <- 0 until 8)
        hash = (hash << 1) | (if (v(j) < v(j + 1)) 1L else 0L)
      hash
    }
    val rampDhash = dhashOfRows(x => 10 * x)
    def rampBuf(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = 10 * (x % 9); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt")
      bos.toByteArray
    }
    val flat16 = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x4D4D4D)
      img
    }
    val icoBmp = IcoFixture.ico(Seq(
      (9, 8, IcoFixture.dibOf(enc(rampBuf(9, 8), "bmp")))))
    val icoPng = IcoFixture.ico(Seq((16, 16, enc(flat16, "png"))))
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long)] = Seq(
      (0L, icoBmp, "ico", 9, 8, rampDhash),
      (1L, icoPng, "ico", 16, 16, 0L),
      (2L, "<svg width=\"64\" height=\"32\"><rect/></svg>"
        .getBytes("UTF-8"), "svg", 64, 32, -999L),
      (3L, ("<?xml version=\"1.0\"?><!-- logo --><svg viewBox=" +
        "\"0 0 120 80\"/>").getBytes("UTF-8"), "svg", 120, 80, -999L),
      (4L, "<svg width=\"100%\" height=\"100%\"/>".getBytes("UTF-8"),
        "svg", -1, -1, -999L),
      (5L, enc(rampBuf(9, 8), "png"), "other", 9, 8, rampDhash),
      (6L, "no image here".getBytes("UTF-8"), "other", -1, -1, -999L))
    s.createDataset(rows).toDF("img_id", "payload", "exp_format",
        "exp_w", "exp_h", "exp_dhash")
      .coalesce(1).write.mode("overwrite").parquet(m73Dir)
  }

  // -- m74 fixture: EXIF-oriented dedup — phone photos STORED
  //    rotated/mirrored with orientation tag 2/3/6 hash like their
  //    upright twin under image_dhash_oriented; plain no-tag rows are
  //    unchanged. The APP1 splice is an independent minimal TIFF
  //    (one Orientation entry) after a real JDK JPEG's SOI. ---------
  private val m74Dir = "/tmp/graft_gate_m74_oriented"

  private def writeM74Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16(v >>> 16)
    def withOrientation(jpeg: Array[Byte], o: Int): Array[Byte] = {
      val tiff = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++
        le16(1) ++
        le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(o) ++ le16(0) ++
        le32(0)
      val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val len = app1.length + 2
      jpeg.take(2) ++ Array(0xFF.toByte, 0xE1.toByte,
        (len >> 8).toByte, (len & 0xFF).toByte) ++ app1 ++ jpeg.drop(2)
    }
    def gray(w: Int, h: Int, v: (Int, Int) => Int,
             fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = v(x, y) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt")
      bos.toByteArray
    }
    // upright: strictly-increasing 28-step ramp, hash -1; the step
    // dwarfs JPEG noise so every comparison is stable
    val up = (x: Int, _: Int) => 28 * x
    val rows: Seq[(Long, Array[Byte], Int, Long)] = Seq(
      (0L, gray(9, 8, up, "png"), -1, -1L),
      (1L, withOrientation(
        gray(8, 9, (x, y) => up(9 - 1 - y, x), "jpg"), 6), 6, -1L),
      (2L, withOrientation(
        gray(9, 8, (x, y) => up(9 - 1 - x, 8 - 1 - y), "jpg"), 3), 3, -1L),
      (3L, withOrientation(
        gray(9, 8, (x, y) => up(9 - 1 - x, y), "jpg"), 2), 2, -1L),
      (4L, gray(9, 8, up, "jpg"), -1, -1L),
      (5L, "no pixels".getBytes("UTF-8"), -1, -999L))
    s.createDataset(rows).toDF("img_id", "payload", "exp_orientation",
        "exp_oriented_dhash")
      .coalesce(1).write.mode("overwrite").parquet(m74Dir)
  }

  // -- m82 fixture: EXIF GPS inventory + redaction — the image-PII
  //    class. GPS IFDs are authored byte-by-byte (independent of
  //    ExifProbe) and spliced after a real JDK JPEG's SOI; expected
  //    micro-degree literals derive from the rationals the builder
  //    itself wrote. ------------------------------------------------
  private val m82Dir = "/tmp/graft_gate_m82_gps"

  /** TIFF block: IFD0 {Orientation, GPSIFD→38}; GPS IFD with lat/lon
    * (3 rationals each) and optional altitude (rational + below-sea
    * ref byte). Offsets computed, both byte orders.
    */
  private def gpsExifTiff(little: Boolean, orientation: Int,
                          latRef: Char, lat: Seq[(Long, Long)],
                          lonRef: Char, lon: Seq[(Long, Long)],
                          alt: Option[(Long, Long, Int)]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u8(v: Int): Unit = out += v.toByte
    def u16(v: Int): Unit =
      if (little) { u8(v & 0xff); u8(v >> 8) } else { u8(v >> 8); u8(v & 0xff) }
    def u32(v: Long): Unit =
      if (little) { u8((v & 0xff).toInt); u8(((v >> 8) & 0xff).toInt)
        u8(((v >> 16) & 0xff).toInt); u8(((v >> 24) & 0xff).toInt) }
      else { u8(((v >> 24) & 0xff).toInt); u8(((v >> 16) & 0xff).toInt)
        u8(((v >> 8) & 0xff).toInt); u8((v & 0xff).toInt) }
    val nG = if (alt.isDefined) 6 else 4
    val latOff = 38 + 2 + nG * 12 + 4
    val lonOff = latOff + 24
    val altOff = lonOff + 24
    if (little) { u8('I'); u8('I') } else { u8('M'); u8('M') }
    u16(42); u32(8)
    u16(2)                                         // IFD0 @8
    u16(0x0112); u16(3); u32(1); u16(orientation); u16(0)
    u16(0x8825); u16(4); u32(1); u32(38)
    u32(0)
    u16(nG)                                        // GPS IFD @38
    u16(0x0001); u16(2); u32(2); u8(latRef); u8(0); u8(0); u8(0)
    u16(0x0002); u16(5); u32(3); u32(latOff)
    u16(0x0003); u16(2); u32(2); u8(lonRef); u8(0); u8(0); u8(0)
    u16(0x0004); u16(5); u32(3); u32(lonOff)
    alt.foreach { case (_, _, ref) =>
      u16(0x0005); u16(1); u32(1); u8(ref); u8(0); u8(0); u8(0)
      u16(0x0006); u16(5); u32(1); u32(altOff)
    }
    u32(0)
    lat.foreach { case (n, d) => u32(n); u32(d) }
    lon.foreach { case (n, d) => u32(n); u32(d) }
    alt.foreach { case (n, d, _) => u32(n); u32(d) }
    out.toArray
  }

  private def spliceApp1(jpeg: Array[Byte], tiff: Array[Byte]): Array[Byte] = {
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = app1.length + 2
    jpeg.take(2) ++ Array(0xFF.toByte, 0xE1.toByte,
      (len >> 8).toByte, (len & 0xFF).toByte) ++ app1 ++ jpeg.drop(2)
  }

  private def writeM82Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def jpegRamp(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (28 * x) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg")
      bos.toByteArray
    }
    def uDeg(v: Double): Long = math.floor(v * 1e6).toLong
    // N 37°46'29.74" W 122°25'9.92", 10 m below sea level
    val lat0 = 37.0 + 46.0 / 60 + (2974.0 / 100) / 3600
    val lon0 = -(122.0 + 25.0 / 60 + (992.0 / 100) / 3600)
    val sf = gpsExifTiff(little = true, 1, 'N',
      Seq((37L, 1L), (46L, 1L), (2974L, 100L)), 'W',
      Seq((122L, 1L), (25L, 1L), (992L, 100L)), Some((1000L, 100L, 1)))
    // S 12°30'0" E 45°15'30", no altitude, big-endian
    val lat1 = -(12.0 + 30.0 / 60)
    val lon1 = 45.0 + 15.0 / 60 + 30.0 / 3600
    val indian = gpsExifTiff(little = false, 1, 'S',
      Seq((12L, 1L), (30L, 1L), (0L, 1L)), 'E',
      Seq((45L, 1L), (15L, 1L), (30L, 1L)), None)
    val NoV = -999999999L
    val rows: Seq[(Long, Array[Byte], Long, Long, Long, Int)] = Seq(
      (0L, spliceApp1(jpegRamp(9, 8), sf),
        uDeg(lat0), uDeg(lon0), -1000L, 1),
      (1L, indian, uDeg(lat1), uDeg(lon1), NoV, 1), // bare EXIF TIFF
      (2L, spliceApp1(jpegRamp(12, 10),
        gpsExifTiff(little = true, 6, 'N',
          Seq((37L, 1L), (46L, 1L), (2974L, 100L)), 'W',
          Seq((122L, 1L), (25L, 1L), (992L, 100L)),
          Some((1000L, 100L, 1)))),
        uDeg(lat0), uDeg(lon0), -1000L, 1),
      (3L, jpegRamp(9, 8), NoV, NoV, NoV, 1),       // no GPS: identity
      (4L, "not an image".getBytes("UTF-8"), NoV, NoV, NoV, 1),
      // the dominant phone format: GPS rides as a HEIF Exif ITEM
      // (iinf/iloc) and redacts in place like its JPEG siblings
      (5L, graft.queries.HeifFixture.heifWithExif("heic", Seq("mif1"),
        Some(1), Seq(graft.queries.HeifFixture.codecConfig("hvcC"),
          graft.queries.HeifFixture.ispe(4032, 3024)),
        Seq(1 -> Seq(1, 2)), tiff = sf),
        uDeg(lat0), uDeg(lon0), -1000L, 1),
      // PNG eXIf chunk (strip must re-seal the chunk CRC) and the
      // WebP EXIF chunk: the whole EXIF-carrying format family
      (6L, {
        val img = new java.awt.image.BufferedImage(16, 12,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 12; x <- 0 until 16)
          img.setRGB(x, y, ((x * 16) << 16) | ((y * 20) << 8) | 99)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val plain = bos.toByteArray
        val crc = new java.util.zip.CRC32()
        val t = "eXIf".getBytes("US-ASCII")
        crc.update(t); crc.update(sf)
        val v = crc.getValue
        val chunk = Array(((sf.length >> 24) & 0xff).toByte,
          ((sf.length >> 16) & 0xff).toByte,
          ((sf.length >> 8) & 0xff).toByte,
          (sf.length & 0xff).toByte) ++ t ++ sf ++
          Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        plain.take(33) ++ chunk ++ plain.drop(33)
      }, uDeg(lat0), uDeg(lon0), -1000L, 1),
      (7L, {
        def le32w(v: Int) = Array[Byte]((v & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 24) & 0xff).toByte)
        val exif = "EXIF".getBytes("US-ASCII") ++ le32w(sf.length) ++
          sf ++ (if (sf.length % 2 == 1) Array[Byte](0)
          else Array.emptyByteArray)
        val body = "WEBP".getBytes("US-ASCII") ++ exif
        "RIFF".getBytes("US-ASCII") ++ le32w(body.length) ++ body
      }, uDeg(lat0), uDeg(lon0), -1000L, 1))
    s.createDataset(rows).toDF("img_id", "payload", "exp_lat_u",
        "exp_lon_u", "exp_alt_c", "exp_strip_ok")
      .coalesce(1).write.mode("overwrite").parquet(m82Dir)
    ()
  }

  // -- m83 fixture: bare AAC (ADTS) inventory — the podcast/
  //    transcode class the MP3 walk misses. Frames are hand-packed
  //    field-by-field per ISO 13818-7 §6.2 (independent of the
  //    probe's parse); expected columns derive from what the builder
  //    wrote. ------------------------------------------------------
  private val m83Dir = "/tmp/graft_gate_m83_adts"

  private def adtsFrames(rateIdx: Int, channels: Int, nFrames: Int,
                         payloadBytes: Int, crc: Boolean = false,
                         blocks: Int = 1): Array[Byte] = {
    val headerLen = if (crc) 9 else 7
    val frameLen = headerLen + payloadBytes
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    for (f <- 0 until nFrames) {
      out += 0xFF.toByte
      out += (0xF0 | (if (crc) 0 else 1)).toByte
      out += ((1 << 6) | (rateIdx << 2) | ((channels >> 2) & 1)).toByte
      out += (((channels & 0x3) << 6) | ((frameLen >> 11) & 0x3)).toByte
      out += ((frameLen >> 3) & 0xff).toByte
      out += (((frameLen & 0x7) << 5) | 0x1f).toByte
      out += ((0xfc | (blocks - 1)) & 0xff).toByte
      if (crc) { out += 0; out += 0 }
      for (i <- 0 until payloadBytes) out += ((f * 31 + i) & 0xff).toByte
    }
    out.toArray
  }

  private def writeM83Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long, String)] =
      Seq(
        (0L, adtsFrames(4, 2, 5, 64), "aac-adts", 2, 44100, 5120L, "ok"),
        (1L, adtsFrames(11, 1, 3, 20, crc = true), "aac-adts", 1, 8000,
          3072L, "ok"),
        (2L, adtsFrames(3, 6, 4, 80, blocks = 2), "aac-adts", 6, 48000,
          8192L, "ok"),
        (3L, "junk junk junk junk".getBytes("UTF-8") ++
          adtsFrames(7, 2, 4, 48), "aac-adts", 2, 22050, 4096L, "ok"),
        (100L, "definitely not audio content".getBytes("UTF-8"), "", -1,
          -1, -1L, "no audio container or frame sync found"),
        (101L, Array.emptyByteArray, "", -1, -1, -1L, "file is empty"))
    s.createDataset(rows).toDF("audio_id", "payload", "exp_codec",
        "exp_channels", "exp_rate", "exp_samples", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m83Dir)
    ()
  }

  // -- m76 fixture: animated-image inventory — GIF frame counts via
  //    the JDK's own sequence writer (a third party to the probe's
  //    reader-based count), APNG via a from-spec acTL insertion into
  //    the JDK's PNG output; stills are None. ----------------------
  private val m76Dir = "/tmp/graft_gate_m76_anim"

  private def writeM76Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def frame(wh: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(wh, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until wh) {
        val g = 10 * (x % 9); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def animatedGif(n: Int): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      for (i <- 0 until n)
        w.writeToSequence(new javax.imageio.IIOImage(
          frame(8 + i), null, null), null)
      w.endWriteSequence(); w.dispose(); ios.close()
      bos.toByteArray
    }
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      (v & 0xFF).toByte)
    def apngOf(png: Array[Byte], frames: Int): Array[Byte] = {
      val data = be32(frames.toLong) ++ be32(0)
      val crc = new java.util.zip.CRC32()
      crc.update("acTL".getBytes("US-ASCII")); crc.update(data)
      val chunk = be32(8) ++ "acTL".getBytes("US-ASCII") ++ data ++
        be32(crc.getValue)
      val at = 8 + 12 + 13 // signature + IHDR chunk
      png.take(at) ++ chunk ++ png.drop(at)
    }
    val stillPng = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frame(9), "png", bos)
      bos.toByteArray
    }
    val rows: Seq[(Long, Array[Byte], String, Int)] = Seq(
      (0L, animatedGif(3), "gif", 3),
      (1L, animatedGif(1), "gif", 1),
      (2L, apngOf(stillPng, 4), "apng", 4),
      (3L, stillPng, "none", -1),
      (4L, "not an image".getBytes("UTF-8"), "none", -1),
      // r16: animated WebP via the VP8X ANIM flag + ANMF count
      (5L, WebpFixture.animatedWebp(8, 8, 2), "webp", 2))
    s.createDataset(rows).toDF("img_id", "payload", "exp_kind",
        "exp_frames")
      .coalesce(1).write.mode("overwrite").parquet(m76Dir)
  }

  /** m6 fixture: REAL WAV containers authored by the JDK's own writer
    * (`javax.sound.sampled.AudioSystem` — independent of the
    * [[graft.engine.validate.AudioProbe]] parser under test), varied
    * channels/rates/bit depths, plus the probe's failure classes, with
    * expected values stored alongside the bytes — the m4 pattern.
    */
  private val m6Dir = "/tmp/graft_gate_m6_audio"

  private def encodeWav(channels: Int, rate: Int, bits: Int,
                        frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    // 8-bit WAV is unsigned by convention; >=16-bit is signed LE
    val fmt = new AudioFormat(
      if (bits == 8) AudioFormat.Encoding.PCM_UNSIGNED
      else AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, bits, channels, channels * bits / 8, rate.toFloat,
      false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    var i = 0
    while (i < data.length) { data(i) = ((i * 31 + 7) & 0xff).toByte; i += 1 }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def writeM6Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val shapes = Seq( // (channels, rate, bits, frames)
      (1, 8000, 16, 800), (2, 44100, 16, 4410), (1, 16000, 8, 1600),
      (2, 22050, 16, 2205), (1, 48000, 16, 4800), (2, 11025, 8, 1102))
    val good: Seq[(Long, Array[Byte], Int, Int, Int, Long, String)] =
      shapes.zipWithIndex.map { case ((c, r, b, f), i) =>
        (i.toLong, encodeWav(c, r, b, f), c, r, b, f.toLong, "ok")
      }
    // Failure classes, matching AudioProbe.diagnose verbatim: empty;
    // non-RIFF bytes; a RIFF/WAVE header truncated mid-fmt; a fmt-less
    // RIFF/WAVE with only an unknown chunk.
    val wavHdr = "RIFF$\u0000\u0000\u0000WAVE".getBytes("ISO-8859-1")
    val bad: Seq[(Long, Array[Byte], Int, Int, Int, Long, String)] = Seq(
      (100L, Array.emptyByteArray, -1, -1, -1, -1L, "file is empty"),
      (101L, "definitely not audio data".getBytes("UTF-8"), -1, -1, -1, -1L,
        "not a RIFF/WAVE container"),
      (102L, encodeWav(1, 8000, 16, 100).take(24), -1, -1, -1, -1L,
        "wave data chunk missing or fmt truncated"),
      (103L, wavHdr ++ "LIST\u0004\u0000\u0000\u0000INFO".getBytes("ISO-8859-1"),
        -1, -1, -1, -1L, "wave fmt chunk missing"))
    s.createDataset(good ++ bad)
      .toDF("audio_id", "payload", "exp_channels", "exp_rate", "exp_bits",
        "exp_frames", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m6Dir)
  }

  /** m7 fixture: FLAC and MP3 containers authored field-by-field from
    * the PUBLISHED specs (xiph FLAC STREAMINFO bit layout; ISO MPEG
    * audio frame headers) by this builder — code independent of the
    * [[graft.engine.validate.AudioProbe]] parsers under test — plus
    * WAV rows through the same unified entry point and the failure
    * classes. Expected values stored alongside (m4/m6 pattern).
    */
  private val m7Dir = "/tmp/graft_gate_m7_audio_codecs"

  private def encodeFlacHeader(channels: Int, rate: Int, bits: Int,
                               nSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // a VORBIS_COMMENT-style padding block FIRST so the parser has to
    // walk, not just read offset 4
    out.write(0x04); out.write(0); out.write(0); out.write(8)
    (1 to 8).foreach(_ => out.write(0x55))
    // STREAMINFO, marked last
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0 // min blocksize 4096
    si(2) = 0x10; si(3) = 0 // max blocksize
    // min/max framesize 24-bit: zeros (unknown)
    si(10) = ((rate >> 12) & 0xff).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bits - 1) >> 4) & 0x1)).toByte
    si(13) = ((((bits - 1) & 0xf) << 4) | ((nSamples >> 32) & 0xf)).toByte
    si(14) = ((nSamples >> 24) & 0xff).toByte
    si(15) = ((nSamples >> 16) & 0xff).toByte
    si(16) = ((nSamples >> 8) & 0xff).toByte
    si(17) = (nSamples & 0xff).toByte
    // md5 zeros
    out.write(si)
    out.toByteArray
  }

  /** MPEG1 Layer III CBR frames: header per spec + zero payload. */
  private def encodeMp3(channels: Int, rateIdx: Int, brIdx: Int,
                        nFrames: Int, id3Bytes: Int = 0): Array[Byte] = {
    val rates = Array(44100, 48000, 32000)
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) { // ID3v2 tag with syncsafe size
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0) // version 2.3, no flags
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      (1 to id3Bytes).foreach(_ => out.write(0))
    }
    val frameLen = 144 * kbps(brIdx) * 1000 / rates(rateIdx) // no padding
    for (_ <- 1 to nFrames) {
      out.write(0xff)
      out.write(0xfa) // sync | v1 (11) | layer III (01) | no-crc (0)
      out.write((brIdx << 4) | (rateIdx << 2)) // padding 0, private 0
      out.write(if (channels == 1) 0xc0 else 0x00) // mono | stereo
      (1 to frameLen - 4).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  private val m9Dir = "/tmp/graft_gate_m9_exif"

  /** Byte-by-byte EXIF TIFF author (independent of ExifProbe): IFD0
    * {Orientation inline SHORT, Make ASCII @86, ExifIFD→50}, sub-IFD
    * {PixelXDimension inline LONG, DateTimeOriginal ASCII @98}. `make`
    * must be 10 ASCII chars so every offset stays fixed.
    */
  private def exifTiff(little: Boolean, orientation: Int, make: String,
                       pixelX: Long, dto: String): Array[Byte] = {
    require(make.length == 10 && dto.length == 19, "fixed-layout fixture")
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u8(v: Int): Unit = out += v.toByte
    def u16(v: Int): Unit =
      if (little) { u8(v & 0xff); u8(v >> 8) } else { u8(v >> 8); u8(v & 0xff) }
    def u32(v: Long): Unit =
      if (little) { u8((v & 0xff).toInt); u8(((v >> 8) & 0xff).toInt)
        u8(((v >> 16) & 0xff).toInt); u8(((v >> 24) & 0xff).toInt) }
      else { u8(((v >> 24) & 0xff).toInt); u8(((v >> 16) & 0xff).toInt)
        u8(((v >> 8) & 0xff).toInt); u8((v & 0xff).toInt) }
    def ascii(str: String): Unit = str.foreach(c => u8(c.toInt))
    ascii(if (little) "II" else "MM"); u16(42); u32(8)
    u16(3)
    u16(0x0112); u16(3); u32(1); u16(orientation); u16(0)
    u16(0x010f); u16(2); u32(11); u32(86)
    u16(0x8769); u16(4); u32(1); u32(50)
    u32(0)
    u16(2)
    u16(0xa002); u16(4); u32(1); u32(pixelX)
    u16(0x9003); u16(2); u32(20); u32(98)
    u32(0)
    while (out.length < 86) u8(0)
    ascii(make); u8(0); u8(0)
    ascii(dto); u8(0)
    out.toArray
  }

  private def exifJpeg(tiff: Array[Byte]): Array[Byte] = {
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = app1.length + 2
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      (len >> 8).toByte, (len & 0xff).toByte) ++ app1 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  private def writeM9Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val dto1 = "2026:08:14 06:00:00"
    val dto2 = "2025:01:02 10:30:00"
    val rows: Seq[(Long, Array[Byte], Int, String, String, Long, String)] =
      Seq(
        (0L, exifJpeg(exifTiff(little = true, 6, "GraftCam 1", 1024L, dto1)),
          6, "GraftCam 1", dto1, 1024L, "ok"),
        (1L, exifTiff(little = false, 1, "OtherCam 2", 4032L, dto2),
          1, "OtherCam 2", dto2, 4032L, "ok"),
        (2L, exifJpeg(exifTiff(little = true, 8, "ThirdCam 3", 640L, dto1)),
          8, "ThirdCam 3", dto1, 640L, "ok"),
        // JPEG with no APP1 at all
        (100L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
          0xd9.toByte), -1, "", "", -1L, "no exif"),
        (101L, "not an image".getBytes("UTF-8"), -1, "", "", -1L,
          "no exif"),
        (102L, Array.emptyByteArray, -1, "", "", -1L, "no exif"))
    s.createDataset(rows)
      .toDF("img_id", "payload", "exp_orientation", "exp_make", "exp_dto",
        "exp_px", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m9Dir)
    ()
  }

  private def writeM7Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val good: Seq[(Long, Array[Byte], String, Int, Int, Int, Long, String)] = Seq(
      (0L, encodeFlacHeader(2, 44100, 16, 1234567L), "flac", 2, 44100, 16,
        1234567L, "ok"),
      (1L, encodeFlacHeader(1, 96000, 24, 48000L), "flac", 1, 96000, 24,
        48000L, "ok"),
      (2L, encodeFlacHeader(8, 8000, 8, 0L), "flac", 8, 8000, 8, 0L, "ok"),
      // mp3: nSamples = frames × 1152 (MPEG1 Layer III)
      (3L, encodeMp3(2, 0, 9, 5), "mp3", 2, 44100, 0, 5 * 1152L, "ok"),
      (4L, encodeMp3(1, 1, 14, 3), "mp3", 1, 48000, 0, 3 * 1152L, "ok"),
      (5L, encodeMp3(2, 2, 1, 7, id3Bytes = 64), "mp3", 2, 32000, 0,
        7 * 1152L, "ok"),
      // wav through the same unified entry point
      (6L, encodeWav(2, 22050, 16, 2205), "wav", 2, 22050, 16, 2205L, "ok"))
    val bad: Seq[(Long, Array[Byte], String, Int, Int, Int, Long, String)] = Seq(
      (100L, Array.emptyByteArray, "", -1, -1, -1, -1L, "file is empty"),
      (101L, "no sync word anywhere here....".getBytes("UTF-8"), "", -1, -1,
        -1, -1L, "no audio container or frame sync found"),
      (102L, encodeFlacHeader(2, 44100, 16, 99L).take(20), "", -1, -1, -1,
        -1L, "flac streaminfo missing or truncated"),
      // fLaC signature, one non-streaminfo block marked last
      (103L, "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x84.toByte, 0, 0, 2,
        1, 2), "", -1, -1, -1, -1L, "flac streaminfo missing or truncated"))
    s.createDataset(good ++ bad)
      .toDF("audio_id", "payload", "exp_codec", "exp_channels", "exp_rate",
        "exp_bits", "exp_samples", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m7Dir)
  }

  /** m8 fixture: MP4 (ISO-BMFF) and RIFF AVI containers authored
    * box-by-box / chunk-by-chunk from the PUBLISHED container specs
    * (ISO/IEC 14496-12 box layout; the AVI MainAVIHeader) by this
    * builder — code independent of the
    * [[graft.engine.validate.VideoProbe]] walker under test — plus the
    * failure classes. Expected values stored alongside (m4/m6/m7
    * pattern).
    */
  private val m8Dir = "/tmp/graft_gate_m8_video"

  // -- big-endian box writers (independent of the probe's readers) ----
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  private def encodeMp4(w: Int, h: Int, timescale: Int, duration: Long,
                        codec: String, frames: Seq[Int],
                        version1: Boolean = false,
                        extraAudioTrack: Boolean = false): Array[Byte] = {
    val v: Byte = if (version1) 1 else 0
    val mvhd = mp4Box("mvhd",
      if (version1)
        Array[Byte](v, 0, 0, 0) ++ Array.fill(16)(0.toByte) ++ // 64-bit times
          be32(timescale) ++ be32(duration >> 32) ++ be32(duration & 0xffffffffL) ++
          Array.fill(80)(0.toByte)
      else
        Array[Byte](v, 0, 0, 0) ++ Array.fill(8)(0.toByte) ++
          be32(timescale) ++ be32(duration) ++ Array.fill(80)(0.toByte))
    def tkhd(width: Int, height: Int) = mp4Box("tkhd",
      if (version1)
        Array[Byte](v, 0, 0, 7) ++ Array.fill(84)(0.toByte) ++
          be32(width.toLong << 16) ++ be32(height.toLong << 16)
      else
        Array[Byte](v, 0, 0, 7) ++ Array.fill(72)(0.toByte) ++
          be32(width.toLong << 16) ++ be32(height.toLong << 16))
    def hdlr(handler: String) = mp4Box("hdlr",
      Array.fill[Byte](8)(0) ++ handler.getBytes("US-ASCII") ++
        Array.fill[Byte](13)(0))
    val stts = mp4Box("stts", Array.fill[Byte](4)(0) ++
      be32(frames.length.toLong) ++
      frames.flatMap(n => be32(n.toLong) ++ be32(100L)).toArray)
    val stsd = mp4Box("stsd", Array.fill[Byte](4)(0) ++ be32(1L) ++
      be32(16L) ++ codec.getBytes("US-ASCII") ++ Array.fill[Byte](8)(0))
    val stbl = mp4Box("stbl", stsd ++ stts)
    val videoTrak = mp4Box("trak", tkhd(w, h) ++
      mp4Box("mdia", hdlr("vide") ++ mp4Box("minf", stbl)))
    val audioTrak = mp4Box("trak", tkhd(0, 0) ++
      mp4Box("mdia", hdlr("soun") ++ mp4Box("minf", Array.emptyByteArray)))
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512L) ++ "isom".getBytes("US-ASCII"))
    val moov = mp4Box("moov",
      if (extraAudioTrack) mvhd ++ videoTrak ++ audioTrak
      else mvhd ++ videoTrak)
    val mdat = mp4Box("mdat", Array.fill[Byte](32)(0x2a))
    ftyp ++ moov ++ mdat
  }

  // -- little-endian chunk writers ------------------------------------
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private[queries] def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ padded
  }

  private[queries] def riffList(listType: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ children)

  private def encodeAvi(w: Int, h: Int, usPerFrame: Int, totalFrames: Int,
                        streams: Int, codec: String): Array[Byte] = {
    val avih = riffChunk("avih",
      le32(usPerFrame.toLong) ++ le32(0L) ++ le32(0L) ++ le32(0x10L) ++
        le32(totalFrames.toLong) ++ le32(0L) ++ le32(streams.toLong) ++
        le32(0L) ++ le32(w.toLong) ++ le32(h.toLong) ++
        Array.fill[Byte](16)(0))
    val strh = riffChunk("strh",
      "vids".getBytes("US-ASCII") ++ codec.getBytes("US-ASCII") ++
        Array.fill[Byte](48)(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh))
    val movi = riffList("movi", riffChunk("00dc", Array.fill[Byte](16)(0x2a)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  private val m14Dir = "/tmp/graft_gate_m14_mkv"

  // -- EBML writers (RFC 8794), independent of the probe's readers ----
  private def ebmlIdBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def ebmlSizeBytes(v: Long): Array[Byte] = {
    var w = 1
    while (v >= (1L << (7 * w)) - 1) w += 1
    val marked = v | (1L << (7 * w))
    (0 until w).map(i => ((marked >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
  }

  private def ebmlEl(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlIdBytes(id) ++ ebmlSizeBytes(payload.length.toLong) ++ payload

  private def ebmlUintBytes(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def encodeMkv(docType: String, tsScale: Option[Long],
                        durationUnits: Double, f64: Boolean,
                        tracks: Seq[(Int, String, Int, Int)]): Array[Byte] = {
    val dur =
      if (f64) java.nio.ByteBuffer.allocate(8).putDouble(durationUnits).array()
      else be32(java.lang.Float.floatToIntBits(durationUnits.toFloat).toLong
        & 0xffffffffL)
    val info = ebmlEl(0x1549A966L,
      tsScale.map(v => ebmlEl(0x2AD7B1L, ebmlUintBytes(v)))
        .getOrElse(Array.emptyByteArray) ++ ebmlEl(0x4489L, dur))
    val trackEls = tracks.map { case (typ, codec, w, h) =>
      ebmlEl(0xAEL, ebmlEl(0x83L, ebmlUintBytes(typ.toLong)) ++
        ebmlEl(0x86L, codec.getBytes("UTF-8")) ++
        (if (typ == 1)
          ebmlEl(0xE0L, ebmlEl(0xB0L, ebmlUintBytes(w.toLong)) ++
            ebmlEl(0xBAL, ebmlUintBytes(h.toLong)))
        else Array.emptyByteArray))
    }.reduceOption(_ ++ _).getOrElse(Array.emptyByteArray)
    ebmlEl(0x1A45DFA3L, ebmlEl(0x4282L, docType.getBytes("UTF-8"))) ++
      ebmlEl(0x18538067L, info ++ ebmlEl(0x1654AE6BL, trackEls))
  }

  private def writeM14Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long, Int, Long, String, String)] = Seq(
      // webm, default timestamp scale: duration units ARE milliseconds
      (0L, encodeMkv("webm", None, 2500.0, f64 = false,
        Seq((1, "V_VP9", 640, 360), (2, "A_OPUS", 0, 0))), "webm",
        640, 360, 2500L, 2, 0L, "V_VP9", "ok"),
      // matroska, explicit 500µs scale, 8-byte float duration
      (1L, encodeMkv("matroska", Some(500000L), 4000.0, f64 = true,
        Seq((1, "V_MPEG4/ISO/AVC", 1920, 1080))), "mkv",
        1920, 1080, 2000L, 1, 0L, "V_MPEG4/ISO/AVC", "ok"),
      // audio-only webm: no dims, no video codec
      (2L, encodeMkv("webm", None, 900.0, f64 = false,
        Seq((2, "A_VORBIS", 0, 0))), "webm",
        -1, -1, 900L, 1, 0L, "", "ok"),
      // EBML head only — no Segment
      (100L, ebmlEl(0x1A45DFA3L,
        ebmlEl(0x4282L, "webm".getBytes("UTF-8"))), "",
        -1, -1, -1L, -1, -1L, "", "ebml segment info missing or truncated"),
      // truncated download: the trailing Video element (exactly the
      // last 8 bytes) is cut — the clamped walk still yields Info,
      // the track count and the codec; dims honestly stay -1
      (101L, encodeMkv("webm", None, 100.0, f64 = false,
        Seq((1, "V_VP8", 64, 64))).dropRight(8), "webm",
        -1, -1, 100L, 1, 0L, "V_VP8", "ok"),
      (102L, Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte), "",
        -1, -1, -1L, -1, -1L, "", "ebml segment info missing or truncated"))
    s.createDataset(rows)
      .toDF("video_id", "payload", "exp_container", "exp_w", "exp_h",
        "exp_duration_ms", "exp_tracks", "exp_frames", "exp_codec",
        "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m14Dir)
  }

  private def writeM8Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val good: Seq[(Long, Array[Byte], String, Int, Int, Long, Int, Long, String, String)] = Seq(
      // mp4, version-0 headers: 240 frames, 1000-scale 8s movie
      (0L, encodeMp4(1920, 1080, 1000, 8000L, "avc1", Seq(240)), "mp4",
        1920, 1080, 8000L, 1, 240L, "avc1", "ok"),
      // mp4, version-1 (64-bit) movie/track headers
      (1L, encodeMp4(1280, 720, 90000, 270000L, "hev1", Seq(50, 40),
        version1 = true), "mp4", 1280, 720, 3000L, 1, 90L, "hev1", "ok"),
      // mp4 with a second (audio) track: dims come from the vide track
      (2L, encodeMp4(640, 480, 600, 1200L, "mp4v", Seq(48),
        extraAudioTrack = true), "mp4", 640, 480, 2000L, 2, 48L, "mp4v", "ok"),
      // avi: 30fps (33333 us/frame), 90 frames
      (3L, encodeAvi(720, 576, 33333, 90, 1, "MJPG"), "avi",
        720, 576, 2999L, 1, 90L, "MJPG", "ok"),
      (4L, encodeAvi(320, 240, 40000, 25, 2, "XVID"), "avi",
        320, 240, 1000L, 2, 25L, "XVID", "ok"))
    val bad: Seq[(Long, Array[Byte], String, Int, Int, Long, Int, Long, String, String)] = Seq(
      (100L, Array.emptyByteArray, "", -1, -1, -1L, -1, -1L, "",
        "file is empty"),
      (101L, "certainly not a movie file....".getBytes("UTF-8"), "", -1, -1,
        -1L, -1, -1L, "", "not a recognized video container"),
      // ftyp only — no moov anywhere
      (102L, mp4Box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512L)), "",
        -1, -1, -1L, -1, -1L, "", "mp4 movie header missing or truncated"),
      // moov present but truncated before mvhd completes
      (103L, encodeMp4(64, 64, 1000, 1000L, "avc1", Seq(10)).take(40), "",
        -1, -1, -1L, -1, -1L, "", "mp4 movie header missing or truncated"),
      // RIFF AVI signature with an empty body — no avih
      (104L, "RIFF".getBytes("US-ASCII") ++ le32(4L) ++
        "AVI ".getBytes("US-ASCII"), "", -1, -1, -1L, -1, -1L, "",
        "avi header missing or truncated"))
    s.createDataset(good ++ bad)
      .toDF("video_id", "payload", "exp_container", "exp_w", "exp_h",
        "exp_duration_ms", "exp_tracks", "exp_frames", "exp_codec",
        "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m8Dir)
  }

  // -- m15/m16 fixture: multi-tone WAVs whose spectral-hash bits read
  //    straight off a 3-level amplitude table (one exact-bin tone per
  //    analysis band; adjacent-level power ratios of 9 dwarf
  //    quantization noise). exp_hash is derived here from the level
  //    table alone — the AudioFingerprintSpec derivation, authored
  //    independently of the implementation:
  //    bit(t, b) = 1 iff level(t, b) < level(t, b+1), packed
  //    segment-major MSB-first. Rows: the base recording, a quarter-
  //    volume copy and an 8-bit re-encode (hash-identical by gain /
  //    requantization invariance), the complemented level table
  //    (every bit flips → Hamming 64), and broken bytes (-999).
  private val m15Dir = "/tmp/graft_gate_m15_audio"

  private[queries] val m15Sr = 8000
  private[queries] val m15Frame = 1024
  private val m15Levels = Array(0.02, 0.06, 0.18)
  private[queries] val m15Patterns: Seq[Seq[Int]] = Seq(
    Seq(0, 1, 2, 1, 2, 1, 2, 1, 2), Seq(2, 1, 0, 1, 0, 1, 0, 1, 0),
    Seq(0, 2, 0, 2, 0, 2, 0, 2, 0), Seq(2, 0, 2, 0, 2, 0, 2, 0, 2),
    Seq(0, 1, 2, 0, 1, 2, 0, 1, 2), Seq(2, 1, 0, 2, 1, 0, 2, 1, 0),
    Seq(1, 2, 0, 1, 2, 0, 1, 2, 0), Seq(1, 0, 2, 1, 0, 2, 1, 0, 2))

  private[queries] def m15ExpectedHash(pats: Seq[Seq[Int]]): Long = {
    var h = 0L
    for (t <- 0 until 8; b <- 0 until 8)
      h = (h << 1) | (if (pats(t)(b) < pats(t)(b + 1)) 1L else 0L)
    h
  }

  private[queries] def m15Samples(gain: Double, pats: Seq[Seq[Int]]): Array[Double] = {
    val edges = graft.multimodal.AudioFingerprint.bandEdges(m15Sr).get
    val binHz = m15Sr.toDouble / m15Frame
    def bandBin(b: Int): Int = {
      val lo = math.max(1, math.ceil(edges(b) / binHz).toInt)
      val hi = math.floor(edges(b + 1) / binHz).toInt
      (lo + hi) / 2
    }
    val x = new Array[Double](8 * m15Frame)
    for (t <- 0 until 8; i <- 0 until m15Frame) {
      var s = 0.0
      for (b <- 0 until 9)
        s += m15Levels(pats(t)(b)) *
          math.sin(2.0 * math.Pi * bandBin(b) * i / m15Frame)
      x(t * m15Frame + i) = s * gain
    }
    x
  }

  /** Integer-PCM WAV writer — independent builder code (m8 stance). */
  private[queries] def wavBytes(x: Array[Double], rate: Int, bits: Int): Array[Byte] = {
    val bps = bits / 8
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("RIFF".getBytes); w32(36L + x.length * bps)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16L)
    w16(1); w16(1); w32(rate.toLong); w32(rate.toLong * bps); w16(bps); w16(bits)
    bos.write("data".getBytes); w32(x.length.toLong * bps)
    val full = (1L << (bits - 1)) - 1
    for (s <- x) {
      val v = math.round(s * full)
      if (bits == 8) bos.write((v + 128).toInt & 0xff)
      else (0 until bps).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    }
    bos.toByteArray
  }

  /** m20: one-second blocks with per-block stationary level patterns;
    * global-phase exact-bin tones, so every 1024-sample frame inside a
    * block sees the same spectrum (the AudioFingerprintSpec blockClip
    * derivation).
    */
  private def m20BlockClip(pats: Seq[Seq[Int]], gain: Double): Array[Double] = {
    val edges = graft.multimodal.AudioFingerprint.bandEdges(m15Sr).get
    val binHz = m15Sr.toDouble / m15Frame
    def bandBin(b: Int): Int = {
      val lo = math.max(1, math.ceil(edges(b) / binHz).toInt)
      val hi = math.floor(edges(b + 1) / binHz).toInt
      (lo + hi) / 2
    }
    val x = new Array[Double](pats.length * m15Sr)
    for (j <- pats.indices; i <- 0 until m15Sr) {
      var s = 0.0
      for (b <- 0 until 9)
        s += m15Levels(pats(j)(b)) *
          math.sin(2.0 * math.Pi * bandBin(b) * (j.toLong * m15Sr + i) / m15Frame)
      x(j * m15Sr + i) = s * gain
    }
    x
  }

  /** m21: minimal verbatim-subframe FLAC writer — independent builder
    * code (bit-level, per the public xiph spec: STREAMINFO, framed
    * sync/CRC-8/CRC-16, VERBATIM subframes). Carries the exact 16-bit
    * integers the WAV writer quantizes to, so the FLAC re-encode must
    * hash to the SAME level-table value as the m15 base row.
    */
  private[queries] def flacVerbatim(x: Array[Double], rate: Int): Array[Byte] = {
    val (meta, frames) = flacVerbatimParts(x, rate)
    "fLaC".getBytes("US-ASCII") ++ meta ++ frames.flatten
  }

  /** The verbatim writer's parts — (STREAMINFO block, frames) — so the
    * m28 Ogg wrap can page one frame per packet per the mapping.
    */
  private[queries] def flacVerbatimParts(
      x: Array[Double], rate: Int): (Array[Byte], Seq[Array[Byte]]) = {
    val ints = x.map(s => math.round(s * 32767).toInt)
    val bits = scala.collection.mutable.ArrayBuffer[Int]()
    def bit(v: Int): Unit = { bits += (v & 1); () }
    def uint(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
    def pack(): Array[Byte] = {
      require(bits.length % 8 == 0)
      bits.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
    def crc8(b: Array[Byte]): Int = b.foldLeft(0) { (c0, x) =>
      (0 until 8).foldLeft(c0 ^ (x & 0xff)) { (c, _) =>
        if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
      }
    }
    def crc16(b: Array[Byte]): Int = b.foldLeft(0) { (c0, x) =>
      (0 until 8).foldLeft(c0 ^ ((x & 0xff) << 8)) { (c, _) =>
        if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
        else (c << 1) & 0xffff
      }
    }
    // STREAMINFO
    uint(1, 1); uint(0, 7); uint(34, 24)
    uint(16, 16); uint(65535, 16); uint(0, 24); uint(0, 24)
    uint(rate.toLong, 20); uint(0, 3); uint(15, 5) // mono, 16-bit
    uint(ints.length.toLong, 36)
    (0 until 16).foreach(_ => uint(0, 8))
    val meta = pack()
    val frames = ints.grouped(1024).zipWithIndex.map { case (g, idx) =>
      bits.clear()
      uint(0x3FFE, 14); bit(0); bit(0)
      uint(7, 4); uint(0, 4); uint(0, 4); uint(4, 3); bit(0)
      uint(idx.toLong, 8)
      uint((g.length - 1).toLong, 16)
      val head = pack()
      bits.clear()
      head.foreach(b => uint(b.toLong & 0xff, 8))
      uint(crc8(head).toLong, 8)
      bit(0); uint(1, 6); bit(0) // VERBATIM, no wasted bits
      g.foreach(v => uint(v.toLong & 0xffff, 16))
      while (bits.length % 8 != 0) bit(0)
      val body = pack()
      bits.clear()
      body.foreach(b => uint(b.toLong & 0xff, 8))
      uint(crc16(body).toLong, 16)
      pack()
    }.toSeq
    (meta, frames)
  }

  private val m23Dir = "/tmp/graft_gate_m23_subs"

  /** m23 fixture: one SRT and one WebVTT payload; expected cue rows
    * hand-derived (timestamp arithmetic in the gate doc) and stored
    * alongside for the oracle.
    */
  private def writeM23Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val srt = Seq(
      "1", "00:00:01,000 --> 00:00:03,500", "Hello there.", "",
      "2", "00:00:04,200 --> 00:00:06,000", "Second <i>line</i>",
      "with a wrap.", "",
      "3", "01:02:03,456 --> 01:02:04,000", "{\\an8}Top text"
    ).mkString("\n")
    val vtt = Seq(
      "WEBVTT", "",
      "NOTE this block is commentary and must drop", "",
      "00:05.000 --> 00:07.250 align:middle",
      "<v Speaker>No hours on this one", "",
      "00:01:00.000 --> 00:01:02.000", "Full hours here", "",
      // WebVTT hours may exceed two digits (100 h = 360,000,000 ms)
      "100:00:00.000 --> 100:00:01.500", "Marathon archive"
    ).mkString("\n")
    Seq((1L, srt), (2L, vtt), (3L, "prose with no cues"))
      .toDF("doc_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m23Dir + "_in")
    Seq(
      (1L, 0, 1000L, 3500L, "Hello there."),
      (1L, 1, 4200L, 6000L, "Second line with a wrap."),
      (1L, 2, 3723456L, 3724000L, "Top text"),
      (2L, 0, 5000L, 7250L, "No hours on this one"),
      (2L, 1, 60000L, 62000L, "Full hours here"),
      (2L, 2, 360000000L, 360001500L, "Marathon archive"))
      .toDF("doc_id", "cue_index", "start_ms", "end_ms", "text")
      .coalesce(1).write.mode("overwrite").parquet(m23Dir + "_exp")
  }

  private val m24Dir = "/tmp/graft_gate_m24_ass"

  private def writeM24Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val ass = Seq(
      "[Script Info]", "Title: fixture", "",
      "[Events]",
      "Format: Layer, Start, End, Style, Name, MarginL, MarginR, " +
        "MarginV, Effect, Text",
      "Dialogue: 0,0:00:01.50,0:00:03.25,Default,,0,0,0,,{\\an8}Styled line",
      "Dialogue: 0,0:00:04.00,0:00:05.00,Default,,0,0,0,," +
        "Hard\\Nbreak, with comma",
      "Dialogue: 0,1:02:03.45,1:02:04.00,Default,,0,0,0,,Late cue",
      "Comment: 0,0:00:06.00,0:00:07.00,Default,,0,0,0,,never shown"
    ).mkString("\n")
    Seq((1L, ass), (2L, "no events here"))
      .toDF("doc_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m24Dir + "_in")
    // hand-converted: 0:00:01.50 = 1500 ms; 1:02:03.45 = 3723450 ms
    Seq(
      (1L, 0, 1500L, 3250L, "Styled line"),
      (1L, 1, 4000L, 5000L, "Hard break, with comma"),
      (1L, 2, 3723450L, 3724000L, "Late cue"))
      .toDF("doc_id", "cue_index", "start_ms", "end_ms", "text")
      .coalesce(1).write.mode("overwrite").parquet(m24Dir + "_exp")
  }

  private val m21Dir = "/tmp/graft_gate_m21_flac"

  private def writeM21Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val good = flacVerbatim(m15Samples(1.0, m15Patterns), m15Sr)
    val comp = m15Patterns.map(_.map(2 - _))
    val bad = good.clone()
    bad(good.length - 5) = (bad(good.length - 5) ^ 0x10).toByte
    val rows: Seq[(Long, Array[Byte], Long)] = Seq(
      (0L, good, m15ExpectedHash(m15Patterns)),
      (1L, flacVerbatim(m15Samples(0.25, m15Patterns), m15Sr),
        m15ExpectedHash(m15Patterns)),
      (2L, flacVerbatim(m15Samples(1.0, comp), m15Sr),
        m15ExpectedHash(comp)),
      (3L, bad, -999L)) // CRC-corrupted: NULL hash → sentinel
    s.createDataset(rows).toDF("audio_id", "content", "exp_hash")
      .coalesce(1).write.mode("overwrite").parquet(m21Dir)
  }

  private def writeM15Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val comp = m15Patterns.map(_.map(2 - _))
    val rows: Seq[(Long, Array[Byte], Long)] = Seq(
      (0L, wavBytes(m15Samples(1.0, m15Patterns), m15Sr, 16),
        m15ExpectedHash(m15Patterns)),
      (1L, wavBytes(m15Samples(0.25, m15Patterns), m15Sr, 16),
        m15ExpectedHash(m15Patterns)),
      (2L, wavBytes(m15Samples(1.0, m15Patterns), m15Sr, 8),
        m15ExpectedHash(m15Patterns)),
      (3L, wavBytes(m15Samples(1.0, comp), m15Sr, 16),
        m15ExpectedHash(comp)),
      (4L, "not audio at all".getBytes, -999L))
    s.createDataset(rows).toDF("audio_id", "content", "exp_hash")
      .coalesce(1).write.mode("overwrite").parquet(m15Dir)
  }

  // -- m17 fixture: MJPEG AVIs authored chunk-by-chunk (RIFF writer
  //    independent of the walk); expectations derive from frame BYTE
  //    identity only — a re-muxed copy (different chunk ids, rec-LIST
  //    nesting, junk chunks) carries the same JPEG bytes, so its
  //    sampled dHashes match frame-for-frame; a different clip shares
  //    none. JPEG codec numerics never enter any expected value.
  private[queries] val m17Dir = "/tmp/graft_gate_m17_video"

  /** Full AVI envelope over pre-built chunk parts (the m8 RIFF
    * writers supply `riffChunk`/`riffList`).
    */
  private[queries] def aviBytes(parts: Array[Byte]*): Array[Byte] = {
    val inner = "AVI ".getBytes("US-ASCII") ++ parts.flatten
    "RIFF".getBytes("US-ASCII") ++ le32(inner.length.toLong) ++ inner
  }

  private[queries] def jpegFrame(mul: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = 20 + ((x / 8 * mul + (y / 8) * 17) % 90)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
    bos.toByteArray
  }

  private[queries] def writeM17Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val clipA = (0 until 8).map(i => jpegFrame(29 + 2 * i))
    val clipB = (0 until 8).map(i => jpegFrame(101 + 5 * i))
    def movi(frames: Seq[Array[Byte]], id: String) =
      riffList("movi", frames.flatMap(f => riffChunk(id, f)).toArray)
    val base = aviBytes(movi(clipA, "00dc"))
    // re-mux: 01db stream ids, rec-LIST grouping, junk + header chunks
    val remux = aviBytes(
      riffChunk("JUNK", Array.fill[Byte](32)(0)),
      riffList("hdrl", riffChunk("avih", Array.fill[Byte](56)(0))),
      riffList("movi", clipA.grouped(4).flatMap(g =>
        riffList("rec ", g.flatMap(f => riffChunk("01db", f)).toArray))
        .toArray))
    val other = aviBytes(movi(clipB, "00dc"))
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (0L, base), (1L, remux), (2L, other),
      (3L, "definitely not a video".getBytes))
    s.createDataset(rows).toDF("video_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m17Dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- m15: spectral audio fingerprint — authored multi-tone WAVs,
    //    every hash bit derived from the fixture's amplitude-level
    //    table (see writeM15Fixture); gain-scaled and requantized
    //    copies hash identically, the complemented table flips all 64
    //    bits, broken bytes → -999 sentinel (m10 NULL note). ---------
    "m15_audio_fingerprint" -> { (s, _) =>
      writeM15Fixture(s)
      import graft.multimodal.AudioFingerprint
      s.read.parquet(m15Dir)
        .select(col("audio_id"),
          coalesce(AudioFingerprint.spectralHash(col("content")),
            lit(-999L)).as("ahash"))
        .orderBy("audio_id")
    },

    // -- m16: audio near-dup via the banded Hamming join shared with
    //    images — the gain copy and the 8-bit re-encode sit at
    //    distance 0 from the base (and each other); the complemented
    //    recording is 64 bits away; broken bytes drop out. -----------
    "m16_audio_neardup" -> { (s, _) =>
      writeM15Fixture(s)
      import graft.multimodal.AudioFingerprint
      AudioFingerprint.nearDuplicateAudio(
          s.read.parquet(m15Dir), "audio_id", "content", maxHamming = 4)
        .orderBy("id_a", "id_b")
    },

    // -- m17: video near-dup by frame-sampled dHash — the re-muxed
    //    copy carries byte-identical JPEG frames (different chunk ids,
    //    rec-LIST nesting, junk chunks), so all 8 sampled hashes
    //    match; the different clip and the non-video share nothing. --
    "m17_video_neardup" -> { (s, _) =>
      writeM17Fixture(s)
      import graft.multimodal.VideoFrameHash
      val pairs = VideoFrameHash.nearDuplicateVideos(
        s.read.parquet(m17Dir), "video_id", "content")
      pairs.orderBy("vid_a", "vid_b")
    },

    // -- m20: excerpt-robust audio matching — windowed sub-
    //    fingerprints (2 s windows, 1 s hop) over per-second
    //    stationary tone blocks; a hop-aligned 3 s excerpt of the 6 s
    //    recording reproduces its interior window hashes EXACTLY and
    //    reaches full coverage on its own side, while the complement
    //    recording and the undecodable payload pair with nothing.
    //    Every window hash is derived from the two blocks it spans
    //    (segments 0–3 in the first, 4–7 in the second). ------------
    "m20_audio_excerpt" -> { (s, _) =>
      writeM15Fixture(s)
      import graft.multimodal.AudioFingerprint
      val pats = m15Patterns.take(6)
      val full = m20BlockClip(pats, 1.0)
      val comp = m15Patterns.map(_.map(2 - _)).take(6)
      import s.implicits._
      val df = Seq(
        (0L, wavBytes(full, m15Sr, 16)),
        (1L, wavBytes(full.slice(2 * m15Sr, 5 * m15Sr), m15Sr, 16)),
        (2L, wavBytes(m20BlockClip(comp, 1.0), m15Sr, 16)),
        (3L, "not audio".getBytes)).toDF("audio_id", "content")
      val pairs = AudioFingerprint.nearDuplicateAudioExcerpts(
        df, "audio_id", "content")
      pairs.orderBy("id_a", "id_b")
    },

    // -- m23: SRT/WebVTT subtitle parsing — the video→text bridge.
    //    Hand-authored payloads; every timestamp hand-converted to ms
    //    (01:02:03,456 = 3723456), markup/ASS-brace stripping and
    //    wrap collapsing derived by eye; the WEBVTT header, NOTE
    //    block and bare index lines must produce no cue. ------------
    "m23_subtitle_cues" -> { (s, _) =>
      writeM23Fixture(s)
      graft.ops.Subtitles.parseCues(
          s.read.parquet(m23Dir + "_in"), "doc_id", "content")
        .orderBy("doc_id", "cue_index")
    },

    // -- m24: SubStation Alpha events — Dialogue lines only (Comment
    //    lines never render), H:MM:SS.cc CENTIsecond times, {\...}
    //    overrides stripped, \N breaks collapsed, commas legal in the
    //    Text field (split limit 10). Hand-derived rows stored by the
    //    fixture. ------------------------------------------------------
    "m24_ass_cues" -> { (s, _) =>
      writeM24Fixture(s)
      graft.ops.Subtitles.parseAss(
          s.read.parquet(m24Dir + "_in"), "doc_id", "content")
        .orderBy("doc_id", "cue_index")
    },

    // -- m22: the COMPOSED image curation program — validate (header
    //    decode + min dims) → exact dedup (sha-256, smallest id) →
    //    perceptual near-dup (dHash banding; the 2x render drops) →
    //    seen-index dedup (stripes indexed) — one call, survivors
    //    carrying the per-stage metric counts via the scalar fold.
    //    Every drop is hand-derived from the m10 image family: the
    //    byte copy at stage 2, the 2x render at stage 3 (Hamming 0),
    //    the 4x4 tracker and broken bytes at stage 1, striped at 4. --
    "m22_media_pipeline" -> { (s, _) =>
      import s.implicits._
      val grad = grayPng(9, 8, (x, _) => 28 * x)
      val batch = Seq(
        (0L, grad),
        (1L, grad.clone()),
        (2L, grayPng(18, 16, (x, _) => 14 * x)),
        (3L, grayPng(9, 8, (x, _) => if (x % 2 == 1) 255 else 0)),
        (4L, grayPng(9, 8, (_, _) => 77)),
        (5L, grayPng(4, 4, (_, _) => 10)),
        (6L, "broken".getBytes)).toDF("img_id", "content")
      val index = graft.multimodal.ImageHash.buildImageIndex(
        Seq((100L, grayPng(9, 8, (x, _) => if (x % 2 == 1) 255 else 0)))
          .toDF("img_id", "content"), "img_id", "content")
      val r = graft.multimodal.MediaPipeline.curateImages(batch,
        graft.multimodal.MediaPipeline.Config("img_id", "content"),
        Some(index))
      val m = r.metrics.toMap
      r.kept.select(col("img_id"),
          lit(m("n_received")).as("n_received"),
          lit(m("n_valid")).as("n_valid"),
          lit(m("n_exact_kept")).as("n_exact_kept"),
          lit(m("n_near_kept")).as("n_near_kept"),
          lit(m("n_final")).as("n_final"))
        .orderBy("img_id")
    },

    // -- m21: FLAC decode → fingerprint identity — the base recording
    //    re-encoded losslessly (verbatim-subframe FLAC, independent
    //    bit-level writer) carries the same 16-bit integers as its
    //    WAV, so it must hash to the m15 level-table value; broken
    //    FLAC bytes (corrupted CRC) hash NULL → -999. ----------------
    "m21_flac_fingerprint" -> { (s, _) =>
      writeM21Fixture(s)
      import graft.multimodal.AudioFingerprint
      s.read.parquet(m21Dir)
        .select(col("audio_id"),
          coalesce(AudioFingerprint.spectralHash(col("content")),
            lit(-999L)).as("ahash"))
        .orderBy("audio_id")
    },

    // -- m19: incremental audio dedup vs the persisted signature
    //    index (the m12 shape for audio) — index = the base recording;
    //    its gain and requantized copies drop at distance 0, the
    //    complemented recording (64 bits) and the undecodable payload
    //    survive. ------------------------------------------------------
    "m19_audio_index_dedup" -> { (s, _) =>
      writeM15Fixture(s)
      import graft.multimodal.AudioFingerprint
      val all = s.read.parquet(m15Dir)
      val idx = AudioFingerprint.buildAudioIndex(
        all.filter(col("audio_id") === 0L), "audio_id", "content")
      AudioFingerprint.dropNearDuplicateAudio(all, idx,
          "audio_id", "content", maxHamming = 4)
        .select("audio_id").orderBy("audio_id")
    },

    // -- m18: incremental video dedup vs the persisted frame-hash
    //    index (the m12 shape for video) — index = clip 0; the base
    //    and its re-mux drop at full frame coverage, the different
    //    clip and the signature-less payload survive. ----------------
    "m18_video_index_dedup" -> { (s, _) =>
      writeM17Fixture(s)
      import graft.multimodal.VideoFrameHash
      val all = s.read.parquet(m17Dir)
      val idx = VideoFrameHash.buildVideoIndex(
        all.filter(col("video_id") === 0L), "video_id", "content")
      VideoFrameHash.dropNearDuplicateVideos(all, idx,
          "video_id", "content")
        .select("video_id").orderBy("video_id")
    },

    // -- m12: incremental image dedup vs the persisted image index —
    //    index = {grad9, stripes}; the batch loses grad9/grad18
    //    (hamming 0) and stripes/stripes1px (0 and 1); flat (≥32 bits
    //    from everything) and the undecodable payload survive. -------
    "m12_image_index_dedup" -> { (s, _) =>
      writeM10Fixture(s)
      import graft.multimodal.ImageHash
      val all = s.read.parquet(m10Dir)
      val idx = ImageHash.buildImageIndex(
        all.filter(col("img_id").isin(0L, 2L)), "img_id", "content")
      ImageHash.dropNearDuplicateImages(all, idx, "img_id", "content",
          maxHamming = 4)
        .select("img_id").orderBy("img_id")
    },

    // -- m10: perceptual image hash (dHash) — authored gray PNGs, one
    //    pixel per hash cell, every bit hand-derived (see the fixture
    //    doc); the broken payload must yield a NULL hash. ------------
    "m10_image_dhash" -> { (s, _) =>
      writeM10Fixture(s)
      import graft.multimodal.ImageHash
      // -999 sentinel instead of NULL: a NULL in an int64 column turns
      // the oracle's pandas frame float64 and the dtype-strict compare
      // red; the NULL contract itself is spec-pinned (ImageHashSpec)
      s.read.parquet(m10Dir)
        .select(col("img_id"),
          coalesce(ImageHash.dhash(col("content")), lit(-999L))
            .as("dhash"))
        .orderBy("img_id")
    },

    // -- m11: image near-dup via banded Hamming join over the m10
    //    fixture — resized copy at distance 0, one-pixel retouch at
    //    distance 1, everything else ≥ 32 bits apart. ----------------
    "m11_image_neardup" -> { (s, _) =>
      writeM10Fixture(s)
      import graft.multimodal.ImageHash
      ImageHash.nearDuplicateImages(
          s.read.parquet(m10Dir), "img_id", "content", maxHamming = 4)
        .orderBy("id_a", "id_b")
    },

    // -- m13: DCT perceptual hash (pHash) relations — every expected
    //    flag is THEORY-derived, not replayed from the implementation:
    //    a uniform brightness shift moves only the excluded DC term
    //    (eq_base 1); the same pattern at 2× resolution box-averages
    //    to nearly the same 32×32 luma grid (within the banded-join
    //    budget, near_base 1 — the exact bit bound is spec-pinned); a
    //    flat image has zero AC energy (is_zero 1); an unrelated
    //    pattern and an inverted one are far; a broken payload is
    //    undecodable (-1 sentinels, m10 NULL note). -------------------
    "m13_image_phash" -> { (s, _) =>
      writeM13Fixture(s)
      import graft.multimodal.ImageHash
      val df = s.read.parquet(m13Dir)
      val base = df.filter(col("img_id") === 0L)
        .select(ImageHash.phash(col("content")).as("__base_ph"))
      graft.ops.ScalarFold.withScalars(
          df.select(col("img_id"), ImageHash.phash(col("content")).as("ph")),
          base)
        .select(col("img_id"),
          when(col("ph").isNull, lit(-1))
            .otherwise((col("ph") === 0L).cast("int")).as("is_zero"),
          when(col("ph").isNull, lit(-1))
            .otherwise((col("ph") === col("__base_ph")).cast("int"))
            .as("eq_base"),
          when(col("ph").isNull, lit(-1))
            .otherwise((graft.functions.GraftFunctions
              .hamming(col("ph"), col("__base_ph")) <= 6).cast("int"))
            .as("near_base"))
        .orderBy("img_id")
    },

    // -- m8: REAL video header decode — the ISO-BMFF box walk (mvhd
    //    duration, vide-track tkhd dims, stts frame count, stsd codec,
    //    64-bit v1 headers) and the RIFF AVI chunk walk (avih), failure
    //    classes diagnosed. Fixture bytes authored box-by-box from the
    //    public specs by independent builder code; the oracle reads the
    //    stored expected columns back (m6/m7 pattern). ----------------
    "m8_video_meta" -> { (s, _) =>
      writeM8Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.VideoProbe.meta(bytes) match {
          case Some(m) => (m.container, m.width, m.height, m.durationMs,
            m.nTracks, m.nFrames, m.codec, "ok")
          case None => ("", -1, -1, -1L, -1, -1L, "",
            graft.engine.validate.VideoProbe.diagnose(bytes))
        }
      }
      s.read.parquet(m8Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("video_id"), col("__p._1").as("container"),
          col("__p._2").as("w"), col("__p._3").as("h"),
          col("__p._4").as("duration_ms"), col("__p._5").as("tracks"),
          col("__p._6").as("frames"), col("__p._7").as("codec"),
          col("__p._8").as("status"))
        .orderBy("video_id")
    },
    // -- m14: EBML / Matroska / WebM header walk — RFC 8794 vints
    //    (incl. unknown-size segments), DocType, TimestampScale-scaled
    //    float Duration, TrackEntry walk for dims + CodecID. Fixture
    //    bytes authored element-by-element from the public specs by
    //    independent builder code; oracle reads the stored expected
    //    columns back (m6/m7/m8 pattern). --------------------------
    "m14_mkv_meta" -> { (s, _) =>
      writeM14Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.VideoProbe.meta(bytes) match {
          case Some(m) => (m.container, m.width, m.height, m.durationMs,
            m.nTracks, m.nFrames, m.codec, "ok")
          case None => ("", -1, -1, -1L, -1, -1L, "",
            graft.engine.validate.VideoProbe.diagnose(bytes))
        }
      }
      s.read.parquet(m14Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("video_id"), col("__p._1").as("container"),
          col("__p._2").as("w"), col("__p._3").as("h"),
          col("__p._4").as("duration_ms"), col("__p._5").as("tracks"),
          col("__p._6").as("frames"), col("__p._7").as("codec"),
          col("__p._8").as("status"))
        .orderBy("video_id")
    },
    // -- m7: unified compressed-audio header decode — FLAC STREAMINFO
    //    bit unpacking and MPEG frame-header walk (VBR-safe sample
    //    count), WAV through the same entry point, failure classes
    //    diagnosed. Fixture bytes are authored field-by-field from the
    //    public specs by independent builder code; the oracle reads the
    //    stored expected columns back (m6 pattern). -------------------
    // -- m9: EXIF metadata probe — JPEG APP1 + TIFF IFD walk (both
    //    byte orders, inline + pointed values, EXIF sub-IFD) over
    //    fixture bytes authored field-by-field by independent builder
    //    code; the oracle reads the stored expected columns (m6/m7
    //    pattern). -1/"" = "no value" keeps columns null-free. --------
    "m9_exif_meta" -> { (s, _) =>
      writeM9Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.ExifProbe.info(bytes) match {
          case Some(e) => (e.orientation.getOrElse(-1),
            e.make.getOrElse(""), e.dateTimeOriginal.getOrElse(""),
            e.pixelX.getOrElse(-1L), "ok")
          case None => (-1, "", "", -1L, "no exif")
        }
      }
      s.read.parquet(m9Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("img_id"), col("__p._1").as("orientation"),
          col("__p._2").as("make"), col("__p._3").as("dt_original"),
          col("__p._4").as("pixel_x"), col("__p._5").as("status"))
        .orderBy("img_id")
    },

    "m7_audio_codecs" -> { (s, _) =>
      writeM7Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.AudioProbe.meta(bytes) match {
          case Some(m) => (m.codec, m.channels, m.sampleRateHz,
            m.bitsPerSample, m.nSamples, "ok")
          case None => ("", -1, -1, -1, -1L,
            graft.engine.validate.AudioProbe.diagnoseMeta(bytes))
        }
      }
      s.read.parquet(m7Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("audio_id"), col("__p._1").as("codec"),
          col("__p._2").as("channels"), col("__p._3").as("rate"),
          col("__p._4").as("bits"), col("__p._5").as("samples"),
          col("__p._6").as("status"))
        .orderBy("audio_id")
    },
    // -- m6: REAL audio header decode — AudioProbe (RIFF/WAVE chunk
    //    walk) recovers channels/rate/bits/frames from JDK-authored
    //    WAV bytes and classifies the failure modes; -1 = "no value"
    //    keeps the int columns null-free (m4 convention). The oracle
    //    reads the stored expected columns back. --------------------
    "m6_audio_meta" -> { (s, _) =>
      writeM6Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.AudioProbe.info(bytes) match {
          case Some(w) => (w.channels, w.sampleRateHz, w.bitsPerSample,
            w.nFrames, "ok")
          case None => (-1, -1, -1, -1L,
            graft.engine.validate.AudioProbe.diagnose(bytes))
        }
      }
      s.read.parquet(m6Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("audio_id"), col("__p._1").as("channels"),
          col("__p._2").as("rate"), col("__p._3").as("bits"),
          col("__p._4").as("frames"), col("__p._5").as("status"))
        .orderBy("audio_id")
    },

    // -- m4 / V10 kernel gate: the ImageProbe header read recovers the
    //    true dimensions from real encoded bytes of four formats, and
    //    classifies the three failure modes. -1 stands in for "no
    //    dimensions" so the int columns stay null-free (null-bearing
    //    int columns decay to float64 in the compare). ----------------
    "m4_image_dims" -> { (s, _) =>
      writeM4Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.ImageProbe.dimensions(bytes) match {
          case Some((w, h)) => (w, h, "ok")
          case None => (-1, -1, graft.engine.validate.ImageProbe.diagnose(bytes))
        }
      }
      s.read.parquet(m4Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("img_id"), col("__p._1").as("w"), col("__p._2").as("h"),
          col("__p._3").as("status"))
        .orderBy("img_id")
    },

    // -- m70: HEIC/AVIF inventory — brand-mapped format + the
    //    PRIMARY item's dimensions through the one ImageProbe front
    //    door (pitm+ipma resolution, not first-ispe); torn and
    //    non-heif rows take the m4 diagnosis classes. ---------------
    "m70_heif_probe" -> { (s, _) =>
      writeM70Fixture(s)
      import graft.engine.validate.{Heif, ImageProbe}
      val probe = udf { bytes: Array[Byte] =>
        val fmt = Heif.meta(bytes).map(_.format)
          .getOrElse(if (Heif.isHeif(bytes)) "heic" else "other")
        ImageProbe.dimensions(bytes) match {
          case Some((w, h)) => (fmt, w, h, "ok")
          case None => (fmt, -1, -1, ImageProbe.diagnose(bytes))
        }
      }
      s.read.parquet(m70Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("img_id"), col("__p._1").as("format"),
          col("__p._2").as("w"), col("__p._3").as("h"),
          col("__p._4").as("status"))
        .orderBy("img_id")
    },

    // -- m73: web image classes — favicon decode through the shared
    //    dHash kernels (the ICO ramp matches its bare-PNG twin's
    //    literal) and SVG dimension inventory; relative-unit SVGs
    //    refuse rather than guess a DPI. --------------------------------
    "m73_web_images" -> { (s, _) =>
      writeM73Fixture(s)
      import graft.engine.validate.{ImageProbe, SvgProbe}
      import graft.multimodal.{Ico, ImageHash}
      val probe = udf { bytes: Array[Byte] =>
        val fmt =
          if (Ico.isIco(bytes)) "ico"
          else if (SvgProbe.isSvg(bytes)) "svg"
          else "other"
        ImageProbe.dimensions(bytes) match {
          case Some((w, h)) => (fmt, w, h)
          case None         => (fmt, -1, -1)
        }
      }
      s.read.parquet(m73Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("img_id"), col("__p._1").as("format"),
          col("__p._2").as("w"), col("__p._3").as("h"),
          coalesce(ImageHash.dhash(col("payload")), lit(-999L))
            .as("dhash"))
        .orderBy("img_id")
    },

    // -- m74: EXIF-oriented dedup — every stored rotation/mirror of
    //    the ramp hashes to the upright literal under the oriented
    //    kernel; orientation surfaces from the same header walk. -----
    "m74_oriented_dedup" -> { (s, _) =>
      writeM74Fixture(s)
      import graft.engine.validate.ExifProbe
      import graft.multimodal.ImageHash
      val orient = udf { (b: Array[Byte]) =>
        ExifProbe.info(b).flatMap(_.orientation).getOrElse(-1)
      }
      s.read.parquet(m74Dir)
        .select(col("img_id"),
          orient(col("payload")).as("orientation"),
          coalesce(ImageHash.orientedDhash(col("payload")), lit(-999L))
            .as("oriented_dhash"))
        .orderBy("img_id")
    },

    // -- m83: bare AAC (ADTS) inventory — the frame-header walk
    //    (syncword + two-header confirm + sample accumulation)
    //    through the ONE meta() front door; decode stays a recorded
    //    skip (the MP3-tables posture). ------------------------------
    "m83_adts_inventory" -> { (s, _) =>
      writeM83Fixture(s)
      import graft.engine.validate.AudioProbe
      val probe = udf { (b: Array[Byte]) =>
        AudioProbe.meta(b) match {
          case Some(m) => (m.codec, m.channels, m.sampleRateHz,
            m.nSamples, "ok")
          case None => ("", -1, -1, -1L, AudioProbe.diagnoseMeta(b))
        }
      }
      s.read.parquet(m83Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("audio_id"), col("__p._1").as("codec"),
          col("__p._2").as("channels"), col("__p._3").as("rate"),
          col("__p._4").as("samples"), col("__p._5").as("status"))
        .orderBy("audio_id")
    },

    // -- m82: EXIF GPS inventory + redaction — capture coordinates
    //    (the #1 image-PII class) surface as micro-degrees, and the
    //    strip transform removes them while preserving the oriented
    //    dHash byte-for-byte elsewhere (the c13-for-images). ---------
    "m82_exif_gps" -> { (s, _) =>
      writeM82Fixture(s)
      import graft.engine.validate.ExifProbe
      import graft.multimodal.ImageHash
      val NoV = -999999999L
      val gpsU = udf { (b: Array[Byte]) =>
        ExifProbe.gps(b) match {
          case Some(g) => (math.floor(g.lat * 1e6).toLong,
            math.floor(g.lon * 1e6).toLong,
            g.alt.map(a => math.floor(a * 100).toLong).getOrElse(NoV))
          case None => (NoV, NoV, NoV)
        }
      }
      val stripOk = udf { (b: Array[Byte]) =>
        val st = ExifProbe.stripGps(b)
        val gone = ExifProbe.gps(st).isEmpty
        val hashKept = ImageHash.orientedDhash64(b) ==
          ImageHash.orientedDhash64(st)
        val bytesOk =
          if (ExifProbe.gps(b).isEmpty) java.util.Arrays.equals(b, st)
          else st.length == b.length
        if (gone && hashKept && bytesOk) 1 else 0
      }
      s.read.parquet(m82Dir)
        .withColumn("__g", gpsU(col("payload")))
        .select(col("img_id"), col("__g._1").as("lat_u"),
          col("__g._2").as("lon_u"), col("__g._3").as("alt_c"),
          stripOk(col("payload")).as("strip_ok"))
        .orderBy("img_id")
    },

    // -- m76: animated-image inventory — frame counts keep animated
    //    memes from inventorying as stills; the APNG default image
    //    still decodes and probes. ----------------------------------
    "m76_animated_images" -> { (s, _) =>
      writeM76Fixture(s)
      import graft.engine.validate.ImageProbe
      val anim = udf { (b: Array[Byte]) => ImageProbe.animation(b) }
      s.read.parquet(m76Dir)
        .withColumn("__a", anim(col("payload")))
        .select(col("img_id"),
          coalesce(col("__a._1"), lit("none")).as("kind"),
          coalesce(col("__a._2"), lit(-1)).as("frames"))
        .orderBy("img_id")
    },

    // -- m5: the SAME real-decode kernel, but through the Multimodal
    //    withMeta path (typed mapPartitions batch decode + meta join on
    //    path) instead of a bare UDF — gating the full multimodal
    //    plumbing: binary payload → partition-batched MediaDecoder
    //    .decode → typed struct → joined back without row
    //    multiplication. Oracle reads the stored expected columns; the
    //    "ok"-status coalesce mirrors m4's -1 convention. -------------
    "m5_real_dims" -> { (s, _) =>
      writeM4Fixture(s)
      val media = s.read.parquet(m4Dir)
        .withColumn("path", concat(lit("mem://img/"), col("img_id")))
      graft.multimodal.Multimodal.withMeta(media, "image")
        .select(col("img_id"), col("meta.width").as("w"),
          col("meta.height").as("h"),
          col("meta.decodeStatus").as("status"))
        .orderBy("img_id")
    },

    "m1_binary_meta" -> { (s, d) =>
      // text → utf-8 bytes as the stand-in media payload
      val blob = col("text").cast("binary")
      val width = (ascii(substring(col("text"), 1, 1)) % 64 + 1) * 16
      val height = (ascii(substring(col("text"), 2, 1)) % 64 + 1) * 16
      Tables.documents(s, d)
        .withColumn("payload", blob)
        .withColumn("n_bytes", length(col("payload")))
        .withColumn("content_sha", sha2(col("payload"), 256))
        .withColumn("width", width)
        .withColumn("height", height)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_media"),
          sum("n_bytes").as("total_bytes"),
          countDistinct("content_sha").as("n_distinct_payloads"),
          // concat, not concat_ws: concat_ws IGNORES null args (a null
          // dim would yield "" and still count) while the oracle's ||
          // propagates NULL, which count(DISTINCT) skips — concat has
          // the same null-propagation as ||.
          countDistinct(concat(col("width").cast("string"), lit("x"),
            col("height").cast("string"))).as("n_resolutions"),
          max("width").as("max_w"),
          max("height").as("max_h"))
        .orderBy("source")
    },

    // -- m3: the full media→features→ANN composition: payload bytes →
    //    mapPartitions feature extraction (stub encoder, real batch
    //    plumbing) → brute-force top-k cosine search. Integer-count
    //    features are float32-exact, so the oracle's double math lands
    //    on identical cosines. ----------------------------------------
    "m3_feature_ann" -> { (s, d) =>
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      def feats(m: org.apache.spark.sql.DataFrame) =
        graft.multimodal.Multimodal.featureExtract(m, "doc_id", "payload")
          .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
      // Filter BEFORE extraction for the query side: the typed
      // mapPartitions blocks predicate pushdown, so filtering after
      // would feature-extract the whole corpus to fetch 3 vectors.
      graft.ops.Similarity
        .bruteForceTopK(feats(media), feats(media.filter(col("doc_id") < 3)),
          "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy("q_id", "rank")
    },

    // V10 analogue: all media must share ONE resolution — report the
    // distinct-resolution inventory exactly like the image validator
    // (image_validator.py:250-307 collects the resolution set).
    "m2_resolution_check" -> { (s, d) =>
      val width = (ascii(substring(col("text"), 1, 1)) % 4 + 1) * 64
      val height = (ascii(substring(col("text"), 2, 1)) % 4 + 1) * 64
      Tables.documents(s, d)
        .withColumn("res", // concat ≡ oracle's || on NULL, see m1
          concat(width.cast("string"), lit("x"), height.cast("string")))
        .groupBy("res")
        .agg(count(lit(1)).as("n"),
          concat_ws(",", transform(slice(sort_array(collect_set(col("doc_id"))), 1, 3),
            x => x.cast("string"))).as("sample_ids"))
        .orderBy("res")
    })

  def oracle: Map[String, String] = Map(
    // Level-table-derived hashes ride the fixture (writeM15Fixture's
    // doc has the derivation); broken bytes are the -999 sentinel.
    "m15_audio_fingerprint" ->
      s"""SELECT audio_id, exp_hash AS ahash
         |FROM read_parquet('$m15Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    // Theory-derived pairs: ids 0/1/2 are the same recording under
    // gain and requantization (invariance → distance 0); id 3 is the
    // complemented level table (64 bits); id 4 is undecodable.
    "m16_audio_neardup" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 1::BIGINT, 0::INT),
        |  (0::BIGINT, 2::BIGINT, 0::INT),
        |  (1::BIGINT, 2::BIGINT, 0::INT)) t(id_a, id_b, hamming)
        |ORDER BY id_a, id_b""".stripMargin,
    // Frame-byte identity: the re-mux (id 1) carries clip 0's exact
    // JPEG bytes → all 8 sampled hashes match on both sides; the
    // other clip and the non-video pair with nothing.
    "m17_video_neardup" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 1::BIGINT, 8::BIGINT, 8::BIGINT, 8::BIGINT, 8::BIGINT))
        |  t(vid_a, vid_b, n_frames_a, n_frames_b, matched_a, matched_b)
        |ORDER BY vid_a, vid_b""".stripMargin,
    // Hand-derived Dialogue rows ride the fixture (centisecond
    // arithmetic in its doc); the Comment line and the event-less
    // document contribute nothing.
    "m24_ass_cues" ->
      s"""SELECT doc_id, cue_index, start_ms, end_ms, text
         |FROM read_parquet('${m24Dir}_exp/*.parquet')
         |ORDER BY doc_id, cue_index""".stripMargin,
    // Hand-derived cue rows ride the fixture (timestamp arithmetic in
    // the gate doc; the prose document contributes nothing).
    "m23_subtitle_cues" ->
      s"""SELECT doc_id, cue_index, start_ms, end_ms, text
         |FROM read_parquet('${m23Dir}_exp/*.parquet')
         |ORDER BY doc_id, cue_index""".stripMargin,
    // Hand-derived stage arithmetic over the m10 image family: 7 in,
    // 5 decodable-and-big-enough, 4 after the exact drop, 3 after the
    // perceptual drop (2x render, Hamming 0), 2 after the indexed
    // stripes drop — survivors 0 (gradient) and 4 (flat).
    "m22_media_pipeline" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 7::BIGINT, 5::BIGINT, 4::BIGINT, 3::BIGINT, 2::BIGINT),
        |  (4::BIGINT, 7::BIGINT, 5::BIGINT, 4::BIGINT, 3::BIGINT, 2::BIGINT))
        |  t(img_id, n_received, n_valid, n_exact_kept, n_near_kept, n_final)
        |ORDER BY img_id""".stripMargin,
    // Level-table hashes ride the fixture (same derivation as m15 —
    // lossless re-encode carries identical integers); the corrupted
    // stream is the -999 sentinel.
    "m21_flac_fingerprint" ->
      s"""SELECT audio_id, exp_hash AS ahash
         |FROM read_parquet('$m21Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    // Derived from the hop arithmetic + pattern distinctness: the 6 s
    // recording has 5 windows (2 s window, 1 s hop), the hop-aligned
    // 3 s excerpt has 2 — and those 2 ARE original windows 2 and 3
    // (bit-exact), so both match at Hamming 0: n=(5,2), matched=(2,2),
    // excerpt coverage 2/2 = 1. The complement recording's windows
    // flip every bit; the non-audio payload has no signature.
    "m20_audio_excerpt" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 1::BIGINT, 5::BIGINT, 2::BIGINT, 2::BIGINT, 2::BIGINT))
        |  t(id_a, id_b, n_windows_a, n_windows_b, matched_a, matched_b)
        |ORDER BY id_a, id_b""".stripMargin,
    // Survivors: id 0 IS the indexed recording and 1/2 are its copies
    // (distance 0); the complemented recording (3) is 64 bits away and
    // the undecodable payload (4) hashes NULL — both pass through.
    "m19_audio_index_dedup" ->
      """SELECT * FROM (VALUES (3::BIGINT), (4::BIGINT)) t(audio_id)
        |ORDER BY audio_id""".stripMargin,
    // Survivors: the indexed clip (0) and its re-mux (1) are fully
    // frame-covered; the different clip (2) shares no frame; the
    // non-video (3) has no signature and must pass through.
    "m18_video_index_dedup" ->
      """SELECT * FROM (VALUES (2::BIGINT), (3::BIGINT)) t(video_id)
        |ORDER BY video_id""".stripMargin,

    // Hand-derived hashes ride the fixture (derivation in
    // writeM10Fixture's doc); the broken image is the -999 sentinel.
    "m10_image_dhash" ->
      s"""SELECT img_id, exp_hash AS dhash
         |FROM read_parquet('$m10Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m11_image_neardup" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 4::BIGINT, 0::INT),
        |  (2::BIGINT, 3::BIGINT, 1::INT)) t(id_a, id_b, hamming)
        |ORDER BY id_a, id_b""".stripMargin,
    // Theory-derived relations (see writeM13Fixture): brightness shift
    // and the alignment-exact 2x render hash identically to the base;
    // the unrelated pattern and flat are far; broken bytes -1.
    "m13_image_phash" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 0, 1, 1), (1::BIGINT, 0, 1, 1), (2::BIGINT, 0, 1, 1),
        |  (3::BIGINT, 0, 0, 0), (4::BIGINT, 1, 0, 0),
        |  (5::BIGINT, -1, -1, -1)) t(img_id, is_zero, eq_base, near_base)
        |ORDER BY img_id""".stripMargin,
    // Survivors derived from the m10 hash table: flat is ≥ 32 bits
    // from both index entries; the broken payload hashes NULL and the
    // dedupper must pass it through untouched.
    "m12_image_index_dedup" ->
      """SELECT * FROM (VALUES (1::BIGINT), (5::BIGINT)) t(img_id)
        |ORDER BY img_id""".stripMargin,

    "m8_video_meta" ->
      s"""SELECT video_id, exp_container AS container, exp_w AS w, exp_h AS h,
         |  exp_duration_ms AS duration_ms, exp_tracks AS tracks,
         |  exp_frames AS frames, exp_codec AS codec, exp_status AS status
         |FROM read_parquet('$m8Dir/*.parquet')
         |ORDER BY video_id""".stripMargin,
    "m14_mkv_meta" ->
      s"""SELECT video_id, exp_container AS container, exp_w AS w, exp_h AS h,
         |  exp_duration_ms AS duration_ms, exp_tracks AS tracks,
         |  exp_frames AS frames, exp_codec AS codec, exp_status AS status
         |FROM read_parquet('$m14Dir/*.parquet')
         |ORDER BY video_id""".stripMargin,
    "m9_exif_meta" ->
      s"""SELECT img_id, exp_orientation AS orientation, exp_make AS make,
         |  exp_dto AS dt_original, exp_px AS pixel_x,
         |  exp_status AS status
         |FROM read_parquet('$m9Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m7_audio_codecs" ->
      s"""SELECT audio_id, exp_codec AS codec, exp_channels AS channels,
         |  exp_rate AS rate, exp_bits AS bits, exp_samples AS samples,
         |  exp_status AS status
         |FROM read_parquet('$m7Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    "m6_audio_meta" ->
      s"""SELECT audio_id, exp_channels AS channels, exp_rate AS rate,
         |  exp_bits AS bits, exp_frames AS frames, exp_status AS status
         |FROM read_parquet('$m6Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    "m5_real_dims" ->
      s"""SELECT img_id, coalesce(exp_w, -1) AS w, coalesce(exp_h, -1) AS h,
         |  exp_status AS status
         |FROM read_parquet('$m4Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m4_image_dims" ->
      s"""SELECT img_id, coalesce(exp_w, -1) AS w, coalesce(exp_h, -1) AS h,
         |  exp_status AS status
         |FROM read_parquet('$m4Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m70_heif_probe" ->
      s"""SELECT img_id, exp_format AS format, exp_w AS w, exp_h AS h,
         |  exp_status AS status
         |FROM read_parquet('$m70Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m73_web_images" ->
      s"""SELECT img_id, exp_format AS format, exp_w AS w, exp_h AS h,
         |  exp_dhash AS dhash
         |FROM read_parquet('$m73Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m74_oriented_dedup" ->
      s"""SELECT img_id, exp_orientation AS orientation,
         |  exp_oriented_dhash AS oriented_dhash
         |FROM read_parquet('$m74Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m76_animated_images" ->
      s"""SELECT img_id, exp_kind AS kind, exp_frames AS frames
         |FROM read_parquet('$m76Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m82_exif_gps" ->
      s"""SELECT img_id, exp_lat_u AS lat_u, exp_lon_u AS lon_u,
         |  exp_alt_c AS alt_c, exp_strip_ok AS strip_ok
         |FROM read_parquet('$m82Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m83_adts_inventory" ->
      s"""SELECT audio_id, exp_codec AS codec, exp_channels AS channels,
         |  exp_rate AS rate, exp_samples AS samples,
         |  exp_status AS status
         |FROM read_parquet('$m83Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    "m1_binary_meta" ->
      """SELECT source, count(*) AS n_media,
        | sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        | count(DISTINCT sha256(text)) AS n_distinct_payloads,
        | count(DISTINCT ((ascii(substr(text,1,1)) % 64 + 1) * 16)::VARCHAR || 'x' ||
        |                ((ascii(substr(text,2,1)) % 64 + 1) * 16)::VARCHAR) AS n_resolutions,
        | max((ascii(substr(text,1,1)) % 64 + 1) * 16) AS max_w,
        | max((ascii(substr(text,2,1)) % 64 + 1) * 16) AS max_h
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "m3_feature_ann" ->
      """WITH f AS (
        |  SELECT doc_id, [
        |    len(regexp_extract_all(text, '[aeiou]'))::DOUBLE,
        |    len(regexp_extract_all(text, '[0-9]'))::DOUBLE,
        |    len(regexp_extract_all(text, ' '))::DOUBLE,
        |    len(regexp_extract_all(text, '[a-z]'))::DOUBLE,
        |    len(regexp_extract_all(text, '[A-Z]'))::DOUBLE,
        |    len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE ] AS v
        |  FROM documents)
        |SELECT q_id, rank, neighbor_id, round(cos, 6) AS cos_r FROM (
        |  SELECT q_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM (
        |    -- zero-norm guard: the engine defines cosine(0-vec, x) = 0,
        |    -- while list_cosine_similarity yields NaN (which would sort
        |    -- FIRST under DESC and steal rank 1)
        |    SELECT q.doc_id AS q_id, c.doc_id AS neighbor_id,
        |      CASE WHEN isnan(list_cosine_similarity(c.v, q.v)) THEN 0.0
        |           ELSE list_cosine_similarity(c.v, q.v) END AS cos
        |    FROM f q JOIN f c ON q.doc_id < 3 AND c.doc_id != q.doc_id)
        |) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "m2_resolution_check" ->
      """SELECT res, count(*) AS n,
        | array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 3), ',') AS sample_ids
        |FROM (
        |  SELECT doc_id,
        |    ((ascii(substr(text,1,1)) % 4 + 1) * 64)::VARCHAR || 'x' ||
        |    ((ascii(substr(text,2,1)) % 4 + 1) * 64)::VARCHAR AS res
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
