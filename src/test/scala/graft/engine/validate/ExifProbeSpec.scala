package graft.engine.validate

import org.scalatest.funsuite.AnyFunSuite

/** EXIF probe contract over byte-by-byte authored fixtures: both byte
  * orders, inline and pointed values, the EXIF sub-IFD, the JPEG APP1
  * walk, and an every-prefix truncation fuzz.
  */
class ExifProbeSpec extends AnyFunSuite {

  private class Tiff(little: Boolean) {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u8(v: Int): this.type = { out += v.toByte; this }
    def u16(v: Int): this.type = {
      if (little) { u8(v & 0xff); u8(v >> 8) }
      else { u8(v >> 8); u8(v & 0xff) }
      this
    }
    def u32(v: Long): this.type = {
      if (little) { u8((v & 0xff).toInt); u8(((v >> 8) & 0xff).toInt)
        u8(((v >> 16) & 0xff).toInt); u8(((v >> 24) & 0xff).toInt) }
      else { u8(((v >> 24) & 0xff).toInt); u8(((v >> 16) & 0xff).toInt)
        u8(((v >> 8) & 0xff).toInt); u8((v & 0xff).toInt) }
      this
    }
    def ascii(s: String): this.type = { s.foreach(c => u8(c.toInt)); this }
    def bytes: Array[Byte] = out.toArray
  }

  /** A TIFF block with IFD0 {Orientation=6 inline, Make="GraftCam 1"
    * at offset 86, ExifIFD→50} and sub-IFD {PixelX=1024 inline LONG,
    * DateTimeOriginal="2026:08:14 06:00:00" at offset 98}.
    */
  private def tiffBytes(little: Boolean): Array[Byte] = {
    val t = new Tiff(little)
    if (little) t.ascii("II").u16(42) else t.ascii("MM").u16(42)
    t.u32(8)                       // IFD0 offset
    // IFD0 @8: 3 entries (2 + 3*12 + 4 = 42 bytes → next free 50)
    t.u16(3)
    t.u16(0x0112).u16(3).u32(1)    // Orientation SHORT ×1, inline
    if (little) t.u16(6).u16(0) else t.u16(6).u16(0)
    t.u16(0x010f).u16(2).u32(11).u32(86) // Make ASCII ×11 @86
    t.u16(0x8769).u16(4).u32(1).u32(50)  // ExifIFD → 50
    t.u32(0)                       // next-IFD pointer
    // sub-IFD @50: 2 entries (2 + 2*12 + 4 = 30 bytes → ends 80)
    t.u16(2)
    t.u16(0xa002).u16(4).u32(1).u32(1024) // PixelX LONG inline
    t.u16(0x9003).u16(2).u32(20).u32(98)  // DateTimeOriginal @98
    t.u32(0)
    while (t.out.length < 86) t.u8(0)
    t.ascii("GraftCam 1").u8(0)    // 11 bytes incl. NUL → ends 97
    t.u8(0)                        // pad to 98
    t.ascii("2026:08:14 06:00:00").u8(0)
    t.bytes
  }

  private def jpegWrap(tiff: Array[Byte]): Array[Byte] = {
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = app1.length + 2
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      (len >> 8).toByte, (len & 0xff).toByte) ++ app1 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  private def check(info: ExifProbe.ExifInfo): Unit = {
    assert(info.orientation.contains(6))
    assert(info.make.contains("GraftCam 1"))
    assert(info.dateTimeOriginal.contains("2026:08:14 06:00:00"))
    assert(info.pixelX.contains(1024L))
    assert(info.model.isEmpty && info.pixelY.isEmpty)
  }

  test("bare TIFF, both byte orders") {
    check(ExifProbe.info(tiffBytes(little = true)).get)
    check(ExifProbe.info(tiffBytes(little = false)).get)
  }

  test("JPEG APP1 walk finds the EXIF block behind other segments") {
    val direct = jpegWrap(tiffBytes(little = true))
    check(ExifProbe.info(direct).get)
    // APP0 (JFIF) first, APP1 second — the walk must skip it
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 7) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0)
    val shifted = direct.take(2) ++ app0 ++ direct.drop(2)
    check(ExifProbe.info(shifted).get)
  }

  test("non-EXIF inputs yield None, never a throw") {
    assert(ExifProbe.info(null).isEmpty)
    assert(ExifProbe.info(Array.empty[Byte]).isEmpty)
    assert(ExifProbe.info("not an image at all".getBytes).isEmpty)
    // JPEG with no APP1
    assert(ExifProbe.info(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isEmpty)
    // PNG magic
    assert(ExifProbe.info(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      13, 10, 26, 10)).isEmpty)
  }

  test("every byte prefix parses without throwing") {
    val full = jpegWrap(tiffBytes(little = true))
    (0 to full.length).foreach { n =>
      ExifProbe.info(full.take(n)) // must not throw; fields may be absent
    }
    val fullBe = tiffBytes(little = false)
    (0 to fullBe.length).foreach(n => ExifProbe.info(fullBe.take(n)))
  }

  test("hostile offsets end fields, not the parse") {
    // Make pointer beyond the buffer: field absent, others survive
    val t = tiffBytes(little = true)
    // Make entry's offset field sits at IFD0 entry 2's value slot:
    // 8(header)+2(count)+12(entry0)+8 = byte 30..33 → overwrite huge
    val hostile = t.clone()
    hostile(30) = 0xff.toByte; hostile(31) = 0xff.toByte
    hostile(32) = 0xff.toByte; hostile(33) = 0x7f.toByte
    val info = ExifProbe.info(hostile).get
    assert(info.make.isEmpty)
    assert(info.orientation.contains(6)) // unaffected
  }

  // ---- GPS IFD (tag 0x8825) ---------------------------------------

  /** IFD0 {Orientation=6, GPSIFD→38}; GPS IFD @38 with six entries:
    * N 37°46'29.74", W 122°25'9.92", altitude 10 m below sea level.
    * Rational blocks at 116 (lat), 140 (lon), 164 (alt).
    */
  private def gpsTiff(little: Boolean): Array[Byte] = {
    val t = new Tiff(little)
    if (little) t.ascii("II").u16(42) else t.ascii("MM").u16(42)
    t.u32(8)
    t.u16(2)                                  // IFD0 @8, 2 entries
    t.u16(0x0112).u16(3).u32(1).u16(6).u16(0) // Orientation
    t.u16(0x8825).u16(4).u32(1).u32(38)       // GPS IFD → 38
    t.u32(0)
    t.u16(6)                                  // GPS IFD @38, 6 entries
    t.u16(0x0001).u16(2).u32(2).u8('N').u8(0).u8(0).u8(0)
    t.u16(0x0002).u16(5).u32(3).u32(116)      // lat rationals
    t.u16(0x0003).u16(2).u32(2).u8('W').u8(0).u8(0).u8(0)
    t.u16(0x0004).u16(5).u32(3).u32(140)      // lon rationals
    t.u16(0x0005).u16(1).u32(1).u8(1).u8(0).u8(0).u8(0) // below sea
    t.u16(0x0006).u16(5).u32(1).u32(164)      // altitude
    t.u32(0)                                  // ends at 116
    t.u32(37).u32(1).u32(46).u32(1).u32(2974).u32(100)  // @116
    t.u32(122).u32(1).u32(25).u32(1).u32(992).u32(100)  // @140
    t.u32(1000).u32(100)                                // @164
    t.bytes
  }

  private val expLat = 37.0 + 46.0 / 60 + 29.74 / 3600
  private val expLon = -(122.0 + 25.0 / 60 + 9.92 / 3600)

  test("GPS IFD parses to signed decimal degrees, both byte orders") {
    for (little <- Seq(true, false)) {
      val g = ExifProbe.gps(gpsTiff(little))
      assert(g.isDefined, s"little=$little")
      assert(math.abs(g.get.lat - expLat) < 1e-9)
      assert(math.abs(g.get.lon - expLon) < 1e-9)
      assert(g.get.alt.exists(a => math.abs(a - (-10.0)) < 1e-9))
      // the JPEG wrap parses identically
      assert(ExifProbe.gps(jpegWrap(gpsTiff(little))).isDefined)
    }
  }

  test("stripGps removes the pointer AND zeroes the coordinate " +
    "bytes; orientation survives; length unchanged") {
    for (little <- Seq(true, false)) {
      val full = jpegWrap(gpsTiff(little))
      val stripped = ExifProbe.stripGps(full)
      assert(stripped.length == full.length)
      assert(ExifProbe.gps(stripped).isEmpty)
      assert(ExifProbe.info(stripped).exists(_.orientation.contains(6)))
      // no coordinate remnants: the rational payload (37, 46, 2974,
      // 122, 25, 992) must not survive anywhere in the stripped bytes
      val t0 = full.indexOfSlice("Exif".getBytes("US-ASCII")) + 6
      val gpsRegion = stripped.slice(t0 + 38, t0 + 172)
      assert(gpsRegion.forall(_ == 0))
    }
  }

  test("stripGps is a pass-through when no GPS block exists") {
    val noGps = jpegWrap(tiffBytes(little = true))
    assert(ExifProbe.stripGps(noGps) eq noGps)
    val junk = "not an image".getBytes("UTF-8")
    assert(ExifProbe.stripGps(junk) eq junk)
    assert(ExifProbe.stripGps(null) == null)
  }

  test("GPS on a real JPEG: oriented dHash identical after stripping") {
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val plainJpeg = bos.toByteArray
    // splice the GPS APP1 right after SOI
    val tiff = gpsTiff(little = true)
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = app1.length + 2
    val withGps = plainJpeg.take(2) ++
      Array[Byte](0xff.toByte, 0xe1.toByte,
        (len >> 8).toByte, (len & 0xff).toByte) ++ app1 ++
      plainJpeg.drop(2)
    assert(ExifProbe.gps(withGps).isDefined)
    val stripped = ExifProbe.stripGps(withGps)
    assert(ExifProbe.gps(stripped).isEmpty)
    val h1 = graft.multimodal.ImageHash.orientedDhash64(withGps)
    val h2 = graft.multimodal.ImageHash.orientedDhash64(stripped)
    assert(h1.isDefined && h1 == h2)
  }

  test("HEIC Exif item: orientation + GPS resolve through the iinf/" +
    "iloc walk; stripGps redacts in place; both payload offsets") {
    import graft.queries.HeifFixture
    for ((prefix, pname) <- Seq(
      ("Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0), "Exif00"),
      (Array.emptyByteArray, "bare"))) {
      val heic = HeifFixture.heifWithExif("heic", Seq("mif1"), Some(1),
        Seq(HeifFixture.codecConfig("hvcC"), HeifFixture.ispe(640, 480)),
        Seq(1 -> Seq(1, 2)), tiff = gpsTiff(little = true),
        exifPrefix = prefix)
      assert(ExifProbe.info(heic).exists(_.orientation.contains(6)),
        s"$pname: orientation")
      val g = ExifProbe.gps(heic)
      assert(g.isDefined && math.abs(g.get.lat - expLat) < 1e-9,
        s"$pname: gps")
      // the probe's own meta still reads (dimensions undisturbed)
      assert(Heif.meta(heic).exists(m =>
        m.format == "heic" && m.width == 640))
      val stripped = ExifProbe.stripGps(heic)
      assert(stripped.length == heic.length)
      assert(ExifProbe.gps(stripped).isEmpty, s"$pname: strip")
      assert(ExifProbe.info(stripped).exists(_.orientation.contains(6)))
      assert(Heif.meta(stripped).exists(_.width == 640))
    }
    // a HEIC without an Exif item stays None / pass-through
    val plain = HeifFixture.heif("heic", Seq("mif1"), Some(1),
      Seq(HeifFixture.ispe(64, 64)), Seq(1 -> Seq(1)))
    assert(ExifProbe.gps(plain).isEmpty)
    assert(ExifProbe.stripGps(plain) eq plain)
    // every-prefix fuzz over the item-carrying container
    val full = HeifFixture.heifWithExif("heic", Seq("mif1"), Some(1),
      Seq(HeifFixture.ispe(8, 8)), Seq(1 -> Seq(1)),
      tiff = gpsTiff(little = false))
    (0 to full.length).foreach { n =>
      ExifProbe.gps(full.take(n)); ExifProbe.stripGps(full.take(n))
    }
  }

  test("PNG eXIf chunk: GPS parses; stripGps re-seals the chunk CRC " +
    "so the stripped file is still a valid PNG with the same pixels") {
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 20) << 8) | 99)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val plain = bos.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      val v = crc.getValue
      Array(((data.length >> 24) & 0xff).toByte,
        ((data.length >> 16) & 0xff).toByte,
        ((data.length >> 8) & 0xff).toByte,
        (data.length & 0xff).toByte) ++ t ++ data ++
        Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    }
    // splice eXIf after IHDR (8-byte sig + 25-byte IHDR chunk)
    val cut = 8 + 25
    val png = plain.take(cut) ++ chunk("eXIf", gpsTiff(little = true)) ++
      plain.drop(cut)
    assert(ExifProbe.gps(png).isDefined)
    assert(math.abs(ExifProbe.gps(png).get.lat - expLat) < 1e-9)
    val stripped = ExifProbe.stripGps(png)
    assert(stripped.length == png.length)
    assert(ExifProbe.gps(stripped).isEmpty)
    assert(ExifProbe.info(stripped).exists(_.orientation.contains(6)))
    // the re-sealed PNG still decodes with identical pixels
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(stripped))
    assert(back != null && back.getWidth == 16)
    for (y <- 0 until 12; x <- 0 until 16)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF))
    // plain PNG without the chunk: None / pass-through
    assert(ExifProbe.gps(plain).isEmpty)
    assert(ExifProbe.stripGps(plain) eq plain)
    (0 to png.length by 7).foreach { n =>
      ExifProbe.gps(png.take(n)); ExifProbe.stripGps(png.take(n))
    }
  }

  test("WebP EXIF chunk: GPS parses with and without the JPEG-style " +
    "prefix; stripGps redacts in place") {
    def webp(exifData: Array[Byte]): Array[Byte] = {
      def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 24) & 0xff).toByte)
      val vp8x = "VP8X".getBytes("US-ASCII") ++ le32(10) ++
        Array[Byte](0x08, 0, 0, 0) ++ // EXIF flag
        Array[Byte](15, 0, 0, 11, 0, 0) // 16x12 minus-one dims
      val exif = "EXIF".getBytes("US-ASCII") ++ le32(exifData.length) ++
        exifData ++ (if (exifData.length % 2 == 1) Array[Byte](0)
        else Array.emptyByteArray)
      val body = "WEBP".getBytes("US-ASCII") ++ vp8x ++ exif
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val bare = webp(gpsTiff(little = true))
    val prefixed = webp("Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ gpsTiff(little = false))
    for ((w, name) <- Seq((bare, "bare"), (prefixed, "prefixed"))) {
      val g = ExifProbe.gps(w)
      assert(g.isDefined && math.abs(g.get.lat - expLat) < 1e-9, name)
      val stripped = ExifProbe.stripGps(w)
      assert(stripped.length == w.length)
      assert(ExifProbe.gps(stripped).isEmpty, name)
      assert(ExifProbe.info(stripped).exists(_.orientation.contains(6)))
    }
    (0 to bare.length by 5).foreach { n =>
      ExifProbe.gps(bare.take(n)); ExifProbe.stripGps(bare.take(n))
    }
  }

  test("hostile GPS structures never throw: lying pointers, huge " +
    "counts, zero denominators, every-prefix fuzz") {
    val base = gpsTiff(little = true)
    // GPS pointer beyond the buffer (IFD0 entry 1 value @ 8+2+12+8=30)
    val far = base.clone()
    far(30) = 0xff.toByte; far(31) = 0xff.toByte
    far(32) = 0xff.toByte; far(33) = 0x7f.toByte
    assert(ExifProbe.gps(far).isEmpty)
    assert(ExifProbe.stripGps(far).length == far.length) // no throw
    // GPS IFD entry count lies huge (count @38+2... GPS IFD starts 38)
    val hugeN = base.clone()
    hugeN(38) = 0xff.toByte; hugeN(39) = 0x7f.toByte
    ExifProbe.gps(hugeN); ExifProbe.stripGps(hugeN)
    // zero denominator in the lat rationals (@116: num,den pairs)
    val zeroDen = base.clone()
    for (i <- 120 until 124) zeroDen(i) = 0
    assert(ExifProbe.gps(zeroDen).isEmpty)
    // every-prefix fuzz through both entries
    (0 to base.length).foreach { n =>
      ExifProbe.gps(base.take(n)); ExifProbe.stripGps(base.take(n))
    }
    val wrapped = jpegWrap(base)
    (0 to wrapped.length).foreach { n =>
      ExifProbe.gps(wrapped.take(n)); ExifProbe.stripGps(wrapped.take(n))
    }
  }
}
