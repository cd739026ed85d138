package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** JDK triangulation for the from-spec CCITT T.4/T.6 decoder: the
  * JDK's bundled TIFF plugin independently ENCODES and DECODES CCITT
  * RLE / T.4 / T.6, so every house-decoded raster is compared
  * bit-for-bit against both the original pixels and the JDK's decode
  * of the same strip bytes (the m63/m69 recipe).
  */
class CcittSpec extends AnyFunSuite {

  // ---- fixture: JDK TIFF encode of a bilevel raster ---------------

  private def bilevel(w: Int, h: Int,
                      f: (Int, Int) => Boolean): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (f(x, y)) 0x000000 else 0xFFFFFF) // true=black
    img
  }

  private def jdkTiff(img: java.awt.image.BufferedImage,
                      compressionType: String): Array[Byte] = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assert(it.hasNext, "JDK TIFF writer missing")
    val writer = it.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(compressionType)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  // ---- independent minimal IFD walk (spec-local, not house code) --

  private case class Ifd(width: Int, height: Int, compression: Int,
                         photometric: Int, rowsPerStrip: Int,
                         strips: Seq[Array[Byte]], t4Options: Long)

  private def parseIfd(b: Array[Byte]): Ifd = {
    val le = b(0) == 'I'
    def u16(o: Int) =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val ifdOff = u32(4).toInt
    val n = u16(ifdOff)
    var tags = Map.empty[Int, (Int, Int, Int)] // tag -> (type, count, valOff)
    for (i <- 0 until n) {
      val e = ifdOff + 2 + i * 12
      tags += u16(e) -> (u16(e + 2), u32(e + 4).toInt, e + 8)
    }
    def values(tag: Int): Seq[Long] = tags.get(tag) match {
      case None => Seq.empty
      case Some((tpe, count, valOff)) =>
        val sz = tpe match { case 3 => 2; case 4 => 4; case _ => 1 }
        val inline = sz * count <= 4
        val base = if (inline) valOff else u32(valOff).toInt
        (0 until count).map { i =>
          tpe match {
            case 3 => u16(base + i * 2).toLong
            case 4 => u32(base + i * 4)
            case _ => b(base + i) & 0xffL
          }
        }
    }
    def one(tag: Int, dft: Long): Long = values(tag).headOption.getOrElse(dft)
    val offs = values(273); val counts = values(279)
    Ifd(one(256, 0).toInt, one(257, 0).toInt, one(259, 1).toInt,
      one(262, 1).toInt, one(278, Int.MaxValue).toInt,
      offs.zip(counts).map { case (o, c) =>
        java.util.Arrays.copyOfRange(b, o.toInt, (o + c).toInt)
      },
      one(293, one(292, 0)))
  }

  private def houseDecodeTiff(tiff: Array[Byte]): Option[Array[Boolean]] = {
    val ifd = parseIfd(tiff)
    val blackIs1 = ifd.photometric == 0 // MinIsWhite: sample 1 = black
    val rowBytes = (ifd.width + 7) / 8
    val rows = new scala.collection.mutable.ArrayBuffer[Byte]()
    var remaining = ifd.height
    for (strip <- ifd.strips) {
      val sr = math.min(ifd.rowsPerStrip, remaining)
      val dec = Ccitt.decodeTiffStrip(strip, ifd.width, sr,
        ifd.compression, ifd.t4Options, blackIs1 = blackIs1)
      if (dec.isEmpty) return None
      rows ++= dec.get
      remaining -= sr
    }
    // boolean raster, true = black, independent of bit sense
    Some((0 until ifd.height).flatMap { y =>
      (0 until ifd.width).map { x =>
        val bit = (rows(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        if (blackIs1) bit == 1 else bit == 0
      }
    }.toArray)
  }

  private def pixelsOf(img: java.awt.image.BufferedImage): Array[Boolean] =
    (0 until img.getHeight).flatMap { y =>
      (0 until img.getWidth).map { x =>
        (img.getRGB(x, y) & 0xFFFFFF) == 0
      }
    }.toArray

  private val patterns: Seq[(String, (Int, Int) => Boolean)] = Seq(
    ("all white", (_, _) => false),
    ("all black", (_, _) => true),
    ("vertical stripes", (x, _) => (x / 3) % 2 == 0),
    ("horizontal stripes", (_, y) => y % 2 == 0),
    ("checker", (x, y) => (x + y) % 2 == 0),
    ("diagonal wedge", (x, y) => x > y),
    ("hash noise", (x, y) => {
      val v = scala.util.hashing.MurmurHash3
        .productHash((x, y, 17))
      (v & 7) < 3
    }))

  private val sizes = Seq((9, 8), (64, 48), (173, 61), (1728, 16))

  for (ct <- Seq("CCITT RLE", "CCITT T.4", "CCITT T.6")) {
    test(s"$ct: house decode == JDK decode == original pixels " +
      "(every pattern and size)") {
      for ((w, h) <- sizes; (pname, f) <- patterns) {
        val img = bilevel(w, h, f)
        val tiff = jdkTiff(img, ct)
        val expected = pixelsOf(img)
        // the mandatory oracle: house decode of the JDK-ENCODED strip
        // must reproduce the original raster exactly
        val house = houseDecodeTiff(tiff)
        assert(house.isDefined, s"$ct $pname ${w}x$h: house decode None")
        assert(house.get.sameElements(expected),
          s"$ct $pname ${w}x$h: house pixels differ")
        // JDK re-decode is best-effort: its T.4/RLE DECODER throws
        // AIOOBE on some of its own tiny-strip outputs (a JDK
        // TIFFFaxDecompressor bug); when it does decode, it must
        // agree — the house decoder has no such excuse above.
        val jdkBack =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(tiff))
          catch { case _: Exception => null }
        if (jdkBack != null)
          assert(pixelsOf(jdkBack).sameElements(expected),
            s"$ct $pname ${w}x$h: JDK round-trip")
      }
    }
  }

  test("BlackIs1 flips only the output bit sense, not the runs") {
    val img = bilevel(40, 12, (x, y) => (x + y) % 5 < 2)
    val ifd = parseIfd(jdkTiff(img, "CCITT T.6"))
    val a = Ccitt.decodeTiffStrip(ifd.strips.head, 40, 12, 4,
      blackIs1 = true).get
    val b = Ccitt.decodeTiffStrip(ifd.strips.head, 40, 12, 4,
      blackIs1 = false).get
    assert(a.length == b.length)
    // complementary within the 40 used bits of each 5-byte row
    for (row <- 0 until 12; byte <- 0 until 5)
      assert((a(row * 5 + byte) ^ b(row * 5 + byte)) == -1 ||
        (a(row * 5 + byte) ^ b(row * 5 + byte)) == 255)
  }

  test("hostility: every prefix and random junk decode without throwing") {
    val img = bilevel(64, 48, (x, y) => ((x * y) % 7) < 3)
    val ifd = parseIfd(jdkTiff(img, "CCITT T.6"))
    val strip = ifd.strips.head
    for (cut <- 0 until strip.length) {
      // must never throw; a truncated tail may still decode iff only
      // padding was lost
      Ccitt.decode(strip.take(cut), 64, 48, -1)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
      Ccitt.decode(junk, 128, 16, -1)
      Ccitt.decode(junk, 128, 16, 0)
      Ccitt.decode(junk, 128, 16, 4)
    }
    // lying dims refuse before allocation
    assert(Ccitt.decode(strip, 100000, 100000, -1).isEmpty)
    assert(Ccitt.decode(strip, -1, 5, -1).isEmpty)
    assert(Ccitt.decode(Array.emptyByteArray, 8, 8, -1).isEmpty)
  }

  test("decodeTiffImage: whole-TIFF house decode matches the original " +
    "raster; ImageDecode never loses a CCITT TIFF to the JDK's " +
    "AIOOBE bug") {
    for (ct <- Seq("CCITT RLE", "CCITT T.4", "CCITT T.6");
         (w, h) <- Seq((9, 8), (64, 48));
         (pname, f) <- patterns) {
      val img = bilevel(w, h, f)
      val tiff = jdkTiff(img, ct)
      val expected = pixelsOf(img)
      val house = Ccitt.decodeTiffImage(tiff)
      assert(house.isDefined, s"$ct $pname ${w}x$h: decodeTiffImage None")
      assert(pixelsOf(house.get).sameElements(expected),
        s"$ct $pname ${w}x$h: decodeTiffImage pixels")
      // the front door: JDK when it works, house fallback when it
      // throws — either way the payload decodes
      val front = ImageDecode.decode(tiff)
      assert(front.isDefined, s"$ct $pname ${w}x$h: front door lost it")
      assert(pixelsOf(front.get).sameElements(expected))
    }
    // non-CCITT and junk TIFFs do NOT engage the fallback
    assert(Ccitt.decodeTiffImage("II junk but not tiff".getBytes).isEmpty)
    assert(Ccitt.decodeTiffImage(null).isEmpty)
    val g4 = jdkTiff(bilevel(9, 8, (x, _) => x % 2 == 1), "CCITT T.6")
    (0 to g4.length).foreach(n => Ccitt.decodeTiffImage(g4.take(n)))
  }

  test("decodeTiffImage: hand-built MULTI-STRIP G4 composes strips " +
    "in order") {
    // two 9x4 halves encoded independently (TIFF strips restart the
    // coder), wrapped in a hand-authored little-endian IFD
    val top = bilevel(9, 4, (x, _) => x < 4)
    val bot = bilevel(9, 4, (_, y) => y % 2 == 0)
    def stripOf(img: java.awt.image.BufferedImage): Array[Byte] = {
      val t = jdkTiff(img, "CCITT T.6")
      val ifd = parseIfd(t)
      assert(ifd.strips.length == 1)
      ifd.strips.head
    }
    val s1 = stripOf(top); val s2 = stripOf(bot)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u16(v: Int): Unit = { out += (v & 0xff).toByte; out += (v >> 8).toByte }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
    out += 'I'; out += 'I'; u16(42); u32(8)
    val nTags = 9
    // IFD @8: 2 + 9*12 + 4 = 114 → arrays at 122, strips after
    val arrOff = 8 + 2 + nTags * 12 + 4
    val stripOff1 = arrOff + 16
    val stripOff2 = stripOff1 + s1.length
    u16(nTags)
    def tag(t: Int, tpe: Int, cnt: Int, v: Int): Unit = {
      u16(t); u16(tpe); u32(cnt); u32(v)
    }
    tag(256, 3, 1, 9); tag(257, 3, 1, 8); tag(258, 3, 1, 1)
    tag(259, 3, 1, 4); tag(262, 3, 1, 0)
    tag(273, 4, 2, arrOff); tag(278, 3, 1, 4)
    tag(279, 4, 2, arrOff + 8); tag(293, 4, 1, 0)
    u32(0) // next IFD
    u32(stripOff1); u32(stripOff2)     // strip offsets @arrOff
    u32(s1.length); u32(s2.length)     // byte counts @arrOff+8
    s1.foreach(out += _); s2.foreach(out += _)
    val composed = Ccitt.decodeTiffImage(out.toArray)
    assert(composed.isDefined)
    val expected: Array[Boolean] = (0 until 8).flatMap { y =>
      (0 until 9).map { x => if (y < 4) x < 4 else (y - 4) % 2 == 0 }
    }.toArray
    assert(pixelsOf(composed.get).sameElements(expected))
  }

  test("runs above one make-up code (>2623 columns) decode: repeated " +
    "make-ups compose") {
    // 4000 white columns exercises 2560+1408-run composition paths in
    // whichever split the JDK encoder picks
    val img = bilevel(4000, 4, (x, _) => x >= 3990)
    val tiff = jdkTiff(img, "CCITT T.6")
    val house = houseDecodeTiff(tiff)
    assert(house.isDefined && house.get.sameElements(pixelsOf(img)))
  }
}
