package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.validate.{ImageProbe, SvgProbe}
import graft.queries.IcoFixture

/** ICO favicon decode (vs the independent IcoFixture writer over the
  * JDK's own BMP encoding) and SVG dimension inventory.
  */
class IcoSvgSpec extends AnyFunSuite {

  private def rampImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 10 * (x % 9); img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }
  private def enc(img: java.awt.image.BufferedImage,
                  fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("a BMP-DIB favicon decodes to the same pixels (and dHash) as " +
    "its PNG twin") {
    val img = rampImage(9, 8)
    val ico = IcoFixture.ico(Seq(
      (9, 8, IcoFixture.dibOf(enc(img, "bmp")))))
    assert(Ico.isIco(ico))
    assert(ImageProbe.dimensions(ico).contains((9, 8)))
    val got = ImageDecode.decode(ico).get
    for (y <- 0 until 8; x <- 0 until 9)
      assert((got.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF),
        s"pixel $x,$y")
    assert(ImageHash.dhash64(ico) == ImageHash.dhash64(enc(img, "png")))
  }

  test("PNG members route untouched; the largest member wins; " +
    "256 writes the 0 sentinel") {
    val small = rampImage(4, 4)
    val big = rampImage(16, 16)
    val multi = IcoFixture.ico(Seq(
      (4, 4, IcoFixture.dibOf(enc(small, "bmp"))),
      (16, 16, enc(big, "png"))))
    assert(ImageProbe.dimensions(multi).contains((16, 16)))
    val got = ImageDecode.decode(multi).get
    assert(got.getWidth == 16 &&
      (got.getRGB(3, 0) & 0xFFFFFF) == 0x1E1E1E)
    // a 256px PNG member: directory says 0, the IHDR says 256
    val huge = IcoFixture.ico(Seq((256, 256,
      enc(rampImage(256, 256), "png"))))
    assert(ImageProbe.dimensions(huge).contains((256, 256)))
  }

  test("hostile icons never throw; undecodable members skip") {
    val img = rampImage(9, 8)
    val whole = IcoFixture.ico(Seq(
      (9, 8, IcoFixture.dibOf(enc(img, "bmp")))))
    for (cut <- 0 to whole.length) {
      val t = java.util.Arrays.copyOfRange(whole, 0, cut)
      Ico.decode(t); ImageProbe.dimensions(t) // must not throw
    }
    // lying directory offset past the payload: entry drops
    val lying = whole.clone()
    lying(6 + 12) = 0x7F.toByte
    assert(Ico.decode(lying).isEmpty)
    // junk member bytes: decode refuses, never throws
    val junk = IcoFixture.ico(Seq((9, 8, Array.fill[Byte](64)(9))))
    assert(Ico.decode(junk).isEmpty)
    assert(!Ico.isIco("BM not an ico".getBytes("US-ASCII")))
    assert(!Ico.isIco(null))
  }

  test("animation inventory: GIF frame counts, APNG acTL, stills None") {
    def animatedGif(n: Int): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      for (i <- 0 until n)
        w.writeToSequence(new javax.imageio.IIOImage(
          rampImage(8 + i, 8), null, null), null)
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
    import graft.engine.validate.ImageProbe
    assert(ImageProbe.animation(animatedGif(3)) == Some(("gif", 3)))
    assert(ImageProbe.animation(animatedGif(1)) == Some(("gif", 1)))
    val png = enc(rampImage(9, 8), "png")
    assert(ImageProbe.animation(apngOf(png, 4)) == Some(("apng", 4)))
    assert(ImageProbe.animation(png).isEmpty) // plain PNG: a still
    // the APNG still DECODES (default image) and still probes dims
    assert(ImageDecode.decode(apngOf(png, 4)).isDefined)
    assert(ImageProbe.dimensions(apngOf(png, 4)).contains((9, 8)))
    // hostility: truncation fuzz, junk, null
    val ag = animatedGif(2)
    for (cut <- 0 to ag.length by 7)
      ImageProbe.animation(java.util.Arrays.copyOfRange(ag, 0, cut))
    assert(ImageProbe.animation("GIF89a junk".getBytes).isEmpty)
    assert(ImageProbe.animation(null).isEmpty)
    // animated WebP: VP8X ANIM flag + ANMF count; stills are None
    import graft.queries.WebpFixture
    assert(ImageProbe.animation(WebpFixture.animatedWebp(8, 8, 3)) ==
      Some(("webp", 3)))
    val still = WebpFixture.losslessWebp(2, 2,
      Array.fill(4)(0xFF808080.toInt))
    assert(ImageProbe.animation(still).isEmpty)
    // a VP8X still (flag clear) is None too
    assert(ImageProbe.animation(WebpFixture.vp8xLossless(2, 2,
      Array.fill(4)(0xFF808080.toInt))).isEmpty)
  }

  test("SVG dimensions: px and unitless attrs, viewBox fallback, " +
    "relative units refuse") {
    def svg(s: String) = s.getBytes("UTF-8")
    assert(SvgProbe.isSvg(svg("<svg width=\"64\" height=\"32\"></svg>")))
    assert(SvgProbe.dimensions(svg(
      "<svg width=\"64\" height=\"32\"></svg>")).contains((64, 32)))
    assert(SvgProbe.dimensions(svg(
      "<?xml version=\"1.0\"?>\n<!-- logo -->\n<!DOCTYPE svg>\n" +
        "<svg xmlns=\"http://www.w3.org/2000/svg\" width=\"10.5px\"" +
        " height=\"20px\">")).contains((11, 20)))
    assert(SvgProbe.dimensions(svg(
      "<svg viewBox=\"0 0 120 80\"><rect/></svg>")).contains((120, 80)))
    // width/height beat viewBox; % / em refuse (no DPI guessing)
    assert(SvgProbe.dimensions(svg(
      "<svg width=\"7\" height=\"9\" viewBox=\"0 0 700 900\"/>"))
      .contains((7, 9)))
    assert(SvgProbe.dimensions(svg(
      "<svg width=\"100%\" height=\"100%\"/>")).isEmpty)
    assert(SvgProbe.dimensions(svg(
      "<svg width=\"2em\" height=\"1em\"/>")).isEmpty)
    // the probe front door routes SVGs; other XML refuses
    assert(ImageProbe.dimensions(svg(
      "<svg width=\"64\" height=\"32\"/>")).contains((64, 32)))
    assert(!SvgProbe.isSvg(svg("<html><body>no</body></html>")))
    assert(!SvgProbe.isSvg(svg("<svgx width=\"1\"/>")))
    assert(!SvgProbe.isSvg(null))
    // truncation fuzz over a prolog-heavy document
    val doc = svg("<?xml version=\"1.0\"?><!-- c --><svg width=\"3\"" +
      " height=\"4\"></svg>")
    for (cut <- 0 to doc.length)
      SvgProbe.dimensions(java.util.Arrays.copyOfRange(doc, 0, cut))
  }
}
