package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.WebpFixture

/** VP8L decoder against the INDEPENDENT spec-side writer
  * ([[WebpFixture]] — m28 discipline: grammar written forward from
  * RFC 9649, no shared code), plus the third-party triangulation:
  * the same pixels through JDK ImageIO's PNG path must hash
  * identically.
  */
class Vp8lSpec extends AnyFunSuite {

  private def gray(v: Int): Int = 0xff000000 | (v << 16) | (v << 8) | v

  private def gradient(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => gray((i % w * 17 + i / w * 13) % 256))

  private def pngBytes(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, w, h, argb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  test("literal stream round-trips pixel-exact") {
    val (w, h) = (9, 8)
    val px = gradient(w, h)
    val img = Vp8l.decode(WebpFixture.vp8lPayload(w, h, px)).get
    assert(img.width == w && img.height == h)
    assert(img.argb.toSeq == px.toSeq)
  }

  test("subtract-green transform inverts") {
    val (w, h) = (7, 5)
    // non-gray pixels so the transform actually moves red/blue
    val px = Array.tabulate(w * h)(i =>
      0xff000000 | ((i * 31 % 256) << 16) | ((i * 17 % 256) << 8) |
        (i * 11 % 256))
    val img = Vp8l.decode(WebpFixture.vp8lSubtractGreenPayload(w, h, px)).get
    assert(img.argb.toSeq == px.toSeq)
  }

  test("4-color palette with pixel bundling inverts") {
    val (w, h) = (10, 4) // 10 wide: last packed pixel is partial
    val palette = Array(0xff102030, 0xffffffff, 0xff000000, 0xff80ff40)
    val indices = Array.tabulate(w * h)(i => (i * 7 + i / w) % 4)
    val img = Vp8l.decode(WebpFixture.vp8lPalette(w, h, palette, indices)).get
    assert(img.width == w && img.height == h)
    assert(img.argb.toSeq == indices.map(palette).toSeq)
  }

  test("LZ77 row copy via short-distance code (0,1) + color cache insert") {
    val w = 9
    val row = Array.tabulate(w)(x => gray((x * 29 + 3) % 256))
    val img = Vp8l.decode(WebpFixture.vp8lRowCopy(w, 4, row)).get
    assert(img.argb.toSeq == (row ++ row ++ row ++ row).toSeq)
  }

  test("predictor transform inverts (modes T, TR, ClampAddSubtractFull)") {
    val (w, h) = (6, 5)
    val px = Array.tabulate(w * h)(i =>
      0xff000000 | ((i * 41 % 256) << 16) | ((i * 23 % 256) << 8) |
        (i * 7 % 256))
    for (mode <- Seq(0, 1, 2, 3, 12)) {
      val img = Vp8l.decode(WebpFixture.vp8lPredictor(w, h, px, mode))
      assert(img.exists(_.argb.toSeq == px.toSeq), s"mode $mode")
    }
  }

  test("color-cache reads return the inserted pixel") {
    val a = 0xff808080 // cache slot 0 under the spec hash
    val b = 0xffff0000 // cache slot 1
    assert(WebpFixture.cacheKey(a, 2) != WebpFixture.cacheKey(b, 2))
    val img = Vp8l.decode(WebpFixture.vp8lCacheHit(a, b)).get
    assert(img.argb.toSeq == Seq(a, b, a, b))
  }

  test("meta prefix image selects per-block code groups") {
    val h = 5 // meta image 2×2: block rows exercise the y >> bits path
    val rgb = Array.tabulate(8 * h)(i =>
      ((i * 37 % 256) << 16) | ((i * 19 % 256) << 8) | (i * 7 % 256))
    val img = Vp8l.decode(WebpFixture.vp8lTwoGroupAlpha(h, rgb)).get
    // group 0 (left 4 columns) decodes alpha 255, group 1 decodes 128
    for (y <- 0 until h; x <- 0 until 8) {
      val got = img.argb(y * 8 + x)
      val expAlpha = if (x < 4) 255 else 128
      assert((got >>> 24) == expAlpha, s"alpha at ($x,$y)")
      assert((got & 0xffffff) == rgb(y * 8 + x), s"rgb at ($x,$y)")
    }
  }

  test("plain (>120) distance codes copy at literal distances") {
    val five = Array.tabulate(5)(i => gray(40 * i + 7))
    val img = Vp8l.decode(WebpFixture.vp8lLongDistance(five)).get
    assert(img.argb.toSeq == (five ++ five.take(3)).toSeq)
  }

  test("distance map head pins the generated table to the spec list") {
    // the first entries of the spec's literal table, transcribed at
    // spec-reading time: (dx, dy) pairs in order
    val expected = Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0))
    val got = Vp8l.distanceMap.take(expected.size).map { p =>
      ((p << 16) >> 16, p >> 16)
    }.toSeq
    assert(got == expected)
    assert(Vp8l.distanceMap.length == 120)
  }

  test("WebP container: PNG-twin dHash identity (ImageIO triangulation)") {
    val (w, h) = (18, 16)
    val px = gradient(w, h)
    val webp = WebpFixture.losslessWebp(w, h, px)
    val png = pngBytes(w, h, px)
    val hw = ImageHash.dhash64(webp)
    val hp = ImageHash.dhash64(png)
    assert(hw.isDefined && hw == hp)
    val pw = ImageHash.phash64(webp)
    val pp = ImageHash.phash64(png)
    assert(pw.isDefined && pw == pp)
  }

  test("ImageStats sees WebP pixels (same values as the PNG twin)") {
    val (w, h) = (9, 8)
    val px = gradient(w, h)
    val sw = ImageStats.stats(WebpFixture.losslessWebp(w, h, px)).get
    val sp = ImageStats.stats(pngBytes(w, h, px)).get
    assert(sw == sp)
    assert(sw.width == w && sw.height == h)
  }

  test("probe: VP8L dims and alpha flag, VP8 lossy dims, VP8X canvas") {
    val px = gradient(5, 3)
    val m = WebP.probe(WebpFixture.losslessWebp(5, 3, px)).get
    assert(m.format == "VP8L" && m.width == 5 && m.height == 3 &&
      m.lossless && !m.animated)
    val lossy = WebP.probe(WebpFixture.lossyWebpHeader(640, 480)).get
    assert(lossy.format == "VP8" && lossy.width == 640 &&
      lossy.height == 480 && !lossy.lossless)
    val x = WebP.probe(WebpFixture.vp8xLossless(5, 3, px)).get
    assert(x.format == "VP8X" && x.width == 5 && x.height == 3 && x.lossless)
  }

  test("VP8X-wrapped lossless decodes; animation does not") {
    val px = gradient(5, 3)
    val still = WebP.decode(WebpFixture.vp8xLossless(5, 3, px))
    assert(still.exists(_.argb.toSeq == px.toSeq))
    val anim = WebpFixture.vp8xLossless(5, 3, px, animated = true)
    assert(WebP.probe(anim).exists(_.animated))
    assert(WebP.decode(anim).isEmpty)
  }

  test("lossy VP8 probes but does not decode (documented skip)") {
    val lossy = WebpFixture.lossyWebpHeader(64, 48)
    assert(WebP.probe(lossy).isDefined)
    assert(WebP.decode(lossy).isEmpty)
    assert(ImageHash.dhash64(lossy).isEmpty)
  }

  test("ImageProbe routes WebP by magic") {
    import graft.engine.validate.ImageProbe
    val px = gradient(5, 3)
    assert(ImageProbe.dimensions(
      WebpFixture.losslessWebp(5, 3, px)).contains((5, 3)))
    assert(ImageProbe.dimensions(
      WebpFixture.lossyWebpHeader(640, 480)).contains((640, 480)))
  }

  test("malformed streams fail to None, never partially") {
    val (w, h) = (9, 8)
    val px = gradient(w, h)
    val good = WebpFixture.vp8lPayload(w, h, px)
    assert(Vp8l.decode(good).isDefined)
    // version bits != 0
    val badVersion = good.clone()
    badVersion(4) = (badVersion(4) | 0xe0).toByte
    assert(Vp8l.decode(badVersion).isEmpty)
    // truncated pixel stream
    assert(Vp8l.decode(good.take(good.length / 2)).isEmpty)
    // wrong signature
    val badSig = good.clone(); badSig(0) = 0x2e
    assert(Vp8l.decode(badSig).isEmpty)
    // hostile dimensions: header claims 16383×16383
    val bomb = new WebpFixture.BitWriter
    bomb.writeBits(16382, 14); bomb.writeBits(16382, 14)
    bomb.writeBits(0, 1); bomb.writeBits(0, 3)
    assert(Vp8l.decode(0x2f.toByte +: bomb.bytes).isEmpty)
    // empty / null / non-webp container bytes
    assert(Vp8l.decode(Array.empty[Byte]).isEmpty)
    assert(Vp8l.decode(null).isEmpty)
    assert(WebP.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("over-subscribed and incomplete prefix codes are rejected") {
    // craft a 1×1 stream whose green CODE-LENGTH code carries the
    // given four lengths (for order symbols 17, 18, 0, 1)
    def greenClc(lens4: Seq[Int]): Array[Byte] = {
      val bw = new WebpFixture.BitWriter
      bw.writeBits(0, 14); bw.writeBits(0, 14) // 1×1
      bw.writeBits(0, 1); bw.writeBits(0, 3)
      bw.writeBits(0, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
      bw.writeBits(0, 1) // green code, normal form
      bw.writeBits(0, 4) // num_code_lengths = 4
      lens4.foreach(l => bw.writeBits(l, 3))
      0x2f.toByte +: bw.bytes
    }
    // over-subscribed: three length-1 symbols (Kraft 3/2)
    assert(Vp8l.decode(greenClc(Seq(1, 1, 1, 0))).isEmpty)
    // incomplete: two length-2 symbols only (Kraft 1/2)
    assert(Vp8l.decode(greenClc(Seq(2, 2, 0, 0))).isEmpty)
  }
}
