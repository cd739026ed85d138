package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TiffFixture

/** Baseline TIFF through the ONE [[ImageDecode]] front door — the
  * scanner class (digitized-document corpora) must dedup against its
  * PNG/JPEG re-encodes, so its pixels must reach the same dHash/stats
  * kernels as every other format. Fixture bytes come from the
  * independent spec-side writer. RGB rows carry exact values; GRAY
  * payloads read through the JDK's linear-light gray model (getRGB
  * applies the sRGB curve) — identically for TIFF and PNG, which is
  * what the dedup claim needs.
  */
class TiffDecodeSpec extends AnyFunSuite {

  private val ramp: Int => Int = i => 10 * (i % 9)

  test("uncompressed RGB TIFF decodes exactly, both byte orders") {
    val ii = TiffFixture.rgbTiff(9, 8, ramp)
    val mm = TiffFixture.rgbTiff(9, 8, ramp, bigEndian = true)
    val a = ImageDecode.decode(ii)
    val b = ImageDecode.decode(mm)
    assert(a.isDefined && b.isDefined)
    assert(a.get.getWidth == 9 && a.get.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 9) {
      val expected = 10 * x
      assert((a.get.getRGB(x, y) & 0xFF) == expected, s"II ($x,$y)")
      assert((b.get.getRGB(x, y) & 0xFF) == expected, s"MM ($x,$y)")
    }
  }

  test("PackBits strips round-trip: runs and literals per row") {
    // rows mix a long run (flat stretch) and a literal ramp
    val mixed: Int => Int = i => { val x = i % 9; if (x < 5) 100 else 10 * x }
    val pb = TiffFixture.rgbTiff(9, 8, mixed, packBits = true)
    val img = ImageDecode.decode(pb)
    assert(img.isDefined)
    for (y <- 0 until 8; x <- 0 until 9)
      assert((img.get.getRGB(x, y) & 0xFF) == mixed(x), s"($x,$y)")
  }

  test("a scanned GRAY tiff reads pixel-identically to its gray png " +
    "twin (the dedup invariant), and rgb twins share the exact dhash") {
    val grayTiff = TiffFixture.grayTiff(9, 8, ramp)
    val grayPng = {
      // raster-level write: the SAME 8-bit gray samples, no setRGB
      // colorimetric conversion on the way in
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until 8; x <- 0 until 9) r.setSample(x, y, 0, 10 * x)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val t = ImageDecode.decode(grayTiff).get
    val p = ImageDecode.decode(grayPng).get
    for (y <- 0 until 8; x <- 0 until 9)
      assert(t.getRGB(x, y) == p.getRGB(x, y), s"($x,$y)")
    assert(ImageHash.dhash64(grayTiff) == ImageHash.dhash64(grayPng))

    val rgbTiff = TiffFixture.rgbTiff(9, 8, ramp)
    val rgbPng = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val g = 10 * x
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ht = ImageHash.dhash64(rgbTiff)
    assert(ht.isDefined && ht == ImageHash.dhash64(rgbPng))
  }

  test("TIFF dims ride the header probe; torn TIFFs never throw") {
    val tiff = TiffFixture.rgbTiff(9, 8, ramp)
    assert(graft.engine.validate.ImageProbe.dimensions(tiff)
      .contains((9, 8)))
    for (cut <- Seq(0, 2, 4, 8, 12, 30, tiff.length / 2)) {
      val torn = java.util.Arrays.copyOfRange(tiff, 0, cut)
      ImageDecode.decode(torn) // must not throw
      graft.engine.validate.ImageProbe.dimensions(torn)
    }
    val badMagic = tiff.clone(); badMagic(2) = 99
    assert(ImageDecode.decode(badMagic).isEmpty)
  }
}
