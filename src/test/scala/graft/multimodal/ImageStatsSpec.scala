package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pixel-stats kernel against constructed PNGs whose values are
  * closed-form: flat fill (std 0, Laplacian var 0), 1-px vertical
  * stripes (every interior Laplacian ±510 → var 510²), 1-px
  * checkerboard (±1020 → var 1020²).
  */
class ImageStatsSpec extends SparkSpec {
  import spark.implicits._

  private def grayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  test("flat, stripes, checkerboard: closed-form luma and Laplacian values") {
    val flat = ImageStats.stats(grayPng(16, 16, (_, _) => 77)).get
    assert(flat.width == 16 && flat.height == 16)
    assert(flat.meanLuma == 77.0 && flat.stdLuma == 0.0 &&
      flat.laplacianVar == 0.0)

    // vertical 1-px stripes 0/255, even width: mean 127.5, std 127.5;
    // interior Laplacian = 4g − (2 same + 2 opposite) = ±510, equal
    // counts → mean 0, var 510²
    val stripes = ImageStats.stats(
      grayPng(16, 16, (x, _) => if (x % 2 == 0) 0 else 255)).get
    assert(stripes.meanLuma == 127.5 && stripes.stdLuma == 127.5)
    assert(stripes.laplacianVar == 510.0 * 510.0)

    // checkerboard: all four neighbours opposite → ±1020, var 1020²
    val checker = ImageStats.stats(
      grayPng(16, 16, (x, y) => if ((x + y) % 2 == 0) 0 else 255)).get
    assert(checker.laplacianVar == 1020.0 * 1020.0)

    // no interior pixels → laplacianVar 0 by contract
    val sliver = ImageStats.stats(grayPng(2, 16, (x, _) => 255 * x)).get
    assert(sliver.laplacianVar == 0.0)

    assert(ImageStats.stats("not an image".getBytes).isEmpty)
    assert(ImageStats.stats(Array.empty[Byte]).isEmpty)
  }

  test("a box-blurred copy scores far below its sharp original") {
    def blur(src: Array[Array[Int]]): (Int, Int) => Int = { (x, y) =>
      val h = src.length; val w = src(0).length
      var s = 0; var n = 0
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val yy = y + dy; val xx = x + dx
        if (yy >= 0 && yy < h && xx >= 0 && xx < w) { s += src(yy)(xx); n += 1 }
      }
      s / n
    }
    val sharpPix = Array.tabulate(32, 32)((y, x) =>
      if (((x / 2) + (y / 2)) % 2 == 0) 30 else 220)
    val sharp = ImageStats.stats(
      grayPng(32, 32, (x, y) => sharpPix(y)(x))).get
    val blurred = ImageStats.stats(grayPng(32, 32, blur(sharpPix))).get
    assert(sharp.laplacianVar > 4 * blurred.laplacianVar,
      s"sharp ${sharp.laplacianVar} vs blurred ${blurred.laplacianVar}")
  }

  test("dropDegenerateImages: flat, dead-exposure, blurred and undecodable drop") {
    val sharp = grayPng(32, 32, (x, y) =>
      if (((x / 2) + (y / 2)) % 2 == 0) 30 else 220)
    val flat = grayPng(32, 32, (_, _) => 128)
    val black = grayPng(32, 32, (x, y) => if ((x + y) % 7 == 0) 4 else 0)
    val batch = Seq((1L, sharp), (2L, flat), (3L, black),
      (4L, "junk".getBytes)).toDF("id", "content")
    val kept = ImageStats.dropDegenerateImages(batch, "content")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
