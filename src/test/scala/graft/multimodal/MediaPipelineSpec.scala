package graft.multimodal

import graft.SparkSpec

/** Composed image curation: stage semantics and metrics on the m10
  * hand-derived image family — exact copy drops at the digest stage,
  * the 2× render at the perceptual stage, the tiny tracker and broken
  * payload at validation, and the indexed pattern at the final stage.
  */
class MediaPipelineSpec extends SparkSpec {
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

  private val grad = grayPng(9, 8, (x, _) => 28 * x)
  private val grad2x = grayPng(18, 16, (x, _) => 14 * x) // near-dup of grad
  private val stripes = grayPng(9, 8, (x, _) => if (x % 2 == 1) 255 else 0)
  private val flat = grayPng(9, 8, (_, _) => 77)

  private def batch = Seq(
    (0L, grad),
    (1L, grad.clone()),          // byte-identical copy → exact stage
    (2L, grad2x),                // same picture at 2x → perceptual stage
    (3L, stripes),
    (4L, flat),
    (5L, grayPng(4, 4, (_, _) => 10)), // under min dims → validate stage
    (6L, "broken".getBytes)            // undecodable → validate stage
  ).toDF("img_id", "content")

  test("stages drop in order; metrics count each snapshot") {
    val r = MediaPipeline.curateImages(batch,
      MediaPipeline.Config("img_id", "content"))
    val kept = r.kept.select("img_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L), s"kept $kept")
    assert(r.metrics == Seq(
      "n_received" -> 7L, "n_valid" -> 5L, "n_exact_kept" -> 4L,
      "n_near_kept" -> 3L, "n_final" -> 3L))
  }

  test("a seen-corpus index removes its matches at the final stage") {
    val index = ImageHash.buildImageIndex(
      Seq((100L, stripes)).toDF("img_id", "content"), "img_id", "content")
    val r = MediaPipeline.curateImages(batch,
      MediaPipeline.Config("img_id", "content"), Some(index))
    assert(r.kept.select("img_id").as[Long].collect().toSet == Set(0L, 4L))
    assert(r.metrics.last == ("n_final" -> 2L))
  }

  test("original columns survive the program") {
    val withMeta = batch.withColumn("source",
      org.apache.spark.sql.functions.lit("crawl-7"))
    val r = MediaPipeline.curateImages(withMeta,
      MediaPipeline.Config("img_id", "content"))
    assert(r.kept.columns.toSeq == Seq("img_id", "content", "source"))
  }

  test("image stats gate composes: flat fill drops at the signal stage") {
    val index = ImageHash.buildImageIndex(
      Seq((100L, stripes)).toDF("img_id", "content"), "img_id", "content")
    // focus threshold 0 keeps the linear ramps (their Laplacian is
    // exactly 0 — a ramp reads as "defocused" to the default gate);
    // the flat fill still dies on std_luma = 0
    val r = MediaPipeline.curateImages(batch,
      MediaPipeline.Config("img_id", "content"), Some(index),
      statsGate = Some(ImageStats.Gate(minLaplacianVar = 0.0)))
    // flat (4) dies at the signal stage, tiny (5) at the dims check,
    // broken (6) at decode, the byte copy (1) at exact, the 2x render
    // (2) at perceptual, stripes (3) at the index; grad survives
    assert(r.kept.select("img_id").as[Long].collect().toSet == Set(0L))
    assert(r.metrics == Seq(
      "n_received" -> 7L, "n_valid" -> 6L, "n_exact_kept" -> 3L,
      "n_near_kept" -> 2L, "n_final" -> 1L, "n_signal" -> 4L))
    assert(r.kept.columns.toSeq == Seq("img_id", "content"))
  }

  test("a WebP re-encode dedups against its PNG twin (cross-format)") {
    // the same pixels as VP8L must hash identically and drop against
    // a PNG-built index — the whole argument for the decoder
    val px = Array.tabulate(9 * 8) { i =>
      val g = (i % 9 * 28) & 0xff
      0xff000000 | (g << 16) | (g << 8) | g
    }
    val webp = graft.queries.WebpFixture.losslessWebp(9, 8, px)
    val index = ImageHash.buildImageIndex(
      Seq((100L, grad)).toDF("img_id", "content"), "img_id", "content")
    val kept = ImageHash.dropNearDuplicateImages(
      Seq((10L, webp), (11L, stripes)).toDF("img_id", "content"),
      index, "img_id", "content")
    assert(kept.select("img_id").as[Long].collect().toSet == Set(11L))
  }

  test("config guards") {
    intercept[IllegalArgumentException] {
      MediaPipeline.curateImages(batch,
        MediaPipeline.Config("img_id", "content", minWidth = 0))
    }
  }
}
