package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pixel-level image curation statistics — the quality gate an image
  * corpus applies before any perceptual hashing: blurry frames,
  * black/blown exposures and flat synthetic fills carry no training
  * signal, and all three are measurable in the one pixel pass the
  * dHash pipeline pays anyway.
  *
  *  - `mean_luma` / `std_luma` — exposure and contrast over the
  *    integer Rec.601 luma [[ImageHash]] hashes with (`std_luma ≈ 0`
  *    is a flat fill; mean near 0/255 is a dead exposure);
  *  - `laplacian_var` — variance of the 4-neighbour Laplacian
  *    `4·g − up − down − left − right` over INTERIOR pixels, the
  *    standard focus/blur measure (Pech-Pacheco et al. 2000, "Diatom
  *    autofocusing in brightfield microscopy"): defocus kills high
  *    frequencies, so the Laplacian's energy collapses. Interior-only
  *    keeps every value exactly derivable for constructed fixtures
  *    (no edge-padding convention to model).
  *
  * Scale shape: one decode + one pixel pass per payload (the same
  * bill the hash pays); outputs are a handful of doubles — filters
  * compose as codegen'd predicates.
  */
object ImageStats {
  ImageIoDefaults.ensure() // memory-backed ImageIO streams in this JVM

  final case class Stats(width: Int, height: Int,
                         meanLuma: Double, stdLuma: Double,
                         laplacianVar: Double)

  /** Stats for one payload; None when undecodable. Images without
    * interior pixels (width or height < 3) report `laplacianVar = 0`
    * — nothing to focus-measure, and a 1×N sliver should be dropped
    * by dimension gates, not by a fake sharpness value.
    */
  def stats(bytes: Array[Byte]): Option[Stats] =
    ImageDecode.decode(bytes).flatMap(statsFromImage)

  /** The degenerate-image gate thresholds, the composed-pipeline form
    * (see [[dropDegenerateImages]] for the standalone face; the
    * [[AudioStats.Gate]] pattern).
    */
  final case class Gate(minLaplacianVar: Double = 25.0,
                        minStdLuma: Double = 4.0,
                        minMeanLuma: Double = 8.0,
                        maxMeanLuma: Double = 247.0)

  /** Stats + the dHash off ONE decode — the composed pipeline
    * ([[MediaPipeline.curateImages]] with a stats gate) must not pay
    * the image decode twice; the decode IS the per-image bill, the
    * two pixel passes after it are noise next to it.
    */
  def statsAndHash(bytes: Array[Byte]): Option[(Stats, Option[Long])] =
    ImageDecode.decode(bytes).flatMap(img =>
      statsFromImage(img).map(s => (s, ImageHash.dhash64FromImage(img))))

  private def statsFromImage(img: java.awt.image.BufferedImage): Option[Stats] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < 1 || h < 1) return None
    // Integer Rec.601 luma, the ImageHash kernel — computed through a
    // rolling 3-row ring (the 4-neighbour Laplacian for row y-1 needs
    // only rows y-2..y), never a full h×w matrix: a small-on-disk but
    // huge-dimension image must not double peak memory on top of the
    // BufferedImage it already forced. Extra footprint is 4 Int rows.
    val ring = Array.ofDim[Int](3, w)
    val rgbRow = new Array[Int](w)
    var sum = 0L
    var sumSq = 0L
    var lSum = 0.0
    var lSumSq = 0.0
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rgbRow, 0, w)
      val cur = ring(y % 3)
      var x = 0
      while (x < w) {
        val rgb = rgbRow(x)
        val v = ((299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)) / 1000L).toInt
        cur(x) = v
        sum += v
        sumSq += v.toLong * v
        x += 1
      }
      if (y >= 2 && w >= 3) {
        // Laplacian of the now-complete interior row y-1
        val up = ring((y - 2) % 3)
        val mid = ring((y - 1) % 3)
        var xi = 1
        while (xi < w - 1) {
          val l = 4 * mid(xi) - up(xi) - cur(xi) - mid(xi - 1) - mid(xi + 1)
          lSum += l
          lSumSq += l.toDouble * l
          xi += 1
        }
      }
      y += 1
    }
    val n = w.toLong * h
    val mean = sum.toDouble / n
    val variance = math.max(0.0, sumSq.toDouble / n - mean * mean)
    var lapVar = 0.0
    if (w >= 3 && h >= 3) {
      val m = (w - 2).toLong * (h - 2)
      val lMean = lSum / m
      lapVar = math.max(0.0, lSumSq / m - lMean * lMean)
    }
    Some(Stats(w, h, mean, math.sqrt(variance), lapVar))
  }

  private val statsUdf = udf { (bytes: Array[Byte]) =>
    stats(bytes).map(s =>
      (s.width, s.height, s.meanLuma, s.stdLuma, s.laplacianVar))
  }

  /** Stats as a struct column `(width, height, mean_luma, std_luma,
    * laplacian_var)`; NULL when undecodable.
    */
  def statsCol(bytesCol: Column): Column = statsUdf(bytesCol)

  /** Drop images with no usable signal: blurrier than
    * `minLaplacianVar`, flatter than `minStdLuma`, or exposure-dead
    * outside `[minMeanLuma, maxMeanLuma]`. Undecodable images DROP
    * (the [[AudioStats.dropDegenerateAudio]] stance: a quality gate
    * that passes what it cannot measure is not a gate).
    */
  def dropDegenerateImages(df: DataFrame, bytesCol: String,
                           minLaplacianVar: Double = 25.0,
                           minStdLuma: Double = 4.0,
                           minMeanLuma: Double = 8.0,
                           maxMeanLuma: Double = 247.0): DataFrame = {
    require(!df.columns.contains("__graft_istats"),
      "input already has a reserved '__graft_istats' column")
    df.withColumn("__graft_istats", statsCol(col(bytesCol)))
      .filter(col("__graft_istats").isNotNull &&
        col("__graft_istats._5") >= minLaplacianVar &&
        col("__graft_istats._4") >= minStdLuma &&
        col("__graft_istats._3").between(minMeanLuma, maxMeanLuma))
      .drop("__graft_istats")
  }
}
