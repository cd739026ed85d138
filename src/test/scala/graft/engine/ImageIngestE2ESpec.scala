package graft.engine

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.core.{ResolvedConfig, TaskCategory}
import graft.engine.api.LocalApiClient

/** Golden e2e for a file-bearing category: image_classification with a
  * real sidecar copy — images validated (ImageIO), copied to the
  * destination, a missing file charged to the transfer-failure channel
  * and its record dropped BEFORE the sink (`base.py:780-830`).
  */
class ImageIngestE2ESpec extends SparkSpec {

  test("image classification: validate → copy → drop transfer failures") {
    val dir = tmpDir("imgcls")
    val images = dir.resolve("images")
    val dest = dir.resolve("dest")
    java.nio.file.Files.createDirectories(images)
    def png(name: String): Unit =
      ImageIO.write(new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB),
        "png", images.resolve(name).toFile)
    png("img_01.png"); png("img_02.png") // img_03 intentionally missing

    val csv = write(dir.resolve("labels.csv"),
      """filename,class,rid
        |img_01.png,cat,r1
        |img_02.png,dog,r2
        |img_03.png,cat,r3
        |""".stripMargin)
    val cfg = ResolvedConfig(
      category = TaskCategory.ImageClassification,
      tableName = "img_e2e", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      images = Some(images.toString),
      destPath = Some(dest.toString),
      schema = Seq("filename" -> "VARCHAR(100)", "class" -> "VARCHAR(20)",
        "rid" -> "VARCHAR(20)"),
      labelColumn = Some("class"),
      uniqueIdColumn = Some("rid"),
      fileOptions = Map("target_size" -> Seq(64, 64)))
    val api = new LocalApiClient
    val result = new Ingestor(spark, cfg, api, None,
      lockDir = tmpDir("locks").toString).ingest("run-img")

    assert(result.errors.isEmpty, result.errors.mkString("; "))
    assert(result.summary.totalRecords.value == 3)
    assert(result.summary.fileTransferFailures.value == 1) // img_03
    assert(result.summary.inserted.value == 2) //              dropped pre-sink
    assert(result.exitCode == 1) // failures present → exit 1
    assert(java.nio.file.Files.exists(dest.resolve("img_01.png")))
    assert(java.nio.file.Files.exists(dest.resolve("img_02.png")))
    assert(!java.nio.file.Files.exists(dest.resolve("img_03.png")))
    assert(api.sentCount == 2) // only surviving records reach the API
  }

  test("image validation failure stops the run before any copy") {
    val dir = tmpDir("imgbad")
    val images = dir.resolve("images")
    val dest = dir.resolve("dest")
    java.nio.file.Files.createDirectories(images)
    ImageIO.write(new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB),
      "png", images.resolve("img_01.png").toFile) // wrong size vs 64x64
    val csv = write(dir.resolve("labels.csv"),
      "filename,class,rid\nimg_01.png,cat,r1\n")
    val cfg = ResolvedConfig(
      category = TaskCategory.ImageClassification,
      tableName = "img_bad", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      images = Some(images.toString),
      destPath = Some(dest.toString),
      schema = Seq("filename" -> "VARCHAR(100)", "class" -> "VARCHAR(20)",
        "rid" -> "VARCHAR(20)"),
      labelColumn = Some("class"), uniqueIdColumn = Some("rid"),
      fileOptions = Map("target_size" -> Seq(64, 64)))
    val result = new Ingestor(spark, cfg, new LocalApiClient, None,
      lockDir = tmpDir("locks").toString).ingest("run-imgbad")
    assert(result.exitCode == 2)
    assert(result.errors.exists(_.contains("unexpected resolution")))
    assert(!java.nio.file.Files.exists(dest.resolve("img_01.png"))) // no copy ran
  }
}
