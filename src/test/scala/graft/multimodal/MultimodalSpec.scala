package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDir = {
    val d = tmpDir("media")
    write(d.resolve("a.img"), "AAAAAAAA")
    write(d.resolve("b.img"), "BBBBBBBBBBBBBBBB")
    write(d.resolve(".hidden"), "x")
    d
  }

  test("scan: binary payloads with names, hidden files skipped") {
    val df = Multimodal.scan(spark, mediaDir.toString)
    val rows = df.select("name").as[String].collect().toSet
    assert(rows == Set("a.img", "b.img"))
    assert(df.schema("payload").dataType.typeName == "binary")
  }

  test("withMeta: partition-batched decode attaches the typed struct") {
    val df = Multimodal.withMeta(Multimodal.scan(spark, mediaDir.toString), "image")
    val metas = df.select(col("name"), col("meta.width"), col("meta.nBytes"),
      col("meta.sha256")).as[(String, Int, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(metas("a.img")._3 == 8L)
    assert(metas("b.img")._3 == 16L)
    assert(metas("a.img")._4.length == 64) // real sha256 of the payload
    // stub dims are deterministic functions of the header bytes
    assert(metas("a.img")._2 == (('A' % 64) + 1) * 16)
  }

  test("withMeta: colliding basenames under recursive lookup keep their own meta") {
    val d = tmpDir("media2")
    java.nio.file.Files.createDirectories(d.resolve("train"))
    java.nio.file.Files.createDirectories(d.resolve("test"))
    write(d.resolve("train/img001.img"), "TRAIN")
    write(d.resolve("test/img001.img"), "TESTTESTTEST")
    val df = Multimodal.withMeta(Multimodal.scan(spark, d.toString), "image")
    val rows = df.select(col("path"), col("meta.nBytes")).as[(String, Long)].collect()
    assert(rows.length == 2) // no row multiplication from the meta join
    val byPath = rows.toMap
    assert(byPath.find(_._1.contains("train")).exists(_._2 == 5L))
    assert(byPath.find(_._1.contains("test")).exists(_._2 == 12L))
  }

  test("featureExtract: byte-class counts, partition-batched, ANN-ready shape") {
    val df = Seq((1L, "Hello, World 42!".getBytes("UTF-8")),
      (2L, "".getBytes("UTF-8"))).toDF("id", "payload")
    val feats = Multimodal.featureExtract(df, "id", "payload")
      .as[(Long, Array[Float])].collect().toMap
    // "Hello, World 42!": vowels(e,o,o)=3, digits=2, spaces=2,
    // lower(e,l,l,o,o,r,l,d)=8, upper(H,W)=2, punct(, !)=2
    assert(feats(1L).toSeq == Seq(3f, 2f, 2f, 8f, 2f, 2f))
    assert(feats(2L).toSeq == Seq(0f, 0f, 0f, 0f, 0f, 0f))
  }

  test("resizePlan preserves aspect ratio within the target box") {
    val df = Multimodal.withMeta(Multimodal.scan(spark, mediaDir.toString), "image")
    val planned = Multimodal.resizePlan(df, 128, 128)
      .select(col("resize_w"), col("resize_h"),
        col("meta.width"), col("meta.height"))
      .as[(Int, Int, Int, Int)].collect()
    planned.foreach { case (rw, rh, w, h) =>
      assert(rw <= 128 && rh <= 128)
      val scaleW = rw.toDouble / w
      val scaleH = rh.toDouble / h
      assert(math.abs(scaleW - scaleH) < 0.05) // aspect preserved (ceil slack)
    }
  }

  test("frameSamplePlan: stride + cap over video frames") {
    val d = tmpDir("vid")
    write(d.resolve("clip.bin"), "x" * 95) // stub: 95 % 300 + 1 = 96 frames
    val df = Multimodal.withMeta(Multimodal.scan(spark, d.toString), "video")
    val frames = Multimodal.frameSamplePlan(df, stride = 10, maxFrames = 5)
      .select("sampled_frames").as[Seq[Long]].head()
    assert(frames == Seq(0L, 10L, 20L, 30L, 40L)) // capped at 5
  }
}
