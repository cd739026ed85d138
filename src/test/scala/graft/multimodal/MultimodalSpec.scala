package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no writer for $fmt")
    bos.toByteArray
  }

  private def writeBytes(p: java.nio.file.Path, b: Array[Byte]): Unit = {
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, b)
    ()
  }

  private def mediaDir = {
    val d = tmpDir("media")
    writeBytes(d.resolve("a.png"), encodeImage("png", 40, 24))
    writeBytes(d.resolve("b.jpg"), encodeImage("jpg", 64, 48))
    write(d.resolve(".hidden"), "x")
    d
  }

  test("scan: binary payloads with names, hidden files skipped") {
    val df = Multimodal.scan(spark, mediaDir.toString)
    val rows = df.select("name").as[String].collect().toSet
    assert(rows == Set("a.png", "b.jpg"))
    assert(df.schema("payload").dataType.typeName == "binary")
  }

  test("withMeta: REAL ImageIO header decode recovers true dimensions") {
    val d = mediaDir
    write(d.resolve("junk.img"), "not an image at all")
    val df = Multimodal.withMeta(Multimodal.scan(spark, d.toString), "image")
    val metas = df.select(col("name"), col("meta.width"), col("meta.height"),
      col("meta.decodeStatus"), col("meta.sha256"))
      .as[(String, Int, Int, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(metas("a.png")._2 == 40 && metas("a.png")._3 == 24)
    assert(metas("b.jpg")._2 == 64 && metas("b.jpg")._3 == 48)
    assert(metas("a.png")._4 == "ok")
    assert(metas("a.png")._5.length == 64) // real sha256 of the payload
    // undecodable bytes flow on with -1 dims + diagnosis, never throw
    assert(metas("junk.img")._2 == -1)
    assert(metas("junk.img")._4 == "not a recognized image format")
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

  test("decode dispatch: WAV audio decodes for real; non-WAV audio and video stay stubbed") {
    // real RIFF/WAVE payload → AudioProbe header facts, not the stub
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](4 * 50)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 50L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val real = MediaDecoder.decode("audio", bos.toByteArray)
    assert(real.decodeStatus == "ok" && real.sampleRateHz == 8000 &&
      real.channels == 2 && real.bitsPerSample == 16 && real.nFrames == 50)
    val m = MediaDecoder.decode("audio", "some waveform".getBytes("UTF-8"))
    assert(m.decodeStatus == "stubbed" && m.sampleRateHz == 16000)
    // FLAC and MP3 headers decode for real through the same entry point
    val flacBytes = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      val si = new Array[Byte](34)
      si(10) = ((44100 >> 12) & 0xff).toByte
      si(11) = ((44100 >> 4) & 0xff).toByte
      si(12) = (((44100 & 0xf) << 4) | ((2 - 1) << 1) | (((16 - 1) >> 4) & 1)).toByte
      si(13) = (((16 - 1) & 0xf) << 4).toByte
      si(17) = 100.toByte
      out.write(si); out.toByteArray
    }
    val fl = MediaDecoder.decode("audio", flacBytes)
    assert(fl.decodeStatus == "ok" && fl.sampleRateHz == 44100 &&
      fl.channels == 2 && fl.bitsPerSample == 16 && fl.nFrames == 100)
    val mp3Bytes = {
      val frameLen = 144 * 128000 / 44100
      val out = new java.io.ByteArrayOutputStream()
      for (_ <- 1 to 3) {
        out.write(0xff); out.write(0xfa); out.write(0x90); out.write(0x00)
        (1 to frameLen - 4).foreach(_ => out.write(0))
      }
      out.toByteArray
    }
    val mp = MediaDecoder.decode("audio", mp3Bytes)
    assert(mp.decodeStatus == "ok" && mp.sampleRateHz == 44100 &&
      mp.channels == 2 && mp.nFrames == 3 * 1152)
    val v = MediaDecoder.decode("video", ("x" * 10).getBytes("UTF-8"))
    assert(v.decodeStatus == "stubbed" && v.nFrames == 11)
    // real image path through the same entry point
    val i = MediaDecoder.decode("image", encodeImage("gif", 20, 10))
    assert(i.decodeStatus == "ok" && i.width == 20 && i.height == 10)
    val bad = MediaDecoder.decode("image", null)
    assert(bad.width == -1 && bad.decodeStatus == "file is empty")
    // document kind: real PDF structural probe, pages ride nFrames
    val pdf = MediaDecoder.decode("document",
      graft.queries.PdfFixture.simplePdf(Seq(
        "BT (a) Tj ET", "BT (b) Tj ET")))
    assert(pdf.decodeStatus == "ok" && pdf.nFrames == 2 &&
      pdf.kind == "document")
    val enc = MediaDecoder.decode("document",
      graft.queries.PdfFixture.encryptedPdf("x"))
    assert(enc.decodeStatus == "encrypted")
    // plain text IS a readable document since r14 (txt route)
    val txtDoc = MediaDecoder.decode("document", "plain text".getBytes)
    assert(txtDoc.decodeStatus == "ok")
    val notDoc = MediaDecoder.decode("document", Array[Byte](0, 1, 2, 3, 4))
    assert(notDoc.decodeStatus == "not a readable document")
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
