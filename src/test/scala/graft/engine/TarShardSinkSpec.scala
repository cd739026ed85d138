package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.sink.TarShardSink

/** WebDataset tar shard export: round-trip through the sink's own
  * reader AND an independent header decode, byte determinism, empty
  * shards, missing modalities, tamper detection, guards.
  */
class TarShardSinkSpec extends SparkSpec {
  import spark.implicits._

  private def samples = (0 until 60).map { i =>
    (s"sample$i",
      Array.tabulate[Byte](10 + i)(j => ((i * 31 + j) & 0xff).toByte),
      s"""{"label": ${i % 5}}""",
      s"caption number $i")
  }.toDF("id", "img", "json", "txt")

  private val entries = Seq("img" -> "jpg", "json" -> "json", "txt" -> "txt")

  test("export + read round-trips every sample file") {
    val out = tmpDir("tar1").toString + "/wds"
    val m = TarShardSink.export(samples, out, "id", entries, numShards = 4)
    assert(m.format == "wds-tar" && m.numShards == 4)
    assert(m.totalSamples == 60)
    assert(m.shards.map(_.shard) == (0 until 4))
    assert(m.shards.map(_.samples).sum == 60)
    assert(m.shards.map(_.files).sum == 180) // 3 files per sample
    val back = TarShardSink.read(spark, out)
    assert(back.count() == 180)
    // bytes survive exactly
    val img7 = back.filter(col("key") === "sample7" && col("ext") === "jpg")
      .select("content").as[Array[Byte]].head()
    assert(img7.toSeq ==
      Array.tabulate[Byte](17)(j => ((7 * 31 + j) & 0xff).toByte).toSeq)
    val txt7 = back.filter(col("key") === "sample7" && col("ext") === "txt")
      .select("content").as[Array[Byte]].head()
    assert(new String(txt7, StandardCharsets.UTF_8) == "caption number 7")
    assert(TarShardSink.verifyExport(spark, out).isRight)
  }

  test("sample files are ADJACENT and entry-ordered inside each tar") {
    val out = tmpDir("tar2").toString + "/wds"
    TarShardSink.export(samples, out, "id", entries, numShards = 2)
    for (shard <- 0 until 2) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, f"shard-$shard%05d.tar"))
      val names = TarShardSink.parseTar(bytes).map(_._1)
      // groups of three per key, extensions in caller order
      assert(names.length % 3 == 0)
      names.grouped(3).foreach { g =>
        val key = g.head.stripSuffix(".jpg")
        assert(g == Seq(s"$key.jpg", s"$key.json", s"$key.txt"), g.toString)
      }
      // keys sorted within the shard (deterministic bytes need an order)
      val keys = names.grouped(3).map(_.head.stripSuffix(".jpg")).toSeq
      assert(keys == keys.sorted)
    }
  }

  test("deterministic: re-export over a repartitioned input is byte-identical") {
    val out = tmpDir("tar3").toString + "/wds"
    val m1 = TarShardSink.export(samples, out, "id", entries, numShards = 3)
    val m2 = TarShardSink.export(samples.repartition(11), out, "id",
      entries, numShards = 3)
    assert(m1 == m2)
    assert(m1.shards.map(_.sha256) == m2.shards.map(_.sha256))
  }

  test("empty shards land as valid empty tars; empty input is all-empty") {
    val out = tmpDir("tar4").toString + "/wds"
    // one sample, many shards: most shards are empty
    val m = TarShardSink.export(samples.limit(1), out, "id", entries,
      numShards = 5)
    assert(m.totalSamples == 1)
    assert(m.shards.count(_.samples == 0) == 4)
    assert(m.shards.forall(_.bytes >= 1024)) // ≥ end-of-archive blocks
    assert(TarShardSink.read(spark, out).count() == 3)
    val m0 = TarShardSink.export(samples.limit(0), out, "id", entries,
      numShards = 3)
    assert(m0.totalSamples == 0)
    assert(TarShardSink.read(spark, out).count() == 0)
    assert(TarShardSink.verifyExport(spark, out).isRight)
  }

  test("a NULL modality skips that file, the sample survives") {
    val out = tmpDir("tar5").toString + "/wds"
    val holey = samples.withColumn("img",
      when(col("id") === "sample3", lit(null).cast("binary"))
        .otherwise(col("img")))
    val m = TarShardSink.export(holey, out, "id", entries, numShards = 2)
    assert(m.totalSamples == 60)
    assert(m.shards.map(_.files).sum == 179)
    val s3 = TarShardSink.read(spark, out).filter(col("key") === "sample3")
      .select("ext").as[String].collect().sorted
    assert(s3.toSeq == Seq("json", "txt"))
  }

  test("verifyExport flags tampered and missing shards") {
    val out = tmpDir("tar6").toString + "/wds"
    TarShardSink.export(samples, out, "id", entries, numShards = 2)
    // tamper: flip one payload byte in place (same length — binaryFile
    // caches file sizes, so append-tampering reads as an IO error, not
    // a content diff)
    val p = java.nio.file.Paths.get(out, "shard-00001.tar")
    val bytes = java.nio.file.Files.readAllBytes(p)
    bytes(520) = (bytes(520) ^ 0x01).toByte // first entry's payload
    java.nio.file.Files.write(p, bytes)
    val r = TarShardSink.verifyExport(spark, out)
    assert(r.isLeft)
    assert(r.left.toOption.get.exists(_.contains("sha256")), r.toString)
    java.nio.file.Files.delete(p)
    val r2 = TarShardSink.verifyExport(spark, out)
    assert(r2.isLeft)
    assert(r2.left.toOption.get.exists(_.contains("missing")), r2.toString)
  }

  test("guards: bad extensions, missing columns, oversized keys fail loud") {
    val out = tmpDir("tar7").toString + "/wds"
    intercept[IllegalArgumentException] {
      TarShardSink.export(samples, out, "id", Seq("img" -> "a.b"), 2)
    }
    intercept[IllegalArgumentException] {
      TarShardSink.export(samples, out, "id", Seq("nope" -> "jpg"), 2)
    }
    intercept[IllegalArgumentException] {
      TarShardSink.export(samples, out, "id",
        Seq("img" -> "jpg", "txt" -> "jpg"), 2)
    }
    // a key that overflows the 100-byte ustar name field
    val big = Seq(("k" * 120, "x")).toDF("id", "txt")
    val e = intercept[org.apache.spark.SparkException] {
      TarShardSink.export(big, out, "id", Seq("txt" -> "txt"), 1)
    }
    assert(e.getMessage.contains("100") ||
      Option(e.getCause).exists(_.getMessage.contains("100")))
  }

  test("tar bytes parse with an independent decode of the ustar fields") {
    val h = TarShardSink.tarHeader("abc.txt", 5L)
    assert(h.length == 512)
    assert(new String(h, 0, 7, StandardCharsets.US_ASCII) == "abc.txt")
    // size field: 11-digit octal + space
    assert(new String(h, 124, 12, StandardCharsets.US_ASCII) == "00000000005 ")
    assert(h(156) == '0'.toByte)
    assert(new String(h, 257, 5, StandardCharsets.US_ASCII) == "ustar")
    // checksum verifies: sum of all bytes with chksum field as spaces
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xff).sum
    val stored = Integer.parseInt(
      new String(h, 148, 6, StandardCharsets.US_ASCII), 8)
    assert(sum == stored)
  }
}
