package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.sink.ExportSink

class ExportSinkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 200)
    .map(i => (s"doc$i", s"text body number $i", i % 7))
    .toDF("id", "text", "label")

  test("jsonl export: shard layout, manifest totals, verify green") {
    val out = tmpDir("exp").toString + "/corpus"
    val m = ExportSink.export(docs, out, "id", numShards = 8)
    assert(m.format == "jsonl" && m.numShards == 8)
    assert(m.totalCount == 200)
    assert(m.shards.map(_.count).sum == 200)
    assert(m.shards.map(_.shard) == (0 until 8))
    // every shard dir exists and holds jsonl lines == manifest count
    val back = spark.read.schema(docs.schema).json(out)
    assert(back.count() == 200)
    m.shards.foreach { s =>
      val n = back.filter(col("shard") === s.shard).count()
      assert(n == s.count, s"shard ${s.shard}")
    }
    assert(ExportSink.verifyExport(spark, out).isRight)
  }

  test("deterministic: re-export produces identical manifest and shard bytes") {
    val out = tmpDir("exp2").toString + "/corpus"
    val m1 = ExportSink.export(docs, out, "id", numShards = 4)
    // re-run over a REPARTITIONED input: same records, different
    // physical layout — the export must not care
    val m2 = ExportSink.export(docs.repartition(13), out, "id", numShards = 4)
    assert(m1 == m2)
    assert(ExportSink.verifyExport(spark, out).isRight)
  }

  test("fingerprint is order-independent but content-sensitive") {
    val out = tmpDir("exp3").toString + "/corpus"
    val m1 = ExportSink.export(docs, out, "id", numShards = 2)
    val out2 = tmpDir("exp3b").toString + "/corpus"
    val mutated = docs.withColumn("text",
      when(col("id") === "doc7", lit("TAMPERED")).otherwise(col("text")))
    val m2 = ExportSink.export(mutated, out2, "id", numShards = 2)
    assert(m1.totalCount == m2.totalCount)
    // only doc7's shard fingerprint differs
    val diff = m1.shards.zip(m2.shards).filter { case (a, b) =>
      a.fingerprint != b.fingerprint }
    assert(diff.size == 1)
  }

  test("verifyExport catches tampering and truncation") {
    val out = tmpDir("exp4").toString + "/corpus"
    ExportSink.export(docs, out, "id", numShards = 2, format = "parquet")
    assert(ExportSink.verifyExport(spark, out).isRight)
    // truncate: delete one shard dir wholesale
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(out + "/shard=1"))
    val bad = ExportSink.verifyExport(spark, out)
    assert(bad.isLeft)
    assert(bad.left.toOption.get.exists(_.contains("shard 1")))
  }

  test("parquet export round-trips typed columns") {
    val out = tmpDir("exp5").toString + "/corpus"
    val typed = Seq((1L, 1.5, java.sql.Timestamp.valueOf("2026-01-02 03:04:05")))
      .toDF("id", "score", "ts")
    val m = ExportSink.export(typed, out, "id", numShards = 1,
      format = "parquet")
    assert(m.totalCount == 1)
    val back = spark.read.parquet(out)
    assert(back.select("score").as[Double].head() == 1.5)
    assert(ExportSink.verifyExport(spark, out).isRight)
  }

  test("guards: bad shard count, bad format, reserved column, missing id") {
    val out = tmpDir("exp6").toString + "/x"
    intercept[IllegalArgumentException](
      ExportSink.export(docs, out, "id", 0))
    intercept[IllegalArgumentException](
      ExportSink.export(docs, out, "id", 2, format = "csv"))
    intercept[IllegalArgumentException](
      ExportSink.export(docs.withColumn("shard", lit(1)), out, "id", 2))
    intercept[IllegalArgumentException](
      ExportSink.export(docs, out, "nope", 2))
  }

  test("empty export: zero files, zero-count manifest, no crash") {
    // an all-filtered batch is a legitimate export; partition discovery
    // finds no shard= dirs and the manifest must report empty shards
    val out = tmpDir("expempty").toString + "/corpus"
    val m = ExportSink.export(docs.filter(lit(false)), out, "id", 4)
    assert(m.totalCount == 0L)
    assert(m.shards.length == 4 && m.shards.forall(_.count == 0L))
  }
}
