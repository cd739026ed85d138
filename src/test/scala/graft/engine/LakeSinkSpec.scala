package graft.engine

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.sink.LakeSink

class LakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "alpha", 10L), (2L, "en", "beta", 20L), (3L, "en", "gamma", 30L),
    (4L, "de", "delta", 40L), (5L, "de", "eps", 50L),
    (6L, "fr", "zeta", 60L)).toDF("doc_id", "lang", "text", "n_chars")

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq

  test("partitioned write: layout dirs, one file per partition, round-trip") {
    val out = tmpDir("lake").toString + "/t1"
    LakeSink.write(docs, LakeSink.Config(out, partitionBy = Seq("lang")))
    for (lang <- Seq("en", "de", "fr")) {
      val dir = Paths.get(out, s"lang=$lang")
      assert(Files.isDirectory(dir), s"missing partition dir lang=$lang")
      assert(parquetFiles(dir.toString).size == 1,
        s"expected exactly one file for lang=$lang")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == 6)
    assert(back.select("doc_id", "lang", "text", "n_chars").as[(Long, String, String, Long)]
      .collect().sortBy(_._1).toSeq ==
      docs.as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq)
  }

  test("maxRecordsPerFile splits oversized partitions without a shuffle") {
    val out = tmpDir("lake").toString + "/t2"
    LakeSink.write(docs, LakeSink.Config(out, partitionBy = Seq("lang"),
      maxRecordsPerFile = 2L))
    assert(parquetFiles(Paths.get(out, "lang=en").toString).size == 2) // 3 rows, cap 2
    assert(spark.read.parquet(out).count() == 6)
  }

  test("dynamic overwrite replaces only the partitions present in the batch") {
    val out = tmpDir("lake").toString + "/t3"
    LakeSink.write(docs, LakeSink.Config(out, partitionBy = Seq("lang")))
    val patch = Seq((7L, "de", "NEW", 70L)).toDF("doc_id", "lang", "text", "n_chars")
    LakeSink.write(patch, LakeSink.Config(out, partitionBy = Seq("lang")),
      SaveMode.Overwrite)
    val back = spark.read.parquet(out)
    // de fully replaced by the 1-row batch; en/fr untouched
    assert(back.filter($"lang" === "de").select("text").as[String].collect().toSeq == Seq("NEW"))
    assert(back.filter($"lang" === "en").count() == 3)
    assert(back.filter($"lang" === "fr").count() == 1)
  }

  test("readers partition-prune on the layout column") {
    val out = tmpDir("lake").toString + "/t4"
    LakeSink.write(docs, LakeSink.Config(out, partitionBy = Seq("lang"),
      clusterBy = Seq("n_chars")))
    val q = spark.read.parquet(out).filter($"lang" === "de")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "expected a partition-pruned scan")
    assert(q.count() == 2)
    // clusterBy laid rows out sorted within the file
    val vals = spark.read.parquet(out + "/lang=en").select("n_chars").as[Long].collect().toSeq
    assert(vals == vals.sorted)
  }

  test("filesPerPartition splits a hot partition value across several writers") {
    val out = tmpDir("lake").toString + "/t8"
    val hot = ((1 to 400).map(i => (i.toLong, "hot", s"t$i", i.toLong)) ++
      Seq((500L, "cold", "c", 1L)))
      .toDF("doc_id", "lang", "text", "n_chars")
      .repartition(8) // several input partitions → several salts
    LakeSink.write(hot, LakeSink.Config(out, partitionBy = Seq("lang"),
      filesPerPartition = 4))
    val hotFiles = parquetFiles(Paths.get(out, "lang=hot").toString).size
    assert(hotFiles > 1 && hotFiles <= 4,
      s"hot partition should split into 2..4 files, got $hotFiles")
    val back = spark.read.parquet(out)
    assert(back.count() == 401)
    assert(back.filter($"lang" === "hot").count() == 400)
  }

  test("zorderBy lays rows out in Morton order; wider types rejected") {
    import graft.functions.ZOrderUtil
    val out = tmpDir("lake").toString + "/tz"
    val grid = (for (a <- 0 until 8; b <- 0 until 8) yield (a, b))
      .toDF("xa", "xb")
      // shuffle the input so the sort has work to do; one partition →
      // one output file, so read order below IS file order
      .orderBy(hash($"xa", $"xb")).coalesce(1)
    LakeSink.write(grid, LakeSink.Config(out, zorderBy = Some(("xa", "xb"))))
    val rows = spark.read.parquet(out)
      // one output file: read order = file order
      .as[(Int, Int)].collect().toSeq
    val codes = rows.map { case (a, b) => ZOrderUtil.interleave(a, b) }
    assert(codes == codes.sorted, "file rows must be in Morton order")

    val e = intercept[IllegalArgumentException] {
      LakeSink.write(docs, LakeSink.Config(out + "2",
        zorderBy = Some(("doc_id", "n_chars")))) // LONG columns
    }
    assert(e.getMessage.contains("must be INT"))
  }

  test("empty frame writes a valid (readable, zero-row) table") {
    val out = tmpDir("lake").toString + "/t6"
    LakeSink.write(docs.filter($"doc_id" < 0), LakeSink.Config(out, partitionBy = Seq("lang")))
    // schema round-trips through the _SUCCESS-committed empty table
    assert(spark.read.schema(docs.schema).parquet(out).count() == 0)
  }

  test("null partition values land in the default partition and read back as null") {
    val out = tmpDir("lake").toString + "/t7"
    val withNull = docs.unionByName(
      Seq((9L, null.asInstanceOf[String], "nolang", 90L))
        .toDF("doc_id", "lang", "text", "n_chars"))
    LakeSink.write(withNull, LakeSink.Config(out, partitionBy = Seq("lang")))
    val back = spark.read.parquet(out)
    assert(back.count() == 7)
    assert(back.filter($"lang".isNull).select("doc_id").as[Long]
      .collect().toSeq == Seq(9L))
  }

  test("ORC format: same layout semantics, filter pushdown reaches the scan") {
    val out = tmpDir("lake").toString + "/t8"
    LakeSink.write(docs, LakeSink.Config(out, partitionBy = Seq("lang"),
      clusterBy = Seq("n_chars"), format = "orc"))
    // layout dirs exist and the round trip is lossless
    assert(new java.io.File(out, "lang=en").exists())
    val back = spark.read.orc(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      docs.select("doc_id").as[Long].collect().sorted.toSeq)
    // partition pruning + predicate pushdown appear in the ORC scan
    val plan = back.filter($"lang" === "en" && $"n_chars" > 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      plan.linesIterator.take(8).mkString("\n"))
    // unknown formats rejected loudly
    val e = intercept[IllegalArgumentException] {
      LakeSink.Config(out, format = "avro")
    }
    assert(e.getMessage.contains("parquet or orc"))
  }

  test("static overwrite mode still truncates the whole table when asked") {
    val out = tmpDir("lake").toString + "/t5"
    LakeSink.write(docs, LakeSink.Config(out, partitionBy = Seq("lang")))
    val patch = Seq((8L, "de", "ONLY", 80L)).toDF("doc_id", "lang", "text", "n_chars")
    LakeSink.write(patch, LakeSink.Config(out, partitionBy = Seq("lang"),
      dynamicOverwrite = false), SaveMode.Overwrite)
    assert(spark.read.parquet(out).count() == 1) // en/fr gone: static semantics
  }
}
