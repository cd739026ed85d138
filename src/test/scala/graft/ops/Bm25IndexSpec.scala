package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted BM25 inverted index: score parity with the single-scan
  * face on the same corpus and parameters, selective-read plan shape
  * (the query's term filter must reach the postings scan), top-k
  * determinism, and guards.
  */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the table of contents and the table again"),
    (2L, "scan the table"),
    (3L, "hash join versus merge join"),
    (4L, "nothing relevant here at all"),
    (5L, null: String),
    (6L, "hash hash hash hash scan")).toDF("doc_id", "text")

  test("index query scores equal the single-scan BM25 face") {
    val dir = tmpDir("bm25idx").toString
    Bm25Index.build(corpus, "doc_id", "text", dir)
    val terms = Seq("table", "scan", "hash")
    val viaIndex = Bm25Index.query(spark, dir, terms, k = 100)
      .select(col("doc").as("doc_id"), col("bm25"))
      .as[(Long, Double)].collect().toMap
    val direct = TextAnalysis.bm25(corpus, "doc_id", "text", terms)
      .filter(col("bm25") > 0)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(viaIndex.keySet == direct.keySet && viaIndex.keySet == Set(1L, 2L, 3L, 6L))
    for ((id, s) <- direct)
      assert(math.abs(viaIndex(id) - s) < 1e-12, s"doc $id")
  }

  test("the term filter reaches the postings parquet scan") {
    val dir = tmpDir("bm25push").toString
    Bm25Index.build(corpus, "doc_id", "text", dir)
    val plan = Bm25Index.query(spark, dir, Seq("hash"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("hash"),
      plan.linesIterator.take(10).mkString("\n"))
  }

  test("a query reads ONLY term-pruned postings + one-row stats — no O(corpus) scan") {
    val dir = tmpDir("bm25shape").toString
    Bm25Index.build(corpus, "doc_id", "text", dir)
    val plan = Bm25Index.query(spark, dir, Seq("hash"), k = 10)
      .queryExecution.executedPlan.toString
    // dl is denormalized into the postings, so the old full lens/ join
    // must be gone: every parquet scan in the plan is postings or stats
    assert(!plan.contains("/lens"), "query plan still scans a doc-length table")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.forall(l => l.contains("/postings") || l.contains("/stats")),
      scans.mkString("\n"))
    // and the postings scans all carry the term pushdown
    assert(scans.filter(_.contains("/postings"))
      .forall(_.contains("hash")), scans.mkString("\n"))
  }

  test("top-k cut is deterministic: score desc, then doc asc") {
    val dir = tmpDir("bm25topk").toString
    // two docs with IDENTICAL text → identical scores; the tie must
    // break by doc id, stable across shuffles
    Bm25Index.build(Seq(
      (10L, "scan scan"), (11L, "scan scan"), (12L, "scan")).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val top2 = Bm25Index.query(spark, dir, Seq("scan"), k = 2)
      .select("doc").as[Long].collect().toSeq
    assert(top2 == Seq(10L, 11L))
  }

  test("a version-1 index (no format stamp) fails with a rebuild message, not an unresolved column") {
    val dir = tmpDir("bm25v1").toString
    Bm25Index.build(corpus, "doc_id", "text", dir)
    // regress the stats to the v1 shape: no format column (and a v1
    // index also had no dl in postings — the stamp must trip FIRST)
    val stats = spark.read.parquet(s"$dir/stats").drop("format").collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(stats.toSeq),
        spark.read.parquet(s"$dir/stats").drop("format").schema)
      .write.mode("overwrite").parquet(s"$dir/stats")
    val e = intercept[IllegalArgumentException](
      Bm25Index.query(spark, dir, Seq("table"), k = 5))
    assert(e.getMessage.contains("rebuild") &&
      e.getMessage.contains("format version 1"), e.getMessage)
  }

  test("guards: empty terms, bad k/k1/b rejected") {
    val dir = tmpDir("bm25guard").toString
    Bm25Index.build(corpus, "doc_id", "text", dir)
    intercept[IllegalArgumentException] {
      Bm25Index.query(spark, dir, Nil, 5)
    }
    intercept[IllegalArgumentException] {
      Bm25Index.query(spark, dir, Seq("x"), 0)
    }
    intercept[IllegalArgumentException] {
      Bm25Index.query(spark, dir, Seq("x"), 5, b = 1.5)
    }
  }
}
