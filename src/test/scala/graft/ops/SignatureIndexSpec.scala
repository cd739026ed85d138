package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted corpus signature index: incremental near-dup must be
  * drivable from a parquet-loaded index WITHOUT the corpus raw frame in
  * scope — structurally proving the seen side is never re-shingled /
  * re-sketched per batch.
  */
class SignatureIndexSpec extends SparkSpec {
  import spark.implicits._

  private def seenDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely different content with no overlap whatsoever here"))
    .toDF("id", "text")

  private def incomingDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog again and"),
    (11L, "the quick brown fox jumps over the lazy dog again and again"),
    (12L, "ANOTHER totally unrelated document about graph databases ok"))
    .toDF("id", "text")

  test("minhash index path ≡ raw path, through a parquet round-trip") {
    val direct = Dedup.nearDupAgainst(incomingDocs, seenDocs, "id", "text",
      threshold = 0.5).select("id").as[Long].collect().toSet

    val idxPath = tmpDir("mhidx").toString + "/index"
    Dedup.buildMinhashIndex(seenDocs, "id", "text").write.parquet(idxPath)
    // The corpus frame is NOT passed below — the index alone drives the
    // probe. That is the structural guarantee: no seen-side re-shingle.
    val loaded = spark.read.parquet(idxPath)
    val viaIndex = Dedup.nearDupAgainstIndex(incomingDocs, loaded, "id",
      "text", threshold = 0.5).select("id").as[Long].collect().toSet

    assert(direct == Set(12L))
    assert(viaIndex == direct)
  }

  test("index carries its own parameters: non-default build still correct") {
    val idxPath = tmpDir("mhidx2").toString + "/index"
    Dedup.buildMinhashIndex(seenDocs, "id", "text",
      numHashes = 32, bands = 16, shingle = 2).write.parquet(idxPath)
    val loaded = spark.read.parquet(idxPath)
    // No parameters passed at probe time — they ride the index columns.
    val kept = Dedup.nearDupAgainstIndex(incomingDocs, loaded, "id", "text",
      threshold = 0.5).select("id").as[Long].collect().toSet
    assert(kept == Set(12L))
  }

  test("empty index keeps every incoming row") {
    val empty = Dedup.buildMinhashIndex(
      seenDocs.filter(col("id") < 0), "id", "text")
    val kept = Dedup.nearDupAgainstIndex(incomingDocs, empty, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L, 12L))
  }

  test("append lifecycle: batch entries extend the index incrementally") {
    val idxPath = tmpDir("mhidx3").toString + "/index"
    Dedup.buildMinhashIndex(seenDocs, "id", "text").write.parquet(idxPath)
    // batch 1 keeps 12; its index entries append
    val kept1 = Dedup.nearDupAgainstIndex(incomingDocs,
      spark.read.parquet(idxPath), "id", "text", threshold = 0.5)
    Dedup.buildMinhashIndex(kept1, "id", "text")
      .write.mode("append").parquet(idxPath)
    // batch 2 re-sends 12's content under a new id → now a known dup
    val batch2 = Seq(
      (20L, "ANOTHER totally unrelated document about graph databases ok"),
      (21L, "fresh text that matches nothing stored in the index at all"))
      .toDF("id", "text")
    val kept2 = Dedup.nearDupAgainstIndex(batch2,
      spark.read.parquet(idxPath), "id", "text", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept2 == Set(21L))
  }

  test("append-then-probe ≡ one-shot index over the same corpus") {
    // The lifecycle contract: an index grown by per-batch appends must
    // be indistinguishable, verdict for verdict, from one built in a
    // single pass over the union — otherwise incremental operation
    // silently drifts from the rebuild-from-scratch truth.
    import org.apache.spark.sql.functions.col
    val batch1 = Seq(
      (30L, "incremental corpora arrive in batches over many days"),
      (31L, "wholly unrelated content about distributed query planning"))
      .toDF("id", "text")
    val oneShotPath = tmpDir("mhidx5a").toString + "/index"
    val apPath = tmpDir("mhidx5b").toString + "/index"
    Dedup.buildMinhashIndex(seenDocs.unionByName(batch1), "id", "text")
      .write.parquet(oneShotPath)
    Dedup.buildMinhashIndex(seenDocs, "id", "text").write.parquet(apPath)
    Dedup.buildMinhashIndex(batch1, "id", "text")
      .write.mode("append").parquet(apPath)
    // probe: near-dups of both corpus generations plus fresh text
    val probe = Seq(
      (40L, "incremental corpora arrive in batches over many days"), // dup of 30
      (41L, "the quick brown fox jumps over the lazy dog again and again"),
      (42L, "completely new content matching nothing in either half"))
      .toDF("id", "text")
    def kept(path: String): Set[Long] =
      Dedup.nearDupAgainstIndex(probe, spark.read.parquet(path),
        "id", "text", threshold = 0.5)
        .select("id").as[Long].collect().toSet
    assert(kept(oneShotPath) == kept(apPath))
    assert(kept(apPath) == Set(42L))
    // and the two indexes hold identical entries per id (sorted sig
    // sets and band keys — storage layout may differ, content may not)
    def entries(path: String) =
      spark.read.parquet(path)
        .select(col("id"), col("sig_hashes"), col("band_keys"),
          col("num_hashes"), col("bands"), col("shingle"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(entries(oneShotPath) == entries(apPath))
  }

  test("compactIndex: fewer files, identical entries, identical verdicts") {
    val idxPath = tmpDir("mhidx6").toString + "/index"
    // grow by many small appends — the shape compaction exists for
    Dedup.buildMinhashIndex(seenDocs, "id", "text").write.parquet(idxPath)
    (0 until 4).foreach { i =>
      val b = Seq((50L + i, s"append batch $i with its own words w$i x$i"))
        .toDF("id", "text")
      Dedup.buildMinhashIndex(b, "id", "text")
        .write.mode("append").parquet(idxPath)
    }
    def entries() = spark.read.parquet(idxPath)
      .select("id", "sig_hashes", "band_keys", "num_hashes", "bands",
        "shingle")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    def kept() = Dedup.nearDupAgainstIndex(incomingDocs,
        spark.read.parquet(idxPath), "id", "text", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    val (entriesBefore, keptBefore) = (entries(), kept())
    val stats = Dedup.compactIndex(spark, idxPath,
      Seq("num_hashes", "bands", "shingle"))
    assert(stats.filesAfter < stats.filesBefore,
      s"expected consolidation, got $stats")
    assert(stats.rows == entriesBefore.size.toLong)
    assert(entries() == entriesBefore)
    assert(kept() == keptBefore)
    // leftovers of the swap are gone
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxPath + ".compact.tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idxPath + ".compact.old")))
  }

  test("compactIndex fails loud on parameter drift, index untouched") {
    val idxPath = tmpDir("mhidx7").toString + "/index"
    Dedup.buildMinhashIndex(seenDocs, "id", "text").write.parquet(idxPath)
    Dedup.buildMinhashIndex(incomingDocs, "id", "text",
      numHashes = 32, bands = 16).write.mode("append").parquet(idxPath)
    val before = spark.read.parquet(idxPath).count()
    val e = intercept[IllegalArgumentException](
      Dedup.compactIndex(spark, idxPath,
        Seq("num_hashes", "bands", "shingle")))
    assert(e.getMessage.contains("not parameter-uniform"))
    assert(spark.read.parquet(idxPath).count() == before) // untouched
  }

  test("mixed-parameter index fails loud, not silent zero recall") {
    val idxPath = tmpDir("mhidx4").toString + "/index"
    Dedup.buildMinhashIndex(seenDocs, "id", "text").write.parquet(idxPath)
    // A later batch appended under DIFFERENT banding parameters: the
    // mismatched slice's band keys could never collide with probes
    // banded per the head row — require() instead of lost duplicates.
    Dedup.buildMinhashIndex(incomingDocs, "id", "text",
      numHashes = 32, bands = 16).write.mode("append").parquet(idxPath)
    val e = intercept[IllegalArgumentException](
      Dedup.nearDupAgainstIndex(incomingDocs,
        spark.read.parquet(idxPath), "id", "text"))
    assert(e.getMessage.contains("not parameter-uniform"))
  }

  test("non-index frames rejected loudly") {
    val e = intercept[IllegalArgumentException](
      Dedup.nearDupAgainstIndex(incomingDocs, seenDocs, "id", "text"))
    assert(e.getMessage.contains("not a minhash signature index"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.embeddingNearDupAgainstIndex(incomingDocs, seenDocs, "id", "emb"))
    assert(e2.getMessage.contains("not an embedding signature index"))
  }

  test("embedding index path ≡ raw path, through a parquet round-trip") {
    val seen = Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("id", "emb")
    val incoming = Seq(
      (10L, Array(1f, 0f, 0f, 0f)), // copy of seen 1 → dropped
      (11L, Array(0f, 0f, 1f, 0f))) // orthogonal → kept
      .toDF("id", "emb")
    val direct = Dedup.embeddingNearDupAgainst(incoming, seen, "id", "emb",
      threshold = 0.99).select("id").as[Long].collect().toSet

    val idxPath = tmpDir("embidx").toString + "/index"
    Dedup.buildEmbeddingIndex(seen, "id", "emb", planes = 64, bands = 4)
      .write.parquet(idxPath)
    val viaIndex = Dedup.embeddingNearDupAgainstIndex(incoming,
      spark.read.parquet(idxPath), "id", "emb", threshold = 0.99)
      .select("id").as[Long].collect().toSet

    assert(direct == Set(11L))
    assert(viaIndex == direct)
  }

  test("empty embedding index keeps everything") {
    val incoming = Seq((10L, Array(1f, 0f))).toDF("id", "emb")
    val empty = Dedup.buildEmbeddingIndex(
      incoming.filter(col("id") < 0), "id", "emb")
    val kept = Dedup.embeddingNearDupAgainstIndex(incoming, empty,
      "id", "emb").select("id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }
}
