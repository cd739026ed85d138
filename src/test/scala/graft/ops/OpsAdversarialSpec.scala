package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => F}

/** Hostile-input sweep over the public ops surface: NULL and empty
  * text, single tokens, control characters, unicode (CJK/emoji, no
  * spaces), a pathological all-identical corpus, and a long document.
  * Ops must neither throw nor mis-group — the dedup/curation family is
  * exactly the code a 100 TB pipeline points at a raw crawl, which
  * contains all of these.
  */
class OpsAdversarialSpec extends SparkSpec {
  import spark.implicits._

  private def hostile = Seq(
    (1L, Option.empty[String]),            // NULL text
    (2L, Some("")),                        // empty
    (3L, Some("   ")),                     // blank
    (4L, Some("one")),                     // single token
    (5L, Some("a\u000Bb c")),              // vertical tab = content
    (6L, Some("漢字テスト")), // CJK, no spaces
    (7L, Some("emoji 😀 text")), // surrogate pair
    (8L, Some((1 to 5000).map(i => s"tok$i").mkString(" "))), // long doc
    (9L, Some("x " * 500)))                // degenerate repetition
    .toDF("id", "text")

  test("exact dedup family survives hostile text") {
    val stats = Dedup.exactStats(hostile, "text", "id").collect().head
    assert(stats.getAs[Long]("n_rows") == 9)
    assert(stats.getAs[Long]("n_dupes_removed") == 0) // all 9 distinct
    assert(Dedup.exact(hostile, Seq("text"), "id").count() == 9)
    // fingerprint: blank collapses to empty; \x0B stays content
    val fps = hostile.withColumn("fp", F.fingerprint(col("text")))
      .select("id", "fp").as[(Long, Long)].collect().toMap
    assert(fps(2L) == fps(3L)) // "" and "   " normalize identically
    assert(fps(5L) != fps(2L))
  }

  test("dedupSegments survives hostile text and regex-metachar separators") {
    // NULL/empty → 0-segment empty docs; everything else rebuilds
    // verbatim (no cross-doc repeated segment in the hostile set).
    val out = Dedup.dedupSegments(hostile, "id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("", 0L)) && out(2L) == (("", 0L)))
    assert(out(6L) == (("漢字テスト", 1L)))
    assert(out(7L) == (("emoji 😀 text", 1L)))
    // A regex metacharacter separator is a LITERAL: "a.b|c" on sep="."
    // must split to ["a", "b|c"], never per-character.
    val dotted = Seq((1L, "a.b|c"), (2L, "z.b|c")).toDF("id", "text")
    val byDot = Dedup.dedupSegments(dotted, "id", "text", sep = ".")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // At minChars=1 every non-empty segment participates: "a"/"z" are
    // unique (kept), "b|c" repeats in both docs (dropped everywhere).
    assert(byDot(1L) == "a")
    assert(byDot(2L) == "z")
  }

  test("near-dup pipelines treat contentless docs as one dup class, nothing else") {
    // NULL, "" and "   " all shingle to the {hash("")} sentinel →
    // jaccard 1 among themselves (two blank docs ARE duplicates); no
    // other pair qualifies. Both mechanisms must land on exactly that.
    val expect = Set((1L, 2L), (1L, 3L), (2L, 3L))
    val lsh = Dedup.nearDuplicates(hostile, "id", "text", threshold = 0.8)
    assert(lsh.select("id_a", "id_b").as[(Long, Long)].collect().toSet == expect)
    lsh.unpersist()
    val inv = Dedup.jaccardNearDuplicates(hostile, "id", "text",
      threshold = 0.8, maxDocFreq = Int.MaxValue)
    assert(inv.select("id_a", "id_b").as[(Long, Long)].collect().toSet == expect)
    // greedy curation keeps the smallest of the contentless class
    val kept = Dedup.dropNearDuplicates(hostile, "id", "text", threshold = 0.8)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 8L, 9L))
    // simhash: the same three docs sketch to 0 → hamming-0 pairs only
    val sim = Dedup.simhashPairs(hostile, "id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sim == expect)
  }

  test("all-identical corpus hits the skew cap, not a blowup") {
    val clones = (1L to 50L).map(i => (i, "same text every single time here"))
      .toDF("id", "text")
    // bucket of 50 identical docs under a cap of 10: candidate
    // generation must DROP the bucket (documented contract: run exact
    // dedup first), not materialize 50*49/2 pairs
    val capped = Dedup.nearDuplicates(clones, "id", "text",
      threshold = 0.8, maxBucket = 10)
    assert(capped.count() == 0)
    capped.unpersist()
    assert(Dedup.exact(clones, Seq("text"), "id").count() == 1)
    // simhash path: same contract via its opt-in cap; uncapped default
    // keeps the oracle-exact pair set
    assert(Dedup.simhashPairs(clones, "id", "text", maxHamming = 0,
      maxBucket = 10).count() == 0)
    assert(Dedup.simhashPairs(clones, "id", "text", maxHamming = 0)
      .count() == 50L * 49 / 2)
  }

  test("incremental family survives hostile text on either side") {
    val incoming = Seq(
      (20L, Some("a\u000Bb c")),           // dup of seen 5
      (21L, Option.empty[String]),         // exact-dup of seen NULL
      (22L, Some("novel content entirely")))
      .toDF("id", "text")
    val kept = Dedup.dedupAgainst(incoming, hostile, Seq("text"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(22L)) // NULL matches seen NULL; \x0B doc matches 5
    val keptNear = Dedup.nearDupAgainst(incoming, hostile, "id", "text",
      threshold = 0.8).select("id").as[Long].collect().toSet
    // 21's sentinel set matches seen's contentless class at j = 1
    assert(keptNear == Set(22L))
  }

  test("temporal joins survive null keys and null timestamps") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, Some("a"), Some(t("2024-01-01 00:10:00"))),
      (2L, Option.empty[String], Some(t("2024-01-01 00:10:00"))), // null key
      (3L, Some("a"), Option.empty[Timestamp]))                   // null ts
      .toDF("id", "key", "ts")
    val right = Seq(
      (10L, Some("a"), Some(t("2024-01-01 00:00:00"))),
      (11L, Option.empty[String], Some(t("2024-01-01 00:00:00"))))
      .toDF("rid", "key", "ts")
    val out = Joins.asofJoin(left, right.withColumnRenamed("ts", "rts"),
      Seq("key"), "ts", "rts", carryCols = Seq("rid"), rightTieCol = "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(10L))
    // NULL keys never match (SQL equi-join semantics, same as the
    // rangeJoin below and pandas merge_asof): the NULL-keyed left row
    // survives with NULL asof_* columns, never paired with the
    // NULL-keyed right row.
    assert(out(2L).isEmpty)
    // NULL left ts sorts first (nulls-first asc): no prior right row.
    assert(out(3L).isEmpty)
    assert(out.size == 3) // every left row survives exactly once

    val pts = left.filter(col("ts").isNotNull)
    val ivs = Seq((100L, Some("a"), t("2024-01-01 00:00:00"),
      t("2024-01-01 01:00:00"))).toDF("iid", "key", "s", "e")
    val pairs = Joins.rangeJoin(pts, ivs, Seq("key"), "ts", "s", "e",
      binMicros = 60000000L)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    // null-key points never equi-match (JOIN semantics, unlike the
    // window's null group above — documented asymmetry of SQL itself)
    assert(pairs == Set((1L, 100L)))
  }

  test("curation/chunking/tfidf edges: empty frames, tiny groups, whitespace") {
    val empty = Seq.empty[(Long, String, Int)].toDF("id", "g", "score")
    assert(Curation.capPerGroup(empty, Seq("g"), "score", "id", 3).count() == 0)
    val one = Seq((1L, "g", 5)).toDF("id", "g", "score")
    // k far above group size: everything kept, no error
    assert(Curation.capPerGroup(one, Seq("g"), "score", "id", 100).count() == 1)

    val ws = Seq((1L, "   \t  "), (2L, "")).toDF("id", "text")
    assert(TextAnalysis.chunkDocuments(ws, "text", 8, 2).count() == 0)
    assert(TextAnalysis.tfidf(ws, "id", "text").count() == 0)

    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(TextAnalysis.tfidf(emptyDocs, "id", "text").count() == 0)
    assert(TextAnalysis.chunkDocuments(emptyDocs, "text", 8, 2).count() == 0)
  }

  test("bloom-prefiltered incremental dedup matches exact path on hostile text") {
    val incoming = Seq(
      (20L, Some("ab c")),           // dup of seen 5
      (21L, Option.empty[String]),         // exact-dup of seen NULL
      (22L, Some("")),                     // dup of seen empty
      (23L, Some("novel content entirely")))
      .toDF("id", "text")
    val bloom = Dedup.digestBloom(hostile, Seq("text"), expectedItems = 100L)
    val kept = Dedup.dedupAgainstBloom(incoming, hostile, Seq("text"), bloom)
      .select("id").as[Long].collect().toSet
    val exact = Dedup.dedupAgainst(incoming, hostile, Seq("text"))
      .select("id").as[Long].collect().toSet
    assert(kept == exact && kept == Set(23L))
  }

  test("saltedJoin survives null keys and null payloads, same as plain join") {
    val left = Seq(
      (1L, Some("a")), (2L, Option.empty[String]), (3L, Some("b")),
      (4L, Some("a"))).toDF("lv", "key")
    val right = Seq(
      (10L, Some("a")), (11L, Option.empty[String]), (12L, Some("c")))
      .toDF("rv", "key")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("key"), jt).collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = Joins.saltedJoin(left, right, Seq("key"), 4, jt).collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      // null keys never equi-match — identically on both paths
      assert(salted == plain, s"null-key multiset mismatch for $jt")
    }
  }

  test("text analysis columns are total functions over hostile text") {
    val out = hostile
      .withColumn("tok_n", F.tokenCount(col("text")))
      .withColumn("sub_n", F.subwordCount(col("text")))
      .select("id", "tok_n", "sub_n")
      .as[(Long, Int, Int)].collect()
      .map { case (id, t, s) => id -> ((t, s)) }.toMap
    assert(out(1L) == ((0, 0))) // NULL → zeros, not NULL poison
    assert(out(3L)._1 == 0)
    assert(out(5L)._1 == 2)     // "ab" + "c" under the RE2 class
    assert(out(6L)._1 == 1)     // CJK run = one whitespace token
    assert(out(8L)._1 == 5000)
    val rep = TextAnalysis.repetitionFeatures(col("text"))
      .foldLeft(hostile) { case (df, (n, c)) => df.withColumn(n, c) }
    assert(rep.count() == 9)    // no crash on NULL/short/degenerate
    assert(rep.filter(col("tok_n").isNull).count() == 0)
  }
}
