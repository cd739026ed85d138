package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-substring dedup ([[Dedup.exactSubstrDedup]]): the suffix-array
  * removal semantics of Lee et al. 2022 recomputed from repeated
  * fixed-width windows. Each case hand-derives what the suffix array
  * would remove, then checks the operator matches.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def toks(p: String, n: Int): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  private def run(rows: Seq[(Long, String)], minLen: Int) =
    Dedup.exactSubstrDedup(rows.toDF("id", "text"), "id", "text", minLen)
      .orderBy("id")
      .select("id", "text_clean", "n_tokens", "n_removed_tokens", "n_dup_spans")
      .as[(Long, String, Long, Long, Long)].collect()

  test("shared block >= minLen is removed from every occurrence") {
    val shared = toks("s", 10)
    val rows = Seq(
      (1L, s"${toks("a", 5)} $shared ${toks("b", 5)}"),
      (2L, s"${toks("c", 3)} $shared"))
    val out = run(rows, minLen = 8)
    assert(out(0) == ((1L, s"${toks("a", 5)} ${toks("b", 5)}", 20L, 10L, 1L)))
    assert(out(1) == ((2L, toks("c", 3), 13L, 10L, 1L)))
  }

  test("block one token below minLen is untouched") {
    val shared = toks("s", 7)
    val rows = Seq(
      (1L, s"${toks("a", 5)} $shared"),
      (2L, s"${toks("b", 5)} $shared"))
    val out = run(rows, minLen = 8)
    assert(out.forall(r => r._4 == 0L && r._5 == 0L))
    assert(out(0)._2 == s"${toks("a", 5)} $shared")
  }

  test("self-repetition within one document removes both copies") {
    val block = toks("v", 9)
    val rows = Seq((1L, s"$block ${toks("h", 4)} $block"))
    val out = run(rows, minLen = 8)
    assert(out(0) == ((1L, toks("h", 4), 22L, 18L, 2L)))
  }

  test("adjacent repeated blocks merge into one removed span") {
    val s1 = toks("s", 8)
    val s2 = toks("t", 8)
    val rows = Seq(
      (1L, s"${toks("a", 3)} $s1 $s2 ${toks("b", 3)}"),
      (2L, s"${toks("c", 3)} $s1"),   // partner for s1
      (3L, s"$s2 ${toks("d", 3)}"))   // partner for s2
    val out = run(rows, minLen = 8)
    // doc 1: coverage [3,10] ++ [11,18] — contiguous → ONE span of 16
    assert(out(0) == ((1L, s"${toks("a", 3)} ${toks("b", 3)}", 22L, 16L, 1L)))
  }

  test("whole-document duplicates clean to empty text") {
    val body = toks("p", 12)
    val out = run(Seq((1L, body), (2L, body)), minLen = 8)
    assert(out.toSeq == Seq(
      (1L, "", 12L, 12L, 1L), (2L, "", 12L, 12L, 1L)))
  }

  test("short, empty, and null-ish docs pass through untouched") {
    val out = run(Seq(
      (1L, toks("x", 5)),   // shorter than minLen
      (2L, ""),
      (3L, "   ")), minLen = 8)
    assert(out.toSeq == Seq(
      (1L, toks("x", 5), 5L, 0L, 0L),
      (2L, "", 0L, 0L, 0L),
      (3L, "", 0L, 0L, 0L)))
  }

  test("overlapping occurrences: a long run repeated with offset") {
    // doc1 = w0..w19; doc2 = w5..w19 ++ z — the shared run w5..w19 is
    // 15 tokens >= 8: doc1 keeps w0..w4, doc2 keeps z only.
    val w = (0 until 20).map(i => s"w$i")
    val rows = Seq(
      (1L, w.mkString(" ")),
      (2L, (w.drop(5) :+ "z").mkString(" ")))
    val out = run(rows, minLen = 8)
    assert(out(0) == ((1L, w.take(5).mkString(" "), 20L, 15L, 1L)))
    assert(out(1) == ((2L, "z", 16L, 15L, 1L)))
  }

  test("agreement with duplicatedSpanStats: dup windows <=> removal") {
    // On any corpus, d18's n_dup_windows(window = L) > 0 iff d19's
    // n_removed_tokens(minLen = L) > 0 for the same document — both
    // are driven by the same repeated-L-window set (the coverage
    // lemma); d18 only counts where d19 removes.
    val shared = toks("s", 9)
    val rows = Seq(
      (1L, s"${toks("a", 6)} $shared"),
      (2L, s"$shared ${toks("b", 6)}"),
      (3L, toks("q", 15)),
      (4L, toks("r", 3)))
    val df = rows.toDF("id", "text")
    val L = 8
    val d18 = Dedup.duplicatedSpanStats(df, "id", "text", window = L)
      .select("id", "n_dup_windows").as[(Long, Long)].collect().toMap
    val d19 = Dedup.exactSubstrDedup(df, "id", "text", minLen = L)
      .select("id", "n_removed_tokens").as[(Long, Long)].collect().toMap
    for (id <- d19.keys) {
      val dupWins = d18.getOrElse(id, 0L)
      assert((dupWins > 0) == (d19(id) > 0),
        s"doc $id: d18 dup windows $dupWins vs d19 removed ${d19(id)}")
    }
  }

  test("guards: minLen >= 2; reserved output names") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrDedup(df, "id", "text", minLen = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrDedup(
        Seq((1L, "a b")).toDF("text_clean", "text"),
        "text_clean", "text", minLen = 2)
    }
  }
}
