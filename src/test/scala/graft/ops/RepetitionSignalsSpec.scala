package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.RepetitionSignals.{compute, GopherThresholds}

class RepetitionSignalsSpec extends SparkSpec {

  test("null/empty/whitespace text measures as all-zero signals") {
    for (t <- Seq(null, "", "   ", "\n\n\n")) {
      val s = compute(t)
      assert(RepetitionSignals.signalNames
        .map(n => s.productElement(RepetitionSignals.signalNames.indexOf(n)))
        .forall(_ == 0.0), s"non-zero signal for ${Option(t)}")
    }
  }

  test("duplicate line fraction and char fraction — hand-derived") {
    // lines: [x, x, yy] → 1 of 3 is a repeat; chars: x-group contributes
    // 1 duplicate char of 4 total line chars.
    val s = compute("x\nx\nyy")
    assert(s.dup_line_frac == 1.0 / 3)
    assert(s.dup_line_char_frac == 1.0 / 4)
    // no paragraph breaks → one paragraph, nothing duplicated
    assert(s.dup_para_frac == 0.0 && s.dup_para_char_frac == 0.0)
  }

  test("duplicate paragraph fractions split on blank-line runs") {
    // paragraphs: [p1, p1, p2] (the \n\n\n run is ONE separator)
    val s = compute("p1\n\np1\n\n\np2")
    assert(s.dup_para_frac == 1.0 / 3)
    assert(s.dup_para_char_frac == 2.0 / 6)
    // line view: [p1, p1, p2] too (empty lines dropped)
    assert(s.dup_line_frac == 1.0 / 3)
  }

  test("top 2-gram char fraction counts the most frequent word pair") {
    // tokens [a b a b]: "a b" occurs twice (chars 2), total chars 4
    val s = compute("a b a b")
    assert(s.top_2gram_char_frac == 2.0 * 2 / 4)
    // "a b a" occurs once only → top-3 signal is 0 (nothing repeats)
    assert(s.top_3gram_char_frac == 0.0)
  }

  test("top-gram tie breaks by longer gram") {
    // "aa bb" ×2 and "c d" ×2 both count 2; the aa-bb gram has 4 chars
    // → fraction uses (2 · 4) / total
    val s = compute("aa bb c d aa bb c d")
    val tot = 2 * (2 + 2 + 1 + 1)
    assert(s.top_2gram_char_frac == 2.0 * 4 / tot)
  }

  test("dup 5-gram coverage is a union of token positions") {
    // tokens: a b c d e a b c d e x — "a b c d e" repeats, covering
    // positions 0–9 of 11; token chars are all 1.
    val s = compute("a b c d e a b c d e x")
    assert(s.dup_5gram_char_frac == 10.0 / 11)
    // overlapping repeats don't double-count: all-same-token text is
    // fully covered, never >1
    val t = compute(Seq.fill(12)("z").mkString(" "))
    assert(t.dup_5gram_char_frac == 1.0)
    assert(t.dup_10gram_char_frac == 1.0)
  }

  test("char counts are code points, not UTF-16 units") {
    // U+1F600 is 2 UTF-16 chars but 1 code point; lines [😀, 😀]
    val s = compute("😀\n😀")
    assert(s.dup_line_frac == 0.5)
    assert(s.dup_line_char_frac == 0.5)
  }

  test("short texts yield zero n-gram signals, no crash") {
    val s = compute("only four tokens here")
    assert(s.dup_5gram_char_frac == 0.0)
    assert(s.dup_10gram_char_frac == 0.0)
    assert(s.top_4gram_char_frac == 0.0)
  }

  test("withSignals appends the thirteen columns and rejects collisions") {
    import spark.implicits._
    val df = Seq((1L, "x\nx\nyy"), (2L, null)).toDF("id", "text")
    val out = RepetitionSignals.withSignals(df, "text")
    assert(out.columns.toSeq ==
      Seq("id", "text") ++ RepetitionSignals.signalNames)
    val r = out.filter($"id" === 1).select("dup_line_frac").head.getDouble(0)
    assert(r == 1.0 / 3)
    // NULL text row: all zeros (never NULL)
    val z = out.filter($"id" === 2)
      .select(RepetitionSignals.signalNames.map(col): _*).head
    assert((0 until 13).forall(i => z.getDouble(i) == 0.0))
    intercept[IllegalArgumentException] {
      RepetitionSignals.withSignals(
        df.withColumn("dup_line_frac", lit(0.0)), "text")
    }
  }

  test("gopherFilter: clean prose passes, degenerate repetition fails") {
    import spark.implicits._
    // 60 words, mean length in [3,10], has >=2 stopwords, no bullets,
    // no repetition anywhere near the thresholds.
    val clean = (1 to 60).map(i => s"word$i")
      .updated(0, "the").updated(1, "have").updated(2, "with")
      .mkString(" ")
    // same length but one 5-gram repeated wall-to-wall
    val repeated = Seq.fill(12)("the have with alpha beta").mkString(" ")
    val df = Seq((1L, clean), (2L, repeated), (3L, "too short"))
      .toDF("id", "text")
    val out = RepetitionSignals.gopherFilter(df, "text")
      .select("id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(out(1L))
    assert(!out(2L)) // dup 5-gram coverage ≈ 1 ≫ 0.15
    assert(!out(3L)) // word count < 50
  }

  test("gopherFilter exposes rule inputs for per-rule logging") {
    import spark.implicits._
    val df = Seq((1L, "The quick brown fox")).toDF("id", "text")
    val out = RepetitionSignals.gopherFilter(df, "text")
    for (c <- Seq("tok_n", "mean_word_len", "symbol_word_ratio",
        "bullet_line_ratio", "ellipsis_line_ratio", "alpha_word_ratio",
        "stopword_hits", "gopher_pass"))
      assert(out.columns.contains(c), s"missing $c")
    val r = out.head
    // "The" is not an exact-token stopword hit (case-sensitive tokens)
    assert(r.getAs[Long]("stopword_hits") == 0L)
    assert(r.getAs[Double]("alpha_word_ratio") == 1.0)
  }

  test("custom thresholds are honored") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val loose = GopherThresholds(minWords = 1, minMeanWordLen = 0.0,
      minAlphaWordRatio = 0.0, minStopwordHits = 0)
    val out = RepetitionSignals.gopherFilter(df, "text", loose)
    assert(out.select("gopher_pass").head.getBoolean(0))
  }

  test("ruleViolationCounts: independent per-rule counts, empty-safe") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"word$i")
      .updated(0, "the").updated(1, "have").updated(2, "with")
      .mkString(" ")
    val repeated = Seq.fill(12)("the have with alpha beta").mkString(" ")
    val df = Seq((1L, clean), (2L, repeated), (3L, "too short"))
      .toDF("id", "text")
    val r = RepetitionSignals.ruleViolationCounts(df, "text").head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_pass") == 1L)
    // doc 3 fails the word-count bound; doc 2 fails every dup-n rule
    assert(r.getAs[Long]("fail_words") == 1L)
    assert(r.getAs[Long]("fail_dup_5gram") == 1L)
    assert(r.getAs[Long]("fail_dup_10gram") == 1L)
    // nothing fails the symbol rule
    assert(r.getAs[Long]("fail_symbol_ratio") == 0L)
    // empty input: one all-zero row, never NULLs
    val z = RepetitionSignals.ruleViolationCounts(
      df.filter($"id" > 99), "text").head
    assert(z.getAs[Long]("n_docs") == 0L)
    assert(z.getAs[Long]("n_pass") == 0L)
    assert(z.getAs[Long]("fail_words") == 0L)
  }

  test("gopherFilter rejects a pre-existing gopher_pass column") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val once = RepetitionSignals.gopherFilter(df, "text")
    intercept[IllegalArgumentException] {
      RepetitionSignals.gopherFilter(
        once.select("id", "text", "gopher_pass"), "text")
    }
  }

  // Unsegmented CJK prose: 12 distinct sentence-lines, no ASCII, no
  // whitespace inside a line — every English word-shape rule fails on
  // it (12 tokens < 50, mean word length ≈ 9 CJK chars but zero ASCII
  // letters and zero stopwords) while the script-invariant rules
  // (line/paragraph dup, n-gram char fracs) are clean.
  private val cjkDoc: String = (1 to 12).map { i =>
    s"这是第${i}句话完全不同的内容讲述数据处理引擎的设计思路与实现细节"
  }.mkString("\n")

  test("per-language thresholds: CJK doc passes under zh, fails under en defaults") {
    import spark.implicits._
    val english = (1 to 60).map(i => s"word$i")
      .updated(0, "the").updated(1, "have").updated(2, "with")
      .mkString(" ")
    val df = Seq((1L, "zh", cjkDoc), (2L, "en", english),
        (3L, "en", cjkDoc), (4L, null.asInstanceOf[String], cjkDoc))
      .toDF("id", "lang", "text")
    val out = RepetitionSignals.gopherFilterByLang(df, "text", "lang")
      .select("id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "CJK doc must pass under its language's thresholds")
    assert(out(2L), "clean English prose still passes the defaults")
    assert(!out(3L), "the same CJK doc fails under English-calibrated rules")
    assert(!out(4L), "null lang falls back to the default table")
    // and the monolingual path agrees with the en verdicts
    val mono = RepetitionSignals.gopherFilter(
        df.select("id", "text"), "text")
      .select("id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(mono(2L) && !mono(3L))
  }

  test("per-language thresholds: CJK dup-line repetition still fails") {
    import spark.implicits._
    val spam = Seq.fill(12)("这是完全相同的一行重复内容").mkString("\n")
    val df = Seq((1L, "zh", spam)).toDF("id", "lang", "text")
    val out = RepetitionSignals.gopherFilterByLang(df, "text", "lang")
    assert(!out.select("gopher_pass").head.getBoolean(0),
      "line-duplication rules stay active for CJK")
  }

  test("per-language thresholds reject mismatched n-gram orders") {
    import spark.implicits._
    val df = Seq((1L, "zh", cjkDoc)).toDF("id", "lang", "text")
    val bad = GopherThresholds(maxTopNgramCharFrac = Map(2 -> 0.2))
    val e = intercept[IllegalArgumentException] {
      RepetitionSignals.gopherFilterByLang(df, "text", "lang",
        byLang = Map("zh" -> bad))
    }
    assert(e.getMessage.contains("n-gram orders"))
  }
}
