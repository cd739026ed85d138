package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TextAnalysis.splitSentences]] against hand-segmented fixtures —
  * every expected array derived on paper from the step table's rules.
  */
class SentenceSplitSpec extends SparkSpec {
  import spark.implicits._

  private def seg(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(TextAnalysis.splitSentences(col("t")).as("l"))
      .as[Seq[String]].head()

  test("plain terminators split; terminator stays with its sentence") {
    assert(seg("One. Two! Three? Four") ==
      Seq("One.", "Two!", "Three?", "Four"))
  }

  test("abbreviations, initials and decimals do not split") {
    assert(seg("Dr. Smith met J. Doe at 3.14 after 5 p.m. today. Next.") ==
      Seq("Dr. Smith met J. Doe at 3.14 after 5 p.m. today.", "Next."))
    assert(seg("See e.g. the fig. 3 example, i.e. this. Done.") ==
      Seq("See e.g. the fig. 3 example, i.e. this.", "Done."))
    assert(seg("Approx. 2.5 units vs. 3.0 here. Tail.") ==
      Seq("Approx. 2.5 units vs. 3.0 here.", "Tail."))
  }

  test("closing quotes and brackets ride with the terminator") {
    assert(seg("He said “Really?” Then left.") ==
      Seq("He said “Really?”", "Then left."))
    assert(seg("(Wait.) Go.") == Seq("(Wait.)", "Go."))
  }

  test("ellipsis runs are one boundary") {
    assert(seg("Well... maybe not. Yes") ==
      Seq("Well...", "maybe not.", "Yes"))
  }

  test("newlines are unconditional boundaries") {
    assert(seg("no terminator here\nsecond line. third.") ==
      Seq("no terminator here", "second line.", "third."))
    assert(seg("a\r\nb") == Seq("a", "b"))
  }

  test("sentence-internal dots never leak sentinels; NULL and empty are safe") {
    val out = seg("v2.1 shipped e.g. today. Next.")
    assert(out == Seq("v2.1 shipped e.g. today.", "Next."))
    assert(out.forall(s => !s.contains('\u0001') && !s.contains('\u0002')))
    assert(seg("") == Seq.empty)
    val n = Seq((1, null: String)).toDF("i", "t")
      .select(TextAnalysis.splitSentences(col("t")).as("l"))
      .as[Seq[String]].head()
    assert(n == Seq.empty)
  }

  test("terminator at end of text closes the last sentence") {
    assert(seg("Only one sentence.") == Seq("Only one sentence."))
    assert(seg("Two here. And this one ends too!") ==
      Seq("Two here.", "And this one ends too!"))
  }

  test("readability: hand-computed syllables and scores") {
    // "The cake sat. Nice table here!" → S=2, W=6
    // syllables: The 1 (silent e), cake 1, sat 1, Nice 1 (punct
    // stripped, silent e), table 2 (-le keeps its e), here 1 → Y=7
    val out = TextAnalysis.readability(
        Seq((1L, "The cake sat. Nice table here!"),
          (2L, ""), (3L, null: String)).toDF("doc_id", "t"),
        "doc_id", "t")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    val (_, s1, w1, y1, ease, fk) = out.head match {
      case (id, a, b, c, d, e) => (id, a, b, c, d, e)
    }
    assert((s1, w1, y1) == ((2L, 6L, 7L)))
    // ease = 206.835 − 1.015·3 − 84.6·(7/6) = 105.09
    assert(math.abs(ease.get - 105.09) < 1e-9)
    // fk = 0.39·3 + 11.8·(7/6) − 15.59 = −0.6533 (4 dp)
    assert(math.abs(fk.get - (-0.6533)) < 1e-9)
    // empty and null docs: zero counts, NULL scores
    assert(out(1) == ((2L, 0L, 0L, 0L, None, None)))
    assert(out(2) == ((3L, 0L, 0L, 0L, None, None)))
  }

  test("chunkBySentences: greedy fill, over-long sentence isolated") {
    // sentences of 4 / 3 / 2 / 9 / 1 tokens, cap 7:
    //   chunk 0 = s1+s2 (7), chunk 1 = s3 (2: s4 would overflow),
    //   chunk 2 = s4 alone (9 > cap, never split), chunk 3 = s5
    val doc = "one two three four. five six seven. eight nine. " +
      "ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen. End"
    val out = TextAnalysis.chunkBySentences(
        Seq((1L, doc)).toDF("doc_id", "t"), "doc_id", "t", maxTokens = 7)
      .orderBy("chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "one two three four. five six seven.", 7),
      (1L, 1, "eight nine.", 2),
      (1L, 2, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen.", 9),
      (1L, 3, "End", 1)))
    // empty / null docs yield no chunks; cap must be positive
    val none = TextAnalysis.chunkBySentences(
      Seq((1L, ""), (2L, null: String)).toDF("doc_id", "t"),
      "doc_id", "t", maxTokens = 5)
    assert(none.count() == 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkBySentences(
        Seq((1L, "x")).toDF("doc_id", "t"), "doc_id", "t", 0)
    }
  }
}
