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
}
