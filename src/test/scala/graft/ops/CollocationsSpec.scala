package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TextAnalysis.collocations]] against hand-computed PMI values and
  * [[TextAnalysis.vocabCoverage]] against hand counts.
  *
  * PMI fixture: docs "a b a b a b" and "a c".
  * Tokens: a×4, b×3, c×1 → T = 8. Pairs: (a,b)×3, (b,a)×2, (a,c)×1
  * → B = 6.
  *   pmi(a,b) = ln(3/6) − ln(4/8) − ln(3/8) = −ln(0.375) ≈ 0.9808
  *   pmi(b,a) = ln(2/6) − ln(3/8) − ln(4/8)              ≈ 0.5754
  *   pmi(a,c) = ln(1/6) − ln(4/8) − ln(1/8)              ≈ 0.9808
  * (a,b) and (a,c) tie after rounding; (w1, w2) breaks it.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("zipfCard: hand-computed two-point fit, tie ranks, guards") {
    // counts a=4, b=2, c=1; minCount=2 fits (r=1, f=4), (r=2, f=2):
    //   slope = (ln2 − ln4)/(ln2 − ln1) = −1, intercept = ln4 ≈ 1.3863
    val df = Seq("a a a a", "b b c").toDF("text")
    val row = TextAnalysis.zipfCard(df, "text", minCount = 2L)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(row == ((3L, 2L, 7L, -1.0, 1.3863)))
    // constant frequencies → slope exactly 0, intercept ln f
    val flat = Seq("a a b b c c", null: String).toDF("text")
    val r2 = TextAnalysis.zipfCard(flat, "text", minCount = 2L)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r2 == ((3L, 3L, 6L, 0.0, 0.6931)))
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfCard(df, "text", minCount = 0L)
    }
  }

  private def corpus = Seq("a b a b a b", "a c", null: String).toDF("text")

  test("hand-computed PMI values, deterministic tie order") {
    val out = TextAnalysis.collocations(corpus, "text",
        minCount = 1L, topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 3L, 0.9808),
      ("a", "c", 1L, 0.9808),
      ("b", "a", 2L, 0.5754)))
  }

  test("minCount filters pairs; topK cuts after the total order") {
    val two = TextAnalysis.collocations(corpus, "text",
        minCount = 2L, topK = 10)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(two == Seq(("a", "b"), ("b", "a")))
    val one = TextAnalysis.collocations(corpus, "text",
        minCount = 1L, topK = 1)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(one == Seq(("a", "b"))) // the tie at 0.9808 resolves by w2
  }

  test("single-token and null docs contribute no pairs") {
    val out = TextAnalysis.collocations(
      Seq("solo", null: String, "x y").toDF("text"), "text",
      minCount = 1L, topK = 10)
    assert(out.count() == 1)
    assert(out.select("w1", "w2").as[(String, String)].head() == ("x", "y"))
  }

  test("collocations guards") {
    intercept[IllegalArgumentException] {
      TextAnalysis.collocations(corpus, "text", minCount = 0L)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.collocations(corpus, "text", topK = 0)
    }
  }

  test("vocabCoverage: hand counts, OOV distincts, null-text group") {
    val df = Seq(
      ("s1", "the table scan xx"), // 4 tokens, 1 oov (xx)
      ("s1", "xx yy the"),         // 3 tokens, 2 oov (xx, yy)
      ("s2", null: String)         // 0 tokens
    ).toDF("source", "text")
    val out = TextAnalysis.vocabCoverage(df, "source", "text",
        Seq("the", "table", "scan"))
      .orderBy("source")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("s1", 7L, 3L, 0.4286, 2L), // distinct oov = {xx, yy}
      ("s2", 0L, 0L, 0.0, 0L)))
  }

  test("vocabCoverage guards empty vocab") {
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(corpus.withColumn("g", lit("x")),
        "g", "text", Nil)
    }
  }
}
