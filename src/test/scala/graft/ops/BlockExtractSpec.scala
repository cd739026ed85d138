package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-level boilerplate extraction ([[TextAnalysis.htmlBlockFeatures]]
  * / [[TextAnalysis.extractMainContent]]): boilerpipe's
  * NumWordsRulesClassifier thresholds exercised branch by branch on
  * hand-built pages.
  */
class BlockExtractSpec extends SparkSpec {
  import spark.implicits._

  private def words(p: String, n: Int): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  private def extract(html: String): String =
    Seq(html).toDF("html")
      .select(TextAnalysis.extractMainContent(col("html")).as("t"))
      .as[String].head()

  private def features(html: String): Seq[(String, Int, Double)] =
    Seq(html).toDF("html")
      .select(TextAnalysis.htmlBlockFeatures(col("html")).as("b"))
      .selectExpr("inline(b)")
      .as[(String, Int, Double)].collect().toSeq

  test("htmlBlockFeatures: segmentation at open AND close block tags") {
    val f = features("<div><p>one two</p><p>three</p></div>")
    assert(f.map(_._1) == Seq("one two", "three"))
    assert(f.map(_._2) == Seq(2, 1))
  }

  test("htmlBlockFeatures: source newlines are whitespace, not boundaries") {
    val f = features("<p>alpha\nbeta\ngamma</p>")
    assert(f == Seq(("alpha beta gamma", 3, 0.0)))
  }

  test("htmlBlockFeatures: link density measured on non-space chars") {
    // block: 'Home About' all inside anchors → density 1.0;
    // mixed block: anchors 'ab' (2 chars) of 'ab plus text here' (14)
    val f = features(
      """<div><a href="/">Home</a> <a href="/a">About</a></div>
        |<p><a href="/x">ab</a> plus text here</p>""".stripMargin)
    assert(f(0)._3 == 1.0)
    assert(f(1)._1 == "ab plus text here")
    assert(math.abs(f(1)._3 - 2.0 / 14.0) < 1e-9)
  }

  test("htmlBlockFeatures: scripts, styles, comments vanish; entities decode") {
    val f = features(
      "<p>a &amp; b</p><script>var x = '<p>no</p>';</script><style>p{x:y}</style><!-- c -->")
    assert(f == Seq(("a & b", 3, 0.0)))
  }

  test("classifier: long low-density paragraph is content") {
    assert(extract(s"<p>${words("w", 20)}</p>") == words("w", 20))
  }

  test("classifier: nav link bar (density > 1/3) is dropped") {
    // Two paragraphs: the dense nav (prev.ld > 0.555556) puts the
    // first into the 40/17 branch, rescued by next.words = 20 > 17;
    // the second passes via prev.words > 4. The nav itself fails the
    // density gate outright.
    val html =
      s"""<nav><a href="/">Home</a> <a href="/b">Blog</a> <a href="/c">Contact</a></nav>
         |<p>${words("m", 30)}</p><p>${words("n", 20)}</p>""".stripMargin
    assert(extract(html) == s"${words("m", 30)}\n${words("n", 20)}")
  }

  test("classifier: headline before a long paragraph is KEPT (paper behavior)") {
    val html = s"<h1>Big News Today</h1><p>${words("m", 25)}</p>"
    assert(extract(html) == s"Big News Today\n${words("m", 25)}")
  }

  test("classifier: isolated short block is dropped (all three word gates fail)") {
    // curr 3 <= 16, no neighbors → next 0 <= 15, prev 0 <= 4
    assert(extract("<p>just three words</p>") == "")
  }

  test("classifier: short block after content survives via prev.words > 4") {
    val html = s"<p>${words("m", 20)}</p><p>short trailing note</p>"
    assert(extract(html) == s"${words("m", 20)}\nshort trailing note")
  }

  test("classifier: after a dense block, the 40/17 branch applies") {
    // prev = link bar with density 1.0 > 0.555556; curr 20 words
    // (<= 40), next absent (0 <= 17) → DROPPED despite being > 16.
    val bar =
      """<div><a href="/a">alpha beta</a> <a href="/b">gamma delta</a></div>"""
    assert(extract(s"$bar<p>${words("m", 20)}</p>") == "")
    // curr 41 words > 40 → kept even after the dense block
    assert(extract(s"$bar<p>${words("m", 41)}</p>") == words("m", 41))
  }

  test("classifier: sidebar link list and footer chrome dropped around article") {
    val html =
      s"""<header><a href="/">Site</a> <a href="/about">About</a></header>
         |<aside><ul><li><a href="/1">One</a></li><li><a href="/2">Two</a></li></ul></aside>
         |<article><p>${words("a", 22)}</p><p>${words("b", 19)}</p></article>
         |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>""".stripMargin
    assert(extract(html) == s"${words("a", 22)}\n${words("b", 19)}")
  }

  test("terminating blocks: short copyright/comments lines never content") {
    val html =
      s"<p>${words("m", 20)}</p><p>Copyright 2026 Example Corp</p><p>Comments</p>"
    // both trailers would pass via prev.words > 4 without the rule
    assert(extract(html) == words("m", 20))
    // a LONG block starting with 'Copyright' is not a terminator (>= 15 words)
    val long = s"Copyright ${words("c", 15)}"
    assert(extract(s"<p>${words("m", 20)}</p><p>$long</p>")
      == s"${words("m", 20)}\n$long")
  }

  test("boundary: exactly 16 words is not content alone; 17 is") {
    assert(extract(s"<p>${words("w", 16)}</p>") == "")
    assert(extract(s"<p>${words("w", 17)}</p>") == words("w", 17))
  }

  test("empty / null / tagless inputs") {
    assert(extract("") == "")
    assert(extract("<div></div><p>  </p>") == "")
    assert(Seq(Option.empty[String]).toDF("html")
      .select(TextAnalysis.extractMainContent(col("html")).as("t"))
      .as[String].head() == "")
    // bare text with no tags at all is one block
    assert(extract(words("t", 18)) == words("t", 18))
  }
}
