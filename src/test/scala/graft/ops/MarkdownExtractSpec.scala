package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial pinning of the markdown→text cascade: every rule with
  * known inputs, plus the documented fidelity limits. Same contract
  * style as HtmlExtractSpec; the t19 DuckDB oracle replays the
  * identical step order.
  */
class MarkdownExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(md: String): String =
    Seq(md).toDF("m")
      .select(TextAnalysis.markdownToText(col("m")).as("t"))
      .collect().head.getString(0)

  test("headers keep text, drop the # prefix at any level") {
    assert(extract("# one\n## two\n###### six") == "one\ntwo\nsix")
    assert(extract("  ## indented header") == "indented header")
    assert(extract("not # a header") == "not # a header") // mid-line # stays
  }

  test("links and images resolve to their text/alt") {
    assert(extract("go [home](http://x/y?a=1) now") == "go home now")
    assert(extract("see ![alt words](img.png) here") == "see alt words here")
    assert(extract("ref [text][label] style") == "ref text style")
    assert(extract("[empty]() [also][]") == "empty also")
    // image before link order: ![a](u) must not leave "!a"
    assert(extract("![a](u)") == "a")
  }

  test("reference definitions drop whole-line") {
    assert(extract("body\n[r1]: http://ref\nmore") == "body\nmore")
  }

  test("fence markers drop, fenced code content stays") {
    assert(extract("```scala\nval x = 1\n```\nafter") == "val x = 1\nafter")
    assert(extract("~~~\ncode\n~~~") == "code")
    // consecutive fences (empty block)
    assert(extract("```\n```\ntail") == "tail")
  }

  test("lists and blockquotes keep content, drop markers") {
    assert(extract("- a\n- b\n* c\n+ d") == "a\nb\nc\nd")
    assert(extract("1. one\n12. twelve\n3) three") == "one\ntwelve\nthree")
    assert(extract("> quoted\n> > nested deep") == "quoted\nnested deep")
    // an unordered marker needs trailing space: "-5 degrees" is prose
    assert(extract("-5 degrees") == "-5 degrees")
    assert(extract("*emph* not a list") == "emph not a list")
  }

  test("tables: separator row drops, cell pipes become spaces") {
    assert(extract("| a | b |\n|---|---|\n| 1 | 2 |") == "a b\n1 2")
    assert(extract("col1|col2\n---|---\nv1|v2") == "col1 col2\nv1 v2")
  }

  test("horizontal rules and setext underlines drop, runs too") {
    assert(extract("above\n---\nbelow") == "above\nbelow")
    assert(extract("t\n===\nrest") == "t\nrest")
    assert(extract("a\n***\n___\nb") == "a\nb") // consecutive hr lines
  }

  test("emphasis family strips; single underscore survives (snake_case)") {
    assert(extract("*i* **b** ***bi*** ~~s~~ __u__") == "i b bi s u")
    assert(extract("keep snake_case and _this too") == "keep snake_case and _this too")
    assert(extract("`inline code` stays") == "inline code stays")
  }

  test("inline HTML and comments strip; bare angle prose survives") {
    assert(extract("a <span>x</span> b <!-- gone --> c") == "a x b c")
    assert(extract("5 < 6 and 7 > 4") == "5 < 6 and 7 > 4")
    assert(extract("unclosed <b tag stays literal") == "unclosed <b tag stays literal")
  }

  test("entities decode after stripping; double-encoding stays literal") {
    assert(extract("5 &lt; 6 &amp;&amp; &quot;q&quot;") == "5 < 6 && \"q\"")
    assert(extract("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
  }

  test("null and empty are empty; whitespace collapses") {
    val out = Seq[(Long, String)]((1L, null), (2L, ""), (3L, "  \n\n\n  x  "))
      .toDF("id", "m")
      .select(col("id"), TextAnalysis.markdownToText(col("m")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "x")
  }

  test("kitchen-sink document composes all rules") {
    val md =
      """# Doc &amp; title
        |intro [link](http://a) and ![img](http://b) text
        |> wisdom
        |- li one
        |
        |```py
        |x = [1, 2]
        |```
        |tail""".stripMargin
    assert(extract(md) ==
      "Doc & title\nintro link and img text\nwisdom\nli one\n\nx = [1, 2]\ntail")
  }
}
