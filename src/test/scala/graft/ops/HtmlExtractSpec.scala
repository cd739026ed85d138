package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial pinning of the HTML→text cascade: nested/malformed
  * markup, entity torture (incl. double-encoding), CDATA, and the
  * link-density boilerplate rule. Each case documents the DEFINED
  * semantics — the same ones the t13 DuckDB oracle replicates.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(TextAnalysis.htmlToText(col("h")).as("t"))
      .collect().head.getString(0)

  private def extractBp(html: String, t: Double = 0.5): String =
    Seq(html).toDF("h")
      .select(TextAnalysis.stripBoilerplateLines(col("h"), t).as("t"))
      .collect().head.getString(0)

  test("basic structure: block tags become newlines, inline tags a space") {
    assert(extract("<p>one</p><p>two</p>") == "one\ntwo")
    assert(extract("<h2>head</h2><div>body <b>bold</b> tail</div>") ==
      "head\nbody bold tail")
    assert(extract("line<br>break<br/>again") == "line\nbreak\nagain")
  }

  test("script/style/comment blocks drop whole, even with '>' inside") {
    assert(extract("<style>p{x:1} .a>b{y:2}</style>kept") == "kept")
    assert(extract("<script>if(a<b&&c>d){e();}</script>kept") == "kept")
    assert(extract("a<!-- multi\nline\ncomment -->b") == "a b")
    // case-insensitive, attributes on the opening tag
    assert(extract("<SCRIPT type=\"text/javascript\">x</SCRIPT>y") == "y")
  }

  test("entity decoding: named set, &amp; last so &amp;lt; stays literal text") {
    assert(extract("<p>5 &lt; 6 &amp;&amp; 7 &gt; 4</p>") == "5 < 6 && 7 > 4")
    assert(extract("<p>&quot;q&quot; &#39;s&#39;&nbsp;end</p>") == "\"q\" 's' end")
    // double-encoded: must render as the text "&lt;tag&gt;", never <tag>
    assert(extract("<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;")
    // entity-encoded markup is TEXT — never stripped as a tag
    assert(extract("&lt;script&gt;evil()&lt;/script&gt;") ==
      "<script>evil()</script>")
  }

  test("malformed markup: defined, deterministic semantics") {
    // unclosed trailing tag with no '>': stays literal text
    assert(extract("text <b unclosed") == "text <b unclosed")
    // '<' swallows through the NEXT '>' (one pseudo-tag)
    assert(extract("a <b attr < still-tag> b") == "a b")
    // CDATA with no '>' inside parses as one pseudo-tag and drops whole
    assert(extract("a <![CDATA[raw text]]> b") == "a b")
    // nested same-tag: each closing tag is its own line break
    assert(extract("<div>outer <div>inner</div> tail</div>") ==
      "outer inner\ntail")
  }

  test("whitespace normalization: runs collapse, ≤ one blank line, trimmed ends") {
    assert(extract("<p>  a   b\t c </p>\n\n\n\n<p>d</p>") == "a b c\n\nd")
    assert(extract("<p></p><p></p><p>x</p><p></p>") == "x")
    assert(extract("") == "")
    assert(extract("<p>   </p>") == "")
  }

  test("null html extracts to empty, not null") {
    val r = Seq((1L, null: String)).toDF("id", "h")
      .select(TextAnalysis.htmlToText(col("h")).as("t"))
      .collect().head
    assert(r.getString(0) == "")
  }

  test("link-density rule: nav lines drop, anchors in prose survive") {
    val html =
      "<p>real content paragraph with plenty of prose</p>" +
        "<div><a href=\"/h\">Home</a> | <a href=\"/a\">About</a> | <a href=\"/c\">Contact</a></div>" +
        "<div>see <a href=\"/r\">this reference</a> inside a longer ordinary sentence</div>"
    val bp = extractBp(html)
    assert(bp.contains("real content paragraph"))
    assert(!bp.contains("Home"), s"nav line should drop, got: $bp")
    assert(bp.contains("this reference inside a longer ordinary sentence"))
    // the plain extractor keeps everything
    assert(extract(html).contains("Home | About | Contact"))
  }

  test("link-density threshold boundary: a ≤ n·t keeps, above drops") {
    // anchor "aaaa" (4 chars) in a line of 8 non-space chars → density .5
    val half = "<div><a href=\"/x\">aaaa</a> bbbb</div>"
    assert(extractBp(half, 0.5) == "aaaa bbbb") // exactly at t: kept
    assert(extractBp(half, 0.49) == "")         // just below: dropped
    // anchors spanning inline markup count their visible chars only
    // (inline tags render as a space, so "aa</b>aa" reads "aa aa")
    val markup = "<div><a href=\"/x\"><b>aa</b>aa</a> bbbb</div>"
    assert(extractBp(markup, 0.5) == "aa aa bbbb")
  }

  test("empty-line and all-anchor lines always drop under the bp rule") {
    assert(extractBp("<div><a href=\"/x\">only links</a></div>") == "")
    assert(extractBp("<p></p><p>x</p>") == "x")
  }

  test("threshold guard rejects nonsense") {
    intercept[IllegalArgumentException](
      extractBp("<p>x</p>", 0.0))
    intercept[IllegalArgumentException](
      extractBp("<p>x</p>", 1.5))
  }

  test("robots meta: both attribute orders, whole-token probes, absent tag") {
    import spark.implicits._
    import graft.ops.TextAnalysis._
    val rows = Seq(
      (1L, "<html><head><meta name='robots' content='noindex, nofollow'></head><body>x"),
      (2L, "<html><head><meta content=\"NOFOLLOW\" name=\"robots\"></head><body>x"),
      (3L, "<html><head><meta name='robots' content='noindexing'></head><body>x"),
      (4L, "<html><body>x</body></html>"),
      (5L, null),
      (6L, "<html><head><meta name=robots content=noindex></head><body>x"),
      (7L, "<html><head><meta name='robots' content='none'></head><body>x"),
      (8L, "<html><head><meta data-name='robots' content='noindex'></head><body>x"),
      (9L, "<html><head><meta name='robots' content='noindex,\nnofollow'></head><body>x"))
      .toDF("id", "html")
    val out = rows.select($"id",
        metaRobotsContent($"html").as("d"),
        robotsNoindex($"html").as("ni"),
        robotsNofollow($"html").as("nf"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(1L) == (("noindex, nofollow", true, true)))
    assert(out(2L) == (("nofollow", false, true)))
    // substring 'noindexing' must NOT count as the noindex directive
    assert(out(3L) == (("noindexing", false, false)))
    assert(out(4L) == (("", false, false)))
    assert(out(5L) == (("", false, false)))
    // unquoted attribute values are legal HTML5
    assert(out(6L) == (("noindex", true, false)))
    // 'none' is the spec equivalent of 'noindex, nofollow'
    assert(out(7L) == (("none", true, true)))
    // data-name is NOT a robots declaration
    assert(out(8L) == (("", false, false)))
    // whitespace other than space still separates directives
    assert(out(9L) == (("noindex,\nnofollow", true, true)))
  }
}
