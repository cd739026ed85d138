package graft.ops

import graft.SparkSpec

/** Outlink extraction ([[Links]]): RFC 3986 resolution, the anchor
  * scanner's tag/attribute edge cases, `<base href>`, nofollow, and
  * the host-edge / anchor-stats compositions.
  */
class LinksSpec extends SparkSpec {

  private val base = "http://example.com/a/b/c.html"

  test("resolve: RFC 3986 reference cases") {
    def r(h: String) = Links.resolve(base, h)
    assert(r("d.html").contains("http://example.com/a/b/d.html"))
    assert(r("./d.html").contains("http://example.com/a/b/d.html"))
    assert(r("../d.html").contains("http://example.com/a/d.html"))
    assert(r("../../d.html").contains("http://example.com/d.html"))
    assert(r("/root.html").contains("http://example.com/root.html"))
    assert(r("//other.net/p").contains("http://other.net/p"))
    assert(r("https://abs.org/q?x=1").contains("https://abs.org/q?x=1"))
    assert(r("?q=2").contains("http://example.com/a/b/c.html?q=2"))
    assert(r("d.html#frag").contains("http://example.com/a/b/d.html"))
  }

  test("resolve: empty base path gets the RFC 3986 merge slash") {
    assert(Links.resolve("http://c.net", "x.html")
      .contains("http://c.net/x.html"))
    assert(Links.resolve("http://c.net", "/y")
      .contains("http://c.net/y"))
  }

  test("resolve: dropped refs — fragments, non-http schemes, junk") {
    assert(Links.resolve(base, "#top").isEmpty)
    assert(Links.resolve(base, "javascript:void(0)").isEmpty)
    assert(Links.resolve(base, "JavaScript:alert(1)").isEmpty)
    assert(Links.resolve(base, "mailto:a@b.c").isEmpty)
    assert(Links.resolve(base, "tel:+155512").isEmpty)
    assert(Links.resolve(base, "data:text/plain,hi").isEmpty)
    assert(Links.resolve(base, "").isEmpty)
    assert(Links.resolve(base, "   ").isEmpty)
  }

  test("resolve: entity-decoded hrefs and crawl-junk encoding") {
    assert(Links.resolve(base, "/p?a=1&amp;b=2")
      .contains("http://example.com/p?a=1&b=2"))
    // raw space survives as %20 instead of a parse failure
    assert(Links.resolve(base, "/some path/x")
      .contains("http://example.com/some%20path/x"))
    // non-ASCII percent-encodes byte-wise (UTF-8)
    assert(Links.resolve(base, "/café")
      .contains("http://example.com/caf%C3%A9"))
  }

  test("extractFromHtml: attribute quoting, case, nested tags, abbr") {
    val html =
      """<ABBR>x</ABBR><p><A HREF='/one'>first <b>link</b></A></p>
        |<a href=/two rel="nofollow">two</a>
        |<a href="/three" rel="external,NOFOLLOW">three</a>
        |<a name="anchor-only">no edge</a>
        |<a href="#frag">no edge either</a>""".stripMargin
    val links = Links.extractFromHtml("http://h.io/p/q", html)
    assert(links === Seq(
      Links.Link("http://h.io/one", "first link", nofollow = false),
      Links.Link("http://h.io/two", "two", nofollow = true),
      Links.Link("http://h.io/three", "three", nofollow = true)))
  }

  test("extractFromHtml: base href re-bases later links, first wins") {
    val html =
      """<head><base target="_top"><base href="/new/"><base href="/ignored/">
        |</head><a href="x">x</a>""".stripMargin
    val links = Links.extractFromHtml("http://b.io/old/p.html", html)
    assert(links.map(_.dst) === Seq("http://b.io/new/x"))
  }

  test("extractFromHtml: unterminated anchor clamps, scan continues") {
    val html = """<a href="/z">tail stays bounded"""
    val links = Links.extractFromHtml("http://c.io", html)
    assert(links === Seq(
      Links.Link("http://c.io/z", "tail stays bounded", nofollow = false)))
    // a later well-formed link after an unterminated one is still found
    val html2 = "<a href='/u'>open " + ("y " * 800) + "<a href='/v'>v</a>"
    val l2 = Links.extractFromHtml("http://c.io", html2)
    assert(l2.map(_.dst) === Seq("http://c.io/u", "http://c.io/v"))
    assert(l2.head.anchor.length <= Links.MaxAnchorChars)
  }

  test("extractFromHtml: per-page clamp and null safety") {
    val many = (1 to 50).map(i => s"""<a href="/p$i">a</a>""").mkString
    assert(Links.extractFromHtml("http://m.io", many, maxLinks = 7).size === 7)
    assert(Links.extractFromHtml(null, "<a href='/x'>x</a>").isEmpty)
    assert(Links.extractFromHtml("http://m.io", null).isEmpty)
    assert(Links.extractFromHtml("  ", "<a href='/x'>x</a>").isEmpty)
    assert(Links.extractFromHtml("http://m.io", "").isEmpty)
  }

  test("anchor text: entities, whitespace, surrogate-safe clamp") {
    assert(Links.cleanAnchorText(" A&nbsp;&amp;\n<i>B</i> ") === "A & B")
    val long = "x" * (Links.MaxAnchorChars - 1) + "😀"
    val cleaned = Links.cleanAnchorText(long)
    assert(cleaned.length < Links.MaxAnchorChars + 1)
    assert(!Character.isHighSurrogate(cleaned.last))
  }

  test("extractLinks + hostEdges + anchorStats compose on a frame") {
    import spark.implicits._
    val pages = Seq(
      ("http://news.example.co.uk/a",
        """<a href="http://blog.other.com/x">Post</a>
          |<a href="/local">self</a>
          |<a rel="nofollow" href="http://spam.biz/y">spam</a>""".stripMargin),
      ("http://other.com/home",
        """<a href="http://news.example.co.uk/b">News</a>
          |<a href="http://blog.other.com/z">inside</a>""".stripMargin))
      .toDF("page_url", "html")
    val links = Links.extractLinks(pages, "page_url", "html")
    assert(links.count() === 5)

    // hostEdges: eTLD+1 both sides, nofollow + self-loop (other.com →
    // blog.other.com collapses to other.com → other.com) dropped
    val edges = Links.hostEdges(links, "page_url", "dst_url").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges === Set(
      ("example.co.uk", "other.com"),
      ("other.com", "example.co.uk")))

    val stats = Links.anchorStats(links, "page_url", "dst_url",
        "anchor_text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(stats("http://blog.other.com/x") === ((1L, 1L, "Post")))
    assert(stats("http://news.example.co.uk/local") === ((1L, 1L, "self")))
  }

  test("anchorStats: frequency wins, ties break to smallest text, " +
    "all-empty anchors yield null") {
    import spark.implicits._
    val links = Seq(
      ("p1", "d1", "beta"), ("p2", "d1", "beta"), ("p3", "d1", "alpha"),
      ("p1", "d2", "b"), ("p1", "d2", "a"),
      ("p1", "d3", ""), ("p2", "d3", ""))
      .toDF("src_url", "dst_url", "anchor_text")
    val out = Links.anchorStats(links, "src_url", "dst_url", "anchor_text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(out("d1") === ((3L, 3L, Some("beta"))))
    assert(out("d2") === ((2L, 1L, Some("a"))))
    assert(out("d3") === ((2L, 2L, None)))
  }

  test("frontierSchedule: per-host slots honor the crawl-delay budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val frontier = Seq(
      (1L, "https://a.example/p1", 5L),
      (2L, "https://a.example/p2", 9L),
      (3L, "https://a.example/p3", 5L),
      (4L, "https://b.example/q1", 1L),
      (5L, "not a url", 7L)).toDF("id", "url", "priority")
    val delays = Seq(("A.EXAMPLE", 2.0)).toDF("h", "delay_s")
    val out = Links.frontierSchedule(frontier, "url", "priority",
        delays, "h", "delay_s", defaultDelay = 0.5)
      .select("id", "host", "fetch_slot", "fetch_offset_s")
      .as[(Long, String, Long, Double)].collect().toSeq.sortBy(_._1)
    // a.example ordered by (priority desc, url): p2(9), p1(5), p3(5)
    assert(out(0) == ((1L, "a.example", 1L, 2.0)))
    assert(out(1) == ((2L, "a.example", 0L, 0.0)))
    assert(out(2) == ((3L, "a.example", 2L, 4.0)))
    // undeclared host uses the default delay
    assert(out(3) == ((4L, "b.example", 0L, 0.0)))
    // non-absolute URL → NULL host, still scheduled
    assert(out(4)._2 == null && out(4)._3 == 0L)
    intercept[IllegalArgumentException] {
      Links.frontierSchedule(frontier.withColumn("host", col("url")),
        "url", "priority", delays, "h", "delay_s")
    }
  }
}
