package graft.ops

import org.apache.spark.sql.functions.col

class SitemapsSpec extends graft.SparkSpec {

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://example.org/</loc>
      |    <lastmod>2024-05-01</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.9</priority>
      |  </url>
      |  <url><loc>https://example.org/about</loc></url>
      |  <url><loc>https://example.org/hot</loc><priority>7</priority></url>
      |  <url><priority>0.4</priority></url>
      |</urlset>""".stripMargin

  test("urlset entries: loc required, defaults and clamping") {
    val p = Sitemaps.parse(urlset)
    assert(p.children.isEmpty)
    assert(p.entries.map(_.loc) == Seq("https://example.org/",
      "https://example.org/about", "https://example.org/hot"))
    assert(p.entries(0) == Sitemaps.Entry("https://example.org/",
      "2024-05-01", "daily", 0.9))
    assert(p.entries(1).priority == 0.5) // spec default
    assert(p.entries(2).priority == 1.0) // hostile value clamps
  }

  test("sitemapindex returns children, never recurses") {
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://example.org/a.xml</loc></sitemap>
        |  <sitemap><loc>https://example.org/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val p = Sitemaps.parse(idx)
    assert(p.entries.isEmpty)
    assert(p.children == Seq("https://example.org/a.xml",
      "https://example.org/b.xml"))
  }

  test("plain-text sitemaps and hostile inputs") {
    val p = Sitemaps.parse(
      "https://example.org/x\nnot a url\nhttps://example.org/y\n")
    assert(p.entries.map(_.loc) ==
      Seq("https://example.org/x", "https://example.org/y"))
    assert(p.entries.forall(_.priority == 0.5))
    assert(Sitemaps.parse(null).entries.isEmpty)
    assert(Sitemaps.parse("").entries.isEmpty)
    assert(Sitemaps.parse("<urlset><unclosed").entries.isEmpty)
    assert(Sitemaps.parse("<other><loc>x</loc></other>").entries.isEmpty)
    // external-entity DOCTYPE is stripped, not resolved
    val doctype = "<!DOCTYPE urlset SYSTEM \"http://evil/x.dtd\">" + urlset
    assert(Sitemaps.parse(doctype).entries.nonEmpty)
  }

  test("urls() explodes per entry and feeds frontierSchedule") {
    import spark.implicits._
    val df = Seq(("siteA", urlset)).toDF("site", "body")
    val urls = Sitemaps.urls(df, "body")
    assert(urls.columns.toSeq ==
      Seq("site", "loc", "lastmod", "changefreq", "priority"))
    assert(urls.count() == 3)
    val delays = Seq(("example.org", 2.0)).toDF("host", "delay")
    val plan = Links.frontierSchedule(urls, "loc", "priority",
      delays, "host", "delay")
      .orderBy("fetch_slot")
      .select("loc", "fetch_slot", "fetch_offset_s")
      .collect()
    // hot (clamped 1.0) first, then 0.9 root, then 0.5 about — each
    // slot 2 s apart per the host's declared delay
    assert(plan.map(_.getString(0)).toSeq == Seq("https://example.org/hot",
      "https://example.org/", "https://example.org/about"))
    assert(plan.map(_.getDouble(2)).toSeq == Seq(0.0, 2.0, 4.0))
  }

  test("a UTF-8 BOM does not misroute an XML sitemap to the text branch") {
    val xml = "\uFEFF<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://example.org/a</loc></url></urlset>"
    val p = Sitemaps.parse(xml)
    assert(p.entries.map(_.loc) == Seq("https://example.org/a"))
    // and a BOM'd plain-text sitemap still parses as text
    val txt = "\uFEFFhttps://example.org/b\n"
    assert(Sitemaps.parse(txt).entries.map(_.loc) ==
      Seq("https://example.org/b"))
  }
}
