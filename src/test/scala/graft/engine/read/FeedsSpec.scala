package graft.engine.read

class FeedsSpec extends graft.SparkSpec {

  private val rss =
    """<?xml version="1.0"?>
      |<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/">
      |  <channel>
      |    <title>Example Blog</title>
      |    <item>
      |      <title>First post</title>
      |      <link>https://example.org/1</link>
      |      <guid>tag:1</guid>
      |      <pubDate>Mon, 01 Apr 2024 00:00:00 GMT</pubDate>
      |      <description>&lt;p&gt;Hello &amp;amp; welcome&lt;/p&gt;</description>
      |    </item>
      |    <item>
      |      <title>Second</title>
      |      <link>https://example.org/2</link>
      |      <content:encoded>&lt;b&gt;rich&lt;/b&gt; body</content:encoded>
      |    </item>
      |  </channel>
      |</rss>""".stripMargin

  private val atom =
    """<feed xmlns="http://www.w3.org/2005/Atom">
      |  <title>Atom Feed</title>
      |  <entry>
      |    <title>Entry one</title>
      |    <link rel="self" href="https://example.org/self"/>
      |    <link rel="alternate" href="https://example.org/a1"/>
      |    <id>urn:1</id>
      |    <published>2024-05-01T00:00:00Z</published>
      |    <summary>plain summary</summary>
      |  </entry>
      |  <entry>
      |    <title>Entry two</title>
      |    <link href="https://example.org/a2"/>
      |    <updated>2024-06-01T00:00:00Z</updated>
      |    <content>&lt;div&gt;content body&lt;/div&gt;</content>
      |  </entry>
      |</feed>""".stripMargin

  test("RSS items: channel title, guid, description/content:encoded html-stripped") {
    val items = Feeds.parse(rss)
    assert(items.length == 2)
    assert(items(0) == Feeds.Item("Example Blog", "First post",
      "https://example.org/1", "tag:1",
      "Mon, 01 Apr 2024 00:00:00 GMT", "Hello & welcome"))
    assert(items(1).summary == "rich body")
    assert(items(1).published == "")
  }

  test("Atom entries: alternate link preferred, published-or-updated, content fallback") {
    val items = Feeds.parse(atom)
    assert(items.length == 2)
    assert(items(0) == Feeds.Item("Atom Feed", "Entry one",
      "https://example.org/a1", "urn:1",
      "2024-05-01T00:00:00Z", "plain summary"))
    assert(items(1).link == "https://example.org/a2")
    assert(items(1).published == "2024-06-01T00:00:00Z")
    assert(items(1).summary == "content body")
  }

  test("a self-closing atom:link never shadows the RSS item link") {
    val feed =
      """<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom">
        |  <channel><title>T</title><item>
        |    <atom:link href="https://example.org/self" rel="self"/>
        |    <title>Post</title>
        |    <link>https://example.org/post</link>
        |  </item></channel>
        |</rss>""".stripMargin
    val items = Feeds.parse(feed)
    assert(items.length == 1)
    assert(items(0).link == "https://example.org/post")
  }

  test("hostile inputs yield zero items") {
    assert(Feeds.parse(null).isEmpty)
    assert(Feeds.parse("").isEmpty)
    assert(Feeds.parse("not xml at all").isEmpty)
    assert(Feeds.parse("<rss><channel><item><unclosed").isEmpty)
    assert(Feeds.parse("<html><body>a page</body></html>").isEmpty)
    // external-entity DOCTYPE stripped, not resolved
    val doctype = "<!DOCTYPE rss SYSTEM \"http://evil/x.dtd\">" + rss
    assert(Feeds.parse(doctype).length == 2)
  }

  test("items() explodes with the caller's columns") {
    import spark.implicits._
    val df = Seq(("feedA", rss), ("feedB", "junk")).toDF("src", "body")
    val items = Feeds.items(df, "body")
    assert(items.columns.toSeq == Seq("src", "feed_title", "title",
      "link", "item_id", "published", "summary"))
    assert(items.count() == 2) // junk feed contributes zero rows
    val links = items.select("link").as[String].collect().toSet
    assert(links == Set("https://example.org/1", "https://example.org/2"))
  }

  test("a UTF-8 BOM before the XML declaration does not hide the feed") {
    val bommed = "\uFEFF" + rss
    val items = Feeds.parse(bommed)
    assert(items.nonEmpty)
    assert(items.head.feedTitle == "Example Blog")
  }
}
