package graft.engine.read

import org.apache.spark.sql.functions.col

class WikiDumpSpec extends graft.SparkSpec {

  private def dumpXml: String =
    """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">
      |  <siteinfo><sitename>Testwiki</sitename></siteinfo>
      |  <page>
      |    <title>Alpha &amp; Beta</title>
      |    <ns>0</ns>
      |    <id>1</id>
      |    <revision>
      |      <id>100</id>
      |      <timestamp>2024-01-01T00:00:00Z</timestamp>
      |      <text bytes="20" xml:space="preserve">Old revision text.</text>
      |    </revision>
      |    <revision>
      |      <id>101</id>
      |      <timestamp>2024-06-01T00:00:00Z</timestamp>
      |      <text bytes="28" xml:space="preserve">'''Alpha''' is a letter &lt;3.</text>
      |    </revision>
      |  </page>
      |  <page>
      |    <title>Pointer</title>
      |    <ns>0</ns>
      |    <id>2</id>
      |    <redirect title="Alpha &amp; Beta" />
      |    <revision>
      |      <id>102</id>
      |      <timestamp>2024-02-02T00:00:00Z</timestamp>
      |      <text bytes="30">#REDIRECT [[Alpha &amp; Beta]]</text>
      |    </revision>
      |  </page>
      |  <page>
      |    <title>Talk page</title>
      |    <ns>1</ns>
      |    <id>3</id>
      |    <revision>
      |      <id>103</id>
      |      <timestamp>2024-03-03T00:00:00Z</timestamp>
      |      <text />
      |    </revision>
      |  </page>
      |</mediawiki>""".stripMargin

  test("parsePage: fields, entities, last revision wins, redirect") {
    val chunks = dumpXml.split("</page>")
    val p1 = WikiDump.parsePage(chunks(0)).get
    assert(p1.title == "Alpha & Beta" && p1.ns == 0 && p1.pageId == 1L)
    assert(p1.redirect.isEmpty)
    assert(p1.timestamp == "2024-06-01T00:00:00Z")
    assert(p1.wikitext == "'''Alpha''' is a letter <3.")
    val p2 = WikiDump.parsePage(chunks(1)).get
    assert(p2.redirect.contains("Alpha & Beta"))
    val p3 = WikiDump.parsePage(chunks(2)).get
    assert(p3.ns == 1 && p3.wikitext == "")
    // trailer and header chunks drop
    assert(WikiDump.parsePage(chunks(3)).isEmpty)
    assert(WikiDump.parsePage("<mediawiki><siteinfo/>").isEmpty)
    assert(WikiDump.parsePage(null).isEmpty)
  }

  test("pages() reads plain XML and splittable bz2 identically") {
    val dir = tmpDir("wikidump")
    val plain = dir.resolve("dump.xml")
    java.nio.file.Files.write(plain, dumpXml.getBytes("UTF-8"))
    val bz2 = dir.resolve("dump.xml.bz2")
    val out = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(
        java.nio.file.Files.newOutputStream(bz2))
    out.write(dumpXml.getBytes("UTF-8")); out.close()

    Seq(plain, bz2).foreach { f =>
      val rows = WikiDump.pages(spark, f.toString)
        .orderBy("page_id").collect()
      assert(rows.length == 3, f)
      assert(rows(0).getAs[String]("title") == "Alpha & Beta")
      assert(rows(0).getAs[String]("wikitext") ==
        "'''Alpha''' is a letter <3.")
      assert(rows(1).getAs[String]("redirect") == "Alpha & Beta")
      assert(rows(2).getAs[Int]("ns") == 1)
    }
  }

  test("article corpus composition: ns 0, no redirects, plain text") {
    val dir = tmpDir("wikidump2")
    val f = dir.resolve("dump.xml")
    java.nio.file.Files.write(f, dumpXml.getBytes("UTF-8"))
    val corpus = WikiDump.pages(spark, f.toString)
      .where(col("ns") === 0 && col("redirect").isNull)
      .withColumn("text", graft.ops.Wikitext.textCol(col("wikitext")))
      .select("title", "text").collect()
    assert(corpus.length == 1)
    assert(corpus(0).getString(1) == "Alpha is a letter <3.")
  }

  test("wikitext_to_text SQL function surfaces the kernel") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "See [[a|b]] {{tmpl}} c"), (2L, null.asInstanceOf[String]))
      .toDF("id", "src").createOrReplaceTempView("wiki_src")
    val got = spark.sql(
      "SELECT id, wikitext_to_text(src) AS t FROM wiki_src ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "See b c")
    assert(got(1).isNullAt(1))
  }

  test("entity unescape covers numeric refs and rejects malformed") {
    assert(WikiDump.unescape("a&#65;b&#x42;c") == "aAbBc")
    assert(WikiDump.unescape("bare & ampersand") == "bare & ampersand")
    assert(WikiDump.unescape("&#xZZ; stays") == "&#xZZ; stays")
    assert(WikiDump.unescape("&#1114112; out of range") ==
      "&#1114112; out of range")
  }

  test("numeric refs in the surrogate range are rejected as malformed") {
    // Character.toChars would happily emit a lone surrogate; the
    // unescape must fall back to the raw '&' path instead
    assert(WikiDump.unescape("a&#xD800;b") == "a&#xD800;b")
    assert(WikiDump.unescape("a&#55296;b") == "a&#55296;b")
    assert(WikiDump.unescape("a&#xDFFF;b") == "a&#xDFFF;b")
    // the boundary neighbours still decode
    assert(WikiDump.unescape("&#xD7FF;") == "\uD7FF")
    assert(WikiDump.unescape("&#xE000;") == "\uE000")
    // astral plane (needs a surrogate PAIR internally) still works
    assert(WikiDump.unescape("&#x1F600;") ==
      new String(Character.toChars(0x1F600)))
  }

  test("maxRecordBytes bounds a hostile oversized page to one cheap row") {
    val dir = tmpDir("wikidump3")
    val f = dir.resolve("dump.xml")
    // a meta-history-style hot page: one <page> far past the cap
    val big = "x" * 300000
    val xml =
      s"""<mediawiki>
         |<page><title>Small</title><ns>0</ns><id>1</id>
         |<revision><timestamp>2024-01-01T00:00:00Z</timestamp>
         |<text>small text</text></revision></page>
         |<page><title>Huge</title><ns>0</ns><id>2</id>
         |<revision><timestamp>2024-01-01T00:00:00Z</timestamp>
         |<text>$big</text></revision></page>
         |<page><title>After</title><ns>0</ns><id>3</id>
         |<revision><timestamp>2024-01-02T00:00:00Z</timestamp>
         |<text>after text</text></revision></page>
         |</mediawiki>""".stripMargin
    java.nio.file.Files.write(f, xml.getBytes("UTF-8"))
    val rows = WikiDump.pages(spark, f.toString, maxRecordBytes = 64 * 1024)
      .orderBy("page_id").collect()
    // the intact pages are untouched; the hostile record is either
    // dropped or truncated far below its real size - never GBs
    val byId = rows.map(r => r.getAs[Long]("page_id") -> r).toMap
    assert(byId(1L).getAs[String]("wikitext") == "small text")
    assert(byId.get(2L).forall(
      _.getAs[String]("wikitext").length < 64 * 1024))
    // the reader re-anchors at the next delimiter: later pages intact
    assert(byId(3L).getAs[String]("wikitext") == "after text")
    // and with the default cap the same dump reads whole
    val full = WikiDump.pages(spark, f.toString)
      .orderBy("page_id").collect()
    assert(full.length == 3)
    assert(full(1).getAs[String]("wikitext") == big)
    assert(full(2).getAs[String]("wikitext") == "after text")
  }
}
