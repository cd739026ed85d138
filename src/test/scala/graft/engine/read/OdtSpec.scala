package graft.engine.read



import graft.queries.OdtFixture
import graft.queries.OdtFixture.{LineBreak, Note, Spaces, Span, T, Tab}

class OdtSpec extends graft.SparkSpec {

  test("paragraphs, headings, tabs, breaks and space runs in document order") {
    val d = OdtFixture.odt(Seq(
      OdtFixture.heading(1, T("Title")),
      OdtFixture.para(T("alpha"), Tab, T("beta"), LineBreak, T("gamma")),
      OdtFixture.para(T("a"), Spaces(3), T("b"))))
    val got = Odt.extractText(d).get
    assert(got.nParagraphs == 3)
    assert(got.text == "Title\nalpha\tbeta\ngamma\na   b")
  }

  test("spans recurse; footnotes and annotations never contribute") {
    val d = OdtFixture.odt(Seq(
      OdtFixture.para(Span("bold"), T(" plain"), Note("footnote text"))))
    val got = Odt.extractText(d).get
    assert(got.nParagraphs == 1)
    assert(got.text == "bold plain")
  }

  test("text:s without a count is one space; hostile counts are capped") {
    val one = OdtFixture.odt(Seq(OdtFixture.para(T("a"))))
      // hand-splice a count-less <text:s/> fixture
    val xml = OdtFixture.contentXml(Seq(
      "<text:p>a<text:s/>b</text:p>",
      "<text:p>c<text:s text:c=\"1000000000\"/>d</text:p>"))
    val d = graft.queries.EpubFixture.zip(Seq(
      "mimetype" -> OdtFixture.TextMime.getBytes,
      "content.xml" -> xml.getBytes("UTF-8")))
    val got = Odt.extractText(d).get
    val paras = got.text.split("\n", -1)
    assert(paras(0) == "a b")
    assert(paras(1).length == 2 + 10000) // capped, not 1e9
    assert(one.nonEmpty)
  }

  test("list items and table cells extract like body paragraphs") {
    val d = OdtFixture.odt(Seq(
      OdtFixture.para(T("before")),
      OdtFixture.list("item one", "item two"),
      OdtFixture.table("cell one", "cell two"),
      OdtFixture.para(T("after"))))
    assert(Odt.extractText(d).get.text ==
      "before\nitem one\nitem two\ncell one\ncell two\nafter")
  }

  test("entities survive") {
    val d = OdtFixture.odt(Seq(OdtFixture.para(T("a < b & c"))))
    assert(Odt.extractText(d).get.text == "a < b & c")
  }

  test("mimetype class gates: text accepted, others rejected, absent tolerated") {
    val text = OdtFixture.odt(Seq(OdtFixture.para(T("ok"))))
    assert(Odt.extractText(text).get.text == "ok")
    val sheet = OdtFixture.odt(Seq(OdtFixture.para(T("x"))),
      mimetype = Some("application/vnd.oasis.opendocument.spreadsheet"))
    assert(Odt.extractText(sheet).isEmpty)
    val absent = OdtFixture.odt(Seq(OdtFixture.para(T("tolerant"))),
      mimetype = None)
    assert(Odt.extractText(absent).get.text == "tolerant")
  }

  test("hostile inputs return None") {
    assert(Odt.extractText(null).isEmpty)
    assert(Odt.extractText("not a zip".getBytes).isEmpty)
    // a zip with no content.xml
    assert(Odt.extractText(graft.queries.EpubFixture.zip(Seq(
      "mimetype" -> OdtFixture.TextMime.getBytes))).isEmpty)
    // broken content XML (an encrypted package presents the same way:
    // content.xml bytes that are not XML)
    assert(Odt.extractText(graft.queries.EpubFixture.zip(Seq(
      "mimetype" -> OdtFixture.TextMime.getBytes,
      "content.xml" -> "<office:document-content><unclosed".getBytes))).isEmpty)
    // parseable XML but no office:text body (a drawing body)
    assert(Odt.extractText(graft.queries.EpubFixture.zip(Seq(
      "mimetype" -> OdtFixture.TextMime.getBytes,
      "content.xml" ->
        """<office:document-content
          |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0">
          |  <office:body><office:drawing/></office:body>
          |</office:document-content>""".stripMargin.getBytes("UTF-8")))).isEmpty)
  }

  test("DOCTYPE in content.xml is stripped before parse (entity guard)") {
    val xml = "<!DOCTYPE office:document-content SYSTEM \"http://evil/x.dtd\">" +
      OdtFixture.contentXml(Seq("<text:p>safe</text:p>"))
    val d = graft.queries.EpubFixture.zip(Seq(
      "mimetype" -> OdtFixture.TextMime.getBytes,
      "content.xml" -> xml.getBytes("UTF-8")))
    assert(Odt.extractText(d).get.text == "safe")
  }

  test("odt_text SQL function surfaces extraction") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, OdtFixture.odt(Seq(OdtFixture.para(T("via sql"))))),
      (2L, "junk".getBytes)).toDF("id", "content")
    df.createOrReplaceTempView("odt_docs")
    val got = spark.sql(
      "SELECT id, odt_text(content) AS t FROM odt_docs ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "via sql")
    assert(got(1).isNullAt(1))
  }
}
