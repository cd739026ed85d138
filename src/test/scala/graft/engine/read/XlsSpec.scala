package graft.engine.read

import graft.queries.XlsFixture

class XlsSpec extends graft.SparkSpec {

  test("LabelSST references resolve through the SST in cell order") {
    val d = XlsFixture.workbook(Seq(
      XlsFixture.sst(Seq(
        XlsFixture.sstEntry("alpha"),
        XlsFixture.sstEntry("beta")), total = 3),
      XlsFixture.labelSst(0, 0, 0),
      XlsFixture.labelSst(0, 1, 1),
      XlsFixture.labelSst(1, 0, 0))) // duplicate reference repeats
    val got = Xls.extractText(d).get
    assert(got.nParagraphs == 3)
    assert(got.text == "alpha\nbeta\nalpha")
  }

  test("UTF-16 entries and rich runs skip by declared length") {
    val d = XlsFixture.workbook(Seq(
      XlsFixture.sst(Seq(
        XlsFixture.sstEntry("καλημέρα", high = true),
        XlsFixture.sstEntry("styled", richRuns = 2),
        XlsFixture.sstEntry("plain")), total = 3),
      XlsFixture.labelSst(0, 0, 0),
      XlsFixture.labelSst(0, 1, 1),
      XlsFixture.labelSst(0, 2, 2)))
    assert(Xls.extractText(d).get.text == "καλημέρα\nstyled\nplain")
  }

  test("a string straddling a Continue record reassembles, even across encodings") {
    val lowSplit = XlsFixture.workbook(
      XlsFixture.sstWithContinue("Hello", "World", tailHigh = false) :+
        XlsFixture.labelSst(0, 0, 0))
    assert(Xls.extractText(lowSplit).get.text == "HelloWorld")
    val mixedSplit = XlsFixture.workbook(
      XlsFixture.sstWithContinue("abc", "δε", tailHigh = true) :+
        XlsFixture.labelSst(0, 0, 0))
    assert(Xls.extractText(mixedSplit).get.text == "abcδε")
  }

  test("numbers-only workbooks are valid empty documents") {
    val d = XlsFixture.workbook(Seq(
      XlsFixture.numberCell(0, 0, 42.5)))
    val got = Xls.extractText(d).get
    assert(got.nParagraphs == 0 && got.text == "")
  }

  test("the Book stream name (Excel 5/95 writers) also resolves") {
    val d = XlsFixture.workbook(Seq(
      XlsFixture.sst(Seq(XlsFixture.sstEntry("old name")), total = 1),
      XlsFixture.labelSst(0, 0, 0)), streamName = "Book")
    assert(Xls.extractText(d).get.text == "old name")
  }

  test("encrypted workbooks (FilePass) return None") {
    val d = XlsFixture.workbook(Seq(
      XlsFixture.filePass(),
      XlsFixture.sst(Seq(XlsFixture.sstEntry("secret")), total = 1),
      XlsFixture.labelSst(0, 0, 0)))
    assert(Xls.extractText(d).isEmpty)
  }

  test("hostile inputs return None; torn tails stop cleanly") {
    assert(Xls.extractText(null).isEmpty)
    assert(Xls.extractText("not cfb".getBytes).isEmpty)
    assert(Xls.extractText(graft.queries.LegacyDocFixture.cfb(
      Seq("WordDocument" -> Array[Byte](1)))).isEmpty)
    // an out-of-range isst reference drops, never throws
    val bad = XlsFixture.workbook(Seq(
      XlsFixture.sst(Seq(XlsFixture.sstEntry("only")), total = 1),
      XlsFixture.labelSst(0, 0, 0),
      XlsFixture.labelSst(0, 1, 99)))
    assert(Xls.extractText(bad).get.text == "only")
  }

  test("xls_text SQL function surfaces extraction") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, XlsFixture.workbook(Seq(
        XlsFixture.sst(Seq(XlsFixture.sstEntry("via sql")), total = 1),
        XlsFixture.labelSst(0, 0, 0)))),
      (2L, "junk".getBytes)).toDF("id", "content")
    df.createOrReplaceTempView("xls_docs")
    val got = spark.sql(
      "SELECT id, xls_text(content) AS t FROM xls_docs ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "via sql")
    assert(got(1).isNullAt(1))
  }
}
