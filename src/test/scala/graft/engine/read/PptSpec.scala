package graft.engine.read

import graft.queries.PptFixture

class PptSpec extends graft.SparkSpec {

  test("text atoms extract in document order, CRs break paragraphs") {
    val d = PptFixture.ppt(Seq(
      PptFixture.container(0x03EE, Seq( // a slide container
        PptFixture.textCharsAtom("Title slide\rSubtitle"),
        PptFixture.textBytesAtom("bullet one"))),
      PptFixture.container(0x03EE, Seq(
        PptFixture.textCharsAtom("Second slide")))))
    val got = Ppt.extractText(d).get
    assert(got.nParagraphs == 4)
    assert(got.text == "Title slide\nSubtitle\nbullet one\nSecond slide")
  }

  test("vertical tabs are line breaks inside a paragraph") {
    val d = PptFixture.ppt(Seq(
      PptFixture.textCharsAtom("line a\u000Bline b")))
    assert(Ppt.extractText(d).get.text == "line a\nline b")
    assert(Ppt.extractText(d).get.nParagraphs == 1)
  }

  test("CString metadata records never read as body text") {
    val d = PptFixture.ppt(Seq(
      PptFixture.cstring("C:\\template.pot"),
      PptFixture.textBytesAtom("real text")))
    assert(Ppt.extractText(d).get.text == "real text")
  }

  test("an image-only deck is a valid empty document") {
    val d = PptFixture.ppt(Seq(
      PptFixture.record(0, 0x03F3, new Array[Byte](8))))
    val got = Ppt.extractText(d).get
    assert(got.nParagraphs == 0 && got.text == "")
  }

  test("encrypted decks return None") {
    val d = PptFixture.ppt(Seq(
      PptFixture.encryptionAtom(),
      PptFixture.textCharsAtom("secret")))
    assert(Ppt.extractText(d).isEmpty)
  }

  test("torn record tails stop cleanly") {
    val good = PptFixture.ppt(Seq(PptFixture.textBytesAtom("kept text")))
    // a record header claiming more bytes than exist must not throw
    val streams = Ole2.streams(good).get
    val torn = streams("PowerPoint Document") ++
      PptFixture.record(0, 0x0FA8, "lost".getBytes).dropRight(2)
    val rebuilt = graft.queries.LegacyDocFixture.cfb(Seq(
      "PowerPoint Document" -> torn))
    assert(Ppt.extractText(rebuilt).get.text == "kept text")
  }

  test("hostile inputs return None") {
    assert(Ppt.extractText(null).isEmpty)
    assert(Ppt.extractText("not cfb".getBytes).isEmpty)
    assert(Ppt.extractText(graft.queries.LegacyDocFixture.cfb(
      Seq("Workbook" -> Array[Byte](1)))).isEmpty)
  }

  test("ppt_text SQL function surfaces extraction") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, PptFixture.ppt(Seq(PptFixture.textCharsAtom("via sql")))),
      (2L, "junk".getBytes)).toDF("id", "content")
    df.createOrReplaceTempView("ppt_docs")
    val got = spark.sql(
      "SELECT id, ppt_text(content) AS t FROM ppt_docs ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "via sql")
    assert(got(1).isNullAt(1))
  }
}
