package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DocxFixture
import graft.queries.DocxFixture.{Br, T, Tab}

class DocxSpec extends AnyFunSuite {

  test("paragraph text, tabs and breaks interleave in document order") {
    val d = DocxFixture.docx(Seq(
      DocxFixture.para(T("alpha"), Tab, T("beta"), Br, T("gamma")),
      DocxFixture.para(T("second paragraph"))))
    val got = Docx.extractText(d).get
    assert(got.nParagraphs == 2)
    assert(got.text == "alpha\tbeta\ngamma\nsecond paragraph")
  }

  test("tab STOP definitions in pPr never read as tab characters") {
    // para() deliberately carries a w:pPr/w:tabs/w:tab stop and a
    // bold rPr — neither may leak into text
    val d = DocxFixture.docx(Seq(DocxFixture.para(T("clean"))))
    assert(Docx.extractText(d).get.text == "clean")
  }

  test("entities and xml:space preserve survive") {
    val d = DocxFixture.docx(Seq(
      DocxFixture.para(T("a < b & c  spaced"))))
    assert(Docx.extractText(d).get.text == "a < b & c  spaced")
  }

  test("table cell paragraphs extract like body paragraphs") {
    val d = DocxFixture.docx(Seq(
      DocxFixture.para(T("before")),
      DocxFixture.table("cell one", "cell two"),
      DocxFixture.para(T("after"))))
    assert(Docx.extractText(d).get.text ==
      "before\ncell one\ncell two\nafter")
  }

  test("main part resolves via rels; bare word/document.xml works too") {
    val noRels = DocxFixture.docx(Seq(DocxFixture.para(T("fallback"))),
      withRels = false)
    assert(Docx.extractText(noRels).get.text == "fallback")
    // rels point at word/document.xml but the part is elsewhere and
    // the fallback is absent → None, never a guess
    val misplaced = DocxFixture.docx(Seq(DocxFixture.para(T("x"))),
      docPath = "word/other.xml")
    assert(Docx.extractText(misplaced).isEmpty)
  }

  test("hostile inputs return None") {
    assert(Docx.extractText(null).isEmpty)
    assert(Docx.extractText("not a zip".getBytes).isEmpty)
    // a zip with no document part
    assert(Docx.extractText(graft.queries.EpubFixture.zip(Seq(
      "some.txt" -> "x".getBytes))).isEmpty)
    // broken document XML
    assert(Docx.extractText(graft.queries.EpubFixture.zip(Seq(
      "word/document.xml" -> "<w:document><unclosed".getBytes))).isEmpty)
  }
}
