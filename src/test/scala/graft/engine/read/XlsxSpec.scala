package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.XlsxFixture
import graft.queries.XlsxFixture.{Bool, FStr, Inline, Num, SRef}

class XlsxSpec extends AnyFunSuite {

  test("shared-string refs, inline strings and formula strings extract; numbers/booleans skip") {
    val b = XlsxFixture.xlsx1(
      Seq(SRef("A1", 0), Num("B1", 42.5), Inline("C1", "inline text"),
        Bool("D1", v = true), FStr("E1", "formula out"), SRef("F1", 1)),
      sharedStrings = Some(Seq(
        XlsxFixture.si("alpha"), XlsxFixture.si("beta"))))
    val t = Xlsx.extractText(b).get
    assert(t.nParagraphs == 4)
    assert(t.text == "alpha\ninline text\nformula out\nbeta")
  }

  test("rich runs concatenate; phonetic rPh blocks are excluded") {
    val b = XlsxFixture.xlsx1(
      Seq(SRef("A1", 0), SRef("B1", 1)),
      sharedStrings = Some(Seq(
        XlsxFixture.si("styled run text", richRuns = 3),
        XlsxFixture.si("漢字", phonetic = "かんじ"))))
    val t = Xlsx.extractText(b).get
    assert(t.text == "styled run text\n漢字")
  }

  test("duplicate references repeat their string, as the sheet displays") {
    val b = XlsxFixture.xlsx1(
      Seq(SRef("A1", 0), SRef("B1", 0)),
      sharedStrings = Some(Seq(XlsxFixture.si("dup"))))
    assert(Xlsx.extractText(b).get.text == "dup\ndup")
  }

  test("sheets extract in WORKBOOK order even with scrambled member names") {
    val b = XlsxFixture.xlsx(
      Seq(("rId1", "First", Seq[XlsxFixture.Cell](Inline("A1", "one"))),
        ("rId2", "Second", Seq[XlsxFixture.Cell](Inline("A1", "two"))),
        ("rId3", "Third", Seq[XlsxFixture.Cell](Inline("A1", "three")))),
      sharedStrings = None, scrambleNames = true)
    assert(Xlsx.extractText(b).get.text == "one\ntwo\nthree")
  }

  test("numbers-only workbook extracts as a valid empty document") {
    val b = XlsxFixture.xlsx1(Seq(Num("A1", 1.0), Num("B1", 2.0)),
      sharedStrings = None)
    val t = Xlsx.extractText(b).get
    assert(t.nParagraphs == 0 && t.text == "")
  }

  test("out-of-range SST indices and junk payloads never throw") {
    val b = XlsxFixture.xlsx1(Seq(SRef("A1", 99)),
      sharedStrings = Some(Seq(XlsxFixture.si("only"))))
    assert(Xlsx.extractText(b).get.nParagraphs == 0)
    assert(Xlsx.extractText("not a zip".getBytes).isEmpty)
    assert(Xlsx.extractText(graft.queries.EpubFixture.zip(Seq(
      "readme.txt" -> "hi".getBytes))).isEmpty)
  }

  test("XML entities in cell text unescape") {
    val b = XlsxFixture.xlsx1(Seq(Inline("A1", "a < b & c")),
      sharedStrings = None)
    assert(Xlsx.extractText(b).get.text == "a < b & c")
  }
}
