package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PptxFixture
import graft.queries.PptxFixture.Slide

class PptxSpec extends AnyFunSuite {

  test("a:t runs concatenate per paragraph; paragraphs join with newlines") {
    val b = PptxFixture.pptx(Seq(Slide(Seq(
      PptxFixture.aPara("Title ", "run"),
      PptxFixture.aPara("Body text")))))
    val t = Pptx.extractText(b).get
    assert(t.nParagraphs == 2)
    assert(t.text == "Title run\nBody text")
  }

  test("slides extract in sldIdLst order even with scrambled member names") {
    val b = PptxFixture.pptx(Seq(
      Slide(Seq(PptxFixture.aPara("slide one"))),
      Slide(Seq(PptxFixture.aPara("slide two"))),
      Slide(Seq(PptxFixture.aPara("slide three")))),
      scrambleNames = true)
    assert(Pptx.extractText(b).get.text ==
      "slide one\nslide two\nslide three")
  }

  test("speaker notes contribute right after their slide") {
    val b = PptxFixture.pptx(Seq(
      Slide(Seq(PptxFixture.aPara("deck intro")),
        notes = Seq(PptxFixture.aPara("remember the demo"))),
      Slide(Seq(PptxFixture.aPara("closing")))))
    assert(Pptx.extractText(b).get.text ==
      "deck intro\nremember the demo\nclosing")
  }

  test("a:br breaks lines inside a paragraph") {
    val b = PptxFixture.pptx(Seq(Slide(Seq(
      PptxFixture.aPara("line one\nline two")))))
    assert(Pptx.extractText(b).get.text == "line one\nline two")
  }

  test("an image-only deck is a valid empty document; junk is None") {
    val b = PptxFixture.pptx(Seq(Slide(Seq.empty)))
    val t = Pptx.extractText(b).get
    assert(t.nParagraphs == 0 && t.text == "")
    assert(Pptx.extractText("not a zip".getBytes).isEmpty)
  }

  test("entities in runs unescape") {
    val b = PptxFixture.pptx(Seq(Slide(Seq(
      PptxFixture.aPara("a < b & c")))))
    assert(Pptx.extractText(b).get.text == "a < b & c")
  }
}
