package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LegacyDocFixture

class OlepsSpec extends AnyFunSuite {

  test("VT_LPSTR title in the code page decodes; NUL terminates") {
    val s = LegacyDocFixture.summaryInfo("café report", codepage = 1252)
    val props = Oleps.properties(s).get
    assert(props(Oleps.PidTitle) == "café report")
  }

  test("VT_LPWSTR wide title decodes") {
    val s = LegacyDocFixture.summaryInfo("καλημέρα deck", wide = true)
    assert(Oleps.properties(s).get(Oleps.PidTitle) == "καλημέρα deck")
  }

  test("titleFrom reads the SummaryInformation stream off a CFB") {
    val c = LegacyDocFixture.cfb(Seq(
      "Workbook" -> "wb".getBytes,
      "\u0005SummaryInformation" ->
        LegacyDocFixture.summaryInfo("quarterly numbers")))
    val files = Ole2.streams(c).get
    assert(Oleps.titleFrom(files).contains("quarterly numbers"))
    // absent stream: None, never a throw
    assert(Oleps.titleFrom(Map("Workbook" -> "wb".getBytes)).isEmpty)
  }

  test("hostile inputs never throw") {
    assert(Oleps.properties(null).isEmpty)
    assert(Oleps.properties(Array.emptyByteArray).isEmpty)
    assert(Oleps.properties("not a property set at all, no sir!!!!!!!!!!!!"
      .getBytes).isEmpty)
    // truncated mid-section keeps what parses (or None) without error
    val whole = LegacyDocFixture.summaryInfo("cut me")
    (1 until whole.length by 7).foreach { n =>
      Oleps.properties(java.util.Arrays.copyOfRange(whole, 0, n))
    }
    succeed
  }
}
