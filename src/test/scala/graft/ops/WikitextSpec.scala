package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class WikitextSpec extends AnyFunSuite {

  private def t(src: String): String = Wikitext.extractText(src).text

  test("templates drop at any nesting depth") {
    assert(t("Born {{birth date|1879|3|14}} in Ulm.") == "Born in Ulm.")
    assert(t("A {{cite |date={{today|x}} |page=3}} citation.") ==
      "A citation.")
    assert(t("Torn {{unclosed template never ends") == "Torn")
  }

  test("internal links keep labels or targets; namespace links drop whole") {
    assert(t("See [[physics]] and [[Albert Einstein|Einstein]].") ==
      "See physics and Einstein.")
    assert(t("A [[File:photo.jpg|thumb|a [[nested]] caption]] here.") ==
      "A here.")
    assert(t("Tagged [[Category:Physicists]] done.") == "Tagged done.")
    // pipes inside a nested link don't confuse the label split
    assert(t("[[target|label with [[inner|x]] link]]") ==
      "label with x link")
  }

  test("external links keep labels, bare urls drop") {
    assert(t("Site [https://example.org the example] and " +
      "[https://bare.example] end.") == "Site the example and end.")
  }

  test("quotes, headings, lists and rules") {
    assert(t("'''bold''' and ''italic'' text") == "bold and italic text")
    val src = "== History ==\nIt began.\n* item one\n# item two\n----\nEnd."
    assert(t(src) == "History\nIt began.\nitem one\nitem two\nEnd.")
  }

  test("refs and comments drop, entities decode, tags strip") {
    assert(t("Fact.<ref>{{cite web|url=x}}</ref> More.<ref name=\"a\"/>") ==
      "Fact. More.")
    assert(t("a <!-- hidden --> b") == "a b")
    assert(t("R&amp;D &lt;tag&gt; &quot;q&quot;") == "R&D <tag> \"q\"")
    assert(t("before <div class=\"x\">inside</div> after") ==
      "before inside after")
  }

  test("self-closed refs with '/' in attribute values never swallow prose") {
    assert(t("<ref name=\"a/b\"/>Some prose.<ref>c</ref> End.") ==
      "Some prose. End.")
  }

  test("triple-brace template parameters drop without leaking a brace") {
    assert(t("value {{{1|default}}} here") == "value here")
    assert(t("{{tmpl|x={{{p}}}}}kept") == "kept")
  }

  test("glued four- and five-brace runs balance without residue") {
    assert(t("a {{{{foo}}}} b") == "a b")
    assert(t("a {{{{{1}}}}} b") == "a b")
    assert(t("{{ {{inner}} }}after") == "after")
    // literal single braces in prose survive
    assert(t("a { b } c") == "a { b } c")
  }

  test("tables drop whole") {
    assert(t("Pre.\n{| class=\"wikitable\"\n|-\n| a || b\n|}\nPost.") ==
      "Pre.\nPost.")
  }

  test("hostile inputs never throw") {
    assert(t(null) == "")
    assert(t("") == "")
    assert(t("[[unclosed link") == "")
    assert(t("{|unclosed table") == "")
  }
}
