package graft.engine.read

class RtfSpec extends graft.SparkSpec {

  private def t(rtf: String): Rtf.RtfText =
    Rtf.extractText(rtf.getBytes("ISO-8859-1")).get

  test("plain runs, formatting words and paragraph breaks") {
    val got = t("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times;}}" +
      "Hello \\b world\\b0 !\\par Second para\\par}")
    assert(got.nParagraphs == 2)
    assert(got.text == "Hello world!\nSecond para")
  }

  test("symbol escapes and nbsp") {
    val got = t("{\\rtf1 a\\\\b\\{c\\}d\\~e\\par}")
    assert(got.text == "a\\b{c}d e")
  }

  test("optional hyphen drops") {
    assert(t("{\\rtf1 hy\\-phen\\par}").text == "hyphen")
  }

  test("hex escapes decode through the declared ANSI code page") {
    assert(t("{\\rtf1\\ansicpg1252 caf\\'e9\\par}").text == "café")
    // cp1251 (Cyrillic): 0xE6 = ж
    assert(t("{\\rtf1\\ansicpg1251 \\'e6\\par}").text == "ж")
  }

  test("unicode escapes consume their uc fallback characters") {
    // the space after \\u8364 is the control-word delimiter; the '?'
    // is the uc1 fallback and is consumed
    assert(t("{\\rtf1\\uc1 \\u8364 ?euro\\par}").text == "\u20ACeuro")
    // uc2: two fallback \'xx escapes are consumed
    assert(t("{\\rtf1\\uc2\\u946 \\'62\\'63d\\par}").text == "\u03B2d")
    // negative parameter wraps: -3841 + 65536 = 61695 (BMP private use)
    assert(t("{\\rtf1\\uc0\\u-3841 x\\par}").text == "\uF0FF" + "x")
  }

  test("header tables, ignorable destinations and info are invisible") {
    val got = t("{\\rtf1{\\*\\generator Riched20}" +
      "{\\info{\\title Secret Title}}" +
      "{\\stylesheet{\\s1 Heading;}}body\\par}")
    assert(got.text == "body")
  }

  test("footnotes are excluded; field results are kept") {
    assert(t("{\\rtf1 main{\\footnote note text} continues\\par}").text ==
      "main continues")
    assert(t("{\\rtf1{\\field{\\*\\fldinst HYPERLINK \"http://x\"}" +
      "{\\fldrslt link text}}\\par}").text == "link text")
  }

  test("table cells and rows flush as paragraphs") {
    val got = t("{\\rtf1\\trowd\\cellx1000\\cellx2000 " +
      "cell one\\cell cell two\\cell\\row\\par}")
    assert(got.text == "cell one\ncell two")
    assert(got.nParagraphs == 2)
  }

  test("bin payloads skip byte-exact (braces inside never parse)") {
    assert(t("{\\rtf1 a\\bin3 x}yb\\par}").text == "ab")
  }

  test("an overflowed bin parameter skips to end, never re-parses payload") {
    // 2^32 overflows Int; the payload must not alias as control text
    val got = t("{\\rtf1 safe \\bin4294967296 \\evil{payload}}")
    assert(got.text == "safe ") // payload never re-parses as text
    // a param that overflows Long must ALSO skip to end (the
    // saturated addition must not wrap the scanner backwards)
    val got2 = t("{\\rtf1 safe \\bin99999999999999999999 \\evil{payload}}")
    assert(got2.text == "safe ")
  }

  test("line and tab controls") {
    assert(t("{\\rtf1 a\\line b\\tab c\\par}").text == "a\nb\tc")
  }

  test("torn documents extract what is present") {
    assert(t("{\\rtf1 partial tex").text == "partial tex")
  }

  test("uc scope restores on group exit") {
    // inner group sets uc0; after it closes the outer uc1 applies again
    val got = t("{\\rtf1\\uc1 {\\uc0\\u946 }\\u947 Xrest\\par}")
    assert(got.text == "βγrest")
  }

  test("non-RTF inputs return None") {
    assert(Rtf.extractText(null).isEmpty)
    assert(Rtf.extractText("plain text".getBytes).isEmpty)
    assert(Rtf.extractText(Array[Byte]()).isEmpty)
    assert(Rtf.extractText("%PDF-1.4 nope".getBytes).isEmpty)
  }

  test("rtf_text SQL function surfaces extraction") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "{\\rtf1 via sql\\par}".getBytes("ISO-8859-1")),
      (2L, "junk".getBytes)).toDF("id", "content")
    df.createOrReplaceTempView("rtf_docs")
    val got = spark.sql(
      "SELECT id, rtf_text(content) AS t FROM rtf_docs ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "via sql")
    assert(got(1).isNullAt(1))
  }

  test("\\~ and \\_ control symbols emit their fixed chars") {
    def t(src: String): String =
      Rtf.extractText(src.getBytes("ISO-8859-1")).get.text
    assert(t("{\\rtf1 a\\~b\\par}") == "a b")
    assert(t("{\\rtf1 a\\_b\\par}") == "a\u2011b")
  }
}
