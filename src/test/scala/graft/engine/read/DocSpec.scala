package graft.engine.read

import graft.queries.LegacyDocFixture
import graft.queries.LegacyDocFixture.Piece

class DocSpec extends graft.SparkSpec {

  test("single compressed piece extracts cp1252 text with paragraph marks") {
    val d = LegacyDocFixture.doc(Seq(
      Piece("Hello world!\rSecond para\r", compressed = true)))
    val got = Doc.extractText(d).get
    assert(got.nParagraphs == 2)
    assert(got.text == "Hello world!\nSecond para")
  }

  test("unicode and compressed pieces interleave in CP order") {
    val d = LegacyDocFixture.doc(Seq(
      Piece("ascii then ", compressed = true),
      Piece("καλημέρα", compressed = false),
      Piece(" and back\r", compressed = true)))
    assert(Doc.extractText(d).get.text == "ascii then καλημέρα and back")
  }

  test("cp1252 high range decodes through the JVM charset") {
    val d = LegacyDocFixture.doc(Seq(Piece("café – déjà\r", compressed = true)))
    assert(Doc.extractText(d).get.text == "café – déjà")
  }

  test("field instructions drop, field results stay") {
    // 0x13 begin, 0x14 separator, 0x15 end
    val raw = "see \u0013HYPERLINK http://x\u0014the link\u0015 here\r"
    val d = LegacyDocFixture.doc(Seq(Piece(raw, compressed = false)))
    assert(Doc.extractText(d).get.text == "see the link here")
  }

  test("cell marks and vertical tabs break paragraphs and lines") {
    // 0x07 cell mark, 0x0B vertical tab
    val raw = "cell one\u0007cell two\u0007line a\u000Bline b\r"
    val d = LegacyDocFixture.doc(Seq(Piece(raw, compressed = false)))
    val got = Doc.extractText(d).get
    assert(got.text == "cell one\ncell two\nline a\nline b")
  }

  test("a field WITHOUT a separator never suppresses the rest of the document") {
    // XE/TC-style: 0x13 instruction 0x15 (no 0x14) — text after the
    // field end must survive
    val raw = "before \u0013 XE \"index entry\" \u0015after\r"
    val d = LegacyDocFixture.doc(Seq(Piece(raw, compressed = false)))
    assert(Doc.extractText(d).get.text == "before after")
    // nested: outer field's result contains an inner separatorless one
    val nested = "a \u0013INNER \u0013 XE x \u0015\u0014shown\u0015 b\r"
    val d2 = LegacyDocFixture.doc(Seq(Piece(nested, compressed = false)))
    assert(Doc.extractText(d2).get.text == "a shown b")
  }

  test("1Table routing via fWhichTblStm") {
    val d = LegacyDocFixture.doc(Seq(Piece("one table\r", compressed = true)),
      oneTable = true)
    assert(Doc.extractText(d).get.text == "one table")
  }

  test("a Prc prefix in the Clx is skipped to reach the Pcdt") {
    val d = LegacyDocFixture.doc(Seq(Piece("after prc\r", compressed = true)),
      prcPrefix = true)
    assert(Doc.extractText(d).get.text == "after prc")
  }

  test("mini-stream WordDocument (small doc) reads through the miniFAT") {
    val d = LegacyDocFixture.doc(Seq(Piece("small doc\r", compressed = true)),
      padWordTo = 0)
    assert(Doc.extractText(d).get.text == "small doc")
  }

  test("encrypted documents return None") {
    val d = LegacyDocFixture.doc(Seq(Piece("secret\r", compressed = true)),
      encrypted = true)
    assert(Doc.extractText(d).isEmpty)
  }

  test("hostile inputs return None") {
    assert(Doc.extractText(null).isEmpty)
    assert(Doc.extractText("not cfb".getBytes).isEmpty)
    // CFB without a WordDocument stream
    assert(Doc.extractText(LegacyDocFixture.cfb(
      Seq("Workbook" -> Array[Byte](1, 2, 3)))).isEmpty)
    // WordDocument without the FIB magic
    assert(Doc.extractText(LegacyDocFixture.cfb(Seq(
      "WordDocument" -> Array.fill[Byte](512)(0),
      "0Table" -> Array.fill[Byte](16)(0)))).isEmpty)
    // missing table stream
    val noTable = {
      val ok = LegacyDocFixture.doc(Seq(Piece("x\r", compressed = true)))
      val streams = Ole2.streams(ok).get
      LegacyDocFixture.cfb(Seq("WordDocument" -> streams("WordDocument")))
    }
    assert(Doc.extractText(noTable).isEmpty)
  }

  test("doc_text SQL function surfaces extraction") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, LegacyDocFixture.doc(Seq(Piece("via sql\r", compressed = true)))),
      (2L, "junk".getBytes)).toDF("id", "content")
    df.createOrReplaceTempView("doc_docs")
    val got = spark.sql(
      "SELECT id, doc_text(content) AS t FROM doc_docs ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "via sql")
    assert(got(1).isNullAt(1))
  }
}
