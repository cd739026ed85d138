package graft.engine.read

import graft.queries.{DocxFixture, EpubFixture, LegacyDocFixture, OdtFixture, PdfFixture}

class DocumentProbeSpec extends graft.SparkSpec {

  private val t = "the routed text"

  test("format detection by payload magic across all kinds") {
    def fmt(b: Array[Byte]) = DocumentProbe.probe(b).map(_.format)
    assert(fmt(PdfFixture.simplePdf(Seq(
      s"BT ${PdfFixture.lit(t)} Tj ET"))).contains("pdf"))
    assert(fmt(DocxFixture.docx(Seq(
      DocxFixture.para(DocxFixture.T(t))))).contains("docx"))
    assert(fmt(OdtFixture.odt(Seq(
      OdtFixture.para(OdtFixture.T(t))))).contains("odt"))
    assert(fmt(EpubFixture.epub("T", Seq(
      "c.xhtml" -> EpubFixture.xhtml(t)))).contains("epub"))
    assert(fmt(s"{\\rtf1 $t\\par}".getBytes("ISO-8859-1")).contains("rtf"))
    assert(fmt(LegacyDocFixture.doc(Seq(
      LegacyDocFixture.Piece(t + "\r", compressed = true)))).contains("doc"))
    assert(fmt(LegacyDocFixture.cfb(Seq(
      "Workbook" -> Array[Byte](1)))).contains("xls"))
    assert(fmt(LegacyDocFixture.cfb(Seq(
      "EncryptionInfo" -> Array[Byte](1),
      "EncryptedPackage" -> Array[Byte](2)))).contains("encrypted-ooxml"))
    assert(fmt(EpubFixture.zip(Seq("x.txt" -> "x".getBytes))).contains("zip"))
    assert(fmt("plain text".getBytes).isEmpty)
    assert(fmt(null).isEmpty)
  }

  test("OPC siblings and mimetype-less ODF classify correctly") {
    import graft.queries.EpubFixture.zip
    // xlsx/pptx must NOT classify (or extract) as docx
    val xlsx = zip(Seq(
      "_rels/.rels" -> ("<Relationships><Relationship " +
        "Type=\"http://schemas.openxmlformats.org/officeDocument/2006/" +
        "relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
        "</Relationships>").getBytes,
      "xl/workbook.xml" -> "<workbook/>".getBytes))
    assert(DocumentProbe.probe(xlsx).map(_.format).contains("xlsx"))
    assert(DocumentProbe.extractText(xlsx).isEmpty)
    val pptx = zip(Seq("ppt/presentation.xml" -> "<p/>".getBytes))
    assert(DocumentProbe.probe(pptx).map(_.format).contains("pptx"))
    assert(DocumentProbe.extractText(pptx).isEmpty)
    // an ODT whose producer omitted the mimetype entry still routes
    val bareOdt = OdtFixture.odt(Seq(
      OdtFixture.para(OdtFixture.T("no mimetype"))), mimetype = None)
    assert(DocumentProbe.probe(bareOdt).map(_.format).contains("odt"))
    assert(DocumentProbe.extractText(bareOdt).contains("no mimetype"))
    // an OPC package with an unrecognized main part stays classify-only
    val opc = zip(Seq("_rels/.rels" ->
      "<Relationships><Relationship Type=\"x/officeDocument\" Target=\"other/part.xml\"/></Relationships>".getBytes))
    assert(DocumentProbe.probe(opc).map(_.format).contains("opc"))
    assert(DocumentProbe.extractText(opc).isEmpty)
  }

  test("docx with a non-default rels main part still routes as docx") {
    // Word writes word/document2.xml after some save/repair cycles;
    // the rels target is authoritative
    val d = DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T(t))),
      docPath = "word/document2.xml", relsTarget = "word/document2.xml")
    assert(DocumentProbe.probe(d).map(_.format).contains("docx"))
    assert(DocumentProbe.extractText(d).contains(t))
  }

  test("mimetype-less ODF spreadsheets classify odf-other, not odt") {
    val ods = graft.queries.EpubFixture.zip(Seq(
      "content.xml" ->
        ("""<office:document-content
           |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0">
           |  <office:body><office:spreadsheet/></office:body>
           |</office:document-content>""".stripMargin).getBytes("UTF-8")))
    assert(DocumentProbe.probe(ods).map(_.format).contains("odf-other"))
    assert(DocumentProbe.extractText(ods).isEmpty)
  }

  test("rels attribute order and quoting never defeat OPC routing") {
    import graft.queries.EpubFixture.zip
    // Target BEFORE Type, single quotes, an intervening attribute —
    // all legal XML the real attribute lookup handles
    val rels = ("<Relationships xmlns=\"http://schemas.openxmlformats" +
      ".org/package/2006/relationships\"><Relationship Id='rId1' " +
      "Target='word/document2.xml' " +
      "Type='http://schemas.openxmlformats.org/officeDocument/2006/" +
      "relationships/officeDocument'/></Relationships>")
    val d = zip(Seq(
      "_rels/.rels" -> rels.getBytes,
      "word/document2.xml" -> DocxFixture.documentXml(Seq(
        DocxFixture.para(DocxFixture.T("routed")))).getBytes))
    assert(DocumentProbe.probe(d).map(_.format).contains("docx"))
    assert(DocumentProbe.extractText(d).contains("routed"))
    // torn rels that still speak OPC classify as opc, not zip
    val torn = zip(Seq(
      "_rels/.rels" -> "<Relationships><unclosed Type=\"x/officeDocument\""
        .getBytes))
    assert(DocumentProbe.probe(torn).map(_.format).contains("opc"))
  }

  test("probeAndText matches the separate calls off one parse") {
    val docx = DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T(t))))
    assert(DocumentProbe.probeAndText(docx) == (Some("docx"), Some(t)))
    assert(DocumentProbe.probeAndText("junk".getBytes) == (None, None))
    val encDoc = LegacyDocFixture.doc(Seq(
      LegacyDocFixture.Piece("x\r", compressed = true)), encrypted = true)
    assert(DocumentProbe.probeAndText(encDoc) == (Some("doc"), None))
  }

  test("pdf pages and encryption ride the probe") {
    val m = DocumentProbe.probe(PdfFixture.simplePdf(Seq(
      "BT (a) Tj ET", "BT (b) Tj ET"))).get
    assert(m.format == "pdf" && m.units == 2 && !m.encrypted)
    val enc = DocumentProbe.probe(PdfFixture.encryptedPdf("x")).get
    assert(enc.format == "pdf" && enc.encrypted)
    val encDoc = DocumentProbe.probe(LegacyDocFixture.doc(Seq(
      LegacyDocFixture.Piece("x\r", compressed = true)),
      encrypted = true)).get
    assert(encDoc.format == "doc" && encDoc.encrypted)
  }

  test("extractText auto-routes to every readable extractor") {
    def txt(b: Array[Byte]) = DocumentProbe.extractText(b)
    assert(txt(PdfFixture.simplePdf(Seq(
      s"BT ${PdfFixture.lit(t)} Tj ET"))).contains(t))
    assert(txt(DocxFixture.docx(Seq(
      DocxFixture.para(DocxFixture.T(t))))).contains(t))
    assert(txt(OdtFixture.odt(Seq(
      OdtFixture.para(OdtFixture.T(t))))).contains(t))
    assert(txt(s"{\\rtf1 $t\\par}".getBytes("ISO-8859-1")).contains(t))
    assert(txt(LegacyDocFixture.doc(Seq(
      LegacyDocFixture.Piece(t + "\r", compressed = true)))).contains(t))
    // epub routes through the kernel-side htmlToText replay
    assert(txt(EpubFixture.epub("T", Seq(
      "c.xhtml" -> EpubFixture.xhtml(t)))).contains(t))
    // xls routes too: a recordless Workbook is a valid empty document
    assert(txt(LegacyDocFixture.cfb(Seq("Workbook" -> Array[Byte](1))))
      .contains(""))
    assert(txt(graft.queries.XlsFixture.workbook(Seq(
      graft.queries.XlsFixture.sst(Seq(
        graft.queries.XlsFixture.sstEntry(t)), total = 1),
      graft.queries.XlsFixture.labelSst(0, 0, 0)))).contains(t))
    // refusal classes are NULL
    assert(txt(PdfFixture.encryptedPdf("x")).isEmpty)
    assert(txt("junk".getBytes).isEmpty)
  }

  test("epub kernel text matches the Column cascade byte for byte") {
    val book = EpubFixture.epub("T", Seq(
      "a.xhtml" -> EpubFixture.xhtml("first chapter", "with <b>bold</b> &amp; entities"),
      "b.xhtml" -> EpubFixture.xhtml("second chapter")))
    import spark.implicits._
    val viaColumn = Seq(book).toDF("content")
      .select(Epub.textCol(org.apache.spark.sql.functions.col("content")))
      .as[String].head()
    assert(DocumentProbe.extractText(book).contains(viaColumn))
  }

  test("document_format and document_text SQL functions") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("sql docx"))))),
      (2L, s"{\\rtf1 sql rtf\\par}".getBytes("ISO-8859-1")),
      (3L, "junk".getBytes)).toDF("id", "content")
    df.createOrReplaceTempView("mixed_docs")
    val got = spark.sql(
      """SELECT id, document_format(content) AS f,
        |       document_text(content) AS t
        |FROM mixed_docs ORDER BY id""".stripMargin).collect()
    assert(got(0).getString(1) == "docx" && got(0).getString(2) == "sql docx")
    assert(got(1).getString(1) == "rtf" && got(1).getString(2) == "sql rtf")
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }
}
