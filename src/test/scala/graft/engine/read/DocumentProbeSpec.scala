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
    assert(fmt("plain text".getBytes).contains("txt"))
    assert(fmt("<!DOCTYPE html><p>x</p>".getBytes).contains("html"))
    assert(fmt(Array[Byte](0, 1, 2, 3, 4)).isEmpty)
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
    // a sheetless workbook is a valid EMPTY document (r14: xlsx
    // extracts like its 1997 sibling), never a docx misroute
    assert(DocumentProbe.extractText(xlsx).contains(""))
    val pptx = zip(Seq("ppt/presentation.xml" -> "<p/>".getBytes))
    assert(DocumentProbe.probe(pptx).map(_.format).contains("pptx"))
    assert(DocumentProbe.extractText(pptx).contains(""))
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

  test("mimetype-less ODF siblings classify by their body class") {
    val ods = graft.queries.EpubFixture.zip(Seq(
      "content.xml" ->
        ("""<office:document-content
           |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0">
           |  <office:body><office:spreadsheet/></office:body>
           |</office:document-content>""".stripMargin).getBytes("UTF-8")))
    // r14: spreadsheets EXTRACT (a cell-less sheet is valid-empty)
    assert(DocumentProbe.probe(ods).map(_.format).contains("ods"))
    assert(DocumentProbe.extractText(ods).contains(""))
    // a class this engine doesn't read stays odf-other
    val odg = graft.queries.EpubFixture.zip(Seq(
      "content.xml" ->
        ("""<office:document-content
           |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0">
           |  <office:body><office:drawing/></office:body>
           |</office:document-content>""".stripMargin).getBytes("UTF-8")))
    assert(DocumentProbe.probe(odg).map(_.format).contains("odf-other"))
    assert(DocumentProbe.extractText(odg).isEmpty)
  }

  test("ods and odp extract through the probe") {
    import graft.queries.OdtFixture
    val ods = OdtFixture.ods(Seq(
      Seq(OdtFixture.cell("alpha"), OdtFixture.cell("42.5", numeric = true)),
      Seq(OdtFixture.cell("beta"))))
    assert(DocumentProbe.probe(ods).map(_.format).contains("ods"))
    assert(DocumentProbe.extractText(ods).contains("alpha\nbeta"))
    val odp = OdtFixture.odp(Seq(
      (Seq("slide one"), Seq("the notes")),
      (Seq("slide two"), Seq.empty)))
    assert(DocumentProbe.probe(odp).map(_.format).contains("odp"))
    assert(DocumentProbe.extractText(odp).contains(
      "slide one\nthe notes\nslide two"))
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
    // plain text is a FORMAT now (r14); binary junk stays (None, None)
    assert(DocumentProbe.probeAndText("junk".getBytes) ==
      (Some("txt"), Some("junk")))
    assert(DocumentProbe.probeAndText(
      Array[Byte](0, 1, 2, 3, 4)) == (None, None))
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
    // refusal classes are NULL; binary junk too (plain TEXT routes)
    assert(txt(PdfFixture.encryptedPdf("x")).isEmpty)
    assert(txt(Array[Byte](0, 1, 2, 3, 4)).isEmpty)
    assert(txt("junk".getBytes).contains("junk"))
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
      (3L, Array[Byte](0, 1, 2, 3, 4)),
      (4L, "<html><body>sql html</body></html>".getBytes("UTF-8")),
      (5L, "sql plain".getBytes("UTF-8"))).toDF("id", "content")
    df.createOrReplaceTempView("mixed_docs")
    val got = spark.sql(
      """SELECT id, document_format(content) AS f,
        |       document_text(content) AS t
        |FROM mixed_docs ORDER BY id""".stripMargin).collect()
    assert(got(0).getString(1) == "docx" && got(0).getString(2) == "sql docx")
    assert(got(1).getString(1) == "rtf" && got(1).getString(2) == "sql rtf")
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
    assert(got(3).getString(1) == "html" && got(3).getString(2) == "sql html")
    assert(got(4).getString(1) == "txt" && got(4).getString(2) == "sql plain")
  }

  test("xlsx and pptx extract through the probe (one ZIP walk)") {
    import graft.queries.{PptxFixture, XlsxFixture}
    val x = XlsxFixture.xlsx1(
      Seq(XlsxFixture.SRef("A1", 0), XlsxFixture.Inline("B1", "inline")),
      sharedStrings = Some(Seq(XlsxFixture.si("shared"))))
    assert(DocumentProbe.probe(x).map(_.format).contains("xlsx"))
    assert(DocumentProbe.extractText(x).contains("shared\ninline"))
    val pp = PptxFixture.pptx(Seq(PptxFixture.Slide(Seq(
      PptxFixture.aPara("deck body")),
      notes = Seq(PptxFixture.aPara("the notes")))))
    assert(DocumentProbe.probe(pp).map(_.format).contains("pptx"))
    assert(DocumentProbe.extractText(pp).contains("deck body\nthe notes"))
  }

  test("html routes through the charset sniff + htmlToText cascade") {
    val html = ("<!DOCTYPE html><html><head><title>T</title>" +
      "<script>var x=1;</script></head>" +
      "<body><p>Hello&nbsp;&amp; welcome</p></body></html>").getBytes("UTF-8")
    assert(DocumentProbe.probe(html).map(_.format).contains("html"))
    val t = DocumentProbe.extractText(html).get
    assert(t.contains("Hello") && t.contains("& welcome"))
    assert(!t.contains("var x"))
    // case-insensitive, BOM + leading whitespace skipped
    val bommed = "\uFEFF  \n<HTML><body>upper</body></HTML>".getBytes("UTF-8")
    assert(DocumentProbe.probe(bommed).map(_.format).contains("html"))
    // a meta-declared legacy charset decodes through the sniff
    val legacy = ("<html><head><meta charset=\"windows-1252\"></head>" +
      "<body>caf\u00e9</body></html>").getBytes("windows-1252")
    assert(DocumentProbe.extractText(legacy).exists(_.contains("caf\u00e9")))
  }

  test("plain UTF-8 text routes as txt; binary stays None") {
    val txt = "just some plain corpus text\nwith two lines".getBytes("UTF-8")
    assert(DocumentProbe.probe(txt).map(_.format).contains("txt"))
    assert(DocumentProbe.extractText(txt).contains(
      "just some plain corpus text\nwith two lines"))
    // a BOM'd text file strips its BOM
    assert(DocumentProbe.extractText("\uFEFFbom text".getBytes("UTF-8"))
      .contains("bom text"))
    // invalid UTF-8 and NUL-bearing payloads are binary, not text
    assert(DocumentProbe.probe(Array[Byte](0x41, 0xC3.toByte, 0x28, 0x42, 0x43)).isEmpty)
    assert(DocumentProbe.probe("a\u0000b1234".getBytes("UTF-8")).isEmpty)
  }

  test("an RFC 5322 message upgrades from txt to eml; near-misses stay txt") {
    val mail = ("From: a@b.c\r\nTo: list@b.c\r\nSubject: probe\r\n" +
      "\r\nmail body here").getBytes("UTF-8")
    assert(DocumentProbe.probe(mail).map(_.format).contains("eml"))
    assert(DocumentProbe.extractText(mail).contains("mail body here"))
    // one colon-bearing first line is NOT a mail header block
    val note = "title: my notes\njust some text".getBytes("UTF-8")
    assert(DocumentProbe.probe(note).map(_.format).contains("txt"))
    // core headers NOT at the head block don't count
    val tail = ("plain opening line\n\nFrom: x@y.z\nTo: q@r.s\n")
      .getBytes("UTF-8")
    assert(DocumentProbe.probe(tail).map(_.format).contains("txt"))
  }

  test("LaTeX source upgrades from txt and detexes") {
    val tex = ("\\documentclass{article}\n\\begin{document}\n" +
      "Hello \\emph{arXiv} here.\n\\end{document}\n").getBytes("UTF-8")
    assert(DocumentProbe.probe(tex).map(_.format).contains("latex"))
    assert(DocumentProbe.extractText(tex).contains("Hello arXiv here."))
    // mere prose mentioning TeX stays txt
    val prose = "I like documentclass as a word".getBytes("UTF-8")
    assert(DocumentProbe.probe(prose).map(_.format).contains("txt"))
  }

  test("document titles surface across every declaring format") {
    import graft.queries.{LegacyDocFixture, OdtFixture, PdfFixture}
    def ti(b: Array[Byte]) = DocumentProbe.title(b)
    // OPC core properties
    assert(ti(DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
      coreTitle = Some("Quarterly Report"))).contains("Quarterly Report"))
    // ODF meta.xml
    assert(ti(OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
      metaTitle = Some("Meeting Notes"))).contains("Meeting Notes"))
    // EPUB OPF
    assert(ti(EpubFixture.epub("The Book Title", Seq(
      "c.xhtml" -> EpubFixture.xhtml("x")))).contains("The Book Title"))
    // PDF Info dict
    assert(ti(PdfFixture.titledPdf("A PDF Title", Seq("BT (x) Tj ET")))
      .contains("A PDF Title"))
    // OLEPS on a legacy container
    assert(ti(LegacyDocFixture.cfb(Seq(
      "WordDocument" -> "stub".getBytes,
      "\u0005SummaryInformation" ->
        LegacyDocFixture.summaryInfo("Legacy Title"))))
      .contains("Legacy Title"))
    // RTF info group
    assert(ti(("{\\rtf1{\\info{\\title The RTF Title}}body\\par}")
      .getBytes("ISO-8859-1")).contains("The RTF Title"))
    // html <title> through the entity cascade
    assert(ti(("<html><head><title>Page &amp; Title</title></head>" +
      "<body>x</body></html>").getBytes("UTF-8"))
      .contains("Page & Title"))
    // mail Subject (RFC 2047)
    assert(ti(("From: a@b.c\r\nTo: l@b.c\r\n" +
      "Subject: =?UTF-8?B?Sm9zw6k=?= speaks\r\n\r\nbody")
      .getBytes("UTF-8")).contains("José speaks"))
    // latex \\title{...} detexed
    assert(ti(("\\documentclass{article}\\title{The \\emph{Tex} Title}" +
      "\\begin{document}x\\end{document}").getBytes("UTF-8"))
      .contains("The Tex Title"))
    // formats/payloads without one: None, never a throw
    assert(ti(DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x")))))
      .isEmpty)
    assert(ti("plain text, no title".getBytes).isEmpty)
    assert(ti(Array[Byte](0, 1, 2, 3, 4)).isEmpty)
    assert(ti(null).isEmpty)
  }

  test("scan(): a directory of mixed files reads in one call") {
    import graft.queries.PdfFixture
    val dir = java.nio.file.Files.createTempDirectory("graft_docscan")
    java.nio.file.Files.write(dir.resolve("a.pdf"),
      PdfFixture.titledPdf("Scanned PDF", Seq(
        s"BT ${PdfFixture.lit("pdf body")} Tj ET"),
        created = Some("D:20240102030405+00'00'")))
    java.nio.file.Files.write(dir.resolve("b.txt"),
      "plain body of english text for the language router"
        .getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("c.bin"),
      Array[Byte](0, 1, 2, 3, 4))
    val rows = DocumentProbe.scan(spark, dir.toString)
      .orderBy("path").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("format") == "pdf")
    assert(rows(0).getAs[String]("title") == "Scanned PDF")
    assert(rows(0).getAs[String]("date") == "2024-01-02T03:04:05")
    assert(rows(0).getAs[String]("text") == "pdf body")
    assert(rows(1).getAs[String]("format") == "txt")
    assert(rows(1).getAs[String]("text") ==
      "plain body of english text for the language router")
    assert(rows(1).getAs[String]("language") == "en")
    assert(rows(1).getAs[String]("date") == null)
    assert(rows(2).getAs[String]("format") == null) // inventory row
    assert(rows(2).getAs[String]("language") == null)
  }

  test("document authors surface across every declaring format") {
    import graft.queries.{LegacyDocFixture, OdtFixture, PdfFixture}
    def au(b: Array[Byte]) = DocumentProbe.author(b)
    assert(au(DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
      coreTitle = Some("T"))).contains("fixture"))
    assert(au(OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
      metaTitle = Some("T"))).contains("odf author"))
    assert(au(EpubFixture.epub("B", Seq(
      "c.xhtml" -> EpubFixture.xhtml("x")))).contains("epub author"))
    assert(au(PdfFixture.titledPdf("T", Seq("BT (x) Tj ET"),
      author = Some("Ada Lovelace"))).contains("Ada Lovelace"))
    assert(au(LegacyDocFixture.cfb(Seq(
      "WordDocument" -> "stub".getBytes,
      "\u0005SummaryInformation" -> LegacyDocFixture.summaryInfo(
        "T", author = Some("Legacy Author")))))
      .contains("Legacy Author"))
    assert(au("{\\rtf1{\\info{\\author The RTF Author}}x\\par}"
      .getBytes("ISO-8859-1")).contains("The RTF Author"))
    assert(au(("<html><head><meta content=\"Rev Writer\" " +
      "name=\"author\"></head><body>x</body></html>").getBytes("UTF-8"))
      .contains("Rev Writer")) // reversed attribute order
    assert(au(("From: a@b.c\r\nTo: l@b.c\r\n\r\nbody").getBytes("UTF-8"))
      .contains("a@b.c"))
    assert(au(("\\documentclass{x}\\author{A. Student}" +
      "\\begin{document}x\\end{document}").getBytes("UTF-8"))
      .contains("A. Student"))
    assert(au("nobody signed this".getBytes).isEmpty)
    assert(au(Array[Byte](0, 1, 2)).isEmpty)
    assert(au(null).isEmpty)
  }

  test("creation dates: binary forms normalize to ISO, text passes through") {
    import graft.queries.{LegacyDocFixture, OdtFixture, PdfFixture}
    def dt(b: Array[Byte]) = DocumentProbe.date(b)
    assert(dt(DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
      coreTitle = Some("T"))).contains("2024-05-01T10:00:00Z"))
    assert(dt(OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
      metaTitle = Some("T"))).contains("2023-03-03T09:00:00"))
    assert(dt(PdfFixture.titledPdf("T", Seq("BT (x) Tj ET"),
      created = Some("D:20240102030405+00'00'")))
      .contains("2024-01-02T03:04:05"))
    assert(dt(LegacyDocFixture.cfb(Seq(
      "WordDocument" -> "stub".getBytes,
      "\u0005SummaryInformation" -> LegacyDocFixture.summaryInfo(
        "T", createdIso = Some("2020-06-01T00:00:00Z")))))
      .contains("2020-06-01T00:00:00Z"))
    assert(dt(("{\\rtf1{\\info{\\creatim\\yr2019\\mo7\\dy15" +
      "\\hr8\\min30}}x\\par}").getBytes("ISO-8859-1"))
      .contains("2019-07-15T08:30:00"))
    assert(dt(("From: a@b.c\r\nDate: Mon, 01 Apr 2024 10:00:00 +0000" +
      "\r\n\r\nbody").getBytes("UTF-8"))
      .contains("Mon, 01 Apr 2024 10:00:00 +0000"))
    assert(dt("undated text".getBytes).isEmpty)
    assert(dt(null).isEmpty)
  }

  test("inventory(): the one-parse kernel matches the four column " +
    "kernels field for field") {
    import graft.queries.{LegacyDocFixture, OdtFixture, PdfFixture}
    val payloads: Seq[(String, Array[Byte])] = Seq(
      "docx" -> DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
        coreTitle = Some("Quarterly Report")),
      "odt" -> OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
        metaTitle = Some("Meeting Notes")),
      "epub" -> EpubFixture.epub("The Book Title",
        Seq("c.xhtml" -> EpubFixture.xhtml("chapter body"))),
      "pdf" -> PdfFixture.titledPdf("A PDF Title", Seq("BT (x) Tj ET"),
        created = Some("D:20240102030405+00'00'")),
      "doc" -> LegacyDocFixture.cfb(Seq(
        "WordDocument" -> "stub".getBytes,
        "\u0005SummaryInformation" -> LegacyDocFixture.summaryInfo(
          "Legacy Title", createdIso = Some("2020-06-01T00:00:00Z")))),
      "rtf" -> ("{\\rtf1{\\info{\\title The RTF Title}" +
        "{\\creatim\\yr2019\\mo7\\dy15\\hr8\\min30}}body\\par}")
        .getBytes("ISO-8859-1"),
      "html" -> ("<html><head><title>Page &amp; Title</title>" +
        "<meta name=\"author\" content=\"Web Author\"></head>" +
        "<body>page body</body></html>").getBytes("UTF-8"),
      "eml" -> ("From: a@b.c\r\nTo: l@b.c\r\nSubject: Hello\r\n" +
        "Date: Mon, 01 Apr 2024 10:00:00 +0000\r\n\r\nmail body")
        .getBytes("UTF-8"),
      "latex" -> ("\\documentclass{article}\\title{The Tex Title}" +
        "\\begin{document}tex body\\end{document}").getBytes("UTF-8"),
      "txt" -> "plain text body".getBytes("UTF-8"),
      "binary" -> Array[Byte](0, 1, 2, 3, 4))
    payloads.foreach { case (label, b) =>
      val inv = DocumentProbe.inventory(b)
      assert(inv.format == DocumentProbe.probe(b).map(_.format),
        s"$label format")
      assert(inv.title == DocumentProbe.title(b), s"$label title")
      assert(inv.author == DocumentProbe.author(b), s"$label author")
      assert(inv.date == DocumentProbe.date(b), s"$label date")
      assert(inv.text == DocumentProbe.extractText(b), s"$label text")
    }
    assert(DocumentProbe.inventory(null) ==
      DocumentProbe.inventory(Array[Byte](1)))
  }

  test("BOM-declared UTF-16/32 text routes as txt (the Windows-export " +
    "class); BOM-less UTF-16 stays undecodable") {
    val t = "wide text body"
    def bytes(cs: String): Array[Byte] = ("\uFEFF" + t).getBytes(cs)
    for (cs <- Seq("UTF-16LE", "UTF-16BE", "UTF-32LE", "UTF-32BE")) {
      val b = bytes(cs)
      assert(DocumentProbe.probe(b).exists(_.format == "txt"), cs)
      assert(DocumentProbe.extractText(b).contains(t), cs)
    }
    // BOM-less UTF-16 (NUL-laced bytes): refuse, never guess
    assert(DocumentProbe.extractText(t.getBytes("UTF-16LE")).isEmpty)
    // a BOM with malformed tail refuses (strict, not replacing)
    val torn = bytes("UTF-16LE").dropRight(1)
    assert(DocumentProbe.extractText(torn).isEmpty)
    // UTF-8 with BOM still works (the existing strip)
    assert(DocumentProbe.extractText(("\uFEFF" + t).getBytes("UTF-8"))
      .contains(t))
    // the wide twin routes identically to the narrow one (eml case)
    val eml = "From: a@b.c\r\nTo: l@b.c\r\nSubject: S\r\n\r\nmail body"
    assert(DocumentProbe.probe(("\uFEFF" + eml).getBytes("UTF-16LE"))
      .exists(_.format == "eml"))
  }

  test("data-file blobs classify by magic; text-ish near-misses stay txt") {
    def fmt(b: Array[Byte]) = DocumentProbe.probe(b).map(_.format)
    assert(fmt("PAR1".getBytes ++ Array.fill[Byte](32)(7))
      .contains("parquet"))
    assert(fmt("Obj".getBytes ++ Array[Byte](1) ++ new Array[Byte](16))
      .contains("avro"))
    assert(fmt(("SQLite format 3\u0000" + "z" * 32).getBytes("ISO-8859-1"))
      .contains("sqlite"))
    assert(fmt("ARROW1\u0000\u0000data".getBytes("ISO-8859-1"))
      .contains("arrow"))
    assert(fmt(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1A, '\n') ++ new Array[Byte](8)).contains("hdf5"))
    assert(fmt(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0)
      ++ new Array[Byte](8)).contains("npy"))
    // ORC needs BOTH the header magic and the postscript tail — a
    // text file starting with the letters ORC is still text
    val orc = "ORC".getBytes ++ Array.fill[Byte](20)(3) ++
      "ORC".getBytes ++ Array[Byte](19)
    assert(fmt(orc).contains("orc"))
    assert(fmt("ORC is a database acronym".getBytes).contains("txt"))
    // classification only: no text, no title
    assert(DocumentProbe.extractText(orc).isEmpty)
    assert(DocumentProbe.inventory(orc).format.contains("orc"))
    assert(DocumentProbe.inventory(orc).text.isEmpty)
    // "Obj" WITHOUT the 0x01 marker is plain text
    assert(fmt("Object oriented prose".getBytes).contains("txt"))
  }

  test("scanStream(): a document drop-box streams with batch-identical " +
    "inventory rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scan_stream")
    java.nio.file.Files.write(dir.resolve("a.rtf"),
      "{\\rtf1{\\info{\\title Streamed}}stream body\\par}"
        .getBytes("ISO-8859-1"))
    java.nio.file.Files.write(dir.resolve("b.txt"),
      "plain streamed text".getBytes("UTF-8"))
    val batch = DocumentProbe.scan(spark, dir.toString)
      .orderBy("path")
      .select("path", "format", "title", "language", "text")
      .collect().map(_.toSeq).toSeq
    val q = DocumentProbe.scanStream(spark, dir.toString)
      .writeStream.format("memory").queryName("doc_scan_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.sql(
      "SELECT path, format, title, language, text FROM doc_scan_stream " +
        "ORDER BY path").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.map(_(1)) == Seq("rtf", "txt"))
  }

  test("document outlinks: OPC hyperlink rels, ODF anchors and PDF " +
    "URIs through one column") {
    import graft.queries.EpubFixture.zip
    val hl = "http://schemas.openxmlformats.org/officeDocument/2006/" +
      "relationships/hyperlink"
    val docx = zip(Seq(
      "_rels/.rels" -> ("<Relationships><Relationship Type=\"http://" +
        "schemas.openxmlformats.org/officeDocument/2006/relationships/" +
        "officeDocument\" Target=\"word/document.xml\"/>" +
        "</Relationships>").getBytes,
      "word/document.xml" -> "<document/>".getBytes,
      "word/_rels/document.xml.rels" -> ("<Relationships>" +
        s"""<Relationship Id="r9" Type="$hl" """ +
        "Target=\"https://ref.example.org/x\" TargetMode=\"External\"/>" +
        s"""<Relationship Id="r2" Type="$hl" Target="local.xml"/>""" +
        "<Relationship Id=\"r3\" Type=\"x/image\" " +
        "Target=\"https://cdn.example.org/i.png\" " +
        "TargetMode=\"External\"/>" +
        "</Relationships>").getBytes))
    // only EXTERNAL hyperlink rels extract — internal targets and
    // non-hyperlink externals (images) stay out
    assert(DocumentProbe.links(docx) == Seq("https://ref.example.org/x"))
    val odt = zip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes,
      "content.xml" -> ("""<office:document-content
        | xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        | xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
        | xmlns:xlink="http://www.w3.org/1999/xlink">
        |<office:body><office:text><text:p>
        |<text:a xlink:href="https://a.example.net/1">one</text:a>
        |<text:a xlink:href="../relative">skipped</text:a>
        |</text:p></office:text></office:body>
        |</office:document-content>""".stripMargin).getBytes("UTF-8")))
    assert(DocumentProbe.links(odt) == Seq("https://a.example.net/1"))
    // PDFs ride the same column
    val pdf = PdfFixture.linkPdf(Seq("https://refs.example.org/cite1"))
    assert(DocumentProbe.links(pdf) ==
      Seq("https://refs.example.org/cite1"))
    // EPUB: absolute anchors in content documents; relatives skip
    val epub = graft.queries.EpubFixture.epub("Book", Seq(
      "c1.xhtml" -> ("<html><body><a href=\"https://cited.net/r\">r" +
        "</a><a href='ch2.xhtml'>next</a></body></html>")))
    assert(DocumentProbe.links(epub) == Seq("https://cited.net/r"))
    // the SQL face serves the same column
    locally {
      val sparkS = graft.SparkSpec.session
      graft.GraftExtensions.register(sparkS)
      import sparkS.implicits._
      Seq((1L, pdf)).toDF("id", "doc").createOrReplaceTempView("docl")
      val got = sparkS.sql(
        "SELECT document_links(doc) FROM docl").collect()
      assert(got(0).getSeq[String](0) ==
        Seq("https://refs.example.org/cite1"))
    }
    // formats without links / junk: empty, never a throw
    assert(DocumentProbe.links("plain text".getBytes).isEmpty)
    assert(DocumentProbe.links(Array[Byte](0, 1, 2)).isEmpty)
    assert(DocumentProbe.links(null).isEmpty)
  }

  test("memberInventories(): archives explode to member inventories, " +
    "non-archives pass through, nesting refuses at depth 1") {
    def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, b) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(b); z.closeEntry()
      }
      z.close(); bos.toByteArray
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val rtf = "{\\rtf1 member rtf body\\par}".getBytes("ISO-8859-1")
    val docx = graft.queries.DocxFixture.docx(Seq(
      graft.queries.DocxFixture.para(
        graft.queries.DocxFixture.T("member docx body"))))
    val inner = zip(Seq("deep.txt" -> "too deep".getBytes("UTF-8")))
    val arc = zip(Seq(
      "a.rtf" -> rtf, "doc.docx" -> docx,
      "note.txt" -> "zip note".getBytes("UTF-8"),
      "sub.zip" -> inner, "sub.tgz" -> gz(inner)))
    val got = DocumentProbe.memberInventories(arc).map { case (n, i) =>
      (n, i.format, i.text)
    }
    assert(got == Seq(
      (Some("a.rtf"), Some("rtf"), Some("member rtf body")),
      (Some("doc.docx"), Some("docx"), Some("member docx body")),
      (Some("note.txt"), Some("txt"), Some("zip note")),
      // depth 1: member archives keep their row, refuse their members
      (Some("sub.tgz"), Some("zip"), None),
      (Some("sub.zip"), Some("zip"), None)))
    // non-archive blobs pass through as one NULL-member row
    val solo = DocumentProbe.memberInventories(rtf)
    assert(solo == Seq((None,
      DocumentProbe.inventory(rtf))))
    // a docx is a DOCUMENT package, not an archive: passes through
    val docxRows = DocumentProbe.memberInventories(docx)
    assert(docxRows.length == 1 && docxRows.head._1.isEmpty &&
      docxRows.head._2.format.contains("docx"))
    // empty archive: one row carrying just the archive format
    val empty = DocumentProbe.memberInventories(zip(Seq.empty))
    assert(empty == Seq((None, DocumentProbe.Inventory(
      Some("zip"), None, None, None, None))))
    // junk: one row, empty inventory — never a throw
    assert(DocumentProbe.memberInventories(Array[Byte](9, 9, 9, 9))
      .length == 1)
    assert(DocumentProbe.memberInventories(null).length == 1)
  }
}
