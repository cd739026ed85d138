package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PdfFixture

/** PDF text extraction against the INDEPENDENT spec-side writer
  * ([[PdfFixture]], the m28 discipline).
  */
class PdfSpec extends AnyFunSuite {

  test("uncompressed single page: Tj text extracts") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (Hello crawl world.) Tj ET"))
    val got = Pdf.extractText(pdf).get
    assert(got.nPages == 1)
    assert(got.text == "Hello crawl world.")
  }

  test("Flate-compressed content and multiple pages join with form feed") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (page one) Tj ET",
      "BT /F1 12 Tf (page two) Tj ET"), compress = true)
    val got = Pdf.extractText(pdf).get
    assert(got.nPages == 2)
    assert(got.text == "page one\fpage two")
  }

  test("TJ arrays concatenate; large negative kerns read as spaces") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf [(Hel) -20 (lo) -250 (world)] TJ ET"))
    assert(Pdf.extractText(pdf).get.text == "Hello world")
  }

  test("quote operators and Td vertical moves break lines") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (line one) Tj 0 -14 Td (line two) Tj (cont) Tj " +
        "(line three) ' ET"))
    assert(Pdf.extractText(pdf).get.text ==
      "line one\nline twocont\nline three")
  }

  test("WinAnsi high bytes decode through the JVM cp1252 table") {
    // é = 0xE9 in windows-1252; literal string with an octal escape
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (caf\\351 r\\351sum\\351) Tj ET"))
    assert(Pdf.extractText(pdf).get.text == "café résumé")
  }

  test("escapes in literal strings: parens, backslash, octal, newline") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (a\\(b\\)c\\\\d\\012e) Tj ET"))
    assert(Pdf.extractText(pdf).get.text == "a(b)c\\d\ne")
  }

  test("Type0 font with ToUnicode CMap: 2-byte codes map; no CMap drops") {
    val pdf = PdfFixture.type0Pdf(
      bfchars = Seq(1 -> "H", 2 -> "i", 3 -> "!"),
      codeSeq = Seq(1, 2, 3))
    assert(Pdf.extractText(pdf).get.text == "Hi!")
    // same layout without the CMap: strings drop whole, doc still opens
    val b = new PdfFixture.Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1" +
      " 5 0 R >> >> /Contents 4 0 R >>")
    b.addStream(4, "", "BT /F1 12 Tf <00480069> Tj ET".getBytes("ISO-8859-1"))
    b.add(5, "<< /Type /Font /Subtype /Type0 /BaseFont /NoMap >>")
    val got = Pdf.extractText(b.finishClassic(1)).get
    assert(got.nPages == 1 && got.text == "")
  }

  test("xref stream + object stream layout (PDF 1.5) extracts") {
    val pdf = PdfFixture.xrefStreamPdf("compressed xref works")
    val got = Pdf.extractText(pdf).get
    assert(got.nPages == 1)
    assert(got.text == "compressed xref works")
  }

  test("encrypted documents return None") {
    val pdf = PdfFixture.encryptedPdf("secret")
    assert(Pdf.extractText(pdf).isEmpty)
    assert(Pdf.meta(pdf).exists(_.encrypted))
  }

  test("meta probes version and page count without decoding text") {
    val pdf = PdfFixture.simplePdf(Seq("BT (a) Tj ET", "BT (b) Tj ET"))
    val m = Pdf.meta(pdf).get
    assert(m.version == "1.5" && m.nPages == 2 && !m.encrypted)
  }

  test("malformed and hostile inputs return None, never partial garbage") {
    assert(Pdf.extractText(null).isEmpty)
    assert(Pdf.extractText(Array.empty[Byte]).isEmpty)
    assert(Pdf.extractText("not a pdf at all".getBytes).isEmpty)
    // valid header, garbage body
    assert(Pdf.extractText(
      ("%PDF-1.4\n" + "x" * 200).getBytes("ISO-8859-1")).isEmpty)
    // truncated: cut a valid file in half — recovery may salvage the
    // surviving objects, but the torn-off text must NEVER surface
    val pdf = PdfFixture.simplePdf(Seq("BT /F1 12 Tf (hello) Tj ET"))
    val torn = Pdf.extractText(pdf.take(pdf.length / 2))
    assert(torn.forall(!_.text.contains("hello")))
    // unsupported filter fails that stream loud → structure None
    val b = new PdfFixture.Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    b.addStream(4, "/Filter /DCTDecode", Array[Byte](1, 2, 3))
    assert(Pdf.extractText(b.finishClassic(1)).isEmpty)
  }

  test("inline images are skipped, text around them survives") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (before) Tj ET " +
        "BI /W 2 /H 2 /CS /G /BPC 8 ID  EI " +
        "BT /F1 12 Tf (after) Tj ET"))
    val got = Pdf.extractText(pdf).get
    assert(got.text == "before\nafter")
  }

  test("a /Contents array is ONE stream: font state crosses boundaries") {
    // stream A selects the Type0+CMap font; stream B carries the
    // show-text operator — per ISO 32000 §7.8.2 they concatenate
    val b = new PdfFixture.Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F9" +
      " 6 0 R >> >> /Contents [4 0 R 5 0 R] >>")
    b.addStream(4, "", "BT /F9 12 Tf".getBytes("ISO-8859-1"))
    b.addStream(5, "", "<000100020003> Tj ET".getBytes("ISO-8859-1"))
    b.add(6, "<< /Type /Font /Subtype /Type0 /BaseFont /Split" +
      " /ToUnicode 7 0 R >>")
    b.addStream(7, "",
      ("begincmap\n1 begincodespacerange <0000> <ffff>" +
        " endcodespacerange\n3 beginbfchar\n<0001> <0059>\n<0002> <0065>\n" +
        "<0003> <0073>\nendbfchar\nendcmap").getBytes("ISO-8859-1"))
    assert(Pdf.extractText(b.finishClassic(1)).get.text == "Yes")
  }

  test("incremental update freeing an object tombstones the old offset") {
    // base: two pages; update: object 6 (page two's content stream)
    // marked FREE. A still-referenced freed object must read as null
    // (empty page), never resurrect from the older xref section.
    val base = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (page one) Tj ET",
      "BT /F1 12 Tf (page two) Tj ET"))
    assert(Pdf.extractText(base).get.text == "page one\fpage two")
    val baseStr = new String(base, "ISO-8859-1")
    val sxIdx = baseStr.lastIndexOf("startxref")
    val baseXref = baseStr.substring(sxIdx + 9).trim.takeWhile(_.isDigit)
    val newXrefOff = base.length + 1
    val update = ("\nxref\n0 1\n0000000000 65535 f \n" +
      "6 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size 8 /Root 1 0 R /Prev $baseXref >>\n" +
      s"startxref\n$newXrefOff\n%%EOF").getBytes("ISO-8859-1")
    val got = Pdf.extractText(base ++ update).get
    assert(got.nPages == 2)
    assert(got.text == "page one\f")
  }

  test("hostile structures fail loud: ref cycles, torn flate, Kids DAG") {
    // indirect-reference cycle reachable from /Root
    val c = new PdfFixture.Builder
    c.add(1, "2 0 R")
    c.add(2, "1 0 R")
    assert(Pdf.extractText(c.finishClassic(1)).isEmpty)
    // truncated Flate content: partial page text must never surface
    val body = ("entropy " + (1 to 80).mkString(" ")).getBytes("ISO-8859-1")
    val full = PdfFixture.flate(
      s"BT /F1 12 Tf (${new String(body, "ISO-8859-1")}) Tj ET"
        .getBytes("ISO-8859-1"))
    val t = new PdfFixture.Builder
    t.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    t.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    t.add(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    t.addStream(4, "/Filter /FlateDecode", full.dropRight(8))
    assert(Pdf.extractText(t.finishClassic(1)).isEmpty)
    // a Kids graph that is not a tree (same node twice) is rejected,
    // not multiply-counted
    val g = new PdfFixture.Builder
    g.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    g.add(2, "<< /Type /Pages /Count 2 /Kids [3 0 R 3 0 R] >>")
    g.add(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    g.addStream(4, "", "BT (x) Tj ET".getBytes("ISO-8859-1"))
    assert(Pdf.extractText(g.finishClassic(1)).isEmpty)
  }

  test("ASCII85, RunLength and LZW filters decode; chains apply in order") {
    def onePage(dict: String, data: Array[Byte]): Array[Byte] = {
      val b = new PdfFixture.Builder
      b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
      b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
      b.add(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
      b.addStream(4, dict, data)
      b.finishClassic(1)
    }
    val src = "BT /F1 12 Tf (filtered text) Tj ET".getBytes("ISO-8859-1")
    assert(Pdf.extractText(onePage("/Filter /ASCII85Decode",
      PdfFixture.ascii85(src))).get.text == "filtered text")
    assert(Pdf.extractText(onePage("/Filter /RunLengthDecode",
      PdfFixture.runLength(src))).get.text == "filtered text")
    assert(Pdf.extractText(onePage("/Filter /LZWDecode",
      PdfFixture.lzw(src))).get.text == "filtered text")
    // a chain decodes in listed order: stored = a85(flate(plain))
    assert(Pdf.extractText(onePage(
      "/Filter [/ASCII85Decode /FlateDecode]",
      PdfFixture.ascii85(PdfFixture.flate(src)))).get.text == "filtered text")
    // LZW on longer repetitive input exercises width growth + KwKwK
    val long = ("the quick brown fox " * 40).trim
    assert(Pdf.extractText(onePage("/Filter /LZWDecode",
      PdfFixture.lzw(s"BT /F1 12 Tf (${long}) Tj ET".getBytes("ISO-8859-1"))))
      .get.text == long)
  }

  test("DecodeParms predictors invert: PNG Up (12) and TIFF (2)") {
    def onePage(dict: String, data: Array[Byte]): Array[Byte] = {
      val b = new PdfFixture.Builder
      b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
      b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
      b.add(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
      b.addStream(4, dict, data)
      b.finishClassic(1)
    }
    // pad the content to whole predictor rows with spaces
    val cols = 16
    val base = "BT /F1 12 Tf (predicted rows) Tj ET"
    val src = (base + " " * ((cols - base.length % cols) % cols))
      .getBytes("ISO-8859-1")
    val png = onePage(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >>",
      PdfFixture.flate(PdfFixture.pngPredictUp(src, cols)))
    assert(Pdf.extractText(png).get.text == "predicted rows")
    val tiff = onePage(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns $cols >>",
      PdfFixture.flate(PdfFixture.tiffPredict(src, cols)))
    assert(Pdf.extractText(tiff).get.text == "predicted rows")
  }

  test("ToUnicode bfrange: increment and array forms; MacRoman bytes") {
    val b = new PdfFixture.Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1" +
      " 5 0 R >> >> /Contents 4 0 R >>")
    // codes 0x10..0x12 → 'a'..'c' (increment form); 0x20,0x21 → "Zz"
    // per-code strings (array form)
    b.addStream(4, "",
      "BT /F1 12 Tf <00100011001200200021> Tj ET".getBytes("ISO-8859-1"))
    b.add(5, "<< /Type /Font /Subtype /Type0 /BaseFont /R /ToUnicode 6 0 R >>")
    b.addStream(6, "",
      ("begincmap\n1 begincodespacerange <0000> <ffff> endcodespacerange\n" +
        "1 beginbfrange <0010> <0012> <0061> endbfrange\n" +
        "1 beginbfrange <0020> <0021> [<005a> <007a>] endbfrange\n" +
        "endcmap").getBytes("ISO-8859-1"))
    assert(Pdf.extractText(b.finishClassic(1)).get.text == "abcZz")
    // MacRoman: 0x8E = é in x-MacRoman
    val m = new PdfFixture.Builder
    m.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    m.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    m.add(3, "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1" +
      " 5 0 R >> >> /Contents 4 0 R >>")
    m.addStream(4, "", "BT /F1 12 Tf <63616688> Tj ET".getBytes("ISO-8859-1"))
    m.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Times" +
      " /Encoding /MacRomanEncoding >>")
    val got = Pdf.extractText(m.finishClassic(1)).get.text
    assert(got == new String(Array[Byte](0x63, 0x61, 0x66, 0x88.toByte),
      java.nio.charset.Charset.forName("x-MacRoman")))
  }

  test("leading junk before the header tolerated; offsets re-anchor") {
    val pdf = PdfFixture.simplePdf(Seq("BT /F1 12 Tf (anchored) Tj ET"))
    val junk = "HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1")
    assert(Pdf.extractText(junk ++ pdf).get.text == "anchored")
  }

  test("xref recovery: lying startxref and absent tables still extract") {
    val pdf = PdfFixture.simplePdf(Seq("BT /F1 12 Tf (recovered) Tj ET"))
    val s = new String(pdf, "ISO-8859-1")
    // corrupt the startxref offset (points mid-file)
    val idx = s.lastIndexOf("startxref")
    val numStart = idx + 10
    val lying = pdf.clone()
    lying(numStart) = '7'; lying(numStart + 1) = '\n'
    assert(Pdf.extractText(lying).exists(_.text == "recovered"))
    // chop the whole tail from 'xref' on: no table at all
    val cut = s.lastIndexOf("xref")
    assert(Pdf.extractText(pdf.take(cut)).exists(_.text == "recovered"))
    // the modern layout: catalog lives INSIDE an ObjStm — recovery
    // must expand recovered object streams and take the XRef stream's
    // dict as the trailer
    val modern = PdfFixture.xrefStreamPdf("modern recovery")
    val ms = new String(modern, "ISO-8859-1")
    val mIdx = ms.lastIndexOf("startxref")
    val lying2 = modern.clone()
    lying2(mIdx + 10) = '3'; lying2(mIdx + 11) = '\n'
    assert(Pdf.extractText(lying2).exists(_.text == "modern recovery"))
  }

  test("hex strings and odd-digit tails decode") {
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf <48656c6c6f> Tj ET"))
    assert(Pdf.extractText(pdf).get.text == "Hello")
  }

  test("owner-locked PDFs with a BLANK user password open (RC4 and AES)") {
    // the dominant real-world "encrypted" class: restrictions only
    val rc4 = PdfFixture.stdEncryptedPdf(
      "rc4 secret body", "RC4 Title")
    assert(Pdf.extractText(rc4).map(_.text).contains("rc4 secret body"))
    val m = Pdf.meta(rc4).get
    assert(!m.encrypted) // encrypted-AND-UNREADABLE is the flag
    assert(m.title.contains("RC4 Title"))
    val aes = PdfFixture.stdEncryptedPdf(
      "aes secret body", "AES Title", aes = true)
    assert(Pdf.extractText(aes).map(_.text).contains("aes secret body"))
    assert(Pdf.meta(aes).get.title.contains("AES Title"))
  }

  test("xref recovery on an ENCRYPTED pdf serves plaintext, not " +
    "the pre-key ciphertext cache") {
    // recovery fetches-and-caches every object BEFORE the blank
    // password can verify (the trailer is assembled in that pass);
    // the key setup must invalidate those ciphertext parses
    def breakXref(pdf: Array[Byte]): Array[Byte] = {
      val s = new String(pdf, "ISO-8859-1")
      val idx = s.lastIndexOf("startxref")
      val lying = pdf.clone()
      lying(idx + 10) = '7'; lying(idx + 11) = '\n'
      lying
    }
    for (useAes <- Seq(false, true)) {
      val pdf = breakXref(PdfFixture.stdEncryptedPdf(
        "recovered secret body", "Recovered Title", aes = useAes))
      assert(Pdf.extractText(pdf).map(_.text)
        .contains("recovered secret body"))
      val m = Pdf.meta(pdf).get
      assert(!m.encrypted)
      assert(m.title.contains("Recovered Title"))
    }
    // a REAL password through the same recovery path still refuses
    val locked = breakXref(PdfFixture.stdEncryptedPdf(
      "protected body", "T", userPw = "secret"))
    assert(Pdf.extractText(locked).isEmpty)
  }

  test("a REAL user password still refuses; so does the legacy stub") {
    val locked = PdfFixture.stdEncryptedPdf(
      "protected body", "T", userPw = "secret")
    assert(Pdf.extractText(locked).isEmpty)
    assert(Pdf.meta(locked).exists(_.encrypted))
    assert(Pdf.meta(locked).get.title.isEmpty)
    // the O/U-less legacy fixture stays refused too
    assert(Pdf.extractText(PdfFixture.encryptedPdf("x")).isEmpty)
    assert(Pdf.meta(PdfFixture.encryptedPdf("x")).exists(_.encrypted))
  }

  test("blank-password decryption rides the document probe") {
    val b = PdfFixture.stdEncryptedPdf("probe body", "Probe Title")
    assert(DocumentProbe.extractText(b).contains("probe body"))
    assert(DocumentProbe.title(b).contains("Probe Title"))
    val meta = DocumentProbe.probe(b).get
    assert(meta.format == "pdf" && !meta.encrypted)
  }

  test("AES-256 (R6 and legacy R5) blank-password PDFs open; real ones refuse") {
    val r6 = PdfFixture.stdEncryptedPdfV5("aes256 body", "R6 Title")
    assert(Pdf.extractText(r6).map(_.text).contains("aes256 body"))
    val m = Pdf.meta(r6).get
    assert(!m.encrypted && m.title.contains("R6 Title"))
    val r5 = PdfFixture.stdEncryptedPdfV5("legacy body", "R5 Title", r = 5)
    assert(Pdf.extractText(r5).map(_.text).contains("legacy body"))
    assert(Pdf.meta(r5).get.title.contains("R5 Title"))
    // a REAL user password refuses under both revisions
    val locked = PdfFixture.stdEncryptedPdfV5("hidden", "T", userPw = "pw")
    assert(Pdf.extractText(locked).isEmpty)
    assert(Pdf.meta(locked).exists(_.encrypted))
  }

  test("XMP metadata: dc/xmp fields surface when Info is absent; " +
    "Info wins when both declare") {
    val xmp = PdfFixture.xmpPacket("XMP Title", "XMP Author",
      "2021-03-04T05:06:07Z")
    val pdf = PdfFixture.xmpPdf(xmp,
      Seq("BT /F1 12 Tf (xmp body) Tj ET"))
    val m = Pdf.meta(pdf).get
    assert(m.title.contains("XMP Title"))
    assert(m.author.contains("XMP Author"))
    assert(m.created.contains("2021-03-04T05:06:07Z"))
    assert(Pdf.extractText(pdf).map(_.text).contains("xmp body"))
    // the document layer reads the same fields through its front door
    assert(DocumentProbe.title(pdf).contains("XMP Title"))
    // Info beats XMP when both declare (the incumbent readers' order)
    val both = PdfFixture.titledPdf("Info Title",
      Seq("BT /F1 12 Tf (t) Tj ET"), author = Some("Info Author"))
    assert(Pdf.meta(both).get.title.contains("Info Title"))
    // hostile packets: unparseable XML / wrong object type / torn
    // Flate — metadata is None, the document still reads
    val badXml = PdfFixture.xmpPdf("<x:xmpmeta unclosed",
      Seq("BT /F1 12 Tf (still reads) Tj ET"))
    assert(Pdf.meta(badXml).exists(_.title.isEmpty))
    assert(Pdf.extractText(badXml).map(_.text).contains("still reads"))
  }

  test("URI link annotations extract in order; GoTo and hostiles skip") {
    val pdf = PdfFixture.linkPdf(Seq(
      "https://example.org/paper.pdf",
      "https://mirror.example.net/data",
      "https://example.org/paper.pdf")) // duplicate drops
    assert(Pdf.links(pdf) == Seq(
      "https://example.org/paper.pdf",
      "https://mirror.example.net/data"))
    // text on the page is unaffected by annotations
    assert(Pdf.extractText(pdf).map(_.text).contains("linked"))
    // no annots / junk / encrypted: empty, never a throw
    assert(Pdf.links(PdfFixture.simplePdf(Seq("BT ET"))).isEmpty)
    assert(Pdf.links("not a pdf".getBytes).isEmpty)
    assert(Pdf.links(PdfFixture.stdEncryptedPdfV5("x", "T",
      userPw = "pw")).isEmpty)
    // the cap holds
    val many = PdfFixture.linkPdf(
      (0 until 30).map(i => s"https://e.org/$i"))
    assert(Pdf.links(many, maxLinks = 10).length == 10)
  }

  // ---- embedded image XObjects --------------------------------------

  /** The m63 ramp: pixel (x,y) is gray 10*x on a 9x8 canvas. */
  private def rampRgbSamples: Array[Byte] =
    Array.tabulate(9 * 8 * 3) { i =>
      val x = (i / 3) % 9; (10 * x).toByte
    }
  private def rampGraySamples: Array[Byte] =
    Array.tabulate(9 * 8) { i => (10 * (i % 9)).toByte }

  private def decodePixels(b: Array[Byte]): Array[Int] = {
    val img = graft.multimodal.ImageDecode.decode(b).get
    Array.tabulate(img.getWidth * img.getHeight)(i =>
      img.getRGB(i % img.getWidth, i / img.getWidth) & 0xFFFFFF)
  }

  test("FlateDecode RGB image extracts as a lossless PNG twin") {
    val pdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rampRgbSamples))), pageText = Some("scan page"))
    val imgs = Pdf.images(pdf)
    assert(imgs.length == 1)
    val i = imgs.head
    assert(i.page == 1 && i.name == "Im0" && i.width == 9 &&
      i.height == 8 && i.format == "png")
    // pixels through the ONE ImageDecode front door equal the ramp
    val px = decodePixels(i.bytes)
    assert(px.zipWithIndex.forall { case (p, n) =>
      val g = 10 * (n % 9); p == ((g << 16) | (g << 8) | g)
    })
    // text on the same page still extracts
    assert(Pdf.extractText(pdf).map(_.text).contains("scan page"))
  }

  test("DCTDecode bytes pass through bit-identical to the bare JPEG") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, 0x4D4D4D)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val pdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 16 /Height 16" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
      jpeg)))
    val imgs = Pdf.images(pdf)
    assert(imgs.length == 1 && imgs.head.format == "jpeg")
    assert(java.util.Arrays.equals(imgs.head.bytes, jpeg))
    // an ASCII85 wrapper around the DCT payload unwraps, JPEG intact
    val wrapped = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 16 /Height 16" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8" +
        " /Filter [/ASCII85Decode /DCTDecode]",
      PdfFixture.ascii85(jpeg))))
    val w = Pdf.images(wrapped)
    assert(w.length == 1 && java.util.Arrays.equals(w.head.bytes, jpeg))
  }

  test("gray, indexed and 1-bit images decode; /Decode [1 0] inverts") {
    // DeviceGray 8-bit ramp: same luma as the RGB ramp
    val gray = PdfFixture.imagePdf(Seq(("G0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rampGraySamples))))
    val gpx = decodePixels(Pdf.images(gray).head.bytes)
    assert(gpx.zipWithIndex.forall { case (p, n) =>
      val g = 10 * (n % 9); p == ((g << 16) | (g << 8) | g)
    })
    // Indexed palette: 9 entries, entry i = gray 10*i; 8bpc indices
    val palette = Array.tabulate(27)(i => (10 * (i / 3)).toByte)
    val indices = Array.tabulate[Byte](9 * 8)(i => (i % 9).toByte)
    val idx = PdfFixture.imagePdf(Seq(("I0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        s" /ColorSpace [/Indexed /DeviceRGB 8 ${PdfFixture.lit(
          new String(palette.map(b => (b & 0xFF).toChar)))}]" +
        " /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(indices))))
    val ipx = decodePixels(Pdf.images(idx).head.bytes)
    assert(ipx.sameElements(gpx))
    // 1-bit: first column black, rest white; rows pad to bytes
    // (9 px -> 2 bytes: 0b01111111 0b10000000)
    val bits = Array.fill(8)(Array(0x7F.toByte, 0x80.toByte)).flatten
    val onebit = PdfFixture.imagePdf(Seq(("B0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 1",
      bits)))
    val bpx = decodePixels(Pdf.images(onebit).head.bytes)
    assert(bpx.zipWithIndex.forall { case (p, n) =>
      if (n % 9 == 0) p == 0 else p == 0xFFFFFF
    })
    // the same bits under /Decode [1 0] invert
    val inv = PdfFixture.imagePdf(Seq(("B0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 1 /Decode [1 0]",
      bits)))
    val vpx = decodePixels(Pdf.images(inv).head.bytes)
    assert(vpx.zipWithIndex.forall { case (p, n) =>
      if (n % 9 == 0) p == 0xFFFFFF else p == 0
    })
    // an /ImageMask stencil (no colorspace) reads as bilevel gray
    val mask = PdfFixture.imagePdf(Seq(("M0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ImageMask true",
      bits)))
    assert(decodePixels(Pdf.images(mask).head.bytes)
      .sameElements(bpx))
  }

  test("pdf_image_dhashes SQL function pairs with image_dhash for " +
    "cross-format dedup") {
    val spark = graft.SparkSpec.session
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val pdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rampRgbSamples))))
    // the bare PNG twin with the SAME pixels
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val g = 10 * x; img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Seq((1L, pdf, bos.toByteArray), (2L, Array[Byte](0, 1), Array[Byte](0)))
      .toDF("id", "doc", "img").createOrReplaceTempView("scans")
    val got = spark.sql(
      "SELECT id, pdf_image_dhashes(doc) AS hs, image_dhash(img) AS h" +
        " FROM scans ORDER BY id").collect()
    assert(got(0).getSeq[Long](1) == Seq(got(0).getLong(2)))
    assert(got(1).getSeq[Long](1).isEmpty && got(1).isNullAt(2))
  }

  test("inline images (BI/ID/EI) extract beside XObjects; text survives") {
    def content(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def ascii(s: String) = s.getBytes("US-ASCII")
    // unfiltered gray ramp: exact-length read (9 px * 8 rows)
    val plain = PdfFixture.rawContentPdf(content(
      ascii("BT /F1 12 Tf (before image) Tj ET\n"),
      ascii("BI /W 9 /H 8 /CS /G /BPC 8 ID "),
      rampGraySamples,
      ascii("\nEI\nBT /F1 12 Tf (after image) Tj ET")))
    val pi = Pdf.images(plain)
    assert(pi.length == 1 && pi.head.name == "~inline0" &&
      pi.head.width == 9 && pi.head.format == "png")
    assert(decodePixels(pi.head.bytes).zipWithIndex.forall {
      case (p, n) => val g = 10 * (n % 9); p == ((g << 16) | (g << 8) | g)
    })
    assert(Pdf.extractText(plain).map(_.text)
      .contains("before image\nafter image"))
    // CRLF after ID (common writer behavior): the pair is ONE
    // separator — a one-byte shift would pass the exact-length bound
    // and decode silently wrong pixels (r16 ADVICE)
    val crlf = PdfFixture.rawContentPdf(content(
      ascii("BI /W 9 /H 8 /CS /G /BPC 8 ID\r\n"),
      rampGraySamples,
      ascii("\nEI")))
    val ci = Pdf.images(crlf)
    assert(ci.length == 1 && decodePixels(ci.head.bytes)
      .sameElements(decodePixels(pi.head.bytes)))
    // Flate-filtered: EI delimiter scan; abbreviated filter name
    val flated = PdfFixture.rawContentPdf(content(
      ascii("BI /W 9 /H 8 /CS /G /BPC 8 /F /Fl ID "),
      PdfFixture.flate(rampGraySamples),
      ascii("\nEI")))
    val fi = Pdf.images(flated)
    assert(fi.length == 1 &&
      decodePixels(fi.head.bytes).length == 72)
    // inline DCT passes the JPEG through; CCF (fax) skips recorded
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val dct = PdfFixture.rawContentPdf(content(
      ascii("BI /W 8 /H 8 /CS /RGB /BPC 8 /F /DCT ID "),
      jpeg, ascii("\nEI")))
    val di = Pdf.images(dct)
    assert(di.length == 1 && di.head.format == "jpeg" &&
      java.util.Arrays.equals(di.head.bytes, jpeg))
    assert(Pdf.images(PdfFixture.rawContentPdf(content(
      ascii("BI /W 8 /H 8 /CS /G /BPC 1 /F /CCF ID "),
      Array[Byte](1, 2, 3), ascii("\nEI")))).isEmpty)
    // hostility: BI with no ID/EI, lying dims, torn payload — the
    // scan ends or skips, text extraction elsewhere is unaffected
    for (bad <- Seq(
      ascii("BI /W 9 /H 8 /CS /G /BPC 8 ID 123"),
      ascii("BI /W 1000000 /H 1000000 /CS /G /BPC 8 ID xx\nEI"),
      ascii("BI /W 9 ("))) {
      assert(Pdf.images(PdfFixture.rawContentPdf(bad)).isEmpty)
    }
    // both sources on one page: XObject first, inline after
    val both = PdfFixture.imagePdf(Seq(("Ax",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rampGraySamples))))
    // imagePdf has no inline hook; assert ordering on the plain doc
    assert(Pdf.images(both).map(_.name) == Seq("Ax"))
  }

  test("hostile embedded images skip the image, never the document") {
    val good = ("Ok0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rampGraySamples))
    // lying dimensions: 100k x 100k from a tiny stream refuses
    val bomb = ("Bomb",
      "/Type /XObject /Subtype /Image /Width 100000 /Height 100000" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8",
      Array[Byte](1, 2, 3))
    // torn samples: fewer bytes than rows demand
    val torn = ("Torn",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8",
      Array[Byte](1, 2, 3))
    // recorded-skip codec
    val ccitt = ("Fax",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 1" +
        " /Filter /CCITTFaxDecode",
      Array[Byte](0, 0, 0))
    // CMYK: out of the re-encode set, skips
    val cmyk = ("K0",
      "/Type /XObject /Subtype /Image /Width 2 /Height 2" +
        " /ColorSpace /DeviceCMYK /BitsPerComponent 8",
      new Array[Byte](16))
    val pdf = PdfFixture.imagePdf(Seq(bomb, torn, ccitt, cmyk, good))
    val imgs = Pdf.images(pdf)
    assert(imgs.map(_.name) == Seq("Bomb", "Fax", "K0", "Ok0", "Torn")
      .filter(_ == "Ok0"))
    // lying DCT: declared DCTDecode but not a JPEG — skips
    val lyingDct = PdfFixture.imagePdf(Seq(("L0",
      "/Type /XObject /Subtype /Image /Width 4 /Height 4" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
      "this is not a jpeg".getBytes("US-ASCII"))))
    assert(Pdf.images(lyingDct).isEmpty)
    // non-PDF and encrypted documents: empty, never a throw
    assert(Pdf.images("not a pdf at all".getBytes("US-ASCII")).isEmpty)
    val locked = PdfFixture.stdEncryptedPdfV5("hidden", "T", userPw = "pw")
    assert(Pdf.images(locked).isEmpty)
    // the BLANK-password encrypted class (a scanned PDF's common
    // form) decrypts its image streams like any other stream
    val encImg = PdfFixture.stdEncryptedImagePdf(rampGraySamples, 9, 8)
    val ei = Pdf.images(encImg)
    assert(ei.length == 1 && ei.head.format == "png")
    assert(decodePixels(ei.head.bytes).zipWithIndex.forall {
      case (p, n) => val g = 10 * (n % 9); p == ((g << 16) | (g << 8) | g)
    })
    // a REAL password refuses the image too
    assert(Pdf.images(PdfFixture.stdEncryptedImagePdf(
      rampGraySamples, 9, 8, userPw = "pw")).isEmpty)
    // the per-document cap holds
    val many = PdfFixture.imagePdf((0 until 12).map(i => (s"Im$i",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rampGraySamples))))
    assert(Pdf.images(many, maxImages = 5).length == 5)
    assert(Pdf.images(many).length == 12)
  }
}
