package graft.queries

import java.nio.charset.StandardCharsets.ISO_8859_1

/** INDEPENDENT spec-side PDF writer for gate fixtures (the m28/
  * WebpFixture discipline): files are assembled forward from the ISO
  * 32000 file-structure rules — objects at tracked byte offsets, a
  * classic cross-reference table or a cross-reference STREAM (with an
  * object stream) written from those offsets, trailer, `startxref` —
  * sharing no code with [[graft.engine.read.Pdf]]. Text, fonts and
  * filters are chosen per fixture so every expected extraction is a
  * hand-written literal.
  */
object PdfFixture {

  /** Escape a literal PDF string. */
  def lit(s: String): String =
    "(" + s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)") + ")"

  final class Builder {
    private val out = new java.io.ByteArrayOutputStream()
    private val offsets = scala.collection.mutable.Map.empty[Int, Int]
    out.write("%PDF-1.5\n%âãÏÓ\n".getBytes(ISO_8859_1))

    def offsetOf(num: Int): Int = offsets(num)

    def add(num: Int, body: String): Builder = {
      offsets(num) = out.size()
      out.write(s"$num 0 obj\n$body\nendobj\n".getBytes(ISO_8859_1))
      this
    }

    def addStream(num: Int, dictEntries: String, data: Array[Byte]): Builder = {
      offsets(num) = out.size()
      out.write((s"$num 0 obj\n<< $dictEntries /Length ${data.length} >>\n" +
        "stream\n").getBytes(ISO_8859_1))
      out.write(data)
      out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
      this
    }

    /** Classic xref table + trailer. `extraTrailer` appends raw trailer
      * dict entries (e.g. a dangling `/Encrypt`).
      */
    def finishClassic(rootNum: Int, extraTrailer: String = ""): Array[Byte] = {
      val maxNum = offsets.keys.max
      val xrefOff = out.size()
      val sb = new StringBuilder
      sb.append(s"xref\n0 ${maxNum + 1}\n")
      sb.append("0000000000 65535 f \n")
      (1 to maxNum).foreach { n =>
        offsets.get(n) match {
          case Some(o) => sb.append(f"$o%010d 00000 n \n")
          case None    => sb.append("0000000000 65535 f \n")
        }
      }
      sb.append(s"trailer\n<< /Size ${maxNum + 1} /Root $rootNum 0 R" +
        s" $extraTrailer >>\nstartxref\n$xrefOff\n%%EOF")
      out.toByteArray ++ sb.toString.getBytes(ISO_8859_1)
    }

    /** Cross-reference STREAM finish: writes the xref as a stream
      * object `xrefNum` (W = [1 4 2], no predictor) mapping every
      * added object, plus entries of `compressed` objects living in
      * object stream `stmNum` at index i.
      */
    def finishXrefStream(rootNum: Int, xrefNum: Int,
                         compressed: Seq[(Int, Int, Int)] = Seq.empty)
    : Array[Byte] = {
      val xrefOff = out.size()
      val entries = scala.collection.mutable.Map.empty[Int, (Int, Long, Int)]
      entries(0) = (0, 0L, 65535)
      offsets.foreach { case (n, o) => entries(n) = (1, o.toLong, 0) }
      compressed.foreach { case (n, stm, idx) => entries(n) = (2, stm.toLong, idx) }
      entries(xrefNum) = (1, xrefOff.toLong, 0)
      val maxNum = entries.keys.max
      val data = new java.io.ByteArrayOutputStream()
      (0 to maxNum).foreach { n =>
        val (t, f2, f3) = entries.getOrElse(n, (0, 0L, 0))
        data.write(t)
        data.write(((f2 >> 24) & 0xff).toInt); data.write(((f2 >> 16) & 0xff).toInt)
        data.write(((f2 >> 8) & 0xff).toInt); data.write((f2 & 0xff).toInt)
        data.write((f3 >> 8) & 0xff); data.write(f3 & 0xff)
      }
      val bytes = data.toByteArray
      val hdr = (s"$xrefNum 0 obj\n<< /Type /XRef /Size ${maxNum + 1} " +
        s"/W [1 4 2] /Root $rootNum 0 R /Length ${bytes.length} >>\n" +
        "stream\n").getBytes(ISO_8859_1)
      out.write(hdr)
      out.write(bytes)
      out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
      out.write(s"startxref\n$xrefOff\n%%EOF".getBytes(ISO_8859_1))
      out.toByteArray
    }
  }

  /** ASCII85 encoder (ISO 32000 §7.4.3 forward): 4 bytes → 5 chars,
    * partial group of n bytes → n+1 chars, `~>` terminator.
    */
  def ascii85(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var t = 0L
      (0 until 4).foreach { k =>
        t = (t << 8) | (if (k < n) data(i + k) & 0xffL else 0L)
      }
      val cs = new Array[Char](5)
      (4 to 0 by -1).foreach { k => cs(k) = ('!' + (t % 85)).toChar; t /= 85 }
      sb.appendAll(cs, 0, n + 1)
      i += n
    }
    (sb.toString + "~>").getBytes(ISO_8859_1)
  }

  /** RunLength encoder: literal chunks of ≤ 128, EOD 128. */
  def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val n = math.min(128, data.length - i)
      out.write(n - 1)
      out.write(data, i, n)
      i += n
    }
    out.write(128)
    out.toByteArray
  }

  /** LZW encoder mirroring the decoder's width schedule (9→12-bit
    * codes MSB-first, clear 256, EOD 257, early-change): the width
    * used to WRITE a code tracks the decoder's dictionary counter —
    * the decoder adds one entry after every data code except the
    * first after a clear.
    */
  def lzw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bits = 0
    var width = 9
    var decoderNext = 258
    var wroteSinceClear = 0
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bits += width
      while (bits >= 8) {
        out.write(((bitBuf >> (bits - 8)) & 0xff).toInt)
        bits -= 8
      }
      if (code != 256 && code != 257) {
        // decoder registers an entry after every data code but the
        // first post-clear, then checks the early-change boundary
        wroteSinceClear += 1
        if (wroteSinceClear >= 2) decoderNext += 1
        if (decoderNext + 1 >= (1 << width) && width < 12) width += 1
      }
    }
    def flushBits(): Unit =
      if (bits > 0) { out.write(((bitBuf << (8 - bits)) & 0xff).toInt); bits = 0 }
    val dict = scala.collection.mutable.Map.empty[(Int, Byte), Int]
    var next = 258
    var cur = -1
    put(256) // leading clear, conventional
    data.foreach { b =>
      if (cur < 0) cur = b & 0xff
      else dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          put(cur)
          if (next < 4096) { dict((cur, b)) = next; next += 1 }
          cur = b & 0xff
      }
    }
    if (cur >= 0) put(cur)
    put(257)
    flushBits()
    out.toByteArray
  }

  /** Forward PNG "Up" row filter (type 2): rows of `columns` bytes,
    * each prefixed with the filter byte, bytes stored as deltas vs
    * the row above — the decoder's predictor-12 inverse must undo it.
    */
  def pngPredictUp(data: Array[Byte], columns: Int): Array[Byte] = {
    require(data.length % columns == 0, "data must be whole rows")
    val out = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r * columns < data.length) {
      out.write(2) // Up
      var i = 0
      while (i < columns) {
        val up = if (r == 0) 0 else data((r - 1) * columns + i) & 0xff
        out.write(((data(r * columns + i) & 0xff) - up) & 0xff)
        i += 1
      }
      r += 1
    }
    out.toByteArray
  }

  /** Forward TIFF horizontal differencing (predictor 2). */
  def tiffPredict(data: Array[Byte], columns: Int): Array[Byte] = {
    require(data.length % columns == 0, "data must be whole rows")
    val out = data.clone()
    var r = 0
    while (r * columns < data.length) {
      var i = columns - 1
      while (i >= 1) {
        val p = r * columns + i
        out(p) = (((data(p) & 0xff) - (data(p - 1) & 0xff)) & 0xff).toByte
        i -= 1
      }
      r += 1
    }
    out
  }

  def flate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def pageObjs(b: Builder, pageNums: Seq[Int], pagesNum: Int,
                       contentNums: Seq[Int], fontRef: String): Unit = {
    pageNums.zip(contentNums).foreach { case (p, c) =>
      b.add(p, s"<< /Type /Page /Parent $pagesNum 0 R " +
        s"/Resources << /Font << /F1 $fontRef >> >> " +
        s"/MediaBox [0 0 612 792] /Contents $c 0 R >>")
    }
    b.add(pagesNum, s"<< /Type /Pages /Count ${pageNums.length} /Kids [" +
      pageNums.map(p => s"$p 0 R").mkString(" ") + "] >>")
  }

  /** One-font (WinAnsi Helvetica) document, one content stream per
    * page; each page's stream is the given raw content source,
    * Flate-compressed when `compress`.
    */
  def simplePdf(pageContents: Seq[String],
                compress: Boolean = false): Array[Byte] = {
    val b = new Builder
    val n = pageContents.length
    val pageNums = (3 until 3 + n)
    val contentNums = (3 + n until 3 + 2 * n)
    val fontNum = 3 + 2 * n
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    pageObjs(b, pageNums, 2, contentNums, s"$fontNum 0 R")
    pageContents.zip(contentNums).foreach { case (src, cn) =>
      val raw = src.getBytes(ISO_8859_1)
      if (compress) b.addStream(cn, "/Filter /FlateDecode", flate(raw))
      else b.addStream(cn, "", raw)
    }
    b.add(fontNum, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    b.finishClassic(1)
  }

  /** [[simplePdf]] plus a trailer `/Info` dict carrying `/Title`
    * (and `/Author` when given).
    */
  def titledPdf(title: String, pageContents: Seq[String],
                author: Option[String] = None,
                created: Option[String] = None): Array[Byte] = {
    val b = new Builder
    val n = pageContents.length
    val pageNums = (3 until 3 + n)
    val contentNums = (3 + n until 3 + 2 * n)
    val fontNum = 3 + 2 * n
    val infoNum = fontNum + 1
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    pageObjs(b, pageNums, 2, contentNums, s"$fontNum 0 R")
    pageContents.zip(contentNums).foreach { case (src, cn) =>
      b.addStream(cn, "", src.getBytes(ISO_8859_1))
    }
    b.add(fontNum, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    val authorPart = author.map(a => s" /Author ${lit(a)}").getOrElse("")
    val createdPart = created.map(c => s" /CreationDate ${lit(c)}").getOrElse("")
    b.add(infoNum, s"<< /Title ${lit(title)}$authorPart$createdPart >>")
    b.finishClassic(1, s"/Info $infoNum 0 R")
  }

  /** A one-page document whose page carries image XObjects: each
    * entry is (name, XObject dict entries, raw stream data). The
    * content stream draws every image (`cm` + `Do`), the shape a
    * scanner/exporter writes.
    */
  def imagePdf(images: Seq[(String, String, Array[Byte])],
               pageText: Option[String] = None): Array[Byte] = {
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    val imgNums = images.indices.map(_ + 6)
    val xobj = images.zip(imgNums)
      .map { case ((n, _, _), num) => s"/$n $num 0 R" }.mkString(" ")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << " +
      s"/Font << /F1 5 0 R >> /XObject << $xobj >> >> " +
      "/MediaBox [0 0 612 792] /Contents 4 0 R >>")
    val draw = images
      .map { case (n, _, _) => s"q 100 0 0 100 0 0 cm /$n Do Q" }
      .mkString("\n")
    val text = pageText
      .map(t => s"\nBT /F1 12 Tf (${t}) Tj ET").getOrElse("")
    b.addStream(4, "", (draw + text).getBytes(ISO_8859_1))
    b.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    images.zip(imgNums).foreach { case ((_, dict, data), num) =>
      b.addStream(num, dict, data)
    }
    b.finishClassic(1)
  }

  /** [[simplePdf]] plus a catalog `/Metadata` XMP packet (and NO
    * `/Info`) — the modern-writer metadata shape.
    */
  def xmpPdf(xmpXml: String, pageContents: Seq[String]): Array[Byte] = {
    val b = new Builder
    val n = pageContents.length
    val pageNums = (3 until 3 + n)
    val contentNums = (3 + n until 3 + 2 * n)
    val fontNum = 3 + 2 * n
    val metaNum = fontNum + 1
    b.add(1, s"<< /Type /Catalog /Pages 2 0 R /Metadata $metaNum 0 R >>")
    pageObjs(b, pageNums, 2, contentNums, s"$fontNum 0 R")
    pageContents.zip(contentNums).foreach { case (src, cn) =>
      b.addStream(cn, "", src.getBytes(ISO_8859_1))
    }
    b.add(fontNum, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    b.addStream(metaNum, "/Type /Metadata /Subtype /XML",
      xmpXml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    b.finishClassic(1)
  }

  /** A conventional XMP packet with dc:title / dc:creator /
    * xmp:CreateDate (title+creator in their rdf:Alt/Seq li forms).
    */
  def xmpPacket(title: String, creator: String,
                created: String): String =
    s"""<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>
       |<x:xmpmeta xmlns:x="adobe:ns:meta/">
       | <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
       |  <rdf:Description rdf:about=""
       |      xmlns:dc="http://purl.org/dc/elements/1.1/"
       |      xmlns:xmp="http://ns.adobe.com/xap/1.0/">
       |   <dc:title><rdf:Alt><rdf:li xml:lang="x-default">$title</rdf:li></rdf:Alt></dc:title>
       |   <dc:creator><rdf:Seq><rdf:li>$creator</rdf:li></rdf:Seq></dc:creator>
       |   <xmp:CreateDate>$created</xmp:CreateDate>
       |  </rdf:Description>
       | </rdf:RDF>
       |</x:xmpmeta>
       |<?xpacket end="w"?>""".stripMargin

  /** One page carrying `/URI` link annotations (plus one internal
    * GoTo that extraction must skip).
    */
  def linkPdf(uris: Seq[String], pageText: String = "linked"): Array[Byte] = {
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    val annotNums = uris.indices.map(_ + 6)
    val gotoNum = 6 + uris.length
    val annots = (annotNums :+ gotoNum).map(n => s"$n 0 R").mkString(" ")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << /Font " +
      s"<< /F1 5 0 R >> >> /MediaBox [0 0 612 792] /Contents 4 0 R " +
      s"/Annots [ $annots ] >>")
    b.addStream(4, "",
      s"BT /F1 12 Tf (${pageText}) Tj ET".getBytes(ISO_8859_1))
    b.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    uris.zip(annotNums).foreach { case (u, n) =>
      b.add(n, "<< /Type /Annot /Subtype /Link /Rect [0 0 100 20] " +
        s"/A << /S /URI /URI ${lit(u)} >> >>")
    }
    b.add(gotoNum, "<< /Type /Annot /Subtype /Link /Rect [0 0 9 9] " +
      "/A << /S /GoTo /D [3 0 R /Fit] >> >>")
    b.finishClassic(1)
  }

  /** One page whose content stream is the given RAW bytes — the
    * inline-image (`BI…ID…EI`) fixtures compose their own operator
    * runs, binary payload included.
    */
  def rawContentPdf(content: Array[Byte]): Array[Byte] = {
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << " +
      "/Font << /F1 5 0 R >> >> /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >>")
    b.addStream(4, "", content)
    b.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    b.finishClassic(1)
  }

  /** A composite (Type0) font with a ToUnicode CMap: 2-byte codes.
    * `bfchars` maps code → text; content writes hex strings of codes.
    */
  def type0Pdf(bfchars: Seq[(Int, String)],
               codeSeq: Seq[Int]): Array[Byte] = {
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    pageObjs(b, Seq(3), 2, Seq(4), "5 0 R")
    val hex = codeSeq.map(c => f"$c%04x").mkString
    b.addStream(4, "", s"BT /F1 12 Tf <$hex> Tj ET".getBytes(ISO_8859_1))
    b.add(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H" +
      " /ToUnicode 6 0 R >>")
    val cmap =
      ("/CIDInit /ProcSet findresource begin\nbegincmap\n" +
        "1 begincodespacerange <0000> <ffff> endcodespacerange\n" +
        s"${bfchars.length} beginbfchar\n" +
        bfchars.map { case (code, txt) =>
          f"<$code%04x> <" + txt.map(ch => f"${ch.toInt}%04x").mkString + ">"
        }.mkString("\n") +
        "\nendbfchar\nendcmap\nend").getBytes(ISO_8859_1)
    b.addStream(6, "", cmap)
    b.finishClassic(1)
  }

  /** Cross-reference-stream + object-stream layout (PDF 1.5 style):
    * catalog/pages/page/font live INSIDE an `/ObjStm`; the content
    * stream and the ObjStm itself are regular objects indexed by the
    * xref stream.
    */
  def xrefStreamPdf(text: String): Array[Byte] = {
    val b = new Builder
    // object stream holds 1 (catalog), 2 (pages), 3 (page), 5 (font)
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1" +
        " 5 0 R >> >> /MediaBox [0 0 612 792] /Contents 4 0 R >>"),
      5 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
        " /Encoding /WinAnsiEncoding >>"))
    val bodies = inner.map(_._2.getBytes(ISO_8859_1))
    val rels = bodies.scanLeft(0)((acc, x) => acc + x.length + 1).init
    val header = inner.map(_._1).zip(rels)
      .map { case (num, rel) => s"$num $rel" }.mkString(" ") + "\n"
    val stmData = header.getBytes(ISO_8859_1) ++
      bodies.flatMap(_ :+ '\n'.toByte)
    b.addStream(7, s"/Type /ObjStm /N ${inner.length} " +
      s"/First ${header.length} /Filter /FlateDecode", flate(stmData))
    b.addStream(4, "/Filter /FlateDecode",
      flate(s"BT /F1 12 Tf ${lit(text)} Tj ET".getBytes(ISO_8859_1)))
    b.finishXrefStream(rootNum = 1, xrefNum = 8,
      compressed = inner.map(_._1).zipWithIndex.map { case (n, i) => (n, 7, i) })
  }

  /** Structurally valid but encrypted-flagged document — must extract
    * to None, never to text.
    */
  // ---- standard-security-handler encryptor (r14) --------------------
  // Written forward from ISO 32000-1 §7.6.3 with its OWN RC4 and
  // algorithm-3.x implementations — no code shared with
  // [[graft.engine.read.PdfCrypt]] (the m28 independent-writer
  // discipline; MD5/AES come from the JDK on both sides).

  private val StdPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def fxMd5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update); d.digest()
  }

  /** The fixture's own RC4 (independent transcription of the
    * published cipher).
    */
  private def fxRc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = (0 until 256).toArray
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    for (k <- data.indices) {
      a = (a + 1) & 0xFF; b = (b + s(a)) & 0xFF
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xFF)).toByte
    }
    out
  }

  private def fxPad(pw: String): Array[Byte] =
    (pw.getBytes(ISO_8859_1) ++ StdPad).take(32)

  private def fxIntLE(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def hexStr(b: Array[Byte]): String =
    "<" + b.map("%02X".format(_)).mkString + ">"

  /** Keys + O/U for R3 (RC4-128) or R4/AESV2, per algorithms 3.2–3.5. */
  final case class StdCrypt(o: Array[Byte], u: Array[Byte],
                            fileKey: Array[Byte], p: Long,
                            id0: Array[Byte], aes: Boolean) {
    def objKey(num: Int, gen: Int): Array[Byte] = {
      val salt = if (aes)
        Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte)
      else Array.emptyByteArray
      fxMd5(fileKey,
        Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
          ((num >> 16) & 0xFF).toByte,
          (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte),
        salt).take(math.min(fileKey.length + 5, 16))
    }
    def enc(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (!aes) fxRc4(objKey(num, gen), data)
      else {
        // deterministic IV (a fixture may be deterministic; real
        // writers randomize) + PKCS#5 pad
        val iv = Array.tabulate[Byte](16)(i => (i * 7 + num).toByte)
        val padLen = 16 - (data.length % 16)
        val padded = data ++ Array.fill(padLen)(padLen.toByte)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey(num, gen), "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(padded)
      }
  }

  /** Build the handler dict values for owner password `ownerPw` and
    * user password `userPw` (blank = the crawl-openable class).
    */
  def stdCrypt(ownerPw: String, userPw: String,
               aes: Boolean = false): StdCrypt = {
    val r = if (aes) 4 else 3
    val n = 16 // /Length 128
    val id0 = Array.tabulate[Byte](16)(i => (0x30 + i).toByte)
    val p = -44L
    // Algorithm 3.3: /O from the owner password
    var oKey = fxMd5(fxPad(ownerPw))
    for (_ <- 0 until 50) oKey = fxMd5(oKey.take(n))
    val rc4Key = oKey.take(n)
    var o = fxRc4(rc4Key, fxPad(userPw))
    for (i <- 1 to 19)
      o = fxRc4(rc4Key.map(b => (b ^ i).toByte), o)
    // Algorithm 3.2: the file key for userPw
    var key = fxMd5(fxPad(userPw), o, fxIntLE(p), id0).take(n)
    for (_ <- 0 until 50) key = fxMd5(key.take(n)).take(n)
    // Algorithm 3.5 (R>=3): /U
    var u16 = fxRc4(key, fxMd5(StdPad, id0))
    for (i <- 1 to 19)
      u16 = fxRc4(key.map(b => (b ^ i).toByte), u16)
    val u = u16 ++ new Array[Byte](16)
    StdCrypt(o, u, key, p, id0, aes)
  }

  /** A one-page PDF encrypted with the standard handler: content
    * stream + Info /Title encrypted per object; `userPw = ""` is the
    * openable class, anything else must stay refused.
    */
  def stdEncryptedPdf(text: String, title: String,
                      ownerPw: String = "owner", userPw: String = "",
                      aes: Boolean = false): Array[Byte] = {
    val cr = stdCrypt(ownerPw, userPw, aes)
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    pageObjs(b, Seq(3), 2, Seq(4), "5 0 R")
    val content = s"BT /F1 12 Tf ${lit(text)} Tj ET".getBytes(ISO_8859_1)
    b.addStream(4, "", cr.enc(4, 0, content))
    b.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    val cfPart =
      if (aes)
        " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>" +
          " /StmF /StdCF /StrF /StdCF"
      else ""
    b.add(6, s"<< /Filter /Standard /V ${if (aes) 4 else 2} " +
      s"/R ${if (aes) 4 else 3} /Length 128 /P ${cr.p} " +
      s"/O ${hexStr(cr.o)} /U ${hexStr(cr.u)}$cfPart >>")
    b.add(7, s"<< /Title ${hexStr(cr.enc(7, 0, title.getBytes(ISO_8859_1)))} >>")
    b.finishClassic(1,
      s"/Encrypt 6 0 R /Info 7 0 R /ID [ ${hexStr(cr.id0)} ${hexStr(cr.id0)} ]")
  }

  /** [[stdEncryptedPdf]] carrying an image XObject — the scanned-PDF
    * blank-password class: the IMAGE stream encrypts per object like
    * every other stream.
    */
  def stdEncryptedImagePdf(samples: Array[Byte], w: Int, h: Int,
                           userPw: String = ""): Array[Byte] = {
    val cr = stdCrypt("owner", userPw, aes = false)
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
    b.add(3, "<< /Type /Page /Parent 2 0 R /Resources << /XObject " +
      "<< /Im0 5 0 R >> >> /MediaBox [0 0 612 792] /Contents 4 0 R >>")
    b.addStream(4, "",
      cr.enc(4, 0, s"q $w 0 0 $h 0 0 cm /Im0 Do Q".getBytes(ISO_8859_1)))
    b.addStream(5, s"/Type /XObject /Subtype /Image /Width $w " +
      s"/Height $h /ColorSpace /DeviceGray /BitsPerComponent 8",
      cr.enc(5, 0, samples))
    b.add(6, s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P ${cr.p} " +
      s"/O ${hexStr(cr.o)} /U ${hexStr(cr.u)} >>")
    b.finishClassic(1,
      s"/Encrypt 6 0 R /ID [ ${hexStr(cr.id0)} ${hexStr(cr.id0)} ]")
  }

  // ---- V5 / AES-256 (R5 legacy, R6 ISO 32000-2) ---------------------

  private def fxSha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update); d.digest()
  }

  private def fxAesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
                       data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** The fixture's OWN algorithm 2.B (independent transcription). */
  private def fx2B(pw: Array[Byte], salt: Array[Byte]): Array[Byte] = {
    var k = fxSha("SHA-256", pw, salt)
    var e = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e.last & 0xFF) > i - 32) {
      val block = pw ++ k
      val k1 = Array.fill(64)(block).flatten
      e = fxAesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32), k1)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = fxSha(Seq("SHA-256", "SHA-384", "SHA-512")(mod), e)
      i += 1
    }
    k.take(32)
  }

  /** A one-page AES-256 PDF (R6 by default, R5 legacy): /U carries
    * hash ‖ validation salt ‖ key salt for `userPw`, /UE wraps the
    * file key; the blank password opens it iff `userPw` is blank.
    */
  def stdEncryptedPdfV5(text: String, title: String, r: Int = 6,
                        userPw: String = ""): Array[Byte] = {
    require(r == 5 || r == 6, s"V5 revision must be 5 or 6: $r")
    val pw = userPw.getBytes(ISO_8859_1)
    val validationSalt = Array.tabulate[Byte](8)(i => (0x11 * (i + 1)).toByte)
    val keySalt = Array.tabulate[Byte](8)(i => (0x21 + 3 * i).toByte)
    val fileKey = Array.tabulate[Byte](32)(i => (i * 5 + 9).toByte)
    def hashOf(salt: Array[Byte]): Array[Byte] =
      if (r == 6) fx2B(pw, salt) else fxSha("SHA-256", pw, salt)
    val u = hashOf(validationSalt) ++ validationSalt ++ keySalt
    val ue = fxAesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
      hashOf(keySalt), new Array[Byte](16), fileKey)
    def enc(num: Int, data: Array[Byte]): Array[Byte] = {
      val iv = Array.tabulate[Byte](16)(i => (i * 11 + num).toByte)
      val padLen = 16 - (data.length % 16)
      val padded = data ++ Array.fill(padLen)(padLen.toByte)
      iv ++ fxAesCbc(javax.crypto.Cipher.ENCRYPT_MODE, fileKey, iv, padded)
    }
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    pageObjs(b, Seq(3), 2, Seq(4), "5 0 R")
    b.addStream(4, "", enc(4,
      s"BT /F1 12 Tf ${lit(text)} Tj ET".getBytes(ISO_8859_1)))
    b.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>")
    b.add(6, s"<< /Filter /Standard /V 5 /R $r /Length 256 /P -44 " +
      s"/O ${hexStr(new Array[Byte](48))} /U ${hexStr(u)} " +
      s"/OE ${hexStr(new Array[Byte](32))} /UE ${hexStr(ue)} " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
      "/StmF /StdCF /StrF /StdCF >>")
    b.add(7, s"<< /Title ${hexStr(enc(7, title.getBytes(ISO_8859_1)))} >>")
    b.finishClassic(1, "/Encrypt 6 0 R /Info 7 0 R")
  }

  def encryptedPdf(text: String): Array[Byte] = {
    val b = new Builder
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    pageObjs(b, Seq(3), 2, Seq(4), "5 0 R")
    b.addStream(4, "", s"BT /F1 12 Tf ${lit(text)} Tj ET".getBytes(ISO_8859_1))
    b.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(6, "<< /Filter /Standard /V 1 /R 2 >>")
    b.finishClassic(1, extraTrailer = "/Encrypt 6 0 R")
  }
}
