package graft.engine.read

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Unified document probe + auto-routed text extraction across every
  * document modality the engine reads: PDF, DOCX, XLSX, XLSB, PPTX,
  * ODT/ODS/ODP, EPUB, RTF, the legacy Office trio (doc/ppt/xls),
  * raw HTML, mail and plain UTF-8 text, plus classification-only
  * for plain archives. Compressed payloads (`.gz`/`.zst`/`.bz2`/
  * `.xz`) unwrap first and route as their inner format; encrypted
  * OOXML and FilePass legacy sheets open when a DEFAULT password
  * (blank / VelvetSweatshop) verifies ([[OffCrypto]]) and otherwise
  * stay classification-only. At inventory time a crawl column holds
  * MIXED payloads with unreliable extensions/MIME labels — the
  * dispatch key has to be the bytes themselves:
  *
  *  - `{\rtf`      → rtf
  *  - CFB magic    → [[Ole2.classifyFrom]]: doc / xls / ppt /
  *                   encrypted-ooxml / cfb, with ACCURATE encrypted
  *                   flags (FIB fEncrypted, FilePass, encryption atom)
  *  - `PK` ZIP     → by member: ODF `mimetype` (or a bare
  *                   `content.xml` with the ODF root — some producers
  *                   omit the mimetype entry), OCF
  *                   `META-INF/container.xml`, OPC main parts
  *                   (`word/document.xml` → docx, `xl/workbook.xml` →
  *                   xlsx, `xl/workbook.bin` → xlsb,
  *                   `ppt/presentation.xml` → pptx), else zip
  *  - `%PDF-` (incl. the junk-prefixed recovery class [[Pdf.meta]]
  *    re-anchors) → pdf, with page count and encryption flag
  *  - leading `<!DOCTYPE` / `<html` (BOM/whitespace skipped) → html,
  *    through the engine's charset sniff + htmlToText cascade
  *  - strict UTF-8 with no binary control chars → txt (a crawl
  *    column's residual majority class), upgraded to eml when the
  *    head block reads as RFC 5322 headers ([[Mail.parseEmlString]])
  *    or to latex when the head carries `\documentclass` /
  *    `\begin{document}` ([[graft.ops.Latex.extractText]] detexes)
  *
  * `extractText` routes to the matching extractor (pdf/docx/xlsx/
  * pptx/odt/epub/rtf/doc/ppt/xls/html/txt) and returns None for
  * unrecognized payloads and encrypted anything (NULL by house
  * stance), so one `document_text(bytes)` call turns a mixed crawl
  * column into the unified text layer the cross-format dedup gate
  * (m38) pins.
  *
  * Cost shape: each entry point parses the CONTAINER exactly once per
  * row (the CFB walk / ZIP inflate is the dominant bill) and hands
  * the parsed member map to the extractor ([[Doc.extractFrom]] et
  * al.); [[probeAndText]] returns format AND text off that same
  * single parse for callers that want both (the streaming sink).
  */
object DocumentProbe {

  final case class DocMeta(format: String, units: Int, encrypted: Boolean)

  /** Format classification + cheap structural units (PDF pages; other
    * formats report 0 — their unit counts require the text decode).
    */
  def probe(bytes: Array[Byte]): Option[DocMeta] = dispatch(bytes)._1

  /** Auto-routed body text; None when the format is unknown, its
    * payload decode is out of scope, or the document is encrypted.
    */
  def extractText(bytes: Array[Byte]): Option[String] =
    dispatch(bytes, wantText = true)._2

  /** Format and text off ONE container parse — for callers that want
    * both per row (the streaming document sink).
    */
  def probeAndText(bytes: Array[Byte]): (Option[String], Option[String]) = {
    val (meta, text) = dispatch(bytes, wantText = true)
    (meta.map(_.format), text)
  }

  /** Unified document TITLE across every format, off one container
    * parse — the metadata a crawl inventory wants next to format and
    * text. Where each format declares it:
    *
    *  - rtf: `{\info{\title …}}` ([[Rtf.docTitle]])
    *  - legacy Office (doc/ppt/xls): the OLEPS `SummaryInformation`
    *    property set, PIDSI_TITLE ([[Oleps]])
    *  - OPC (docx/xlsx/pptx): `docProps/core.xml` `dc:title`
    *  - ODF (odt/ods/odp): `meta.xml` `dc:title`
    *  - epub: the OPF metadata title ([[Epub]])
    *  - pdf: the trailer Info dict's `/Title` (UTF-16BE or
    *    PDFDocEncoding; encrypted → None)
    *  - html: `<title>` through the entity-decoding cascade
    *  - eml: the Subject header (RFC 2047 decoded)
    *  - latex: `\title{…}` detexed
    *
    * None when the format carries no title or is unrecognized.
    */
  def title(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    unwrapped(bytes).foreach(inner => return title(inner))
    if (startsWith(bytes, "{\\rtf")) return Rtf.docTitle(bytes)
    if (Ole2.isCfb(bytes)) {
      val files = Ole2.streams(bytes) match {
        case Some(f) => f
        case None    => return None
      }
      if (Ole2.classifyFrom(files) == "encrypted-ooxml")
        return decryptedOoxmlEntries(files).flatMap(zipTitleOf)
      return Oleps.titleFrom(files)
    }
    if (bytes(0) == 'P' && bytes(1) == 'K') {
      val files = ZipRead.entries(bytes,
        Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries) match {
        case Some(f) => f
        case None    => return None
      }
      return zipTitleOf(files)
    }
    val pdfTitle = Pdf.meta(bytes).map(_.title)
    if (pdfTitle.isDefined) return pdfTitle.get
    htmlOrText(bytes, wantText = false)._1.map(_.format) match {
      case Some("html") => htmlTitleFrom(Warc.decodeText(bytes, null))
      case Some("eml") =>
        decodeStrictUtf8(bytes).flatMap(Mail.parseEmlString)
          .map(_.subject).map(_.trim).filter(_.nonEmpty)
      case Some("latex") =>
        decodeStrictUtf8(bytes).flatMap(latexTitle)
      case _ => None
    }
  }

  private def htmlTitleFrom(decoded: String): Option[String] =
    "(?is)<title[^>]*>(.*?)</title>".r.findFirstMatchIn(decoded)
      .map(m => graft.ops.TextAnalysis.htmlToTextKernel(m.group(1)))
      .map(_.trim).filter(_.nonEmpty)

  private def zipTitleOf(files: Map[String, Array[Byte]]): Option[String] =
    zipKind(files) match {
      case "epub" => Epub.bookFrom(files).map(_.title)
        .map(_.trim).filter(_.nonEmpty)
      case "odt" | "ods" | "odp" | "odf-other" =>
        dcTitle(files, "meta.xml")
      case _ => dcTitle(files, "docProps/core.xml")
    }

  private def zipAuthorOf(files: Map[String, Array[Byte]]): Option[String] =
    zipKind(files) match {
      case "epub" => Epub.opfField(files, "creator")
      case "odt" | "ods" | "odp" | "odf-other" =>
        dcField(files, "meta.xml", "creator")
      case _ => dcField(files, "docProps/core.xml", "creator")
    }

  private def zipDateOf(files: Map[String, Array[Byte]]): Option[String] =
    zipKind(files) match {
      case "epub" => Epub.opfField(files, "date")
      case "odt" | "ods" | "odp" | "odf-other" =>
        dcField(files, "meta.xml", "creation-date")
      case _ => dcField(files, "docProps/core.xml", "created")
    }

  /** A Dublin-Core field from an XML package part (OPC core
    * properties / ODF meta.xml) — scala.xml matches by local name.
    */
  private def dcField(files: Map[String, Array[Byte]],
                      part: String, label: String): Option[String] =
    files.get(part)
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(ZipRead.parseXml)
      .flatMap(x => (x \\ label).headOption)
      .map(_.text.trim).filter(_.nonEmpty)

  private def dcTitle(files: Map[String, Array[Byte]],
                      part: String): Option[String] =
    dcField(files, part, "title")

  /** `\cmd{…}` with balanced braces, detexed. */
  private def latexCommand(src: String, cmd: String): Option[String] = {
    val marker = "\\" + cmd + "{"
    val at = src.indexOf(marker)
    if (at < 0) return None
    var i = at + marker.length
    var depth = 1
    val sb = new StringBuilder
    while (i < src.length && depth > 0) {
      src.charAt(i) match {
        case '{' => depth += 1; sb.append('{')
        case '}' => depth -= 1; if (depth > 0) sb.append('}')
        case c   => sb.append(c)
      }
      i += 1
    }
    Some(graft.ops.Latex.extractText(sb.toString).text.trim)
      .filter(_.nonEmpty)
  }

  private def latexTitle(src: String): Option[String] =
    latexCommand(src, "title")

  /** Unified document AUTHOR — the [[title]] dispatch's sibling:
    * OLEPS PIDSI_AUTHOR, OPC/ODF `dc:creator`, EPUB OPF creator, the
    * PDF Info `/Author`, RTF `{\info{\author …}}`, the html
    * `<meta name="author">`, the mail From header (RFC 2047
    * decoded), latex `\author{…}` detexed.
    */
  def author(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    unwrapped(bytes).foreach(inner => return author(inner))
    if (startsWith(bytes, "{\\rtf")) return Rtf.docAuthor(bytes)
    if (Ole2.isCfb(bytes)) {
      val files = Ole2.streams(bytes) match {
        case Some(f) => f
        case None    => return None
      }
      if (Ole2.classifyFrom(files) == "encrypted-ooxml")
        return decryptedOoxmlEntries(files).flatMap(zipAuthorOf)
      return files.get(Oleps.SummaryStream).flatMap(Oleps.properties)
        .flatMap(_.get(Oleps.PidAuthor))
    }
    if (bytes(0) == 'P' && bytes(1) == 'K') {
      val files = ZipRead.entries(bytes,
        Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries) match {
        case Some(f) => f
        case None    => return None
      }
      return zipAuthorOf(files)
    }
    val pdfAuthor = Pdf.meta(bytes).map(_.author)
    if (pdfAuthor.isDefined) return pdfAuthor.get
    htmlOrText(bytes, wantText = false)._1.map(_.format) match {
      case Some("html") => htmlAuthorFrom(Warc.decodeText(bytes, null))
      case Some("eml") =>
        decodeStrictUtf8(bytes).flatMap(Mail.parseEmlString)
          .map(_.from).map(_.trim).filter(_.nonEmpty)
      case Some("latex") =>
        decodeStrictUtf8(bytes).flatMap(latexCommand(_, "author"))
      case _ => None
    }
  }

  private def htmlAuthorFrom(decoded: String): Option[String] = {
    val re1 = ("(?is)<meta\\s[^>]*name\\s*=\\s*[\"']?author[\"']?" +
      "[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"']").r
    val re2 = ("(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"']" +
      "[^>]*name\\s*=\\s*[\"']?author[\"']?").r
    re1.findFirstMatchIn(decoded).orElse(re2.findFirstMatchIn(decoded))
      .map(_.group(1).trim).filter(_.nonEmpty)
  }

  /** Unified document DATE — the metadata triple's third leg, the
    * temporal-filtering key a training pipeline cuts corpora on.
    * Binary formats normalize to ISO-8601 (OLEPS VT_FILETIME, the
    * PDF `D:YYYYMMDDHHmmSS` form, RTF `{\creatim\yrN\moN\dyN…}`);
    * text declarations return as DECLARED (OPC `dcterms:created`,
    * ODF `meta:creation-date`, EPUB `dc:date`, the mail Date header,
    * html `article:published_time`, latex `\date{…}`) — parsing
    * free-text dates is the caller's policy, not the probe's.
    */
  def date(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    unwrapped(bytes).foreach(inner => return date(inner))
    if (startsWith(bytes, "{\\rtf")) return rtfCreated(bytes)
    if (Ole2.isCfb(bytes)) {
      val files = Ole2.streams(bytes) match {
        case Some(f) => f
        case None    => return None
      }
      if (Ole2.classifyFrom(files) == "encrypted-ooxml")
        return decryptedOoxmlEntries(files).flatMap(zipDateOf)
      return files.get(Oleps.SummaryStream).flatMap(Oleps.properties)
        .flatMap(_.get(Oleps.PidCreated))
    }
    if (bytes(0) == 'P' && bytes(1) == 'K') {
      val files = ZipRead.entries(bytes,
        Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries) match {
        case Some(f) => f
        case None    => return None
      }
      return zipDateOf(files)
    }
    val pdfDate = Pdf.meta(bytes).map(_.created)
    if (pdfDate.isDefined) return pdfDate.get.map(pdfDateToIso)
    htmlOrText(bytes, wantText = false)._1.map(_.format) match {
      case Some("html") => htmlDateFrom(Warc.decodeText(bytes, null))
      case Some("eml") =>
        decodeStrictUtf8(bytes).flatMap(Mail.parseEmlString)
          .map(_.date).map(_.trim).filter(_.nonEmpty)
      case Some("latex") =>
        decodeStrictUtf8(bytes).flatMap(latexCommand(_, "date"))
      case _ => None
    }
  }

  private def htmlDateFrom(decoded: String): Option[String] = {
    val re1 = ("(?is)<meta\\s[^>]*property\\s*=\\s*[\"']?" +
      "article:published_time[\"']?[^>]*content\\s*=\\s*" +
      "[\"']([^\"'>]*)[\"']").r
    val re2 = ("(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"']" +
      "[^>]*property\\s*=\\s*[\"']?article:published_time[\"']?").r
    re1.findFirstMatchIn(decoded).orElse(re2.findFirstMatchIn(decoded))
      .map(_.group(1).trim).filter(_.nonEmpty)
  }

  /** `D:YYYYMMDDHHmmSS[offset]` → ISO-8601-ish; anything that does
    * not match returns as declared.
    */
  private def pdfDateToIso(d: String): String = {
    val m = """D:(\d{4})(\d{2})(\d{2})(\d{2})?(\d{2})?(\d{2})?""".r
      .findFirstMatchIn(d)
    m match {
      case Some(g) =>
        val date = s"${g.group(1)}-${g.group(2)}-${g.group(3)}"
        val time = Option(g.group(4)).map { h =>
          s"T$h:${Option(g.group(5)).getOrElse("00")}:" +
            s"${Option(g.group(6)).getOrElse("00")}"
        }.getOrElse("")
        date + time
      case None => d
    }
  }

  /** RTF `{\info{\creatim\yrN\moN\dyN[\hrN\minN]}}` → ISO-8601. */
  private def rtfCreated(bytes: Array[Byte]): Option[String] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) return None
    val info = s.indexOf("{\\info")
    if (info < 0) return None
    val at = s.indexOf("{\\creatim", info)
    if (at < 0) return None
    val end = s.indexOf('}', at)
    if (end < 0) return None
    val span = s.substring(at, end)
    def field(name: String): Option[Int] =
      ("\\\\" + name + "(\\d+)").r.findFirstMatchIn(span)
        .map(_.group(1).toInt)
    for {
      yr <- field("yr")
      mo <- field("mo")
      dy <- field("dy")
    } yield f"$yr%04d-$mo%02d-$dy%02d" + (field("hr") match {
      case Some(h) => f"T$h%02d:${field("min").getOrElse(0)}%02d:00"
      case None    => ""
    })
  }

  /** The single-parse core: classify, and extract text when asked. */
  private def dispatch(bytes: Array[Byte],
                       wantText: Boolean = false): (Option[DocMeta], Option[String]) = {
    if (bytes == null || bytes.length < 4) return (None, None)
    unwrapped(bytes).foreach(inner => return dispatch(inner, wantText))
    if (startsWith(bytes, "{\\rtf")) {
      val meta = Some(DocMeta("rtf", 0, encrypted = false))
      val text = if (wantText) Rtf.extractText(bytes).map(_.text) else None
      return (meta, text)
    }
    if (Ole2.isCfb(bytes)) {
      val files = Ole2.streams(bytes) match {
        case Some(f) => f
        case None    => return (None, None)
      }
      val kind = Ole2.classifyFrom(files)
      // one record walk on the common path: when text is wanted, run
      // the extractor first and only fall back to the encryption scan
      // to EXPLAIN a refusal (doc's flag read is O(1) either way)
      val (enc, text) = kind match {
        case "encrypted-ooxml" =>
          // the default passwords (blank / VelvetSweatshop) open the
          // dominant class — the inner package then routes like any
          // other ZIP document; a real password keeps refusing
          decryptedOoxmlEntries(files) match {
            case Some(zf) => return zipFilesDispatch(zf, wantText)
            case None     => (true, None)
          }
        case "doc" =>
          val t = if (wantText) Doc.extractFrom(files).map(_.text) else None
          (Doc.isEncrypted(files), t)
        case "xls" =>
          if (wantText) {
            val t = Xls.extractFrom(files).map(_.text)
            (t.isEmpty && Xls.isEncrypted(files), t)
          } else (Xls.isEncrypted(files), None)
        case "ppt" =>
          if (wantText) {
            val t = Ppt.extractFrom(files).map(_.text)
            (t.isEmpty && Ppt.isEncrypted(files), t)
          } else (Ppt.isEncrypted(files), None)
        case _ => (false, None)
      }
      return (Some(DocMeta(kind, 0, enc)), text)
    }
    if (bytes(0) == 'P' && bytes(1) == 'K') {
      val files = ZipRead.entries(bytes,
        Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries) match {
        case Some(f) => f
        case None    => return (None, None)
      }
      return zipFilesDispatch(files, wantText)
    }
    // data-file blobs (the datasets-in-a-crawl class): classify-only
    // — a parquet/orc/avro/sqlite/arrow/hdf5/npy payload inventories
    // by FORMAT instead of reading as unknown binary; their row
    // decode belongs to the real table readers (spark.read.parquet
    // et al.), not a document kernel
    dataFileKind(bytes) match {
      case Some(k) =>
        return (Some(DocMeta(k, 0, encrypted = false)), None)
      case None => ()
    }
    val pdf: (Option[DocMeta], Option[String]) = if (wantText) {
      // one xref walk on the happy path: extractText carries the page
      // count; meta only runs to EXPLAIN a refusal (encrypted vs junk)
      Pdf.extractText(bytes) match {
        case Some(t) =>
          (Some(DocMeta("pdf", math.max(t.nPages, 0), encrypted = false)),
            Some(t.text))
        case None =>
          (Pdf.meta(bytes).map(m =>
            DocMeta("pdf", math.max(m.nPages, 0), m.encrypted)), None)
      }
    } else Pdf.meta(bytes) match {
      case Some(m) =>
        (Some(DocMeta("pdf", math.max(m.nPages, 0), m.encrypted)), None)
      case None => (None, None)
    }
    if (pdf._1.isDefined) return pdf

    // a mixed crawl column holds more raw HTML than every Office
    // format combined: route it (and plain UTF-8 text) so ONE
    // document_text call covers the whole column. HTML by leading
    // markup after BOM/whitespace, through the engine's own charset
    // sniff ([[Warc.decodeText]]: BOM beats meta beats UTF-8 default)
    // and the htmlToText cascade; otherwise STRICT UTF-8 text with no
    // binary control chars — anything stricter-than-text stays None.
    htmlOrText(bytes, wantText)
  }

  /** Data-file magic dispatch (exact leading magics; ORC additionally
    * checks the postscript tail because a text file may START with
    * the letters "ORC"). None when no data format declares itself.
    */
  private def dataFileKind(b: Array[Byte]): Option[String] = {
    val n = b.length
    if (n >= 8 && startsWith(b, "PAR1")) Some("parquet")
    else if (n >= 8 && b(0) == 'O' && b(1) == 'b' && b(2) == 'j' &&
      b(3) == 1) Some("avro")
    else if (n >= 16 && startsWith(b, "ORC") &&
      b(n - 4) == 'O' && b(n - 3) == 'R' && b(n - 2) == 'C')
      Some("orc")
    else if (n >= 16 && startsWith(b, "SQLite format 3\u0000"))
      Some("sqlite")
    else if (n >= 8 && startsWith(b, "ARROW1")) Some("arrow")
    else if (n >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'H' &&
      b(2) == 'D' && b(3) == 'F' && b(4) == '\r' && b(5) == '\n' &&
      (b(6) & 0xFF) == 0x1A && b(7) == '\n') Some("hdf5")
    else if (n >= 8 && (b(0) & 0xFF) == 0x93 && b(1) == 'N' &&
      b(2) == 'U' && b(3) == 'M' && b(4) == 'P' && b(5) == 'Y')
      Some("npy")
    else None
  }

  /** `EncryptionInfo`/`EncryptedPackage` CFB → the decrypted inner
    * ZIP package's entries, when a DEFAULT password (blank /
    * VelvetSweatshop) verifies; None refuses (real passwords, torn
    * headers, out-of-scope schemes). One [[OffCrypto]] verify +
    * package decrypt + one ZIP walk.
    */
  private def decryptedOoxmlEntries(
      files: Map[String, Array[Byte]]): Option[Map[String, Array[Byte]]] =
    for {
      info <- files.get("EncryptionInfo")
      pkg <- files.get("EncryptedPackage")
      zip <- OffCrypto.decryptPackage(info, pkg)
      entries <- ZipRead.entries(zip,
        Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries)
    } yield entries

  /** The ZIP-family classification + text over parsed entries —
    * shared by the PK route and the decrypted-OOXML route.
    */
  private def zipFilesDispatch(files: Map[String, Array[Byte]],
                               wantText: Boolean): (Option[DocMeta], Option[String]) = {
    val kind = zipKind(files)
    val text =
      if (!wantText) None
      else kind match {
        case "odt"  => Odt.extractFrom(files).map(_.text)
        case "ods"  => Ods.extractFrom(files).map(_.text)
        case "odp"  => Odp.extractFrom(files).map(_.text)
        case "docx" => Docx.extractFrom(files).map(_.text)
        case "xlsx" => Xlsx.extractFrom(files).map(_.text)
        case "xlsb" => Xlsb.extractFrom(files).map(_.text)
        case "pptx" => Pptx.extractFrom(files).map(_.text)
        case "epub" =>
          // the Column path joins htmlToText'd chapters by form
          // feed and trims spaces; the kernel replays the cascade
          Epub.bookFrom(files).map(_.chapters
            .map(graft.ops.TextAnalysis.htmlToTextKernel)
            .mkString("\f").replaceAll("\\A +| +\\z", ""))
        case _ => None // opc/zip/odf-other: classify-only
      }
    (Some(DocMeta(kind, 0, encrypted = false)), text)
  }

  /** HTML / plain-text classification + text for the residual class
    * (nothing above matched). `html` when the payload leads with
    * `<!DOCTYPE` or `<html` (case-insensitive, BOM/whitespace
    * skipped); `txt` when the bytes are strict UTF-8 with no binary
    * control characters. None otherwise.
    */
  /** Leading `<!doctype`/`<html` after BOM + whitespace — the raw-HTML
    * route's marker (shared by [[htmlOrText]] and [[inventory]]).
    */
  private def htmlLead(bytes: Array[Byte]): Boolean = {
    var i = 0
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF) i = 3
    while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\t' ||
      bytes(i) == '\r' || bytes(i) == '\n')) i += 1
    def leadsWith(s: String): Boolean = {
      if (i + s.length > bytes.length) return false
      var j = 0
      while (j < s.length) {
        val b = (bytes(i + j) & 0xFF).toChar
        if (Character.toLowerCase(b) != s.charAt(j)) return false
        j += 1
      }
      true
    }
    leadsWith("<!doctype") || leadsWith("<html")
  }

  private def htmlOrText(bytes: Array[Byte],
                         wantText: Boolean): (Option[DocMeta], Option[String]) = {
    if (htmlLead(bytes)) {
      val meta = Some(DocMeta("html", 0, encrypted = false))
      val text = if (wantText)
        Some(graft.ops.TextAnalysis.htmlToTextKernel(
          Warc.decodeText(bytes, null)))
      else None
      return (meta, text)
    }
    decodeStrictUtf8(bytes) match {
      case Some(s) =>
        // an RFC 5322 message IS valid UTF-8 text — upgrade when the
        // head block carries ≥2 core mail headers at line starts (a
        // lone "title: x" first line stays txt)
        if (looksEmail(s)) {
          val meta = Some(DocMeta("eml", 0, encrypted = false))
          val text = if (wantText) Mail.parseEmlString(s).map(_.text)
          else None
          if (!wantText || text.isDefined) return (meta, text)
        }
        // a Jupyter notebook IS valid UTF-8 JSON — as txt it would
        // pollute the text layer with brackets and output blobs;
        // upgrade when it parses as one (checked BEFORE latex: a
        // notebook cell may well contain \documentclass). A JSON
        // config that merely mentions nbformat stays txt.
        if (Ipynb.looksNotebook(s)) {
          Ipynb.extractText(s) match {
            case Some(nb) =>
              return (Some(DocMeta("ipynb", nb.nCells, encrypted = false)),
                if (wantText) Some(nb.text) else None)
            case None => ()
          }
        }
        // LaTeX source too (the arXiv-dump tar members): the detex
        // tokenizer beats raw markup as corpus text. \documentclass /
        // \begin{document} in the head is the conventional marker.
        if (looksLatex(s)) {
          val meta = Some(DocMeta("latex", 0, encrypted = false))
          val text = if (wantText)
            Some(graft.ops.Latex.extractText(s).text) else None
          return (meta, text)
        }
        (Some(DocMeta("txt", 0, encrypted = false)),
          if (wantText) Some(s) else None)
      case None => (None, None)
    }
  }

  /** LaTeX marker in the first 4 KB: `\documentclass` /
    * `\begin{document}` (how every arXiv source opens, comments and
    * preamble aside).
    */
  private def looksLatex(s: String): Boolean = {
    val head = s.substring(0, math.min(s.length, 4096))
    head.contains("\\documentclass") || head.contains("\\begin{document}")
  }

  private val CoreMailHeaders = Set("from", "to", "subject", "date",
    "message-id", "received", "return-path", "mime-version", "cc")

  /** True when the text's head block (up to the first blank line)
    * reads as an RFC 5322 header block: the first line is a
    * `Name: value` header and at least two CORE mail headers appear
    * at line starts.
    */
  private def looksEmail(s: String): Boolean = {
    val headEnd = "\r?\n\r?\n".r.findFirstMatchIn(s)
      .map(_.start).getOrElse(s.length)
    val head = s.substring(0, math.min(headEnd, 8192))
    val lines = head.split("\r?\n")
    if (lines.isEmpty) return false
    def headerName(ln: String): Option[String] = {
      val c = ln.indexOf(':')
      if (c <= 0) return None
      val name = ln.substring(0, c)
      if (name.forall(ch => ch > ' ' && ch < 127)) Some(name.toLowerCase)
      else None
    }
    if (headerName(lines(0)).isEmpty) return false
    lines.iterator.flatMap(headerName)
      .count(CoreMailHeaders.contains) >= 2
  }

  /** Strict text decode with a binary guard: a BOM-DECLARED UTF-16/
    * UTF-32 (the Windows-export text class — notepad and countless
    * tools write UTF-16LE with a BOM) decodes in its declared
    * charset; everything else must be strict UTF-8 (malformed/
    * unmappable REJECT — no heuristics, no Latin-1 guessing). Any C0
    * control besides \t \n \r \f fails — the payload is some binary
    * format we don't know, not corpus text. Strips the leading BOM.
    */
  private def decodeStrictUtf8(bytes: Array[Byte]): Option[String] = {
    val n = bytes.length
    val bomCharset: Option[Charset] =
      if (n >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
        (bytes(2) & 0xFF) == 0xFE && (bytes(3) & 0xFF) == 0xFF)
        Some(Charset.forName("UTF-32BE"))
      else if (n >= 4 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xFE && bytes(2) == 0 && bytes(3) == 0)
        Some(Charset.forName("UTF-32LE"))
      else if (n >= 2 && (bytes(0) & 0xFF) == 0xFE &&
        (bytes(1) & 0xFF) == 0xFF)
        Some(StandardCharsets.UTF_16BE)
      else if (n >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xFE)
        Some(StandardCharsets.UTF_16LE)
      else None
    val dec = bomCharset.getOrElse(StandardCharsets.UTF_8).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s = try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => return None }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r' && c != '\f')
        return None
      i += 1
    }
    Some(if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s)
  }

  /** A crawl column holds `.txt.gz`/`.xml.zst`/`.json.bz2`/`.xz`
    * blobs beside the plain ones — strip up to three leading
    * compression layers (magic-detected, output-capped) so they
    * route exactly like their uncompressed twins; the reported
    * format is the INNER format (the encrypted-OOXML precedent).
    * Returns None when the payload is not compressed (caller takes
    * its normal path), or when three layers deep it still is (a
    * nesting bomb — undecodable). A failed decompression falls back
    * to the raw bytes: a text file that merely starts with `BZh9`
    * must route as text, not vanish.
    */
  private val MaxDecompressedBytes: Long = 256L << 20

  private def unwrapped(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!Compressed.isCompressed(bytes)) return None
    var b = bytes
    var i = 0
    while (i < 3 && Compressed.isCompressed(b)) {
      val inner = Compressed.maybeDecompressed(b, MaxDecompressedBytes)
      // A failed INNER layer (i > 0) falls back to the last bytes
      // that DID decompress: gz('BZh9 prose…') is a gzip of a text
      // file whose first bytes merely collide with bzip2's magic —
      // layer 1's output must route as text, exactly like its
      // uncompressed twin. Only a layer-0 failure means "not
      // actually compressed at all" → None → caller's normal path.
      if (inner.isEmpty) return if (i == 0) None else Some(b)
      b = inner
      i += 1
    }
    if (Compressed.isCompressed(b)) Some(Array.emptyByteArray) else Some(b)
  }

  private def startsWith(b: Array[Byte], s: String): Boolean = {
    if (b.length < s.length) return false
    var i = 0
    while (i < s.length) {
      if (b(i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** ZIP-family classification from the member names: the three OPC
    * main-part conventions discriminate docx/xlsx/pptx (an OPC
    * package is NOT automatically a word document), ODF by mimetype
    * or by a bare ODF content.xml, OCF by container.xml.
    */
  private def zipKind(files: Map[String, Array[Byte]]): String = {
    val mime = files.get("mimetype")
      .map(new String(_, StandardCharsets.US_ASCII).trim)
    if (mime.exists(_.startsWith("application/vnd.oasis.opendocument.text")))
      "odt"
    else if (mime.exists(_.startsWith(
      "application/vnd.oasis.opendocument.spreadsheet")))
      "ods"
    else if (mime.exists(_.startsWith(
      "application/vnd.oasis.opendocument.presentation")))
      "odp"
    else if (mime.exists(_.startsWith("application/vnd.oasis.opendocument")))
      "odf-other"
    else if (mime.exists(_.startsWith("application/epub")) ||
      files.contains("META-INF/container.xml"))
      "epub"
    else {
      // OPC siblings discriminate by their MAIN PART: the rels target
      // when declared (Word can write word/document2.xml after
      // save/repair cycles — Docx.extractFrom follows it), the
      // conventional member names otherwise. The SAME XML attribute
      // lookup Docx uses — attribute order/quoting variation is legal.
      val relsMain = Docx.mainPartTarget(files)
      val opcKind = relsMain match {
        case Some(t) if t.startsWith("word/") => Some("docx")
        // the binary sibling: same package shape, .bin parts
        case Some(t) if t.startsWith("xl/") && t.endsWith(".bin") =>
          Some("xlsb")
        case Some(t) if t.startsWith("xl/") => Some("xlsx")
        case Some(t) if t.startsWith("ppt/") => Some("pptx")
        case Some(_) => Some("opc")
        case None =>
          if (files.contains("word/document.xml")) Some("docx")
          else if (files.contains("xl/workbook.bin")) Some("xlsb")
          else if (files.contains("xl/workbook.xml")) Some("xlsx")
          else if (files.contains("ppt/presentation.xml")) Some("pptx")
          else None
      }
      opcKind.getOrElse {
        // mimetype-less ODF producers: discriminate by the body class
        // inside content.xml, not just the shared document-content root
        files.get("content.xml")
          .map(new String(_, StandardCharsets.UTF_8)) match {
          case Some(c) if c.contains("office:document-content") =>
            if (c.contains("<office:text")) "odt"
            else if (c.contains("<office:spreadsheet")) "ods"
            else if (c.contains("<office:presentation")) "odp"
            else "odf-other"
          case _ =>
            // torn/unparseable rels that still SPEAK OPC classify as
            // opc, not plain zip (inventory keeps the signal)
            if (files.get("_rels/.rels")
              .map(new String(_, StandardCharsets.UTF_8))
              .exists(_.contains("/officeDocument"))) "opc"
            else "zip"
        }
      }
    }
  }

  /** The full per-document record off ONE container dispatch. */
  final case class Inventory(format: Option[String],
                             title: Option[String],
                             author: Option[String],
                             date: Option[String],
                             text: Option[String])

  private val EmptyInventory = Inventory(None, None, None, None, None)

  /** Format + the metadata triple + text, sharing a SINGLE container
    * parse per row (one CFB walk / ZIP inflate / PDF xref load / text
    * decode — the dominant bill). This is [[scan]]'s kernel; the
    * individual column functions stay for callers that want one
    * field, but composing all four of them re-parses the container
    * four times — use this (or [[scan]]) for inventories.
    */
  def inventory(bytes: Array[Byte]): Inventory = {
    if (bytes == null || bytes.length < 4) return EmptyInventory
    unwrapped(bytes).foreach(inner => return inventory(inner))
    dataFileKind(bytes).foreach(k =>
      return Inventory(Some(k), None, None, None, None))
    if (startsWith(bytes, "{\\rtf"))
      return Inventory(Some("rtf"), Rtf.docTitle(bytes),
        Rtf.docAuthor(bytes), rtfCreated(bytes),
        Rtf.extractText(bytes).map(_.text))
    if (Ole2.isCfb(bytes)) {
      val files = Ole2.streams(bytes) match {
        case Some(f) => f
        case None    => return EmptyInventory
      }
      val kind = Ole2.classifyFrom(files)
      if (kind == "encrypted-ooxml") {
        decryptedOoxmlEntries(files) match {
          case Some(zf) => return zipFilesInventory(zf)
          case None     => return Inventory(Some(kind), None, None, None, None)
        }
      }
      val text = kind match {
        case "doc" => Doc.extractFrom(files).map(_.text)
        case "xls" => Xls.extractFrom(files).map(_.text)
        case "ppt" => Ppt.extractFrom(files).map(_.text)
        case _     => None
      }
      val props = files.get(Oleps.SummaryStream).flatMap(Oleps.properties)
      return Inventory(Some(kind),
        props.flatMap(_.get(Oleps.PidTitle)),
        props.flatMap(_.get(Oleps.PidAuthor)),
        props.flatMap(_.get(Oleps.PidCreated)),
        text)
    }
    if (bytes(0) == 'P' && bytes(1) == 'K') {
      val files = ZipRead.entries(bytes,
        Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries) match {
        case Some(f) => f
        case None    => return EmptyInventory
      }
      return zipFilesInventory(files)
    }
    Pdf.meta(bytes) match {
      case Some(m) =>
        val text =
          if (m.encrypted) None
          else Pdf.extractText(bytes).map(_.text)
        return Inventory(Some("pdf"), m.title, m.author,
          m.created.map(pdfDateToIso), text)
      case None => ()
    }
    if (htmlLead(bytes)) {
      val decoded = Warc.decodeText(bytes, null)
      return Inventory(Some("html"), htmlTitleFrom(decoded),
        htmlAuthorFrom(decoded), htmlDateFrom(decoded),
        Some(graft.ops.TextAnalysis.htmlToTextKernel(decoded)))
    }
    decodeStrictUtf8(bytes) match {
      case Some(s) =>
        if (looksEmail(s)) {
          val msg = Mail.parseEmlString(s)
          if (msg.isDefined)
            return Inventory(Some("eml"),
              msg.map(_.subject).map(_.trim).filter(_.nonEmpty),
              msg.map(_.from).map(_.trim).filter(_.nonEmpty),
              msg.map(_.date).map(_.trim).filter(_.nonEmpty),
              msg.map(_.text))
        }
        if (Ipynb.looksNotebook(s)) {
          Ipynb.extractText(s) match {
            case Some(nb) =>
              return Inventory(Some("ipynb"), None, None, None,
                Some(nb.text))
            case None => ()
          }
        }
        if (looksLatex(s))
          return Inventory(Some("latex"), latexTitle(s),
            latexCommand(s, "author"), latexCommand(s, "date"),
            Some(graft.ops.Latex.extractText(s).text))
        Inventory(Some("txt"), None, None, None, Some(s))
      case None => EmptyInventory
    }
  }

  /** The ZIP-family [[Inventory]] over parsed entries — shared by the
    * PK route and the decrypted-OOXML route (whose format reports the
    * INNER kind: a VelvetSweatshop xlsx reads as an xlsx, exactly as
    * Excel shows it).
    */
  private def zipFilesInventory(files: Map[String, Array[Byte]]): Inventory = {
    val (meta, text) = zipFilesDispatch(files, wantText = true)
    val kind = meta.map(_.format).getOrElse("zip")
    val (title, author, date) = kind match {
      case "epub" =>
        (Epub.bookFrom(files).map(_.title).map(_.trim).filter(_.nonEmpty),
          Epub.opfField(files, "creator"),
          Epub.opfField(files, "date"))
      case "odt" | "ods" | "odp" | "odf-other" =>
        (dcTitle(files, "meta.xml"),
          dcField(files, "meta.xml", "creator"),
          dcField(files, "meta.xml", "creation-date"))
      case _ =>
        (dcTitle(files, "docProps/core.xml"),
          dcField(files, "docProps/core.xml", "creator"),
          dcField(files, "docProps/core.xml", "created"))
    }
    Inventory(Some(kind), title, author, date, text)
  }

  // ---- archive-from-column loop closure ----------------------------

  private def isTarBytes(b: Array[Byte]): Boolean =
    b != null && b.length >= 512 && b(257) == 'u' && b(258) == 's' &&
      b(259) == 't' && b(260) == 'a' && b(261) == 'r'

  /** GENERIC-archive members with the archive kind: tar (the caller
    * unwraps compression first) and plain zips — OPC/ODF/EPUB
    * packages are documents, not archives, and are NOT members here.
    * None when the payload is no archive at all.
    */
  private def archiveMembers(b: Array[Byte])
  : Option[(String, Seq[(String, Array[Byte])])] = {
    if (isTarBytes(b))
      return Tar.parse(b).map(ms =>
        ("tar", ms.map(m => (m.name, m.bytes))))
    if (SevenZ.isSevenZ(b))
      return SevenZ.entries(b).map(ms => ("7z", ms))
    if (b.length >= 4 && b(0) == 'P' && b(1) == 'K') {
      ZipRead.entries(b, Epub.DefaultMaxTotalBytes,
        Epub.DefaultMaxEntries) match {
        case Some(f) if zipKind(f) == "zip" =>
          return Some(("zip", f.toSeq.sortBy(_._1)
            .map { case (n, mb) => (n, mb) }))
        case _ => return None
      }
    }
    None
  }

  /** One MEMBER's inventory, depth-bounded: a member that is itself
    * an archive (after unwrapping its own compression) keeps its row
    * with the archive format and nothing else — the nesting-bomb
    * refusal posture; document ZIP packages (docx/odt/epub/…) parse
    * ONCE and take the normal document path.
    */
  private def memberInventory(mb: Array[Byte]): Inventory = {
    if (mb == null || mb.length < 4) return EmptyInventory
    val inner = unwrapped(mb).getOrElse(mb)
    if (isTarBytes(inner))
      return Inventory(Some("tar"), None, None, None, None)
    if (SevenZ.isSevenZ(inner))
      return Inventory(Some("7z"), None, None, None, None)
    if (inner.length >= 4 && inner(0) == 'P' && inner(1) == 'K') {
      return ZipRead.entries(inner, Epub.DefaultMaxTotalBytes,
        Epub.DefaultMaxEntries) match {
        case Some(f) =>
          if (zipKind(f) == "zip")
            Inventory(Some("zip"), None, None, None, None)
          else zipFilesInventory(f)
        case None => EmptyInventory
      }
    }
    inventory(inner)
  }

  /** Archive-from-column loop closure: a blob that IS a generic
    * archive (zip/tar, compressed twins included) explodes into its
    * members' inventories — the zip-of-PDFs attached to a list
    * message joins the same text layer as its members crawled bare.
    * A non-archive blob yields its own single row with a NULL member
    * name, so the column composes uniformly over mixed corpora; an
    * EMPTY archive keeps one row carrying just the archive format.
    * Depth 1: member archives refuse (see [[memberInventory]]).
    */
  def memberInventories(bytes: Array[Byte])
  : Seq[(Option[String], Inventory)] = {
    if (bytes == null || bytes.length < 4)
      return Seq((None, EmptyInventory))
    val inner = unwrapped(bytes).getOrElse(bytes)
    archiveMembers(inner) match {
      case Some((kind, ms)) =>
        if (ms.isEmpty)
          Seq((None, Inventory(Some(kind), None, None, None, None)))
        else ms.map { case (name, mb) =>
          (Some(name), memberInventory(mb))
        }
      case None => Seq((None, inventory(bytes)))
    }
  }

  private val memberInventoriesUdf = udf { (bytes: Array[Byte]) =>
    memberInventories(bytes).map { case (name, inv) =>
      (name, inv.format, inv.title, inv.author, inv.date, inv.text)
    }
  }

  /** `array<struct<member,format,title,author,date,text>>` — the
    * column face of [[memberInventories]], for `explode` composition
    * (mail attachments, crawl blob columns).
    */
  def memberInventoriesCol(bytesCol: Column): Column =
    memberInventoriesUdf(bytesCol)

  // ---- document outlinks --------------------------------------------

  /** External hyperlinks of a ZIP-family package: OPC hyperlink
    * relationships (ECMA-376 Part 2 — any part's `.rels`, Type
    * ending `/hyperlink`, `TargetMode="External"`) and ODF
    * `xlink:href` anchors (absolute http(s) only — relative targets
    * have no base inside a package).
    */
  private def zipLinks(files: Map[String, Array[Byte]],
                       max: Int): Seq[String] = {
    val out = new java.util.LinkedHashSet[String]()
    files.keys.toSeq.sorted.filter(_.endsWith(".rels")).foreach { part =>
      if (out.size < max) {
        ZipRead.parseXml(new String(files(part),
          StandardCharsets.UTF_8)).foreach { x =>
          (x \\ "Relationship").foreach { rel =>
            val typ = rel \@ "Type"
            val mode = rel \@ "TargetMode"
            val tgt = (rel \@ "Target").trim
            if (typ.endsWith("/hyperlink") && mode == "External" &&
              tgt.nonEmpty && out.size < max)
              out.add(tgt)
          }
        }
      }
    }
    files.get("content.xml").foreach { c =>
      ZipRead.parseXml(new String(c, StandardCharsets.UTF_8)).foreach { x =>
        (x \\ "a").foreach { a =>
          a.attributes.iterator.find(_.key == "href")
            .map(_.value.text.trim)
            .filter(u => u.startsWith("http://") ||
              u.startsWith("https://"))
            .foreach(u => if (out.size < max) out.add(u))
        }
      }
    }
    // EPUB (OCF): absolute anchors in the content documents — a
    // package-internal relative href has no base to resolve against,
    // so only http(s) targets are frontier material
    if (files.contains("META-INF/container.xml")) {
      val AbsHref =
        """(?i)href\s*=\s*["'](https?://[^"'<>\s]+)["']""".r
      files.keys.toSeq.sorted
        .filter(n => n.endsWith(".xhtml") || n.endsWith(".html"))
        .foreach { part =>
          if (out.size < max) {
            val body = new String(files(part), StandardCharsets.UTF_8)
            AbsHref.findAllMatchIn(body).foreach { m =>
              if (out.size < max) out.add(m.group(1))
            }
          }
        }
    }
    import scala.jdk.CollectionConverters._
    out.iterator().asScala.toSeq
  }

  /** Outbound hyperlinks across the document layer — PDF `/URI`
    * annotations ([[Pdf.links]]), OPC external hyperlink
    * relationships (docx/xlsx/pptx, incl. the blank-default-password
    * encrypted form), ODF anchors — so a whitepaper, a deck or a
    * spreadsheet seeds the crawl frontier like an HTML page does
    * ([[graft.ops.Links]] owns HTML itself, which needs a base URL).
    * First occurrence wins; formats without a link concept yield
    * empty.
    */
  def links(bytes: Array[Byte], maxLinks: Int = 1024): Seq[String] = {
    if (bytes == null || bytes.length < 4) return Seq.empty
    val inner = unwrapped(bytes).getOrElse(bytes)
    try {
      if (inner(0) == 'P' && inner(1) == 'K') {
        ZipRead.entries(inner, Epub.DefaultMaxTotalBytes,
          Epub.DefaultMaxEntries) match {
          case Some(f) => zipLinks(f, maxLinks)
          case None    => Seq.empty
        }
      } else if (Ole2.isCfb(inner)) {
        Ole2.streams(inner) match {
          case Some(f) if Ole2.classifyFrom(f) == "encrypted-ooxml" =>
            decryptedOoxmlEntries(f) match {
              case Some(zf) => zipLinks(zf, maxLinks)
              case None     => Seq.empty
            }
          case _ => Seq.empty
        }
      } else Pdf.links(inner, maxLinks = maxLinks)
    } catch { case _: Exception => Seq.empty }
  }

  private val linksUdf = udf { (bytes: Array[Byte]) => links(bytes) }

  /** `array<string>` of the document's outbound hyperlinks. */
  def linksCol(bytesCol: Column): Column = linksUdf(bytesCol)

  private val inventoryUdf = udf { (bytes: Array[Byte]) => inventory(bytes) }

  /** `struct<format,title,author,date,text>` off one container parse
    * per row — the column face of [[inventory]].
    */
  def inventoryCol(bytesCol: Column): Column = inventoryUdf(bytesCol)

  /** One-call corpus reader: a path glob of MIXED document files →
    * `(path, length, format, title, author, date, language, text)` —
    * binaryFile scan + ONE magic-routed dispatch per row
    * ([[inventory]]: a single CFB/ZIP/PDF/text parse serves format,
    * the metadata triple AND text), plus the routed trigram langid
    * over the extracted text. Undecodable rows keep their inventory
    * row with NULL everything-else (filter on `format IS NOT NULL`
    * for the quality stance).
    */
  def scan(spark: org.apache.spark.sql.SparkSession,
           pathGlob: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("length"),
        inventoryUdf(col("content")).as("d"))
      .select(col("path"), col("length"),
        col("d.format").as("format"), col("d.title").as("title"),
        col("d.author").as("author"), col("d.date").as("date"),
        when(col("d.text").isNotNull,
          graft.ops.LangId.langIdRouted(col("d.text"))).as("language"),
        col("d.text").as("text"))
  }

  /** Streaming twin of [[scan]] (the Tar/Zip/Mail.stream
    * discipline): new document files landing in `dir` inventory
    * through the SAME one-dispatch kernel — a live document drop-box
    * feeds the same downstream program as a batch read. The explicit
    * schema is the one the binaryFile source requires for streams.
    */
  def scanStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 100): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    import org.apache.spark.sql.types._
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("path"), col("length"),
        inventoryUdf(col("content")).as("d"))
      .select(col("path"), col("length"),
        col("d.format").as("format"), col("d.title").as("title"),
        col("d.author").as("author"), col("d.date").as("date"),
        when(col("d.text").isNotNull,
          graft.ops.LangId.langIdRouted(col("d.text"))).as("language"),
        col("d.text").as("text"))
  }

  private val titleUdf = udf { (bytes: Array[Byte]) => title(bytes) }

  /** Declared document title; NULL when absent or unrecognized. */
  def titleCol(bytesCol: Column): Column = titleUdf(bytesCol)

  private val authorUdf = udf { (bytes: Array[Byte]) => author(bytes) }

  /** Declared document author; NULL when absent or unrecognized. */
  def authorCol(bytesCol: Column): Column = authorUdf(bytesCol)

  private val dateUdf = udf { (bytes: Array[Byte]) => date(bytes) }

  /** Declared creation date; NULL when absent or unrecognized. */
  def dateCol(bytesCol: Column): Column = dateUdf(bytesCol)

  private val formatUdf = udf { (bytes: Array[Byte]) =>
    probe(bytes).map(_.format)
  }
  private val textUdf = udf { (bytes: Array[Byte]) => extractText(bytes) }
  private val bothUdf = udf { (bytes: Array[Byte]) => probeAndText(bytes) }

  /** Detected format name; NULL when unrecognized. */
  def formatCol(bytesCol: Column): Column = formatUdf(bytesCol)

  /** Auto-routed body text; NULL when unrecognized or undecodable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)

  /** `struct<_1: format, _2: text>` off one container parse. */
  def probeAndTextCol(bytesCol: Column): Column = bothUdf(bytesCol)
}
