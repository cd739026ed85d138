package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Unified document probe + auto-routed text extraction across every
  * document modality the engine reads: PDF, DOCX, ODT, EPUB, RTF and
  * legacy Word (plus classification-only for the other legacy Office
  * kinds and encrypted OOXML). At inventory time a crawl column holds
  * MIXED payloads with unreliable extensions/MIME labels — the
  * dispatch key has to be the bytes themselves:
  *
  *  - `{\rtf`      → rtf
  *  - CFB magic    → [[Ole2.classify]]: doc / xls / ppt /
  *                   encrypted-ooxml / cfb
  *  - `PK` ZIP     → by member: ODF `mimetype`, OPC officeDocument
  *                   rels (or the de-facto `word/document.xml`),
  *                   OCF `META-INF/container.xml`, else plain zip
  *  - `%PDF-` (incl. the junk-prefixed recovery class [[Pdf.meta]]
  *    re-anchors) → pdf, with page count and encryption flag
  *
  * `extractText` routes to the matching extractor (pdf/docx/odt/epub/
  * rtf/doc/ppt/xls) and returns None for unrecognized payloads and
  * encrypted anything (NULL by house stance), so one
  * `document_text(bytes)` call turns a mixed crawl column into the
  * unified text layer the cross-format dedup gate (m38) pins.
  */
object DocumentProbe {

  final case class DocMeta(format: String, units: Int, encrypted: Boolean)

  /** Format classification + cheap structural units (PDF pages; other
    * formats report 0 — their unit counts require the text decode).
    */
  def probe(bytes: Array[Byte]): Option[DocMeta] = {
    if (bytes == null || bytes.length < 4) return None
    if (startsWith(bytes, "{\\rtf"))
      return Some(DocMeta("rtf", 0, encrypted = false))
    if (Ole2.isCfb(bytes))
      return Ole2.classify(bytes).map {
        case "encrypted-ooxml" => DocMeta("encrypted-ooxml", 0, encrypted = true)
        case kind =>
          val enc = kind match {
            case "doc" => wordEncrypted(bytes)
            case "xls" => Xls.isEncrypted(bytes)
            case "ppt" => Ppt.isEncrypted(bytes)
            case _     => false
          }
          DocMeta(kind, 0, enc)
      }
    if (bytes(0) == 'P' && bytes(1) == 'K') return zipKind(bytes)
    Pdf.meta(bytes).map(m =>
      DocMeta("pdf", math.max(m.nPages, 0), m.encrypted))
  }

  /** Auto-routed body text; None when the format is unknown, its
    * payload decode is out of scope, or the document is encrypted.
    */
  def extractText(bytes: Array[Byte]): Option[String] =
    probe(bytes).flatMap { m =>
      m.format match {
        case "pdf"  => Pdf.extractText(bytes).map(_.text)
        case "docx" => Docx.extractText(bytes).map(_.text)
        case "odt"  => Odt.extractText(bytes).map(_.text)
        case "rtf"  => Rtf.extractText(bytes).map(_.text)
        case "doc"  => Doc.extractText(bytes).map(_.text)
        case "ppt"  => Ppt.extractText(bytes).map(_.text)
        case "xls"  => Xls.extractText(bytes).map(_.text)
        case "epub" =>
          // the Column path joins htmlToText'd chapters by form feed
          // and trims spaces; the kernel replays the same cascade
          Epub.book(bytes).map(_.chapters
            .map(graft.ops.TextAnalysis.htmlToTextKernel)
            .mkString("\f").replaceAll("\\A +| +\\z", ""))
        case _ => None
      }
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

  /** fEncrypted straight from the FIB, for classification when the
    * text decode refused.
    */
  private def wordEncrypted(bytes: Array[Byte]): Boolean =
    Ole2.streams(bytes).flatMap(_.get("WordDocument")).exists { w =>
      w.length > 0x0B && {
        val flags = (w(0x0A) & 0xFF) | ((w(0x0B) & 0xFF) << 8)
        (flags & 0x0100) != 0
      }
    }

  private def zipKind(bytes: Array[Byte]): Option[DocMeta] =
    ZipRead.entries(bytes, Epub.DefaultMaxTotalBytes, Epub.DefaultMaxEntries)
      .map { files =>
        val mime = files.get("mimetype")
          .map(new String(_, StandardCharsets.US_ASCII).trim)
        if (mime.exists(_.startsWith("application/vnd.oasis.opendocument.text")))
          DocMeta("odt", 0, encrypted = false)
        else if (mime.exists(_.startsWith("application/vnd.oasis.opendocument")))
          DocMeta("odf-other", 0, encrypted = false)
        else if (mime.exists(_.startsWith("application/epub")) ||
          files.contains("META-INF/container.xml"))
          DocMeta("epub", 0, encrypted = false)
        else if (files.contains("word/document.xml") ||
          files.get("_rels/.rels").map(new String(_, StandardCharsets.UTF_8))
            .exists(_.contains("/officeDocument")))
          DocMeta("docx", 0, encrypted = false)
        else DocMeta("zip", 0, encrypted = false)
      }

  private val formatUdf = udf { (bytes: Array[Byte]) =>
    probe(bytes).map(_.format)
  }
  private val textUdf = udf { (bytes: Array[Byte]) => extractText(bytes) }

  /** Detected format name; NULL when unrecognized. */
  def formatCol(bytesCol: Column): Column = formatUdf(bytesCol)

  /** Auto-routed body text; NULL when unrecognized or undecodable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
