package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ODT (OpenDocument Text, OASIS ODF 1.2 Part 1) text extraction —
  * the fourth crawl document format after PDF/EPUB/DOCX, and like
  * them fully verifiable offline: an ODF package is a plain ZIP
  * ([[ZipRead]], same bomb caps) whose `mimetype` entry declares the
  * document class (ODF 1.2 Part 3 §3.3) and whose `content.xml`
  * carries the body as `<text:p>` / `<text:h>` paragraphs with
  * `<text:s>` (run-length spaces), `<text:tab>` and
  * `<text:line-break>` controls (Part 1 §5–6).
  *
  * Extraction walks `office:body/office:text` in DOCUMENT ORDER —
  * headings and paragraphs interleave correctly, list items and
  * table cells contribute their paragraphs in place (the Docx
  * posture: tables read as row-ish text rather than disappearing).
  * Footnotes/endnotes (`text:note`) and annotations
  * (`office:annotation`) are excluded: body text is the training
  * corpus, and a footnote splicing itself mid-sentence would corrupt
  * it. `text:s` expands to `text:c` spaces (default 1) and nested
  * spans/links recurse, so styled runs concatenate seamlessly.
  *
  * None for payloads that are not a ZIP, declare a non-text ODF
  * class (a spreadsheet is not a document corpus row), carry no
  * parseable `content.xml`, or have no `office:text` body — and for
  * ENCRYPTED packages, whose `META-INF/manifest.xml` marks entries
  * with encryption-data and whose `content.xml` bytes are therefore
  * not XML, so the parse fails up front (NULL-for-undecodable).
  */
object Odt {

  final case class OdtText(nParagraphs: Int, text: String)

  /** The declared ODF document class must be text (or absent — some
    * producers omit the `mimetype` entry; the content parse is the
    * real gate).
    */
  private val TextMime = "application/vnd.oasis.opendocument.text"

  def extractText(bytes: Array[Byte],
                  maxTotalBytes: Long = Epub.DefaultMaxTotalBytes,
                  maxEntries: Int = Epub.DefaultMaxEntries): Option[OdtText] =
    ZipRead.entries(bytes, maxTotalBytes, maxEntries).flatMap(extractFrom)

  /** The extraction over an ALREADY-unzipped package (one ZIP walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[OdtText] =
    extractBody(files, TextMime, "text")

  /** The shared ODF-package walk, parameterized by document class:
    * the declared `mimetype` must start with `mimePrefix` (absent
    * tolerated — content is the real gate) and the `office:body`
    * child must carry `bodyLabel` (`text` / `spreadsheet` /
    * `presentation` — [[Ods]] and [[Odp]] ride this with their own
    * class labels).
    */
  private[read] def extractBody(files: Map[String, Array[Byte]],
                                mimePrefix: String,
                                bodyLabel: String): Option[OdtText] = {
    files.get("mimetype")
      .map(new String(_, StandardCharsets.US_ASCII).trim) match {
      case Some(m) if !m.startsWith(mimePrefix) => return None
      case _                                    => ()
    }
    val content = files.get("content.xml") match {
      case Some(c) => c
      case None    => return None
    }
    val doc = ZipRead.parseXml(
      new String(content, StandardCharsets.UTF_8)) match {
      case Some(x) => x
      case None    => return None
    }
    // office:body → the class body; scala.xml matches by local name,
    // so take the labelled child of "body" (not a \\ descendant
    // search, which would also catch unrelated locals elsewhere).
    val body = (doc \ "body").headOption match {
      case Some(b) => b
      case None    => return None
    }
    val classBody = body.child.find(_.label == bodyLabel) match {
      case Some(t) => t
      case None    => return None
    }
    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    collectParas(classBody, paras)
    Some(OdtText(paras.length, paras.mkString("\n")))
  }

  /** Paragraph-level walk: `text:p` and `text:h` are paragraphs
    * wherever they appear (lists, table cells, sections nest them);
    * notes, annotations and tracked-change records never contribute.
    */
  private def collectParas(n: scala.xml.Node,
                           out: scala.collection.mutable.ArrayBuffer[String]): Unit =
    n.label match {
      case "p" | "h" => out += renderPara(n)
      case "note" | "annotation" | "tracked-changes" => ()
      case _ => n.child.foreach(collectParas(_, out))
    }

  private def renderPara(p: scala.xml.Node): String = {
    val sb = new StringBuilder
    def walk(n: scala.xml.Node): Unit = n match {
      case t: scala.xml.Text => sb.append(t.data); ()
      case e if e.label == "s" =>
        // text:c is a PREFIXED attribute — match by local key
        val c = e.attributes.collectFirst {
          case a if a.key == "c" => a.value.text
        }.flatMap(v => scala.util.Try(v.toInt).toOption)
          .getOrElse(1)
        // run-length spaces; a hostile huge text:c is capped so one
        // attribute cannot balloon a row
        sb.append(" " * math.min(math.max(c, 0), 10000)); ()
      case e if e.label == "tab" => sb.append('\t'); ()
      case e if e.label == "line-break" => sb.append('\n'); ()
      case e if e.label == "note" || e.label == "annotation" => ()
      case e => e.child.foreach(walk)
    }
    p.child.foreach(walk)
    sb.toString
  }

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** Body text as a string column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
