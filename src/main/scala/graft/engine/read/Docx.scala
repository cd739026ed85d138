package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** DOCX (OOXML WordprocessingML) text extraction — with PDF and EPUB
  * this closes the third dominant crawl document format, and the
  * whole container is verifiable offline: an OPC ZIP
  * ([[ZipRead]], same caps) whose package relationships
  * (`_rels/.rels`, ECMA-376 Part 2) name the main document part,
  * whose `<w:p>` paragraphs carry `<w:t>` text runs with `<w:tab/>`
  * and `<w:br/>` controls (Part 1, §17).
  *
  * Extraction walks each paragraph's nodes IN DOCUMENT ORDER (text,
  * tabs, breaks interleave correctly), joins paragraphs with
  * newlines; table cells are paragraphs like any other, so a table
  * reads row-ish text rather than disappearing. Headers/footers/
  * footnotes live in other parts and are deliberately out: body text
  * is the training corpus.
  *
  * None for payloads that are not an OPC ZIP, carry no main document
  * part, or whose document XML does not parse — and for ENCRYPTED
  * .docx, which are OLE2 (CFB) containers, not ZIPs, so they fail the
  * magic check up front (NULL-for-undecodable).
  */
object Docx {

  final case class DocxText(nParagraphs: Int, text: String)

  def extractText(bytes: Array[Byte],
                  maxTotalBytes: Long = Epub.DefaultMaxTotalBytes,
                  maxEntries: Int = Epub.DefaultMaxEntries): Option[DocxText] =
    ZipRead.entries(bytes, maxTotalBytes, maxEntries).flatMap(extractFrom)

  /** The OPC main-part target per the package rels (a REAL XML
    * attribute lookup — attribute order, quoting and intervening
    * attributes are all legal variation a regex would trip on).
    * Shared with [[DocumentProbe]]'s ZIP classification.
    */
  private[read] def mainPartTarget(files: Map[String, Array[Byte]]): Option[String] =
    files.get("_rels/.rels")
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(ZipRead.parseXml)
      .flatMap { rels =>
        (rels \\ "Relationship").collectFirst(Function.unlift { r =>
          val t = r.attribute("Type").flatMap(_.headOption)
            .map(_.text).getOrElse("")
          val target = r.attribute("Target").flatMap(_.headOption)
            .map(_.text).getOrElse("")
          if (t.endsWith("/officeDocument") && target.nonEmpty)
            Some(target.stripPrefix("/"))
          else None
        })
      }

  /** The extraction over an ALREADY-unzipped package (one ZIP walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[DocxText] = {
    // the main part per the package rels; word/document.xml as the
    // de-facto fallback when rels are absent or unparseable
    val fromRels = mainPartTarget(files)
    val mainPath = fromRels.filter(files.contains)
      .orElse(Some("word/document.xml").filter(files.contains)) match {
      case Some(p) => p
      case None    => return None
    }
    val doc = ZipRead.parseXml(
      new String(files(mainPath), StandardCharsets.UTF_8)) match {
      case Some(x) => x
      case None    => return None
    }
    val paras = (doc \\ "p").map { p =>
      val sb = new StringBuilder
      def walk(n: scala.xml.Node): Unit = n.label match {
        case "t"   => sb.append(n.text)
        case "tab" => sb.append('\t')
        case "br" | "cr" => sb.append('\n')
        // property subtrees carry tab STOP definitions (w:pPr/w:tabs/
        // w:tab) and run props — never text
        case "pPr" | "rPr" => ()
        case _     => n.child.foreach(walk)
      }
      p.child.foreach(walk)
      sb.toString
    }
    Some(DocxText(paras.length, paras.mkString("\n")))
  }

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** Body text as a string column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
