package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** PPTX (OOXML PresentationML, ECMA-376) text extraction — the
  * modern sibling of [[Ppt]]: slide text lives in DrawingML `<a:t>`
  * runs inside `<a:p>` paragraphs, slides come in PRESENTATION order
  * per `ppt/presentation.xml`'s `<p:sldId>` list (each resolved
  * through the presentation part's own rels — the conventional
  * `slides/slideN.xml` names are a fallback, not a contract).
  *
  * Paragraph shape follows [[Ppt]]: each `<a:p>` is a paragraph
  * (its `<a:t>` runs concatenate, `<a:br/>` becomes a line break
  * within it), paragraphs join with newlines. Speaker notes are
  * INCLUDED — each slide's notes part (via the slide's own rels,
  * relationship type `…/notesSlide`) contributes its paragraphs
  * right after the slide, the [[Ppt]] posture (on a real deck the
  * notes often carry the bulk of the prose). A deck with no text
  * runs extracts as zero paragraphs (an image-only deck is a valid
  * empty document, not an error).
  *
  * None when the payload is not an OPC ZIP or carries no parseable
  * presentation part. ENCRYPTED .pptx are CFB containers, not ZIPs,
  * so they fail the magic check up front (NULL-for-undecodable).
  */
object Pptx {

  final case class PptxText(nParagraphs: Int, text: String)

  def extractText(bytes: Array[Byte],
                  maxTotalBytes: Long = Epub.DefaultMaxTotalBytes,
                  maxEntries: Int = Epub.DefaultMaxEntries): Option[PptxText] =
    ZipRead.entries(bytes, maxTotalBytes, maxEntries).flatMap(extractFrom)

  /** One slide/notes part's paragraphs: `<a:p>` in document order,
    * `<a:t>` runs concatenated, `<a:br/>` as an in-paragraph newline.
    */
  private def partParas(xml: scala.xml.Elem): Seq[String] =
    (xml \\ "p").flatMap { p =>
      val sb = new StringBuilder
      def walk(n: scala.xml.Node): Unit = n.label match {
        case "t"  => sb.append(n.text)
        case "br" => sb.append('\n')
        case "pPr" | "rPr" | "endParaRPr" => () // property subtrees
        case _    => n.child.foreach(walk)
      }
      p.child.foreach(walk)
      val s = sb.toString.trim
      if (s.nonEmpty) Some(s) else None
    }

  /** The extraction over an ALREADY-unzipped package (one ZIP walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[PptxText] = {
    val mainPath = Docx.mainPartTarget(files).filter(files.contains)
      .orElse(Some("ppt/presentation.xml").filter(files.contains)) match {
      case Some(p) => p
      case None    => return None
    }
    val pres = ZipRead.parseXml(
      new String(files(mainPath), StandardCharsets.UTF_8)) match {
      case Some(x) => x
      case None    => return None
    }
    val rels = Xlsx.partRels(files, mainPath)

    // slide parts in presentation order via <p:sldId r:id=…>;
    // conventional numeric names when the rels are absent or torn
    val slideIds = (pres \\ "sldId").flatMap { s =>
      s.attributes.collectFirst {
        case a if a.key == "id" && a.isPrefixed => a.value.text
      }
    }
    val slidePaths: Seq[String] = {
      val viaRels = slideIds.flatMap(rels.get).filter(files.contains)
      if (viaRels.nonEmpty) viaRels
      else files.keys.filter(k =>
        k.matches("""ppt/slides/slide\d+\.xml""")).toSeq
        .sortBy(k => """\d+""".r.findFirstIn(
          k.substring(k.lastIndexOf('/'))).map(_.toInt).getOrElse(0))
    }

    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    slidePaths.foreach { sp =>
      ZipRead.parseXml(new String(files(sp), StandardCharsets.UTF_8))
        .foreach(paras ++= partParas(_))
      // the slide's notes part, right after it (the Ppt posture):
      // resolved by relationship TYPE from the slide's own rels
      val notesRelsPath = sp.lastIndexOf('/') match {
        case -1 => "_rels/" + sp + ".rels"
        case i  => sp.substring(0, i + 1) + "_rels/" +
          sp.substring(i + 1) + ".rels"
      }
      val notesTargets = files.get(notesRelsPath)
        .map(new String(_, StandardCharsets.UTF_8))
        .flatMap(ZipRead.parseXml)
        .map { r =>
          (r \\ "Relationship").flatMap { rel =>
            val t = rel.attribute("Type").flatMap(_.headOption)
              .map(_.text).getOrElse("")
            val target = rel.attribute("Target").flatMap(_.headOption)
              .map(_.text).getOrElse("")
            if (t.endsWith("/notesSlide") && target.nonEmpty)
              Some(Xlsx.resolveTarget(sp, target))
            else None
          }
        }.getOrElse(Seq.empty)
      notesTargets.filter(files.contains).foreach { np =>
        ZipRead.parseXml(new String(files(np), StandardCharsets.UTF_8))
          .foreach(paras ++= partParas(_))
      }
    }
    Some(PptxText(paras.length, paras.mkString("\n")))
  }

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** Deck + notes text as a column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
