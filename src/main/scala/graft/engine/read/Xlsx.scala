package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** XLSX (OOXML SpreadsheetML, ECMA-376) text extraction — the modern
  * sibling of [[Xls]], and the same discipline mapped onto an OPC ZIP
  * instead of a BIFF8 stream: cell text lives in the shared string
  * table (`xl/sharedStrings.xml`, one `<si>` per unique string —
  * plain `<t>` or rich `<r><t>` runs, phonetic `<rPh>` blocks
  * excluded) and is referenced by `t="s"` cells in sheet order;
  * `t="inlineStr"` cells carry their text inline and `t="str"` cells
  * carry a formula's cached string result in `<v>`.
  *
  * Sheet order comes from `xl/workbook.xml`'s `<sheet>` list, each
  * resolved through the workbook part's OWN rels
  * (`xl/_rels/workbook.xml.rels` — the conventional
  * `worksheets/sheetN.xml` names are a fallback, not a contract).
  * Each string-valued cell is a paragraph (the table-reads-as-
  * row-ish-text posture shared with [[Xls]]/[[Docx]]/[[Odt]]);
  * duplicate references repeat their string, exactly as the sheet
  * displays it. Numeric/boolean cells are skipped — a numbers-only
  * workbook extracts as zero paragraphs (a valid empty text
  * document), never an error.
  *
  * None when the payload is not an OPC ZIP or carries no parseable
  * workbook part. ENCRYPTED .xlsx are CFB containers
  * (`EncryptionInfo`/`EncryptedPackage`), not ZIPs, so they fail the
  * magic check up front (NULL-for-undecodable, the house stance).
  */
object Xlsx {

  final case class XlsxText(nParagraphs: Int, text: String)

  def extractText(bytes: Array[Byte],
                  maxTotalBytes: Long = Epub.DefaultMaxTotalBytes,
                  maxEntries: Int = Epub.DefaultMaxEntries): Option[XlsxText] =
    ZipRead.entries(bytes, maxTotalBytes, maxEntries).flatMap(extractFrom)

  /** Resolve an OPC relationship target against the source part's
    * directory (`worksheets/sheet1.xml` under `xl/` →
    * `xl/worksheets/sheet1.xml`; a leading `/` is package-absolute).
    */
  private[read] def resolveTarget(basePart: String, target: String): String = {
    if (target.startsWith("/")) return target.stripPrefix("/")
    val dir = basePart.lastIndexOf('/') match {
      case -1 => ""
      case i  => basePart.substring(0, i + 1)
    }
    // normalize ../ segments (rels targets may climb)
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    (dir + target).split("/").foreach {
      case ".." => if (segs.nonEmpty) segs.remove(segs.length - 1)
      case "."  => ()
      case s if s.nonEmpty => segs += s
      case _    => ()
    }
    segs.mkString("/")
  }

  /** A part's own rels map (Id → resolved target path). */
  private[read] def partRels(files: Map[String, Array[Byte]],
                             part: String): Map[String, String] = {
    val dir = part.lastIndexOf('/') match {
      case -1 => ""
      case i  => part.substring(0, i + 1)
    }
    val relsPath = dir + "_rels/" + part.substring(dir.length) + ".rels"
    files.get(relsPath)
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(ZipRead.parseXml)
      .map { rels =>
        (rels \\ "Relationship").flatMap { r =>
          val id = r.attribute("Id").flatMap(_.headOption)
            .map(_.text).getOrElse("")
          val target = r.attribute("Target").flatMap(_.headOption)
            .map(_.text).getOrElse("")
          if (id.nonEmpty && target.nonEmpty)
            Some(id -> resolveTarget(part, target))
          else None
        }.toMap
      }.getOrElse(Map.empty)
  }

  /** One `<si>`/`<is>` entry's text: plain `<t>` or rich `<r><t>`
    * runs in order, phonetic `<rPh>`/`<phoneticPr>` excluded.
    */
  private def siText(si: scala.xml.Node): String = {
    val sb = new StringBuilder
    si.child.foreach { c =>
      c.label match {
        case "t" => sb.append(c.text)
        case "r" => (c \ "t").foreach(t => sb.append(t.text))
        case _   => () // rPh / phoneticPr / extLst: never body text
      }
    }
    sb.toString
  }

  /** The extraction over an ALREADY-unzipped package (one ZIP walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[XlsxText] = {
    val wbPath = Docx.mainPartTarget(files).filter(files.contains)
      .orElse(Some("xl/workbook.xml").filter(files.contains)) match {
      case Some(p) => p
      case None    => return None
    }
    val wb = ZipRead.parseXml(
      new String(files(wbPath), StandardCharsets.UTF_8)) match {
      case Some(x) => x
      case None    => return None
    }
    val rels = partRels(files, wbPath)

    // shared strings: the workbook rels name the part; fall back to
    // the conventional sibling path
    val sstPath = rels.collectFirst {
      case (_, t) if t.endsWith("sharedStrings.xml") => t
    }.orElse(Some(resolveTarget(wbPath, "sharedStrings.xml")))
      .filter(files.contains)
    val shared: Vector[String] = sstPath
      .map(p => new String(files(p), StandardCharsets.UTF_8))
      .flatMap(ZipRead.parseXml)
      .map(sst => (sst \ "si").map(siText).toVector)
      .getOrElse(Vector.empty)

    // sheets in workbook order, via each <sheet>'s r:id; conventional
    // numeric names when the rels are absent or torn
    // the r:id attribute is PREFIXED — match by local key + prefix
    // presence so the unprefixed sheetId can never shadow it
    val sheetIds = (wb \\ "sheet").flatMap { s =>
      s.attributes.collectFirst {
        case a if a.key == "id" && a.isPrefixed => a.value.text
      }
    }
    val sheetPaths: Seq[String] = {
      val viaRels = sheetIds.flatMap(rels.get).filter(files.contains)
      if (viaRels.nonEmpty) viaRels
      else files.keys.filter(k =>
        k.matches(""".*worksheets/sheet\d+\.xml""")).toSeq
        .sortBy(k => """\d+""".r.findFirstIn(
          k.substring(k.lastIndexOf('/'))).map(_.toInt).getOrElse(0))
    }

    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    sheetPaths.foreach { p =>
      ZipRead.parseXml(new String(files(p), StandardCharsets.UTF_8))
        .foreach { sheet =>
          (sheet \\ "c").foreach { c =>
            val t = c.attribute("t").flatMap(_.headOption)
              .map(_.text).getOrElse("")
            val text: Option[String] = t match {
              case "s" =>
                (c \ "v").headOption.map(_.text.trim)
                  .flatMap(v => scala.util.Try(v.toInt).toOption)
                  .collect { case i if i >= 0 && i < shared.length =>
                    shared(i) }
              case "inlineStr" =>
                (c \ "is").headOption.map(siText)
              case "str" =>
                (c \ "v").headOption.map(_.text)
              case _ => None // n / b / e / d: not corpus text
            }
            text.map(_.trim).filter(_.nonEmpty).foreach(paras += _)
          }
        }
    }
    Some(XlsxText(paras.length, paras.mkString("\n")))
  }

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** String-cell text as a column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
