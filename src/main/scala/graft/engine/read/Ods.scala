package graft.engine.read

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ODS (OpenDocument Spreadsheet) text extraction — LibreOffice's
  * sibling of [[Xlsx]], riding the SAME [[Odt]] package walk with the
  * spreadsheet class: `office:body/office:spreadsheet`, where cell
  * text lives in `text:p` paragraphs inside `table:table-cell`
  * elements in document order. Each text-bearing cell is a paragraph
  * (the [[Xls]]/[[Xlsx]] posture: a sheet reads as row-ish text;
  * number-only cells carry no `text:p` content worth keeping — their
  * display strings are formatting, not corpus text). Footnotes and
  * annotations are excluded by the shared walk.
  *
  * None when not a ZIP, when the declared class is not spreadsheet,
  * or when `content.xml` has no parseable spreadsheet body.
  */
object Ods {

  private val Mime = "application/vnd.oasis.opendocument.spreadsheet"

  def extractText(bytes: Array[Byte],
                  maxTotalBytes: Long = Epub.DefaultMaxTotalBytes,
                  maxEntries: Int = Epub.DefaultMaxEntries): Option[Odt.OdtText] =
    ZipRead.entries(bytes, maxTotalBytes, maxEntries).flatMap(extractFrom)

  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[Odt.OdtText] =
    Odt.extractBody(files, Mime, "spreadsheet")

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** Cell text as a string column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
