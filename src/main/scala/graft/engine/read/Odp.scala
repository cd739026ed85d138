package graft.engine.read

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ODP (OpenDocument Presentation) text extraction — LibreOffice's
  * sibling of [[Pptx]], riding the SAME [[Odt]] package walk with the
  * presentation class: `office:body/office:presentation`, where
  * slide text lives in `text:p` paragraphs inside `draw:frame` text
  * boxes on each `draw:page`, in document order. Speaker notes
  * (`presentation:notes`, local label `notes` ≠ the excluded
  * footnote `note`) sit inside their `draw:page` and are INCLUDED
  * right after the slide's own text — the [[Ppt]]/[[Pptx]] posture.
  *
  * None when not a ZIP, when the declared class is not presentation,
  * or when `content.xml` has no parseable presentation body.
  */
object Odp {

  private val Mime = "application/vnd.oasis.opendocument.presentation"

  def extractText(bytes: Array[Byte],
                  maxTotalBytes: Long = Epub.DefaultMaxTotalBytes,
                  maxEntries: Int = Epub.DefaultMaxEntries): Option[Odt.OdtText] =
    ZipRead.entries(bytes, maxTotalBytes, maxEntries).flatMap(extractFrom)

  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[Odt.OdtText] =
    Odt.extractBody(files, Mime, "presentation")

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** Slide + notes text as a string column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
