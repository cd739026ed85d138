package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EPUB (e-book) text extraction — books are a major training-data
  * modality and the format is fully verifiable offline: an EPUB is a
  * ZIP (`java.util.zip`, OCF per the public EPUB 3 spec) whose
  * `META-INF/container.xml` names an OPF package document, whose
  * `<manifest>` maps ids to chapter files and whose `<spine>` gives
  * the READING ORDER. The reference has no document readers at all —
  * beyond-reference surface, same class as [[Pdf]].
  *
  * Spark-first split: the per-payload KERNEL only unzips and orders
  * the chapter XHTML strings; the actual text extraction composes
  * with the existing codegen'd [[graft.ops.TextAnalysis.htmlToText]]
  * cascade in the COLUMN layer ([[textCol]]) — no second HTML
  * extractor to keep consistent, and the hot path stays
  * whole-stage-codegen after the one unzip UDF.
  *
  * Hostile-input bill: total decompressed size and entry count are
  * capped (a ZIP bomb fails the book, not the executor); a missing
  * container/OPF/spine or an entry that will not unzip returns None
  * (NULL-for-undecodable); spine items whose files are MISSING from
  * the archive are skipped (the torn posture — what is present is
  * kept). DOCTYPE declarations are stripped before the two tiny XML
  * parses (external-entity guard).
  */
object Epub {

  /** Unzipped book: spine-ordered chapter XHTML sources. */
  final case class Book(title: String, chapters: Vector[String])

  val DefaultMaxTotalBytes: Long = 256L << 20
  val DefaultMaxEntries: Int = 10000

  private def parseXml(text: String): Option[scala.xml.Elem] =
    ZipRead.parseXml(text)

  private def entries(bytes: Array[Byte], maxTotal: Long,
                      maxEntries: Int): Option[Map[String, Array[Byte]]] =
    ZipRead.entries(bytes, maxTotal, maxEntries)

  /** Resolve `href` against the directory of `base` (both
    * ZIP-internal paths), collapsing `.`/`..` segments.
    */
  private def resolve(base: String, href: String): String = {
    val dir = base.lastIndexOf('/') match {
      case -1 => ""
      case i  => base.substring(0, i + 1)
    }
    val raw = (dir + href).split('/')
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    raw.foreach {
      case "" | "."  => ()
      case ".."      => if (stack.nonEmpty) stack.remove(stack.length - 1)
      case seg       => stack += seg
    }
    stack.mkString("/")
  }

  /** Unzip + spine-order one EPUB payload. None when the container
    * chain (ZIP → container.xml → OPF → spine) cannot be walked or
    * yields zero readable chapters.
    */
  def book(bytes: Array[Byte],
           maxTotalBytes: Long = DefaultMaxTotalBytes,
           maxEntries: Int = DefaultMaxEntries): Option[Book] =
    entries(bytes, maxTotalBytes, maxEntries).flatMap(bookFrom)

  /** The container chain over an ALREADY-unzipped package (one ZIP
    * walk per row, shared with [[DocumentProbe]]).
    */
  /** One OPF metadata field (dc:title, dc:creator, …) by local
    * label, off the same container→OPF walk.
    */
  private[read] def opfField(files: Map[String, Array[Byte]],
                             label: String): Option[String] = {
    val container = files.get("META-INF/container.xml")
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(parseXml) match {
      case Some(x) => x
      case None    => return None
    }
    val opfPath = (container \\ "rootfile")
      .flatMap(_.attribute("full-path")).flatten
      .map(_.text).headOption match {
      case Some(p) => p
      case None    => return None
    }
    files.get(opfPath)
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(parseXml)
      .flatMap(opf => (opf \\ label).headOption)
      .map(_.text.trim).filter(_.nonEmpty)
  }

  private[read] def bookFrom(files: Map[String, Array[Byte]]): Option[Book] = {
    val container = files.get("META-INF/container.xml")
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(parseXml) match {
      case Some(x) => x
      case None    => return None
    }
    val opfPath = (container \\ "rootfile")
      .flatMap(_.attribute("full-path")).flatten
      .map(_.text).headOption match {
      case Some(p) => p
      case None    => return None
    }
    val opf = files.get(opfPath)
      .map(new String(_, StandardCharsets.UTF_8))
      .flatMap(parseXml) match {
      case Some(x) => x
      case None    => return None
    }
    val title = (opf \\ "title").headOption.map(_.text.trim).getOrElse("")
    val hrefById = (opf \\ "item").flatMap { it =>
      for {
        id <- it.attribute("id").flatMap(_.headOption).map(_.text)
        href <- it.attribute("href").flatMap(_.headOption).map(_.text)
      } yield id -> href
    }.toMap
    val spineIds = (opf \\ "itemref")
      .flatMap(_.attribute("idref")).flatten.map(_.text)
    if (spineIds.isEmpty) return None
    val chapters = spineIds.flatMap(hrefById.get)
      .map(resolve(opfPath, _))
      .flatMap(files.get) // missing chapter files skip: torn posture
      .map(new String(_, StandardCharsets.UTF_8))
      .toVector
    if (chapters.isEmpty) None else Some(Book(title, chapters))
  }

  private val chaptersUdf = udf { (bytes: Array[Byte]) =>
    book(bytes).map(b => (b.title, b.chapters))
  }

  /** Struct column `(title, chapters array<string>)` of raw
    * spine-ordered XHTML; NULL when the payload is not a readable
    * EPUB.
    */
  def bookCol(bytesCol: Column): Column = chaptersUdf(bytesCol)

  /** The whole book as ONE text column: chapters joined by form feed
    * (the [[Pdf]] page convention), each put through the codegen'd
    * [[graft.ops.TextAnalysis.htmlToText]] cascade. NULL when
    * unreadable.
    */
  def textCol(bytesCol: Column): Column = {
    val joined = array_join(
      transform(bookCol(bytesCol).getField("_2"),
        c => graft.ops.TextAnalysis.htmlToText(c)),
      "\f")
    // collapse form feeds around empty chapters is left to curation;
    // trim the whole-book edges only
    trim(joined)
  }
}
