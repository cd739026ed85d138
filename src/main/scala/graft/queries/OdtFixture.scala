package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

/** INDEPENDENT spec-side ODT writer (the EpubFixture/DocxFixture
  * discipline): an ODF package ZIP via the JDK's `ZipOutputStream`,
  * `mimetype` + `content.xml` written forward from OASIS ODF 1.2 —
  * no code shared with [[graft.engine.read.Odt]].
  */
object OdtFixture {

  val TextMime = "application/vnd.oasis.opendocument.text"

  private val OfficeNs =
    "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  private val TextNs =
    "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  private val TableNs =
    "urn:oasis:names:tc:opendocument:xmlns:table:1.0"

  /** Typed paragraph pieces (document order preserved). */
  sealed trait Piece
  final case class T(text: String) extends Piece
  final case class Spaces(c: Int) extends Piece
  case object Tab extends Piece
  case object LineBreak extends Piece
  final case class Span(text: String) extends Piece
  final case class Note(body: String) extends Piece

  def para(pieces: Piece*): String =
    "<text:p text:style-name=\"Standard\">" + inner(pieces) + "</text:p>"

  def heading(level: Int, pieces: Piece*): String =
    s"""<text:h text:outline-level="$level">${inner(pieces)}</text:h>"""

  private def inner(pieces: Seq[Piece]): String = pieces.map {
    case T(s)      => escape(s)
    case Spaces(c) => s"""<text:s text:c="$c"/>"""
    case Tab       => "<text:tab/>"
    case LineBreak => "<text:line-break/>"
    case Span(s)   => s"""<text:span text:style-name="B">${escape(s)}</text:span>"""
    case Note(b) =>
      "<text:note text:note-class=\"footnote\"><text:note-body>" +
        s"<text:p>${escape(b)}</text:p></text:note-body></text:note>"
  }.mkString

  /** A two-item flat list — items hold ordinary paragraphs. */
  def list(itemA: String, itemB: String): String =
    "<text:list><text:list-item>" + para(T(itemA)) +
      "</text:list-item><text:list-item>" + para(T(itemB)) +
      "</text:list-item></text:list>"

  /** A single-row, two-cell table — cells hold ordinary paragraphs. */
  def table(cellA: String, cellB: String): String =
    "<table:table table:name=\"T1\"><table:table-row>" +
      s"<table:table-cell>${para(T(cellA))}</table:table-cell>" +
      s"<table:table-cell>${para(T(cellB))}</table:table-cell>" +
      "</table:table-row></table:table>"

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def contentXml(bodyElems: Seq[String]): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<office:document-content xmlns:office="$OfficeNs"
       |    xmlns:text="$TextNs" xmlns:table="$TableNs"
       |    office:version="1.2">
       |  <office:body><office:text>
       |${bodyElems.mkString("\n")}
       |  </office:text></office:body>
       |</office:document-content>""".stripMargin

  /** A minimal valid .odt; `mimetype` overrides the declared class
    * (None drops the entry — some producers omit it).
    */
  def odt(bodyElems: Seq[String],
          mimetype: Option[String] = Some(TextMime),
          metaTitle: Option[String] = None): Array[Byte] =
    EpubFixture.zip(
      mimetype.map(m => "mimetype" -> m.getBytes(UTF_8)).toSeq ++
        metaTitle.map(t => "meta.xml" -> metaXml(t).getBytes(UTF_8)) :+
        ("content.xml" -> contentXml(bodyElems).getBytes(UTF_8)))

  /** ODF meta.xml: dc:title, dc:creator and meta:creation-date. */
  def metaXml(title: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<office:document-meta xmlns:office="$OfficeNs"
       |    xmlns:dc="http://purl.org/dc/elements/1.1/"
       |    xmlns:meta="urn:oasis:names:tc:opendocument:xmlns:meta:1.0"
       |    office:version="1.2">
       |  <office:meta><dc:title>${escape(title)}</dc:title>
       |  <dc:creator>odf author</dc:creator>
       |  <meta:creation-date>2023-03-03T09:00:00</meta:creation-date>
       |  </office:meta>
       |</office:document-meta>""".stripMargin

  // ---- ODS / ODP siblings (r14) -------------------------------------

  val SpreadsheetMime = "application/vnd.oasis.opendocument.spreadsheet"
  val PresentationMime = "application/vnd.oasis.opendocument.presentation"

  private val DrawNs =
    "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
  private val PresentationNs =
    "urn:oasis:names:tc:opendocument:xmlns:presentation:1.0"

  /** One spreadsheet cell: text (a `text:p`), or a value-typed
    * number cell with only a display string a corpus reader must NOT
    * keep (formatting, not content) when `numeric` is set.
    */
  def cell(text: String, numeric: Boolean = false): String =
    if (numeric)
      s"""<table:table-cell office:value-type="float" office:value="$text"/>"""
    else s"""<table:table-cell><text:p>${escape(text)}</text:p></table:table-cell>"""

  private def odsContentXml(rows: Seq[Seq[String]]): String = {
    val body = rows.map(r =>
      s"""<table:table-row>${r.mkString}</table:table-row>""")
      .mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<office:document-content xmlns:office="$OfficeNs"
       |    xmlns:text="$TextNs" xmlns:table="$TableNs"
       |    office:version="1.2">
       |  <office:body><office:spreadsheet>
       |  <table:table table:name="Sheet1">
       |$body
       |  </table:table>
       |  </office:spreadsheet></office:body>
       |</office:document-content>""".stripMargin
  }

  /** A minimal valid .ods from rows of [[cell]] strings. */
  def ods(rows: Seq[Seq[String]],
          mimetype: Option[String] = Some(SpreadsheetMime)): Array[Byte] =
    EpubFixture.zip(
      mimetype.map(m => "mimetype" -> m.getBytes(UTF_8)).toSeq :+
        ("content.xml" -> odsContentXml(rows).getBytes(UTF_8)))

  private def frame(paras: Seq[String]): String =
    s"""<draw:frame><draw:text-box>${paras.map(p =>
      s"<text:p>${escape(p)}</text:p>").mkString}</draw:text-box></draw:frame>"""

  private def odpContentXml(slides: Seq[(Seq[String], Seq[String])]): String = {
    val pages = slides.zipWithIndex.map { case ((paras, notes), i) =>
      val notesXml =
        if (notes.isEmpty) ""
        else s"""<presentation:notes>${frame(notes)}</presentation:notes>"""
      s"""<draw:page draw:name="page${i + 1}">${frame(paras)}$notesXml</draw:page>"""
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<office:document-content xmlns:office="$OfficeNs"
       |    xmlns:text="$TextNs" xmlns:draw="$DrawNs"
       |    xmlns:presentation="$PresentationNs"
       |    office:version="1.2">
       |  <office:body><office:presentation>
       |$pages
       |  </office:presentation></office:body>
       |</office:document-content>""".stripMargin
  }

  /** A minimal valid .odp; each slide is (paragraphs, notes). */
  def odp(slides: Seq[(Seq[String], Seq[String])],
          mimetype: Option[String] = Some(PresentationMime)): Array[Byte] =
    EpubFixture.zip(
      mimetype.map(m => "mimetype" -> m.getBytes(UTF_8)).toSeq :+
        ("content.xml" -> odpContentXml(slides).getBytes(UTF_8)))
}
