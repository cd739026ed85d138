package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

/** INDEPENDENT spec-side DOCX writer (the EpubFixture discipline):
  * OPC ZIP via the JDK's `ZipOutputStream`, package rels and
  * WordprocessingML forward from ECMA-376 — no code shared with
  * [[graft.engine.read.Docx]].
  */
object DocxFixture {

  private val W =
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** One paragraph's inner XML from typed pieces. */
  sealed trait Piece
  final case class T(text: String) extends Piece
  case object Tab extends Piece
  case object Br extends Piece

  def para(pieces: Piece*): String =
    "<w:p><w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/></w:tabs>" +
      "</w:pPr><w:r><w:rPr><w:b/></w:rPr>" +
      pieces.map {
        case T(s) => s"""<w:t xml:space="preserve">${escape(s)}</w:t>"""
        case Tab  => "<w:tab/>"
        case Br   => "<w:br/>"
      }.mkString + "</w:r></w:p>"

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def documentXml(paras: Seq[String]): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<w:document xmlns:w="$W"><w:body>
       |${paras.mkString("\n")}
       |</w:body></w:document>""".stripMargin

  private def rels(target: String) =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships
       |    xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |  <Relationship Id="rId1"
       |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"
       |      Target="$target"/>
       |</Relationships>""".stripMargin

  /** A minimal valid .docx; `docPath` overrides where the main part
    * lives and `relsTarget` what the rels declare (diverging the two
    * exercises the fallback-vs-rels logic; aligning them on a
    * non-default name exercises rels-authoritative routing).
    */
  def docx(paras: Seq[String],
           withRels: Boolean = true,
           docPath: String = "word/document.xml",
           relsTarget: String = "word/document.xml",
           coreTitle: Option[String] = None): Array[Byte] =
    EpubFixture.zip(
      (if (withRels) Seq("_rels/.rels" -> rels(relsTarget).getBytes(UTF_8))
       else Seq.empty) ++
        coreTitle.map(t => "docProps/core.xml" -> coreXml(t).getBytes(UTF_8)) :+
        (docPath -> documentXml(paras).getBytes(UTF_8)))

  /** OPC core properties (ECMA-376 Part 2): dc:title, dc:creator
    * and dcterms:created.
    */
  def coreXml(title: String,
              created: String = "2024-05-01T10:00:00Z"): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<cp:coreProperties
       |    xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
       |    xmlns:dc="http://purl.org/dc/elements/1.1/"
       |    xmlns:dcterms="http://purl.org/dc/terms/"
       |    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
       |  <dc:title>${escape(title)}</dc:title>
       |  <dc:creator>fixture</dc:creator>
       |  <dcterms:created xsi:type="dcterms:W3CDTF">$created</dcterms:created>
       |</cp:coreProperties>""".stripMargin

  /** A single-row, two-cell table — cells hold ordinary paragraphs. */
  def table(cellA: String, cellB: String): String =
    "<w:tbl><w:tr>" +
      s"<w:tc>${para(T(cellA))}</w:tc><w:tc>${para(T(cellB))}</w:tc>" +
      "</w:tr></w:tbl>"
}
