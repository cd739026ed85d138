package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

/** INDEPENDENT spec-side PPTX writer (the DocxFixture discipline):
  * an OPC ZIP via [[EpubFixture.zip]] with PresentationML parts
  * written forward from ECMA-376 — `p:sldIdLst` presentation order
  * routed through the presentation part's own rels, DrawingML
  * `<a:p>/<a:r>/<a:t>` slide bodies, and notes parts linked from
  * each slide's rels. No code shared with
  * [[graft.engine.read.Pptx]].
  */
object PptxFixture {

  private val A = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val P = "http://schemas.openxmlformats.org/presentationml/2006/main"
  private val R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One DrawingML paragraph: runs joined, `\n` inside a run becomes
    * an `<a:br/>`.
    */
  def aPara(runs: String*): String = {
    val body = runs.map { r =>
      r.split("\n", -1).map(seg =>
        s"""<a:r><a:rPr lang="en-US" b="1"/><a:t>${escape(seg)}</a:t></a:r>""")
        .mkString("<a:br/>")
    }.mkString
    s"""<a:p><a:pPr algn="l"/>$body<a:endParaRPr lang="en-US"/></a:p>"""
  }

  /** A slide (or notes) part: paragraphs inside one text body. */
  def slideXml(paras: Seq[String], root: String = "sld"): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<p:$root xmlns:p="$P" xmlns:a="$A" xmlns:r="$R">
       |<p:cSld><p:spTree><p:sp><p:txBody>
       |<a:bodyPr/>${paras.mkString}
       |</p:txBody></p:sp></p:spTree></p:cSld>
       |</p:$root>""".stripMargin

  private def rootRels: String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships
       |    xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |  <Relationship Id="rId1"
       |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"
       |      Target="ppt/presentation.xml"/>
       |</Relationships>""".stripMargin

  private def presentationXml(slideRids: Seq[String]): String = {
    val list = slideRids.zipWithIndex.map { case (rid, i) =>
      s"""<p:sldId id="${256 + i}" r:id="$rid"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<p:presentation xmlns:p="$P" xmlns:r="$R">
       |<p:sldIdLst>$list</p:sldIdLst>
       |</p:presentation>""".stripMargin
  }

  private def presentationRels(targets: Seq[(String, String)]): String = {
    val rels = targets.map { case (rid, t) =>
      s"""  <Relationship Id="$rid"
         |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide"
         |      Target="$t"/>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships
       |    xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |$rels
       |</Relationships>""".stripMargin
  }

  private def slideRels(notesTarget: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships
       |    xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |  <Relationship Id="rId9"
       |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/notesSlide"
       |      Target="$notesTarget"/>
       |</Relationships>""".stripMargin

  /** One slide's content: its paragraphs and optional notes
    * paragraphs (linked through the slide's own rels).
    */
  final case class Slide(paras: Seq[String], notes: Seq[String] = Seq.empty)

  /** A minimal valid .pptx. The `p:sldIdLst` order is the reading
    * order; `scrambleNames` diverges member names from that order to
    * prove rels routing (slide files named in REVERSE).
    */
  def pptx(slides: Seq[Slide], scrambleNames: Boolean = false): Array[Byte] = {
    val n = slides.length
    val slideFile: Int => String =
      if (scrambleNames) i => s"ppt/slides/slide${n - i}.xml"
      else i => s"ppt/slides/slide${i + 1}.xml"
    val rids = slides.indices.map(i => s"rId${i + 2}")
    val targets = slides.indices.map(i =>
      rids(i) -> slideFile(i).stripPrefix("ppt/"))
    val entries = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])](
      "_rels/.rels" -> rootRels.getBytes(UTF_8),
      "ppt/presentation.xml" -> presentationXml(rids).getBytes(UTF_8),
      "ppt/_rels/presentation.xml.rels" ->
        presentationRels(targets).getBytes(UTF_8))
    slides.zipWithIndex.foreach { case (s, i) =>
      val sf = slideFile(i)
      entries += sf -> slideXml(s.paras).getBytes(UTF_8)
      if (s.notes.nonEmpty) {
        val notesFile = s"ppt/notesSlides/notesSlide${i + 1}.xml"
        val dir = sf.substring(0, sf.lastIndexOf('/') + 1)
        val relsPath = dir + "_rels/" + sf.substring(dir.length) + ".rels"
        entries += relsPath ->
          slideRels(s"../notesSlides/notesSlide${i + 1}.xml").getBytes(UTF_8)
        entries += notesFile -> slideXml(s.notes, root = "notes").getBytes(UTF_8)
      }
    }
    EpubFixture.zip(entries.toSeq)
  }
}
