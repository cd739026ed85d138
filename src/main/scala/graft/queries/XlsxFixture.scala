package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

/** INDEPENDENT spec-side XLSX writer (the DocxFixture discipline):
  * an OPC ZIP via [[EpubFixture.zip]] with SpreadsheetML parts
  * written forward from ECMA-376 — workbook sheet list with
  * `r:id`-routed worksheet targets, `sharedStrings.xml` with plain,
  * rich-run and phonetic-block entries, and cells of every
  * SpreadsheetML type (`s`, `inlineStr`, `str`, numeric, boolean).
  * No code shared with [[graft.engine.read.Xlsx]].
  */
object XlsxFixture {

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One shared-string entry. `richRuns` splits the text across
    * `<r><t>` runs; `phonetic` adds an `<rPh>` block a correct reader
    * must exclude.
    */
  def si(text: String, richRuns: Int = 0, phonetic: String = ""): String = {
    val body =
      if (richRuns <= 1) s"""<t xml:space="preserve">${escape(text)}</t>"""
      else {
        val per = math.max(1, text.length / richRuns)
        text.grouped(per).map(run =>
          s"""<r><rPr><b/></rPr><t xml:space="preserve">${escape(run)}</t></r>""")
          .mkString
      }
    val ph =
      if (phonetic.isEmpty) ""
      else s"""<rPh sb="0" eb="1"><t>${escape(phonetic)}</t></rPh><phoneticPr fontId="1"/>"""
    s"<si>$body$ph</si>"
  }

  def sharedStringsXml(sis: Seq[String]): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
       |     count="${sis.length}" uniqueCount="${sis.length}">
       |${sis.mkString("\n")}
       |</sst>""".stripMargin

  sealed trait Cell
  /** `t="s"`: a shared-string reference by SST index. */
  final case class SRef(ref: String, isst: Int) extends Cell
  /** `t="inlineStr"`: text inline in the cell. */
  final case class Inline(ref: String, text: String) extends Cell
  /** `t="str"`: a formula's cached string result. */
  final case class FStr(ref: String, text: String) extends Cell
  /** numeric — a correct reader skips it. */
  final case class Num(ref: String, v: Double) extends Cell
  /** boolean — a correct reader skips it. */
  final case class Bool(ref: String, v: Boolean) extends Cell

  def sheetXml(cells: Seq[Cell]): String = {
    val body = cells.map {
      case SRef(r, i)   => s"""<c r="$r" t="s"><v>$i</v></c>"""
      case Inline(r, t) =>
        s"""<c r="$r" t="inlineStr"><is><t xml:space="preserve">${escape(t)}</t></is></c>"""
      case FStr(r, t)   =>
        s"""<c r="$r" t="str"><f>CONCAT(A1,"!")</f><v>${escape(t)}</v></c>"""
      case Num(r, v)    => s"""<c r="$r"><v>$v</v></c>"""
      case Bool(r, v)   => s"""<c r="$r" t="b"><v>${if (v) 1 else 0}</v></c>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<sheetData><row r="1">$body</row></sheetData>
       |</worksheet>""".stripMargin
  }

  private def rootRels: String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships
       |    xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |  <Relationship Id="rId1"
       |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"
       |      Target="xl/workbook.xml"/>
       |</Relationships>""".stripMargin

  /** The workbook's OWN rels: worksheet targets (relative to xl/) and
    * the shared-string part.
    */
  private def workbookRels(sheetTargets: Seq[(String, String)],
                           withSst: Boolean): String = {
    val sheets = sheetTargets.map { case (rid, target) =>
      s"""  <Relationship Id="$rid"
         |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
         |      Target="$target"/>""".stripMargin
    }.mkString("\n")
    val sst = if (!withSst) "" else
      s"""
         |  <Relationship Id="rIdSst"
         |      Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings"
         |      Target="sharedStrings.xml"/>""".stripMargin
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships
       |    xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |$sheets$sst
       |</Relationships>""".stripMargin
  }

  private def workbookXml(sheets: Seq[(String, String)]): String = {
    val list = sheets.zipWithIndex.map { case ((rid, name), i) =>
      s"""<sheet name="${escape(name)}" sheetId="${i + 1}" r:id="$rid"/>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
       |    xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets>$list</sheets>
       |</workbook>""".stripMargin
  }

  /** A minimal valid .xlsx. `sheets` maps rId → (display name, cells);
    * the WORKBOOK list order is the reading order regardless of the
    * member names (`sheetFileFor` can scramble them to prove rels
    * routing). `sharedStrings = None` omits the SST part entirely.
    */
  def xlsx(sheets: Seq[(String, String, Seq[Cell])],
           sharedStrings: Option[Seq[String]],
           scrambleNames: Boolean = false): Array[Byte] = {
    val sheetFile: Int => String =
      if (scrambleNames) i => s"xl/worksheets/sheet${90 + i}.xml"
      else i => s"xl/worksheets/sheet${i + 1}.xml"
    val targets = sheets.zipWithIndex.map { case ((rid, _, _), i) =>
      rid -> sheetFile(i).stripPrefix("xl/")
    }
    val entries = Seq(
      "_rels/.rels" -> rootRels.getBytes(UTF_8),
      "xl/workbook.xml" -> workbookXml(
        sheets.map(s => (s._1, s._2))).getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" -> workbookRels(
        targets, sharedStrings.isDefined).getBytes(UTF_8)) ++
      sharedStrings.toSeq.map(ss =>
        "xl/sharedStrings.xml" -> sharedStringsXml(ss).getBytes(UTF_8)) ++
      sheets.zipWithIndex.map { case ((_, _, cells), i) =>
        sheetFile(i) -> sheetXml(cells).getBytes(UTF_8)
      }
    EpubFixture.zip(entries)
  }

  /** One-sheet convenience. */
  def xlsx1(cells: Seq[Cell], sharedStrings: Option[Seq[String]]): Array[Byte] =
    xlsx(Seq(("rId1", "Sheet1", cells)), sharedStrings)
}
