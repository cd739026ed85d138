package graft.queries

import java.nio.charset.StandardCharsets

/** INDEPENDENT spec-side XLSB writer (the [[XlsxFixture]] discipline
  * for the binary sibling): MS-XLSB record framing (varint type +
  * varint size), `BrtBeginSst`/`BrtSSTItem`, `BrtBundleSh` and the
  * string-bearing cell records, written forward from the spec with
  * no code shared with `graft.engine.read.Xlsb`.
  */
object XlsbFixture {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Record type: 7 bits per byte, bit 7 continues (1–2 bytes). */
  private def typeBytes(id: Int): Array[Byte] =
    if (id < 0x80) Array(id.toByte)
    else Array(((id & 0x7F) | 0x80).toByte, ((id >> 7) & 0x7F).toByte)

  /** Record size: 7 bits per byte, bit 7 continues (1–4 bytes). */
  private def sizeBytes(n: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var v = n
    do {
      val b = v & 0x7F
      v >>>= 7
      out += (if (v != 0) (b | 0x80).toByte else b.toByte)
    } while (v != 0)
    out.toArray
  }

  def rec(id: Int, body: Array[Byte]): Array[Byte] =
    typeBytes(id) ++ sizeBytes(body.length) ++ body

  private def wide(s: String): Array[Byte] =
    le32(s.length.toLong) ++ s.getBytes(StandardCharsets.UTF_16LE)

  /** A plain SST item (RichStr flags = 0), or one declaring rich
    * runs whose run bytes trail inside the record (readers must skip
    * them by the record size).
    */
  def sstItem(s: String, richRuns: Int = 0): Array[Byte] = {
    val flags: Byte = if (richRuns > 0) 0x01 else 0x00
    val runs =
      if (richRuns > 0) le32(richRuns.toLong) ++
        new Array[Byte](richRuns * 8)
      else Array.emptyByteArray
    rec(19, Array(flags) ++ wide(s) ++ runs)
  }

  def sst(items: Seq[Array[Byte]], total: Int): Array[Byte] =
    rec(159, le32(total.toLong) ++ le32(items.length.toLong)) ++
      items.flatten.toArray ++ rec(160, Array.emptyByteArray)

  private def cell(col: Int): Array[Byte] = le32(col.toLong) ++ le32(0L)

  /** Shared-string reference cell. */
  def cellIsst(col: Int, isst: Long): Array[Byte] =
    rec(7, cell(col) ++ le32(isst))

  /** Inline string cell (RichStr). */
  def cellSt(col: Int, s: String): Array[Byte] =
    rec(6, cell(col) ++ Array(0x00.toByte) ++ wide(s))

  /** Cached formula string (value + grbit + opaque formula bytes the
    * reader must ignore).
    */
  def fmlaString(col: Int, s: String): Array[Byte] =
    rec(8, cell(col) ++ wide(s) ++
      Array[Byte](0, 0) ++ le32(0L))

  /** A numeric cell (BrtCellReal) — formatting, not corpus text. */
  def cellReal(col: Int, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    rec(5, cell(col) ++
      (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray)
  }

  /** A row header (BrtRowHdr) — structural, readers skip it. */
  def rowHdr(rw: Int): Array[Byte] =
    rec(0, le32(rw.toLong) ++ new Array[Byte](13))

  /** `BrtBundleSh`: visible state + tab id + relId + display name. */
  def bundleSh(relId: String, name: String, tabId: Int): Array[Byte] =
    rec(156, le32(0L) ++ le32(tabId.toLong) ++ wide(relId) ++ wide(name))

  private val RootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.bin"/>
      |</Relationships>""".stripMargin

  private def workbookRels(sheets: Seq[(String, String)],
                           withSst: Boolean): String = {
    val list = sheets.map { case (rid, target) =>
      s"""<Relationship Id="$rid" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="$target"/>"""
    }.mkString
    val sstRel = if (withSst)
      """<Relationship Id="rIdS" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.bin"/>"""
    else ""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$list$sstRel</Relationships>""".stripMargin
  }

  /** A minimal valid .xlsb: sheets as (rId, name, records), workbook
    * BUNDLE order is the reading order; `scrambleNames` proves rels
    * routing beats member-name convention.
    */
  def xlsb(sheets: Seq[(String, String, Seq[Array[Byte]])],
           sharedStrings: Option[Seq[Array[Byte]]],
           scrambleNames: Boolean = false,
           coreTitle: Option[String] = None): Array[Byte] = {
    val sheetFile: Int => String =
      if (scrambleNames) i => s"xl/worksheets/sheet${90 + i}.bin"
      else i => s"xl/worksheets/sheet${i + 1}.bin"
    val targets = sheets.zipWithIndex.map { case ((rid, _, _), i) =>
      rid -> sheetFile(i).stripPrefix("xl/")
    }
    val workbook = sheets.zipWithIndex.map { case ((rid, name, _), i) =>
      bundleSh(rid, name, i + 1)
    }.flatten.toArray
    val entries = Seq(
      "_rels/.rels" -> RootRels.getBytes(StandardCharsets.UTF_8),
      "xl/workbook.bin" -> workbook,
      "xl/_rels/workbook.bin.rels" -> workbookRels(
        targets, sharedStrings.isDefined)
        .getBytes(StandardCharsets.UTF_8)) ++
      sharedStrings.toSeq.map(items =>
        "xl/sharedStrings.bin" -> sst(items, items.length)) ++
      sheets.zipWithIndex.map { case ((_, _, recs), i) =>
        sheetFile(i) -> recs.flatten.toArray
      } ++
      coreTitle.toSeq.map(t =>
        "docProps/core.xml" -> DocxFixture.coreXml(t)
          .getBytes(StandardCharsets.UTF_8))
    EpubFixture.zip(entries)
  }

  /** One-sheet convenience. */
  def xlsb1(records: Seq[Array[Byte]],
            sharedStrings: Option[Seq[Array[Byte]]]): Array[Byte] =
    xlsb(Seq(("rId1", "Sheet1", records)), sharedStrings)
}
