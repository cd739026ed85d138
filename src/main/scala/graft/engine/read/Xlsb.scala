package graft.engine.read

import java.nio.charset.StandardCharsets

/** Binary Excel workbook (`.xlsb`) text extraction — the Office
  * matrix's remaining member: large spreadsheets in the wild save as
  * XLSB for size/speed, and the OPC package looks exactly like an
  * xlsx except every part is a BINARY record stream (`workbook.bin`,
  * `sharedStrings.bin`, `worksheets/sheetN.bin`). Written forward
  * from the public MS-XLSB spec:
  *
  *  - record framing (§2.1.4): record TYPE as a 1–2-byte varint
  *    (bit 7 continues) and record SIZE as a 1–4-byte varint — the
  *    size makes every unknown or partially-understood record
  *    skippable, which is this reader's safety posture;
  *  - `BrtBeginSst`/`BrtSSTItem` (§2.4.777, §2.4.726): the shared
  *    string table — `RichStr` = flags byte + `XLWideString`
  *    (cch + UTF-16LE), rich runs/phonetics skipped by record size;
  *  - cells (§2.5.9 Cell = col + style, 8 bytes): `BrtCellIsst`
  *    (shared-string ref), `BrtCellSt` (inline RichStr) and
  *    `BrtFmlaString` (cached formula string, plain XLWideString) in
  *    stream order; numeric/bool/error cells are formatting, not
  *    corpus text — the [[Xls]]/[[Xlsx]] posture;
  *  - sheets in WORKBOOK order via `BrtBundleSh` (§2.4.317:
  *    hsState + iTabID + relId + name) resolved through the workbook
  *    part's own rels — the [[Xlsx]] discipline — with conventional
  *    numeric `sheetN.bin` names as the torn-rels fallback.
  *
  * Same row-kernel shape as every sibling: one ZIP walk per payload
  * (shared with [[DocumentProbe]]), bounds-checked reads, a torn
  * part yields the cells read so far.
  */
object Xlsb {

  final case class XlsbText(nParagraphs: Int, text: String)

  // record ids (MS-XLSB §2.3)
  private val BrtCellSt = 6
  private val BrtCellIsst = 7
  private val BrtFmlaString = 8
  private val BrtSSTItem = 19
  private val BrtBundleSh = 156

  /** One framed record. */
  private final case class Rec(id: Int, start: Int, len: Int)

  /** Walk a binary part's record stream; torn framing ends the walk. */
  private def records(b: Array[Byte]): Iterator[Rec] = new Iterator[Rec] {
    private var pos = 0
    private var nextRec: Rec = advance()
    private def advance(): Rec = {
      if (pos >= b.length) return null
      // type: 7 bits per byte, at most 2 bytes
      var id = b(pos) & 0x7F
      var p = pos + 1
      if ((b(pos) & 0x80) != 0) {
        if (p >= b.length) return null
        id |= (b(p) & 0x7F) << 7
        p += 1
      }
      // size: 7 bits per byte, at most 4 bytes
      var size = 0
      var shift = 0
      var more = true
      while (more && shift < 28) {
        if (p >= b.length) return null
        val v = b(p) & 0xFF
        size |= (v & 0x7F) << shift
        more = (v & 0x80) != 0
        shift += 7
        p += 1
      }
      if (size < 0 || p + size > b.length) return null // torn tail
      val r = Rec(id, p, size)
      pos = p + size
      r
    }
    def hasNext: Boolean = nextRec != null
    def next(): Rec = { val r = nextRec; nextRec = advance(); r }
  }

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** XLWideString at `off` within a record: cch + UTF-16LE chars.
    * Returns (string, bytesConsumed); None when it overruns `end`.
    */
  private def wideString(b: Array[Byte], off: Int,
                         end: Int): Option[(String, Int)] = {
    if (off + 4 > end) return None
    val cch = u32(b, off)
    if (cch == 0xFFFFFFFFL) return Some(("", 4)) // XLNullableWideString null
    if (cch < 0 || cch > (1 << 24) || off + 4 + cch * 2 > end) return None
    Some((new String(b, off + 4, cch.toInt * 2, StandardCharsets.UTF_16LE),
      4 + cch.toInt * 2))
  }

  /** RichStr at `off`: flags byte + XLWideString (runs/phonetics
    * after it are skipped by the caller via the record size).
    */
  private def richStr(b: Array[Byte], off: Int, end: Int): Option[String] = {
    if (off >= end) return None
    wideString(b, off + 1, end).map(_._1)
  }

  /** Shared strings from `sharedStrings.bin` in table order. */
  private def sharedStrings(part: Array[Byte]): Vector[String] =
    records(part).collect {
      case r if r.id == BrtSSTItem =>
        richStr(part, r.start, r.start + r.len).getOrElse("")
    }.toVector

  /** Referenced/inline/formula string cells of one sheet part, in
    * stream order.
    */
  private def sheetStrings(part: Array[Byte],
                           shared: Vector[String]): Seq[String] =
    records(part).flatMap { r =>
      val end = r.start + r.len
      r.id match {
        case BrtCellIsst if r.len >= 12 =>
          val isst = u32(part, r.start + 8)
          if (isst >= 0 && isst < shared.length) Some(shared(isst.toInt))
          else None
        case BrtCellSt =>
          richStr(part, r.start + 8, end)
        case BrtFmlaString =>
          wideString(part, r.start + 8, end).map(_._1)
        case _ => None
      }
    }.toSeq

  /** Sheet part paths in workbook order: `BrtBundleSh` relIds through
    * the workbook part's rels; conventional numeric names as the
    * torn-rels fallback.
    */
  private def sheetPaths(files: Map[String, Array[Byte]],
                         wbPath: String): Seq[String] = {
    val rels = Xlsx.partRels(files, wbPath)
    val relIds = records(files(wbPath)).collect {
      case r if r.id == BrtBundleSh && r.len > 8 =>
        // hsState(4) + iTabID(4) + strRelID (nullable wide string)
        wideString(files(wbPath), r.start + 8, r.start + r.len)
          .map(_._1).getOrElse("")
    }.filter(_.nonEmpty).toSeq
    val viaRels = relIds.flatMap(rels.get).filter(files.contains)
    if (viaRels.nonEmpty) viaRels
    else files.keys.filter(_.matches(""".*worksheets/sheet\d+\.bin"""))
      .toSeq.sortBy(k => """\d+""".r.findFirstIn(
        k.substring(k.lastIndexOf('/'))).map(_.toInt).getOrElse(0))
  }

  /** The extraction over an ALREADY-unzipped package (one ZIP walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[XlsbText] = try {
    val wbPath = Docx.mainPartTarget(files).filter(files.contains)
      .orElse(Some("xl/workbook.bin").filter(files.contains)) match {
      case Some(p) => p
      case None    => return None
    }
    val rels = Xlsx.partRels(files, wbPath)
    val sstPath = rels.collectFirst {
      case (_, t) if t.endsWith("sharedStrings.bin") => t
    }.orElse(Some(Xlsx.resolveTarget(wbPath, "sharedStrings.bin")))
      .filter(files.contains)
    val shared = sstPath.map(p => sharedStrings(files(p)))
      .getOrElse(Vector.empty)
    val paras = sheetPaths(files, wbPath)
      .flatMap(p => sheetStrings(files(p), shared))
      .map(_.trim).filter(_.nonEmpty)
    Some(XlsbText(paras.length, paras.mkString("\n")))
  } catch { case _: Exception => None }

  def extractText(bytes: Array[Byte]): Option[XlsbText] =
    ZipRead.entries(bytes, Epub.DefaultMaxTotalBytes,
      Epub.DefaultMaxEntries).flatMap(extractFrom)

  private val textUdf = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => extractText(bytes).map(_.text)
  }

  /** Referenced cell text as a string column; NULL when unreadable. */
  def textCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    textUdf(bytesCol)
}
