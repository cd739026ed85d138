package graft.engine.read

/** Legacy .xls (Excel 97–2003 BIFF8, the public MS-XLS spec) text
  * extraction — the third legacy Office kind on the [[Ole2]] walk.
  * The verifiable subset: the `Workbook` stream is a sequence of
  * (type, length, payload) records; cell text lives in the shared
  * string table (`SST`, one `XLUnicodeRichExtendedString` per unique
  * string — compressed Latin-1 or UTF-16LE per its option flags, rich
  * runs and phonetic blocks skipped by their declared lengths) and is
  * referenced by `LabelSST` cell records in stream order.
  *
  * SST payloads split across `Continue` records, and the split
  * re-states the option byte (a string can change encoding mid-way) —
  * the reader walks a chunk list with a boundary-aware char reader,
  * exactly the corner the spec calls out. Each referenced cell is a
  * paragraph (the table-reads-as-row-ish-text posture shared with
  * [[Docx]]/[[Odt]]/[[Doc]]); duplicate references repeat their
  * string, exactly as the sheet displays it.
  *
  * A `FilePass` workbook tries the DEFAULT passwords (blank and
  * Excel's well-known `VelvetSweatshop`) through [[OffCrypto]] —
  * the dominant "protected" crawl class opens exactly as Excel
  * opens it; XOR obfuscation and real passwords refuse. None when
  * not CFB, no `Workbook`/`Book` stream, or the encryption refuses.
  * A workbook with no string cells extracts as zero paragraphs (a
  * numbers-only sheet is a valid empty text document).
  */
object Xls {

  final case class XlsText(nParagraphs: Int, text: String)

  private val RecSST = 0x00FC
  private val RecContinue = 0x003C
  private val RecLabelSst = 0x00FD
  private val RecFilePass = 0x002F

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  def extractText(bytes: Array[Byte]): Option[XlsText] =
    Ole2.streams(bytes).flatMap(extractFrom)

  private final case class Scan(sstChunks: Vector[(Int, Int)],
                                refs: Vector[Long], encrypted: Boolean)

  /** ONE record scan feeding both the extraction and the encryption
    * probe: SST chunk spans (with Continues), LabelSST references in
    * stream order, FilePass presence.
    */
  private def scanRecords(wb: Array[Byte],
                          stopAtFilePass: Boolean = true): Scan = {
    var sstChunks: Vector[(Int, Int)] = Vector.empty
    var collectingSst = false
    var encrypted = false
    val refs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos + 4 <= wb.length && !(encrypted && stopAtFilePass)) {
      val typ = u16(wb, pos)
      val len = u16(wb, pos + 2)
      val body = pos + 4
      if (body + len > wb.length) pos = wb.length // torn tail stops
      else {
        typ match {
          case RecFilePass => encrypted = true
          case RecSST =>
            sstChunks = Vector((body, len)); collectingSst = true
          case RecContinue if collectingSst =>
            sstChunks = sstChunks :+ ((body, len))
          case RecLabelSst =>
            collectingSst = false
            if (len >= 10) refs += u32(wb, body + 6)
          case _ =>
            collectingSst = false
        }
        pos = body + len
      }
    }
    Scan(sstChunks, refs.toVector, encrypted)
  }

  /** The extraction over an ALREADY-parsed container (one CFB walk
    * per row, shared with [[DocumentProbe]]).
    *
    * A `FilePass` workbook first tries the DEFAULT passwords (blank,
    * then Excel's well-known `VelvetSweatshop` — MS-XLS §2.4.117:
    * Excel itself opens these silently, so to every user the sheet
    * reads as unprotected) via [[OffCrypto.decryptBiff8]]; only a
    * REAL password keeps refusing.
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[XlsText] = {
    val wb0 = files.get("Workbook").orElse(files.get("Book")) match {
      case Some(w) => w
      case None    => return None
    }
    var scan = scanRecords(wb0)
    val wb =
      if (!scan.encrypted) wb0
      else OffCrypto.decryptBiff8(wb0) match {
        case Some(clear) =>
          scan = scanRecords(clear, stopAtFilePass = false)
          clear
        case None => return None
      }
    if (scan.sstChunks.isEmpty)
      return Some(XlsText(0, "")) // no string table: numbers-only

    val strings = parseSst(wb, scan.sstChunks) match {
      case Some(ss) => ss
      case None     => return None
    }
    val paras = scan.refs
      .flatMap(i => if (i >= 0 && i < strings.length) Some(strings(i.toInt)) else None)
      .map(_.trim).filter(_.nonEmpty)
    Some(XlsText(paras.length, paras.mkString("\n")))
  }

  /** True when the workbook carries a FilePass record that the
    * default passwords do NOT open — encrypted-AND-UNREADABLE, the
    * [[Pdf.Meta.encrypted]] stance (a `VelvetSweatshop` sheet reads
    * as unprotected, exactly as Excel shows it).
    */
  private[read] def isEncrypted(files: Map[String, Array[Byte]]): Boolean =
    files.get("Workbook").orElse(files.get("Book"))
      .exists(wb => scanRecords(wb).encrypted &&
        OffCrypto.decryptBiff8(wb).isEmpty)

  def isEncrypted(bytes: Array[Byte]): Boolean =
    Ole2.streams(bytes).exists(isEncrypted)

  /** The SST across its Continue chunks: a boundary-aware cursor that
    * re-reads the option byte when a STRING's characters straddle a
    * chunk edge (per spec the continuation restates it).
    */
  private def parseSst(wb: Array[Byte],
                       chunks: Vector[(Int, Int)]): Option[Vector[String]] = try {
    var chunk = 0
    var off = 0 // offset within current chunk
    def remaining: Int = chunks(chunk)._2 - off
    def atEnd: Boolean = chunk >= chunks.length ||
      (chunk == chunks.length - 1 && remaining <= 0)
    def advanceChunk(): Boolean = {
      if (chunk + 1 >= chunks.length) false
      else { chunk += 1; off = 0; true }
    }
    def need(n: Int): Boolean = {
      // fixed-width fields never straddle chunks in real writers;
      // hop to the next chunk when this one is exhausted
      if (remaining <= 0 && !advanceChunk()) return false
      remaining >= n
    }
    def byteAt(d: Int): Int = wb(chunks(chunk)._1 + off + d) & 0xFF
    def readU8(): Int = { val v = byteAt(0); off += 1; v }
    def readU16(): Int = { val v = byteAt(0) | (byteAt(1) << 8); off += 2; v }
    def readU32(): Long = {
      val v = byteAt(0).toLong | (byteAt(1).toLong << 8) |
        (byteAt(2).toLong << 16) | (byteAt(3).toLong << 24)
      off += 4; v
    }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(left, remaining.toLong)
        off += take.toInt; left -= take
        if (left > 0 && !advanceChunk()) return
      }
    }
    /** cch chars honoring the per-chunk encoding restart. */
    def readChars(cch: Int, highFirst: Boolean): String = {
      val sb = new StringBuilder
      var left = cch
      var high = highFirst
      while (left > 0) {
        if (remaining <= 0) {
          if (!advanceChunk()) return sb.toString
          // the continuation restates the option byte
          high = (readU8() & 0x01) != 0
        }
        val width = if (high) 2 else 1
        val take = math.min(left, remaining / width)
        if (take <= 0) {
          if (!advanceChunk()) return sb.toString
          high = (readU8() & 0x01) != 0
        } else {
          val base = chunks(chunk)._1 + off
          if (high) sb.append(new String(wb, base, take * 2,
            java.nio.charset.StandardCharsets.UTF_16LE))
          else sb.append(new String(wb, base, take,
            java.nio.charset.StandardCharsets.ISO_8859_1))
          off += take * width
          left -= take
        }
      }
      sb.toString
    }

    if (!need(8)) return Some(Vector.empty)
    readU32() // cstTotal
    val cstUnique = readU32()
    val out = Vector.newBuilder[String]
    var i = 0L
    while (i < cstUnique && !atEnd) {
      if (!need(3)) return Some(out.result())
      val cch = readU16()
      val grbit = readU8()
      val high = (grbit & 0x01) != 0
      val ext = (grbit & 0x04) != 0
      val rich = (grbit & 0x08) != 0
      val cRun = if (rich) { if (!need(2)) return Some(out.result()); readU16() } else 0
      val cchExt = if (ext) { if (!need(4)) return Some(out.result()); readU32() } else 0L
      out += readChars(cch, high)
      skip(cRun.toLong * 4)
      skip(cchExt)
      i += 1
    }
    Some(out.result())
  } catch { case _: Exception => None }

  private val textUdf = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => extractText(bytes).map(_.text)
  }

  /** Referenced cell text as a string column; NULL when unreadable. */
  def textCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    textUdf(bytesCol)
}
