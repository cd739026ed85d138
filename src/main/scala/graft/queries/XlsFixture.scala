package graft.queries

/** INDEPENDENT spec-side BIFF8 writer (the LegacyDocFixture
  * discipline): Workbook-stream records written forward from MS-XLS —
  * SST `XLUnicodeRichExtendedString` entries (compressed and UTF-16,
  * rich runs, Continue splits with restated option bytes) and
  * LabelSST cell references — shipped inside [[LegacyDocFixture.cfb]].
  * No code shared with [[graft.engine.read.Xls]].
  */
object XlsFixture {

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  def rec(typ: Int, body: Array[Byte]): Array[Byte] =
    u16(typ) ++ u16(body.length) ++ body

  def bof(): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ new Array[Byte](12))

  def eof(): Array[Byte] = rec(0x000A, Array.emptyByteArray)

  def filePass(): Array[Byte] = rec(0x002F, new Array[Byte](6))

  /** One SST entry: cch + grbit + chars (low Latin-1 or UTF-16LE),
    * optionally declaring `rich` formatting runs (skipped by length).
    */
  def sstEntry(s: String, high: Boolean = false,
               richRuns: Int = 0): Array[Byte] = {
    val grbit = (if (high) 0x01 else 0x00) | (if (richRuns > 0) 0x08 else 0x00)
    val chars =
      if (high) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    u16(s.length) ++ Array(grbit.toByte) ++
      (if (richRuns > 0) u16(richRuns) else Array.emptyByteArray) ++
      chars ++ new Array[Byte](richRuns * 4)
  }

  /** The SST record from whole entries (no splits). */
  def sst(entries: Seq[Array[Byte]], total: Int): Array[Byte] =
    rec(0x00FC, u32(total.toLong) ++ u32(entries.length.toLong) ++
      entries.flatten.toArray)

  /** An SST whose single string's characters straddle a Continue
    * record: `head` chars (low encoding) in the SST record, the rest
    * in the Continue with a restated option byte (`tailHigh` can
    * switch encodings mid-string, the corner the spec calls out).
    */
  def sstWithContinue(headLow: String, tail: String,
                      tailHigh: Boolean): Seq[Array[Byte]] = {
    val cch = headLow.length + tail.length
    val first = rec(0x00FC, u32(1L) ++ u32(1L) ++
      u16(cch) ++ Array(0x00.toByte) ++
      headLow.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val tailBytes =
      if (tailHigh) tail.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else tail.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val cont = rec(0x003C,
      Array((if (tailHigh) 0x01 else 0x00).toByte) ++ tailBytes)
    Seq(first, cont)
  }

  def labelSst(row: Int, col: Int, isst: Long): Array[Byte] =
    rec(0x00FD, u16(row) ++ u16(col) ++ u16(0) ++ u32(isst))

  /** A numbers-only cell, to prove non-string records are ignored. */
  def numberCell(row: Int, col: Int, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    rec(0x0203, u16(row) ++ u16(col) ++ u16(0) ++
      (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray)
  }

  def workbook(records: Seq[Array[Byte]],
               streamName: String = "Workbook"): Array[Byte] =
    LegacyDocFixture.cfb(Seq(
      streamName -> (bof() ++ records.flatten ++ eof())))
}
