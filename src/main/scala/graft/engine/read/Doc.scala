package graft.engine.read

/** Legacy .doc (Word 97–2003 binary, the public MS-DOC spec) text
  * extraction — the sixth document modality, riding the [[Ole2]]
  * container walk. The verifiable subset: the FIB header names the
  * table stream and the Clx location; the Clx's PlcPcd maps character
  * positions to text pieces in the WordDocument stream, each piece
  * either 8-bit (cp1252 through the JVM's own charset table — the
  * "fCompressed" form) or UTF-16LE. Only the MAIN document range
  * (`ccpText`) extracts — footnotes, headers and annotation text
  * live past it in the CP space and are excluded (the body-is-the-
  * corpus stance shared with [[Docx]]/[[Odt]]/[[Rtf]]).
  *
  * Control characters map per the spec's text semantics: CR (0x0D),
  * cell/row marks (0x07) and page/section breaks (0x0C) end
  * paragraphs; vertical tab (0x0B) is a line break; field
  * instructions (between the 0x13 begin and 0x14 separator marks)
  * drop while field RESULTS stay; object anchors (0x01/0x08),
  * footnote reference marks (0x02) and soft hyphens (0x1F) drop;
  * non-breaking spaces/hyphens normalize to their plain forms
  * (cross-format dedup parity with the other extractors).
  *
  * None when the payload is not CFB, has no WordDocument stream, the
  * FIB magic is absent, the document is ENCRYPTED (fEncrypted — the
  * NULL-for-undecodable stance; XOR obfuscation is an encryption
  * mode, not a format), or the named table stream is missing.
  */
object Doc {

  final case class DocText(nParagraphs: Int, text: String)

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private lazy val cp1252: java.nio.charset.Charset =
    java.nio.charset.Charset.forName("windows-1252")

  def extractText(bytes: Array[Byte]): Option[DocText] =
    Ole2.streams(bytes).flatMap(extractFrom)

  /** True when the FIB carries fEncrypted — for probes that already
    * hold the parsed container.
    */
  private[read] def isEncrypted(files: Map[String, Array[Byte]]): Boolean =
    files.get("WordDocument").exists { w =>
      u16(w, 0x0A) match {
        case -1    => false
        case flags => (flags & 0x0100) != 0
      }
    }

  /** The extraction over an ALREADY-parsed container (one CFB walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[DocText] = {
    val word = files.get("WordDocument") match {
      case Some(w) => w
      case None    => return None
    }
    // FIB base: wIdent magic, flag word at 0x0A
    if (u16(word, 0) != 0xA5EC) return None
    val flags = u16(word, 0x0A)
    if ((flags & 0x0100) != 0) return None // fEncrypted
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = files.get(tableName) match {
      case Some(t) => t
      case None    => return None
    }
    // FibRgLw97.ccpText (main-document char count) and
    // FibRgFcLcb97.fcClx/lcbClx at their fixed Word-97+ offsets
    val ccpText = i32(word, 0x4C)
    val fcClx = i32(word, 0x1A2)
    val lcbClx = i32(word, 0x1A6)
    if (ccpText < 0 || fcClx < 0 || lcbClx <= 0 ||
      fcClx + lcbClx > table.length) return None

    // Clx: zero or more Prc (0x01, int16 cb, bytes), then Pcdt
    // (0x02, int32 lcb, PlcPcd)
    var pos = fcClx.toInt
    val clxEnd = (fcClx + lcbClx).toInt
    while (pos < clxEnd && (table(pos) & 0xFF) == 0x01) {
      val cb = u16(table, pos + 1)
      if (cb < 0) return None
      pos += 3 + cb
    }
    if (pos >= clxEnd || (table(pos) & 0xFF) != 0x02) return None
    val lcb = i32(table, pos + 1)
    val plc = pos + 5
    if (lcb < 4 + 12 || plc + lcb > clxEnd) return None
    val nPieces = ((lcb - 4) / 12).toInt
    if (nPieces <= 0) return None

    val sb = new StringBuilder
    var remaining = ccpText
    var p = 0
    while (p < nPieces && remaining > 0) {
      val cpStart = i32(table, plc + p * 4)
      val cpEnd = i32(table, plc + (p + 1) * 4)
      val pcdOff = plc + (nPieces + 1) * 4 + p * 8
      val fcRaw = i32(table, pcdOff + 2)
      if (cpStart < 0 || cpEnd < cpStart || fcRaw < 0) return None
      val count = math.min(cpEnd - cpStart, remaining)
      val compressed = (fcRaw & 0x40000000L) != 0
      val fc = fcRaw & 0x3FFFFFFFL
      if (compressed) {
        val start = (fc / 2).toInt
        val end = math.min(start + count, word.length.toLong).toInt
        if (start >= 0 && start <= end)
          sb.append(new String(word, start, end - start, cp1252))
      } else {
        val start = fc.toInt
        val end = math.min(start + count * 2, word.length.toLong).toInt
        if (start >= 0 && start <= end)
          sb.append(new String(word, start, end - start,
            java.nio.charset.StandardCharsets.UTF_16LE))
      }
      remaining -= count
      p += 1
    }
    Some(renderChars(sb.toString))
  }

  /** Spec text-semantics pass: paragraph marks, field ranges, anchors.
    *
    * Fields NEST and may omit the 0x14 separator (XE/TC index
    * entries, no-result fields) — a boolean would suppress the whole
    * remaining document after `0x13 instr 0x15`, so the instruction
    * state is a STACK: 0x13 pushes in-instruction, 0x14 flips the
    * innermost to result, 0x15 pops. Text suppresses while ANY
    * enclosing field is still in its instruction part.
    */
  private def renderChars(raw: String): DocText = {
    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = { paras += cur.toString; cur.clear() }
    // stack of per-field in-instruction flags
    val field = scala.collection.mutable.Stack.empty[Boolean]
    def inFieldInstr: Boolean = field.exists(identity)
    raw.foreach { c =>
      c match {
        case '\r' | '\u0007' | '\u000C' => // CR, cell/row mark, page break
          if (!inFieldInstr) flush()
        case '\u000B' => // vertical tab = line break
          if (!inFieldInstr) cur.append('\n')
        case '\u0013' => field.push(true) // field begin: instruction
        case '\u0014' => // separator: the innermost result follows
          if (field.nonEmpty) { field.pop(); field.push(false) }
        case '\u0015' => // field end (with or without a separator)
          if (field.nonEmpty) { field.pop(); () }
        case '\u0001' | '\u0002' | '\u0008' => () // anchors/ref marks
        case '\u001F' => () // soft hyphen
        case '\u001E' => if (!inFieldInstr) cur.append('-') // non-req hyphen
        case '\u00A0' => if (!inFieldInstr) cur.append(' ') // nbsp
        case '\u2011' => if (!inFieldInstr) cur.append('-') // nb hyphen
        case '\t' | '\n' => if (!inFieldInstr) cur.append(c)
        case other =>
          if (other >= ' ' && !inFieldInstr) cur.append(other)
      }
    }
    if (cur.nonEmpty) flush()
    while (paras.nonEmpty && paras.last.isEmpty) paras.remove(paras.length - 1)
    DocText(paras.length, paras.mkString("\n"))
  }

  private val textUdf = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => extractText(bytes).map(_.text)
  }

  /** Body text as a string column; NULL when unreadable. */
  def textCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    textUdf(bytesCol)
}
