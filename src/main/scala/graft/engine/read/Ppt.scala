package graft.engine.read

/** Legacy .ppt (PowerPoint 97–2003 binary, the public MS-PPT spec)
  * text extraction — rides the [[Ole2]] container walk like [[Doc]].
  * The verifiable subset: the `PowerPoint Document` stream is a tree
  * of length-prefixed records (8-byte header: version/instance,
  * type, length; version 0xF marks containers); slide text lives in
  * `TextCharsAtom` (0x0FA0, UTF-16LE) and `TextBytesAtom` (0x0FA8,
  * one byte per char — the low bytes of UTF-16, i.e. Latin-1)
  * records. The walk recurses containers depth-first so atoms emit
  * in document order; each atom is a text block whose internal CRs
  * separate paragraphs (the PowerPoint paragraph mark).
  *
  * Speaker notes and master-slide text live in the same atom types
  * and are INCLUDED — on a slide deck the notes often carry the bulk
  * of the prose, and a corpus reader wants them. `CString` records
  * (names, template paths) are excluded: metadata, not body.
  *
  * None when the payload is not CFB or has no `PowerPoint Document`
  * stream, or when the document carries a `DocumentEncryptionAtom`
  * (0x2F14 — encrypted decks refuse, the house stance). A deck whose
  * record walk yields no text atoms extracts as zero paragraphs
  * (an image-only deck is a valid empty document, not an error).
  */
object Ppt {

  final case class PptText(nParagraphs: Int, text: String)

  private val TextCharsAtom = 0x0FA0
  private val TextBytesAtom = 0x0FA8
  private val EncryptionAtom = 0x2F14

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  def extractText(bytes: Array[Byte]): Option[PptText] =
    Ole2.streams(bytes).flatMap(extractFrom)

  /** The extraction over an ALREADY-parsed container (one CFB walk
    * per row, shared with [[DocumentProbe]]).
    */
  private[read] def extractFrom(files: Map[String, Array[Byte]]): Option[PptText] = {
    val doc = files.get("PowerPoint Document") match {
      case Some(d) => d
      case None    => return None
    }
    val (blocks, encrypted) = walkDoc(doc)
    if (encrypted) return None
    // CR is the PowerPoint paragraph mark; VT is a line break
    val paras = blocks.iterator
      .flatMap(_.split("\r", -1))
      .map(_.replace('\u000B', '\n').trim)
      .filter(_.nonEmpty)
      .toVector
    Some(PptText(paras.length, paras.mkString("\n")))
  }

  /** ONE bounded record-tree walk feeding both the extraction and the
    * encryption probe: text blocks in document order, plus whether a
    * DocumentEncryptionAtom was seen.
    */
  private def walkDoc(doc: Array[Byte]): (Vector[String], Boolean) = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    var encrypted = false

    def walk(from: Int, to: Int, depth: Int): Unit = {
      if (depth > 32) return
      var pos = from
      while (pos + 8 <= to && !encrypted) {
        val verInst = u16(doc, pos)
        val recType = u16(doc, pos + 2)
        val len = u32(doc, pos + 4)
        val bodyStart = pos + 8
        if (len < 0 || bodyStart + len > to) return // torn tail stops
        val bodyEnd = (bodyStart + len).toInt
        if (recType == EncryptionAtom) { encrypted = true; return }
        if ((verInst & 0x0F) == 0x0F) {
          walk(bodyStart, bodyEnd, depth + 1) // container
        } else if (recType == TextCharsAtom) {
          blocks += new String(doc, bodyStart, bodyEnd - bodyStart,
            java.nio.charset.StandardCharsets.UTF_16LE)
        } else if (recType == TextBytesAtom) {
          blocks += new String(doc, bodyStart, bodyEnd - bodyStart,
            java.nio.charset.StandardCharsets.ISO_8859_1)
        }
        pos = bodyEnd
      }
    }
    walk(0, doc.length, 0)
    (blocks.toVector, encrypted)
  }

  /** True when the deck carries a DocumentEncryptionAtom — the same
    * single walk, no text kept.
    */
  private[read] def isEncrypted(files: Map[String, Array[Byte]]): Boolean =
    files.get("PowerPoint Document").exists(d => walkDoc(d)._2)

  def isEncrypted(bytes: Array[Byte]): Boolean =
    Ole2.streams(bytes).exists(isEncrypted)

  private val textUdf = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => extractText(bytes).map(_.text)
  }

  /** Deck text as a string column; NULL when unreadable. */
  def textCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    textUdf(bytesCol)
}
