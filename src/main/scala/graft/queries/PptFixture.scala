package graft.queries

/** INDEPENDENT spec-side PowerPoint-binary writer (the
  * LegacyDocFixture discipline): length-prefixed MS-PPT records
  * written forward from the spec, shipped inside the
  * [[LegacyDocFixture.cfb]] container — no code shared with
  * [[graft.engine.read.Ppt]].
  */
object PptFixture {

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  def record(verInst: Int, recType: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + body.length)
    putU16(out, 0, verInst)
    putU16(out, 2, recType)
    out(4) = (body.length & 0xFF).toByte
    out(5) = ((body.length >> 8) & 0xFF).toByte
    out(6) = ((body.length >> 16) & 0xFF).toByte
    out(7) = ((body.length >> 24) & 0xFF).toByte
    System.arraycopy(body, 0, out, 8, body.length)
    out
  }

  def container(recType: Int, children: Seq[Array[Byte]]): Array[Byte] =
    record(0x000F, recType, children.flatten.toArray)

  def textCharsAtom(s: String): Array[Byte] =
    record(0x0000, 0x0FA0,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))

  def textBytesAtom(s: String): Array[Byte] =
    record(0x0000, 0x0FA8,
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  def encryptionAtom(): Array[Byte] =
    record(0x0000, 0x2F14, new Array[Byte](4))

  /** `RT_CString` metadata record — must NOT read as body text. */
  def cstring(s: String): Array[Byte] =
    record(0x0010, 0x0FBA,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))

  /** A deck: records under a Document container (0x03E8) in the
    * `PowerPoint Document` stream, plus the `Current User` stream
    * every real writer emits.
    */
  def ppt(records: Seq[Array[Byte]]): Array[Byte] =
    LegacyDocFixture.cfb(Seq(
      "Current User" -> Array[Byte](0, 0, 0, 0),
      "PowerPoint Document" -> container(0x03E8, records)))
}
