package graft.queries

/** INDEPENDENT ICO container writer (the published ICONDIR/ICONDIRENTRY
  * layout): members are either the JDK BMP writer's own output with
  * its 14-byte file header stripped and `biHeight` doubled + an AND
  * mask appended (exactly how Windows icons store a DIB), or a bare
  * PNG — so `graft.multimodal.Ico` verifies against a third party's
  * pixel encoding, never against itself.
  */
object IcoFixture {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** A BMP file (JDK `ImageIO.write(_, "bmp", _)` output) → the ICO
    * member DIB: header stripped, height doubled, all-opaque AND
    * mask appended.
    */
  def dibOf(bmp: Array[Byte]): Array[Byte] = {
    val dib = java.util.Arrays.copyOfRange(bmp, 14, bmp.length)
    val w = u32(dib, 4)
    val h = u32(dib, 8)
    val doubled = le32(h * 2)
    System.arraycopy(doubled, 0, dib, 8, 4)
    val maskRow = ((w + 31) / 32) * 4
    dib ++ new Array[Byte]((maskRow * h).toInt)
  }

  /** ICO from (declaredW, declaredH, member payload) triples —
    * payloads from [[dibOf]] or bare PNG bytes. Declared 256 writes
    * the format's 0 sentinel.
    */
  def ico(members: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val dirSize = 6 + 16 * members.length
    var off = dirSize.toLong
    val dir = new java.io.ByteArrayOutputStream()
    dir.write(Array[Byte](0, 0, 1, 0), 0, 4)
    dir.write(le16(members.length), 0, 2)
    val body = new java.io.ByteArrayOutputStream()
    members.foreach { case (w, h, payload) =>
      dir.write(if (w >= 256) 0 else w)
      dir.write(if (h >= 256) 0 else h)
      dir.write(0); dir.write(0)           // palette count, reserved
      dir.write(le16(1), 0, 2)             // planes
      dir.write(le16(32), 0, 2)            // nominal bpp
      dir.write(le32(payload.length.toLong), 0, 4)
      dir.write(le32(off), 0, 4)
      body.write(payload, 0, payload.length)
      off += payload.length
    }
    dir.toByteArray ++ body.toByteArray
  }
}
