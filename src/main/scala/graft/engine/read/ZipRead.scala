package graft.engine.read

/** Shared capped ZIP walk + guarded XML parse for the ZIP-based
  * document containers ([[Epub]] OCF, [[Docx]] OPC): total
  * decompressed size and entry count are bounded so a ZIP bomb fails
  * the DOCUMENT, never the executor, and DOCTYPE declarations are
  * stripped before any XML parse (external-entity guard — container
  * metadata never legitimately carries a DTD).
  */
private[graft] object ZipRead {

  def parseXml(text: String): Option[scala.xml.Elem] =
    try Some(scala.xml.XML.loadString(
      text.replaceAll("(?s)<!DOCTYPE[^>]*>", "")))
    catch { case _: Exception => None }

  /** Unzip into name → bytes. None when not a ZIP, over a cap, or
    * torn mid-archive.
    */
  def entries(bytes: Array[Byte], maxTotal: Long,
              maxEntries: Int): Option[Map[String, Array[Byte]]] = {
    if (bytes == null || bytes.length < 4) return None
    if (!(bytes(0) == 'P' && bytes(1) == 'K')) return None
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var total = 0L
    var n = 0
    try {
      var e = zin.getNextEntry
      while (e != null) {
        n += 1
        if (n > maxEntries) return None
        if (!e.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var r = zin.read(tmp)
          while (r >= 0) {
            total += r
            if (total > maxTotal) return None
            buf.write(tmp, 0, r)
            r = zin.read(tmp)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
      Some(out.result())
    } catch { case _: Exception => None }
    finally zin.close()
  }
}
