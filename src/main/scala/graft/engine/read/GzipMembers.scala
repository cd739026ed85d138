package graft.engine.read

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.Inflater

/** Gzip MEMBER-boundary scanner — the piece a CDX index writer needs
  * that a plain `GZIPInputStream` hides: Common Crawl compresses each
  * WARC record as its own gzip member precisely so (offset, length)
  * byte ranges are independently decompressible, and an index entry
  * must record the COMPRESSED member range, which only the member
  * walk below can observe (RFC 1952 framing: header with optional
  * FEXTRA/FNAME/FCOMMENT/FHCRC fields, raw-deflate body, CRC32+ISIZE
  * trailer).
  *
  * Streaming: one pass, one shared 64 KB buffer, no whole-file
  * buffering; each member's DECOMPRESSED bytes are materialized one
  * at a time (a WARC member is one record, bounded by
  * `maxMemberBytes`). Framing errors fail loud with the byte offset
  * (the [[Warc]] stance: machine framing does not lie); clean EOF at
  * a member boundary ends the iterator.
  */
object GzipMembers {

  final case class Member(offset: Long, compressedLength: Long,
                          bytes: Array[Byte])

  private final class Feed(in: InputStream) {
    val buf = new Array[Byte](1 << 16)
    var len = 0
    var pos = 0
    private var base = 0L
    def absPos: Long = base + pos
    def ensure(): Boolean = pos < len || refill()
    private def refill(): Boolean = {
      base += len
      val n = in.read(buf)
      pos = 0
      len = math.max(n, 0)
      n > 0
    }
    def byte(): Int =
      if (ensure()) { val b = buf(pos) & 0xFF; pos += 1; b } else -1
    def byteOrFail(what: String): Int = {
      val b = byte()
      if (b < 0) throw new EOFException(
        s"truncated gzip member: EOF in $what at offset $absPos")
      b
    }
    /** Rewind within the CURRENT buffered chunk (inflater surplus). */
    def unread(n: Int): Unit = { require(n <= pos); pos -= n }
  }

  private def parseHeader(f: Feed): Unit = {
    val start = f.absPos
    val m1 = f.byteOrFail("header"); val m2 = f.byteOrFail("header")
    if (m1 != 0x1F || m2 != 0x8B)
      throw new IllegalArgumentException(
        f"not a gzip member at offset $start: magic $m1%02x $m2%02x")
    val cm = f.byteOrFail("header")
    require(cm == 8, s"unsupported gzip compression method $cm at $start")
    val flg = f.byteOrFail("header")
    var i = 0
    while (i < 6) { f.byteOrFail("header"); i += 1 } // MTIME, XFL, OS
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = f.byteOrFail("FEXTRA") | (f.byteOrFail("FEXTRA") << 8)
      var k = 0
      while (k < xlen) { f.byteOrFail("FEXTRA"); k += 1 }
    }
    if ((flg & 8) != 0) while (f.byteOrFail("FNAME") != 0) () // FNAME
    if ((flg & 16) != 0) while (f.byteOrFail("FCOMMENT") != 0) ()
    if ((flg & 2) != 0) { f.byteOrFail("FHCRC"); f.byteOrFail("FHCRC") }
  }

  private def inflateBody(f: Feed, maxMemberBytes: Int): Array[Byte] = {
    val inf = new Inflater(true)
    val out = new ByteArrayOutputStream()
    val tmp = new Array[Byte](1 << 16)
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) {
          if (!f.ensure()) throw new EOFException(
            s"truncated gzip member: EOF in deflate body at ${f.absPos}")
          inf.setInput(f.buf, f.pos, f.len - f.pos)
          f.pos = f.len // tentatively consumed; surplus unread below
        }
        val k =
          try inf.inflate(tmp)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"corrupt deflate data in gzip member near offset ${f.absPos}: ${e.getMessage}", e)
          }
        out.write(tmp, 0, k)
        require(out.size <= maxMemberBytes,
          s"gzip member exceeds $maxMemberBytes decompressed bytes")
        if (k == 0 && inf.needsDictionary())
          throw new IllegalArgumentException(
            "gzip member demands a preset dictionary")
      }
      f.unread(inf.getRemaining)
      out.toByteArray
    } finally inf.end()
  }

  /** Walk the members of a (possibly multi-member) gzip stream. */
  def members(in: InputStream,
              maxMemberBytes: Int = 1 << 30): Iterator[Member] = {
    val f = new Feed(in)
    new Iterator[Member] {
      def hasNext: Boolean = f.ensure()
      def next(): Member = {
        val start = f.absPos
        parseHeader(f)
        val bytes = inflateBody(f, maxMemberBytes)
        var i = 0
        while (i < 8) { f.byteOrFail("trailer"); i += 1 } // CRC32+ISIZE
        Member(start, f.absPos - start, bytes)
      }
    }
  }
}
