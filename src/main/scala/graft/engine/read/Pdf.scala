package graft.engine.read

import java.nio.charset.{Charset, StandardCharsets}

/** Pure-JVM PDF text extraction — a major training-data modality the
  * engine could not read at all (the reference's ingestors stop at
  * CSV/JSON/XML/images; this is beyond-reference surface, same class
  * as the WARC/CDX crawl stack).
  *
  * Implemented forward from the public ISO 32000-1 grammar, scoped to
  * the VERIFIABLE subset that covers the bulk of crawl PDFs:
  *
  *  - classic cross-reference tables AND cross-reference streams,
  *    `/Prev` chains, object streams (`/Type /ObjStm`), and a
  *    RECOVERY scan (the path every production reader survives crawl
  *    data on): when `startxref` lies or the table is torn, object
  *    headers are re-found by buffer scan, later definitions win,
  *    and the catalog is hunted directly;
  *  - `/FlateDecode` via `java.util.zip` (with the PNG row predictors
  *    2/10-15 per `/DecodeParms`), `/LZWDecode` (self-describing
  *    dictionary, early-change widths), `/ASCII85Decode`,
  *    `/ASCIIHexDecode`, `/RunLengthDecode`, and raw streams; any
  *    other filter fails that stream LOUD;
  *  - the page tree (`/Pages`/`/Kids`, inheritable `/Resources`),
  *    per-page `/Contents` (single stream or array);
  *  - text operators `Tj`, `'`, `"`, `TJ` inside `BT`/`ET`, with
  *    `Td`/`TD`/`Tm`/`T*` driving line breaks (vertical motion =
  *    newline) and large negative `TJ` kerns reading as spaces;
  *  - simple-font byte decoding: `/WinAnsiEncoding` and
  *    `/MacRomanEncoding` through the JVM's OWN `windows-1252` /
  *    `x-MacRoman` charsets (platform-verified tables, nothing
  *    transcribed from memory), `/StandardEncoding` and unmarked
  *    fonts as printable ASCII (Adobe's custom high range is a
  *    literal table this engine does not guess at — those bytes
  *    DROP, visible absence over silent wrong text);
  *  - `/ToUnicode` CMaps (`bfchar`/`bfrange`, 1- and 2-byte codes,
  *    UTF-16BE targets) — the correct path for composite fonts; a
  *    composite (`/Type0`) font WITHOUT one is undecodable and its
  *    strings drop.
  *
  * Encrypted documents (`/Encrypt` in the trailer) return None, and
  * so do files where even the recovery scan finds no catalog — the
  * house NULL-for-undecodable stance. A TORN but recoverable file
  * yields the pages whose objects survive (the torn-download
  * posture), while corrupt DATA inside a stream still fails that
  * stream loud; unmapped strings in an otherwise readable document
  * drop.
  *
  * Scale shape: one pure kernel per payload, no Spark types here;
  * [[graft.ops.TextAnalysis]]/CurationPipeline consume the extracted
  * text like any other document column. Allocation is bounded by
  * `maxStreamBytes` per decoded stream — a Flate bomb inside a 1 KB
  * PDF must not kill an executor.
  */
object Pdf {
  graft.multimodal.ImageIoDefaults.ensure() // memory-backed ImageIO streams

  /** Extracted document: page count and text (pages joined by form
    * feed, lines by newline).
    */
  final case class PdfText(nPages: Int, text: String)

  /** Structural probe: version from the header comment, page count,
    * whether `/Encrypt` is present (the AudioProbe.meta discipline —
    * no pixel/text decode).
    */
  final case class Meta(version: String, nPages: Int, encrypted: Boolean,
                        title: Option[String] = None,
                        author: Option[String] = None,
                        created: Option[String] = None)

  val DefaultMaxStreamBytes: Int = 64 << 20

  private final class Bail(msg: String) extends RuntimeException(msg) {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(msg: String): Nothing = throw new Bail(msg)

  // ---- object model -------------------------------------------------

  private sealed trait Obj
  private case object PNull extends Obj
  private final case class PBool(v: Boolean) extends Obj
  private final case class PNum(v: Double) extends Obj
  private final case class PStr(bytes: Array[Byte]) extends Obj
  private final case class PName(v: String) extends Obj
  private final case class PArr(items: Vector[Obj]) extends Obj
  private final case class PDict(m: Map[String, Obj]) extends Obj
  private final case class PRef(num: Int, gen: Int) extends Obj
  private final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  // ---- lexer --------------------------------------------------------

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Byte-level PDF lexer/parser over a buffer slice; `pos` advances
    * as objects are consumed.
    */
  private final class Lexer(val buf: Array[Byte], var pos: Int) {
    def end: Int = buf.length
    def peek: Int = if (pos < end) buf(pos) & 0xff else -1
    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (pos < end && isWs(buf(pos) & 0xff)) pos += 1
        if (pos < end && (buf(pos) & 0xff) == '%') {
          while (pos < end && buf(pos) != '\n' && buf(pos) != '\r') pos += 1
        } else go = false
      }
    }
    def expect(s: String): Unit = {
      if (!matches(s)) bail(s"expected '$s' at $pos")
      pos += s.length
    }
    def matches(s: String): Boolean =
      pos + s.length <= end &&
        (0 until s.length).forall(i => (buf(pos + i) & 0xff) == s.charAt(i))

    private def token(): String = {
      val start = pos
      while (pos < end && !isWs(buf(pos) & 0xff) && !isDelim(buf(pos) & 0xff))
        pos += 1
      if (pos == start) bail(s"empty token at $pos")
      new String(buf, start, pos - start, StandardCharsets.US_ASCII)
    }

    /** Parse one object (direct form; indirect refs as PRef). */
    def parseObj(depth: Int = 0): Obj = {
      if (depth > 64) bail("nesting too deep")
      skipWs()
      peek match {
        case -1 => bail("eof")
        case '/' => pos += 1; PName(parseNameBody())
        case '(' => pos += 1; PStr(parseLiteralString())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while (peek != ']') {
            items += parseObj(depth + 1)
            skipWs()
            if (peek == -1) bail("unterminated array")
          }
          pos += 1
          PArr(items.result())
        case '<' =>
          if (pos + 1 < end && (buf(pos + 1) & 0xff) == '<') {
            pos += 2
            parseDictBody(depth)
          } else { pos += 1; PStr(parseHexString()) }
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ =>
          token() match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case t       => bail(s"unexpected token '$t'")
          }
      }
    }

    def parseNameBody(): String = {
      val sb = new StringBuilder
      while (pos < end && !isWs(buf(pos) & 0xff) &&
        !isDelim(buf(pos) & 0xff)) {
        val c = buf(pos) & 0xff
        if (c == '#' && pos + 2 < end) {
          sb.append(Integer.parseInt(
            new String(buf, pos + 1, 2, StandardCharsets.US_ASCII), 16).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    def parseLiteralString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (pos >= end) bail("unterminated string")
        val c = buf(pos) & 0xff
        pos += 1
        c match {
          case '(' => depth += 1; out.write(c)
          case ')' => depth -= 1; if (depth > 0) out.write(c)
          case '\\' =>
            if (pos >= end) bail("bad escape")
            val e = buf(pos) & 0xff
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' | ')' | '\\' => out.write(e)
              case '\r' => if (peek == '\n') pos += 1 // line continuation
              case '\n' => ()
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < end && (buf(pos) & 0xff) >= '0' &&
                  (buf(pos) & 0xff) <= '7') {
                  v = v * 8 + ((buf(pos) & 0xff) - '0')
                  pos += 1
                  k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash dropped
            }
          case _ => out.write(c)
        }
      }
      out.toByteArray
    }

    def parseHexString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (pos >= end) bail("unterminated hex string")
        val c = buf(pos) & 0xff
        pos += 1
        if (c == '>') done = true
        else if (!isWs(c)) {
          val v = Character.digit(c, 16)
          if (v < 0) bail("bad hex digit")
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: trailing 0
      out.toByteArray
    }

    private def parseNumberOrRef(): Obj = {
      val save = pos
      val n1 = parseNumber()
      if (n1.v >= 0 && n1.v == math.floor(n1.v)) {
        // lookahead for "gen R"
        val save2 = pos
        skipWs()
        if (peek >= '0' && peek <= '9') {
          val start2 = pos
          while (pos < end && (buf(pos) & 0xff) >= '0' &&
            (buf(pos) & 0xff) <= '9') pos += 1
          val gen = new String(buf, start2, pos - start2,
            StandardCharsets.US_ASCII)
          skipWs()
          if (peek == 'R' && (pos + 1 >= end ||
            isWs(buf(pos + 1) & 0xff) || isDelim(buf(pos + 1) & 0xff))) {
            pos += 1
            return PRef(n1.v.toInt, gen.toInt)
          }
        }
        pos = save2
      }
      pos = save
      parseNumber()
    }

    def parseNumber(): PNum = {
      val start = pos
      if (peek == '+' || peek == '-') pos += 1
      while (pos < end && {
        val c = buf(pos) & 0xff
        (c >= '0' && c <= '9') || c == '.'
      }) pos += 1
      if (pos == start) bail("bad number")
      PNum(new String(buf, start, pos - start,
        StandardCharsets.US_ASCII).toDouble)
    }

    private def parseDictBody(depth: Int): Obj = {
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (!matches(">>")) {
        if (peek != '/') bail(s"dict key must be a name at $pos")
        pos += 1
        val key = parseNameBody()
        m += key -> parseObj(depth + 1)
        skipWs()
        if (pos >= end) bail("unterminated dict")
      }
      pos += 2
      val dict = PDict(m.result())
      // a stream keyword after a dict makes it a stream object
      val save = pos
      skipWs()
      if (matches("stream")) {
        pos += 6
        if (peek == '\r') pos += 1
        if (peek == '\n') pos += 1
        PStream(dict, Array.emptyByteArray) // raw filled by the caller
      } else { pos = save; dict }
    }
  }

  // ---- filters ------------------------------------------------------

  private def inflate(data: Array[Byte], maxBytes: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4,
      1 << 20))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) bail("truncated flate stream")
        if (out.size() + n > maxBytes) bail("flate output over cap")
        out.write(buf, 0, n)
      }
      // input exhausted before the final block: a torn stream must
      // fail LOUD here (unlike the crawl bridge's torn-download
      // tolerance) — silently partial page text or a silently partial
      // xref table is worse than no document
      if (!inf.finished()) bail("truncated flate stream")
    } catch {
      case _: java.util.zip.DataFormatException => bail("bad flate data")
    } finally inf.end()
    out.toByteArray
  }

  /** PNG row predictors (/DecodeParms /Predictor ≥ 10) and TIFF
    * horizontal differencing (2) — required for cross-reference
    * streams in practice.
    */
  private def unpredict(data: Array[Byte], predictor: Int, columns: Int,
                        colors: Int, bpc: Int): Array[Byte] = {
    if (predictor <= 1) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLenL = (columns.toLong * colors * bpc + 7) / 8
    if (rowLenL < 1 || rowLenL > data.length) bail("bad predictor columns")
    val rowLen = rowLenL.toInt
    if (predictor == 2) {
      var r = 0
      while (r + rowLen <= data.length) {
        var i = bpp
        while (i < rowLen) {
          data(r + i) = ((data(r + i) + data(r + i - bpp)) & 0xff).toByte
          i += 1
        }
        r += rowLen
      }
      return data
    }
    // PNG: each row is 1 filter byte + rowLen data bytes
    val stride = rowLen + 1
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * stride) & 0xff
      val src = r * stride + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst + i - rowLen) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(dst + i - rowLen - bpp) & 0xff
          else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
          case _ => bail(s"bad png filter $ft")
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else if (!isWs(c)) {
        val v = Character.digit(c, 16)
        if (v < 0) bail("bad hex in ASCIIHexDecode")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode (ISO 32000 §7.4.3): 5 chars `!`..`u` → 4 bytes
    * base-85 big-endian; `z` = four zero bytes (full groups only);
    * a partial group of n chars yields n−1 bytes (pad with `u`);
    * `~>` terminates.
    */
  private def ascii85Decode(data: Array[Byte], maxBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var tuple = 0L
    var n = 0
    var i = 0
    var done = false
    def flush(chars: Int): Unit = {
      var t = tuple
      var k = chars
      while (k < 5) { t = t * 85 + 84; k += 1 } // pad with 'u'
      if (t > 0xffffffffL) bail("ASCII85 group overflow")
      if (out.size() + chars - 1 > maxBytes) bail("ASCII85 over cap")
      var s = 24
      var j = 0
      while (j < chars - 1) { out.write(((t >> s) & 0xff).toInt); s -= 8; j += 1 }
      tuple = 0L
      n = 0
    }
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z') {
        if (n != 0) bail("'z' inside an ASCII85 group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!isWs(c)) {
        if (c < '!' || c > 'u') bail(s"bad ASCII85 char $c")
        tuple = tuple * 85 + (c - '!')
        n += 1
        if (n == 5) flush(5)
      }
      i += 1
    }
    if (n == 1) bail("lone trailing ASCII85 char")
    if (n > 1) flush(n)
    out.toByteArray
  }

  /** RunLengthDecode (ISO 32000 §7.4.5): length byte 0..127 copies
    * L+1 literals, 129..255 repeats the next byte 257−L times,
    * 128 = EOD.
    */
  private def runLengthDecode(data: Array[Byte], maxBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        if (i + l + 1 > data.length) bail("truncated RunLength literal")
        if (out.size() + l + 1 > maxBytes) bail("RunLength over cap")
        out.write(data, i, l + 1)
        i += l + 1
      } else {
        if (i >= data.length) bail("truncated RunLength repeat")
        if (out.size() + (257 - l) > maxBytes) bail("RunLength over cap")
        var k = 257 - l
        while (k > 0) { out.write(data(i)); k -= 1 }
        i += 1
      }
    }
    if (!done) bail("RunLength missing EOD")
    out.toByteArray
  }

  /** LZWDecode (ISO 32000 §7.4.4): 9→12-bit codes MSB-first, 256 =
    * clear table, 257 = EOD; the code width grows one entry EARLY by
    * default (`/EarlyChange 1`). Self-describing — the dictionary is
    * rebuilt from the stream, no literal tables.
    */
  private def lzwDecode(data: Array[Byte], maxBytes: Int,
                        earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // dictionary entries as (prefixCode, byte); 0..255 roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    val buf = new Array[Byte](4096)
    def emit(code0: Int): Byte = {
      var code = code0
      var p = buf.length
      while (code >= 256) {
        p -= 1
        buf(p) = suffix(code)
        code = prefix(code)
      }
      p -= 1
      buf(p) = code.toByte
      if (out.size() + (buf.length - p) > maxBytes) bail("LZW over cap")
      out.write(buf, p, buf.length - p)
      buf(p)
    }
    var bitPos = 0
    val totalBits = data.length * 8
    def read(): Int = {
      if (bitPos + width > totalBits) bail("truncated LZW stream")
      var v = 0
      var k = 0
      while (k < width) {
        val b = (data((bitPos >> 3)) >> (7 - (bitPos & 7))) & 1
        v = (v << 1) | b
        bitPos += 1
        k += 1
      }
      v
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == 257) done = true
      else if (code == 256) { next = 258; width = 9; prev = -1 }
      else {
        if (code > next || (code >= 258 && prev < 0)) bail("bad LZW code")
        val first: Byte =
          if (code == next) {
            // the KwKwK case: emit prev then its first byte
            if (prev < 0) bail("bad LZW code")
            val f = emit(prev)
            if (out.size() + 1 > maxBytes) bail("LZW over cap")
            out.write(f)
            f
          } else emit(code)
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
        }
        prev = code
        if (next + earlyChange >= (1 << width) && width < 12) width += 1
      }
    }
    out.toByteArray
  }

  // ---- document -----------------------------------------------------

  /** Parsed document handle: object table + fetch/resolve. */
  private final class Doc(val buf: Array[Byte], maxStreamBytes: Int) {
    // object number -> either an offset (positive) or (objstm, idx)
    private val offsets = scala.collection.mutable.Map.empty[Int, Long]
    private val inStream = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    // every object number DECIDED by a newer xref section — including
    // free/deleted entries, which must TOMBSTONE older 'n' entries
    // (an incremental update deleting an object would otherwise be
    // resurrected from the original file's table)
    private val decided = scala.collection.mutable.Set.empty[Int]
    var trailer: Map[String, Obj] = Map.empty
    private val cache = scala.collection.mutable.Map.empty[Int, Obj]
    private val objStmCache =
      scala.collection.mutable.Map.empty[Int, Map[Int, Obj]]
    private var fetching = Set.empty[Int]

    // -- standard security handler, empty USER password only --------
    // cryptBase is set IFF the blank password verified; then streams
    // and strings decrypt transparently at fetch. Everything else
    // (real user passwords, AES-256, non-Standard filters) stays
    // refused — `encrypted` reports encrypted-AND-UNREADABLE.
    private var cryptBase: Option[Array[Byte]] = None
    private var cryptAes = false
    private var cryptV5 = false // V5: the file key IS every object key
    private var encryptObjNum = -1

    private def cryptKeyFor(num: Int, gen: Int): Array[Byte] =
      if (cryptV5) cryptBase.get
      else PdfCrypt.objectKey(cryptBase.get, num, gen, cryptAes)

    def encrypted: Boolean =
      trailer.contains("Encrypt") && cryptBase.isEmpty

    /** Try to derive the file key for the EMPTY user password; quiet
      * no-op when the document is not encrypted or does not verify.
      * Must run AFTER the trailer loads and BEFORE content objects
      * are fetched (the Encrypt dict itself is fetched here, with
      * crypto off — its O/U strings are stored raw per spec).
      */
    def configureDecryption(): Unit = {
      cryptBase = None; cryptAes = false; cryptV5 = false
      encryptObjNum = -1
      val encRef = trailer.get("Encrypt") match {
        case Some(r @ PRef(n, _)) => encryptObjNum = n; r
        case Some(d: PDict)       => d
        case _                    => return
      }
      val enc = resolve(encRef) match {
        case d: PDict => d
        case _        => return
      }
      def name(k: String): Option[String] =
        enc.m.get(k).map(resolve).collect { case PName(n) => n }
      def num(k: String): Option[Long] =
        enc.m.get(k).map(resolve).collect { case PNum(v) => v.toLong }
      def str(k: String): Option[Array[Byte]] =
        enc.m.get(k).map(resolve).collect { case PStr(b) => b }
      if (!name("Filter").contains("Standard")) return
      val v = num("V").getOrElse(0L).toInt
      val r = num("R").getOrElse(0L).toInt
      // V5 (AES-256): R5 legacy / R6 ISO 32000-2 — the /U hash
      // validates the blank password and /UE unwraps the file key
      if (v == 5 && (r == 5 || r == 6)) {
        val u = str("U").getOrElse(return)
        val ue = str("UE").getOrElse(return)
        PdfCrypt.fileKeyV5(r, u, ue).foreach { k =>
          cryptBase = Some(k); cryptAes = true; cryptV5 = true
        }
        return
      }
      if (r < 2 || r > 4) return
      var aes = false
      if (v == 4) {
        // the crypt-filter layer: only the default StdCF with V2
        // (RC4) or AESV2 applied to BOTH streams and strings
        val stmf = name("StmF").getOrElse("Identity")
        val strf = name("StrF").getOrElse("Identity")
        if (stmf != "StdCF" || strf != "StdCF") return
        val cfm = enc.m.get("CF").map(resolve) match {
          case Some(PDict(cf)) => cf.get("StdCF").map(resolve) match {
            case Some(PDict(std)) => std.get("CFM").map(resolve) match {
              case Some(PName(n)) => n
              case _              => ""
            }
            case _ => ""
          }
          case _ => ""
        }
        cfm match {
          case "V2"    => aes = false
          case "AESV2" => aes = true
          case _       => return
        }
      } else if (v != 1 && v != 2) return
      val o = str("O").getOrElse(return)
      val u = str("U").getOrElse(return)
      if (o.length < 32) return
      val p = num("P").getOrElse(return)
      val encryptMetadata = enc.m.get("EncryptMetadata").map(resolve) match {
        case Some(PBool(b)) => b
        case _              => true
      }
      val id0 = trailer.get("ID").map(resolve) match {
        case Some(PArr(items)) => items.headOption.map(resolve) match {
          case Some(PStr(b)) => b
          case _             => Array.emptyByteArray
        }
        case _ => Array.emptyByteArray
      }
      val length = num("Length").getOrElse(40L).toInt
      val key = PdfCrypt.fileKey(r, length, o.take(32), p, id0,
        encryptMetadata)
      if (PdfCrypt.verifyEmptyUser(r, key, u, id0)) {
        cryptBase = Some(key)
        cryptAes = aes
      }
    }

    /** recover() fetches — and caches — every object BEFORE a file
      * key can exist (the trailer it needs is assembled during that
      * same pass). Once the blank password verifies, those cached
      * parses are ciphertext: strings undecrypted, ObjStm membership
      * read from encrypted stream bytes. Drop both caches and rebuild
      * the ObjStm expansion with decryption on, so every post-key
      * fetch serves plaintext. No-op until a key exists.
      */
    def invalidateAfterKey(): Unit = if (cryptBase.isDefined) {
      cache.clear(); objStmCache.clear()
      inStream.clear()
      offsets.keys.toSeq.sorted.foreach { n =>
        try {
          fetch(n) match {
            case PStream(d, _)
              if d.m.get("Type").contains(PName("ObjStm")) =>
              objStmObjects(n).keys.foreach { k =>
                if (!offsets.contains(k)) inStream(k) = (n, 0)
              }
            case _ => ()
          }
        } catch { case _: Bail | _: Exception => () }
      }
    }

    /** Decrypt every string INSIDE one fetched object (type-1 path
      * only — ObjStm members ride their container's decryption).
      */
    private def decryptStrings(o: Obj, num: Int, gen: Int): Obj = o match {
      case PStr(b) =>
        PStr(PdfCrypt.decrypt(cryptKeyFor(num, gen), b, cryptAes))
      case PDict(m) => PDict(m.map { case (k, v) =>
        k -> decryptStrings(v, num, gen) })
      case PArr(items) => PArr(items.map(decryptStrings(_, num, gen)))
      case PStream(d, raw) =>
        PStream(decryptStrings(d, num, gen).asInstanceOf[PDict], raw)
      case other => other
    }

    // -- xref loading --

    def load(): Unit = {
      val tail = new String(buf,
        math.max(0, buf.length - 2048),
        math.min(2048, buf.length), StandardCharsets.ISO_8859_1)
      val ix = tail.lastIndexOf("startxref")
      if (ix < 0) bail("no startxref")
      val after = tail.substring(ix + 9).trim
      val off = after.takeWhile(_.isDigit)
      if (off.isEmpty) bail("bad startxref offset")
      var next = off.toLong
      var hops = 0
      val seen = scala.collection.mutable.Set.empty[Long]
      while (next >= 0 && hops < 64) {
        if (!seen.add(next)) bail("xref cycle")
        next = loadXrefSection(next)
        hops += 1
      }
    }

    /** Returns the /Prev offset or -1. */
    private def loadXrefSection(off: Long): Long = {
      if (off < 0 || off >= buf.length) bail("xref offset out of range")
      val lx = new Lexer(buf, off.toInt)
      lx.skipWs()
      if (lx.matches("xref")) {
        lx.pos += 4
        lx.skipWs()
        // subsections: "start count" then count 20-byte entries —
        // held PENDING until the trailer is read, because in a hybrid
        // file the /XRefStm entries take precedence over this table's
        // (its 'f' rows stand in for ObjStm-compressed objects that
        // pre-1.5 readers should skip)
        val pending =
          scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
        while (!lx.matches("trailer")) {
          val start = lx.parseNumber().v.toInt
          lx.skipWs()
          val count = lx.parseNumber().v.toInt
          if (count < 0 || count > (1 << 22)) bail("xref subsection too big")
          // entries are nominally fixed 20-byte records, but writers
          // drift on the EOL — parse them as tokens instead
          var i = 0
          while (i < count) {
            lx.skipWs()
            val entryOff = lx.parseNumber().v.toLong
            lx.skipWs()
            lx.parseNumber() // generation
            lx.skipWs()
            val kind = lx.peek
            if (kind != 'n' && kind != 'f') bail("bad xref entry kind")
            lx.pos += 1
            pending += ((start + i, kind, entryOff))
            i += 1
          }
          lx.skipWs()
        }
        lx.pos += 7
        lx.skipWs()
        val t = lx.parseObj() match {
          case PDict(m) => m
          case _        => bail("bad trailer")
        }
        if (trailer.isEmpty) trailer = t
        else trailer = t ++ trailer // earlier (newer) sections win
        t.get("XRefStm").collect { case PNum(v) => loadXrefSection(v.toLong) }
        pending.foreach { case (num, kind, entryOff) =>
          // free entries TOMBSTONE older sections' 'n' rows: an
          // incrementally deleted object must not be resurrected
          if (decided.add(num) && kind == 'n') offsets(num) = entryOff
        }
        t.get("Prev") match {
          case Some(PNum(v)) => v.toLong
          case _             => -1L
        }
      } else {
        // cross-reference stream: "N G obj <<...>> stream"
        val (dict, data) = parseStreamObjectAt(off.toInt)
        val m = dict.m
        if (trailer.isEmpty) trailer = m
        else trailer = m ++ trailer
        val ws = m.get("W") match {
          case Some(PArr(items)) => items.collect { case PNum(v) => v.toInt }
          case _                 => bail("xref stream missing W")
        }
        if (ws.length < 3) bail("bad W")
        val size = m.get("Size") match {
          case Some(PNum(v)) => v.toInt
          case _             => bail("xref stream missing Size")
        }
        val index: Seq[(Int, Int)] = m.get("Index") match {
          case Some(PArr(items)) =>
            items.collect { case PNum(v) => v.toInt }.grouped(2).collect {
              case Seq(a, b) => (a, b)
            }.toSeq
          case _ => Seq((0, size))
        }
        val w = ws.map(_.min(8))
        val entryLen = w.sum
        if (entryLen <= 0) bail("zero-width xref entries")
        var p = 0
        def field(width: Int): Long = {
          var v = 0L
          var k = 0
          while (k < width) { v = (v << 8) | (data(p) & 0xffL); p += 1; k += 1 }
          v
        }
        index.foreach { case (start, count) =>
          var i = 0
          while (i < count && p + entryLen <= data.length) {
            val t = if (w(0) == 0) 1L else field(w(0))
            val f2 = field(w(1))
            val f3 = field(w(2))
            val num = start + i
            if (decided.add(num)) {
              t match {
                case 1 => offsets(num) = f2
                case 2 => inStream(num) = (f2.toInt, f3.toInt)
                case _ => () // type 0: free — tombstoned via `decided`
              }
            }
            i += 1
          }
        }
        m.get("Prev") match {
          case Some(PNum(v)) => v.toLong
          case _             => -1L
        }
      }
    }

    // -- object fetch --

    /** Parse "N G obj <body> [stream]" at a byte offset; returns the
      * stream dict + DECODED bytes for stream objects.
      */
    private def parseStreamObjectAt(off: Int): (PDict, Array[Byte]) =
      parseObjectAt(off) match {
        case PStream(d, raw) => (d, decodeStream(d, raw))
        case _               => bail("expected stream object")
      }

    private def parseObjectAt(off: Int): Obj = {
      if (off < 0 || off >= buf.length) bail("object offset out of range")
      val lx = new Lexer(buf, off)
      lx.skipWs()
      val objNum = lx.parseNumber().v.toInt // obj number (trusted from xref)
      lx.skipWs()
      val objGen = lx.parseNumber().v.toInt // generation
      lx.skipWs()
      lx.expect("obj")
      val o = lx.parseObj()
      val parsed = o match {
        case PStream(dict, _) =>
          val len = resolve(dict.m.getOrElse("Length", PNull)) match {
            case PNum(v) if v >= 0 && v <= Int.MaxValue => v.toInt
            case _ => bail("bad /Length")
          }
          val start = lx.pos
          if (start + len > buf.length) bail("stream overruns file")
          val raw = java.util.Arrays.copyOfRange(buf, start, start + len)
          // decrypt stream bytes before any filter decode — except
          // cross-reference streams, which the spec leaves plaintext
          // (they must parse before any key exists)
          val isXref = dict.m.get("Type") match {
            case Some(PName("XRef")) => true
            case _                   => false
          }
          val data =
            if (cryptBase.isDefined && !isXref && objNum != encryptObjNum)
              PdfCrypt.decrypt(cryptKeyFor(objNum, objGen), raw, cryptAes)
            else raw
          PStream(dict, data)
        case other => other
      }
      // strings in the object (incl. stream dicts) decrypt with the
      // same per-object key; the Encrypt dict's own O/U stay raw
      if (cryptBase.isDefined && objNum != encryptObjNum)
        decryptStrings(parsed, objNum, objGen)
      else parsed
    }

    def fetch(num: Int): Obj = cache.getOrElseUpdate(num, {
      if (fetching(num)) bail(s"reference cycle at $num")
      fetching += num
      try {
        offsets.get(num) match {
          case Some(off) => parseObjectAt(off.toInt)
          case None =>
            inStream.get(num) match {
              case Some((stmNum, _)) =>
                objStmObjects(stmNum).getOrElse(num,
                  bail(s"object $num missing from ObjStm $stmNum"))
              case None => PNull // per spec: missing object reads null
            }
        }
      } finally fetching -= num
    })

    private def objStmObjects(stmNum: Int): Map[Int, Obj] =
      objStmCache.getOrElseUpdate(stmNum, {
        val off = offsets.getOrElse(stmNum, bail(s"ObjStm $stmNum offset"))
        val (dict, data) = parseStreamObjectAt(off.toInt)
        val n = resolve(dict.m.getOrElse("N", PNull)) match {
          case PNum(v) => v.toInt
          case _       => bail("ObjStm missing N")
        }
        val first = resolve(dict.m.getOrElse("First", PNull)) match {
          case PNum(v) => v.toInt
          case _       => bail("ObjStm missing First")
        }
        if (n < 0 || n > (1 << 20)) bail("ObjStm N out of range")
        val hdr = new Lexer(data, 0)
        val pairs = (0 until n).map { _ =>
          hdr.skipWs()
          val num = hdr.parseNumber().v.toInt
          hdr.skipWs()
          val rel = hdr.parseNumber().v.toInt
          (num, rel)
        }
        pairs.map { case (num, rel) =>
          val lx = new Lexer(data, first + rel)
          num -> lx.parseObj()
        }.toMap
      })

    /** Follow indirect references; a hop budget turns a reference
      * cycle ('1 0 obj 2 0 R' / '2 0 obj 1 0 R') into a loud bail
      * instead of an infinite tail-loop — the parse-time `fetching`
      * guard cannot see cycles between already-cached bare refs.
      */
    def resolve(o: Obj): Obj = {
      var cur = o
      var hops = 0
      while (true) {
        cur match {
          case PRef(num, _) =>
            hops += 1
            if (hops > 64) bail("reference chain too deep")
            cur = fetch(num)
          case other => return other
        }
      }
      PNull // unreachable
    }

    /** True when the trailer's /Root really reaches a catalog dict —
      * the health check that decides whether [[recover]] must run.
      */
    def hasCatalog: Boolean =
      try {
        resolve(trailer.getOrElse("Root", PNull)) match {
          case PDict(m) => m.contains("Pages") ||
            m.get("Type").contains(PName("Catalog"))
          case _ => false
        }
      } catch { case _: Bail | _: Exception => false }

    /** Cross-reference RECOVERY for the broken-in-the-wild majority
      * class: lying/absent `startxref`, shifted offsets, truncated
      * tails. Rebuilds the object table by scanning the buffer for
      * `N G obj` headers (the LAST definition of a number wins —
      * incremental updates append), takes trailer dicts from
      * `trailer` keywords (later occurrences override), and failing
      * a /Root entry hunts the catalog object directly. This is how
      * every production PDF reader actually survives crawl data.
      */
    def recover(): Unit = {
      offsets.clear(); inStream.clear(); decided.clear()
      cache.clear(); objStmCache.clear()
      trailer = Map.empty
      var i = 0
      while (i + 2 < buf.length) {
        if (buf(i) == 'o' && buf(i + 1) == 'b' && buf(i + 2) == 'j' &&
          (i + 3 >= buf.length || isWs(buf(i + 3) & 0xff) ||
            isDelim(buf(i + 3) & 0xff)) &&
          i > 0 && isWs(buf(i - 1) & 0xff)) {
          // walk back across "<num> <gen> " before the keyword
          var p = i - 1
          while (p >= 0 && isWs(buf(p) & 0xff)) p -= 1
          val genEnd = p
          while (p >= 0 && buf(p) >= '0' && buf(p) <= '9') p -= 1
          if (p < genEnd && p >= 0 && isWs(buf(p) & 0xff)) {
            while (p >= 0 && isWs(buf(p) & 0xff)) p -= 1
            val numEnd = p
            while (p >= 0 && buf(p) >= '0' && buf(p) <= '9') p -= 1
            if (p < numEnd && numEnd - p <= 9 &&
              (p < 0 || isWs(buf(p) & 0xff) || isDelim(buf(p) & 0xff))) {
              val num = new String(buf, p + 1, numEnd - p,
                StandardCharsets.US_ASCII).toInt
              offsets(num) = (p + 1).toLong // later definitions win
            }
          }
        }
        i += 1
      }
      if (offsets.isEmpty) bail("no objects recovered")
      // expand recovered OBJECT STREAMS: a modern (1.5-style) file
      // keeps the catalog itself inside an ObjStm, invisible to the
      // header scan; and a recovered /Type /XRef stream's dict is the
      // missing trailer (Root AND Encrypt ride there)
      var streamTrailer = Map.empty[String, Obj]
      offsets.keys.toSeq.sorted.foreach { n =>
        try {
          fetch(n) match {
            case PStream(d, _) =>
              d.m.get("Type") match {
                case Some(PName("ObjStm")) =>
                  objStmObjects(n).keys.foreach { k =>
                    if (!offsets.contains(k)) inStream(k) = (n, 0)
                  }
                case Some(PName("XRef")) =>
                  streamTrailer = streamTrailer ++ d.m
                case _ => ()
              }
            case _ => ()
          }
        } catch { case _: Bail | _: Exception => () }
      }
      // trailer dicts, later occurrences override earlier
      var t = streamTrailer
      var j = 0
      while (j + 7 <= buf.length) {
        if (buf(j) == 't' && j + 7 <= buf.length &&
          new String(buf, j, 7, StandardCharsets.US_ASCII) == "trailer") {
          try {
            val lx = new Lexer(buf, j + 7)
            lx.parseObj() match {
              case PDict(m) => t = t ++ m
              case _        => ()
            }
          } catch { case _: Bail | _: Exception => () }
          j += 7
        } else j += 1
      }
      if (!t.contains("Root")) {
        // xref-stream files carry no `trailer` keyword: hunt the
        // catalog among the recovered objects
        val rootNum = offsets.keys.toSeq.sorted.find { n =>
          try {
            fetch(n) match {
              case PDict(m) => m.get("Type").contains(PName("Catalog"))
              case _        => false
            }
          } catch { case _: Bail | _: Exception => false }
        }
        rootNum match {
          case Some(n) => t += "Root" -> PRef(n, 0)
          case None    => bail("no catalog found in recovery")
        }
      }
      trailer = t
    }

    /** The stream's filter names with their aligned `/DecodeParms`. */
    def filterChain(dict: PDict): (Seq[String], Seq[Option[PDict]]) = {
      val filters: Seq[String] = resolve(dict.m.getOrElse("Filter", PNull)) match {
        case PNull          => Seq.empty
        case PName(n)       => Seq(n)
        case PArr(items)    => items.map(resolve).collect { case PName(n) => n }
        case _              => bail("bad /Filter")
      }
      val parms: Seq[Option[PDict]] =
        resolve(dict.m.getOrElse("DecodeParms", PNull)) match {
          case PNull       => Seq.fill(filters.length)(None)
          case d: PDict    => Some(d) +: Seq.fill(
            math.max(0, filters.length - 1))(None)
          case PArr(items) => items.map(resolve).map {
            case d: PDict => Some(d)
            case _        => None
          }.padTo(filters.length, None)
          case _           => Seq.fill(filters.length)(None)
        }
      (filters, parms)
    }

    def decodeStream(dict: PDict, raw: Array[Byte]): Array[Byte] = {
      val (filters, parms) = filterChain(dict)
      decodeFilters(filters, parms, raw)
    }

    /** Apply an explicit filter prefix — [[decodeStream]] for the
      * full chain; image extraction stops before a terminal
      * DCTDecode so the JPEG bytes pass through intact.
      */
    def decodeFilters(filters: Seq[String], parms: Seq[Option[PDict]],
                      raw: Array[Byte]): Array[Byte] = {
      var data = raw
      filters.zip(parms).foreach { case (f, parm) =>
        def num(k: String, dft: Int) = parm.map(d => resolve(
          d.m.getOrElse(k, PNum(dft))) match {
          case PNum(v) => v.toInt
          case _       => dft
        }).getOrElse(dft)
        def applyPredictor(): Unit = {
          val pred = num("Predictor", 1)
          if (pred > 1)
            data = unpredict(data, pred, num("Columns", 1),
              num("Colors", 1), num("BitsPerComponent", 8))
        }
        f match {
          case "FlateDecode" | "Fl" =>
            data = inflate(data, maxStreamBytes)
            applyPredictor()
          case "LZWDecode" | "LZW" =>
            data = lzwDecode(data, maxStreamBytes, num("EarlyChange", 1))
            applyPredictor()
          case "ASCIIHexDecode" | "AHx" => data = asciiHexDecode(data)
          case "ASCII85Decode" | "A85" =>
            data = ascii85Decode(data, maxStreamBytes)
          case "RunLengthDecode" | "RL" =>
            data = runLengthDecode(data, maxStreamBytes)
          case other => bail(s"unsupported filter /$other")
        }
      }
      data
    }
  }

  // ---- text extraction ----------------------------------------------

  /** Per-font byte→text decoder. */
  private sealed trait FontDecoder {
    def decode(bytes: Array[Byte]): String
  }
  private final case class CharsetDecoder(cs: Charset) extends FontDecoder {
    def decode(bytes: Array[Byte]): String = new String(bytes, cs)
  }
  /** Printable-ASCII fallback: bytes outside 32..126 (plus \t\n\r)
    * DROP — never guessed.
    */
  private case object AsciiDecoder extends FontDecoder {
    def decode(bytes: Array[Byte]): String =
      new String(bytes.filter(b =>
        (b >= 32 && b < 127) || b == '\t' || b == '\n' || b == '\r'),
        StandardCharsets.US_ASCII)
  }
  /** ToUnicode CMap decoder: fixed code width (1 or 2 bytes), map to
    * UTF-16BE strings; unmapped codes drop.
    */
  private final case class CMapDecoder(width: Int,
                                       map: Map[Int, String]) extends FontDecoder {
    def decode(bytes: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      while (i + width <= bytes.length) {
        var code = 0
        var k = 0
        while (k < width) { code = (code << 8) | (bytes(i + k) & 0xff); k += 1 }
        map.get(code).foreach(sb.append)
        i += width
      }
      sb.toString
    }
  }
  /** Composite font with no usable mapping: strings drop whole. */
  private case object OpaqueDecoder extends FontDecoder {
    def decode(bytes: Array[Byte]): String = ""
  }

  private val win1252: Option[Charset] =
    try Some(Charset.forName("windows-1252")) catch { case _: Exception => None }
  private val macRoman: Option[Charset] =
    try Some(Charset.forName("x-MacRoman")) catch { case _: Exception => None }

  /** Parse a ToUnicode CMap stream (bfchar/bfrange sections). */
  private def parseToUnicode(data: Array[Byte]): Option[CMapDecoder] = {
    val lx = new Lexer(data, 0)
    val map = Map.newBuilder[Int, String]
    var width = 0
    def codeOf(b: Array[Byte]): Int = {
      if (width == 0) width = b.length
      var v = 0
      b.foreach(x => v = (v << 8) | (x & 0xff))
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, StandardCharsets.UTF_16BE)
    try {
      while (lx.pos < lx.end) {
        lx.skipWs()
        if (lx.matches("beginbfchar")) {
          lx.pos += 11
          var done = false
          while (!done) {
            lx.skipWs()
            if (lx.matches("endbfchar")) { lx.pos += 9; done = true }
            else (lx.parseObj(), lx.parseObj()) match {
              case (PStr(src), PStr(dst)) => map += codeOf(src) -> utf16(dst)
              case _ => bail("bad bfchar pair")
            }
          }
        } else if (lx.matches("beginbfrange")) {
          lx.pos += 12
          var done = false
          while (!done) {
            lx.skipWs()
            if (lx.matches("endbfrange")) { lx.pos += 10; done = true }
            else (lx.parseObj(), lx.parseObj(), lx.parseObj()) match {
              case (PStr(lo), PStr(hi), PStr(dst)) =>
                val l = codeOf(lo)
                val h = codeOf(hi)
                if (h < l || h - l > 65535) bail("bad bfrange")
                // dst start increments its LAST UTF-16 code unit
                val base = utf16(dst)
                (0 to (h - l)).foreach { k =>
                  val s = if (base.isEmpty) "" else
                    base.init + (base.last + k).toChar
                  map += (l + k) -> s
                }
              case (PStr(lo), PStr(hi), PArr(items)) =>
                val l = codeOf(lo)
                val h = codeOf(hi)
                if (items.length != h - l + 1) bail("bfrange array size")
                items.zipWithIndex.foreach {
                  case (PStr(dst), k) => map += (l + k) -> utf16(dst)
                  case _              => bail("bad bfrange array")
                }
              case _ => bail("bad bfrange triple")
            }
          }
        } else if (lx.pos < lx.end) {
          // skip anything else: objects parse through, bare CMap
          // keywords (begincmap, findresource, def, ...) skip as
          // tokens, stray delimiters advance one byte
          val c = lx.peek
          if (c == '/' || c == '(' || c == '<' || c == '[' ||
            c == '+' || c == '-' || c == '.' ||
            (c >= '0' && c <= '9')) lx.parseObj()
          else {
            val start = lx.pos
            while (lx.pos < lx.end && !isWs(lx.buf(lx.pos) & 0xff) &&
              !isDelim(lx.buf(lx.pos) & 0xff)) lx.pos += 1
            if (lx.pos == start) lx.pos += 1
          }
        }
      }
      if (width == 0) None else Some(CMapDecoder(width, map.result()))
    } catch { case _: Bail | _: Exception => None }
  }

  /** Build the decoder for one font dict. */
  private def fontDecoder(doc: Doc, font: PDict): FontDecoder = {
    val m = font.m
    doc.resolve(m.getOrElse("ToUnicode", PNull)) match {
      case PStream(d, raw) =>
        parseToUnicode(doc.decodeStream(d, raw)) match {
          case Some(cm) => return cm
          case None     => ()
        }
      case _ => ()
    }
    val subtype = doc.resolve(m.getOrElse("Subtype", PNull)) match {
      case PName(n) => n
      case _        => ""
    }
    if (subtype == "Type0") return OpaqueDecoder // composite, no ToUnicode
    val encName = doc.resolve(m.getOrElse("Encoding", PNull)) match {
      case PName(n) => n
      case PDict(em) => em.get("BaseEncoding") match {
        case Some(PName(n)) => n
        case _              => ""
      }
      case _ => ""
    }
    encName match {
      case "WinAnsiEncoding" =>
        win1252.map(CharsetDecoder).getOrElse(AsciiDecoder)
      case "MacRomanEncoding" =>
        macRoman.map(CharsetDecoder).getOrElse(AsciiDecoder)
      case _ => AsciiDecoder
    }
  }

  /** Tokenize and execute the text operators of one content stream. */
  private def extractFromContent(doc: Doc, content: Array[Byte],
                                 fonts: Map[String, FontDecoder],
                                 out: StringBuilder): Unit = {
    val lx = new Lexer(content, 0)
    var operands = List.empty[Obj]
    var cur: FontDecoder = AsciiDecoder
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def emit(s: String): Unit = if (s.nonEmpty) out.append(s)
    def str(o: Obj): String = o match {
      case PStr(b) => cur.decode(b)
      case _       => ""
    }
    while (lx.pos < lx.end) {
      lx.skipWs()
      if (lx.pos >= lx.end) ()
      else {
        val c = lx.peek
        if (c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
          operands ::= lx.parseObj()
        } else {
          // operator token
          val start = lx.pos
          while (lx.pos < lx.end && !isWs(lx.buf(lx.pos) & 0xff) &&
            !isDelim(lx.buf(lx.pos) & 0xff)) lx.pos += 1
          val op =
            if (lx.pos > start)
              new String(lx.buf, start, lx.pos - start,
                StandardCharsets.US_ASCII)
            else { lx.pos += 1; "" } // stray delimiter: drop it
          op match {
            case "Tf" =>
              operands match {
                case _ :: PName(f) :: _ =>
                  cur = fonts.getOrElse(f, AsciiDecoder)
                case _ => ()
              }
            case "Tj" => operands.headOption.foreach(o => emit(str(o)))
            case "'" =>
              newline()
              operands.headOption.foreach(o => emit(str(o)))
            case "\"" =>
              newline()
              operands.headOption.foreach(o => emit(str(o)))
            case "TJ" =>
              operands.headOption.foreach {
                case PArr(items) =>
                  items.foreach {
                    case s: PStr => emit(str(s))
                    case PNum(v) if v <= -180 => emit(" ")
                    case _ => ()
                  }
                case _ => ()
              }
            case "T*" => newline()
            case "Td" | "TD" =>
              operands match {
                case PNum(ty) :: _ :: _ if ty != 0 => newline()
                case _ => ()
              }
            case "Tm" =>
              // a new text matrix usually means a new line/paragraph
              newline()
            case "BT" | "ET" => newline()
            case "BI" =>
              // inline image: skip to EI (binary payload would
              // otherwise derail the tokenizer)
              var found = false
              while (!found && lx.pos + 1 < lx.end) {
                if ((lx.buf(lx.pos) & 0xff) == 'E' &&
                  (lx.buf(lx.pos + 1) & 0xff) == 'I' &&
                  (lx.pos + 2 >= lx.end || isWs(lx.buf(lx.pos + 2) & 0xff))) {
                  lx.pos += 2
                  found = true
                } else lx.pos += 1
              }
            case _ => () // every other operator: drop with its operands
          }
          operands = List.empty
        }
      }
    }
  }

  /** Walk the page tree, collecting leaf pages with their (inherited)
    * resources.
    */
  /** Hard cap on page-tree leaves: a legitimate document stays far
    * under it; a crafted Kids DAG (the same node listed twice per
    * level, 30 levels deep = 2^30 leaves from a 1 KB file) trips it
    * loud instead of hanging the executor.
    */
  private val MaxPages = 1 << 17

  private def pages(doc: Doc, node: Obj, inheritedRes: Option[PDict],
                    depth: Int, visited: java.util.HashSet[Int],
                    out: scala.collection.mutable.ArrayBuffer[(PDict, Option[PDict])])
  : Unit = {
    if (depth > 64) bail("page tree too deep")
    // a node visited twice means the Kids graph is not a tree —
    // reject the DAG/cycle rather than multiply-count its subtree
    node match {
      case PRef(num, _) =>
        if (!visited.add(num)) bail("page tree is not a tree")
      case _ => ()
    }
    doc.resolve(node) match {
      case d @ PDict(m) =>
        val res = doc.resolve(m.getOrElse("Resources", PNull)) match {
          case r: PDict => Some(r)
          case _        => inheritedRes
        }
        doc.resolve(m.getOrElse("Type", PNull)) match {
          case PName("Pages") =>
            doc.resolve(m.getOrElse("Kids", PNull)) match {
              case PArr(kids) =>
                kids.foreach(k => pages(doc, k, res, depth + 1, visited, out))
              case _ => ()
            }
          case PName("Page") =>
            if (out.length >= MaxPages) bail("page count over cap")
            out += ((d, res))
          case _ => ()
        }
      case _ => ()
    }
  }

  private val HeaderMagic = "%PDF-".getBytes(StandardCharsets.US_ASCII)

  private def open(bytes: Array[Byte],
                   maxStreamBytes: Int): Option[Doc] = {
    if (bytes == null || bytes.length < 16) return None
    // the header may be preceded by junk (HTTP noise, shell banners —
    // the spec tolerates it; offsets then measure from the header)
    val hdrOff = {
      var i = 0
      var found = -1
      val limit = math.min(1024, bytes.length - HeaderMagic.length)
      while (found < 0 && i <= limit) {
        var k = 0
        while (k < HeaderMagic.length && bytes(i + k) == HeaderMagic(k)) k += 1
        if (k == HeaderMagic.length) found = i
        i += 1
      }
      found
    }
    if (hdrOff < 0) return None
    val body =
      if (hdrOff == 0) bytes
      else java.util.Arrays.copyOfRange(bytes, hdrOff, bytes.length)
    val doc = new Doc(body, maxStreamBytes)
    var recovered = false
    try doc.load()
    catch {
      case _: Bail | _: Exception =>
        try { doc.recover(); recovered = true }
        catch { case _: Bail | _: Exception => return None }
    }
    // blank-user-password decryption (when it verifies) configures
    // BEFORE any content fetch so cached objects decrypt uniformly.
    // When RECOVERY ran first it already fetched-and-cached every
    // object pre-key — invalidate so ciphertext parses never serve.
    try doc.configureDecryption()
    catch { case _: Bail | _: Exception => () }
    if (recovered) doc.invalidateAfterKey()
    // a table that loaded but cannot reach a catalog (lying startxref,
    // shifted offsets) gets the same recovery pass
    if (!doc.hasCatalog) {
      try doc.recover()
      catch { case _: Bail | _: Exception => return None }
      try doc.configureDecryption()
      catch { case _: Bail | _: Exception => () }
      doc.invalidateAfterKey()
      if (!doc.hasCatalog && !doc.encrypted) return None
    }
    Some(doc)
  }

  /** Extract all page text. None when the payload is not a PDF, is
    * encrypted, or its structure cannot be walked; pages join with
    * `\f`.
    */
  def extractText(bytes: Array[Byte],
                  maxStreamBytes: Int = DefaultMaxStreamBytes): Option[PdfText] = {
    val doc = open(bytes, maxStreamBytes) match {
      case Some(d) => d
      case None    => return None
    }
    if (doc.encrypted) return None
    try {
      val root = doc.resolve(doc.trailer.getOrElse("Root", PNull)) match {
        case d: PDict => d
        case _        => bail("no /Root")
      }
      val tree = doc.resolve(root.m.getOrElse("Pages", PNull))
      val leafBuf =
        scala.collection.mutable.ArrayBuffer.empty[(PDict, Option[PDict])]
      pages(doc, tree, None, 0, new java.util.HashSet[Int](), leafBuf)
      val leaves = leafBuf.toVector
      val texts = leaves.map { case (page, res) =>
        val fonts: Map[String, FontDecoder] = res match {
          case Some(r) => doc.resolve(r.m.getOrElse("Font", PNull)) match {
            case PDict(fm) => fm.map { case (name, fo) =>
              name -> (doc.resolve(fo) match {
                case fd: PDict => fontDecoder(doc, fd)
                case _         => AsciiDecoder
              })
            }
            case _ => Map.empty[String, FontDecoder]
          }
          case None => Map.empty[String, FontDecoder]
        }
        val contents = doc.resolve(page.m.getOrElse("Contents", PNull)) match {
          case PStream(d, raw) => Seq(doc.decodeStream(d, raw))
          case PArr(items) => items.map(doc.resolve).collect {
            case PStream(d, raw) => doc.decodeStream(d, raw)
          }
          case _ => Seq.empty
        }
        val sb = new StringBuilder
        // a /Contents ARRAY is ONE content stream split at arbitrary
        // byte positions (ISO 32000 §7.8.2): concatenate (with a
        // whitespace byte, as the spec prescribes) and run the text
        // machine ONCE, so font state and pending operands survive
        // stream boundaries
        if (contents.nonEmpty)
          extractFromContent(doc,
            contents.reduce((a, b) => a ++ Array('\n'.toByte) ++ b),
            fonts, sb)
        sb.toString.trim
      }
      Some(PdfText(leaves.length, texts.mkString("\f")))
    } catch { case _: Bail | _: Exception => None }
  }

  /** Structural probe (no text decode): header version, page count,
    * encryption flag. None when the file does not open as a PDF.
    */
  def meta(bytes: Array[Byte]): Option[Meta] = {
    val doc = open(bytes, DefaultMaxStreamBytes) match {
      case Some(d) => d
      case None    => return None
    }
    val version = {
      // read from the doc's (possibly re-anchored) buffer — leading
      // junk before %PDF- must not masquerade as the version
      val hdr = new String(doc.buf, 0, math.min(16, doc.buf.length),
        StandardCharsets.ISO_8859_1)
      hdr.drop(5).takeWhile(c => c.isDigit || c == '.')
    }
    val nPages =
      try {
        val root = doc.resolve(doc.trailer.getOrElse("Root", PNull)) match {
          case d: PDict => d
          case _        => return Some(Meta(version, -1, doc.encrypted))
        }
        doc.resolve(root.m.getOrElse("Pages", PNull)) match {
          case PDict(m) => doc.resolve(m.getOrElse("Count", PNull)) match {
            case PNum(v) => v.toInt
            case _       => -1
          }
          case _ => -1
        }
      } catch { case _: Bail | _: Exception => -1 }
    // the Info dict's /Title — a PDF *text string*: UTF-16BE with a
    // BOM, else PDFDocEncoding (Latin-1 on the common range). An
    // encrypted document's strings are ciphertext: refuse.
    def infoString(key: String): Option[String] =
      if (doc.encrypted) None
      else try {
        doc.resolve(doc.trailer.getOrElse("Info", PNull)) match {
          case PDict(m) => doc.resolve(m.getOrElse(key, PNull)) match {
            case PStr(b) => Some(decodeTextString(b)).map(_.trim)
              .filter(_.nonEmpty)
            case _ => None
          }
          case _ => None
        }
      } catch { case _: Bail | _: Exception => None }
    // XMP fallback (ISO 16684-1 packet in the catalog's /Metadata
    // stream): modern writers put dc:title / dc:creator /
    // xmp:CreateDate there and often omit the Info dict entirely.
    // Info wins when both declare (the incumbent readers' order);
    // encrypted documents skip it like they skip Info — ciphertext
    // is not metadata.
    lazy val xmpFields: (Option[String], Option[String], Option[String]) =
      if (doc.encrypted) (None, None, None)
      else try {
        doc.resolve(doc.trailer.getOrElse("Root", PNull)) match {
          case PDict(m) => doc.resolve(m.getOrElse("Metadata", PNull)) match {
            case PStream(d, raw) =>
              val xml = new String(doc.decodeStream(d, raw),
                StandardCharsets.UTF_8)
              ZipRead.parseXml(xml) match {
                case Some(x) =>
                  // dc:title/dc:creator nest rdf:Alt|Seq/rdf:li
                  def first(label: String): Option[String] =
                    (x \\ label).headOption.map { e =>
                      val lis = e \\ "li"
                      (if (lis.nonEmpty) lis.head.text else e.text).trim
                    }.filter(_.nonEmpty)
                  // CreateDate rides as an element OR an attribute
                  // of rdf:Description (both forms are in the wild)
                  val created = first("CreateDate").orElse(
                    (x \\ "Description").flatMap(_.attributes)
                      .find(_.key == "CreateDate")
                      .map(_.value.text.trim).filter(_.nonEmpty))
                  (first("title"), first("creator"), created)
                case None => (None, None, None)
              }
            case _ => (None, None, None)
          }
          case _ => (None, None, None)
        }
      } catch { case _: Bail | _: Exception => (None, None, None) }
    Some(Meta(version, nPages, doc.encrypted,
      infoString("Title").orElse(xmpFields._1),
      infoString("Author").orElse(xmpFields._2),
      infoString("CreationDate").orElse(xmpFields._3)))
  }

  /** PDF text-string decode: UTF-16BE when BOM'd, else the
    * PDFDocEncoding common range via Latin-1.
    */
  private def decodeTextString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else new String(b, StandardCharsets.ISO_8859_1)

  // ---- link annotations -----------------------------------------------

  /** Outbound `/URI` link annotations in page order (ISO 32000
    * §12.5.6.5 link annotations, §12.6.4.7 URI actions) — PDFs feed
    * the SAME crawl frontier HTML pages do
    * ([[graft.ops.Links]]): a whitepaper's references are crawl
    * seeds like a page's anchors. Internal GoTo destinations skip;
    * duplicates drop keeping first occurrence; encrypted/unwalkable
    * documents yield empty.
    */
  def links(bytes: Array[Byte],
            maxStreamBytes: Int = DefaultMaxStreamBytes,
            maxLinks: Int = 1024): Seq[String] = {
    val doc = open(bytes, maxStreamBytes) match {
      case Some(d) => d
      case None    => return Seq.empty
    }
    if (doc.encrypted) return Seq.empty
    try {
      val root = doc.resolve(doc.trailer.getOrElse("Root", PNull)) match {
        case d: PDict => d
        case _        => return Seq.empty
      }
      val tree = doc.resolve(root.m.getOrElse("Pages", PNull))
      val leafBuf =
        scala.collection.mutable.ArrayBuffer.empty[(PDict, Option[PDict])]
      pages(doc, tree, None, 0, new java.util.HashSet[Int](), leafBuf)
      val seen = new java.util.LinkedHashSet[String]()
      leafBuf.foreach { case (page, _) =>
        if (seen.size < maxLinks) {
          doc.resolve(page.m.getOrElse("Annots", PNull)) match {
            case PArr(items) => items.foreach { a =>
              if (seen.size < maxLinks) {
                try {
                  doc.resolve(a) match {
                    case PDict(am)
                      if doc.resolve(am.getOrElse("Subtype", PNull)) ==
                        PName("Link") =>
                      doc.resolve(am.getOrElse("A", PNull)) match {
                        case PDict(act)
                          if doc.resolve(act.getOrElse("S", PNull)) ==
                            PName("URI") =>
                          doc.resolve(act.getOrElse("URI", PNull)) match {
                            case PStr(b) =>
                              val u = new String(b,
                                StandardCharsets.ISO_8859_1).trim
                              if (u.nonEmpty) seen.add(u)
                            case _ => ()
                          }
                        case _ => ()
                      }
                    case _ => ()
                  }
                } catch { case _: Bail | _: Exception => () }
              }
            }
            case _ => ()
          }
        }
      }
      import scala.jdk.CollectionConverters._
      seen.iterator().asScala.toSeq
    } catch { case _: Bail | _: Exception => Seq.empty }
  }

  private val linksUdf = org.apache.spark.sql.functions.udf {
    (b: Array[Byte]) => links(b)
  }

  /** `array<string>` of the document's outbound URI links. */
  def linksCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    linksUdf(bytesCol)

  // ---- embedded images ------------------------------------------------

  /** One image XObject pulled out of a page: `format` is the
    * container the bytes are in — `"jpeg"` for DCTDecode payloads
    * (the JPEG bytes pass through untouched), `"png"` for every
    * fully-decodable sample stream (Flate/LZW/ASCII/RunLength
    * chains re-encoded losslessly) — so every consumer routes the
    * bytes through the ONE [[graft.multimodal.ImageDecode]] front
    * door and a scanned PDF's pages dedup against their TIFF/JPEG/
    * PNG twins.
    */
  final case class PdfImage(page: Int, name: String, width: Int,
                            height: Int, format: String,
                            bytes: Array[Byte])

  /** Per-document image cap — a crawl row never explodes into an
    * unbounded image list.
    */
  val DefaultMaxImages: Int = 256

  /** Decoded-pixel bomb guard: a 1 KB stream declaring a
    * 100k×100k image refuses before allocation.
    */
  private val MaxImagePixels: Long = 64L << 20

  /** Image codecs we refuse rather than mis-decode: JBIG2 and JPEG
    * 2000 (arithmetic/wavelet entropy coders with no independent
    * offline decoder on the box); the skip is recorded per image,
    * never a throw (COVERAGE.md has the reasons). CCITT G3/G4 decodes
    * since r17 via the from-spec [[graft.multimodal.Ccitt]] kernel,
    * JDK-triangulated in CcittSpec.
    */
  private val UndecodedImageFilters =
    Set("JBIG2Decode", "JPXDecode")

  /** Extract every image XObject, page order then name order. Empty
    * when the payload is not a PDF, is (non-blank-password)
    * encrypted, or its structure cannot be walked; a single bad
    * image skips that image, never the document (crawl posture).
    */
  def images(bytes: Array[Byte],
             maxStreamBytes: Int = DefaultMaxStreamBytes,
             maxImages: Int = DefaultMaxImages): Seq[PdfImage] = {
    val doc = open(bytes, maxStreamBytes) match {
      case Some(d) => d
      case None    => return Seq.empty
    }
    if (doc.encrypted) return Seq.empty
    try {
      val root = doc.resolve(doc.trailer.getOrElse("Root", PNull)) match {
        case d: PDict => d
        case _        => return Seq.empty
      }
      val tree = doc.resolve(root.m.getOrElse("Pages", PNull))
      val leafBuf =
        scala.collection.mutable.ArrayBuffer.empty[(PDict, Option[PDict])]
      pages(doc, tree, None, 0, new java.util.HashSet[Int](), leafBuf)
      val out = scala.collection.mutable.ArrayBuffer.empty[PdfImage]
      leafBuf.iterator.zipWithIndex.foreach { case ((page, res), pi) =>
        val xobjs = res.map(r => doc.resolve(r.m.getOrElse("XObject", PNull)))
        xobjs match {
          case Some(PDict(xm)) =>
            // PDict is an unordered Map: sort names for determinism
            xm.keys.toSeq.sorted.foreach { name =>
              if (out.length < maxImages) {
                try {
                  doc.resolve(xm(name)) match {
                    case PStream(d, raw)
                      if doc.resolve(d.m.getOrElse("Subtype", PNull)) ==
                        PName("Image") =>
                      imageOf(doc, d, raw).foreach { case (w, h, fmt, b) =>
                        out += PdfImage(pi + 1, name, w, h, fmt, b)
                      }
                    case _ => ()
                  }
                } catch { case _: Bail | _: Exception => () }
              }
            }
          case _ => ()
        }
        // inline images (BI…ID…EI) from the page's content stream —
        // names are synthetic (~inline0, ~inline1, …: '~' cannot
        // start a real XObject /Name token's common spellings and
        // keeps the two sources distinguishable), stream order
        if (out.length < maxImages) {
          try {
            val contents = doc.resolve(page.m.getOrElse("Contents", PNull)) match {
              case PStream(d, raw) => Seq(doc.decodeStream(d, raw))
              case PArr(items) => items.map(doc.resolve).collect {
                case PStream(d, raw) => doc.decodeStream(d, raw)
              }
              case _ => Seq.empty
            }
            if (contents.nonEmpty) {
              val joined =
                if (contents.length == 1) contents.head
                else contents.reduce((a, b) => a ++ Array('\n'.toByte) ++ b)
              inlineImages(doc, joined, maxImages - out.length)
                .zipWithIndex.foreach { case ((w, h, fmt, b), k) =>
                  out += PdfImage(pi + 1, s"~inline$k", w, h, fmt, b)
                }
            }
          } catch { case _: Bail | _: Exception => () }
        }
      }
      out.toSeq
    } catch { case _: Bail | _: Exception => Seq.empty }
  }

  /** Inline-image (ISO 32000 §8.9.7) key/value abbreviations → the
    * XObject spellings, so the ONE [[imageOf]] kernel serves both
    * the `BI…ID…EI` and the XObject form.
    */
  private val InlineKeyMap = Map(
    "W" -> "Width", "H" -> "Height", "BPC" -> "BitsPerComponent",
    "CS" -> "ColorSpace", "F" -> "Filter", "DP" -> "DecodeParms",
    "D" -> "Decode", "IM" -> "ImageMask")
  private val InlineCsMap = Map(
    "G" -> "DeviceGray", "RGB" -> "DeviceRGB", "CMYK" -> "DeviceCMYK",
    "I" -> "Indexed")

  /** Scan ONE page's (concatenated) content stream for inline images:
    * `BI` params to `ID`, one whitespace byte, then the binary
    * payload — length computed EXACTLY for unfiltered samples, else
    * delimiter-scanned to `⟨ws⟩EI⟨ws|eof⟩` (the robustness recipe
    * every reader uses; a payload byte pattern colliding with EI
    * merely truncates THAT image, which then fails its row bounds
    * and skips). A malformed run ends the scan, never throws.
    */
  private def inlineImages(doc: Doc, content: Array[Byte],
                           budget: Int): Seq[(Int, Int, String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, String, Array[Byte])]
    try {
      val lx = new Lexer(content, 0)
      while (lx.pos < lx.end && out.length < budget) {
        lx.skipWs()
        if (lx.pos < lx.end) {
          val c = lx.peek
          if (c == '/' || c == '(' || c == '<' || c == '[' ||
            c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
            lx.parseObj()
          } else {
            val start = lx.pos
            while (lx.pos < lx.end && !isWs(lx.buf(lx.pos) & 0xff) &&
              !isDelim(lx.buf(lx.pos) & 0xff)) lx.pos += 1
            val op =
              if (lx.pos > start)
                new String(lx.buf, start, lx.pos - start,
                  StandardCharsets.US_ASCII)
              else { lx.pos += 1; "" }
            if (op == "BI") {
              val params = scala.collection.mutable.Map.empty[String, Obj]
              var done = false
              while (!done) {
                lx.skipWs()
                if (lx.pos >= lx.end) bail("BI without ID")
                if (lx.peek == '/') {
                  val key = lx.parseObj() match {
                    case PName(n) => InlineKeyMap.getOrElse(n, n)
                    case _        => bail("bad inline key")
                  }
                  lx.skipWs()
                  val v0 = lx.parseObj()
                  params(key) = (key, v0) match {
                    case ("ColorSpace", PName(n)) =>
                      PName(InlineCsMap.getOrElse(n, n))
                    case _ => v0
                  }
                } else {
                  val s2 = lx.pos
                  while (lx.pos < lx.end && !isWs(lx.buf(lx.pos) & 0xff) &&
                    !isDelim(lx.buf(lx.pos) & 0xff)) lx.pos += 1
                  val tok = new String(lx.buf, s2, lx.pos - s2,
                    StandardCharsets.US_ASCII)
                  if (tok == "ID") done = true
                  else bail("unexpected token in BI params")
                }
              }
              // One whitespace byte separates ID from data (ISO
              // 32000-1 §8.9.7), but writers emitting CRLF there are
              // common in practice — and for unfiltered data a
              // one-byte shift passes the exact-length bound while
              // decoding silently wrong pixels. Consume the CR LF
              // pair as the single separator when present.
              var dp = lx.pos
              if (dp + 1 < lx.end && lx.buf(dp) == '\r' &&
                lx.buf(dp + 1) == '\n') dp += 2
              else if (dp < lx.end && isWs(lx.buf(dp) & 0xff)) dp += 1
              val dict = PDict(params.toMap)
              val hasFilter = params.get("Filter").exists(_ != PNull)
              val dataEnd: Int =
                if (!hasFilter) {
                  // exact: ceil(w*comps*bpc/8) * h
                  def num(k: String, dft: Int) = params.get(k) match {
                    case Some(PNum(v)) => v.toInt
                    case _             => dft
                  }
                  val isMask = params.get("ImageMask")
                    .contains(PBool(true))
                  val comps = params.get("ColorSpace") match {
                    case _ if isMask            => 1
                    case Some(PName("DeviceRGB"))  => 3
                    case Some(PName("DeviceCMYK")) => 4
                    case _                         => 1
                  }
                  val bpc = if (isMask) 1 else num("BitsPerComponent", 8)
                  val w = num("Width", -1); val h = num("Height", -1)
                  if (w <= 0 || h <= 0 || bpc <= 0 || bpc > 16)
                    bail("bad inline dims")
                  val len = ((w.toLong * comps * bpc + 7) / 8) * h
                  if (dp + len > lx.end) bail("inline data overruns")
                  (dp + len).toInt
                } else {
                  // delimiter scan for <ws>EI<ws|eof>
                  var j = dp
                  var found = -1
                  while (found < 0 && j + 2 < lx.end) {
                    if (isWs(lx.buf(j) & 0xff) &&
                      lx.buf(j + 1) == 'E' && lx.buf(j + 2) == 'I' &&
                      (j + 3 >= lx.end || isWs(lx.buf(j + 3) & 0xff) ||
                        isDelim(lx.buf(j + 3) & 0xff))) found = j
                    else j += 1
                  }
                  if (found < 0) bail("no EI")
                  found
                }
              val data = java.util.Arrays.copyOfRange(lx.buf, dp, dataEnd)
              // position after the EI token
              lx.pos = dataEnd
              lx.skipWs()
              if (lx.pos + 2 <= lx.end && lx.buf(lx.pos) == 'E' &&
                lx.buf(lx.pos + 1) == 'I') lx.pos += 2
              try imageOf(doc, dict, data).foreach(out += _)
              catch { case _: Bail | _: Exception => () } // skip image
            }
          }
        }
      }
    } catch { case _: Bail | _: Exception => () } // end of scan
    out.toSeq
  }

  /** One image XObject → (width, height, container format, bytes);
    * None for the recorded-skip codecs and sample shapes we cannot
    * re-encode losslessly.
    */
  private def imageOf(doc: Doc, d: PDict,
                      raw: Array[Byte]): Option[(Int, Int, String, Array[Byte])] = {
    def intOf(k: String, dft: Int): Int =
      doc.resolve(d.m.getOrElse(k, PNum(dft))) match {
        case PNum(v) => v.toInt
        case _       => dft
      }
    val w = intOf("Width", -1)
    val h = intOf("Height", -1)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) return None
    val (filters, parms) = doc.filterChain(d)
    if (filters.exists(UndecodedImageFilters.contains)) return None
    if (filters.lastOption.exists(f => f == "CCITTFaxDecode" || f == "CCF")) {
      // fax scan: decode any transport prefix (ASCII85/Hex/Flate),
      // then the from-spec T.4/T.6 kernel on the fax bits
      val enc = doc.decodeFilters(filters.dropRight(1),
        parms.dropRight(1), raw)
      val dp = parms.last
      def pInt(k: String, dft: Int): Int = dp.map(pd => doc.resolve(
        pd.m.getOrElse(k, PNum(dft))) match {
        case PNum(v) => v.toInt
        case _       => dft
      }).getOrElse(dft)
      def pBool(k: String): Boolean = dp.exists(pd => doc.resolve(
        pd.m.getOrElse(k, PNull)) == PBool(true))
      val cols = pInt("Columns", 1728)
      val rws = { val r = pInt("Rows", 0); if (r > 0) r else h }
      // the raster the fax bits describe must be the raster the
      // image dict declares, or the samples misalign — skip, not guess
      if (cols != w || rws != h) return None
      graft.multimodal.Ccitt.decode(enc, cols, rws, pInt("K", 0),
        encodedByteAlign = pBool("EncodedByteAlign"),
        blackIs1 = pBool("BlackIs1")).flatMap { samples =>
        samplesToPng(doc, d, samples, w, h).map(png => (w, h, "png", png))
      }
    } else if (filters.lastOption.exists(f => f == "DCTDecode" || f == "DCT")) {
      // the JPEG bytes ARE the payload: decode only the prefix
      // (ASCII85/Hex wrappers) and pass the entropy-coded stream
      // through intact — bit-identical to the bare .jpg twin
      val jpeg = doc.decodeFilters(filters.dropRight(1),
        parms.dropRight(1), raw)
      if (jpeg.length < 4 || (jpeg(0) & 0xFF) != 0xFF ||
        (jpeg(1) & 0xFF) != 0xD8) return None
      Some((w, h, "jpeg", jpeg))
    } else {
      val data = doc.decodeFilters(filters, parms, raw)
      samplesToPng(doc, d, data, w, h).map(png => (w, h, "png", png))
    }
  }

  /** Raw image samples → PNG via the JDK encoder (lossless, so the
    * pixels — and therefore every downstream dHash/stat — are
    * exactly the embedded ones). Handles DeviceGray/DeviceRGB (and
    * their Cal/ICC N=1/N=3 equivalents) at 1/2/4/8/16 bits,
    * `/Indexed` palettes, `/ImageMask` stencils, and the gray
    * `/Decode [1 0]` inversion. None for CMYK and shapes outside
    * that set (recorded skip, not a guess).
    */
  private def samplesToPng(doc: Doc, d: PDict, data: Array[Byte],
                           w: Int, h: Int): Option[Array[Byte]] = {
    val isMask = doc.resolve(d.m.getOrElse("ImageMask", PNull)) match {
      case PBool(v) => v
      case _        => false
    }
    val bpc =
      if (isMask) 1
      else doc.resolve(d.m.getOrElse("BitsPerComponent", PNum(8))) match {
        case PNum(v) => v.toInt
        case _       => 8
      }
    if (bpc != 1 && bpc != 2 && bpc != 4 && bpc != 8 && bpc != 16)
      return None
    // colorspace → (components, palette, grayish)
    sealed trait Cs
    case object Gray extends Cs
    case object Rgb extends Cs
    final case class Indexed(palette: Array[Byte]) extends Cs
    def csOf(o: Obj, depth: Int): Option[Cs] = {
      if (depth > 4) return None
      doc.resolve(o) match {
        case PName("DeviceGray") | PName("G") | PName("CalGray") =>
          Some(Gray)
        case PName("DeviceRGB") | PName("RGB") | PName("CalRGB") =>
          Some(Rgb)
        case PArr(items) if items.nonEmpty =>
          doc.resolve(items.head) match {
            case PName("ICCBased") if items.length >= 2 =>
              doc.resolve(items(1)) match {
                case PStream(sd, _) =>
                  doc.resolve(sd.m.getOrElse("N", PNull)) match {
                    case PNum(n) if n.toInt == 1 => Some(Gray)
                    case PNum(n) if n.toInt == 3 => Some(Rgb)
                    case _                       => None
                  }
                case _ => None
              }
            case PName("CalGray") => Some(Gray)
            case PName("CalRGB")  => Some(Rgb)
            case PName("Indexed") | PName("I") if items.length >= 4 =>
              val base = csOf(items(1), depth + 1)
              val lookup = doc.resolve(items(3)) match {
                case PStr(b)         => b
                case PStream(sd, sr) => doc.decodeStream(sd, sr)
                case _               => return None
              }
              base.map {
                case Rgb  => Indexed(lookup)
                case Gray =>
                  // expand a gray palette to RGB triples
                  Indexed(lookup.flatMap(g => Array(g, g, g)))
                case _: Indexed => return None
              }
            case _ => None
          }
        case _ => None
      }
    }
    val cs: Cs =
      if (isMask) Gray
      else csOf(d.m.getOrElse("ColorSpace", PNull), 0) match {
        case Some(c) => c
        case None    => return None
      }
    val comps = cs match { case Rgb => 3; case _ => 1 }
    // /Decode [d0 d1] for single-component data (gray + stencil
    // inversion); ImageMask's default is [0 1] — sample 0 paints,
    // which for extraction purposes reads as black-on-white
    val decode: Option[(Double, Double)] =
      doc.resolve(d.m.getOrElse("Decode", PNull)) match {
        case PArr(items) if items.length >= 2 && comps == 1 =>
          (doc.resolve(items(0)), doc.resolve(items(1))) match {
            case (PNum(a), PNum(b)) => Some((a, b))
            case _                  => None
          }
        case _ => None
      }
    val rowBytes = (w.toLong * comps * bpc + 7) / 8
    if (rowBytes * h > data.length) return None // torn samples: skip
    val maxVal = (1 << math.min(bpc, 16)) - 1
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val rowOff = y * rowBytes
      var x = 0
      while (x < w) {
        def sample(c: Int): Int = {
          val bitPos = (x.toLong * comps + c) * bpc
          if (bpc == 8) data((rowOff + bitPos / 8).toInt) & 0xFF
          else if (bpc == 16) data((rowOff + bitPos / 8).toInt) & 0xFF
          else {
            val b = data((rowOff + bitPos / 8).toInt) & 0xFF
            val shift = 8 - bpc - (bitPos % 8).toInt
            (b >> shift) & maxVal
          }
        }
        val rgb = cs match {
          case Rgb =>
            def to8(s: Int): Int =
              if (bpc == 8 || bpc == 16) s else s * 255 / maxVal
            (to8(sample(0)) << 16) | (to8(sample(1)) << 8) | to8(sample(2))
          case Indexed(pal) =>
            val i = sample(0) * 3
            if (i + 2 < pal.length)
              ((pal(i) & 0xFF) << 16) | ((pal(i + 1) & 0xFF) << 8) |
                (pal(i + 2) & 0xFF)
            else 0
          case Gray =>
            val s = sample(0)
            // sample() already projects 16-bit data to its high byte
            val sMax = if (bpc == 16) 255 else maxVal
            val v = decode match {
              case Some((d0, d1)) =>
                val t = d0 + s.toDouble * (d1 - d0) / sMax
                math.max(0, math.min(255, math.round(t * 255).toInt))
              case None =>
                if (bpc == 8 || bpc == 16) s else s * 255 / sMax
            }
            (v << 16) | (v << 8) | v
        }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", bos)) return None
    Some(bos.toByteArray)
  }

  private val imagesUdf = org.apache.spark.sql.functions.udf {
    (b: Array[Byte]) =>
      images(b).map(i => (i.page, i.name, i.width, i.height, i.format,
        i.bytes))
  }

  /** `array<struct<page,name,width,height,format,content>>` of the
    * document's embedded images, for `explode` composition into the
    * image-dedup kernels.
    */
  def imagesCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    imagesUdf(bytesCol)
}
