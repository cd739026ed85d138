package graft.engine.read

import java.io.{BufferedInputStream, InputStream}
import java.net.URI
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.SerializableConfiguration

/** WARC (ISO 28500) / WET crawl archive source — the canonical input of
  * a web-scale training-data pipeline (Common Crawl publishes ~100 TB
  * per monthly snapshot in exactly this format). Pure-JVM streaming
  * parser, no archive library: a WARC file is a sequence of records
  *
  * {{{
  * WARC/1.0<CRLF>
  * Name: value<CRLF> ...            (continuation lines begin SP/HT)
  * <CRLF>
  * <Content-Length bytes of payload>
  * <CRLF><CRLF>
  * }}}
  *
  * Reference scope: the reference ingests pre-extracted files
  * (`ingestors/base.py:328-412` walks CSV/JSON/image trees); a crawl
  * container format is beyond-reference surface, same family as the
  * media probes.
  *
  * Parser stance (mirrors [[graft.engine.validate.AudioProbe]]: crawl
  * data lies, machine-framing does not):
  *   - framing errors in a COMPLETE line (bad version line, header
  *     without ':', missing/malformed Content-Length) fail loud with
  *     the stream offset — a corrupt archive must not silently drop
  *     records;
  *   - EOF truncation is data, not a bug: a payload cut short is
  *     emitted with `truncated=true`; a record cut mid-header (no
  *     blank-line terminator yet) is dropped silently — every byte
  *     prefix of a valid file parses to a prefix of its records
  *     (WarcSpec fuzzes exactly this);
  *   - payloads longer than `maxPayloadBytes` are clamped (flagged
  *     `truncated`) and the remainder skipped, keeping the stream in
  *     frame — a pathological 2 GB record cannot OOM an executor;
  *   - gzip is detected by magic bytes, not filename, and multi-member
  *     archives (Common Crawl gzips each record separately so byte
  *     ranges stay seekable) decompress as one stream.
  *
  * Scale shape: one task per FILE — a .warc.gz is unsplittable
  * (whole-stream gzip) and Common Crawl sizes segments ~1 GB
  * precisely so file-granularity is the parallel unit; at 100 TB that
  * is ~100k files spread over the cluster by round-robin repartition
  * of the path list (never the bytes). Payload bytes stream through
  * `mapPartitions` one record at a time — no whole-file buffering, no
  * driver collect.
  */
object Warc {

  /** One parsed record. `headers` preserves file order and duplicate
    * keys; lookups are case-insensitive per spec.
    */
  final case class Record(
      recordIndex: Long,
      offset: Long,
      version: String,
      headers: Seq[(String, String)],
      payload: Array[Byte],
      truncated: Boolean) {

    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }

    def warcType: String = header("WARC-Type").getOrElse("")
    def recordId: Option[String] = header("WARC-Record-ID")
    def targetUri: Option[String] = header("WARC-Target-URI")
    def warcDate: Option[String] = header("WARC-Date")
    def contentType: Option[String] = header("Content-Type")

    /** Integrity verdict against `WARC-Block-Digest` (the spec's
      * `sha1:BASE32` labelled digest, the form Common Crawl writes;
      * `sha256:HEX` also accepted): Some(true/false) when the header
      * is present and the algorithm known, None otherwise — including
      * truncated payloads, whose digest CANNOT match and would report
      * a false corruption verdict for what is length damage.
      */
    def blockDigestOk: Option[Boolean] = {
      if (truncated) return None
      header("WARC-Block-Digest").flatMap { v =>
        val i = v.indexOf(':')
        if (i <= 0) None
        else {
          val (algo, want) = (v.substring(0, i).toLowerCase.trim,
            v.substring(i + 1).trim)
          algo match {
            case "sha1" =>
              val got = java.security.MessageDigest.getInstance("SHA-1")
                .digest(payload)
              Some(Warc.base32(got).equalsIgnoreCase(want) ||
                got.map("%02x".format(_)).mkString.equalsIgnoreCase(want))
            case "sha256" =>
              val got = java.security.MessageDigest.getInstance("SHA-256")
                .digest(payload)
              Some(got.map("%02x".format(_)).mkString
                .equalsIgnoreCase(want))
            case _ => None // unknown algorithm: no verdict, not false
          }
        }
      }
    }
  }

  /** RFC 4648 base32 (no padding needed: SHA-1's 160 bits divide
    * evenly) — the alphabet WARC block digests use.
    */
  private[engine] def base32(bytes: Array[Byte]): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder((bytes.length * 8 + 4) / 5)
    var buf = 0L
    var bits = 0
    var i = 0
    while (i < bytes.length) {
      buf = (buf << 8) | (bytes(i) & 0xffL)
      bits += 8
      while (bits >= 5) {
        sb.append(alpha.charAt(((buf >> (bits - 5)) & 0x1f).toInt))
        bits -= 5
      }
      i += 1
    }
    if (bits > 0) sb.append(alpha.charAt(((buf << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  // ---------------------------------------------------------------- //
  //  Streaming record iterator                                        //
  // ---------------------------------------------------------------- //

  /** Input wrapper tracking the (decompressed) byte offset — error
    * messages and record provenance both want it.
    */
  private final class Counted(in: InputStream) {
    var pos: Long = 0L
    def read(): Int = {
      val b = in.read()
      if (b >= 0) pos += 1
      b
    }
    /** Read up to n bytes; short only at EOF. */
    def readN(buf: Array[Byte], n: Int): Int = {
      var got = 0
      var eof = false
      while (got < n && !eof) {
        val r = in.read(buf, got, n - got)
        if (r < 0) eof = true else got += r
      }
      pos += got
      got
    }
    def skipN(n: Long): Long = {
      var left = n
      var eof = false
      while (left > 0 && !eof) {
        val r = in.skip(left)
        if (r > 0) { pos += r; left -= r }
        else {
          // skip() may legally return 0 without EOF; disambiguate
          val b = in.read()
          if (b < 0) eof = true else { pos += 1; left -= 1 }
        }
      }
      n - left
    }
  }

  /** A header/version line: bytes up to `\n` (CR stripped), plus
    * whether the newline was actually seen (false ⇒ EOF-terminated,
    * i.e. a truncated tail, never a framing error).
    */
  private final case class Line(text: String, complete: Boolean,
                                empty: Boolean)

  private def readLine(in: Counted): Option[Line] = {
    val buf = new ArrayBuffer[Byte](96)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') { buf += b.toByte; b = in.read() }
    val complete = b == '\n'
    var n = buf.length
    if (n > 0 && buf(n - 1) == '\r') n -= 1
    val text = new String(buf.toArray, 0, n, StandardCharsets.UTF_8)
    Some(Line(text, complete, n == 0))
  }

  private def bad(pos: Long, msg: String): Nothing =
    throw new IllegalArgumentException(
      s"malformed WARC at byte $pos: $msg")

  /** Stream records out of `in` (takes ownership; closes on
    * exhaustion). See the object doc for the truncation/failure
    * contract.
    */
  def records(in: InputStream,
              maxPayloadBytes: Int = DefaultMaxPayloadBytes)
  : Iterator[Record] = {
    require(maxPayloadBytes > 0, "maxPayloadBytes must be positive")
    val cin = new Counted(in)
    var index = 0L
    var finished = false

    def nextRecord(): Option[Record] = {
      if (finished) return None
      // 1. skip inter-record blank lines (the \r\n\r\n trailer of the
      //    previous record, plus any lenient extras)
      var line: Option[Line] = readLine(cin)
      while (line.exists(l => l.empty && l.complete)) line = readLine(cin)
      line match {
        case None =>
          finished = true; in.close(); None
        case Some(l) if !l.complete =>
          // EOF inside the version line (or a final stray fragment):
          // truncated tail, drop silently
          finished = true; in.close(); None
        case Some(l) if !l.text.startsWith("WARC/") =>
          bad(cin.pos, s"expected version line, got '${l.text.take(40)}'")
        case Some(l) =>
          val offset = cin.pos - l.text.length - 2 // best-effort (CRLF)
          val version = l.text
          // 2. headers until blank line
          val hdrs = ArrayBuffer.empty[(String, String)]
          var done = false
          while (!done) {
            readLine(cin) match {
              case None => finished = true; in.close(); return None
              case Some(h) if !h.complete =>
                finished = true; in.close(); return None
              case Some(h) if h.empty => done = true
              case Some(h) if h.text.charAt(0) == ' ' ||
                  h.text.charAt(0) == '\t' =>
                if (hdrs.isEmpty)
                  bad(cin.pos, "continuation line before any header")
                val (k, v) = hdrs.last
                hdrs(hdrs.length - 1) = (k, v + " " + h.text.trim)
              case Some(h) =>
                val i = h.text.indexOf(':')
                if (i <= 0) bad(cin.pos, s"header without ':': '${h.text.take(40)}'")
                hdrs += ((h.text.substring(0, i).trim,
                  h.text.substring(i + 1).trim))
            }
          }
          // 3. Content-Length is the framing — required
          val lenStr = hdrs.collectFirst {
            case (k, v) if k.equalsIgnoreCase("Content-Length") => v
          }.getOrElse(bad(cin.pos, "record without Content-Length"))
          val len =
            try java.lang.Long.parseLong(lenStr)
            catch { case _: NumberFormatException =>
              bad(cin.pos, s"unparseable Content-Length '$lenStr'") }
          if (len < 0) bad(cin.pos, s"negative Content-Length $len")
          // 4. payload, clamped to maxPayloadBytes but kept in frame
          val want = math.min(len, maxPayloadBytes.toLong).toInt
          val buf = new Array[Byte](want)
          val got = cin.readN(buf, want)
          var truncated = got < len
          if (got < want) { // EOF inside payload
            finished = true
            in.close()
          } else if (len > want) { // clamp: skip the tail, stay framed
            val skipped = cin.skipN(len - want)
            if (skipped < len - want) { finished = true; in.close() }
          }
          val payload = if (got == buf.length) buf else buf.take(got)
          val rec = Record(index, offset, version, hdrs.toSeq, payload,
            truncated)
          index += 1
          Some(rec)
      }
    }

    new Iterator[Record] {
      private var nextR: Option[Record] = null
      private def advance(): Unit = if (nextR == null) nextR = nextRecord()
      def hasNext: Boolean = { advance(); nextR.isDefined }
      def next(): Record = {
        advance()
        val r = nextR.getOrElse(throw new NoSuchElementException)
        nextR = null
        r
      }
    }
  }

  val DefaultMaxPayloadBytes: Int = 16 << 20

  /** Compression by content, not filename. Detected formats:
    *
    *  - gzip (`1f 8b`): multi-member streams (Common Crawl's
    *    per-record members) via GZIPInputStream's built-in member
    *    concatenation;
    *  - zstandard (`28 b5 2f fd`): concatenated frames via
    *    ZstdInputStream's frame loop (the per-record-frame layout of
    *    `.warc.zst`);
    *  - a LEADING zstd SKIPPABLE frame (`5? 2a 4d 18`, RFC 8878 §3.1.2)
    *    is read as an embedded DICTIONARY and loaded before the data
    *    frames — the Common Crawl `.warc.zst` convention (their spec
    *    stores the dict, optionally itself zstd-compressed, in the
    *    first skippable frame so the archive is self-contained).
    *
    * Anything else streams through untouched.
    */
  def maybeGunzip(raw: InputStream): InputStream = {
    val buf = new BufferedInputStream(raw, 1 << 16)
    buf.mark(4)
    val b0 = buf.read(); val b1 = buf.read()
    val b2 = buf.read(); val b3 = buf.read()
    buf.reset()
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(buf, 1 << 16)
    else if (b0 == 0x28 && b1 == 0xb5 && b2 == 0x2f && b3 == 0xfd) {
      val z = new com.github.luben.zstd.ZstdInputStream(buf)
      z.setContinuous(true)
      z
    } else if ((b0 & 0xf0) == 0x50 && b1 == 0x2a && b2 == 0x4d &&
      b3 == 0x18) {
      // skippable frame first: magic 0x184D2A5? LE, then 4-byte LE size
      val head = new Array[Byte](8)
      var got = 0
      while (got < 8) {
        val n = buf.read(head, got, 8 - got)
        require(n > 0, "truncated zstd skippable frame header")
        got += n
      }
      val size = (head(4) & 0xff) | ((head(5) & 0xff) << 8) |
        ((head(6) & 0xff) << 16) | ((head(7) & 0xff) << 24)
      require(size >= 0 && size <= (128 << 20),
        s"zstd skippable-frame dictionary size out of range: $size")
      val dictRaw = new Array[Byte](size)
      got = 0
      while (got < size) {
        val n = buf.read(dictRaw, got, size - got)
        require(n > 0, "truncated zstd skippable-frame dictionary")
        got += n
      }
      // the embedded dict may itself be zstd-compressed (CC convention)
      val dict =
        if (dictRaw.length >= 4 && (dictRaw(0) & 0xff) == 0x28 &&
          (dictRaw(1) & 0xff) == 0xb5 && (dictRaw(2) & 0xff) == 0x2f &&
          (dictRaw(3) & 0xff) == 0xfd) {
          val sz = com.github.luben.zstd.Zstd.getFrameContentSize(dictRaw)
          require(sz > 0 && sz <= (128 << 20),
            s"embedded zstd dictionary declares bad size: $sz")
          com.github.luben.zstd.Zstd.decompress(dictRaw, sz.toInt)
        } else dictRaw
      val z = new com.github.luben.zstd.ZstdInputStream(buf)
      z.setContinuous(true)
      z.setDict(dict)
      z
    } else buf
  }

  // ---------------------------------------------------------------- //
  //  HTTP payload split (response records carry raw HTTP messages)    //
  // ---------------------------------------------------------------- //

  final case class Http(status: Int, headers: Seq[(String, String)],
                        body: Array[Byte],
                        undecodedCoding: Option[String] = None) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    def contentType: Option[String] = header("Content-Type")
  }

  /** Split a raw HTTP message into status/headers/body. Returns None
    * when the payload is not an HTTP message (no loud failure here:
    * response payloads are CONTENT, and crawl content lies). With
    * `decodeBody = true` (the content-consumer default) chunked
    * transfer framing AND the `Content-Encoding` chain are decoded —
    * crawlers store the wire bytes, so both survive into archives;
    * truncated streams yield the bytes present. Pass
    * `decodeBody = false` for the STORED body bytes untouched — what
    * digest conventions hash ([[graft.engine.read.Cdx.toCdxj]]) and
    * all a head-only parse needs.
    */
  def splitHttp(payload: Array[Byte],
                decodeBody: Boolean = true): Option[Http] = {
    if (payload == null) return None
    // header/body boundary: first \r\n\r\n or \n\n, whichever earlier
    var crlf = -1; var lf = -1
    var i = 0
    while ((crlf < 0 || lf < 0) && i < payload.length - 1) {
      if (crlf < 0 && i < payload.length - 3 && payload(i) == '\r' &&
          payload(i + 1) == '\n' && payload(i + 2) == '\r' &&
          payload(i + 3) == '\n') crlf = i
      if (lf < 0 && payload(i) == '\n' && payload(i + 1) == '\n') lf = i
      i += 1
    }
    val (hdrEnd, bodyStart) =
      if (crlf >= 0 && (lf < 0 || crlf <= lf)) (crlf, crlf + 4)
      else if (lf >= 0) (lf, lf + 2)
      else (payload.length, payload.length)
    val head = new String(payload, 0, hdrEnd, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    val statusParts = lines(0).split(" +", 3)
    if (statusParts.length < 2) return None
    val status =
      try statusParts(1).toInt catch { case _: NumberFormatException => return None }
    val hdrs = ArrayBuffer.empty[(String, String)]
    var j = 1
    while (j < lines.length) {
      val ln = lines(j)
      if (ln.nonEmpty && (ln.charAt(0) == ' ' || ln.charAt(0) == '\t')) {
        if (hdrs.nonEmpty) {
          val (k, v) = hdrs.last
          hdrs(hdrs.length - 1) = (k, v + " " + ln.trim)
        }
      } else {
        val c = ln.indexOf(':')
        if (c > 0) hdrs += ((ln.substring(0, c).trim, ln.substring(c + 1).trim))
      }
      j += 1
    }
    var body =
      if (bodyStart >= payload.length) Array.empty[Byte]
      else java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)
    if (decodeBody) {
      val chunked = hdrs.exists { case (k, v) =>
        k.equalsIgnoreCase("Transfer-Encoding") &&
          v.toLowerCase.contains("chunked")
      }
      if (chunked) body = dechunk(body)
      // content codings apply INSIDE the transfer coding: dechunk
      // first, then peel the Content-Encoding stack (last-applied
      // first). Content-Encoding is a LIST field — repeated header
      // lines concatenate into one chain (RFC 9110 §5.3)
      val codings = hdrs.collect {
        case (k, v) if k.equalsIgnoreCase("Content-Encoding") => v
      }
      if (codings.nonEmpty) {
        val (decoded, stopped) =
          decodeContentCodingsFlagged(body, codings.mkString(","))
        body = decoded
        return Some(Http(status, hdrs.toSeq, body, stopped))
      }
    }
    Some(Http(status, hdrs.toSeq, body))
  }

  /** Peel a `Content-Encoding` chain off an HTTP body — real archives
    * store WIRE bytes, and most of the web serves compressed: without
    * this every `Content-Encoding: gzip` page reaches text extraction
    * as binary salad. Codings decode last-listed-first (RFC 9110
    * §8.4): `gzip`/`x-gzip` (truncation-tolerant — a cut-off download
    * yields the bytes present), `deflate` (zlib-wrapped per spec,
    * with the raw-stream fallback every browser grew for the servers
    * that send it bare), `zstd` (zstd-jni rides Spark's own
    * classpath), `identity`/blank (no-op). `br` (brotli) has no
    * pure-JVM decoder here — the chain STOPS, leaving remaining bytes
    * untouched rather than guessing (the charset decoder then
    * replaces them: visible damage, never silent wrong text).
    * Decoded output is capped at `maxBytes`
    * ([[DefaultMaxDecodedBytes]]): a 16 MB gzip bomb expands ~1000:1,
    * and a lying zstd frame header would otherwise force a multi-GB
    * allocation - either is one poisoned record killing an executor.
    * The cap TRUNCATES (bytes present kept, the torn-download
    * posture); it never throws.
    */
  val DefaultMaxDecodedBytes: Int = 128 << 20

  private[read] def decodeContentCodings(
      body0: Array[Byte], codings: String,
      maxBytes: Int = DefaultMaxDecodedBytes): Array[Byte] =
    decodeContentCodingsFlagged(body0, codings, maxBytes)._1

  /** [[decodeContentCodings]] plus the coding that STOPPED the chain
    * (None when every coding decoded): the flag downstream curation
    * needs to drop `br`/unknown-coding bodies for pennies instead of
    * catching their mojibake in quality gates.
    */
  private[read] def decodeContentCodingsFlagged(
      body0: Array[Byte], codings: String,
      maxBytes: Int = DefaultMaxDecodedBytes): (Array[Byte], Option[String]) = {
    var body = body0
    val stack = codings.split(",").map(_.trim.toLowerCase)
      .filter(_.nonEmpty).reverse
    var i = 0
    var ok = true
    var stopped: Option[String] = None
    while (ok && i < stack.length) {
      stack(i) match {
        case "identity" => ()
        case "gzip" | "x-gzip" => body = gunzipTolerant(body, maxBytes)
        case "deflate" => body = inflateTolerant(body, maxBytes)
        case "zstd" =>
          // always streamed with the cap - the frame header's declared
          // content size is attacker-controlled and must never size an
          // allocation. Magic-gated: a real zstd frame gets the
          // torn-download posture (bytes decoded so far kept, like
          // gzip/deflate); a body that is not zstd at byte 0 stops the
          // chain with its bytes untouched. A legal stream may LEAD
          // with a skippable frame (RFC 8878 §3.1.2, little-endian
          // magic 0x184D2A50..0x184D2A5F — ZstdInputStream skips them
          // natively), so that magic range also counts as "is zstd".
          val isZstdFrame = body.length >= 4 &&
            (((body(0) & 0xff) == 0x28 && (body(1) & 0xff) == 0xB5 &&
              (body(2) & 0xff) == 0x2F && (body(3) & 0xff) == 0xFD) ||
             ((body(0) & 0xf0) == 0x50 && (body(1) & 0xff) == 0x2A &&
              (body(2) & 0xff) == 0x4D && (body(3) & 0xff) == 0x18))
          if (!isZstdFrame) { ok = false; stopped = Some(stack(i)) }
          else body = try {
            val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
              new java.io.ByteArrayInputStream(body))
            try readCapped(in, maxBytes) finally in.close()
          } catch {
            // the magic said zstd: whatever decoded IS the content
            // (a frame torn inside its first block decodes to
            // nothing — empty, never the compressed bytes as "text")
            case _: Exception => Array.empty[Byte]
          }
        case other => // br or unknown: stop, never guess
          ok = false; stopped = Some(other)
      }
      i += 1
    }
    (body, stopped)
  }

  /** Capped stream copy, keeping the bytes read so far when the
    * stream dies mid-flight (the torn-download posture every coding
    * here shares). The FIRST read failing still surfaces (caller
    * decides whether the coding applied at all).
    */
  private def readCapped(in: java.io.InputStream, cap: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf) // a body that never decodes throws HERE
    try {
      while (n >= 0 && out.size() < cap) {
        out.write(buf, 0, math.min(n, cap - out.size()))
        n = if (out.size() < cap) in.read(buf) else -1
      }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  /** Gunzip emitting the bytes present on truncation/corruption -
    * crawls are full of cut-off downloads; the page head is still
    * text worth keeping. Input that is not gzip AT BYTE 0 returns
    * as-is; a VALID gzip of an empty body returns empty (the 20-byte
    * wrapper must never surface as "text"); output truncates at
    * `maxBytes` (bomb containment).
    */
  private[read] def gunzipTolerant(
      body: Array[Byte],
      maxBytes: Int = DefaultMaxDecodedBytes): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var headerOk = false
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(body))
      headerOk = true // constructor read + verified the member header
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0 && out.size() < maxBytes) {
        out.write(buf, 0, math.min(n, maxBytes - out.size()))
        n = if (out.size() < maxBytes) in.read(buf) else -1
      }
    } catch { case _: java.io.IOException => () }
    if (headerOk) out.toByteArray else body
  }

  /** RFC 1950 zlib inflate with the raw-deflate (RFC 1951) fallback -
    * the "deflate" coding officially means zlib-wrapped, but a
    * long-lived population of servers sends raw streams; browsers
    * accept both, so archives contain both. Mid-stream corruption
    * keeps the bytes already inflated (the [[gunzipTolerant]]
    * posture); output truncates at `maxBytes`.
    */
  private[read] def inflateTolerant(
      body: Array[Byte],
      maxBytes: Int = DefaultMaxDecodedBytes): Array[Byte] = {
    def tryInflate(nowrap: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(nowrap)
      val out = new java.io.ByteArrayOutputStream()
      try {
        // feed input in SMALL chunks: a whole-buffer setInput would
        // let one inflate() call consume the stream AND hit the
        // trailing checksum error before returning any output — the
        // readable head must already be in `out` when damage throws.
        // INFLATE-FIRST ordering: needsInput() can be true while
        // window output is still derivable (zlib buffers the tail
        // bits mid-match-copy), so exhausted input must never end the
        // loop before a final inflate() drains what is pending
        val buf = new Array[Byte](8192)
        var off = 0
        var done = false
        while (!done && out.size() < maxBytes) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, math.min(n, maxBytes - out.size()))
          else if (inf.finished() || inf.needsDictionary()) done = true
          else if (inf.needsInput()) {
            if (off >= body.length) done = true
            else {
              // small feed quantum: the rescue only works when clean
              // input chunks complete BEFORE the damaged one throws
              val len = math.min(1024, body.length - off)
              inf.setInput(body, off, len)
              off += len
            }
          } else done = true
        }
        // a COMPLETED stream is valid even when empty; an incomplete
        // one that produced nothing is "not this wrapping"
        if (inf.finished() || out.size() > 0) Some(out.toByteArray)
        else None
      } catch {
        // mid-stream damage: the readable head is still the page
        case _: java.util.zip.DataFormatException =>
          if (out.size() > 0) Some(out.toByteArray) else None
      } finally inf.end()
    }
    tryInflate(false).orElse(tryInflate(true)).getOrElse(body)
  }

  /** Decode HTTP/1.1 chunked framing: `<hex-size>[;ext]\r\n data \r\n`
    * repeated, `0`-size terminates. Truncation-tolerant: emits the
    * bytes present and stops at the first frame that does not parse.
    */
  private[read] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](body.length)
    var p = 0
    var ok = true
    while (ok && p < body.length) {
      // read the size line
      var e = p
      while (e < body.length && body(e) != '\n') e += 1
      if (e >= body.length) ok = false
      else {
        var lineEnd = e
        if (lineEnd > p && body(lineEnd - 1) == '\r') lineEnd -= 1
        val sizeStr = new String(body, p, lineEnd - p,
          StandardCharsets.ISO_8859_1).split(";")(0).trim
        val size =
          try java.lang.Long.parseLong(sizeStr, 16)
          catch { case _: NumberFormatException => ok = false; -1L }
        if (!ok || size < 0) ok = false
        else if (size == 0) { p = body.length; } // terminator (+trailers)
        else {
          val start = e + 1
          val take = math.min(size, (body.length - start).toLong).toInt
          if (take > 0) out ++= java.util.Arrays.copyOfRange(body, start,
            start + take)
          if (take < size) ok = false // truncated chunk: stop
          else {
            p = start + take
            // consume the trailing CRLF of the chunk
            if (p < body.length && body(p) == '\r') p += 1
            if (p < body.length && body(p) == '\n') p += 1
          }
        }
      }
    }
    out.toArray
  }

  /** Decode content bytes to text with the WHATWG encoding-sniffing
    * precedence (the algorithm browsers — and therefore the web's
    * actual bytes — are written against):
    *
    *  1. a **byte-order mark** (UTF-8 / UTF-16LE / UTF-16BE) wins over
    *     everything, header included (WHATWG Encoding §4.2);
    *  2. the transport-layer `charset=` parameter of `contentType`;
    *  3. the **meta prescan** of the first 1024 bytes
    *     (`<meta charset=…>` / `<meta http-equiv=content-type
    *     content="…charset=…">`) — the branch that matters at crawl
    *     scale: a large share of pages declare their encoding ONLY in
    *     the markup, and defaulting them to UTF-8 turns every legacy
    *     cp1252/gbk/shift-jis page into mojibake before the text
    *     pipeline ever sees it;
    *  4. UTF-8.
    *
    * Unknown/hostile charset names fall through to the next source.
    * Decoding never throws (REPLACE on malformed/unmappable): crawl
    * content declares charsets that do not exist.
    */
  def decodeText(bytes: Array[Byte], contentType: String): String = {
    if (bytes == null) return null
    def named(name: String): Option[Charset] = {
      // CharsetRe's group keeps the quotes, BOTH kinds — strip both
      // (a single-quoted header parameter is legal and common)
      val t = name.trim
        .stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'")
      try Some(Charset.forName(t)) catch { case _: Exception => None }
    }
    def fromHeader: Option[Charset] =
      CharsetRe.findFirstMatchIn(
        if (contentType == null) "" else contentType)
        .flatMap(m => named(m.group(1)))
    // the meta prescan is an HTML rule: apply it to (x)html and to
    // UNKNOWN content types only — a JSON body quoting markup
    // (`"<meta charset=…>"` in a tutorial snippet) must not hijack
    // the decode of a declared non-HTML type
    val htmlish = contentType == null || contentType.trim.isEmpty || {
      val lower = contentType.toLowerCase(java.util.Locale.ROOT)
      lower.contains("html") || lower.contains("xml")
    }
    val cs: Charset = bomCharset(bytes)
      .orElse(fromHeader)
      .orElse(if (htmlish) metaPrescan(bytes).flatMap(named) else None)
      .getOrElse(StandardCharsets.UTF_8)
    // a BOM is a marker, not content — skip it so the decoded text
    // does not lead with U+FEFF
    val skip = bomLength(bytes)
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, skip, bytes.length - skip))
      .toString
  }

  private def bomCharset(b: Array[Byte]): Option[Charset] =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte) Some(StandardCharsets.UTF_8)
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      Some(StandardCharsets.UTF_16BE)
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      Some(StandardCharsets.UTF_16LE)
    else None

  private def bomLength(b: Array[Byte]): Int =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte) 3
    else if (b.length >= 2 && ((b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) ||
        (b(0) == 0xFF.toByte && b(1) == 0xFE.toByte))) 2
    else 0

  /** The WHATWG "prescan the byte stream" simplification: the first
    * 1024 bytes read as latin-1 (charset names are ASCII, and latin-1
    * maps bytes 1:1 so offsets survive), HTML comments dropped, then
    * each `<meta …>` tag's ATTRIBUTES tokenized (quoted values
    * consumed whole — `charset=` inside an unrelated attribute VALUE,
    * e.g. a description mentioning charsets, is never mistaken for
    * the attribute; attribute ORDER is irrelevant, as in the spec's
    * own algorithm). A `charset` attribute wins; else an
    * `http-equiv=content-type` meta's `content` value is searched for
    * its `charset=` parameter. Returns the declared NAME — the caller
    * resolves it, falling through on junk. `x-user-defined` and
    * UTF-16 meta declarations mean "the page lies" — WHATWG maps both
    * cases away from what they claim; we map them to windows-1252 /
    * UTF-8 respectively per the spec's notes.
    */
  private[read] def metaPrescan(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length == 0) return None
    val n = math.min(bytes.length, 1024)
    // closed comments drop; an UNCLOSED `<!--` swallows the rest of
    // the window (WHATWG consumes to end-of-input) — a commented-out
    // meta whose closer lies past the prescan bound declares nothing
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
      .replaceAll("(?s)<!--.*?-->", " ")
      .replaceAll("(?s)<!--.*$", " ")
    def unquote(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
          (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t.stripSuffix("/")
    }
    for (tag <- MetaTagRe.findAllIn(head)) {
      // first occurrence of an attribute wins (the HTML parsing rule)
      var attrs = Map.empty[String, String]
      for (m <- AttrRe.findAllMatchIn(tag)) {
        val k = m.group(1).toLowerCase(java.util.Locale.ROOT)
        if (!attrs.contains(k)) attrs += (k -> unquote(m.group(2)))
      }
      val declared = attrs.get("charset").map(_.trim).filter(_.nonEmpty)
        .orElse {
          if (attrs.get("http-equiv")
              .exists(_.equalsIgnoreCase("content-type")))
            attrs.get("content").flatMap(c =>
              CharsetRe.findFirstMatchIn(c).map(m2 => unquote(m2.group(1))))
              .map(_.trim).filter(_.nonEmpty)
          else None
        }
      declared.foreach { raw =>
        val lower = raw.toLowerCase(java.util.Locale.ROOT)
        // WHATWG: a meta-declared utf-16 is processed as utf-8 (the
        // prescan itself proves the document is ASCII-compatible);
        // x-user-defined maps to windows-1252
        return Some(
          if (lower.startsWith("utf-16")) "UTF-8"
          else if (lower == "x-user-defined") "windows-1252"
          else raw)
      }
    }
    None
  }

  private val CharsetRe =
    """(?i)charset\s*=\s*("[^"]+"|'[^']+'|[^;\s>]+)""".r

  // a meta tag runs to its first UNQUOTED '>': quoted attribute
  // values may legally contain one (WHATWG consumes values whole)
  private val MetaTagRe =
    """(?is)<meta[\s/](?:"[^"]*"|'[^']*'|[^>"'])*""".r

  private val AttrRe =
    """([a-zA-Z][a-zA-Z0-9-]*)\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""".r

  // ---------------------------------------------------------------- //
  //  Spark face                                                       //
  // ---------------------------------------------------------------- //

  /** Flat row shape of [[scan]] — WARC named fields promoted to
    * columns, full header list kept as a map-ish array for the rare
    * consumer that needs `WARC-Concurrent-To` etc.
    */
  final case class ScanRow(
      src_file: String, record_index: Long, offset: Long,
      warc_type: String, record_id: String, target_uri: String,
      warc_date: String, content_type: String, content_length: Long,
      truncated: Boolean, digest_ok: Option[Boolean],
      payload: Array[Byte])

  /** Distributed WARC scan: `pathGlob` lists distributedly (binaryFile
    * source, content column never requested ⇒ never read), paths
    * round-robin over the cluster, each file streamed record-by-record
    * on its executor. Output one row per record; `payload` holds the
    * raw record block (HTTP message for response records — see
    * [[httpColumns]] / [[toDocuments]]).
    */
  /** Executor-side path → record rows (shared by batch and streaming
    * faces).
    */
  private def parsePaths(conf: SerializableConfiguration,
                         maxPayloadBytes: Int)
  : Iterator[String] => Iterator[ScanRow] = { it =>
    it.flatMap { p =>
      val path = new Path(new URI(p))
      val fs = path.getFileSystem(conf.value)
      val in = maybeGunzip(fs.open(path))
      records(in, maxPayloadBytes).map { r =>
        ScanRow(p, r.recordIndex, r.offset, r.warcType,
          r.recordId.orNull, r.targetUri.orNull,
          r.warcDate.orNull, r.contentType.orNull,
          r.payload.length.toLong, r.truncated, r.blockDigestOk,
          r.payload)
      }
    }
  }

  def scan(spark: SparkSession, pathGlob: String,
           maxPayloadBytes: Int = DefaultMaxPayloadBytes): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    val paths = spark.read.format("binaryFile").load(pathGlob)
      .select("path").as[String]
    paths
      .repartition(par)
      .mapPartitions(parsePaths(conf, maxPayloadBytes))
      .toDF()
  }

  /** Streaming WARC source: watch a landing directory for crawl
    * archives, emit one row per record as files arrive — the
    * continuous-ingest face of [[scan]], for pipelines where a crawler
    * dumps segments nonstop. Built on the binaryFile FILE STREAM
    * source, so exactly-once file pickup rides the stream checkpoint;
    * only the `path` column is requested, so file CONTENT is never
    * materialized by the source — bytes stream through the same
    * per-file parser, one task per file.
    * `maxFilesPerTrigger` is the backpressure knob (a backlogged zone
    * drains in bounded microbatches); compose with
    * [[toDocuments]] + `StreamingIngest.curateSink` for crawl-to-corpus
    * as one continuous program.
    */
  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Int = 100,
             maxPayloadBytes: Int = DefaultMaxPayloadBytes): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // the binaryFile source's fixed schema, stated explicitly (stream
    // sources don't infer); content is pruned away by the select below
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select("path").as[String]
      .mapPartitions(parsePaths(conf, maxPayloadBytes))
      .toDF()
  }

  /** HTTP columns for response records: ONE parse per row (a struct-
    * returning kernel, fields projected out) — status, declared
    * content type, and the body decoded per its charset. Non-HTTP
    * payloads yield a null struct. Loop-dominated per-row byte kernel
    * ⇒ UDF by the repo's documented precedent (MinHash et al.).
    */
  def httpStruct: Column = {
    val f = udf { payload: Array[Byte] =>
      splitHttp(payload).map { h =>
        (h.status, h.contentType.orNull,
          decodeText(h.body, h.contentType.orNull),
          h.undecodedCoding.orNull)
      }
    }
    f(col("payload")).as("http")
  }

  /** Status + declared content type ONLY — the head-only parse for
    * consumers that never need the body text (CDX generation): skips
    * the charset decode AND the body transfer/content decoding that
    * [[httpStruct]] pays (`decodeBody = false` — gunzipping a whole
    * corpus to read status lines would be a silent full-decompression
    * pass).
    */
  def httpHeadStruct: Column = {
    val f = udf { payload: Array[Byte] =>
      splitHttp(payload, decodeBody = false)
        .map(h => (h.status, h.contentType.orNull))
    }
    f(col("payload")).as("http_head")
  }

  /** Crawl archive → documents frame, the bridge into the curation
    * pipeline: conversion/resource records (WET) decode payload text
    * directly; response records split HTTP and extract visible text
    * from HTML bodies via [[graft.ops.TextAnalysis.htmlToText]].
    * Output: `(doc_id, url, fetch_ts, source, text,
    * undecoded_encoding)` — the last carries the `Content-Encoding`
    * coding (e.g. `br`) whose decode the chain could not perform, so
    * pipelines drop those rows by FLAG for pennies instead of paying
    * quality gates to catch the mojibake; NULL when the body decoded
    * clean (always NULL on the WET path — conversion records store
    * extracted text, not wire bytes).
    */
  def toDocuments(scanned: DataFrame): DataFrame = {
    val wet = scanned
      .filter(col("warc_type").isin("conversion", "resource") &&
        col("content_type").startsWith("text/"))
      .select(col("record_id").as("doc_id"), col("target_uri").as("url"),
        to_timestamp(col("warc_date")).as("fetch_ts"),
        col("src_file").as("source"),
        decodeTextCol(col("payload"), col("content_type")).as("text"),
        lit(null).cast("string").as("undecoded_encoding"))
    val http = scanned
      .filter(col("warc_type") === "response" &&
        coalesce(col("content_type"), lit(""))
          .startsWith("application/http"))
      .select(col("record_id"), col("target_uri"), col("warc_date"),
        col("src_file"), httpStruct)
      .filter(col("http").isNotNull && col("http._1") === 200 &&
        coalesce(col("http._2"), lit("")).contains("html"))
      .select(col("record_id").as("doc_id"), col("target_uri").as("url"),
        to_timestamp(col("warc_date")).as("fetch_ts"),
        col("src_file").as("source"),
        graft.ops.TextAnalysis.htmlToText(col("http._3")).as("text"),
        col("http._4").as("undecoded_encoding"))
    wet.unionByName(http)
  }

  /** [[decodeText]] as a column (same kernel). */
  def decodeTextCol(payload: Column, contentType: Column): Column = {
    val f = udf { (b: Array[Byte], ct: String) => decodeText(b, ct) }
    f(payload, contentType)
  }
}
