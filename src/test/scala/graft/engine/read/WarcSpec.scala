package graft.engine.read

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** WARC parser contract: framing, truncation tolerance (every byte
  * prefix parses to a record prefix), payload clamping that keeps the
  * stream in frame, multi-member gzip, HTTP split incl. chunked
  * decoding and charset handling, and the distributed scan.
  */
class WarcSpec extends SparkSpec {

  private def rec(tpe: String, id: String, payload: Array[Byte],
                  extra: Seq[(String, String)] = Nil,
                  contentLength: Option[Long] = None): Array[Byte] = {
    val hdrs = Seq(
      "WARC-Type" -> tpe, "WARC-Record-ID" -> s"<urn:uuid:$id>",
      "WARC-Date" -> "2026-08-14T06:00:00Z") ++ extra ++
      Seq("Content-Length" ->
        contentLength.getOrElse(payload.length.toLong).toString)
    val head = ("WARC/1.0" +: hdrs.map { case (k, v) => s"$k: $v" })
      .mkString("", "\r\n", "\r\n\r\n").getBytes(ISO_8859_1)
    head ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  private val httpHtml: Array[Byte] =
    ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      "Server: test\r\n\r\n" +
      "<html><body><p>Hello &amp; welcome</p></body></html>")
      .getBytes(UTF_8)

  private val wetText = "Plain  extracted text.\nSecond line."
  private val fileBytes: Array[Byte] =
    rec("warcinfo", "aaa", "software: graft-test\r\n".getBytes(ISO_8859_1),
      extra = Seq("Content-Type" -> "application/warc-fields")) ++
      rec("response", "bbb", httpHtml,
        extra = Seq(
          "WARC-Target-URI" -> "http://example.com/a",
          "Content-Type" -> "application/http; msgtype=response")) ++
      rec("conversion", "ccc", wetText.getBytes(UTF_8),
        extra = Seq(
          "WARC-Target-URI" -> "http://example.com/a",
          "Content-Type" -> "text/plain"))

  private def parse(bytes: Array[Byte], cap: Int = Warc.DefaultMaxPayloadBytes) =
    Warc.records(new ByteArrayInputStream(bytes), cap).toVector

  test("canonical multi-record file parses fully") {
    val rs = parse(fileBytes)
    assert(rs.map(_.warcType) == Vector("warcinfo", "response", "conversion"))
    assert(rs.map(_.recordIndex) == Vector(0L, 1L, 2L))
    assert(rs(1).targetUri.contains("http://example.com/a"))
    assert(rs(1).payload.sameElements(httpHtml))
    assert(rs.forall(!_.truncated))
    assert(new String(rs(2).payload, UTF_8) == wetText)
    // offsets increase and point inside the stream
    assert(rs.map(_.offset) == rs.map(_.offset).sorted)
  }

  test("header lookup is case-insensitive; continuation lines fold") {
    val payload = "x".getBytes(ISO_8859_1)
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: metadata\r\n" +
      "X-Long: part one\r\n" +
      "   part two\r\n" +
      "content-length: 1\r\n\r\n").getBytes(ISO_8859_1) ++ payload
    val rs = parse(raw)
    assert(rs.size == 1)
    assert(rs(0).header("x-long").contains("part one part two"))
    assert(rs(0).header("CONTENT-LENGTH").contains("1"))
  }

  test("every byte prefix parses to a prefix of the records, no throw") {
    val full = parse(fileBytes)
    (0 to fileBytes.length).foreach { n =>
      val rs = parse(fileBytes.take(n))
      assert(rs.size <= full.size, s"prefix $n over-produced")
      // complete (untruncated) records must match the full parse
      rs.zip(full).foreach { case (a, b) =>
        assert(a.warcType == b.warcType, s"prefix $n type drift")
        if (!a.truncated)
          assert(a.payload.sameElements(b.payload), s"prefix $n payload drift")
        else
          assert(a.payload.length <= b.payload.length)
      }
    }
  }

  test("payload cap clamps, flags truncated, and stays in frame") {
    val rs = parse(fileBytes, cap = 10)
    assert(rs.size == 3) // later records still parse — stream stayed framed
    assert(rs.forall(_.truncated))
    assert(rs.forall(_.payload.length == 10))
    assert(rs(1).payload.sameElements(httpHtml.take(10)))
  }

  test("declared length overrunning the file truncates the last record") {
    val raw = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 1000\r\n\r\nabc").getBytes(ISO_8859_1)
    val rs = parse(raw)
    assert(rs.size == 1 && rs(0).truncated)
    assert(new String(rs(0).payload, ISO_8859_1) == "abc")
  }

  test("framing errors in complete lines fail loud with offset") {
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n")
      .getBytes(ISO_8859_1)
    val e1 = intercept[IllegalArgumentException](parse(noLen))
    assert(e1.getMessage.contains("Content-Length"))
    val badVersion = "NOPE/1.0\r\n\r\n".getBytes(ISO_8859_1)
    val e2 = intercept[IllegalArgumentException](parse(badVersion))
    assert(e2.getMessage.contains("version"))
    val badHeader = ("WARC/1.0\r\nno colon here\r\n\r\n").getBytes(ISO_8859_1)
    val e3 = intercept[IllegalArgumentException](parse(badHeader))
    assert(e3.getMessage.contains(":"))
    val badLen = ("WARC/1.0\r\nContent-Length: xyz\r\n\r\n").getBytes(ISO_8859_1)
    assert(intercept[IllegalArgumentException](parse(badLen))
      .getMessage.contains("Content-Length"))
  }

  test("base32 matches the RFC 4648 test vectors") {
    def b32(s: String) = Warc.base32(s.getBytes(ISO_8859_1))
    assert(b32("") == "")
    assert(b32("f") == "MY")         // RFC pads "MY======"; digesting
    assert(b32("fo") == "MZXQ")      // never needs padding, so the
    assert(b32("foo") == "MZXW6")    // data characters alone are the
    assert(b32("foob") == "MZXW6YQ") // contract here
    assert(b32("fooba") == "MZXW6YTB")
    assert(b32("foobar") == "MZXW6YTBOI")
  }

  test("blockDigestOk: sha1 base32/hex, sha256 hex, corrupt, unknown") {
    val payload = "integrity matters".getBytes(ISO_8859_1)
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
      .digest(payload)
    val sha1hex = sha1.map("%02x".format(_)).mkString
    val sha256hex = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    def recWith(digest: String) = parse(rec("resource", "d", payload,
      extra = Seq("WARC-Block-Digest" -> digest))).head
    assert(recWith(s"sha1:${Warc.base32(sha1)}").blockDigestOk
      .contains(true))
    assert(recWith(s"SHA1:$sha1hex").blockDigestOk.contains(true))
    assert(recWith(s"sha256:$sha256hex").blockDigestOk.contains(true))
    assert(recWith("sha1:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA")
      .blockDigestOk.contains(false))
    assert(recWith("md5:abc").blockDigestOk.isEmpty)   // unknown algo
    assert(recWith("garbage").blockDigestOk.isEmpty)   // no label
    // absent header → no verdict
    assert(parse(rec("resource", "d", payload)).head.blockDigestOk.isEmpty)
    // truncated payload → no verdict even with a digest present
    val truncated = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      s"WARC-Block-Digest: sha1:$sha1hex\r\n" +
      "Content-Length: 999\r\n\r\nabc").getBytes(ISO_8859_1)
    assert(parse(truncated).head.blockDigestOk.isEmpty)
  }

  test("gzip by magic bytes; multi-member members concatenate") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    // Common Crawl shape: each record its own gzip member, concatenated
    val members = gz(rec("metadata", "m1", "one".getBytes(ISO_8859_1))) ++
      gz(rec("metadata", "m2", "two".getBytes(ISO_8859_1)))
    val rs = Warc.records(Warc.maybeGunzip(
      new ByteArrayInputStream(members))).toVector
    assert(rs.map(r => new String(r.payload, ISO_8859_1)) ==
      Vector("one", "two"))
    // plain bytes pass through untouched
    val plain = Warc.records(Warc.maybeGunzip(
      new ByteArrayInputStream(fileBytes))).toVector
    assert(plain.size == 3)
  }

  test("zstd by magic bytes: frames concatenate; skippable-frame dict loads") {
    import com.github.luben.zstd.Zstd
    def frame(b: Array[Byte]): Array[Byte] = Zstd.compress(b, 3)
    // per-record-frame layout of .warc.zst
    val frames = frame(rec("metadata", "z1", "uno".getBytes(ISO_8859_1))) ++
      frame(rec("metadata", "z2", "dos".getBytes(ISO_8859_1)))
    val rs = Warc.records(Warc.maybeGunzip(
      new ByteArrayInputStream(frames))).toVector
    assert(rs.map(r => new String(r.payload, ISO_8859_1)) ==
      Vector("uno", "dos"))

    // Common Crawl convention: leading skippable frame carries the
    // dictionary (raw bytes), data frames compressed against it
    val dict = ("this is a raw content dictionary with warc-ish " +
      "material WARC/1.0 Content-Length metadata").getBytes(ISO_8859_1)
    def skippable(content: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x50, 0x2a, 0x4d, 0x18).map(_.toByte)) // 0x184D2A50 LE
      val n = content.length
      out.write(Array(n & 0xff, (n >> 8) & 0xff, (n >> 16) & 0xff,
        (n >> 24) & 0xff).map(_.toByte))
      out.write(content)
      out.toByteArray
    }
    def dictFrame(b: Array[Byte]): Array[Byte] = {
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try { ctx.setLevel(3); ctx.loadDict(dict); ctx.compress(b) }
      finally ctx.close()
    }
    val zstFile = skippable(dict) ++
      dictFrame(rec("metadata", "d1", "tre".getBytes(ISO_8859_1))) ++
      dictFrame(rec("metadata", "d2", "cuatro".getBytes(ISO_8859_1)))
    val ds = Warc.records(Warc.maybeGunzip(
      new ByteArrayInputStream(zstFile))).toVector
    assert(ds.map(r => new String(r.payload, ISO_8859_1)) ==
      Vector("tre", "cuatro"))

    // dict itself zstd-compressed inside the skippable frame (the CC
    // spec's optional form)
    val zstFile2 = skippable(Zstd.compress(dict, 3)) ++
      dictFrame(rec("metadata", "d3", "cinco".getBytes(ISO_8859_1)))
    val ds2 = Warc.records(Warc.maybeGunzip(
      new ByteArrayInputStream(zstFile2))).toVector
    assert(ds2.map(r => new String(r.payload, ISO_8859_1)) == Vector("cinco"))
  }

  test("splitHttp: status, headers, body; non-HTTP payload is None") {
    val h = Warc.splitHttp(httpHtml).get
    assert(h.status == 200)
    assert(h.contentType.contains("text/html; charset=UTF-8"))
    assert(new String(h.body, UTF_8).startsWith("<html>"))
    assert(Warc.splitHttp("just text".getBytes(UTF_8)).isEmpty)
    assert(Warc.splitHttp(Array.empty[Byte]).isEmpty)
    assert(Warc.splitHttp(null).isEmpty)
  }

  test("splitHttp decodes chunked transfer encoding") {
    val msg = ("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "4\r\nWiki\r\n6\r\npedia \r\nB;ext=1\r\nin chunks.\n\r\n0\r\n\r\n")
      .getBytes(ISO_8859_1)
    val h = Warc.splitHttp(msg).get
    assert(new String(h.body, ISO_8859_1) == "Wikipedia in chunks.\n")
    // truncated mid-chunk: bytes present are returned, no throw
    val cut = msg.take(msg.length - 12)
    val hc = Warc.splitHttp(cut).get
    assert(new String(hc.body, ISO_8859_1).startsWith("Wikipedia"))
  }

  test("decodeText honors declared charset, never throws") {
    val latin = "café".getBytes(ISO_8859_1)
    assert(Warc.decodeText(latin, "text/html; charset=ISO-8859-1") == "café")
    assert(Warc.decodeText(latin, "text/html; charset=\"iso-8859-1\"") == "café")
    // bogus charset falls back to UTF-8 with replacement
    val s = Warc.decodeText(latin, "text/html; charset=nonsense-9")
    assert(s.contains("caf"))
    assert(Warc.decodeText("ok".getBytes(UTF_8), null) == "ok")
    assert(Warc.decodeText(null, "text/plain") == null)
  }

  test("decodeText: WHATWG sniffing — BOM beats header, meta prescan beats the UTF-8 default") {
    // BOM wins over a LYING header, and is stripped from the text
    val bomUtf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "naïve".getBytes(UTF_8)
    assert(Warc.decodeText(bomUtf8, "text/html; charset=ISO-8859-1") ==
      "naïve")
    val bomBe = Array(0xFE, 0xFF).map(_.toByte) ++
      "é".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    assert(Warc.decodeText(bomBe, "text/plain; charset=utf-8") == "é")
    // a header-less legacy page declaring its encoding ONLY in markup
    // (the crawl-scale case): both meta forms
    val metaA = ("<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>café</body></html>").getBytes(ISO_8859_1)
    assert(Warc.decodeText(metaA, "text/html").contains("café"))
    val metaB = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head>" +
      "<body>crème brûlée</body></html>").getBytes(ISO_8859_1)
    assert(Warc.decodeText(metaB, null).contains("crème brûlée"))
    // the transport header still BEATS the meta declaration
    val lyingMeta = ("<meta charset=\"utf-8\"><body>café</body>")
      .getBytes(ISO_8859_1)
    assert(Warc.decodeText(lyingMeta,
      "text/html; charset=iso-8859-1").contains("café"))
    // a meta-declared utf-16 is processed as utf-8 (WHATWG: the
    // prescan finding it proves the bytes are ASCII-compatible)
    val lie16 = "<meta charset=\"utf-16\"><body>plain ascii</body>"
      .getBytes(UTF_8)
    assert(Warc.decodeText(lie16, null).contains("plain ascii"))
    // junk meta charset falls through to UTF-8, never throws
    val junk = "<meta charset=\"not-a-charset\"><body>ok body</body>"
      .getBytes(UTF_8)
    assert(Warc.decodeText(junk, null).contains("ok body"))
    // the prescan window is 1024 bytes: a declaration past it is
    // ignored (spec behavior, pinned so the bound is deliberate)
    val far = (" " * 1100 + "<meta charset=\"iso-8859-1\">café")
      .getBytes(ISO_8859_1)
    assert(!Warc.decodeText(far, null).contains("café")) // é replaced
  }

  test("splitHttp: Content-Encoding gzip/deflate/zstd bodies decode; br stops untouched") {
    def gzBytes(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def msg(enc: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Encoding: $enc\r\n\r\n").getBytes(ISO_8859_1) ++ body
    val html = "<html><body>compressed page body</body></html>"
    // gzip — the web's default
    val g = Warc.splitHttp(msg("gzip", gzBytes(html.getBytes(UTF_8)))).get
    assert(new String(g.body, UTF_8) == html)
    // zlib-wrapped deflate (the spec meaning)
    val zlibOut = {
      val d = new java.util.zip.Deflater()
      d.setInput(html.getBytes(UTF_8)); d.finish()
      val buf = new Array[Byte](4096)
      java.util.Arrays.copyOf(buf, d.deflate(buf))
    }
    assert(new String(Warc.splitHttp(msg("deflate", zlibOut)).get.body,
      UTF_8) == html)
    // raw deflate (the server population browsers grew a fallback for)
    val rawOut = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(html.getBytes(UTF_8)); d.finish()
      val buf = new Array[Byte](4096)
      java.util.Arrays.copyOf(buf, d.deflate(buf))
    }
    assert(new String(Warc.splitHttp(msg("deflate", rawOut)).get.body,
      UTF_8) == html)
    // zstd via Spark's own zstd-jni
    val zst = com.github.luben.zstd.Zstd.compress(html.getBytes(UTF_8))
    assert(new String(Warc.splitHttp(msg("zstd", zst)).get.body,
      UTF_8) == html)
    // a legal zstd stream may LEAD with a skippable frame (RFC 8878
    // §3.1.2) — the magic gate must admit it, ZstdInputStream skips it
    val skipMeta = "skippable metadata".getBytes(UTF_8)
    val skipFrame = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x53, 0x2a, 0x4d, 0x18).map(_.toByte)) // 0x184D2A53 LE
      val n = skipMeta.length
      out.write(Array(n & 0xff, (n >> 8) & 0xff, (n >> 16) & 0xff,
        (n >> 24) & 0xff).map(_.toByte))
      out.write(skipMeta)
      out.toByteArray
    }
    assert(new String(Warc.splitHttp(msg("zstd", skipFrame ++ zst)).get.body,
      UTF_8) == html)
    // a chain decodes last-listed-first
    assert(new String(Warc.splitHttp(
      msg("identity, gzip", gzBytes(html.getBytes(UTF_8)))).get.body,
      UTF_8) == html)
    // br has no pure-JVM decoder: the chain stops, bytes untouched
    val brBody = Array[Byte](0x1b, 0x2c, 0x00, 0x04)
    assert(Warc.splitHttp(msg("br", brBody)).get.body.toSeq == brBody.toSeq)
    // a VALID gzip of an EMPTY body decodes to empty — the 20-byte
    // wrapper must never surface as "text"
    assert(Warc.splitHttp(msg("gzip", gzBytes(Array.empty[Byte])))
      .get.body.isEmpty)
    val emptyZlib = {
      val d = new java.util.zip.Deflater()
      d.setInput(Array.empty[Byte]); d.finish()
      val buf = new Array[Byte](64)
      java.util.Arrays.copyOf(buf, d.deflate(buf))
    }
    assert(Warc.splitHttp(msg("deflate", emptyZlib)).get.body.isEmpty)
    // truncated gzip keeps the bytes present (the page head survives)
    val full = gzBytes(("head text " * 200).getBytes(UTF_8))
    val cut = full.take(full.length / 2)
    val kept = Warc.splitHttp(msg("gzip", cut)).get.body
    assert(new String(kept, UTF_8).startsWith("head text "))
    // chunked + gzip together: transfer coding peels first
    def chunk(b: Array[Byte]): Array[Byte] =
      (Integer.toHexString(b.length) + "\r\n").getBytes(ISO_8859_1) ++ b ++
        "\r\n".getBytes(ISO_8859_1) ++ "0\r\n\r\n".getBytes(ISO_8859_1)
    val both = (s"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      s"Content-Encoding: gzip\r\n\r\n").getBytes(ISO_8859_1) ++
      chunk(gzBytes(html.getBytes(UTF_8)))
    assert(new String(Warc.splitHttp(both).get.body, UTF_8) == html)
  }

  test("meta prescan: attribute-order-insensitive, value-embedded and commented charsets ignored, non-HTML gated") {
    // reversed attribute order (content before http-equiv) — a
    // common real-web form the order-sensitive regex missed
    val reversed = ("<html><head><meta content=\"text/html; " +
      "charset=iso-8859-1\" http-equiv=\"Content-Type\"></head>" +
      "<body>voilà déjà</body></html>").getBytes(ISO_8859_1)
    assert(Warc.decodeText(reversed, "text/html").contains("voilà déjà"))
    // charset mentioned INSIDE an unrelated meta's content VALUE is
    // data, not a declaration
    val embedded = ("<meta name=\"description\" content=\"how to fix " +
      "charset=iso-2022-jp errors\"><body>naïve utf8 body</body>")
      .getBytes(UTF_8)
    assert(Warc.decodeText(embedded, "text/html").contains("naïve utf8 body"))
    // a commented-out meta declares nothing
    val commented = ("<!-- <meta charset=\"iso-8859-1\"> -->" +
      "<body>naïve comment case</body>").getBytes(UTF_8)
    assert(Warc.decodeText(commented, "text/html")
      .contains("naïve comment case"))
    // the prescan is an HTML rule: a declared JSON type quoting
    // markup keeps its UTF-8 default
    val json = """{"snippet": "<meta charset=\"iso-8859-1\">", "t": "naïve"}"""
      .getBytes(UTF_8)
    assert(Warc.decodeText(json, "application/json").contains("naïve"))
    // ... but an UNKNOWN content type still benefits from the prescan
    val unknownCt = ("<meta charset=\"iso-8859-1\"><body>café unknown</body>")
      .getBytes(ISO_8859_1)
    assert(Warc.decodeText(unknownCt, null).contains("café unknown"))
  }

  test("content codings: bombs truncate at the cap, repeated header fields chain, corrupt tails keep the head") {
    def gzBytes(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    // a 2 MB-of-zeros bomb against a 1000-byte cap: truncated, no throw
    val bomb = gzBytes(new Array[Byte](2 << 20))
    assert(Warc.decodeContentCodings(bomb, "gzip", maxBytes = 1000)
      .length == 1000)
    val zstBomb = com.github.luben.zstd.Zstd.compress(new Array[Byte](2 << 20))
    assert(Warc.decodeContentCodings(zstBomb, "zstd", maxBytes = 1000)
      .length == 1000)
    // repeated Content-Encoding header LINES form one chain
    val inner = "double coded body".getBytes(UTF_8)
    val doubled = gzBytes(gzBytes(inner))
    val msg = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes(ISO_8859_1) ++ doubled
    assert(new String(Warc.splitHttp(msg).get.body, UTF_8) ==
      "double coded body")
    // mid-stream zlib damage keeps the inflated head (the
    // gunzipTolerant posture). Incompressible content, so the
    // undamaged 3/4 of the stream carries real output (repetitive
    // text would compress to a few dozen bytes and leave no head)
    val rnd = new java.util.Random(42)
    val big = new Array[Byte](4000)
    rnd.nextBytes(big)
    val zlib = {
      val d = new java.util.zip.Deflater()
      d.setInput(big); d.finish()
      val buf = new Array[Byte](big.length + 1024)
      java.util.Arrays.copyOf(buf, d.deflate(buf))
    }
    val damaged = zlib.clone()
    for (i <- damaged.length * 3 / 4 until damaged.length)
      damaged(i) = (damaged(i) ^ 0x55).toByte
    // corrupt deflate may decode garbage PAST the damage point before
    // erroring — the guarantee is the readable HEAD survives, no throw
    val kept = Warc.inflateTolerant(damaged)
    assert(kept.length >= 1000 &&
      kept.take(1000).toSeq == big.take(1000).toSeq)
  }

  test("review regressions: raw-deflate tail drain, quoted charsets, quoted '>', unclosed comments, torn zstd") {
    // raw deflate of highly repetitive data: the final match copy is
    // derivable AFTER input exhausts — inflate-first must drain it
    // (the needsInput-first loop silently truncated to an 8K multiple)
    val rep = ("abcdefg " * 3085).getBytes(UTF_8) // 24680 bytes
    val raw = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(rep); d.finish()
      val buf = new Array[Byte](rep.length + 128)
      java.util.Arrays.copyOf(buf, d.deflate(buf))
    }
    assert(Warc.inflateTolerant(raw).toSeq == rep.toSeq)
    // single-quoted header charset parameter resolves
    val latin = "café".getBytes(ISO_8859_1)
    assert(Warc.decodeText(latin, "text/html; charset='iso-8859-1'") ==
      "café")
    // a quoted '>' inside an earlier attribute must not truncate the
    // meta tag before its charset attribute
    val gtMeta = ("<meta name=\"description\" content=\"a > b\" " +
      "charset=\"iso-8859-1\"><body>café gt case</body>")
      .getBytes(ISO_8859_1)
    assert(Warc.decodeText(gtMeta, "text/html").contains("café gt case"))
    // an UNCLOSED comment swallows the rest of the prescan window
    val unclosed = ("<!-- commented out <meta charset=\"iso-8859-1\"> " +
      "never closed <body>naïve unclosed</body>").getBytes(UTF_8)
    assert(Warc.decodeText(unclosed, "text/html").contains("naïve unclosed"))
    // a torn zstd body keeps the bytes decoded so far — content big
    // enough to span multiple 128K blocks so a decodable prefix
    // exists; and NEVER the compressed bytes as "text"
    val zrnd = new java.util.Random(7)
    val zbig = new Array[Byte](300000)
    zrnd.nextBytes(zbig)
    val full = com.github.luben.zstd.Zstd.compress(zbig)
    val torn = full.take(full.length * 2 / 3)
    val kept = Warc.decodeContentCodings(torn, "zstd")
    assert(kept.length >= 1000 &&
      kept.take(1000).toSeq == zbig.take(1000).toSeq)
    // torn inside the FIRST block: nothing decodable → empty, not
    // the compressed wrapper
    val small = com.github.luben.zstd.Zstd.compress(
      ("torn zstd head " * 400).getBytes(UTF_8))
    val tiny = small.take(small.length / 2)
    assert(Warc.decodeContentCodings(tiny, "zstd").isEmpty)
  }

  test("property: dechunk inverts every chunking; gzip/deflate codings round-trip any body") {
    import org.scalacheck.{Gen, Prop}
    val genBody = Gen.choose(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))
    // random positive chunk sizes consume the body left to right
    val genSizes = Gen.listOfN(12, Gen.choose(1, 400))
    def chunked(body: Array[Byte], sizes: List[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      var ss = sizes
      while (p < body.length) {
        val take = math.min(ss.headOption.getOrElse(97), body.length - p)
        ss = if (ss.isEmpty) ss else ss.tail
        out.write((Integer.toHexString(take) + "\r\n").getBytes(ISO_8859_1))
        out.write(body, p, take)
        out.write("\r\n".getBytes(ISO_8859_1))
        p += take
      }
      out.write("0\r\n\r\n".getBytes(ISO_8859_1))
      out.toByteArray
    }
    val dechunkProp = Prop.forAll(genBody, genSizes) { (body, sizes) =>
      Warc.dechunk(chunked(body, sizes)).toSeq == body.toSeq
    }
    val gzProp = Prop.forAll(genBody) { body =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(body); g.close()
      Warc.decodeContentCodings(bos.toByteArray, "gzip").toSeq == body.toSeq
    }
    val deflProp = Prop.forAll(genBody, Gen.oneOf(true, false)) {
      (body, raw) =>
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
        d.setInput(body); d.finish()
        val buf = new Array[Byte](body.length + 128)
        val enc = java.util.Arrays.copyOf(buf, d.deflate(buf))
        d.end()
        Warc.decodeContentCodings(enc, "deflate").toSeq == body.toSeq
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(80)
      .withInitialSeed(org.scalacheck.rng.Seed(0x51CA7EL))
    for ((name, p) <- Seq("dechunk" -> dechunkProp, "gzip" -> gzProp,
        "deflate" -> deflProp)) {
      val r = org.scalacheck.Test.check(params, p)
      assert(r.passed, s"$name: ${r.status}")
    }
  }

  test("stream: records flow as archive files land incrementally") {
    val dir = tmpDir("warcstream")
    java.nio.file.Files.write(dir.resolve("a.warc"), fileBytes)
    val q = Warc.stream(spark, dir.toString)
      .select("src_file", "record_index", "warc_type")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() == 3)
      // a second archive lands; only ITS records are new output
      java.nio.file.Files.write(dir.resolve("b.warc"),
        rec("metadata", "m9", "late".getBytes(ISO_8859_1)))
      q.processAllAvailable()
      val rows = spark.table("warc_stream")
        .groupBy("warc_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("warcinfo" -> 1L, "response" -> 1L,
        "conversion" -> 1L, "metadata" -> 1L))
    } finally q.stop()
  }

  test("scan streams records distributedly; toDocuments bridges text") {
    val dir = tmpDir("warcscan")
    java.nio.file.Files.write(dir.resolve("a.warc"), fileBytes)
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos); g.write(fileBytes); g.close()
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), bos.toByteArray)

    val scanned = Warc.scan(spark, dir.toString)
    assert(scanned.count() == 6) // 3 records × 2 files
    val types = scanned.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("warcinfo" -> 2L, "response" -> 2L,
      "conversion" -> 2L))

    val docs = Warc.toDocuments(scanned).orderBy("source", "doc_id")
    val rows = docs.collect()
    assert(rows.length == 4) // (conversion + response) × 2 files
    val texts = rows.map(_.getAs[String]("text")).toSet
    assert(texts.contains("Plain extracted text.\nSecond line.")
      || texts.exists(_.contains("Plain")))
    assert(texts.exists(_ == "Hello & welcome")) // htmlToText + entity
    assert(rows.forall(_.getAs[java.sql.Timestamp]("fetch_ts") != null))
  }
}
