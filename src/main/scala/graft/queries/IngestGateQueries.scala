package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ResolvedConfig, SqlType, TaskCategory}
import graft.engine.read.{CsvReader, JsonReader, StrictCast}
import graft.engine.transform.TransformPipeline

/** S1/S5 gate queries that drive the REAL ingest read path — the code
  * the engine exists for (`ingestors/csv_ingestor.py:282-454`,
  * `json_ingestor.py:19-56`, `base.py:328-412`) — against DuckDB's own
  * CSV/JSON readers on the same file. Every other gate query reads the
  * parquet testdata; these two put `CsvReader.open` + `JsonReader.open`
  * + `TransformPipeline` + `StrictCast` under the driver's hash check.
  *
  * Each query materializes a small deterministic adversarial file at a
  * FIXED path (the oracle SQL must name the same path) at
  * DataFrame-construction time — an eager, idempotent side effect like
  * k1's Derby run. The corpus mirrors the reference's adversarial
  * harness (`tests/test_adversarial_ingestion_harness.py:15-28`):
  * leading-zero codes, the 4-way null vocabulary, float-rendered and
  * scientific-notation ints, textual booleans, quoted
  * delimiters/escaped quotes, padded whitespace, and a blank data_id
  * row that P4 must drop.
  */
object IngestGateQueries {

  private val csvPath = "/tmp/graft_gate_s1.csv"
  private val jsonPath = "/tmp/graft_gate_s5.json"

  private val csvContent =
    """code,qty,price,flag,target,note,rid
      |007,1,1.50,true,cat,hello,r01
      |042,2.0,2.25,no,dog," a, quoted ",r02
      |ABC,3e2,0.75,1.0,cat,NA,r03
      | 008 ,4,10.00,0,dog,NULL,r04
      |X9,5,3.50,yes,,None,r05
      |00,6,2.00,f,cat,"  padded  ",r06
      |7,7.0,1.25,y, dog ,plain,r07
      |Q,8,0.50,FALSE,cat,"quote""d",r08
      |z1,9,9.99,t,dog,,r09
      |dropme,10,5.00,true,cat,gone,
      |""".stripMargin

  // Array-form JSON (the reference's primary shape); all values are
  // strings — the no-inference rule reads raw tokens either way. j02
  // (junk int) and j03 (junk float) must be SKIPPED by the JSON
  // disposition, never fatal (`json_ingestor.py:367-388`).
  private val jsonContent =
    """[{"sku": "A1", "qty": "10", "price": "1.5", "ok": "yes", "rid": "j01"},
      | {"sku": "B2", "qty": "junk", "price": "2.5", "ok": "no", "rid": "j02"},
      | {"sku": "C3", "qty": "30", "price": "bad", "ok": "true", "rid": "j03"},
      | {"sku": "D4", "qty": "4.0", "price": "4.25", "ok": "0", "rid": "j04"},
      | {"sku": "E5", "qty": "5e1", "price": "0.5", "ok": "1.0", "rid": "j05"},
      | {"sku": null, "qty": "6", "price": "6.5", "ok": "f", "rid": "j06"}]
      |""".stripMargin

  private def writeFixture(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    ()
  }

  // ---- S13/S14: WARC crawl-archive fixtures ------------------------
  // A plain .warc and a multi-member .warc.gz authored byte-by-byte
  // (the m7/m8 fixture pattern); expected columns derived from the SAME
  // authored parts — payload md5 via MessageDigest over the byte
  // arrays, document texts hand-traced through the published cascade —
  // never by calling the parser under test. WARC framing is not
  // ANSI-SQL-expressible, so the oracle replays the stored expectation
  // (DuckDB recomputes n_chars itself, cross-checking length
  // semantics).

  private val warcDir = "/tmp/graft_gate_s13_warc"
  private val warcExpectedDir = "/tmp/graft_gate_s13_expected"
  private val wetExpectedDir = "/tmp/graft_gate_s14_expected"

  private def warcRecord(tpe: String, id: String, date: String,
                         uri: Option[String], contentType: String,
                         payload: Array[Byte],
                         extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val iso = StandardCharsets.ISO_8859_1
    val hdrs = Seq("WARC-Type" -> tpe,
      "WARC-Record-ID" -> s"<urn:uuid:$id>", "WARC-Date" -> date) ++
      uri.map("WARC-Target-URI" -> _) ++ extra ++
      Seq("Content-Type" -> contentType,
        "Content-Length" -> payload.length.toString)
    ("WARC/1.0" +: hdrs.map { case (k, v) => s"$k: $v" })
      .mkString("", "\r\n", "\r\n\r\n").getBytes(iso) ++
      payload ++ "\r\n\r\n".getBytes(iso)
  }

  private def httpMsg(status: String, contentType: String,
                      body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status\r\nContent-Type: $contentType\r\n" +
      "Server: graft-fixture\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ body

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** Fixture-local RFC 4648 base32 (written independently of the
    * parser's encoder — WarcSpec pins that one against the RFC's own
    * vectors).
    */
  private def sha1b32(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(b)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val bits = d.flatMap(x => (7 to 0 by -1).map(i => (x >> i) & 1))
    bits.grouped(5).map(g =>
      alpha.charAt(g.foldLeft(0)((a, v) => (a << 1) | v))).mkString
  }

  private def writeWarcFixture(s: SparkSession): Unit = {
    import s.implicits._
    val utf8 = StandardCharsets.UTF_8
    val iso = StandardCharsets.ISO_8859_1
    // payloads (authored once; md5 + text expectations derive from
    // these same arrays)
    val pInfo = "software: graft-fixture\r\n".getBytes(iso)
    val htmlUtf8 =
      "<html><body><p>Hello &amp; welcome</p></body></html>".getBytes(utf8)
    val pR1 = httpMsg("200 OK", "text/html; charset=UTF-8", htmlUtf8)
    val wet1 = "First wet doc.\nLine two."
    val pC1 = wet1.getBytes(utf8)
    val htmlLatin =
      "<html><body><p>café menu</p></body></html>".getBytes(iso)
    val pR2 = httpMsg("200 OK", "text/html; charset=ISO-8859-1", htmlLatin)
    val wet2 = "Deuxième document."
    val pC2 = wet2.getBytes(utf8)
    val pR3 = httpMsg("404 Not Found", "text/html", "<html>gone</html>".getBytes(utf8))

    val aBytes =
      warcRecord("warcinfo", "w0", "2026-08-14T06:00:00Z", None,
        "application/warc-fields", pInfo) ++
        warcRecord("response", "r1", "2026-08-14T06:01:00Z",
          Some("http://example.com/one"),
          "application/http; msgtype=response", pR1,
          extra = Seq("WARC-Block-Digest" -> s"sha1:${sha1b32(pR1)}")) ++
        warcRecord("conversion", "c1", "2026-08-14T06:01:00Z",
          Some("http://example.com/one"), "text/plain", pC1,
          extra = Seq("WARC-Block-Digest" ->
            "sha1:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA")) ++
        warcRecord("response", "r2", "2026-08-14T06:02:00Z",
          Some("http://example.com/latin"),
          "application/http; msgtype=response", pR2)
    // Common Crawl member-per-record gzip shape
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    val bBytes =
      gz(warcRecord("conversion", "c2", "2026-08-14T07:00:00Z",
        Some("http://example.com/two"), "text/plain", pC2,
        extra = Seq("WARC-Block-Digest" -> ("sha256:" +
          java.security.MessageDigest.getInstance("SHA-256").digest(pC2)
            .map("%02x".format(_)).mkString)))) ++
        gz(warcRecord("response", "r3", "2026-08-14T07:01:00Z",
          Some("http://example.com/gone"),
          "application/http; msgtype=response", pR3))

    // .warc.zst, the Common Crawl zstandard shape: a leading skippable
    // frame carrying the dictionary, then one data frame per record
    // compressed against it
    val wet3 = "Tercer documento zstd."
    val pC3 = wet3.getBytes(utf8)
    val pR4 = httpMsg("200 OK", "text/html; charset=UTF-8",
      "<html><body><p>zstd page</p></body></html>".getBytes(utf8))
    val zDict = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: WARC-Target-URI: http://example.com/").getBytes(iso)
    def skippable(content: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x50, 0x2a, 0x4d, 0x18).map(_.toByte))
      val n = content.length
      out.write(Array(n & 0xff, (n >> 8) & 0xff, (n >> 16) & 0xff,
        (n >> 24) & 0xff).map(_.toByte))
      out.write(content)
      out.toByteArray
    }
    def zFrame(b: Array[Byte]): Array[Byte] = {
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try { ctx.setLevel(3); ctx.loadDict(zDict); ctx.compress(b) }
      finally ctx.close()
    }
    val cBytes = skippable(zDict) ++
      zFrame(warcRecord("conversion", "c3", "2026-08-14T08:00:00Z",
        Some("http://example.com/three"), "text/plain", pC3,
        extra = Seq("WARC-Block-Digest" -> s"sha1:${sha1b32(pC3)}"))) ++
      zFrame(warcRecord("response", "r4", "2026-08-14T08:01:00Z",
        Some("http://example.com/zpage"),
        "application/http; msgtype=response", pR4))

    val dir = java.nio.file.Paths.get(warcDir)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .foreach(java.nio.file.Files.delete)
    } else java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("a.warc"), aBytes)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), bBytes)
    java.nio.file.Files.write(dir.resolve("c.warc.zst"), cBytes)

    // s13 expected: one row per record, md5 from the authored arrays
    Seq(
      ("a.warc", 0L, "warcinfo", "<urn:uuid:w0>", null: String,
        pInfo.length.toLong, false, Option.empty[Boolean], md5hex(pInfo)),
      ("a.warc", 1L, "response", "<urn:uuid:r1>", "http://example.com/one",
        pR1.length.toLong, false, Some(true), md5hex(pR1)),
      ("a.warc", 2L, "conversion", "<urn:uuid:c1>", "http://example.com/one",
        pC1.length.toLong, false, Some(false), md5hex(pC1)),
      ("a.warc", 3L, "response", "<urn:uuid:r2>", "http://example.com/latin",
        pR2.length.toLong, false, Option.empty[Boolean], md5hex(pR2)),
      ("b.warc.gz", 0L, "conversion", "<urn:uuid:c2>",
        "http://example.com/two", pC2.length.toLong, false, Some(true),
        md5hex(pC2)),
      ("b.warc.gz", 1L, "response", "<urn:uuid:r3>",
        "http://example.com/gone", pR3.length.toLong, false,
        Option.empty[Boolean], md5hex(pR3)),
      ("c.warc.zst", 0L, "conversion", "<urn:uuid:c3>",
        "http://example.com/three", pC3.length.toLong, false, Some(true),
        md5hex(pC3)),
      ("c.warc.zst", 1L, "response", "<urn:uuid:r4>",
        "http://example.com/zpage", pR4.length.toLong, false,
        Option.empty[Boolean], md5hex(pR4)))
      .toDF("file", "record_index", "warc_type", "record_id",
        "target_uri", "content_length", "truncated", "digest_ok",
        "payload_md5")
      .coalesce(1).write.mode("overwrite").parquet(warcExpectedDir)

    // s14 expected: conversion text verbatim; response HTML traced by
    // hand through the htmlToText cascade (</p> → \n, tags → space,
    // &amp; → &, whitespace collapse+trim); r3 (404) must be absent.
    Seq(
      ("<urn:uuid:c1>", "http://example.com/one", "2026-08-14 06:01:00",
        "a.warc", wet1),
      ("<urn:uuid:r1>", "http://example.com/one", "2026-08-14 06:01:00",
        "a.warc", "Hello & welcome"),
      ("<urn:uuid:r2>", "http://example.com/latin", "2026-08-14 06:02:00",
        "a.warc", "café menu"),
      ("<urn:uuid:c2>", "http://example.com/two", "2026-08-14 07:00:00",
        "b.warc.gz", wet2),
      ("<urn:uuid:c3>", "http://example.com/three", "2026-08-14 08:00:00",
        "c.warc.zst", wet3),
      ("<urn:uuid:r4>", "http://example.com/zpage", "2026-08-14 08:01:00",
        "c.warc.zst", "zstd page"))
      .toDF("doc_id", "url", "fetch_s", "file", "text")
      .coalesce(1).write.mode("overwrite").parquet(wetExpectedDir)
    ()
  }

  // ---- S20: WHATWG charset sniffing fixture ------------------------
  private val s20WarcDir = "/tmp/graft_gate_s20_warc"
  private val s20ExpectedDir = "/tmp/graft_gate_s20_expected"

  private def writeS20Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val utf8 = StandardCharsets.UTF_8
    val iso = StandardCharsets.ISO_8859_1
    def html(body: String) =
      s"<html><head></head><body><p>$body</p></body></html>"
    // e1: UTF-8 BOM beats the LYING iso-8859-1 header (and is stripped)
    val p1 = httpMsg("200 OK", "text/html; charset=ISO-8859-1",
      Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
        html("naïve résumé page").getBytes(utf8))
    // e2: no header charset; <meta charset=...> names the legacy one
    val p2 = httpMsg("200 OK", "text/html",
      ("<html><head><meta charset=\"iso-8859-1\"></head>" +
        "<body><p>café crème déjà</p></body></html>").getBytes(iso))
    // e3: the http-equiv declaration form
    val p3 = httpMsg("200 OK", "text/html",
      ("<html><head><meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=iso-8859-1\"></head>" +
        "<body><p>señor año piñata</p></body></html>").getBytes(iso))
    // e4: nothing declared anywhere → UTF-8 default
    val p4 = httpMsg("200 OK", "text/html",
      html("plain utf8 页面 text").getBytes(utf8))
    // e5: the real-web composition — a gzip Content-Encoding body
    // whose decompressed markup declares a legacy charset in <meta>
    val gzBody = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(("<html><head><meta charset=\"iso-8859-1\"></head>" +
        "<body><p>gzipped émigré café</p></body></html>").getBytes(iso))
      g.close()
      bos.toByteArray
    }
    val p5 = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: gzip\r\nServer: graft-fixture\r\n\r\n")
      .getBytes(iso) ++ gzBody
    val bytes =
      warcRecord("response", "e1", "2026-08-15T09:00:00Z",
        Some("http://example.com/bom"),
        "application/http; msgtype=response", p1) ++
      warcRecord("response", "e2", "2026-08-15T09:01:00Z",
        Some("http://example.com/meta"),
        "application/http; msgtype=response", p2) ++
      warcRecord("response", "e3", "2026-08-15T09:02:00Z",
        Some("http://example.com/httpequiv"),
        "application/http; msgtype=response", p3) ++
      warcRecord("response", "e4", "2026-08-15T09:03:00Z",
        Some("http://example.com/default"),
        "application/http; msgtype=response", p4) ++
      warcRecord("response", "e5", "2026-08-15T09:04:00Z",
        Some("http://example.com/gzipped"),
        "application/http; msgtype=response", p5)
    val dir = java.nio.file.Paths.get(s20WarcDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("charset.warc"), bytes)
    // expected texts = the authored body literals (htmlToText strips
    // the markup; the BOM never reaches the text)
    Seq(
      ("<urn:uuid:e1>", "naïve résumé page"),
      ("<urn:uuid:e2>", "café crème déjà"),
      ("<urn:uuid:e3>", "señor año piñata"),
      ("<urn:uuid:e4>", "plain utf8 页面 text"),
      ("<urn:uuid:e5>", "gzipped émigré café"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s20ExpectedDir)
    ()
  }

  // ---- S22: the undecoded-Content-Encoding flag --------------------
  // br has no pure-JVM decoder here (the chain STOPS, by design —
  // COVERAGE.md records the skip); the bridge must FLAG such bodies so
  // pipelines drop them for pennies instead of paying quality gates
  // to catch the mojibake. One clean gzip page proves the flag is
  // NULL on the happy path; a br body, a gzip-then-br chain and an
  // unknown coding each surface the coding that stopped the chain.
  private val s22WarcDir = "/tmp/graft_gate_s22_warc"

  private def writeS22Fixture(s: SparkSession): Unit = {
    val iso = StandardCharsets.ISO_8859_1
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def encMsg(coding: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Encoding: $coding\r\n\r\n").getBytes(iso) ++ body
    val cleanHtml = "<html><body><p>clean gzip page</p></body></html>"
    // stand-in br bytes: NOT decodable, NOT ASCII — the flag is the
    // contract, the body stays wire bytes
    val brish = Array(0x1B, 0x9A, 0x02, 0x80, 0xC3, 0x28).map(_.toByte)
    val bytes =
      warcRecord("response", "u1", "2026-08-16T09:00:00Z",
        Some("http://example.com/clean"),
        "application/http; msgtype=response",
        encMsg("gzip", gz(cleanHtml.getBytes(StandardCharsets.UTF_8)))) ++
      warcRecord("response", "u2", "2026-08-16T09:01:00Z",
        Some("http://example.com/br"),
        "application/http; msgtype=response", encMsg("br", brish)) ++
      warcRecord("response", "u3", "2026-08-16T09:02:00Z",
        Some("http://example.com/gzbr"),
        "application/http; msgtype=response",
        encMsg("gzip, br", brish)) ++
      warcRecord("response", "u4", "2026-08-16T09:03:00Z",
        Some("http://example.com/unknown"),
        "application/http; msgtype=response",
        encMsg("x-snappy", "whatever".getBytes(iso)))
    val dir = java.nio.file.Paths.get(s22WarcDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("encodings.warc"), bytes)
    ()
  }

  // ---- S15/S16: CDX(J) index → selective WARC range fetch ----------
  // A member-per-record .warc.gz plus a plain .warc, and a CDXJ index
  // whose offsets/lengths are the REAL byte positions of the authored
  // members (computed from the same arrays that build the files —
  // never by running the code under test). Expected record identity
  // (md5 over the authored payloads) keyed by (file, offset) so the
  // oracle can parse the index itself, apply the same selection, and
  // join to ground truth.

  private val cdxWarcDir = "/tmp/graft_gate_s15_warc"
  private val cdxPath = "/tmp/graft_gate_s15.cdxj"
  private val cdxExpectedDir = "/tmp/graft_gate_s15_expected"
  private val cdxDocsExpectedDir = "/tmp/graft_gate_s16_expected"
  private val cdxWriteExpectedDir = "/tmp/graft_gate_s17_expected"
  private val cdxProduced = "/tmp/graft_gate_s17_produced.cdxj"

  private val s19WarcDir = "/tmp/graft_gate_s19_warc"
  private val s19Produced = "/tmp/graft_gate_s19_produced.cdxj"
  private val s19ExpectedDir = "/tmp/graft_gate_s19_expected"

  /** s19 fixture: two originals + two revisits. Original A STATES its
    * payload digest (the crawler-written shape); original B leaves it
    * for the indexer to compute from the HTTP body — the revisit
    * digests must match through both paths. Expected rows are derived
    * here from the authored bytes alone: revisit entries keep their
    * own capture identity (surt/ts/url/status) and take the
    * original's mime and byte range, so their fetched md5 IS the
    * original record's.
    */
  private def writeS19Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val utf8 = StandardCharsets.UTF_8
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    val bodyA = "<html><body>original capture A</body></html>".getBytes(utf8)
    val bodyB = "<html><body>a different page B</body></html>".getBytes(utf8)
    val pA = httpMsg("200 OK", "text/html; charset=UTF-8", bodyA)
    val pB = httpMsg("200 OK", "text/html", bodyB)
    val revisitPayload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "\r\n").getBytes(StandardCharsets.ISO_8859_1)
    val rA = warcRecord("response", "s19a", "2026-08-14T09:00:00Z",
      Some("http://example.com/page"), "application/http; msgtype=response",
      pA, extra = Seq("WARC-Payload-Digest" -> s"sha1:${sha1b32(bodyA)}"))
    val rB = warcRecord("response", "s19b", "2026-08-14T09:30:00Z",
      Some("http://example.com/other"), "application/http; msgtype=response",
      pB)
    val vA = warcRecord("revisit", "s19c", "2026-08-14T10:00:00Z",
      Some("http://example.com/page"), "application/http; msgtype=response",
      revisitPayload,
      extra = Seq("WARC-Payload-Digest" -> s"sha1:${sha1b32(bodyA)}",
        "WARC-Refers-To" -> "<urn:uuid:s19a>"))
    val vB = warcRecord("revisit", "s19d", "2026-08-14T11:00:00Z",
      Some("http://example.com/other"), "application/http; msgtype=response",
      revisitPayload,
      extra = Seq("WARC-Payload-Digest" -> s"sha1:${sha1b32(bodyB)}",
        "WARC-Refers-To" -> "<urn:uuid:s19b>"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s19WarcDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s19WarcDir, "crawl.warc.gz"),
      gz(rA) ++ gz(rB) ++ gz(vA) ++ gz(vB))
    Seq(
      ("com,example)/other", "20260814093000", "http://example.com/other",
        "text/html", 200, md5hex(pB)),
      ("com,example)/other", "20260814110000", "http://example.com/other",
        "text/html", 200, md5hex(pB)),
      ("com,example)/page", "20260814090000", "http://example.com/page",
        "text/html", 200, md5hex(pA)),
      ("com,example)/page", "20260814100000", "http://example.com/page",
        "text/html", 200, md5hex(pA)))
      .toDF("surt_key", "ts", "url", "mime", "status", "payload_md5")
      .coalesce(1).write.mode("overwrite").parquet(s19ExpectedDir)
  }

  private def writeCdxFixture(s: SparkSession): Unit = {
    import s.implicits._
    val utf8 = StandardCharsets.UTF_8
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString

    val d1Text = "Doc one from the index."
    val p1 = d1Text.getBytes(utf8)
    val html2 = "<html><body><p>Index &amp; fetch</p></body></html>".getBytes(utf8)
    val p2 = httpMsg("200 OK", "text/html; charset=UTF-8", html2)
    val p3 = "Doc three stays unselected.".getBytes(utf8)
    val d4Text = "Plain-range fetch works too."
    val p4 = d4Text.getBytes(utf8)
    val body5 = "<html>gone</html>".getBytes(utf8)
    val p5 = httpMsg("404 Not Found", "text/html", body5)

    val r1 = warcRecord("conversion", "d1", "2026-08-14T09:00:00Z",
      Some("http://example.com/idx1"), "text/plain", p1)
    val r2 = warcRecord("response", "d2", "2026-08-14T09:01:00Z",
      Some("http://example.com/idx2"),
      "application/http; msgtype=response", p2)
    val r3 = warcRecord("conversion", "d3", "2026-08-14T09:02:00Z",
      Some("http://example.com/idx3"), "text/plain", p3)
    val r4 = warcRecord("conversion", "d4", "2026-08-14T09:03:00Z",
      Some("http://example.com/idx4"), "text/plain", p4)
    val r5 = warcRecord("response", "d5", "2026-08-14T09:04:00Z",
      Some("http://example.com/idx5"),
      "application/http; msgtype=response", p5)

    // member-per-record gzip (the seekable Common Crawl shape)
    val (m1, m2, m3) = (gz(r1), gz(r2), gz(r3))
    val segDir = java.nio.file.Paths.get(cdxWarcDir, "seg")
    java.nio.file.Files.createDirectories(segDir)
    java.nio.file.Files.write(segDir.resolve("part1.warc.gz"), m1 ++ m2 ++ m3)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cdxWarcDir, "part2.warc"), r4 ++ r5)

    // CDXJ lines with the authored offsets; one malformed line that
    // the parse must DROP; filenames relative to the archive root
    def j(url: String, status: Int, mime: String, off: Long, len: Long,
          file: String, dg: String): String =
      s"""{"url": "$url", "mime": "$mime", "status": "$status", """ +
        s""""digest": "$dg", "length": "$len", "offset": "$off", """ +
        s""""filename": "$file"}"""
    val cdxLines = Seq(
      "com,example)/idx1 20260814090000 " +
        j("http://example.com/idx1", 200, "text/plain",
          0L, m1.length.toLong, "seg/part1.warc.gz", md5(p1)),
      "com,example)/idx2 20260814090100 " +
        j("http://example.com/idx2", 200, "text/html",
          m1.length.toLong, m2.length.toLong, "seg/part1.warc.gz", md5(p2)),
      "com,example)/idx3 20260814090200 " +
        j("http://example.com/idx3", 404, "text/plain",
          (m1.length + m2.length).toLong, m3.length.toLong,
          "seg/part1.warc.gz", md5(p3)),
      "com,example)/idx4 20260814090300 " +
        j("http://example.com/idx4", 200, "text/plain",
          0L, r4.length.toLong, "part2.warc", md5(p4)),
      "com,example)/idx5 20260814090400 " +
        j("http://example.com/idx5", 404, "text/html",
          r4.length.toLong, r5.length.toLong, "part2.warc", md5(p5)),
      "this line is not cdxj and must be dropped")
    java.nio.file.Files.write(java.nio.file.Paths.get(cdxPath),
      cdxLines.mkString("", "\n", "\n").getBytes(utf8))

    // ground truth keyed by (file, offset), from the authored arrays
    Seq(
      ("seg/part1.warc.gz", 0L, "<urn:uuid:d1>", "conversion",
        p1.length.toLong, md5(p1)),
      ("seg/part1.warc.gz", m1.length.toLong, "<urn:uuid:d2>", "response",
        p2.length.toLong, md5(p2)),
      ("seg/part1.warc.gz", (m1.length + m2.length).toLong,
        "<urn:uuid:d3>", "conversion", p3.length.toLong, md5(p3)),
      ("part2.warc", 0L, "<urn:uuid:d4>", "conversion",
        p4.length.toLong, md5(p4)),
      ("part2.warc", r4.length.toLong, "<urn:uuid:d5>", "response",
        p5.length.toLong, md5(p5)))
      .toDF("warc_file", "warc_offset", "record_id", "warc_type",
        "content_length", "payload_md5")
      .coalesce(1).write.mode("overwrite").parquet(cdxExpectedDir)

    // s17 expected: the CDXJ entries an index writer must derive from
    // the archive — surt/ts from the authored headers, status/mime
    // from the authored HTTP lines, pywb-convention payload digests
    // (sha1-base32 of the HTTP BODY for responses, of the block for
    // conversions — two captures of identical content then share a
    // digest, which revisit resolution joins on) and the authored
    // member/record byte ranges. ALL five records (the writer indexes
    // everything with a target URI; selection happens at read).
    Seq(
      ("com,example)/idx1", "20260814090000", "http://example.com/idx1",
        "text/plain", 200, sha1b32(p1), "seg/part1.warc.gz", 0L,
        m1.length.toLong),
      ("com,example)/idx2", "20260814090100", "http://example.com/idx2",
        "text/html", 200, sha1b32(html2), "seg/part1.warc.gz",
        m1.length.toLong, m2.length.toLong),
      ("com,example)/idx3", "20260814090200", "http://example.com/idx3",
        "text/plain", 200, sha1b32(p3), "seg/part1.warc.gz",
        (m1.length + m2.length).toLong, m3.length.toLong),
      ("com,example)/idx4", "20260814090300", "http://example.com/idx4",
        "text/plain", 200, sha1b32(p4), "part2.warc", 0L,
        r4.length.toLong),
      ("com,example)/idx5", "20260814090400", "http://example.com/idx5",
        "text/html", 404, sha1b32(body5), "part2.warc", r4.length.toLong,
        r5.length.toLong))
      .toDF("surt_key", "ts", "url", "mime", "status", "digest",
        "warc_file", "warc_offset", "warc_length")
      .coalesce(1).write.mode("overwrite").parquet(cdxWriteExpectedDir)

    // s16 expected documents: conversion text verbatim; the 200 html
    // response hand-traced through htmlToText (&amp; → &, tags → space,
    // collapse+trim). 404s and unselected entries absent.
    Seq(
      ("<urn:uuid:d1>", "http://example.com/idx1", "2026-08-14 09:00:00",
        d1Text),
      ("<urn:uuid:d2>", "http://example.com/idx2", "2026-08-14 09:01:00",
        "Index & fetch"),
      ("<urn:uuid:d4>", "http://example.com/idx4", "2026-08-14 09:03:00",
        d4Text))
      .toDF("doc_id", "url", "fetch_s", "text")
      .coalesce(1).write.mode("overwrite").parquet(cdxDocsExpectedDir)
    ()
  }

  /** Feature schema = declared schema minus the label/uid columns —
    * exactly `Ingestor.ingestLocked`'s projection.
    */
  private def featureSchema(cfg: ResolvedConfig): Seq[(String, SqlType)] =
    SqlType.parseSchema(cfg.schema) match {
      case Right(p) => p.filterNot { case (c, _) =>
        Set(cfg.labelColumn, cfg.annotationColumn, cfg.uniqueIdColumn)
          .flatten.contains(c)
      }
      case Left(errs) => throw new IllegalStateException(errs.mkString("; "))
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- S1: the full CSV path — preflights (UTF-8, dup-header, ragged)
    //    → single-parse scan → P1–P7 transform → strict-cast validation
    //    → typed frame. One row (blank rid) is dropped by P4. ----------
    "s1_csv_ingest" -> { (s, _) =>
      writeFixture(csvPath, csvContent)
      val cfg = ResolvedConfig(
        category = TaskCategory.TabularClassification,
        tableName = "s1_gate", intent = "train", dataFormat = "csv",
        sourcePath = csvPath,
        schema = Seq("code" -> "VARCHAR(10)", "qty" -> "INT",
          "price" -> "FLOAT", "flag" -> "BOOLEAN", "target" -> "VARCHAR(20)",
          "note" -> "VARCHAR(50)", "rid" -> "VARCHAR(10)"),
        labelColumn = Some("target"), uniqueIdColumn = Some("rid"))
      val manifest = CsvReader.open(s, csvPath, cfg.csvOptions) match {
        case Right(df) => df
        case Left(errs) => throw new IllegalStateException(errs.mkString("; "))
      }
      // open() already materialized its cache during preflight; the
      // fixture is tiny, so release it rather than strand a cache entry
      // across the 60-query Verify/Bench/Explain session.
      manifest.unpersist()
      val transformed = TransformPipeline(manifest, cfg, "run-s1")
      val typed = StrictCast(transformed, featureSchema(cfg)) match {
        case Right(df) => df
        case Left(report) =>
          throw new IllegalStateException(report.errors.mkString("; "))
      }
      typed.select(col("data_id"), col("label"), col("code"),
        col("qty").cast("long").as("qty"), col("price"), col("flag"),
        col("note"))
        .orderBy("data_id")
    },

    // -- S5: the JSON path — shape peek → no-inference scan → transform
    //    → per-record skip disposition (validRowFilter) → typed frame.
    //    j02/j03 carry junk typed values and must be absent. -----------
    "s5_json_ingest" -> { (s, _) =>
      writeFixture(jsonPath, jsonContent)
      val cfg = ResolvedConfig(
        category = TaskCategory.TabularClassification,
        tableName = "s5_gate", intent = "train", dataFormat = "json",
        sourcePath = jsonPath,
        schema = Seq("sku" -> "VARCHAR(10)", "qty" -> "INT",
          "price" -> "FLOAT", "ok" -> "BOOLEAN", "rid" -> "VARCHAR(10)"),
        uniqueIdColumn = Some("rid"))
      val columns = cfg.schema.map(_._1)
      val manifest = JsonReader.open(s, jsonPath, columns) match {
        case Right(df) => df
        case Left(errs) => throw new IllegalStateException(errs.mkString("; "))
      }
      val transformed = TransformPipeline(manifest, cfg, "run-s5")
      val schema = featureSchema(cfg)
      val survivors = transformed.filter(StrictCast.validRowFilter(schema))
      StrictCast.cast(survivors, schema)
        .select(col("data_id"), col("sku"),
          col("qty").cast("long").as("qty"), col("price"), col("ok"))
        .orderBy("data_id")
    },

    // -- S13: WARC crawl-archive scan — plain + multi-member-gzip
    //    files streamed record-by-record (framing, named headers,
    //    payload under an md5 witness). ------------------------------
    "s13_warc_scan" -> { (s, _) =>
      writeWarcFixture(s)
      graft.engine.read.Warc.scan(s, warcDir)
        .select(
          regexp_extract(col("src_file"), "([^/]+)$", 1).as("file"),
          col("record_index"), col("warc_type"), col("record_id"),
          col("target_uri"), col("content_length"), col("truncated"),
          col("digest_ok"), md5(col("payload")).as("payload_md5"))
        .orderBy("file", "record_index")
    },

    // -- S14: WARC → documents bridge — WET conversion text verbatim,
    //    HTTP 200 html responses split + charset-decoded + extracted
    //    (htmlToText), non-200 dropped. ------------------------------
    "s14_wet_documents" -> { (s, _) =>
      writeWarcFixture(s)
      val docs = graft.engine.read.Warc.toDocuments(
        graft.engine.read.Warc.scan(s, warcDir))
      docs.select(col("doc_id"), col("url"),
        date_format(col("fetch_ts"), "yyyy-MM-dd HH:mm:ss").as("fetch_s"),
        regexp_extract(col("source"), "([^/]+)$", 1).as("file"),
        col("text"), length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // -- S15: CDX(J) index → selective WARC byte-range fetch — parse
    //    the index distributedly, push the status filter down BEFORE
    //    any archive byte is read, then fetch exactly the selected
    //    members (seek+read, per-member gunzip) and prove record
    //    identity via payload md5 against the authored ground truth. --
    "s15_cdx_fetch" -> { (s, _) =>
      writeCdxFixture(s)
      val cdx = graft.engine.read.Cdx.readCdxj(s, cdxPath)
        .filter(col("status") === 200)
      val fetched = graft.engine.read.Cdx
        .fetch(cdx, base = cdxWarcDir)
        .select(col("src_file").as("warc_file"),
          col("offset").as("warc_offset"), col("record_id"),
          col("warc_type"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
      cdx.join(fetched, Seq("warc_file", "warc_offset"))
        .select(col("surt_key"), col("ts"), col("url"), col("status"),
          col("warc_file"), col("warc_offset"), col("record_id"),
          col("warc_type"), col("content_length"), col("payload_md5"),
          (col("payload_md5") === col("digest")).as("digest_match"))
        .orderBy("surt_key")
    },

    // -- S17: CDX index GENERATION — walk gzip members / plain record
    //    spans, derive surt/ts/status/mime/digest, write the sorted
    //    single-file CDXJ, and read it BACK through the same parser the
    //    fetch path trusts: every field must equal the authored truth. -
    "s17_cdx_write" -> { (s, _) =>
      writeCdxFixture(s)
      val scanned = graft.engine.read.Cdx.scanWithRanges(s,
        s"$cdxWarcDir/{seg/part1.warc.gz,part2.warc}")
      graft.engine.read.Cdx.writeCdxj(scanned, cdxProduced,
        base = cdxWarcDir)
      graft.engine.read.Cdx.readCdxj(s, cdxProduced)
        .select("surt_key", "ts", "url", "mime", "status", "digest",
          "warc_file", "warc_offset", "warc_length")
        .orderBy("surt_key")
    },

    // -- S18: WARC EXPORT round trip — curated docs written as
    //    member-per-record .warc.gz (block digests included), read
    //    back through the standard scan: content, identity, and the
    //    digest verdicts must match the source table exactly. --------
    // -- S19: REVISIT resolution round trip — a crawl archive with
    //    revisit records (crawl-time dedup: headers-only records whose
    //    WARC-Payload-Digest names the original capture's body digest)
    //    is indexed, the revisits re-pointed at the payload-bearing
    //    captures, and a fetch through the resolved index must return
    //    the ORIGINAL record's bytes for every revisit entry. One
    //    original states its payload digest, the other leaves it for
    //    the indexer to compute — the join must work through both. ---
    "s19_cdx_revisit" -> { (s, _) =>
      writeS19Fixture(s)
      val scanned = graft.engine.read.Cdx.scanWithRanges(s,
        s"$s19WarcDir/crawl.warc.gz")
      graft.engine.read.Cdx.writeCdxj(scanned, s19Produced, base = s19WarcDir)
      val resolved = graft.engine.read.Cdx.resolveRevisits(
        graft.engine.read.Cdx.readCdxj(s, s19Produced))
      val fetched = graft.engine.read.Cdx
        .fetch(resolved.select("warc_file", "warc_offset", "warc_length")
          .distinct(), base = s19WarcDir)
        .select(col("src_file").as("warc_file"),
          col("offset").as("warc_offset"),
          md5(col("payload")).as("payload_md5"))
      resolved.join(fetched, Seq("warc_file", "warc_offset"))
        .select("surt_key", "ts", "url", "mime", "status", "payload_md5")
        .orderBy("surt_key", "ts")
    },

    "s18_warc_export" -> { (s, _) =>
      val dir = "/tmp/graft_gate_s18_warc_out"
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(p).iterator().asScala
          .foreach(java.nio.file.Files.delete)
      }
      val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(lit("http://graft.local/doc/"), col("doc_id")).as("url"),
          col("text"))
        .repartition(4)
      graft.engine.sink.WarcSink.write(docs, "doc_id", "url", "text", dir)
      graft.engine.read.Warc.scan(s, dir)
        // content records only: each shard now leads with a warcinfo
        // record (no target URI, not indexed, not content)
        .filter(col("warc_type") === "conversion")
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri").as("url"), col("warc_type"),
          col("digest_ok"), col("truncated"),
          graft.engine.read.Warc
            .decodeTextCol(col("payload"), col("content_type")).as("text"))
        .orderBy("doc_id")
    },

    // -- S16: CDX fetch → documents bridge — the selective-build
    //    workflow end-to-end: index → ranges → toDocuments, equal to
    //    what a full scan would have produced for the same subset. ---
    "s16_cdx_documents" -> { (s, _) =>
      writeCdxFixture(s)
      val cdx = graft.engine.read.Cdx.readCdxj(s, cdxPath)
        .filter(col("status") === 200)
      graft.engine.read.Warc.toDocuments(
          graft.engine.read.Cdx.fetch(cdx, base = cdxWarcDir))
        .select(col("doc_id"), col("url"),
          date_format(col("fetch_ts"), "yyyy-MM-dd HH:mm:ss").as("fetch_s"),
          col("text"), length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // -- S20: WHATWG encoding sniffing through the crawl bridge — the
    //    charset precedence real pages require: a UTF-8 BOM beats a
    //    LYING transport header; a header-less legacy page declares
    //    its encoding only in markup (both meta forms); an undeclared
    //    page defaults to UTF-8. Expected texts are the authored
    //    literals, stored beside the fixture. ------------------------
    "s20_charset_sniff" -> { (s, _) =>
      writeS20Fixture(s)
      graft.engine.read.Warc.toDocuments(
          graft.engine.read.Warc.scan(s, s20WarcDir))
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
    },

    // -- S22: the undecoded-Content-Encoding flag through the crawl
    //    bridge — br/unknown codings surface the coding that stopped
    //    the chain; clean bodies carry NULL and decode as before.
    //    Text is masked for flagged rows (wire bytes are mojibake by
    //    design, not a stable literal). -----------------------------
    "s22_undecoded_flag" -> { (s, _) =>
      writeS22Fixture(s)
      graft.engine.read.Warc.toDocuments(
          graft.engine.read.Warc.scan(s, s22WarcDir))
        .select(col("doc_id"),
          coalesce(col("undecoded_encoding"), lit("<clean>"))
            .as("undecoded"),
          when(col("undecoded_encoding").isNull, col("text"))
            .otherwise(lit("<undecoded>")).as("text"))
        .orderBy("doc_id")
    },

    // -- S21: RSS/Atom feed items — both dialects through one kernel,
    //    item bodies through the htmlToText cascade, junk feeds to
    //    zero rows. Hand-derived literals. --------------------------
    "s21_feed_items" -> { (s, _) =>
      import s.implicits._
      val rss = "<rss version=\"2.0\"><channel><title>Blog</title>" +
        "<item><title>First</title><link>https://example.org/1</link>" +
        "<guid>tag:1</guid><pubDate>Mon, 01 Apr 2024 00:00:00 GMT" +
        "</pubDate><description>&lt;p&gt;Hello &amp;amp; welcome" +
        "&lt;/p&gt;</description></item>" +
        "<item><title>Second</title><link>https://example.org/2</link>" +
        "</item></channel></rss>"
      val atom = "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
        "<title>AtomF</title><entry><title>E1</title>" +
        "<link rel=\"self\" href=\"https://example.org/self\"/>" +
        "<link rel=\"alternate\" href=\"https://example.org/a1\"/>" +
        "<id>urn:1</id><published>2024-05-01T00:00:00Z</published>" +
        "<summary>plain summary</summary></entry></feed>"
      val df = Seq((1L, rss), (2L, atom), (3L, "not a feed"))
        .toDF("src_id", "body")
      graft.engine.read.Feeds.items(df, "body")
        .orderBy("src_id", "link")
    })

  def oracle: Map[String, String] = Map(
    // Hand-derived: the gzip page decodes (flag NULL → '<clean>');
    // br, gzip-then-br and x-snappy surface the stopping coding.
    "s22_undecoded_flag" ->
      """SELECT * FROM (VALUES
        |  ('<urn:uuid:u1>', '<clean>', 'clean gzip page'),
        |  ('<urn:uuid:u2>', 'br', '<undecoded>'),
        |  ('<urn:uuid:u3>', 'br', '<undecoded>'),
        |  ('<urn:uuid:u4>', 'x-snappy', '<undecoded>'))
        |  t(doc_id, undecoded, text)
        |ORDER BY doc_id""".stripMargin,
    // Hand-derived: RSS guid/date/html-stripped description, Atom
    // alternate link + summary; the junk feed contributes nothing.
    "s21_feed_items" ->
      """SELECT * FROM (VALUES
        |  (1::BIGINT, 'Blog', 'First', 'https://example.org/1',
        |   'tag:1', 'Mon, 01 Apr 2024 00:00:00 GMT', 'Hello & welcome'),
        |  (1::BIGINT, 'Blog', 'Second', 'https://example.org/2',
        |   '', '', ''),
        |  (2::BIGINT, 'AtomF', 'E1', 'https://example.org/a1',
        |   'urn:1', '2024-05-01T00:00:00Z', 'plain summary'))
        |  t(src_id, feed_title, title, link, item_id, published, summary)
        |ORDER BY src_id, link""".stripMargin,
    // Authored-literal texts ride the fixture; the gate decodes the
    // same bytes through the BOM/header/meta-prescan precedence.
    "s20_charset_sniff" ->
      s"""SELECT doc_id, text
         |FROM read_parquet('$s20ExpectedDir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "s13_warc_scan" ->
      s"""SELECT file, record_index, warc_type, record_id, target_uri,
         |  content_length, truncated, digest_ok, payload_md5
         |FROM read_parquet('$warcExpectedDir/*.parquet')
         |ORDER BY file, record_index""".stripMargin,
    "s14_wet_documents" ->
      s"""SELECT doc_id, url, fetch_s, file, text,
         |  length(text) AS n_chars
         |FROM read_parquet('$wetExpectedDir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // The oracle parses the CDXJ file ITSELF (regexp line split + JSON
    // extraction), applies the same status selection, and joins to the
    // authored (file, offset) → record ground truth — so a wrong
    // offset, a dropped malformed line, or a misparsed JSON field all
    // diverge. WARC range framing itself is pinned by the stored md5.
    "s15_cdx_fetch" ->
      s"""WITH raw AS (
         |  SELECT column0 AS line FROM read_csv('$cdxPath', header=false,
         |    delim='\\t', quote='', all_varchar=true)
         |), cdx AS (
         |  SELECT
         |    regexp_extract(line, '^(\\S+)\\s+(\\d{14})\\s+(\\{.*\\})\\s*$$', 1) AS surt_key,
         |    regexp_extract(line, '^(\\S+)\\s+(\\d{14})\\s+(\\{.*\\})\\s*$$', 2) AS ts,
         |    regexp_extract(line, '^(\\S+)\\s+(\\d{14})\\s+(\\{.*\\})\\s*$$', 3) AS js
         |  FROM raw
         |), parsed AS (
         |  SELECT surt_key, ts,
         |    js::JSON->>'url' AS url,
         |    (js::JSON->>'status')::INT AS status,
         |    js::JSON->>'digest' AS digest,
         |    js::JSON->>'filename' AS warc_file,
         |    (js::JSON->>'offset')::BIGINT AS warc_offset
         |  FROM cdx WHERE js <> ''
         |)
         |SELECT p.surt_key, p.ts, p.url, p.status, p.warc_file,
         |  p.warc_offset, e.record_id, e.warc_type, e.content_length,
         |  e.payload_md5, e.payload_md5 = p.digest AS digest_match
         |FROM parsed p
         |JOIN read_parquet('$cdxExpectedDir/*.parquet') e
         |  USING (warc_file, warc_offset)
         |WHERE p.status = 200
         |ORDER BY p.surt_key""".stripMargin,
    "s16_cdx_documents" ->
      s"""SELECT doc_id, url, fetch_s, text, length(text) AS n_chars
         |FROM read_parquet('$cdxDocsExpectedDir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // The oracle is the ORIGINAL table: whatever the export wrote and
    // the scan read back must equal the source projection, digests
    // verified (true) and nothing truncated.
    "s18_warc_export" ->
      """SELECT doc_id, 'http://graft.local/doc/' || doc_id AS url,
        | 'conversion' AS warc_type, true AS digest_ok,
        | false AS truncated, coalesce(text, '') AS text
        |FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        |WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,

    // Stored expectation: byte ranges, surt keys, digests all authored
    // at the fixture from the same arrays that build the archive.
    "s17_cdx_write" ->
      s"""SELECT surt_key, ts, url, mime, status, digest,
         |  warc_file, warc_offset, warc_length
         |FROM read_parquet('$cdxWriteExpectedDir/*.parquet')
         |ORDER BY surt_key""".stripMargin,
    // Expected rows derived from the authored records alone
    // (writeS19Fixture): each revisit resolves to its original's
    // range, so its fetched md5 equals the original record's.
    "s19_cdx_revisit" ->
      s"""SELECT surt_key, ts, url, mime, status, payload_md5
         |FROM read_parquet('$s19ExpectedDir/*.parquet')
         |ORDER BY surt_key, ts""".stripMargin,
    "s1_csv_ingest" ->
      s"""WITH raw AS (
         |  SELECT * FROM read_csv('$csvPath', header=true, all_varchar=true,
         |                         delim=',', quote='"', escape='"')
         |), norm AS (
         |  SELECT trim(rid) AS data_id,
         |    CASE WHEN target IS NULL OR trim(target) = '' THEN NULL
         |         ELSE trim(target) END AS label,
         |    CASE WHEN code IS NULL OR trim(code) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(code) END AS code,
         |    CASE WHEN qty IS NULL OR trim(qty) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(qty) END AS qty,
         |    CASE WHEN price IS NULL OR trim(price) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(price) END AS price,
         |    CASE WHEN flag IS NULL OR trim(flag) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(flag) END AS flag,
         |    CASE WHEN note IS NULL OR trim(note) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(note) END AS note
         |  FROM raw
         |)
         |SELECT data_id, label, code,
         |  COALESCE(TRY_CAST(qty AS BIGINT),
         |    CASE WHEN TRY_CAST(qty AS DOUBLE) = floor(TRY_CAST(qty AS DOUBLE))
         |         THEN TRY_CAST(qty AS DOUBLE)::BIGINT END) AS qty,
         |  TRY_CAST(price AS DOUBLE) AS price,
         |  CASE WHEN lower(flag) IN ('true', 'yes', 't', 'y', '1') THEN true
         |       WHEN lower(flag) IN ('false', 'no', 'f', 'n', '0') THEN false
         |       WHEN TRY_CAST(flag AS DOUBLE) = 1.0 THEN true
         |       WHEN TRY_CAST(flag AS DOUBLE) = 0.0 THEN false END AS flag,
         |  note
         |FROM norm
         |WHERE data_id IS NOT NULL AND data_id != ''
         |ORDER BY data_id""".stripMargin,
    "s5_json_ingest" ->
      s"""WITH raw AS (
         |  SELECT * FROM read_json('$jsonPath', format='array',
         |    columns={sku: 'VARCHAR', qty: 'VARCHAR', price: 'VARCHAR',
         |             ok: 'VARCHAR', rid: 'VARCHAR'})
         |), norm AS (
         |  SELECT trim(rid) AS data_id,
         |    CASE WHEN sku IS NULL OR trim(sku) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(sku) END AS sku,
         |    CASE WHEN qty IS NULL OR trim(qty) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(qty) END AS qty,
         |    CASE WHEN price IS NULL OR trim(price) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(price) END AS price,
         |    CASE WHEN ok IS NULL OR trim(ok) IN ('', 'NA', 'NULL', 'None')
         |         THEN NULL ELSE trim(ok) END AS ok
         |  FROM raw
         |), typed AS (
         |  SELECT data_id, sku,
         |    COALESCE(TRY_CAST(qty AS BIGINT),
         |      CASE WHEN TRY_CAST(qty AS DOUBLE) = floor(TRY_CAST(qty AS DOUBLE))
         |           THEN TRY_CAST(qty AS DOUBLE)::BIGINT END) AS qty_t,
         |    TRY_CAST(price AS DOUBLE) AS price_t,
         |    CASE WHEN lower(ok) IN ('true', 'yes', 't', 'y', '1') THEN true
         |         WHEN lower(ok) IN ('false', 'no', 'f', 'n', '0') THEN false
         |         WHEN TRY_CAST(ok AS DOUBLE) = 1.0 THEN true
         |         WHEN TRY_CAST(ok AS DOUBLE) = 0.0 THEN false END AS ok_t,
         |    qty IS NOT NULL AND qty_t IS NULL AS bad_qty,
         |    price IS NOT NULL AND price_t IS NULL AS bad_price,
         |    ok IS NOT NULL AND ok_t IS NULL AS bad_ok
         |  FROM norm
         |)
         |SELECT data_id, sku, qty_t AS qty, price_t AS price, ok_t AS ok
         |FROM typed
         |WHERE data_id IS NOT NULL AND data_id != ''
         |  AND NOT bad_qty AND NOT bad_price AND NOT bad_ok
         |ORDER BY data_id""".stripMargin)
}
