package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDX(J) index source: line parse (malformed dropped, casts), byte-
  * range fetch identity against authored members, relative-filename
  * resolution, and the fail-loud stance on ranges that do not frame.
  * End-to-end equality with the full-scan path is pinned by the
  * s15/s16 DuckDB gates.
  */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: String, text: String): Array[Byte] = {
    val payload = text.getBytes(StandardCharsets.UTF_8)
    (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
      s"WARC-Date: 2026-08-14T09:00:00Z\r\n" +
      s"WARC-Target-URI: http://example.com/$id\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
      "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  test("readCdxj: parses surt/ts/json fields, drops malformed lines, casts offsets") {
    val dir = tmpDir("cdx")
    val lines = Seq(
      """com,a)/x 20260101000000 {"url": "http://a.com/x", "mime": "text/html", "status": "200", "digest": "D1", "length": "10", "offset": "0", "filename": "f.warc.gz"}""",
      "not a cdx line",
      """com,b)/y 20260102000000 {"url": "http://b.com/y", "status": "404", "length": "7", "offset": "10", "filename": "g.warc.gz"}""",
      """com,c)/z 20260103000000 {"url": "http://c.com/z"}""") // no range → dropped
    write(dir.resolve("idx.cdxj"), lines.mkString("\n"))
    val got = Cdx.readCdxj(spark, dir.resolve("idx.cdxj").toString)
      .orderBy("surt_key")
      .collect()
    assert(got.length == 2)
    val r0 = got(0)
    assert(r0.getAs[String]("surt_key") == "com,a)/x" &&
      r0.getAs[String]("ts") == "20260101000000" &&
      r0.getAs[String]("url") == "http://a.com/x" &&
      r0.getAs[String]("mime") == "text/html" &&
      r0.getAs[Int]("status") == 200 &&
      r0.getAs[String]("digest") == "D1" &&
      r0.getAs[String]("warc_file") == "f.warc.gz" &&
      r0.getAs[Long]("warc_offset") == 0L &&
      r0.getAs[Long]("warc_length") == 10L)
    assert(got(1).getAs[String]("warc_file") == "g.warc.gz")
  }

  test("toCdxj: request records get no index entry (pywb cdx-indexer convention)") {
    // a full crawl WARC stores request+response pairs at the SAME
    // target URI; indexing the request would emit a bogus status-200
    // entry whose fetch returns the request body
    def httpRec(wtype: String, msgtype: String, http: String): Array[Byte] = {
      val payload = http.getBytes(StandardCharsets.ISO_8859_1)
      (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
        s"WARC-Record-ID: <urn:uuid:$wtype-1>\r\n" +
        s"WARC-Date: 2026-08-14T09:00:00Z\r\n" +
        s"WARC-Target-URI: http://example.com/page\r\n" +
        s"Content-Type: application/http; msgtype=$msgtype\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
        "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    }
    val dir = tmpDir("cdxreq")
    val bytes =
      gz(httpRec("request", "request",
        "GET /page HTTP/1.1\r\nHost: example.com\r\n\r\n")) ++
      gz(httpRec("response", "response",
        "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone")) ++
      gz(rec("conv1", "extracted text"))
    java.nio.file.Files.write(dir.resolve("pair.warc.gz"), bytes)
    val entries = Cdx.toCdxj(
        Cdx.scanWithRanges(spark, dir.resolve("pair.warc.gz").toString))
      .orderBy("ts").collect()
    // response + conversion indexed; the request record is NOT
    assert(entries.length == 2, entries.mkString("\n"))
    val lines = entries.map(_.getAs[String]("line"))
    assert(lines.exists(_.contains("\"status\":\"404\"")),
      "response status lost:\n" + lines.mkString("\n"))
    assert(!lines.exists(_.contains("application/http")),
      "request record leaked into the index:\n" + lines.mkString("\n"))
  }

  test("toCdxj digests: stated payload digest wins, response body hashed, block elsewhere") {
    def rec2(wtype: String, ct: String, payload: Array[Byte],
             extra: Seq[(String, String)] = Nil): Array[Byte] = {
      val iso = StandardCharsets.ISO_8859_1
      val hdrs = Seq("WARC-Type" -> wtype,
        "WARC-Record-ID" -> s"<urn:uuid:$wtype>",
        "WARC-Date" -> "2026-08-14T09:00:00Z",
        "WARC-Target-URI" -> s"http://example.com/$wtype") ++ extra ++
        Seq("Content-Type" -> ct, "Content-Length" -> payload.length.toString)
      ("WARC/1.0" +: hdrs.map { case (k, v) => s"$k: $v" })
        .mkString("", "\r\n", "\r\n\r\n").getBytes(iso) ++ payload ++
        "\r\n\r\n".getBytes(iso)
    }
    def sha1b32(b: Array[Byte]): String = Warc.base32(
      java.security.MessageDigest.getInstance("SHA-1").digest(b))
    val body = "<html>the body</html>".getBytes(StandardCharsets.UTF_8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ body
    val conv = "plain text".getBytes(StandardCharsets.UTF_8)
    val dir = tmpDir("cdxdg")
    val bytes =
      gz(rec2("response", "application/http; msgtype=response", http)) ++
      gz(rec2("conversion", "text/plain", conv)) ++
      gz(rec2("resource", "text/plain", conv,
        extra = Seq("WARC-Payload-Digest" -> "sha1:STATEDIGEST234567"))) ++
      gz(rec2("revisit", "application/http; msgtype=response",
        "HTTP/1.1 200 OK\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1),
        extra = Seq("WARC-Payload-Digest" -> s"sha1:${sha1b32(body)}")))
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), bytes)
    val got = Cdx.readCdxj(spark, {
      val out = dir.resolve("idx.cdxj").toString
      Cdx.writeCdxj(Cdx.scanWithRanges(spark,
        dir.resolve("a.warc.gz").toString), out)
      out
    }).select("url", "mime", "status", "digest").collect()
      .map(r => r.getString(0).split("/").last ->
        (r.getString(1), r.getInt(2), r.getString(3))).toMap
    assert(got("response") == (("text/html", 200, sha1b32(body))),
      "response digest must cover the HTTP BODY")
    assert(got("conversion") == (("text/plain", 200, sha1b32(conv))),
      "conversion digest is the block digest")
    assert(got("resource")._3 == "STATEDIGEST234567",
      "a stated WARC-Payload-Digest wins, algo prefix stripped")
    assert(got("revisit") == (("warc/revisit", 200, sha1b32(body))),
      "revisit: pywb mime marker + the stated pointer digest")
    // the revisit and the response now share a digest — the property
    // resolveRevisits joins on
    assert(got("revisit")._3 == got("response")._3)
  }

  test("toCdxj digest covers the STORED body bytes, not the content-decoded ones") {
    // pywb/warcio hash the stored payload: a gzip-served page's
    // fallback digest is sha1 of the COMPRESSED bytes — hashing the
    // gunzipped body would diverge from crawler-stated digests and
    // externally generated indexes, and break revisit joins
    def sha1b32(b: Array[Byte]): String = Warc.base32(
      java.security.MessageDigest.getInstance("SHA-1").digest(b))
    val html = "<html>compressed page</html>".getBytes(StandardCharsets.UTF_8)
    val gzBody = gz(html)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: gzip\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ gzBody
    val iso = StandardCharsets.ISO_8859_1
    val recBytes = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:gzr>\r\n" +
      "WARC-Date: 2026-08-15T10:00:00Z\r\n" +
      "WARC-Target-URI: http://example.com/gzr\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++
      http ++ "\r\n\r\n".getBytes(iso)
    val dir = tmpDir("cdxgz")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), gz(recBytes))
    val out = dir.resolve("idx.cdxj").toString
    Cdx.writeCdxj(Cdx.scanWithRanges(spark,
      dir.resolve("a.warc.gz").toString), out)
    val digest = Cdx.readCdxj(spark, out).select("digest")
      .collect().map(_.getString(0)).toSeq
    assert(digest == Seq(sha1b32(gzBody)))
    assert(digest != Seq(sha1b32(html)))
  }

  test("resolveRevisits: re-points at the EARLIEST capture; fetch composes") {
    import spark.implicits._
    val cdx = Seq(
      // two captures of the same content: the later one must NOT win
      ("com,a)/x", "20260101000000", "http://a.com/x", "text/html", 200,
        "DG1", "f1.warc.gz", 0L, 100L),
      ("com,a)/x", "20260301000000", "http://a.com/x", "text/html", 200,
        "DG1", "f2.warc.gz", 50L, 100L),
      ("com,a)/x", "20260401000000", "http://a.com/x", "warc/revisit", 200,
        "DG1", "f3.warc.gz", 10L, 30L),
      ("com,b)/y", "20260102000000", "http://b.com/y", "text/plain", 200,
        "DG2", "f1.warc.gz", 100L, 80L))
      .toDF("surt_key", "ts", "url", "mime", "status", "digest",
        "warc_file", "warc_offset", "warc_length")
    val out = Cdx.resolveRevisits(cdx).orderBy("surt_key", "ts").collect()
    assert(out.length == 4)
    val revisit = out.find(_.getAs[String]("ts") == "20260401000000").get
    assert(revisit.getAs[String]("warc_file") == "f1.warc.gz" &&
      revisit.getAs[Long]("warc_offset") == 0L &&
      revisit.getAs[Long]("warc_length") == 100L &&
      revisit.getAs[String]("mime") == "text/html" &&
      revisit.getAs[String]("url") == "http://a.com/x")
    // originals pass through untouched
    assert(out.count(_.getAs[String]("warc_file") == "f2.warc.gz") == 1)
  }

  test("resolveRevisits: an unresolvable revisit fails loud (or drops when allowed)") {
    import spark.implicits._
    val cdx = Seq(
      ("com,a)/x", "20260101000000", "http://a.com/x", "text/html", 200,
        "DG1", "f1.warc.gz", 0L, 100L),
      ("com,c)/z", "20260401000000", "http://c.com/z", "warc/revisit", 200,
        "MISSING", "f3.warc.gz", 10L, 30L))
      .toDF("surt_key", "ts", "url", "mime", "status", "digest",
        "warc_file", "warc_offset", "warc_length")
    val e = intercept[Exception] {
      Cdx.resolveRevisits(cdx).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("unresolvable revisit") && m.contains("http://c.com/z")))
    val dropped = Cdx.resolveRevisits(cdx, requireResolved = false).collect()
    assert(dropped.length == 1 &&
      dropped.head.getAs[String]("warc_file") == "f1.warc.gz")
  }

  test("fetch: member-per-record gz ranges and plain ranges resolve to the right records") {
    val root = tmpDir("cdxarc")
    val (m1, m2) = (gz(rec("a", "alpha doc")), gz(rec("b", "beta doc")))
    java.nio.file.Files.write(root.resolve("p.warc.gz"), m1 ++ m2)
    val plain = rec("c", "gamma doc") ++ rec("d", "delta doc")
    java.nio.file.Files.write(root.resolve("q.warc"), plain)
    val cdx = Seq(
      ("p.warc.gz", m1.length.toLong, m2.length.toLong), // member 2 only
      ("q.warc", rec("c", "gamma doc").length.toLong,
        rec("d", "delta doc").length.toLong))            // record 2 only
      .toDF("warc_file", "warc_offset", "warc_length")
    val got = Cdx.fetch(cdx, base = root.toString)
      .select(col("record_id"),
        col("payload").cast("string").as("text"))
      .as[(String, String)].collect().toMap
    assert(got == Map("<urn:uuid:b>" -> "beta doc",
      "<urn:uuid:d>" -> "delta doc"))
  }

  test("fetch: a range that does not frame as WARC fails loud with file+offset") {
    val root = tmpDir("cdxbad")
    // a COMPLETE first line that is not a WARC version line — the
    // parser's fail-loud framing case (silent-drop is only for EOF
    // truncation mid-header)
    val bad = "JUNK/1.0\r\nFoo: bar\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    java.nio.file.Files.write(root.resolve("x.warc"), bad)
    val cdx = Seq(("x.warc", 0L, bad.length.toLong))
      .toDF("warc_file", "warc_offset", "warc_length")
    val e = intercept[org.apache.spark.SparkException] {
      Cdx.fetch(cdx, base = root.toString).collect()
    }
    assert(e.getMessage.contains("x.warc@0") ||
      Option(e.getCause).exists(_.getMessage.contains("x.warc@0")))
  }

  private val rangeRequests = new java.util.concurrent.atomic.AtomicInteger(0)

  private val concurrentNow = new java.util.concurrent.atomic.AtomicInteger(0)
  private val concurrentMax = new java.util.concurrent.atomic.AtomicInteger(0)

  private def withRangeServer(bytes: Array[Byte], honorRange: Boolean = true,
                              failFirst: Int = 0, failStatus: Int = 503,
                              retryAfter: Option[String] = None,
                              holdMs: Long = 0)
                             (body: Int => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    val remainingFails = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    rangeRequests.set(0)
    concurrentNow.set(0)
    concurrentMax.set(0)
    server.createContext("/arc/", { ex: com.sun.net.httpserver.HttpExchange =>
      try {
        rangeRequests.incrementAndGet()
        val now = concurrentNow.incrementAndGet()
        concurrentMax.getAndUpdate(m => math.max(m, now))
        if (holdMs > 0) Thread.sleep(holdMs)
        if (remainingFails.getAndDecrement() > 0) {
          retryAfter.foreach(v =>
            ex.getResponseHeaders.add("Retry-After", v))
          ex.sendResponseHeaders(failStatus, -1)
        } else {
          val range = ex.getRequestHeaders.getFirst("Range")
          if (honorRange && range != null && range.startsWith("bytes=")) {
            val Array(s, e) = range.stripPrefix("bytes=").split("-").map(_.toLong)
            val slice = bytes.slice(s.toInt, e.toInt + 1)
            ex.getResponseHeaders.add("Content-Range",
              s"bytes $s-$e/${bytes.length}")
            ex.sendResponseHeaders(206, slice.length.toLong)
            ex.getResponseBody.write(slice)
          } else {
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
          }
        }
      } finally { concurrentNow.decrementAndGet(); ex.close() }
    })
    server.start()
    try body(server.getAddress.getPort) finally server.stop(0)
  }

  test("fetch: http(s) archives resolve via ranged GETs — same records as the FS path") {
    val m1 = gz(rec("h1", "first doc over http"))
    val m2 = gz(rec("h2", "second doc over http"))
    val bytes = m1 ++ m2
    withRangeServer(bytes) { port =>
      // one absolute http URL, one filename relative to the http base —
      // the exact shape a Common Crawl index + data host presents
      val cdx = Seq(
        (s"http://127.0.0.1:$port/arc/a.warc.gz", 0L, m1.length.toLong),
        ("a.warc.gz", m1.length.toLong, m2.length.toLong))
        .toDF("warc_file", "warc_offset", "warc_length")
      val got = Cdx.fetch(cdx, base = s"http://127.0.0.1:$port/arc")
        .orderBy("offset")
        .select("target_uri", "payload")
        .collect()
        .map(r => r.getString(0) ->
          new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8))
      assert(got.toSeq == Seq(
        "http://example.com/h1" -> "first doc over http",
        "http://example.com/h2" -> "second doc over http"))
    }
  }

  test("fetch: adjacent http ranges coalesce into one spanned GET; distant ones do not") {
    val ms = (0 until 6).map(i => gz(rec(s"c$i", s"coalesce doc $i")))
    // entries 0-2 adjacent (gaps 0), entry 5 far behind a > 64 KB gap
    val pad = Array.fill[Byte](100000)(0x5a)
    val bytes = ms(0) ++ ms(1) ++ ms(2) ++ pad ++ ms(5)
    withRangeServer(bytes) { port =>
      val o0 = 0L
      val o1 = ms(0).length.toLong
      val o2 = o1 + ms(1).length
      val o5 = o2 + ms(2).length + pad.length
      val cdx = Seq(
        ("a.warc.gz", o0, ms(0).length.toLong),
        ("a.warc.gz", o1, ms(1).length.toLong),
        ("a.warc.gz", o1, ms(1).length.toLong), // duplicate range: one fetch
        ("a.warc.gz", o2, ms(2).length.toLong),
        ("a.warc.gz", o5, ms(5).length.toLong))
        .toDF("warc_file", "warc_offset", "warc_length")
        .coalesce(1)
      val got = Cdx.fetch(cdx, base = s"http://127.0.0.1:$port/arc")
        .select("target_uri").collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("http://example.com/c0", "http://example.com/c1",
        "http://example.com/c1", "http://example.com/c2",
        "http://example.com/c5"))
      // 0..2 (incl. the duplicate) span one GET; the far entry its own
      assert(rangeRequests.get() == 2, s"saw ${rangeRequests.get()} requests")
    }
  }

  test("rangedGet: a server that ignores Range fails loud, no retry") {
    val bytes = gz(rec("x", "payload"))
    withRangeServer(bytes, honorRange = false) { port =>
      var slept = 0
      val e = intercept[IllegalStateException] {
        Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz", 0, 10,
          sleep = _ => slept += 1)
      }
      assert(e.getMessage.contains("ignored Range") && slept == 0)
    }
  }

  test("rangedGet: 5xx retries with backoff, then succeeds") {
    val bytes = gz(rec("y", "retry me"))
    withRangeServer(bytes, failFirst = 2) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val got = Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz",
        0, bytes.length.toLong, sleep = sleeps += _)
      assert(java.util.Arrays.equals(got, bytes))
      assert(sleeps.toSeq == Seq(1000L, 2000L)) // 1s, 2s exponential
    }
  }

  test("rangedGet: exhausted retries surface the last error") {
    val bytes = gz(rec("z", "never"))
    withRangeServer(bytes, failFirst = 99) { port =>
      val e = intercept[IllegalStateException] {
        Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz", 0, 5,
          maxAttempts = 3, sleep = _ => ())
      }
      assert(e.getMessage.contains("after 3 attempts") &&
        e.getMessage.contains("HTTP 503"))
    }
  }

  test("rangedGet: 429 + Retry-After backs off per the header, then succeeds") {
    val bytes = gz(rec("t", "throttle me"))
    withRangeServer(bytes, failFirst = 1, failStatus = 429,
        retryAfter = Some("2")) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val m = new Cdx.FetchMetrics(spark.sparkContext)
      val got = Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz",
        0, bytes.length.toLong, sleep = sleeps += _, metrics = Some(m))
      assert(java.util.Arrays.equals(got, bytes))
      // the header (2 s) speaks, not the exponential schedule (1 s)
      assert(sleeps.toSeq == Seq(2000L))
      assert(m.requests.value == 2L && m.retries.value == 1L &&
        m.throttled.value == 1L && m.throttleSleepMs.value == 2000L)
    }
  }

  test("rangedGet: 429 without Retry-After falls back to the exponential schedule") {
    val bytes = gz(rec("t2", "throttle plain"))
    withRangeServer(bytes, failFirst = 2, failStatus = 429) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val got = Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz",
        0, bytes.length.toLong, sleep = sleeps += _)
      assert(java.util.Arrays.equals(got, bytes))
      assert(sleeps.toSeq == Seq(1000L, 2000L))
    }
  }

  test("rangedGet: Retry-After on a 503 maintenance window is honored too") {
    val bytes = gz(rec("t4", "maintenance"))
    withRangeServer(bytes, failFirst = 1, failStatus = 503,
        retryAfter = Some("3")) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val got = Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz",
        0, bytes.length.toLong, sleep = sleeps += _)
      assert(java.util.Arrays.equals(got, bytes))
      assert(sleeps.toSeq == Seq(3000L)) // the header, not the 1 s schedule
    }
  }

  test("rangedGet: 408 request timeout retries instead of dying") {
    val bytes = gz(rec("t3", "slow host"))
    withRangeServer(bytes, failFirst = 1, failStatus = 408) { port =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val got = Cdx.rangedGet(s"http://127.0.0.1:$port/arc/a.warc.gz",
        0, bytes.length.toLong, sleep = sleeps += _)
      assert(java.util.Arrays.equals(got, bytes))
      assert(sleeps.toSeq == Seq(1000L))
    }
  }

  test("retryAfterMs: delay-seconds, HTTP-date, junk, and the cap") {
    assert(Cdx.retryAfterMs(Some("2"), 0L) == Some(2000L))
    assert(Cdx.retryAfterMs(Some("  7 "), 0L) == Some(7000L))
    // HTTP-date: 90 s in the future of nowMs
    val now = 1765000000000L
    val date = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(now + 90000L).atZone(
        java.time.ZoneOffset.UTC))
    assert(Cdx.retryAfterMs(Some(date), now) == Some(90000L))
    // a date already past waits zero, never negative
    val past = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(now - 5000L).atZone(
        java.time.ZoneOffset.UTC))
    assert(Cdx.retryAfterMs(Some(past), now) == Some(0L))
    // hostile header clamps to the cap; junk falls back to None
    assert(Cdx.retryAfterMs(Some("999999"), 0L) == Some(Cdx.MaxRetryAfterMs))
    // a 17+-digit delay-seconds must CLAMP, not wrap Long negative
    // under the cap (Thread.sleep(negative) would kill the task)
    assert(Cdx.retryAfterMs(Some("99999999999999999"), 0L) ==
      Some(Cdx.MaxRetryAfterMs))
    assert(Cdx.retryAfterMs(Some("9" * 40), 0L).isEmpty) // > Long: junk
    assert(Cdx.retryAfterMs(Some("soonish"), 0L).isEmpty)
    assert(Cdx.retryAfterMs(None, 0L).isEmpty)
    assert(Cdx.retryAfterMs(Some(""), 0L).isEmpty)
  }

  test("rangedGet: the per-host gate bounds concurrent in-flight requests") {
    val bytes = gz(rec("g", "gated"))
    withRangeServer(bytes, holdMs = 120) { port =>
      val gate = new java.util.concurrent.Semaphore(1)
      val url = s"http://127.0.0.1:$port/arc/a.warc.gz"
      val threads = (0 until 4).map { _ =>
        new Thread(() => {
          Cdx.rangedGet(url, 0, bytes.length.toLong, gate = Some(gate))
          ()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(rangeRequests.get() == 4)
      assert(concurrentMax.get() == 1,
        s"gate of 1 admitted ${concurrentMax.get()} concurrent requests")
    }
  }

  test("hostGate: keyed by host alone — a conflicting bound resizes the ONE shared gate") {
    val a = Cdx.hostGate("rekey.example.org:443", 3)
    assert(a eq Cdx.hostGate("rekey.example.org:443", 3))
    assert(a ne Cdx.hostGate("rekey-other.example.org:443", 3))
    assert(a.availablePermits() == 3)
    // a second job asking a different bound for the same host must NOT
    // get an independent pool (that was the (host, permits) keying bug:
    // two pools = 2× the politeness budget). Same gate, retargeted.
    assert(Cdx.hostGate("rekey.example.org:443", 5) eq a)
    assert(a.availablePermits() == 5)
    assert(Cdx.hostGate("rekey.example.org:443", 2) eq a)
    assert(a.availablePermits() == 2)
  }

  test("fetch: the per-host bound holds across PARTITIONS (gate is JVM-wide, not per-task)") {
    // four far-apart members (gaps > HttpCoalesceGap, so no coalescing)
    // fetched from four partitions at once: local[32] runs all four
    // tasks concurrently, and the host gate — keyed per JVM, not per
    // task — must still admit only one wire exchange at a time.
    val ms = (1 to 4).map(i => gz(rec(s"c$i", s"concurrent member $i")))
    val pad = Array.fill[Byte](70000)(0x3c)
    val out = new java.io.ByteArrayOutputStream()
    val entries = ms.map { m =>
      val e = ("a.warc.gz", out.size().toLong, m.length.toLong)
      out.write(m); out.write(pad)
      e
    }
    withRangeServer(out.toByteArray, holdMs = 120) { port =>
      val cdx = entries.toDF("warc_file", "warc_offset", "warc_length")
        .repartition(4)
      val n = Cdx.fetch(cdx, base = s"http://127.0.0.1:$port/arc",
        maxInFlightPerHost = 1).count()
      assert(n == 4)
      assert(rangeRequests.get() == 4)
      assert(concurrentMax.get() == 1,
        s"per-host bound of 1 admitted ${concurrentMax.get()} concurrent requests")
    }
  }

  test("perExecutorHostBound: divides the cluster budget, floors at 1") {
    // local mode: no separate executors registered → treated as 1
    assert(Cdx.perExecutorHostBound(8, spark) >= 1)
    assert(Cdx.perExecutorHostBound(1, spark) == 1)
    intercept[IllegalArgumentException] { Cdx.perExecutorHostBound(0, spark) }
  }

  test("fetch: metrics observe request counts across the job") {
    val m1 = gz(rec("mm1", "metered one"))
    val m2 = gz(rec("mm2", "metered two"))
    val pad = Array.fill[Byte](100000)(0x3c)
    val bytes = m1 ++ pad ++ m2
    withRangeServer(bytes) { port =>
      val metrics = new Cdx.FetchMetrics(spark.sparkContext)
      val cdx = Seq(
        ("a.warc.gz", 0L, m1.length.toLong),
        ("a.warc.gz", (m1.length + pad.length).toLong, m2.length.toLong))
        .toDF("warc_file", "warc_offset", "warc_length")
        .coalesce(1)
      val n = Cdx.fetch(cdx, base = s"http://127.0.0.1:$port/arc",
        metrics = Some(metrics)).count()
      assert(n == 2)
      val snap = metrics.snapshot
      assert(snap("http_requests") == 2L && snap("http_retries") == 0L &&
        snap("http_throttled") == 0L && snap("throttle_sleep_ms") == 0L)
    }
  }

  test("fetch: a throttled job backs off per Retry-After and reports it in the metrics") {
    val m1 = gz(rec("th1", "throttled fetch"))
    withRangeServer(m1, failFirst = 1, failStatus = 429,
        retryAfter = Some("1")) { port =>
      val metrics = new Cdx.FetchMetrics(spark.sparkContext)
      val cdx = Seq(("a.warc.gz", 0L, m1.length.toLong))
        .toDF("warc_file", "warc_offset", "warc_length")
      val got = Cdx.fetch(cdx, base = s"http://127.0.0.1:$port/arc",
          metrics = Some(metrics))
        .select("target_uri").collect().map(_.getString(0)).toSeq
      assert(got == Seq("http://example.com/th1"))
      val snap = metrics.snapshot
      assert(snap("http_requests") == 2L && snap("http_retries") == 1L &&
        snap("http_throttled") == 1L && snap("throttle_sleep_ms") == 1000L,
        snap.toString)
    }
  }

  test("fetch: zero or oversized range lengths are rejected, not truncated silently") {
    val root = tmpDir("cdxlen")
    java.nio.file.Files.write(root.resolve("x.warc"), rec("a", "good"))
    val cdx = Seq(("x.warc", 0L, 0L)).toDF("warc_file", "warc_offset", "warc_length")
    val e = intercept[org.apache.spark.SparkException] {
      Cdx.fetch(cdx, base = root.toString).collect()
    }
    assert(e.getMessage.contains("out of (0,") ||
      Option(e.getCause).exists(_.getMessage.contains("out of (0,")))
  }
}
