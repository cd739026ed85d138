package graft.engine.read

import java.io.ByteArrayInputStream

import graft.SparkSpec

/** Gzip member-boundary scanner: offsets/lengths against
  * independently authored concatenations, RFC 1952 header options,
  * and the fail-loud truncation stance.
  */
class GzipMembersSpec extends SparkSpec {

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  test("member offsets and compressed lengths partition the stream exactly") {
    val (a, b, c) = ("alpha".getBytes, "bravo-bravo".getBytes, "".getBytes)
    val (m1, m2, m3) = (gz(a), gz(b), gz(c))
    val all = m1 ++ m2 ++ m3
    val got = GzipMembers.members(new ByteArrayInputStream(all)).toList
    assert(got.map(_.bytes.toSeq) == List(a.toSeq, b.toSeq, c.toSeq))
    assert(got.map(_.offset) ==
      List(0L, m1.length.toLong, (m1.length + m2.length).toLong))
    assert(got.map(_.compressedLength) ==
      List(m1.length.toLong, m2.length.toLong, m3.length.toLong))
    assert(got.map(m => m.offset + m.compressedLength).last == all.length)
  }

  test("FNAME/FCOMMENT/FEXTRA/FHCRC header fields are walked per RFC 1952") {
    // author a header with FEXTRA + FNAME + FCOMMENT + FHCRC by hand,
    // then a deflate body + trailer from a plain member
    val plain = gz("payload!".getBytes)
    val body = plain.drop(10) // strip the 10-byte no-option header
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x1F, 0x8B, 8, 2 | 4 | 8 | 16).map(_.toByte)) // FLG
    out.write(new Array[Byte](6)) // MTIME XFL OS
    out.write(Array(3, 0).map(_.toByte)); out.write("xtr".getBytes) // FEXTRA
    out.write("name.warc".getBytes); out.write(0) // FNAME
    out.write("a comment".getBytes); out.write(0) // FCOMMENT
    out.write(Array(0x12, 0x34).map(_.toByte)) // FHCRC (unchecked)
    out.write(body)
    val fancy = out.toByteArray
    val got = GzipMembers.members(
      new ByteArrayInputStream(fancy ++ plain)).toList
    assert(got.map(_.bytes.toSeq) ==
      List("payload!".getBytes.toSeq, "payload!".getBytes.toSeq))
    assert(got(1).offset == fancy.length.toLong)
  }

  test("truncation and corruption fail loud with offsets, never silent-drop") {
    val m = gz("some payload".getBytes)
    // cut inside the deflate body
    val e1 = intercept[java.io.EOFException] {
      GzipMembers.members(new ByteArrayInputStream(m.dropRight(12))).toList
    }
    assert(e1.getMessage.contains("deflate body") ||
      e1.getMessage.contains("trailer"))
    // cut inside the trailer
    val e2 = intercept[java.io.EOFException] {
      GzipMembers.members(new ByteArrayInputStream(m.dropRight(3))).toList
    }
    assert(e2.getMessage.contains("trailer"))
    // second member with bad magic → loud, with the member offset
    val e3 = intercept[IllegalArgumentException] {
      GzipMembers.members(new ByteArrayInputStream(
        m ++ "JUNK".getBytes)).toList
    }
    assert(e3.getMessage.contains(s"offset ${m.length}"))
  }

  test("every byte prefix of a member stream parses a member prefix or fails loud") {
    val full = gz("first record".getBytes) ++ gz("second".getBytes)
    for (n <- 0 to full.length) {
      try {
        val got = GzipMembers.members(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOfRange(full, 0, n))).toList
        // whatever parsed must be a true prefix of the member sequence
        assert(got.length <= 2)
        got.headOption.foreach(m =>
          assert(m.bytes.toSeq == "first record".getBytes.toSeq))
      } catch {
        case _: java.io.EOFException => ()
        case _: IllegalArgumentException => ()
        case _: java.util.zip.ZipException => () // corrupt deflate tail
      }
    }
  }

  test("decompressed-size cap trips instead of buffering unbounded") {
    val big = gz(Array.fill(100000)('x'.toByte))
    val e = intercept[IllegalArgumentException] {
      GzipMembers.members(new ByteArrayInputStream(big), 4096).toList
    }
    assert(e.getMessage.contains("4096"))
  }

  test("CDXJ write → read → fetch closes the loop on its own archive") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("cdxloop")
    def rec(id: String, url: String, text: String): Array[Byte] = {
      val payload = text.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
        s"WARC-Date: 2026-08-14T10:0$id:00Z\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    java.nio.file.Files.write(root.resolve("x.warc.gz"),
      gz(rec("1", "http://a.com/p", "one")) ++
        gz(rec("2", "http://b.com/q", "two")))
    val idx = root.resolve("x.cdxj").toString
    Cdx.writeCdxj(Cdx.scanWithRanges(spark,
      root.resolve("x.warc.gz").toString), idx, base = root.toString)
    val cdx = Cdx.readCdxj(spark, idx)
    assert(cdx.count() == 2)
    // index is sorted by surt key
    val keys = cdx.orderBy("surt_key").select("surt_key")
      .collect().map(_.getString(0)).toSeq
    assert(keys == Seq("com,a)/p", "com,b)/q") && keys == keys.sorted)
    val docs = Cdx.fetch(cdx.filter(col("url") === "http://b.com/q"),
        base = root.toString)
      .select(col("record_id"), col("payload").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(docs == Seq(("<urn:uuid:2>", "two")))
  }
}
