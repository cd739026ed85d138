package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed curation program: stage metrics must be monotone
  * non-increasing row counts, every stage must demonstrably act on a
  * corpus built to trigger it, and the export manifest must agree with
  * the final frame.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs: 4 sources; every 4th doc Chinese (langid drop), every 7th
  // digit-heavy (quality drop), doc 5 a near-dup of seen doc 105,
  // docs 9/19 contaminated (their text IS the probe set), and all docs
  // share boilerplate lines that segment dedup must kill.
  private def bodyOf(i: Long): String =
    if (i % 4 == 0) "这是一个中文文档没有英文标记词在里面可以路由"
    else if (i % 7 == 0) // langid-visible but digit-drenched → quality drop
      "the 11 22 33 44 of 55 66 77 88 and 99 00 11 22 33 44 55 66 77 88"
    else if (i == 5) "the seen corpus document number five with many stable words " +
      "that keeps going for a while longer here"
    else // per-doc word stems → zero 3-gram shingle overlap across docs
      s"the alpha$i beta$i gamma$i of delta$i epsilon$i and zeta$i " +
        s"eta$i theta$i iota$i kappa$i"

  private def corpus = (1L to 40L).map { i =>
    (i, s"src${i % 4}",
      s"<html><body><p>nav | nav | nav</p><p>${bodyOf(i)}</p></body></html>")
  }.toDF("doc_id", "source", "html")

  private def seen = Seq(
    (105L, "the seen corpus document number five with many stable words " +
      "that keeps going for a while longer here and one extra"),
    (106L, "some other seen document about nothing in particular at all"))
    .toDF("doc_id", "text")

  private def probes = Seq(bodyOf(9L), bodyOf(19L)).toDF("text")

  private def run(exportDir: Option[String] = None) =
    CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L,
        exportDir = exportDir))

  test("stage metrics are monotone and every stage acts") {
    val out = run()
    val m = out.metrics.toMap
    assert(m("rows_in") == 40L)
    // monotone non-increasing through the row-filter stages
    val chain = Seq("rows_in", "terms_kept", "language_kept",
      "quality_kept", "neardup_kept", "decontaminated_kept",
      "mixed_and_packed")
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(m(a) >= m(b), s"$a=${m(a)} < $b=${m(b)}")
    }
    assert(m("language_kept") < m("rows_in"), "langid dropped nothing")
    assert(m("quality_kept") < m("language_kept"), "quality dropped nothing")
    assert(m("neardup_kept") < m("quality_kept"), "near-dup dropped nothing")
    assert(m("decontaminated_kept") < m("neardup_kept"),
      "decontamination dropped nothing")
    assert(m("segments_kept") < m("segments_seen"),
      "segment dedup dropped nothing")
  }

  test("trained fastText quality model replaces the ratio heuristic at the gate") {
    // a 2-label supervised model whose decision is carried entirely by
    // the word "alpha1": docs containing it score ~keep, others ~drop
    // — the inverse of what the ratio heuristic would decide, proving
    // the configured model (not the heuristic) gates the stage
    val words = Seq("alpha1", "</s>")
    val labels = Seq("__label__drop", "__label__keep")
    // rows: alpha1=(4), </s>=(0), buckets 0; out: drop=(-4), keep=(4)
    val input = Array.tabulate((2 + 4) * 1)(i => if (i == 0) 4f else 0f)
    val output = Array[Float](-4f, 4f)
    val m = FastText.Model(1, 4, 1, 0, 0, FastText.LossSoftmax, 2,
      words.zipWithIndex.toMap, labels.toArray, Array.empty,
      input, 6, output)
    val path = tmpDir("ftq").resolve("q.bin").toString
    FastText.save(m, path, sc.hadoopConfiguration)
    val out = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L,
        qualityModel = Some(path), minQuality = 0.9))
    val kept = out.data.select("doc_id").as[Long].collect().toSet
    out.release()
    // only doc 1's body contains "alpha1" (bodyOf stems are per-doc);
    // the model keeps it and drops everything else at the quality gate
    assert(kept == Set(1L), s"kept=$kept")
    // a model without the configured label fails loud at build time
    val e = intercept[IllegalArgumentException] {
      CurationPipeline.curate(corpus,
        Dedup.buildMinhashIndex(seen, "doc_id", "text"),
        probes, "text",
        CurationPipeline.Config("doc_id", "html", "source",
          targetMix = Map("src0" -> 1),
          qualityModel = Some(path), qualityLabel = "__label__absent"))
    }
    assert(e.getMessage.contains("__label__absent"))
  }

  test("result carries pack assignments and content digests") {
    val out = run()
    val rows = out.data.collect()
    assert(rows.nonEmpty)
    val schema = out.data.columns.toSeq
    assert(schema == Seq("doc_id", "source", "n_tok", "pack_id", "content_sha"))
    // the near-dup victim and the contaminated docs are gone
    val ids = rows.map(_.getLong(0)).toSet
    assert(!ids.contains(5L))
    assert(!ids.contains(9L) && !ids.contains(19L))
    // sha-256 hex digests
    assert(rows.forall(_.getString(4).matches("[0-9a-f]{64}")))
    // packs fill contiguously per source: pack_id 0 exists everywhere
    val bySource = rows.groupBy(_.getString(1))
    bySource.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).min == 0L)
    }
  }

  test("trigram router keeps languages the marker heuristic cannot see") {
    // the Chinese docs (i%4==0) die under the 4-language marker rule
    // but survive the 29-language trigram router; keepLangs then
    // narrows the keep set explicitly
    val trigram = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        langId = "trigram",
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L))
    val marker = run()
    val mT = trigram.metrics.toMap
    val mM = marker.metrics.toMap
    assert(mT("language_kept") > mM("language_kept"),
      s"trigram ${mT("language_kept")} should keep more than marker ${mM("language_kept")}")
    // narrow to english only — strictly fewer than the open trigram set
    val enOnly = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        langId = "trigram", keepLangs = Set("en"),
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L))
    assert(enOnly.metrics.toMap.apply("language_kept") < mT("language_kept"))
    intercept[IllegalArgumentException] {
      CurationPipeline.Config("doc_id", "html", "source", langId = "nope")
    }
  }

  test("block extractor: chrome never reaches the downstream stages") {
    // A nav bar of real anchors around a 20-word article: the regex
    // extractor keeps the nav text (it only drops by line link
    // density at the stripBoilerplate entry points), the block
    // extractor classifies it out before langid/quality ever see it.
    // 42 words: after the dense nav (prev link density 1.0) the
    // classifier requires curr > 40 when nothing follows
    val art = (0 until 21).map(i => s"the word$i").mkString(" ")
    val pages = Seq(
      (1L, "src0",
        "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a></div>" +
          s"<p>$art</p>")).toDF("doc_id", "source", "html")
    def go(extractor: String) = CurationPipeline.curate(pages,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("src0" -> 1), nearDupThreshold = 0.5,
        packCapacity = 100L, extractor = extractor))
    val blocks = go("blocks")
    val regex = go("regex")
    assert(blocks.metrics.toMap.apply("mixed_and_packed") == 1L)
    // same doc survives both paths, but the content digest differs:
    // the block path's text excludes the nav chrome
    val shaB = blocks.data.select("content_sha").as[String].head()
    val shaR = regex.data.select("content_sha").as[String].head()
    assert(shaB != shaR)
    intercept[IllegalArgumentException] {
      CurationPipeline.Config("doc_id", "html", "source", extractor = "dom")
    }
  }

  test("optional stages: domain blocklist drops first, PII redacts before digests") {
    val withHosts = corpus
      .withColumn("host",
        when(col("doc_id") <= 2, lit("spam.bad.com")).otherwise(lit("ok.org")))
      // doc 3 gains an email that redaction must strip BEFORE hashing
      .withColumn("html",
        when(col("doc_id") === 3,
          regexp_replace(col("html"), "</p></body>",
            " mail me at leak@example.com</p></body>"))
          .otherwise(col("html")))
    val cfg = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L,
      redactPii = true, hostCol = Some("host"))
    val out = CurationPipeline.curate(withHosts,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg, blocklist = Some(Seq("bad.com").toDF("domain")))
    val m = out.metrics.toMap
    assert(m("rows_received") == 40L)
    assert(m("rows_in") == 38L, "blocklist should drop docs 1 and 2")
    val rows = out.data.collect()
    assert(!rows.map(_.getLong(0)).toSet.exists(Set(1L, 2L)))
    // doc 3's exported digest is of the REDACTED text
    val row3 = rows.find(_.getLong(0) == 3L)
    assert(row3.isDefined, "doc 3 should survive the pipeline")
    val expected = java.security.MessageDigest.getInstance("SHA-256")
    // recompute what the cleaned text should be: the body line with the
    // email replaced by the redaction tag
    val clean = s"${bodyOf(3L)} mail me at [EMAIL]"
    val hex = expected.digest(clean.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row3.get.getString(4) == hex,
      s"content_sha should hash the redacted text (want $hex)")
  }

  test("term blocklist stage drops listed content, metrics show it") {
    val out = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L,
        blockedTerms = Seq("alpha3", "beta11 gamma11"))) // word + phrase
    try {
      val m = out.metrics.toMap
      assert(m("terms_kept") == m("rows_in") - 2,
        s"expected word+phrase drops: $m")
      val kept = out.data.select("doc_id").as[Long].collect().toSet
      assert(!kept.contains(3L) && !kept.contains(11L))
    } finally out.release()
    // without the option the stage is a constant-true no-op
    val off = run()
    try {
      val m2 = off.metrics.toMap
      assert(m2("terms_kept") == m2("rows_in"))
    } finally off.release()
    // the Aho-Corasick matcher is a drop-in for the same semantics:
    // identical kept set and metrics on the same list
    val aho = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L,
        blockedTerms = Seq("alpha3", "beta11 gamma11"),
        termMatcher = "aho"))
    try {
      val m3 = aho.metrics.toMap
      assert(m3("terms_kept") == m3("rows_in") - 2)
      val kept3 = aho.data.select("doc_id").as[Long].collect().toSet
      assert(!kept3.contains(3L) && !kept3.contains(11L))
    } finally aho.release()
    intercept[IllegalArgumentException] {
      CurationPipeline.Config("doc_id", "html", "source",
        termMatcher = "regex")
    }
  }

  test("export manifest agrees with the final frame") {
    val dir = "/tmp/graft_spec_pipe1_export"
    val out = run(exportDir = Some(dir))
    val man = out.manifest.get
    assert(man.totalCount == out.data.count())
    assert(man.shards.map(_.count).sum == man.totalCount)
    assert(new java.io.File(dir).exists())
  }

  test("crawl-to-corpus: WARC bytes → toDocuments → curate, one program") {
    // The full 100-TB shape end to end: a crawl archive on disk in,
    // packed curated corpus out — proving the Warc bridge's column
    // contract (doc_id, url, fetch_ts, source, text) feeds curate
    // without adaptation beyond naming the text column as the input.
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def record(id: Long, body: String): Array[Byte] = {
      val payload = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
        s"WARC-Target-URI: http://site$id.example/page\r\n" +
        "WARC-Date: 2026-08-14T06:00:00Z\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes(ISO_8859_1) ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
    }
    val dir = tmpDir("crawl2corpus")
    val bytes = (1L to 40L).map(i => record(i, bodyOf(i)))
      .reduce(_ ++ _)
    java.nio.file.Files.write(dir.resolve("crawl.warc"), bytes)

    val docs = graft.engine.read.Warc.toDocuments(
        graft.engine.read.Warc.scan(spark, dir.toString))
      .select(col("doc_id"), col("text"),
        // mix key from the crawl's own provenance, as a real run would
        (regexp_extract(col("url"), "site(\\d+)", 1).cast("long") % 4)
          .cast("string").as("source"))
    val out = CurationPipeline.curate(docs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "text", "source",
        targetMix = Map("0" -> 1, "1" -> 1, "2" -> 1, "3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L))
    try {
      val kept = out.data.select("doc_id").as[String].collect().toSet
      assert(kept.nonEmpty)
      // the same stages act as in the html run: langid drops %4 docs
      // (they resolve to source bucket 0 — Chinese bodies), quality
      // drops %7, contamination drops 9/19, near-dup drops 5
      assert(!kept.contains("<urn:uuid:20>")) // %4: Chinese
      assert(!kept.contains("<urn:uuid:7>"))  // %7: digit-drenched
      assert(!kept.contains("<urn:uuid:9>"))  // contaminated
      assert(!kept.contains("<urn:uuid:5>"))  // near-dup of seen
      assert(kept.contains("<urn:uuid:1>"))
      val m = out.metrics.toMap
      assert(m("rows_received") == 40L)
      assert(m("mixed_and_packed") == kept.size.toLong)
    } finally out.release()
  }

  test("index-to-corpus: CDXJ selection → range fetch → curate, one program") {
    // The selective-build twin of crawl-to-corpus: index the archive,
    // SELECT a subset through the CDX frame (here: odd sites only),
    // fetch just those byte ranges, and curate — the untouched members
    // are never read.
    import java.nio.charset.StandardCharsets.ISO_8859_1
    def record(id: Long, body: String): Array[Byte] = {
      val payload = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
        s"WARC-Target-URI: http://site$id.example/page\r\n" +
        "WARC-Date: 2026-08-14T06:00:00Z\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes(ISO_8859_1) ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    val dir = tmpDir("idx2corpus")
    java.nio.file.Files.write(dir.resolve("crawl.warc.gz"),
      (1L to 40L).map(i => gz(record(i, bodyOf(i)))).reduce(_ ++ _))
    val idx = dir.resolve("crawl.cdxj").toString
    graft.engine.read.Cdx.writeCdxj(
      graft.engine.read.Cdx.scanWithRanges(spark,
        dir.resolve("crawl.warc.gz").toString), idx, base = dir.toString)
    val selected = graft.engine.read.Cdx.readCdxj(spark, idx)
      .filter(regexp_extract(col("url"), "site(\\d+)", 1)
        .cast("long") % 2 === 1)
    val docs = graft.engine.read.Warc.toDocuments(
        graft.engine.read.Cdx.fetch(selected, base = dir.toString))
      .select(col("doc_id"), col("text"), lit("s").as("source"))
    val out = CurationPipeline.curate(docs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "text", "source",
        targetMix = Map("s" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L))
    try {
      val kept = out.data.select("doc_id").as[String].collect().toSet
      assert(out.metrics.toMap.apply("rows_received") == 20L) // odd ids only
      assert(kept.contains("<urn:uuid:1>"))
      assert(!kept.contains("<urn:uuid:2>"))  // never fetched
      assert(!kept.contains("<urn:uuid:9>"))  // fetched, decontaminated
      assert(!kept.contains("<urn:uuid:5>"))  // fetched, near-dup
      assert(!kept.contains("<urn:uuid:7>"))  // fetched, quality drop
    } finally out.release()
  }

  test("gopher stage drops repetition-degenerate docs, metric shows it") {
    // doc 41 passes langid (en markers) and quality (high stop ratio)
    // but is one 5-gram repeated wall to wall -> only gopher kills it
    val degenerate = (41L, "src1",
      "<html><body><p>" +
        Seq.fill(8)("the alpha beta gamma of").mkString(" ") +
        "</p></body></html>")
    val docs = corpus.union(Seq(degenerate).toDF("doc_id", "source", "html"))
    val loose = RepetitionSignals.GopherThresholds(
      minWords = 5, minMeanWordLen = 0.0, maxMeanWordLen = 100.0)
    val cfgOn = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L,
      gopher = true, gopherThresholds = loose)
    val out = CurationPipeline.curate(docs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text", cfgOn)
    val m = out.metrics.toMap
    assert(m("gopher_kept") < m("quality_kept"),
      "gopher stage dropped nothing")
    assert(!out.data.select("doc_id").as[Long].collect().contains(41L))
    out.release()
    // disabled: flag is constant true, gopher_kept == quality_kept,
    // and doc 41 survives to the output
    val off = CurationPipeline.curate(docs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfgOn.copy(gopher = false))
    val m2 = off.metrics.toMap
    assert(m2("gopher_kept") == m2("quality_kept"))
    assert(off.data.select("doc_id").as[Long].collect().contains(41L))
    off.release()
  }

  test("per-language gopher thresholds keep CJK docs English rules reject") {
    // chrome-free corpus so the n-gram rules (which correctly flag
    // repeated nav chrome in any language) stay out of the way: the
    // Chinese docs are one unsegmented token each — they die under
    // the English-calibrated word rules (tok_n < minWords, zero
    // stopwords) and pass under the CJK preset; the English docs are
    // unaffected by the table
    val cjkDocs = (1L to 8L).map { i =>
      val body =
        if (i % 2 == 0) s"这是第${i}篇完全不同的中文文档讲述数据引擎的设计思路"
        else s"the alpha$i beta$i gamma$i of delta$i epsilon$i and " +
          s"zeta$i eta$i theta$i"
      (i, s"src${i % 4}", s"<html><body><p>$body</p></body></html>")
    }.toDF("doc_id", "source", "html")
    val loose = RepetitionSignals.GopherThresholds(
      minWords = 5, minMeanWordLen = 0.0, maxMeanWordLen = 100.0)
    val base = CurationPipeline.Config("doc_id", "html", "source",
      langId = "trigram",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L,
      gopher = true, gopherThresholds = loose)
    val enOnly = CurationPipeline.curate(cjkDocs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text", base)
    val byLang = CurationPipeline.curate(cjkDocs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      base.copy(gopherByLang = RepetitionSignals.thresholdsByLanguage))
    try {
      val mEn = enOnly.metrics.toMap
      val mBy = byLang.metrics.toMap
      assert(mBy("gopher_kept") > mEn("gopher_kept"),
        s"per-language table kept ${mBy("gopher_kept")}, " +
          s"English-only ${mEn("gopher_kept")}")
      // doc 2 is Chinese, clean, and routed zh by the script gate
      val keptBy = byLang.data.select("doc_id").as[Long].collect().toSet
      val keptEn = enOnly.data.select("doc_id").as[Long].collect().toSet
      assert(keptBy.contains(2L) && !keptEn.contains(2L))
      // the English docs' verdicts are identical under both tables
      assert(keptBy.filter(_ % 2 == 1) == keptEn.filter(_ % 2 == 1))
    } finally { enOnly.release(); byLang.release() }
  }

  test("robots stage drops host-disallowed paths, metric shows it") {
    val docs = corpus
      .withColumn("host", org.apache.spark.sql.functions.lit("ex.com"))
      .withColumn("path",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("/doc/"),
          org.apache.spark.sql.functions.col("doc_id")))
    // disallow /doc/1* for the pipeline's agent -> docs 1, 10-19
    val robots = Seq(("ex.com",
      "User-agent: graftbot\nDisallow: /doc/1")).toDF("host", "robots_txt")
    val cfg = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L,
      hostCol = Some("host"), pathCol = Some("path"))
    val out = CurationPipeline.curate(docs,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg, robots = Some(robots))
    val m = out.metrics.toMap
    assert(m("robots_kept") == 40L - 11L) // ids 1 and 10..19 denied
    assert(m("terms_kept") <= m("robots_kept"))
    val ids = out.data.select("doc_id").as[Long].collect().toSet
    assert(!ids.exists(i => i == 1L || (i >= 10L && i <= 19L)))
    out.release()
    // guards: robots without pathCol, bad frame shape
    intercept[IllegalArgumentException] {
      CurationPipeline.curate(docs,
        Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
        cfg.copy(pathCol = None), robots = Some(robots))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline.curate(docs,
        Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
        cfg, robots = Some(robots.withColumnRenamed("host", "h")))
    }
  }

  test("perplexity stage drops reference-implausible docs, metric shows it") {
    // Reference LM: the survivors' own vocabulary ("the X of Y and Z"
    // scaffold), so ordinary docs score low-ppl. Doc 11 becomes
    // scaffold-free keyboard mash — every bigram lands on the unseen
    // floor D/B, pushing its perplexity far above the rest.
    val mashed = corpus.withColumn("html",
      when(col("doc_id") === 11L,
        lit("<html><body><p>nav | nav | nav</p>" +
          "<p>zxq wvu tsr qpo nml kji hgf edc baz yxw vut srq pon</p>" +
          "</body></html>"))
        .otherwise(col("html")))
    val pplRef = (1L to 40L).map(i => bodyOf(i)).toDF("text")
    val cfg = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L)

    // Without a cutoff the mashed doc survives every other stage
    // (language: it has no markers… force-keep via permissive config?)
    // — mash IS dropped by langid ('unknown'), so instead compare the
    // gate's own metric between a loose and a tight cutoff on the SAME
    // survivor set.
    val loose = CurationPipeline.curate(mashed,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = 1e9), pplRef = Some(pplRef))
    val mLoose = loose.metrics.toMap
    assert(mLoose.contains("perplexity_kept"))
    assert(mLoose("perplexity_kept") == mLoose("quality_kept"),
      "loose cutoff must keep every quality survivor")
    loose.release()

    // Tight cutoff: fit it from the survivors' own score distribution —
    // everything ordinary sits in a narrow band, so a cutoff under the
    // band's ceiling must drop at least one doc and keep most.
    val scored = LanguageModel.kneserNeySelfScore(
      pplRef.withColumn("doc_id", monotonically_increasing_id()),
      "doc_id", "text")
    val cut = scored.agg(avg("kn_ppl")).as[Double].head()
    val tight = CurationPipeline.curate(mashed,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = cut), pplRef = Some(pplRef))
    val mTight = tight.metrics.toMap
    assert(mTight("perplexity_kept") < mLoose("perplexity_kept"),
      "tight cutoff dropped nothing")
    assert(mTight("perplexity_kept") > 0L, "tight cutoff dropped everything")
    assert(mTight("neardup_kept") <= mTight("perplexity_kept"),
      "metric chain stays monotone through the ppl stage")
    tight.release()

    // guard: pplRef without the text column
    intercept[IllegalArgumentException] {
      CurationPipeline.curate(mashed,
        Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
        cfg, pplRef = Some(pplRef.withColumnRenamed("text", "t")))
    }
  }

  test("perplexity stage under an EXTERNAL ARPA model (the real CCNet shape)") {
    // train on the corpus scaffold, EXPORT as ARPA, and gate the
    // pipeline under the exported artifact — the flow a pipeline that
    // ships a KenLM file runs; no pplRef frame involved at gate time
    val pplRef = (1L to 40L).map(i => (i, bodyOf(i))).toDF("rid", "text")
    val arpaPath = tmpDir("ccnet").resolve("ref.arpa").toString
    LanguageModel.saveKn3Arpa(pplRef, "rid", "text", arpaPath)
    val cfg = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L)
    val loose = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = 1e9, pplArpaModel = Some(arpaPath)))
    val mLoose = loose.metrics.toMap
    assert(mLoose("perplexity_kept") == mLoose("quality_kept"))
    loose.release()
    // cutoff fitted from the reference's own trigram self-scores
    val cut = LanguageModel.kneserNey3SelfScore(pplRef, "rid", "text")
      .agg(avg("kn3_ppl")).as[Double].head()
    val tight = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = cut, pplArpaModel = Some(arpaPath)))
    val mTight = tight.metrics.toMap
    assert(mTight("perplexity_kept") < mLoose("perplexity_kept"),
      "tight cutoff dropped nothing under the ARPA model")
    assert(mTight("perplexity_kept") > 0L)
    tight.release()
    // the external model takes precedence over a supplied pplRef
    val both = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = cut, pplArpaModel = Some(arpaPath)),
      pplRef = Some(pplRef.select(col("text"))))
    val mBoth = both.metrics.toMap
    assert(mBoth("perplexity_kept") == mTight("perplexity_kept"))
    both.release()
  }

  test("perplexity stage at order 3 routes through the trigram KN model") {
    val pplRef = (1L to 40L).map(i => bodyOf(i)).toDF("text")
    val cfg = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
      nearDupThreshold = 0.5, packCapacity = 30L, pplOrder = 3)
    // fit the cutoff from the reference's own TRIGRAM distribution; a
    // loose cutoff keeps everything, the mean drops some but not all —
    // same envelope the bigram test pins, one order deeper
    val scored = LanguageModel.kneserNey3SelfScore(
      pplRef.withColumn("doc_id", monotonically_increasing_id()),
      "doc_id", "text")
    val cut = scored.agg(avg("kn3_ppl")).as[Double].head()
    val loose = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = 1e9), pplRef = Some(pplRef))
    val tight = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"), probes, "text",
      cfg.copy(maxPpl = cut), pplRef = Some(pplRef))
    try {
      val mL = loose.metrics.toMap
      val mT = tight.metrics.toMap
      assert(mL("perplexity_kept") == mL("quality_kept"))
      assert(mT("perplexity_kept") < mL("perplexity_kept"))
      assert(mT("perplexity_kept") > 0L)
    } finally { loose.release(); tight.release() }
    intercept[IllegalArgumentException] {
      CurationPipeline.Config("doc_id", "html", "source", pplOrder = 4)
    }
  }

  test("sentence decon mode keeps the page and removes only the leak") {
    val leak = "The forbidden benchmark answer is exactly forty two for sure."
    def doc(i: Long, body: String) =
      (i, "srcA", s"<html><body><p>$body</p></body></html>")
    val withLeak = Seq(
      doc(1L, s"The clean alpha prose with plenty of ordinary words. $leak " +
        "And the clean omega prose with plenty of ordinary words."),
      doc(2L, "A fully clean document with plenty of ordinary english words " +
        "and the usual stopwords in it for the gates."))
      .toDF("doc_id", "source", "html")
    val twin = Seq( // doc 1 authored WITHOUT the leak sentence
      doc(1L, "The clean alpha prose with plenty of ordinary words. " +
        "And the clean omega prose with plenty of ordinary words."),
      doc(2L, "A fully clean document with plenty of ordinary english words " +
        "and the usual stopwords in it for the gates."))
      .toDF("doc_id", "source", "html")
    val seen1 = Seq((900L, "an unrelated seen document about nothing much"))
      .toDF("doc_id", "text")
    def cfg(mode: String) = CurationPipeline.Config("doc_id", "html", "source",
      targetMix = Map("srcA" -> 1), minQuality = 0.0, packCapacity = 200L,
      deconMode = mode)
    def shas(c: CurationPipeline.Curated) =
      c.data.select("doc_id", "content_sha").as[(Long, String)].collect().toMap
    val probes1 = Seq(leak).toDF("text")
    val docMode = CurationPipeline.curate(withLeak,
      Dedup.buildMinhashIndex(seen1, "doc_id", "text"), probes1, "text",
      cfg("doc"))
    val sentMode = CurationPipeline.curate(withLeak,
      Dedup.buildMinhashIndex(seen1, "doc_id", "text"), probes1, "text",
      cfg("sentence"))
    val twinRun = CurationPipeline.curate(twin,
      Dedup.buildMinhashIndex(seen1, "doc_id", "text"), probes1, "text",
      cfg("doc"))
    try {
      // doc mode: the leaking page dies whole
      assert(!shas(docMode).contains(1L))
      // sentence mode: the page survives, and its content digest is
      // byte-identical to the twin authored without the leak sentence
      val s1 = shas(sentMode)
      assert(s1.contains(1L))
      assert(s1(1L) == shas(twinRun)(1L))
      // the clean doc is untouched in every mode
      assert(s1(2L) == shas(docMode)(2L) && s1(2L) == shas(twinRun)(2L))
    } finally { docMode.release(); sentMode.release(); twinRun.release() }
    intercept[IllegalArgumentException] {
      CurationPipeline.Config("doc_id", "html", "source", deconMode = "span")
    }
  }

  test("encoding-repair stage heals mojibake before the gates, metric counts it") {
    val mangled = "itâ€™s a cafÃ© document with plenty of ordinary " +
      "english words and the usual run of common stopwords in it"
    val healed = Mojibake.repair(mangled)
    assert(healed.contains("it’s a café"), "fixture sanity")
    def doc(i: Long, body: String) =
      (i, "srcA", s"<html><body><p>$body</p></body></html>")
    // corpusA carries the mangled doc; corpusB the hand-healed twin —
    // fixEncoding=on over A must land on B's exact content digest
    val corpusA = Seq(doc(1L, mangled),
      doc(3L, "a perfectly clean unique document with plenty of " +
        "ordinary english words and the usual stopwords too"))
      .toDF("doc_id", "source", "html")
    val corpusB = Seq(doc(1L, healed),
      doc(3L, "a perfectly clean unique document with plenty of " +
        "ordinary english words and the usual stopwords too"))
      .toDF("doc_id", "source", "html")
    val seen1 = Seq((900L, "an unrelated seen document about nothing much"))
      .toDF("doc_id", "text")
    val probes1 = Seq("nothing relevant to these docs").toDF("text")
    def go(c: org.apache.spark.sql.DataFrame, fix: Boolean) =
      CurationPipeline.curate(c,
        Dedup.buildMinhashIndex(seen1, "doc_id", "text"), probes1, "text",
        CurationPipeline.Config("doc_id", "html", "source",
          targetMix = Map("srcA" -> 1), minQuality = 0.0,
          packCapacity = 200L, fixEncoding = fix))
    val on = go(corpusA, fix = true)
    val twin = go(corpusB, fix = false)
    val off = go(corpusA, fix = false)
    try {
      val (mOn, mTwin, mOff) =
        (on.metrics.toMap, twin.metrics.toMap, off.metrics.toMap)
      assert(mOn("encoding_fixed") == 1L)
      assert(mTwin("encoding_fixed") == 0L)
      assert(mOff("encoding_fixed") == 0L)
      def shas(c: CurationPipeline.Curated) =
        c.data.select("doc_id", "content_sha").as[(Long, String)]
          .collect().toMap
      val (sOn, sTwin, sOff) = (shas(on), shas(twin), shas(off))
      // repaired text is byte-identical to the authored-clean twin
      assert(sOn(1L) == sTwin(1L))
      // with the stage off, the mangled doc exports mangled
      assert(sOff(1L) != sTwin(1L))
      // untouched docs are untouched in every mode
      assert(sOn(3L) == sTwin(3L) && sOff(3L) == sTwin(3L))
    } finally { on.release(); twin.release(); off.release() }
  }

  test("a pluggable token counter drives n_tok and packing") {
    // a vocab where every byte is one token: n_tok = UTF-8 byte count
    val entries = (0 until 256).map(b =>
      Tiktoken.Entry(Array(b.toByte), b)).toSeq
    val out = CurationPipeline.curate(corpus,
      Dedup.buildMinhashIndex(seen, "doc_id", "text"),
      probes, "text",
      CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("src0" -> 1, "src1" -> 1, "src2" -> 1, "src3" -> 1),
        nearDupThreshold = 0.5, packCapacity = 30L,
        tokenCounter = Some(Tiktoken.countCol(_, entries))))
    val rows = out.data.collect()
    assert(rows.nonEmpty)
    // byte-level counts dwarf whitespace counts: every surviving doc
    // has ~100 chars -> n_tok far above the 10-16 whitespace tokens
    assert(rows.forall(_.getLong(2) > 50L))
    // packing respected the NEW counts: with capacity 30 < any doc's
    // byte count, every doc lands alone in its own pack
    val packs = rows.groupBy(r => (r.getString(1), r.getLong(3)))
    assert(packs.values.forall(_.length == 1))
  }
}
