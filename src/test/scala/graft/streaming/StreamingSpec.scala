package graft.streaming

import java.sql.Timestamp

// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.{ResolvedConfig, TaskCategory}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:00:10"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:50"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 00:01:10"), "view", 3.0))
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingIngest.windowedCounts(events, "ts", "event_type",
      "1 minute", "2 minutes")
    StreamingIngest.runToMemory(agg, "win_counts", OutputMode.Complete())
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(
      ("2024-01-01 00:00:00", "click", 2L),
      ("2024-01-01 00:01:00", "view", 1L)))
  }

  test("session windows merge within gap, close after it, evict on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    input.addData(
      // user a: two events 40s apart (one session at gap=1min), then a
      // third 5 min later (second session)
      (Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
      (Timestamp.valueOf("2024-01-01 00:00:40"), "a"),
      (Timestamp.valueOf("2024-01-01 00:06:00"), "a"),
      (Timestamp.valueOf("2024-01-01 00:00:30"), "b"))
    val events = input.toDF().toDF("ts", "user")
    val agg = StreamingIngest.sessionCounts(events, "ts", "user",
      gap = "1 minute", watermarkDur = "0 seconds")
    // push the watermark far past every session close
    input.addData((Timestamp.valueOf("2024-01-02 00:00:00"), "z"))
    StreamingIngest.runToMemory(agg, "sessions", OutputMode.Append())
    val rows = spark.table("sessions")
      .select(col("session_window.start").cast("string"),
        col("session_window.end").cast("string"), col("user"), col("n_events"))
      .as[(String, String, String, Long)].collect().toSet
    // closed sessions emitted exactly once; z's session is still open
    assert(rows == Set(
      ("2024-01-01 00:00:00", "2024-01-01 00:01:40", "a", 2L),
      ("2024-01-01 00:06:00", "2024-01-01 00:07:00", "a", 1L),
      ("2024-01-01 00:00:30", "2024-01-01 00:01:30", "b", 1L)))
  }

  test("foreachBatch upsert sink: stream lands in the table, replays idempotent") {
    import java.sql.DriverManager
    import graft.core.SqlType
    import graft.engine.sink.JdbcUpsert
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:streamdb;create=true"
    val cfg = JdbcUpsert.Config(url, "st", JdbcUpsert.GenericDialect)
    val conn0 = DriverManager.getConnection(url)
    try assert(JdbcUpsert.ensureTable(cfg,
      Seq("v" -> SqlType.DoubleT)).isRight)
    finally conn0.close()

    val input = MemoryStream[(String, Double)]
    // Failure hook: every microbatch must surface a machine-readable
    // report (the streaming stand-in for the batch RunSummary).
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[StreamingIngest.BatchUpsertReport]
    val q = StreamingIngest.upsertSink(
      input.toDF().toDF("data_id", "v"), cfg, "st_upsert",
      onBatch = r => reports.synchronized { reports += r })
    try {
      input.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      // second microbatch: new key + an update of an existing key —
      // the keyed upsert must not duplicate "a"
      input.addData(("a", 10.0), ("c", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.map(r => (r.upserted, r.failed)) == Seq((2L, 0L), (2L, 0L)))
    assert(reports.forall(_.failedKeys.isEmpty))

    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery(
      """SELECT "data_id", "v" FROM "st" ORDER BY "data_id"""")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getString(1), r.getDouble(2))).toList
    conn.close()
    assert(rows == List(("a", 10.0), ("b", 2.0), ("c", 3.0)))
  }

  test("upsertSink refuses a stream without the key column") {
    import graft.engine.sink.JdbcUpsert
    implicit val sqlCtx = spark.sqlContext
    val cfg = JdbcUpsert.Config("jdbc:derby:memory:nokeydb;create=true",
      "nk", JdbcUpsert.GenericDialect)
    val input = MemoryStream[(String, Double)]
    // Without this guard keyIdx = -1 and failures would report with
    // EMPTY failedKeys — dead-lettering silently defeated.
    val e = intercept[IllegalArgumentException] {
      StreamingIngest.upsertSink(
        input.toDF().toDF("not_the_key", "v"), cfg, "nk_upsert")
    }
    assert(e.getMessage.contains("data_id"))
  }

  test("BatchUpsertReport.failedKeysTruncated flags a capped key sample") {
    import graft.streaming.StreamingIngest.BatchUpsertReport
    val full = BatchUpsertReport("q", 0L, 1L, 2L, Seq("a", "b"))
    val capped = BatchUpsertReport("q", 0L, 0L, 1000L, Seq("a", "b"))
    assert(!full.failedKeysTruncated)
    assert(capped.failedKeysTruncated)
  }

  test("file source → strict cast → partitioned lake sink, end to end") {
    import org.apache.spark.sql.types._
    import graft.core.SqlType
    import graft.engine.read.StrictCast

    val landing = tmpDir("landing")
    val outDir = tmpDir("lakeout").toString + "/docs"
    val ckpt = tmpDir("ckpt").toString

    write(landing.resolve("batch1.csv"),
      "doc_id,lang,n_chars\n1,en,10\n2,de,20\nx,en,junk\n")

    val schema = StructType(Seq(
      StructField("doc_id", StringType), StructField("lang", StringType),
      StructField("n_chars", StringType)))
    val declared = Seq("doc_id" -> SqlType.BigIntT, "n_chars" -> SqlType.BigIntT)

    val stream = StreamingIngest.fileSource(spark, landing.toString, schema)
    // JSON-category disposition on the stream: keep valid rows, type them
    val typed = StrictCast.cast(
      stream.filter(StrictCast.validRowFilter(declared)), declared)

    val q = StreamingIngest.lakeSink(typed, outDir, ckpt, "lake_e2e", Seq("lang"))
    try {
      q.processAllAvailable()
      val first = spark.read.parquet(outDir)
      assert(first.count() == 2) // 'x/junk' row skipped by disposition
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(outDir, "lang=en")))
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(outDir, "_spark_metadata")))

      // a second file lands: only the delta is processed and appended
      write(landing.resolve("batch2.csv"), "doc_id,lang,n_chars\n4,fr,40\n")
      q.processAllAvailable()
      val back = spark.read.parquet(outDir)
      assert(back.count() == 3)
      import spark.implicits._
      assert(back.filter($"lang" === "fr").select("doc_id").as[Long]
        .collect().toSeq == Seq(4L))
      // typed end to end: declared casts applied on the stream
      assert(back.schema("doc_id").dataType == LongType)
      assert(back.schema("n_chars").dataType == LongType)
    } finally q.stop()
  }

  test("transform pipeline runs unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    input.addData(("1.5", "cat", "r1"), ("2.5", "dog", "r2"), ("3.5", "cat", ""))
    val manifest = input.toDF().toDF("f0", "target", "rid")
    val cfg = ResolvedConfig(
      category = TaskCategory.TabularClassification,
      tableName = "t", intent = "train", dataFormat = "csv", sourcePath = "/x",
      schema = Seq("f0" -> "FLOAT", "target" -> "VARCHAR(10)", "rid" -> "VARCHAR(10)"),
      labelColumn = Some("target"), uniqueIdColumn = Some("rid"))
    val out = StreamingIngest.transform(manifest, cfg, "stream-run")
    StreamingIngest.runToMemory(out, "stream_transform", OutputMode.Append())
    val rows = spark.table("stream_transform")
      .select("data_id", "label", "data_intent").as[(String, String, String)]
      .collect().toSet
    // blank rid dropped; standard columns stamped
    assert(rows == Set(("r1", "cat", "train"), ("r2", "dog", "train")))
  }

  test("firstSeen stateful dedup emits one record per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    input.addData(("k1", "v1"), ("k1", "v1-dup"), ("k2", "v2"), ("k1", "v1-dup2"))
    val out = StreamingIngest.firstSeen(input.toDS(), ttlMs = 60000)
    StreamingIngest.runToMemory(out.toDF("key", "value"), "first_seen",
      OutputMode.Update())
    val rows = spark.table("first_seen").as[(String, String)].collect().toSet
    assert(rows.map(_._1) == Set("k1", "k2"))
    assert(rows.contains(("k1", "v1"))) // the FIRST record won
  }

  test("stream-stream interval join pairs within the window, state evicts") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(String, String)]  // (key, ts)
    val clicks = MemoryStream[(String, String)]
    def tsify(df: org.apache.spark.sql.DataFrame, c: String) =
      df.withColumn(c, col(c).cast("timestamp"))
    val joined = StreamingIngest.intervalJoinStream(
      tsify(imps.toDF().toDF("key", "imp_ts"), "imp_ts"),
      tsify(clicks.toDF().toDF("key", "click_ts"), "click_ts"),
      Seq("key"), "imp_ts", "click_ts",
      lowerBound = "0 seconds", upperBound = "10 minutes",
      watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:00:00"))
      clicks.addData(
        ("a", "2024-01-01 00:05:00"),  // in window → pairs
        ("a", "2024-01-01 00:20:00"),  // past upper bound → no pair
        ("b", "2023-12-31 23:59:00"),  // before the impression → no pair
        ("c", "2024-01-01 00:01:00"))  // no matching impression
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val rows = spark.table("ssjoin").select("key", "imp_ts", "click_ts")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
    assert(rows.map(_._1) == Seq("a"))
    assert(rows.head._3.toString.startsWith("2024-01-01 00:05"))
  }

  test("firstSeen TTL measures idleness, not age: active keys never re-emit") {
    implicit val sqlCtx = spark.sqlContext
    val clock = new java.util.concurrent.atomic.AtomicLong(0L)
    val input = MemoryStream[(String, String)]
    val out = StreamingIngest.firstSeen(input.toDS(), ttlMs = 100,
      now = () => clock.get())
    val q = out.toDF("key", "value").writeStream
      .format("memory").queryName("first_seen_idle")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("k", "v0"))         // t=0: new, emitted
      q.processAllAvailable()
      clock.set(60)
      input.addData(("k", "v60"))        // t=60: idle 60 < 100, dropped
      q.processAllAvailable()
      clock.set(130)
      input.addData(("k", "v130"))       // t=130: idle 70 < 100 — but AGE
      q.processAllAvailable()            // is 130 > ttl; must NOT re-emit
      clock.set(250)
      input.addData(("k", "v250"))       // idle 120 > 100: genuinely new
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    val vals = spark.table("first_seen_idle").as[(String, String)]
      .collect().map(_._2).toSet
    assert(vals == Set("v0", "v250"))
  }

  test("stream-static incremental dedup drops corpus matches, passes novel rows") {
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val input = MemoryStream[(Long, String)]
    input.addData((10L, "alpha"), (11L, "gamma"))
    val out = StreamingIngest.dedupAgainstStream(
      input.toDF().toDF("id", "text"), seen, Seq("text"))
    StreamingIngest.runToMemory(out, "stream_dedup", OutputMode.Append())
    // more data arrives: another corpus dup and another novel row; a
    // fresh query over the same source re-reads everything
    input.addData((12L, "beta"), (13L, "delta"))
    val out2 = StreamingIngest.dedupAgainstStream(
      input.toDF().toDF("id", "text"), seen, Seq("text"))
    StreamingIngest.runToMemory(out2, "stream_dedup2", OutputMode.Append())
    val ids1 = spark.table("stream_dedup").select("id").as[Long].collect().toSet
    val ids2 = spark.table("stream_dedup2").select("id").as[Long].collect().toSet
    assert(ids1 == Set(11L))
    assert(ids2 == Set(11L, 13L)) // fresh query re-reads all data: dups still drop
  }

  test("bloom-prefiltered stream dedup: same verdicts, novel rows skip the join") {
    implicit val sqlCtx = spark.sqlContext
    val seen = (1L to 100L).map(i => (i, s"corpus doc $i")).toDF("id", "text")
    val bloom = graft.ops.Dedup.digestBloom(seen, Seq("text"), expectedItems = 1000L)
    val input = MemoryStream[(Long, String)]
    input.addData((10L, "corpus doc 7"), (11L, "novel crawl page"),
      (12L, "corpus doc 42"), (13L, "another new one"))
    val out = StreamingIngest.dedupAgainstBloomStream(
      input.toDF().toDF("id", "text"), seen, Seq("text"), bloom)
    StreamingIngest.runToMemory(out, "bloom_stream", OutputMode.Append())
    val ids = spark.table("bloom_stream").select("id").as[Long].collect().toSet
    assert(ids == Set(11L, 13L))
  }

  test("streaming near-dup vs signature index: near-dups drop per microbatch") {
    implicit val sqlCtx = spark.sqlContext
    // Doc 1 is long (30 tokens) so a one-token truncation stays above
    // jaccard 0.8; the index is built once.
    val longDoc = (1 to 30).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, longDoc),
      (2L, "an entirely different corpus document about stream processing"))
      .toDF("id", "text")
    val index = graft.ops.Dedup.buildMinhashIndex(corpus, "id", "text").persist()
    val kept = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (batch, id)
    val input = MemoryStream[(Long, String)]
    val q = StreamingIngest.nearDupAgainstIndexSink(
      input.toDF().toDF("id", "text"), index, "id", "text", "neardup_sink") {
      (keptDf, batchId) =>
        kept.synchronized {
          kept ++= keptDf.select("id").as[Long].collect().map(batchId -> _)
        }
    }
    // Batch 0: a near-dup of doc 1 (last token dropped, jaccard ≈ 0.96)
    // and a novel doc. Batch 1: a verbatim copy of doc 2 and another novel.
    input.addData(
      (10L, (1 to 29).map(i => s"word$i").mkString(" ")),
      (11L, "completely novel crawl content with no overlap whatsoever okay"))
    q.processAllAvailable()
    input.addData((12L, "an entirely different corpus document about stream processing"),
      (13L, "yet another genuinely new page of text for the second batch"))
    q.processAllAvailable()
    q.stop()
    index.unpersist()
    assert(kept.map(_._2).toSet == Set(11L, 13L))
  }

  test("streaming media near-dup: perceptual index filter per microbatch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.MediaTestBuilders.grayPng
    val grad = grayPng(9, 8, (x, _) => 28 * x)
    val grad2x = grayPng(18, 16, (x, _) => 14 * x) // same picture at 2x
    val stripes = grayPng(9, 8, (x, _) => if (x % 2 == 1) 255 else 0)
    val index = graft.multimodal.ImageHash.buildImageIndex(
      Seq((100L, grad)).toDF("img_id", "content"), "img_id", "content")
      .persist()
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingIngest.mediaNearDupAgainstIndexSink(
      input.toDF().toDF("id", "content"), index, "id", "content",
      "media_neardup_sink") { (keptDf, _) =>
      kept.synchronized { kept ++= keptDf.select("id").as[Long].collect() }
    }
    // the resized copy of the indexed picture drops; the different
    // picture and the undecodable payload survive
    input.addData((10L, grad2x), (11L, stripes), (12L, "broken".getBytes))
    q.processAllAvailable()
    q.stop()
    index.unpersist()
    assert(kept.toSet == Set(11L, 12L))
  }

  test("streaming media stats gates: batch verdict parity per microbatch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.MediaTestBuilders
    import graft.multimodal.MediaTestBuilders.grayPng
    // image: flat fill and broken bytes drop, checkerboard survives
    val imgRows = Seq(
      (0L, grayPng(16, 16, (_, _) => 77)),
      (1L, grayPng(16, 16, (x, y) => if ((x + y) % 2 == 0) 0 else 255)),
      (2L, "broken".getBytes))
    // audio: a half-scale 375 Hz tone survives; near-total silence
    // and broken bytes drop
    val sr = 8000
    def tone(a: Double) =
      Array.tabulate(sr)(i => a * math.sin(2 * math.Pi * 375 * i / sr))
    val audRows = Seq(
      (0L, MediaTestBuilders.wav16(Array.fill(sr)(0.0), sr)),
      (1L, MediaTestBuilders.wav16(tone(0.5), sr)),
      (2L, "broken".getBytes))
    // video: a one-frame-repeated clip drops as static, a montage of
    // distinct frames survives, broken bytes drop
    val f = MediaTestBuilders.jpegFrame(31)
    val g = MediaTestBuilders.jpegFrame(113)
    val vidRows = Seq(
      (0L, MediaTestBuilders.avi(MediaTestBuilders.movi(Seq(f, f, f, f)))),
      (1L, MediaTestBuilders.avi(MediaTestBuilders.movi(Seq(f, g, f, g)))),
      (2L, "broken".getBytes))

    for ((medium, rows, batchGate) <- Seq(
      ("image", imgRows, (df: org.apache.spark.sql.DataFrame) =>
        graft.multimodal.ImageStats.dropDegenerateImages(df, "content")),
      ("audio", audRows, (df: org.apache.spark.sql.DataFrame) =>
        graft.multimodal.AudioStats.dropDegenerateAudio(df, "content")),
      ("video", vidRows, (df: org.apache.spark.sql.DataFrame) =>
        graft.multimodal.VideoStats.dropStaticVideos(df, "content")))) {
      val batchKept = batchGate(rows.toDF("id", "content"))
        .select("id").as[Long].collect().toSet
      val kept = scala.collection.mutable.ArrayBuffer[Long]()
      val input = MemoryStream[(Long, Array[Byte])]
      val q = StreamingIngest.mediaStatsGateSink(
        input.toDF().toDF("id", "content"), "content",
        s"stats_gate_$medium", medium) { (keptDf, _) =>
        kept.synchronized { kept ++= keptDf.select("id").as[Long].collect() }
      }
      input.addData(rows: _*)
      q.processAllAvailable()
      q.stop()
      assert(kept.toSet == batchKept, s"medium $medium parity")
      assert(batchKept == Set(1L), s"medium $medium verdicts")
    }
  }

  test("streaming BYO-frames video near-dup: covered videos drop per microbatch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.MediaTestBuilders.jpegFrame
    val framesA = (0 until 8).map(i => jpegFrame(29 + 2 * i))
    val framesB = (0 until 8).map(i => jpegFrame(101 + 5 * i))
    // index built from frame rows (signatureFromFrames IS the index
    // schema); the stream delivers keyframes of a copy, a new clip,
    // and an undecodable-frame video
    val index = graft.multimodal.VideoFrameHash.signatureFromFrames(
        framesA.map(f => (0L, f)).toDF("video_id", "frame"),
        "video_id", "frame")
      .persist()
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingIngest.videoFramesNearDupAgainstIndexSink(
      input.toDF().toDF("vid", "frame"), index, "vid", "frame",
      "byo_frames_sink") { (keptDf, _) =>
      kept.synchronized {
        kept ++= keptDf.select("vid").distinct().as[Long].collect()
      }
    }
    input.addData(
      framesA.take(4).map(f => (20L, f)) ++  // contained copy: drops
      framesB.map(f => (21L, f)) :+          // new clip: survives
      ((22L, "not pixels".getBytes)): _*)    // no signature: survives
    q.processAllAvailable()
    q.stop()
    index.unpersist()
    assert(kept.toSet == Set(21L, 22L))
  }

  test("streaming composed curation: full pipeline per microbatch") {
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq((100L,
      "the seen corpus document with many stable words that keeps " +
        "going for a while longer here and one extra")).toDF("doc_id", "text")
    val index = graft.ops.Dedup.buildMinhashIndex(seen, "doc_id", "text")
      .persist()
    val probes = Seq("the benchmark answer alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa").toDF("text")
    def html(body: String) = s"<html><body><p>$body</p></body></html>"
    val results = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingIngest.curateSink(
      input.toDF().toDF("doc_id", "source", "html"), index, probes, "text",
      graft.ops.CurationPipeline.Config("doc_id", "html", "source",
        targetMix = Map("s0" -> 1, "s1" -> 1), nearDupThreshold = 0.5,
        packCapacity = 30L),
      "curate_sink") { (curated, batchId) =>
      results.synchronized {
        val m = curated.metrics.toMap
        results += ((batchId, m("rows_in"), curated.data.count()))
      }
    }
    // batch 0: one keeper, one near-dup of the seen corpus, one
    // contaminated (its text IS the probe), one non-language doc
    input.addData(
      (1L, "s0", html("the fresh document about alpha1 beta1 gamma1 and " +
        "delta1 words of the usual prose")),
      (2L, "s1", html("the seen corpus document with many stable words " +
        "that keeps going for a while longer here")),
      (3L, "s0", html("the benchmark answer alpha beta gamma delta " +
        "epsilon zeta eta theta iota kappa")),
      (4L, "s1", html("这是一个中文文档没有英文标记词")))
    q.processAllAvailable()
    // batch 1: empty-after-filters (all non-language) — must not error
    input.addData((5L, "s0", html("另一个中文文档也没有标记词")))
    q.processAllAvailable()
    q.stop()
    index.unpersist()
    val byBatch = results.toList.sortBy(_._1)
    assert(byBatch.map(_._1) == List(0L, 1L))
    assert(byBatch(0)._2 == 4L) // rows_in
    assert(byBatch(0)._3 == 1L) // only the fresh doc survives
    assert(byBatch(1)._2 == 1L && byBatch(1)._3 == 0L) // empty batch ok
  }

  test("streaming embedding near-dup vs sign-sketch index") {
    implicit val sqlCtx = spark.sqlContext
    val dim = 16
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => math.sin(seed * 31 + i * 7).toFloat)
    val corpus = Seq((1L, vec(1)), (2L, vec(2))).toDF("id", "emb")
    val index = graft.ops.Dedup.buildEmbeddingIndex(corpus, "id", "emb").persist()
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingIngest.embeddingNearDupAgainstIndexSink(
      input.toDF().toDF("id", "emb"), index, "id", "emb", "embdup_sink") {
      (keptDf, _) =>
        kept.synchronized { kept ++= keptDf.select("id").as[Long].collect() }
    }
    input.addData((10L, vec(1)),  // exact copy of corpus vec 1 → dropped
      (11L, vec(99)))             // decorrelated → kept
    q.processAllAvailable()
    q.stop()
    index.unpersist()
    assert(kept.toSet == Set(11L))
  }

  test("corpus card sink: streamed batches merge to the whole-corpus card, replays idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.CorpusStats
    val store = tmpDir("cardstore").toString + "/cards"
    val input = MemoryStream[(Long, String, String)]
    def row(i: Long) = (i, if (i % 2 == 0) "en" else "de", s"stream doc $i " + ("w " * (i % 5).toInt))
    val q = StreamingIngest.corpusCardSink(
      input.toDF().toDF("id", "lang", "text")
        .withColumn("n_chars", length(col("text")).cast("long")),
      Seq("lang"), "text", "n_chars", store, "card_sink")
    try {
      input.addData((1L to 40L).map(row): _*)
      q.processAllAvailable()
      input.addData((41L to 90L).map(row): _*)
      q.processAllAvailable()
    } finally q.stop()

    def fields(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "n_docs", "n_empty", "total_tokens", "avg_tokens",
        "p50_len", "p95_len")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
            r.getDouble(5), r.getDouble(6)))).toMap

    val all = (1L to 90L).map(row).toDF("id", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val direct = fields(CorpusStats.finalizeCard(
      CorpusStats.shardCard(all, Seq("lang"), "text", "n_chars"), Seq("lang")))
    val streamed = fields(
      StreamingIngest.readCorpusCard(spark, store, Seq("lang")))
    assert(streamed == direct)

    // epoch replay: re-land batch 1's card under the SAME batch_id —
    // the dynamic partition overwrite must replace, not double-count
    CorpusStats.shardCard((41L to 90L).map(row).toDF("id", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long")),
      Seq("lang"), "text", "n_chars")
      .withColumn("batch_id", lit(1L))
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(store)
    assert(fields(StreamingIngest.readCorpusCard(spark, store, Seq("lang"))) == direct)
  }

  test("streaming document extraction: batch-vs-stream parity on a mixed column") {
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.{DocxFixture, LegacyDocFixture, PdfFixture}
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (0L, PdfFixture.simplePdf(Seq(
        s"BT /F1 12 Tf ${PdfFixture.lit("stream pdf")} Tj ET"))),
      (1L, DocxFixture.docx(Seq(
        DocxFixture.para(DocxFixture.T("stream docx"))))),
      (2L, "{\\rtf1 stream rtf\\par}".getBytes("ISO-8859-1")),
      (3L, LegacyDocFixture.doc(Seq(LegacyDocFixture.Piece(
        "secret\r", compressed = true)), encrypted = true)),
      (4L, Array[Byte](0, 1, 2, 3, 4)), // binary junk (text ROUTES now)
      // the r14 routes stream identically: modern Office, mail, html
      (5L, graft.queries.XlsxFixture.xlsx1(
        Seq(graft.queries.XlsxFixture.Inline("A1", "stream xlsx")),
        sharedStrings = None)),
      (6L, "From: a@b.c\r\nTo: l@b.c\r\n\r\nstream eml".getBytes("UTF-8")),
      (7L, "<html><body>stream html</body></html>".getBytes("UTF-8")))

    val batchDf = rows.toDF("id", "content")
    val batchKept = batchDf
      .withColumn("text",
        graft.engine.read.DocumentProbe.textCol(col("content")))
      .filter(col("text").isNotNull)
      .select("id", "text").as[(Long, String)].collect().toMap

    val got = scala.collection.mutable.Map[Long, (String, String)]()
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingIngest.documentExtractSink(
      input.toDF().toDF("id", "content"), "content", "doc_extract_sink") {
      (keptDf, _) =>
        got.synchronized {
          keptDf.select("id", "format", "text")
            .collect().foreach(r =>
              got(r.getLong(0)) = (r.getString(1), r.getString(2)))
        }
    }
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    assert(got.keySet == batchKept.keySet)
    assert(got.view.mapValues(_._2).toMap == batchKept)
    assert(got(0L)._1 == "pdf" && got(1L)._1 == "docx" && got(2L)._1 == "rtf")
    assert(got(5L)._1 == "xlsx" && got(6L)._1 == "eml" && got(7L)._1 == "html")
    assert(batchKept == Map(0L -> "stream pdf", 1L -> "stream docx",
      2L -> "stream rtf", 5L -> "stream xlsx", 6L -> "stream eml",
      7L -> "stream html"))

    // inventory stance: undecodable rows surface with NULL text
    val all = scala.collection.mutable.Map[Long, Option[String]]()
    val input2 = MemoryStream[(Long, Array[Byte])]
    val q2 = StreamingIngest.documentExtractSink(
      input2.toDF().toDF("id", "content"), "content",
      "doc_extract_keep", keepUndecodable = true) { (df, _) =>
      all.synchronized {
        df.select("id", "format").collect().foreach(r =>
          all(r.getLong(0)) = Option(r.getString(1)))
      }
    }
    input2.addData(rows: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(all.size == 8)
    assert(all(3L).contains("doc")) // encrypted classifies, text NULL
    assert(all(4L).isEmpty) // junk: no format at all
  }
}
