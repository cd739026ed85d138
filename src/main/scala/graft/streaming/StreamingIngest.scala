package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.ResolvedConfig
import graft.engine.transform.TransformPipeline

/** Streaming face of the engine. The reference is strictly batch
  * (SURVEY.md §7.4 #10) — this module exists for the beyond-reference
  * 100 TB pipeline, where manifests arrive continuously:
  *
  *  - the SAME TransformPipeline column expressions run unchanged on a
  *    stream (they're stateless projections);
  *  - windowed quality/volume metrics use event-time + watermark so
  *    state is bounded;
  *  - first-seen dedup keyed on data_id uses mapGroupsWithState with a
  *    processing-time timeout — the streaming analogue of the keyed
  *    upsert's "insert once, update after" semantics.
  */
object StreamingIngest {

  /** Apply the batch transform pipeline to a streaming manifest — the
    * projection is stateless, so batch/stream parity is structural.
    *
    * REQUIRES a column-derived `data_id` (`uniqueIdColumn` set): the
    * generated-uuid strategy is nondeterministic per EXECUTION, so a
    * crash-replayed microbatch would re-stamp fresh ids and the keyed
    * upsert's replay idempotence ([[upsertSink]]) would insert full
    * duplicates under new keys. Batch runs tolerate uuid ids because
    * the id frame is pinned for the run; a stream replays arbitrarily
    * later.
    */
  def transform(stream: DataFrame, config: ResolvedConfig, runId: String): DataFrame = {
    require(config.uniqueIdColumn.nonEmpty,
      "streaming transform requires data_id from a source column " +
        "(uniqueIdColumn): generated uuids change on microbatch replay, " +
        "breaking the keyed-upsert effectively-once contract")
    TransformPipeline(stream, config, runId)
  }

  /** Event-time windowed counts with a watermark bounding state:
    * (window, typeCol, n, sum_value).
    */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     windowDur: String, watermarkDur: String,
                     valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_value"))

  /** Event-time sessionization: per-key sessions that close after `gap`
    * of inactivity — the streaming face of the batch w2 sessionize
    * query, on Spark's native `session_window` (adjacent windows merge
    * in the state store; the watermark closes and evicts sessions, so
    * state is bounded by OPEN sessions only, never by history). Output:
    * (session_window{start,end}, key, n_events) — append-mode emits
    * each session exactly once, when the watermark passes its close.
    *
    * At 100 TB-scale streams the state is keyed (key, session) and
    * shuffle-partitioned like any streaming aggregate; gap and
    * watermark choose the state bound, not the corpus size.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermarkDur: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDur)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Stream–stream equi+interval join: pair each left event with right
    * events of the same keys whose timestamp lies in
    * `[leftTs + lowerBound, leftTs + upperBound]` — the
    * impression↔click / request↔response shape. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can EVICT state: a buffered row is dropped once the other
    * side's watermark passes its last possible match. Without the
    * interval bounds a stream-stream inner join buffers both sides
    * forever — the condition is what makes 100 TB/day streams hold
    * only a window's worth of state.
    *
    * Bounds are SQL INTERVAL strings (e.g. "0 seconds", "10 minutes");
    * inner join only (outer stream-stream joins emit nulls on
    * watermark close — compose explicitly when needed).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         keys: Seq[String], leftTs: String, rightTs: String,
                         lowerBound: String, upperBound: String,
                         watermark: String): DataFrame = {
    require(keys.nonEmpty, "intervalJoinStream needs at least one key column")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val window =
      r(rightTs) >= l(leftTs) + expr(s"INTERVAL $lowerBound") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperBound")
    // drop the right side's duplicated key columns, keep both ts
    keys.foldLeft(l.join(r, keyCond && window, "inner"))(
      (df, k) => df.drop(r(k)))
  }

  final case class SeenState(firstSeenMs: Long, lastSeenMs: Long, count: Long)

  /** First-seen pass-through dedup on a key column: the first record
    * per key is emitted, later ones dropped (their arrival is counted
    * in state). State is expired on access after `ttlMs` of IDLENESS
    * (measured from the LAST arrival, matching the engine-side
    * ProcessingTimeTimeout eviction, which also re-arms per arrival) —
    * a key idle past the TTL is treated as new again; a continuously
    * active key is NEVER re-emitted, no matter how old its first
    * arrival is.
    *
    * `timeout` defaults to NoTimeout for finite/test feeds
    * (timeout-scheduled batches never quiesce there, which deadlocks
    * processAllAvailable-style harnesses) — under NoTimeout a key that
    * NEVER re-arrives keeps its state row for the query lifetime, so
    * state is bounded by distinct-key cardinality, not by TTL. For
    * production streams pass `ProcessingTimeTimeout`: idle keys are
    * then evicted by the engine `ttlMs` after their last arrival
    * (`state.remove()` on `hasTimedOut`). For watermark-based eviction
    * use `dropDuplicatesWithinWatermark` instead.
    */
  def firstSeen[T](ds: Dataset[(String, T)], ttlMs: Long,
                   now: () => Long = System.currentTimeMillis,
                   timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit e1: org.apache.spark.sql.Encoder[(String, T)],
      e2: org.apache.spark.sql.Encoder[Option[(String, T)]],
      e3: org.apache.spark.sql.Encoder[SeenState]): Dataset[(String, T)] = {
    import ds.sparkSession.implicits._
    val timed = timeout == GroupStateTimeout.ProcessingTimeTimeout
    ds.groupByKey(_._1)
      .mapGroupsWithState[SeenState, Option[(String, T)]](timeout) {
        case (_, _, state) if state.hasTimedOut =>
          state.remove() // idle past TTL: free the state row
          None
        case (_, records, state: GroupState[SeenState]) =>
          val recs = records.toSeq
          val t = now()
          val expired = state.getOption.exists(s => t - s.lastSeenMs > ttlMs)
          val isNew = !state.exists || expired
          val prior =
            if (isNew) SeenState(t, t, 0L)
            else state.get
          state.update(prior.copy(lastSeenMs = t,
            count = prior.count + recs.size))
          if (timed) state.setTimeoutDuration(ttlMs)
          if (isNew) recs.headOption else None
      }
      .flatMap(_.toSeq)
  }

  /** Streaming incremental dedup: drop stream records whose content
    * digest already appears in the STATIC seen corpus — the streaming
    * face of [[graft.ops.Dedup.dedupAgainst]] (same digest encoding,
    * same null semantics), for the "live crawl vs ingested corpus"
    * pass. A stream–static LEFT ANTI join is fully supported by
    * Structured Streaming and stateless on the stream side: the static
    * digest index builds once per microbatch plan (broadcast when
    * small), no watermark or state store involved. For stream-internal
    * duplicates compose with [[firstSeen]] or
    * `dropDuplicatesWithinWatermark` — this pass only guards against
    * the corpus.
    */
  def dedupAgainstStream(stream: DataFrame, seen: DataFrame,
                         on: Seq[String]): DataFrame =
    graft.ops.Dedup.dedupAgainst(stream, seen, on)

  /** [[dedupAgainstStream]] with a Bloom prefilter trained once on the
    * corpus ([[graft.ops.Dedup.digestBloom]]) and broadcast for the
    * query's lifetime: the definitely-new majority of every microbatch
    * bypasses the stream-static anti-join entirely; only maybe-dups
    * (true dups + fpp) probe the corpus digest index. Same keep
    * semantics — Bloom filters have no false negatives.
    */
  def dedupAgainstBloomStream(stream: DataFrame, seen: DataFrame,
                              on: Seq[String],
                              bloom: org.apache.spark.util.sketch.BloomFilter)
      : DataFrame =
    graft.ops.Dedup.dedupAgainstBloomPrefilter(stream, seen, on, bloom)

  /** Streaming NEAR-dup filter against a persisted corpus signature
    * index ([[graft.ops.Dedup.buildMinhashIndex]], loaded once —
    * persist it for the query's lifetime): each microbatch drops rows
    * within jaccard `threshold` of ANY indexed document and hands the
    * KEPT slice to `writeKept` with the batch id.
    *
    * Shaped as `foreachBatch`, not a stream-static join, because the
    * index probe is a multi-action pipeline (candidate materialization,
    * verify checkpoint) that streaming plans cannot express — inside
    * the epoch the microbatch is a plain batch frame and the full
    * index path runs unchanged. At-least-once epoch delivery means
    * `writeKept` must be idempotent (keyed write / overwrite-by-batch),
    * the same contract as [[upsertSink]].
    *
    * Growing the index is the caller's lifecycle, exactly as in batch:
    * append the kept slice's `buildMinhashIndex` rows to the index
    * store from inside `writeKept` (covered by the epoch commit). The
    * STATIC frame passed here does not see appends until the query
    * restarts — within a run, the corpus the stream dedups against is
    * the one loaded at start, which is the same semantics the
    * stream-static exact-dedup joins above provide.
    */
  def nearDupAgainstIndexSink(stream: DataFrame, index: DataFrame,
                              idCol: String, textCol: String,
                              queryName: String, threshold: Double = 0.8,
                              maxBucket: Int = 10000)
                             (writeKept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeKept(graft.ops.Dedup.nearDupAgainstIndex(batch, index,
          idCol, textCol, threshold, maxBucket), batchId)
      }
      .start()

  /** Perceptual near-dup streaming filter for MEDIA payloads — the
    * image/audio/video sibling of [[nearDupAgainstIndexSink]]: each
    * microbatch drops clips/images within `maxHamming` bits of the
    * persisted signature index
    * ([[graft.multimodal.ImageHash.buildImageIndex]] /
    * [[graft.multimodal.AudioFingerprint.buildAudioIndex]] /
    * [[graft.multimodal.VideoFrameHash.buildVideoIndex]] — pick the
    * `medium` to match the index you pass) and hands the kept slice to
    * `writeKept`. Undecodable payloads SURVIVE, as in batch — route
    * them to a validator, not the dedupper. Index growth and epoch
    * idempotence contracts are identical to
    * [[nearDupAgainstIndexSink]].
    */
  def mediaNearDupAgainstIndexSink(stream: DataFrame, index: DataFrame,
                                   idCol: String, bytesCol: String,
                                   queryName: String,
                                   medium: String = "image",
                                   maxHamming: Int = 4,
                                   maxBucket: Int = 1 << 12)
                                  (writeKept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("image", "audio", "video").contains(medium),
      s"medium must be image|audio|video: $medium")
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = medium match {
          case "image" => graft.multimodal.ImageHash.dropNearDuplicateImages(
            batch, index, idCol, bytesCol, maxHamming, maxBucket)
          case "audio" => graft.multimodal.AudioFingerprint
            .dropNearDuplicateAudio(
              batch, index, idCol, bytesCol, maxHamming, maxBucket)
          case _ => graft.multimodal.VideoFrameHash.dropNearDuplicateVideos(
            batch, index, idCol, bytesCol, maxHamming,
            maxBucket = maxBucket)
        }
        writeKept(kept, batchId)
      }
      .start()
  }

  /** The bring-your-own-frames streaming twin of the video arm of
    * [[mediaNearDupAgainstIndexSink]]: the stream delivers
    * `(idCol, frameBytesCol)` FRAME rows from an external keyframe
    * extractor (the H.264 reality); per microbatch, videos whose
    * frame hashes are covered at `minMatchFrac` by the persisted
    * index drop and the surviving videos' frame rows pass to
    * `writeKept`. The index may have been built by EITHER face
    * (MJPEG payload walk or [[graft.multimodal.VideoFrameHash
    * .signatureFromFrames]]) — same hash kernel.
    *
    * CONTRACT: one video's frames must share a microbatch — coverage
    * is evaluated per batch, so frames split across batches would
    * each see partial signatures (group upstream by video before the
    * stream, e.g. one message per video carrying its keyframes).
    */
  def videoFramesNearDupAgainstIndexSink(stream: DataFrame,
                                         index: DataFrame,
                                         idCol: String,
                                         frameBytesCol: String,
                                         queryName: String,
                                         maxHamming: Int = 4,
                                         minMatchFrac: Double = 0.5,
                                         maxBucket: Int = 1 << 12)
                                        (writeKept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = graft.multimodal.VideoFrameHash
          .dropNearDuplicateVideosFromFrames(batch, batch, index, idCol,
            frameBytesCol, maxHamming, minMatchFrac, maxBucket)
        writeKept(kept, batchId)
      }
      .start()

  /** Streaming twin of the signal-level curation gates
    * ([[graft.multimodal.AudioStats.dropDegenerateAudio]] /
    * [[graft.multimodal.ImageStats.dropDegenerateImages]] /
    * [[graft.multimodal.VideoStats.dropStaticVideos]]), in the
    * [[mediaNearDupAgainstIndexSink]] pattern: each microbatch runs
    * the BATCH gate at the batch defaults, so a payload gets the
    * same verdict whether it arrives in a table or on a stream
    * (parity pinned by spec). Undecodable payloads DROP — the
    * quality-gate stance, opposite of the dedup sinks' survive —
    * and the kept slice goes to `writeKept`. Purely per-row
    * (no state, no index): thresholds other than the defaults
    * compose the batch faces inside your own `foreachBatch`.
    */
  def mediaStatsGateSink(stream: DataFrame, bytesCol: String,
                         queryName: String, medium: String = "image")
                        (writeKept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("image", "audio", "video").contains(medium),
      s"medium must be image|audio|video: $medium")
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = medium match {
          case "image" =>
            graft.multimodal.ImageStats.dropDegenerateImages(batch, bytesCol)
          case "audio" =>
            graft.multimodal.AudioStats.dropDegenerateAudio(batch, bytesCol)
          case _ =>
            graft.multimodal.VideoStats.dropStaticVideos(batch, bytesCol)
        }
        writeKept(kept, batchId)
      }
      .start()
  }

  /** Document extraction as a streaming sink: every microbatch runs
    * the magic-routed [[graft.engine.read.DocumentProbe]] over a
    * MIXED binary column — `format` and `text` columns appended,
    * undecodable/encrypted rows DROP when `keepUndecodable` is false
    * (the quality-gate stance) or surface with NULL text otherwise
    * (the inventory stance). The kernel is stateless per row, so
    * batch/stream verdict parity is structural — pinned by
    * StreamingSpec anyway (the house rule: parity is tested, never
    * assumed).
    */
  def documentExtractSink(stream: DataFrame, bytesCol: String,
                          queryName: String,
                          keepUndecodable: Boolean = false)
                         (writeKept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    for (r <- Seq("format", "text", "__pt"))
      require(!stream.columns.contains(r),
        s"input already has a reserved '$r' column")
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        // ONE container parse per row: format and text ride the same
        // probeAndText kernel call
        val withText = batch
          .withColumn("__pt",
            graft.engine.read.DocumentProbe.probeAndTextCol(col(bytesCol)))
          .withColumn("format", col("__pt._1"))
          .withColumn("text", col("__pt._2"))
          .drop("__pt")
        val kept =
          if (keepUndecodable) withText
          else withText.filter(col("text").isNotNull)
        writeKept(kept, batchId)
      }
      .start()
  }

  /** The COMPOSED curation pipeline as a streaming sink: every
    * microbatch runs the full
    * [[graft.ops.CurationPipeline.curate]] program — html extract →
    * language gate → quality gate → segment dedup → near-dup vs the
    * persisted signature index → decontamination → mix reweight →
    * sequence packing — and hands the curated frame plus its stage
    * metrics to `onBatch` (which writes idempotently, exactly like
    * [[upsertSink]]'s contract; per-batch exports go through
    * `cfg.exportDir` as in batch, typically suffixed with the batch
    * id inside `onBatch` instead).
    *
    * Segment dedup and mix reweighting are BATCH-SCOPED here: each
    * microbatch's boilerplate count and mix thresholds see only that
    * batch (the same trade every per-batch curation pipeline makes);
    * corpus-scoped near-dup comes from the static signature index,
    * which follows the [[nearDupAgainstIndexSink]] growth contract.
    * An all-filtered microbatch yields an empty curated frame with
    * 0-metrics — never an error.
    */
  def curateSink(stream: DataFrame, seenIndex: DataFrame,
                 probes: DataFrame, probeTextCol: String,
                 cfg: graft.ops.CurationPipeline.Config,
                 queryName: String)
                (onBatch: (graft.ops.CurationPipeline.Curated, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // curate() runs several actions (stage aggregate, two
        // truncations); cache the microbatch so they hit blocks, not
        // the source, and free everything before the epoch commits —
        // the curated frame itself is checkpoint-backed, so consuming
        // it inside onBatch does not need the cache
        val cached = batch.persist()
        val curated =
          try graft.ops.CurationPipeline.curate(cached, seenIndex,
            probes, probeTextCol, cfg)
          finally cached.unpersist(false)
        try onBatch(curated, batchId)
        finally curated.release()
      }
      .start()

  /** Embedding sibling of [[nearDupAgainstIndexSink]]: microbatches
    * drop vectors within cosine `threshold` of the persisted
    * [[graft.ops.Dedup.buildEmbeddingIndex]]. Same epoch/idempotence
    * and index-growth contracts.
    */
  def embeddingNearDupAgainstIndexSink(stream: DataFrame, index: DataFrame,
                                       idCol: String, vecCol: String,
                                       queryName: String,
                                       threshold: Double = 0.99,
                                       maxBucket: Int = 10000)
                                      (writeKept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeKept(graft.ops.Dedup.embeddingNearDupAgainstIndex(batch, index,
          idCol, vecCol, threshold, maxBucket), batchId)
      }
      .start()

  /** Per-microbatch upsert outcome handed to [[upsertSink]]'s
    * `onBatch` hook. `failedKeys` carries the key-column value of every
    * row that exhausted its retries (the same channel the batch
    * Ingestor routes into RunSummary / API exclusion) so a long-running
    * stream can dead-letter or alert on them machine-readably instead
    * of losing rows behind a log line.
    */
  final case class BatchUpsertReport(queryName: String, batchId: Long,
                                     upserted: Long, failed: Long,
                                     failedKeys: Seq[String]) {
    /** True when the failed-key collection was CAPPED below the failure
      * count ([[graft.engine.sink.JdbcUpsert.write]]'s per-partition
      * cap, protecting the driver under systemic outages): `failedKeys`
      * is then a sample, not the full dead-letter set — `failed` still
      * carries the full magnitude.
      */
    def failedKeysTruncated: Boolean = failed > failedKeys.size
  }

  /** Default `onBatch` hook: stderr on failure, silent on success —
    * the pre-hook behavior, kept as the floor so failures are never
    * completely invisible even when the caller passes nothing.
    */
  def logFailedBatch(r: BatchUpsertReport): Unit =
    if (r.failed > 0)
      System.err.println(
        s"[graft.streaming] ${r.queryName} batch=${r.batchId}: " +
          s"${r.failed} row(s) failed the JDBC upsert " +
          s"(upserted=${r.upserted}) — keys: " +
          r.failedKeys.take(20).mkString(", ") +
          (if (r.failedKeys.size > 20) ", …" else ""))

  /** Production sink: stream → keyed JDBC upsert via `foreachBatch`.
    * Structured Streaming guarantees AT-LEAST-ONCE batch delivery; the
    * upsert is keyed on `cfg.keyColumn`, so a replayed microbatch
    * rewrites the same rows instead of duplicating them — at-least-once
    * delivery + idempotent keyed write = effectively-once in the
    * table, the same invariant the batch Ingestor's upsert relies on.
    * Each microbatch runs the full executor-side `foreachPartition`
    * upsert path (batching, per-row fallback, retry, dialects) —
    * nothing is collected to the driver except the failed KEYS (not
    * rows), which are assumed rare after retries.
    *
    * Rows that exhaust retries must leave a machine-readable trace:
    * the batch Ingestor routes them into RunSummary / API exclusion; a
    * stream has no run summary, so every microbatch reports through
    * `onBatch` (default [[logFailedBatch]]) — wire it to a metrics
    * emitter or a dead-letter writer in production. The hook runs on
    * the driver inside the foreachBatch epoch, so a dead-letter write
    * from it is covered by the same checkpoint commit.
    *
    * Returns the started query; the caller owns its lifecycle
    * (`awaitTermination` in production, `processAllAvailable` + stop
    * in tests).
    */
  def upsertSink(df: DataFrame, cfg: graft.engine.sink.JdbcUpsert.Config,
                 queryName: String,
                 outputMode: OutputMode = OutputMode.Append(),
                 onBatch: BatchUpsertReport => Unit = logFailedBatch)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // Fail loud at sink setup, not silently per batch: without the key
    // column JdbcUpsert.plan yields keyIdx = -1 and write records NO
    // failed keys, so a report could carry failed > 0 with empty
    // failedKeys — defeating dead-lettering (same contract as
    // writeTracked's require).
    require(df.columns.contains(cfg.keyColumn),
      s"upsertSink requires key column '${cfg.keyColumn}' in the stream " +
        s"(columns: ${df.columns.mkString(", ")}) — failed-key " +
        "dead-lettering is keyed on it")
    df.writeStream
      .outputMode(outputMode)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sc = batch.sparkSession.sparkContext
        val up = sc.longAccumulator
        val fail = sc.longAccumulator
        val failedKeys =
          sc.collectionAccumulator[String](s"$queryName-failed-keys")
        graft.engine.sink.JdbcUpsert.write(batch, cfg, up, fail,
          Some(failedKeys))
        onBatch(BatchUpsertReport(queryName, batchId, up.value, fail.value,
          scala.jdk.CollectionConverters.ListHasAsScala(failedKeys.value)
            .asScala.toSeq))
      }
      .start()
  }

  /** Streaming file source: tail a landing directory for new CSV/JSON
    * manifests. The schema is REQUIRED (streaming sources don't infer —
    * the engine's declared ingest schema is the contract anyway, same
    * as the batch CsvReader's explicit all-string read).
    * `maxFilesPerTrigger` is the backpressure knob: a backlogged
    * landing zone (crawler dumping 100k files) is drained in bounded
    * microbatches instead of one giant catch-up batch that OOMs the
    * file-listing and shuffle layers.
    */
  def fileSource(spark: org.apache.spark.sql.SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType,
                 format: String = "csv",
                 maxFilesPerTrigger: Int = 1000,
                 options: Map[String, String] = Map("header" -> "true")): DataFrame =
    spark.readStream
      .format(format)
      .schema(schema)
      .options(options)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** Stream → partitioned parquet lake via Spark's NATIVE file sink,
    * not foreachBatch: the file sink keeps a transactional manifest
    * (`_spark_metadata`) of committed files per epoch, so a microbatch
    * replayed after a crash re-registers the SAME files instead of
    * duplicating rows — exactly-once to the lake, and batch readers of
    * the output directory see only committed files. Layout follows the
    * same rule as [[graft.engine.sink.LakeSink]]: partition columns are
    * directories; file size rides `maxRecordsPerFile` on the session
    * conf when needed.
    */
  def lakeSink(df: DataFrame, path: String, checkpointDir: String,
               queryName: String, partitionBy: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // Same small-files rule as the batch LakeSink: without a
    // repartition on the partition columns, every task of every
    // microbatch opens a writer per partition value it sees —
    // tasks × |values| files PER TRIGGER, compounding into millions of
    // tiny files (and a bloated _spark_metadata) over a day of
    // 1-minute triggers.
    val arranged =
      if (partitionBy.isEmpty) df
      else df.repartition(partitionBy.map(col): _*)
    var w = arranged.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .queryName(queryName)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.start()
  }

  /** Streaming corpus-card maintenance: each microbatch writes its
    * MERGEABLE shard card ([[graft.ops.CorpusStats.shardCard]]) into a
    * card store partitioned by `batch_id` — so the running corpus data
    * card stays current while the stream ingests, without ever
    * rescanning landed data. Idempotent under at-least-once epoch
    * replay: a replayed epoch dynamic-overwrites ONLY its own
    * `batch_id=` partition, so the merged card counts every batch
    * exactly once (the same overwrite-by-batch contract as
    * [[upsertSink]]'s keyed writes). Cards are tiny (rows = key groups
    * × batches, map size = distinct lengths), so [[readCorpusCard]]'s
    * read-time merge is card-sized work, never corpus-sized.
    */
  def corpusCardSink(stream: DataFrame, keys: Seq[String], textCol: String,
                     lenCol: String, storePath: String, queryName: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.CorpusStats.shardCard(batch, keys, textCol, lenCol)
          .withColumn("batch_id", lit(batchId))
          .coalesce(1) // card rows: key groups of ONE batch
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storePath)
      }
      .start()

  /** The current corpus card out of a [[corpusCardSink]] store: merge
    * every batch's shard card, finalize percentiles/estimates.
    */
  def readCorpusCard(spark: org.apache.spark.sql.SparkSession,
                     storePath: String, keys: Seq[String],
                     percentiles: Seq[Double] = Seq(0.5, 0.95)): DataFrame =
    graft.ops.CorpusStats.finalizeCard(
      graft.ops.CorpusStats.mergeCards(
        spark.read.parquet(storePath).drop("batch_id"), keys),
      keys, percentiles)

  /** Convenience: run a streaming frame into an in-memory table and
    * block until all currently-available data is processed (test +
    * local-debug harness; production sinks use foreachBatch → the
    * JdbcUpsert/FileCopy sinks).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    // processAllAvailable + stop (not awaitTermination): queries with
    // state timeouts keep scheduling batches, so "terminated" never
    // arrives for a finite test feed.
    q.processAllAvailable()
    q.stop()
  }
}
