package graft.engine

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ResolvedConfig, SqlType, TaskCategory}
import graft.engine.api.{ApiClient, MetaRecord}
import graft.engine.read.{CsvReader, JsonReader, StrictCast}
import graft.engine.sink.{FileCopySink, JdbcUpsert, RunSummary}
import graft.engine.transform.TransformPipeline
import graft.engine.validate.ValidatorMapping

/** The execution pipeline (SURVEY.md §3.2 `_ingest_with_lock`):
  *
  *  lock → validate (ALL validators, errors accumulated) → scan →
  *  transform → [sidecar copy] → upsert → api batch send →
  *  registration (fail-loud) → summary → unlock.
  *
  * Differences from the reference are purely architectural: the
  * per-record Python loop becomes DataFrame stages, the per-batch DB/
  * API calls become foreachPartition sinks, counters become
  * accumulators. Semantics (failure channels, dispositions, ordering)
  * match SURVEY.md §2/§7.4.
  */
object Ingestor {
  /** Raised inside the metadata-send task when `ApiClient.sendBatch`
    * returns Left — fails the task, and job cancellation stops FURTHER
    * batches once it propagates to the executors (fail-loud,
    * `base.py:858-918`). Guarantees are deliberately modest: tasks
    * already running may complete their in-flight sends after the first
    * terminal failure, and a retried or speculative task replays every
    * batch in its partition, acknowledged ones included. Sends are
    * therefore at-least-once per PARTITION, and the backend must treat
    * `MetaRecord` registration as idempotent keyed on `data_id` (the
    * reference backend upserts on data_id, `api/client.py:217-284`).
    */
  final class ApiSendException(msg: String) extends RuntimeException(msg)

  /** Walks the (Spark-wrapped) cause chain of a failed send job for
    * the originating [[ApiSendException]] message.
    */
  private[engine] def apiSendError(e: Throwable): Option[String] = {
    var cur = e
    val seen = scala.collection.mutable.Set.empty[Throwable]
    while (cur != null && seen.add(cur)) {
      cur match {
        case a: ApiSendException => return Some(a.getMessage)
        case _ => cur = cur.getCause
      }
    }
    None
  }
}

final class Ingestor(spark: SparkSession, config: ResolvedConfig,
                     api: ApiClient, jdbc: Option[JdbcUpsert.Config],
                     lockDir: String = "/tmp/graft-locks") {

  final case class RunResult(summary: RunSummary, errors: List[String],
                             warnings: List[String]) {
    def exitCode: Int =
      if (errors.nonEmpty) 2
      else if (summary.hasFailures) 1
      else 0
  }

  def ingest(runId: String = java.util.UUID.randomUUID().toString): RunResult = {
    val summary = new RunSummary(spark)
    val lock = new TableLock(lockDir, config.tableName)
    lock.acquire(runId) match {
      case Left(err) => return RunResult(summary, List(err), Nil)
      case Right(_) => ()
    }
    try ingestLocked(runId, summary)
    finally lock.release()
  }

  private def ingestLocked(runId: String, summary: RunSummary): RunResult = {
    // ---- 1. scan (preflights first — UTF-8, duplicate headers) -------
    val manifestOrErr: Either[List[String], DataFrame] =
      config.dataFormat match {
        case "csv" => CsvReader.open(spark, config.sourcePath, config.csvOptions)
        case "json" =>
          // File-bearing categories also need the sidecar filename
          // column (it is NOT part of the declared feature schema —
          // StandardColumns.check forbids that name there).
          val fnameCol =
            if (TaskCategory.fileBearingCategories.contains(config.category))
              Seq(config.fileOptions.get("filename_column")
                .map(String.valueOf(_)).getOrElse("filename"))
            else Nil
          val columns = config.schema.map(_._1) ++
            config.labelColumn ++ config.annotationColumn ++
            config.uniqueIdColumn ++ fnameCol
          JsonReader.open(spark, config.sourcePath, columns.distinct)
        case other => Left(List(s"Unsupported data format '$other'"))
      }
    val manifest = manifestOrErr match {
      case Left(errs) => return RunResult(summary, errs, Nil)
      // CsvReader.open returns an ALREADY-persisted frame (the clean
      // projection re-persisted from its parse-time cache); calling
      // cache() again would only log a CacheManager warning. The JSON
      // reader returns a raw scan, so that path persists here.
      case Right(df) => if (config.dataFormat == "json") df.cache() else df
    }
    var cachedTyped: Option[DataFrame] = None
    var cachedVerdicts: Option[DataFrame] = None
    var cachedFailedKeys: Option[DataFrame] = None

    try {
      // ---- 2. validator battery (ALL run; errors accumulate) ---------
      val ctx = ValidationContext(spark, config, Some(manifest))
      val validation = ValidatorMapping.runAll(ValidatorMapping.forConfig(config), ctx)
      if (!validation.isValid)
        return RunResult(summary, validation.errors, validation.warnings)

      val total = manifest.count()
      summary.totalRecords.add(total)

      // ---- 3. transform (P1–P9) + typed cast -------------------------
      // File-bearing categories name their sidecar column via
      // file_options.filename_column (default "filename").
      val filenameColumn: Option[String] =
        if (TaskCategory.fileBearingCategories.contains(config.category))
          Some(config.fileOptions.get("filename_column").map(String.valueOf(_))
            .getOrElse("filename"))
            .filter(manifest.columns.contains)
        else None
      val transformed = TransformPipeline(manifest, config, runId, filenameColumn)
      val parsedSchema = SqlType.parseSchema(config.schema) match {
        case Right(p) => p.filterNot { case (c, _) =>
          Set(config.labelColumn, config.annotationColumn, config.uniqueIdColumn)
            .flatten.contains(c)
        }
        case Left(errs) => return RunResult(summary, errs, validation.warnings)
      }
      // Persistence of the TYPED frame is strategy-dependent. The
      // pipeline runs several actions (counts, copy verdicts, JDBC
      // write, API send); with uuid() data_ids an uncached re-execution
      // would regenerate DIFFERENT ids per action, breaking the
      // upsert-key ↔ API-metadata contract — so uuid runs MUST pin the
      // frame. Column-derived data_ids make every stage deterministic,
      // and re-deriving the typed projection from the (already cached)
      // manifest is cheap codegen work — pinning a second full-table
      // copy at the 100 TB design point would double the cache
      // footprint for nothing.
      val typedBase =
        if (config.dataFormat == "json")
          // JSON disposition: bad record = skip with warning, not fatal.
          // No separate count action: cast() is a pure projection, so
          // the survivor count IS the processed count measured below.
          StrictCast.cast(
            transformed.filter(StrictCast.validRowFilter(parsedSchema)),
            parsedSchema)
        else StrictCast.cast(transformed, parsedSchema)
      val typed =
        if (config.uniqueIdColumn.isEmpty) {
          // localCheckpoint, NOT persist: a plain cache recomputes lost
          // partitions FROM LINEAGE, and uuid() would then mint fresh
          // ids between the JDBC upsert and the API send — exactly the
          // committed-rows ↔ metadata divergence the pinning exists to
          // prevent. Checkpointing truncates the lineage, so losing a
          // block fails the job loudly instead of silently forking ids
          // (fail > corrupt). Eager: materialized here, counted below.
          val pinned = typedBase.localCheckpoint(eager = true)
          cachedTyped = Some(pinned)
          pinned
        } else typedBase

      val processedCount = typed.count()
      summary.processed.add(processedCount)
      // Skip-channel reconciliation rides the SAME single action: rows
      // vanish between manifest and typed either via P4's null/blank
      // data_id drop (base.py:315-326) or, for JSON, the per-record
      // cast disposition (json.py "skip with warning") — both land in
      // the skipped channel so the banner reconciles.
      if (total > processedCount)
        summary.skipped.add(total - processedCount)

      // ---- 3b. sidecar copy for file-bearing categories: a failed
      //          transfer drops the record BEFORE the DB and counts in
      //          its own channel (`base.py:780-830`) ------------------
      val sinkReady = copySpecFor(config) match {
        case Some(spec) =>
          val copied = spark.sparkContext.longAccumulator("sidecars_copied")
          val verdicts = FileCopySink.copy(typed, spec, copied,
            summary.fileTransferFailures,
            spark.sparkContext.hadoopConfiguration)
          cachedVerdicts = Some(verdicts)
          // Keep only records whose whole sidecar group copied.
          val okFiles = verdicts.filter(col("__transfer_ok"))
            .select(col("__file").as("__okfile")).distinct()
          typed.join(okFiles,
            FileCopySink.resolvedNameCol(col("filename"), col("extension"))
              === col("__okfile"), "left_semi")
        case None => typed
      }

      // ---- 4. sink: keyed upsert, executor-side. Failed keys come
      //         back as a DataFrame (writeTracked), never a driver
      //         collection — at the 100 TB design point even the failed
      //         subset may be unbounded. Row count rides the same pass
      //         as an observe() metric, so the upsert is ONE action. ---
      jdbc.foreach { cfg =>
        JdbcUpsert.ensureTable(cfg, parsedSchema) match {
          case Left(errs) => return RunResult(summary, errs, validation.warnings)
          case Right(_) => ()
        }
        val rowsObs = Observation()
        val observed = sinkReady.observe(rowsObs, count(lit(1)).as("rows"))
        val failed = JdbcUpsert.writeTracked(observed, cfg).persist()
        cachedFailedKeys = Some(failed)
        val nFailed = failed.count() // materializes → upsert runs once
        val nRows = rowsObs.get("rows").asInstanceOf[Long]
        summary.inserted.add(nRows - nFailed)
        summary.failedDb.add(nFailed)
      }

      // ---- 5. API metadata batches, sent FROM EXECUTORS
      //         (foreachPartition): only (data_id, intent, label)
      //         travels, in config.batchSize chunks, and never through
      //         the driver (`api/client.py:217-284` sends per-batch
      //         inside the ingest loop). Rows that FAILED the upsert
      //         are excluded via left_anti — registering metadata for a
      //         data_id that is not in the table would violate the
      //         committed-rows ↔ metadata invariant. A batch failure
      //         aborts the task (fail-loud); cluster task retries make
      //         the send at-least-once, same as the reference's
      //         retried per-batch POSTs. -------------------------------
      val metaReady = cachedFailedKeys match {
        case Some(failed) =>
          sinkReady.join(failed, col("data_id") === failed("failed_key"), "left_anti")
        case None => sinkReady
      }
      val sendRows = metaReady.select(col("data_id"), col("data_intent"), col("label"))
      // Without a JDBC sink the send pass is the only full-pipeline
      // action — the inserted counter rides it as an observe() metric
      // instead of paying a second execution for a count().
      val sentObs = Observation()
      val observedSend =
        if (jdbc.isEmpty) sendRows.observe(sentObs, count(lit(1)).as("rows"))
        else sendRows
      // Local copies: the task closure must not capture `this` (the
      // SparkSession field is not serializable).
      val client = api
      val tableName = config.tableName
      val batchSize = config.batchSize
      val ingestorId = runId
      val apiSent = summary.apiSent
      try {
        observedSend.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.grouped(batchSize).foreach { chunk =>
            val records = chunk.map(r => MetaRecord(
              r.getString(0), r.getString(1),
              if (r.isNullAt(2)) null else r.getString(2),
              isSample = false, ingestorId = ingestorId)).toSeq
            client.sendBatch(tableName, records) match {
              case Right(n) => apiSent.add(n.toLong)
              case Left(err) => throw new Ingestor.ApiSendException(err)
            }
          }
        }
      } catch {
        case e: Throwable => Ingestor.apiSendError(e) match {
          case Some(msg) => return RunResult(summary,
            List(s"API batch send failed: $msg"), validation.warnings)
          case None => throw e
        }
      }
      if (jdbc.isEmpty)
        summary.inserted.add(sentObs.get("rows").asInstanceOf[Long])

      // ---- 6. registration sequence — REQUIRED, fail-loud ------------
      val schemaJson = parsedSchema
        .map { case (c, t) => s""""$c": "${t.ddl}"""" }.mkString("{", ", ", "}")
      val selfSupervised = config.category == TaskCategory.MaskedLanguageModeling
      api.registerDataset(config.tableName, schemaJson, selfSupervised) match {
        case Left(err) => return RunResult(summary,
          List(s"Dataset registration failed AFTER rows were committed — " +
            s"manual re-registration required: $err"), validation.warnings)
        case Right(_) => ()
      }

      RunResult(summary, Nil, validation.warnings)
    } finally {
      cachedFailedKeys.foreach(_.unpersist())
      cachedVerdicts.foreach(_.unpersist())
      cachedTyped.foreach(_.unpersist())
      manifest.unpersist()
    }
  }

  /** Sidecar copy plan per category (`file_transfer.py:325-431`'s
    * dispatcher): OD = atomic image+xml, semseg = atomic image+mask,
    * others = single-dir copy. Requires a destination; without one the
    * run is transfer-free (dry run / tabular).
    */
  private def copySpecFor(cfg: ResolvedConfig): Option[FileCopySink.CopySpec] =
    cfg.destPath.flatMap { dest =>
      cfg.category match {
        case TaskCategory.ObjectDetection =>
          for (i <- cfg.images; a <- cfg.annotations)
            yield FileCopySink.CopySpec.imageXml(i, a, dest)
        case TaskCategory.SemanticSegmentation | TaskCategory.InstanceSegmentation =>
          for (i <- cfg.images; m <- cfg.masks)
            yield FileCopySink.CopySpec.imageMask(i, m, dest)
        case TaskCategory.ImageClassification | TaskCategory.KeypointDetection =>
          cfg.images.map(FileCopySink.CopySpec.single(_, dest))
        case TaskCategory.TextClassification | TaskCategory.TokenClassification =>
          cfg.texts.map(FileCopySink.CopySpec.single(_, dest))
        case TaskCategory.MaskedLanguageModeling =>
          cfg.sequences.map(FileCopySink.CopySpec.single(_, dest))
        case _ => None
      }
    }
}
