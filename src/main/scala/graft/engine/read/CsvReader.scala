package graft.engine.read

import java.nio.charset.{CharacterCodingException, StandardCharsets}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.CsvOptions

/** CSV manifest scan with the reference's preflight battery
  * (SURVEY.md §2.1 S1–S4):
  *
  *  - S2 duplicate-header reject: Spark silently uniquifies duplicate
  *    columns (`a`,`a14`), so the header is probed from the raw first
  *    line BEFORE the scan (`csv_ingestor.py:391-420`).
  *  - S3 ragged-row reject: FAILFAST mode.
  *  - S4 UTF-8 preflight: streaming decode naming the byte offset
  *    (`ingestors/base.py:458-480`); bounded memory, driver-side, single
  *    manifest file.
  *  - String preservation: ALL columns read as StringType from the raw
  *    token — leading-zero codes (`"007"`) survive because no inference
  *    ever runs (`csv_ingestor.py:320-366`). Typing happens later in
  *    [[StrictCast]] against the declared schema.
  */
object CsvReader {

  /** Probe the raw header line; duplicate post-trim names are an error.
    * Returns trimmed header names in file order.
    */
  def preflightHeader(spark: SparkSession, path: String,
                      opts: CsvOptions = CsvOptions()): Either[String, Seq[String]] = {
    val line = readFirstLine(spark, path) match {
      case Some(l) => l
      case None => return Left(s"$path: file is empty (no header line)")
    }
    // Minimal CSV field split honouring quotes (header fields with the
    // delimiter inside quotes — `"a,b",c`).
    val fields = splitCsvLine(line, opts.delimiter.head, opts.quoteChar.head)
    val trimmed = fields.map(_.trim)
    val dupes = trimmed.groupBy(identity).collect { case (h, occ) if occ.size > 1 => h }
    if (dupes.nonEmpty)
      Left(s"Duplicate column header(s) after trimming: ${dupes.toList.sorted.mkString(", ")}")
    else Right(trimmed)
  }

  /** Whole-file UTF-8 probe with byte-offset diagnosis. Streams in 1 MiB
    * blocks — O(1) memory for multi-GB manifests.
    */
  def preflightUtf8(spark: SparkSession, path: String): Either[String, Unit] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val decoder = StandardCharsets.UTF_8.newDecoder()
      val buf = new Array[Byte](1 << 20)
      val bb = java.nio.ByteBuffer.allocate((1 << 20) + 8)
      val cb = java.nio.CharBuffer.allocate(1 << 20)
      var offset = 0L
      var n = in.read(buf)
      while (n > 0) {
        bb.put(buf, 0, n)
        bb.flip()
        val res = decoder.decode(bb, cb, false)
        if (res.isError)
          return Left(s"$path is not valid UTF-8 (invalid byte near offset ${offset + bb.position()})")
        offset += bb.position()
        bb.compact()
        cb.clear()
        n = in.read(buf)
      }
      bb.flip()
      val fin = decoder.decode(bb, cb, true)
      if (fin.isError)
        Left(s"$path is not valid UTF-8 (truncated sequence near offset $offset)")
      else Right(())
    } catch {
      case _: CharacterCodingException =>
        Left(s"$path is not valid UTF-8")
    } finally in.close()
  }

  /** The scan: explicit all-string schema, FAILFAST, header skipped,
    * null vocabulary applied at parse time for tabular categories
    * (`csv_ingestor.py:62-67` — "NA"/"NULL"/"None"; other categories
    * only ""). Spark's `nullValue` takes ONE token, so the richer
    * vocabulary is normalized post-scan by
    * [[graft.functions.GraftFunctions.nullNormalized]] in the transform
    * stage; here "" → null always (emptyValue default).
    */
  def read(spark: SparkSession, path: String, header: Seq[String],
           opts: CsvOptions = CsvOptions()): DataFrame = {
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("delimiter", opts.delimiter)
      .option("quote", opts.quoteChar)
      .option("escape", opts.escapeChar)
      .option("encoding", opts.encoding)
      .option("mode", "FAILFAST")
      .option("enforceSchema", "true")
      .csv(path)
  }

  private val CorruptCol = "__corrupt_record"

  /** PERMISSIVE scan carrying the corrupt-record column (any row whose
    * token count mismatches the header is captured verbatim — Spark's
    * FAILFAST silently IGNORES extra trailing tokens, so
    * `on_bad_lines="error"` parity needs this probe).
    */
  private def permissiveScan(spark: SparkSession, path: String,
                             header: Seq[String], opts: CsvOptions): DataFrame = {
    val schema = StructType(
      header.map(h => StructField(h, StringType, nullable = true)) :+
        StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("delimiter", opts.delimiter)
      .option("quote", opts.quoteChar)
      .option("escape", opts.escapeChar)
      .option("encoding", opts.encoding)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** Corrupt-row count + ≤5 samples over a PERSISTED permissive frame.
    * Spark refuses queries that reference only the corrupt column of a
    * raw scan (and with pruning the parser wouldn't even see extra
    * tokens); the documented pattern is to persist the fully-parsed
    * frame first — callers own the persist/unpersist lifecycle.
    */
  private def corruptStats(persisted: DataFrame): (Long, Seq[String]) = {
    import org.apache.spark.sql.functions._
    val row = persisted.agg(
      sum(when(col(CorruptCol).isNotNull, 1).otherwise(0)).cast("long").as("n"),
      slice(collect_list(col(CorruptCol)), 1, 5).as("samples")).head()
    (Option(row.getAs[Long]("n")).getOrElse(0L), row.getSeq[String](1))
  }

  /** Ragged-row detection (S3) as a standalone check. One PERMISSIVE
    * parse, DISK_ONLY persist (no executor-memory pressure on multi-GB
    * manifests), dropped before returning. Prefer [[open]], which
    * shares this parse with the returned scan instead of re-reading.
    */
  def preflightRagged(spark: SparkSession, path: String, header: Seq[String],
                      opts: CsvOptions = CsvOptions()): Either[String, Unit] = {
    val cached = permissiveScan(spark, path, header, opts)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val (n, samples) = try corruptStats(cached) finally cached.unpersist()
    if (n > 0)
      Left(s"$path: $n malformed row(s) (wrong column count); e.g. " +
        samples.mkString("; "))
    else Right(())
  }

  /** Preflights + scan in the reference's order (cheap checks first),
    * parsing the file ONCE: the PERMISSIVE scan that feeds the
    * ragged-row check is persisted DISK_ONLY, and on success the clean
    * projection is re-persisted FROM that cache (a column drop, no
    * re-parse) before the parse-time cache is released. The returned
    * frame is therefore already persisted at MEMORY_AND_DISK — exactly
    * the state downstream (which scans the manifest once per validator)
    * wants; callers release it with `unpersist()` when the run ends.
    */
  def open(spark: SparkSession, path: String,
           opts: CsvOptions = CsvOptions()): Either[List[String], DataFrame] = {
    for {
      _ <- SourcePreflight.check(spark, path).left.map(List(_))
      _ <- preflightUtf8(spark, path).left.map(List(_))
      header <- preflightHeader(spark, path, opts).left.map(List(_))
      df <- {
        val full = permissiveScan(spark, path, header, opts)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val (n, samples) =
          try corruptStats(full)
          catch { case t: Throwable => full.unpersist(); throw t }
        if (n > 0) {
          full.unpersist()
          Left(List(s"$path: $n malformed row(s) (wrong column count); e.g. " +
            samples.mkString("; ")))
        } else {
          val clean = full.drop(CorruptCol).persist()
          clean.count() // materialize from the parse-time cache, then free it
          full.unpersist()
          Right(clean)
        }
      }
    } yield df
  }

  private def readFirstLine(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      // Strip a UTF-8 BOM so the first header name isn't mangled
      // (Excel exports routinely carry one).
      Option(reader.readLine()).map(_.stripPrefix("\uFEFF")).filter(_.nonEmpty)
    } finally in.close()
  }

  private[read] def splitCsvLine(line: String, delim: Char, quote: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == quote) {
        if (inQuote && i + 1 < line.length && line.charAt(i + 1) == quote) {
          cur.append(quote); i += 1 // escaped quote
        } else inQuote = !inQuote
      } else if (c == delim && !inQuote) {
        out += cur.result(); cur.clear()
      } else cur.append(c)
      i += 1
    }
    out += cur.result()
    out.result()
  }
}
