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

  /** Ragged-row detection (S3): Spark's FAILFAST silently IGNORES extra
    * trailing tokens (univocity parses the selected columns and moves
    * on), so `on_bad_lines="error"` parity needs the PERMISSIVE +
    * corrupt-record-column probe: any row whose token count mismatches
    * the header is captured verbatim. One scan; returns up to 5 samples.
    */
  def preflightRagged(spark: SparkSession, path: String, header: Seq[String],
                      opts: CsvOptions = CsvOptions()): Either[String, Unit] = {
    import org.apache.spark.sql.functions._
    val corrupt = "__corrupt_record"
    val schema = StructType(
      header.map(h => StructField(h, StringType, nullable = true)) :+
        StructField(corrupt, StringType, nullable = true))
    val df = spark.read
      .schema(schema)
      .option("header", "true")
      .option("delimiter", opts.delimiter)
      .option("quote", opts.quoteChar)
      .option("escape", opts.escapeChar)
      .option("encoding", opts.encoding)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .csv(path)
    // Spark refuses to answer queries over the corrupt-record column of
    // a raw scan (and with pruning the parser wouldn't even see extra
    // tokens); the documented pattern is to cache the fully-parsed
    // frame, query it, and drop the cache.
    val cached = df.cache()
    val row =
      try cached.agg(
        sum(when(col(corrupt).isNotNull, 1).otherwise(0)).cast("long").as("n"),
        slice(collect_list(col(corrupt)), 1, 5).as("samples")).head()
      finally cached.unpersist()
    val n = row.getAs[Long]("n")
    if (n > 0)
      Left(s"$path: $n malformed row(s) (wrong column count); e.g. " +
        row.getSeq[String](1).mkString("; "))
    else Right(())
  }

  /** Preflights + scan in the reference's order (cheap checks first). */
  def open(spark: SparkSession, path: String,
           opts: CsvOptions = CsvOptions()): Either[List[String], DataFrame] = {
    for {
      _ <- preflightUtf8(spark, path).left.map(List(_))
      header <- preflightHeader(spark, path, opts).left.map(List(_))
      _ <- preflightRagged(spark, path, header, opts).left.map(List(_))
    } yield read(spark, path, header, opts)
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
