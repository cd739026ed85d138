package graft.engine.read

import java.io.ByteArrayInputStream
import java.net.URI

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.util.SerializableConfiguration

/** CDX(J) crawl-index source — the planned-access face of the WARC
  * reader. Common Crawl (and every OpenWayback-family archive)
  * publishes a per-snapshot index whose lines are
  *
  * {{{
  * com,example)/path 20240101123456 {"url": "http://example.com/path",
  *   "mime": "text/html", "status": "200", "digest": "AAAB…",
  *   "length": "1234", "offset": "5678",
  *   "filename": "crawl-data/…/file.warc.gz"}
  * }}}
  *
  * i.e. a SURT key, a 14-digit timestamp, and a JSON blob locating the
  * record as a BYTE RANGE of a WARC file (Common Crawl gzips each
  * record as its own member precisely so these ranges are
  * independently decompressible). Selective corpus builds go through
  * this index — fetch the 0.1% of records you want instead of
  * streaming the 100 TB snapshot — so an engine that can only
  * full-scan WARCs cannot run the workflows archives actually serve.
  *
  * Scale shape: the index parse is one distributed text scan (pure
  * column expressions — a 300 GB index parses like any text table, and
  * pushes the surt/status/mime filters down before any WARC byte is
  * touched); the fetch repartitions selected entries BY FILE and
  * sorts by offset within the partition, so each task walks its files
  * forward with one open stream and monotone seeks — object-store
  * range reads, never a full-file download. No reference analogue
  * (`base.py` walks pre-extracted trees); format per the pywb/
  * OpenWayback CDXJ spec and ISO 28500 record framing.
  */
object Cdx {

  private val jsonSchema = StructType(Seq(
    StructField("url", StringType), StructField("mime", StringType),
    StructField("status", StringType), StructField("digest", StringType),
    StructField("length", StringType), StructField("offset", StringType),
    StructField("filename", StringType)))

  /** Distributed CDXJ parse: one row per index line —
    * `(surt_key, ts, url, mime, status, digest, warc_file,
    * warc_offset, warc_length)`. Malformed lines (no JSON blob, no
    * numeric offset/length) are DROPPED — an index shard is advisory
    * routing data, not the archive itself; the fetch fails loud on
    * bytes that do not frame. Filters composed on the result reach
    * the text scan (predicate pushdown on the line parse).
    */
  def readCdxj(spark: SparkSession, pathGlob: String): DataFrame = {
    val line = "^(\\S+)\\s+(\\d{14})\\s+(\\{.*\\})\\s*$"
    spark.read.textFile(pathGlob).toDF("value")
      .select(
        regexp_extract(col("value"), line, 1).as("surt_key"),
        regexp_extract(col("value"), line, 2).as("ts"),
        regexp_extract(col("value"), line, 3).as("__json"))
      .filter(col("__json") =!= "")
      .select(col("surt_key"), col("ts"),
        from_json(col("__json"), jsonSchema).as("__j"))
      .select(col("surt_key"), col("ts"),
        col("__j.url").as("url"), col("__j.mime").as("mime"),
        col("__j.status").cast("int").as("status"),
        col("__j.digest").as("digest"),
        col("__j.filename").as("warc_file"),
        col("__j.offset").cast("long").as("warc_offset"),
        col("__j.length").cast("long").as("warc_length"))
      .filter(col("warc_file").isNotNull &&
        col("warc_offset").isNotNull && col("warc_length").isNotNull)
  }

  /** Fetch the WARC records a CDX frame points at, as the
    * [[Warc.ScanRow]] schema (so [[Warc.toDocuments]] and every
    * downstream curation stage compose unchanged). `cdx` needs
    * `warc_file`, `warc_offset`, `warc_length`; `base` resolves
    * relative index filenames against the archive root (Common Crawl
    * indexes store paths relative to the data bucket).
    *
    * Each selected entry is an independent byte range: the task seeks
    * to `warc_offset`, reads `warc_length` bytes, decompresses the
    * member (gzip by magic; plain ranges pass through) and parses the
    * record(s) inside. Entries are grouped by file and walked in
    * offset order — one open stream per file, monotone forward seeks.
    * A range that does not frame as WARC fails LOUD with file+offset:
    * a corrupt index silently yielding wrong records is the worst
    * outcome an archive pipeline can have.
    */
  def fetch(cdx: DataFrame, base: String = "",
            maxPayloadBytes: Int = Warc.DefaultMaxPayloadBytes,
            maxRangeBytes: Long = 1L << 30): DataFrame = {
    val spark = cdx.sparkSession
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val prefix = if (base.isEmpty) "" else base.stripSuffix("/") + "/"
    cdx.select(col("warc_file").cast("string"),
        col("warc_offset").cast("long"), col("warc_length").cast("long"))
      .repartition(col("warc_file"))
      .sortWithinPartitions("warc_file", "warc_offset")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var openFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def open(f: String): org.apache.hadoop.fs.FSDataInputStream = {
          if (f != openFile) {
            if (in != null) in.close()
            val resolved =
              if (f.contains("://") || f.startsWith("/")) f else prefix + f
            val p = new Path(new URI(resolved))
            in = p.getFileSystem(conf.value).open(p)
            openFile = f
          }
          in
        }
        val out = it.flatMap { case (f, off, len) =>
          require(len > 0 && len <= maxRangeBytes,
            s"CDX range length $len out of (0, $maxRangeBytes] for $f@$off")
          val s = open(f)
          s.seek(off)
          val buf = new Array[Byte](len.toInt)
          s.readFully(buf)
          try {
            Warc.records(Warc.maybeGunzip(new ByteArrayInputStream(buf)),
                maxPayloadBytes)
              .map(r => Warc.ScanRow(f, r.recordIndex, off, r.warcType,
                r.recordId.orNull, r.targetUri.orNull, r.warcDate.orNull,
                r.contentType.orNull, r.payload.length.toLong,
                r.truncated, r.blockDigestOk, r.payload))
              .toSeq
          } catch {
            case e: Exception => throw new IllegalStateException(
              s"CDX range $f@$off+$len does not frame as WARC: ${e.getMessage}", e)
          }
        }
        // close the last stream only after the iterator drains
        new Iterator[Warc.ScanRow] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && in != null) { in.close(); in = null }
            h
          }
          def next(): Warc.ScanRow = out.next()
        }
      }
      .toDF()
  }
}
