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

  /** The pywb CDX mime marker for revisit records. */
  val RevisitMime = "warc/revisit"

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

  /** One record with its INDEXABLE byte range: for member-per-record
    * gzip archives the compressed member range; for plain archives the
    * record's own byte span. The range is what [[fetch]] needs back.
    */
  final case class RangeRow(
      src_file: String, record_index: Long,
      range_offset: Long, range_length: Long,
      warc_type: String, record_id: String, target_uri: String,
      warc_date: String, content_type: String, payload_digest: String,
      content_length: Long,
      truncated: Boolean, digest_ok: Option[Boolean],
      payload: Array[Byte])

  /** [[Warc.scan]] plus byte ranges — the scan an index WRITER runs
    * over its own crawl output. Gzip archives are walked member by
    * member ([[GzipMembers]] — the compressed ranges only that walk
    * can observe); plain archives emit each record's own span.
    * zstd archives are rejected: their frames compress against a
    * shared embedded dictionary, so a frame range is not
    * independently decompressible and has no honest CDX entry.
    */
  def scanWithRanges(spark: SparkSession, pathGlob: String,
                     maxPayloadBytes: Int = Warc.DefaultMaxPayloadBytes): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    spark.read.format("binaryFile").load(pathGlob)
      .select("path").as[String]
      .repartition(par)
      .mapPartitions { it =>
        it.flatMap { p =>
          val path = new Path(new URI(p))
          val fs = path.getFileSystem(conf.value)
          val fileLen = fs.getFileStatus(path).getLen
          val in = new java.io.BufferedInputStream(fs.open(path), 1 << 16)
          in.mark(4)
          val b0 = in.read(); val b1 = in.read()
          in.reset()
          require(!(b0 == 0x28 && b1 == 0xB5),
            s"$p: zstd archives have no independently decompressible ranges — CDX generation needs plain or member-gzip")
          if (b0 == 0x1F && b1 == 0x8B) {
            var idx = -1L
            GzipMembers.members(in, maxPayloadBytes + (1 << 20)).flatMap { m =>
              Warc.records(new java.io.ByteArrayInputStream(m.bytes),
                  maxPayloadBytes).map { r =>
                idx += 1
                RangeRow(p, idx, m.offset, m.compressedLength,
                  r.warcType, r.recordId.orNull, r.targetUri.orNull,
                  r.warcDate.orNull, r.contentType.orNull,
                  r.header("WARC-Payload-Digest").orNull,
                  r.payload.length.toLong, r.truncated, r.blockDigestOk,
                  r.payload)
              }
            }
          } else {
            // plain: span of record i = [offset_i, offset_{i+1}), the
            // last closing at the file end — one record buffered
            val recs = Warc.records(in, maxPayloadBytes)
            new Iterator[RangeRow] {
              private var prev: Warc.Record =
                if (recs.hasNext) recs.next() else null
              def hasNext: Boolean = prev != null
              def next(): RangeRow = {
                val r = prev
                val end = if (recs.hasNext) { prev = recs.next(); prev.offset }
                  else { prev = null; fileLen }
                RangeRow(p, r.recordIndex, r.offset, end - r.offset,
                  r.warcType, r.recordId.orNull, r.targetUri.orNull,
                  r.warcDate.orNull, r.contentType.orNull,
                  r.header("WARC-Payload-Digest").orNull,
                  r.payload.length.toLong, r.truncated, r.blockDigestOk,
                  r.payload)
              }
            }
          }
        }
      }
      .toDF()
  }

  /** CDXJ entries from a [[scanWithRanges]] frame — `(surt_key, ts,
    * line)` plus the parsed fields, one row per record WITH a target
    * URI (warcinfo/metadata records have no index entry). `base`
    * relativizes `src_file` against the archive root so the written
    * index matches what [[fetch]] resolves with the same base.
    * Status/mime come from the HTTP message for response AND revisit
    * records (one head-only parse via [[Warc.httpHeadStruct]] —
    * revisits store the original's HTTP headers with the body
    * omitted) and from the record otherwise; revisit mime is the pywb
    * marker `warc/revisit`. The digest follows the pywb cdx-indexer
    * convention: the record's STATED `WARC-Payload-Digest` when
    * present (algo prefix stripped — for a revisit this IS the
    * pointer to the original capture), else the sha1-base32 of the
    * HTTP body for responses, else of the record block. Payload
    * digests make two captures of identical content carry the SAME
    * digest (block digests never would — crawl-date headers differ),
    * which is what [[resolveRevisits]] joins on.
    */
  def toCdxj(scanned: DataFrame, base: String = ""): DataFrame = {
    val prefix = if (base.isEmpty) "" else base.stripSuffix("/") + "/"
    val digestOf = udf { (payload: Array[Byte], stated: String,
                          isResp: Boolean) =>
      val normStated = Option(stated).map(_.trim).filter(_.nonEmpty)
        .map(s => if (s.length > 5 && s.substring(0, 5)
          .equalsIgnoreCase("sha1:")) s.substring(5) else s)
      normStated.getOrElse {
        // the fallback hashes the STORED body bytes (after the header
        // block, before any transfer/content decoding) — what the
        // pywb/warcio digesters hash, so our computed digests match
        // crawler-stated ones and externally generated indexes; a
        // decoded-body hash would silently diverge on every chunked
        // or gzip-served page
        val bytes =
          if (isResp)
            Warc.splitHttp(payload, decodeBody = false).map(_.body)
              .getOrElse(payload)
          else payload
        Warc.base32(java.security.MessageDigest.getInstance("SHA-1")
          .digest(bytes))
      }
    }
    val isHttp = col("warc_type").isin("response", "revisit") &&
      coalesce(col("content_type"), lit("")).startsWith("application/http")
    // index only record types archive indexers index (pywb cdx-indexer
    // convention): a 'request' record shares the response's URI+ts and
    // would otherwise surface as a bogus status-200 entry whose fetch
    // returns the request body.
    val indexable = Seq("response", "revisit", "resource", "conversion",
      "metadata")
    val withHttp = scanned
      .filter(col("target_uri").isNotNull &&
        col("warc_type").isin(indexable: _*))
      .withColumn("__http",
        when(isHttp, Warc.httpHeadStruct).otherwise(lit(null)))
    val status = when(col("__http").isNotNull, col("__http._1"))
      .otherwise(lit(200))
    val mime = when(col("warc_type") === "revisit", lit(RevisitMime))
      .otherwise(trim(split(coalesce(
        when(col("__http").isNotNull, col("__http._2")),
        col("content_type"), lit("unk")), ";").getItem(0)))
    // binaryFile paths carry a scheme (`file:/tmp/x/f`); accept the
    // base with or without one, and with any number of leading slashes
    val fileRel =
      if (prefix.isEmpty) col("src_file")
      else regexp_replace(col("src_file"),
        lit("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?/*" +
          java.util.regex.Pattern.quote(prefix.dropWhile(_ == '/'))),
        lit(""))
    val json = to_json(struct(
      col("target_uri").as("url"),
      mime.as("mime"),
      status.cast("string").as("status"),
      digestOf(col("payload"), col("payload_digest"),
        col("warc_type") === "response").as("digest"),
      col("range_length").cast("string").as("length"),
      col("range_offset").cast("string").as("offset"),
      fileRel.as("filename")))
    withHttp
      .withColumn("surt_key", graft.ops.UrlOps.surt(col("target_uri")))
      .withColumn("ts",
        date_format(to_timestamp(col("warc_date")), "yyyyMMddHHmmss"))
      .withColumn("line", concat_ws(" ", col("surt_key"), col("ts"), json))
      .select("surt_key", "ts", "line")
  }

  /** Re-point revisit index entries at the capture that actually
    * holds the payload. Crawlers dedup at crawl time: a re-fetch whose
    * payload digest matches an earlier capture is stored as a tiny
    * `revisit` record (headers only, `WARC-Payload-Digest` naming the
    * original's body digest) — on Common Crawl-class corpora a large
    * share of all records. Fetching a revisit's own byte range yields
    * NO content, so selective corpus builds must resolve them first.
    *
    * Input/output are [[readCdxj]]-shaped frames; output rows all
    * point at payload-bearing ranges — revisit rows keep their own
    * `surt_key`/`ts`/`url`/`status`/`digest` (the capture identity)
    * but take the resolved original's `mime`, `warc_file`,
    * `warc_offset`, `warc_length`, so [[fetch]] and everything
    * downstream compose unchanged. The original chosen for a digest
    * is the EARLIEST capture (min `(ts, warc_file, warc_offset)` —
    * deterministic under shuffles).
    *
    * A revisit whose digest matches no payload-bearing entry
    * (`requireResolved = true`, the default) fails LOUD with the url
    * and digest: the index does not cover the collection the revisits
    * were deduplicated against, and silently dropping content is the
    * kind of quiet corpus shrinkage no pipeline should ship. Pass
    * `requireResolved = false` to drop unresolved revisits instead
    * (a partial-index corpus build that accepts the loss).
    *
    * Scale shape: one equi-join on digest against the (much smaller)
    * per-digest earliest-capture aggregate — the revisit side never
    * amplifies.
    */
  def resolveRevisits(cdx: DataFrame,
                      requireResolved: Boolean = true): DataFrame = {
    val cols = Seq("surt_key", "ts", "url", "mime", "status", "digest",
      "warc_file", "warc_offset", "warc_length")
    val revisits = cdx.filter(col("mime") === RevisitMime)
    val originals = cdx.filter(
      col("mime").isNull || col("mime") =!= RevisitMime)
    val canon = originals
      .filter(col("digest").isNotNull)
      .groupBy(col("digest"))
      .agg(min(struct(col("ts"), col("warc_file"), col("warc_offset"),
        col("warc_length"), col("mime"))).as("__c"))
    val joined = revisits.join(canon, Seq("digest"), "left")
    val guarded =
      if (requireResolved)
        joined.withColumn("__c", when(col("__c").isNull,
            raise_error(concat(lit("unresolvable revisit: "), col("url"),
              lit(" @ "), col("ts"), lit(" digest "),
              coalesce(col("digest"), lit("<null>")),
              lit(" has no payload-bearing capture in this index"))))
          .otherwise(col("__c")))
      else joined.filter(col("__c").isNotNull)
    val repointed = guarded.select(
      col("surt_key"), col("ts"), col("url"),
      col("__c.mime").as("mime"), col("status"), col("digest"),
      col("__c.warc_file").as("warc_file"),
      col("__c.warc_offset").as("warc_offset"),
      col("__c.warc_length").as("warc_length"))
    originals.select(cols.map(col): _*)
      .unionByName(repointed.select(cols.map(col): _*))
  }

  /** Write a sorted single-file CDXJ index (the archive convention:
    * lines ordered by SURT key then timestamp, so range scans and
    * binary searches work) — distributed sort + ordered concat via
    * [[graft.util.OrderedText]].
    */
  def writeCdxj(scanned: DataFrame, path: String, base: String = ""): Unit =
    graft.util.OrderedText.writeSorted(
      toCdxj(scanned, base), Seq("surt_key", "ts"), path)

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
    *
    * `http(s)://` archives (the access path Common Crawl actually
    * serves — `https://data.commoncrawl.org/...` honors `Range`
    * headers; plain Hadoop filesystems don't speak HTTP) resolve via
    * [[rangedGet]], with consecutive same-file entries whose gaps are
    * ≤ [[HttpCoalesceGap]] COALESCED into one spanned GET and sliced
    * per entry — a dense selection of thousands of small records pays
    * a handful of round trips, not one per record, and duplicate
    * ranges (resolved revisits) fetch once. Retries follow the
    * engine's standard 5-attempt exponential backoff on 5xx/408/429
    * and IO errors, with a server-sent `Retry-After` overriding the
    * schedule on throttle statuses and `maxInFlightPerHost` bounding
    * concurrent requests per archive host PER EXECUTOR JVM (see
    * [[hostGate]] — cluster-wide in-flight is `bound × executors`;
    * size a cluster politeness budget with [[perExecutorHostBound]]).
    * Pass a [[FetchMetrics]] to observe request /
    * retry / throttle counters after the job. A server that ignores
    * `Range` (HTTP 200 with the full body) fails LOUD immediately —
    * silently downloading a whole 100 GB archive per record is the
    * failure mode the branch exists to prevent.
    */
  /** Shared per-JVM client for ranged GETs (thread-safe; one instance
    * per executor, like a filesystem handle).
    */
  @transient private lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  /** Retryable statuses: the transient 5xx family plus the two
    * request-pacing statuses — 408 (request timeout) and 429 (too
    * many requests, the throttle `data.commoncrawl.org` actually
    * returns). A parallel selective fetch WILL be throttled at scale;
    * dying loud on the first 429 instead of backing off would kill
    * the whole job on routine rate-limiting.
    */
  private val HttpRetryStatuses = Set(408, 429, 500, 502, 503, 504)

  /** Statuses that count as THROTTLING in the fetch metrics (pacing
    * feedback from the host, as opposed to server faults).
    */
  private val ThrottleStatuses = Set(408, 429)

  /** Upper bound honored for a server-sent `Retry-After` (2 minutes).
    * A hostile or misconfigured header must not park an executor task
    * for hours; past the cap the wait clamps and the remaining
    * attempts still bound total job delay.
    */
  val MaxRetryAfterMs: Long = 120000L

  /** `Retry-After` per RFC 9110 §10.2.3 — `delay-seconds` or an
    * HTTP-date — as milliseconds-to-wait from `nowMs` (0 for a date
    * already past), clamped to [[MaxRetryAfterMs]]. None when absent
    * or unparseable (fall back to the exponential schedule).
    */
  private[read] def retryAfterMs(header: Option[String],
                                 nowMs: Long): Option[Long] =
    header.map(_.trim).filter(_.nonEmpty).flatMap { v =>
      val raw =
        if (v.forall(_.isDigit))
          // clamp BEFORE the ×1000: a 17+-digit delay-seconds would
          // wrap Long negative and sail under the cap
          scala.util.Try(
            math.min(v.toLong, MaxRetryAfterMs / 1000L + 1) * 1000L)
            .toOption
        else scala.util.Try {
          val t = java.time.ZonedDateTime.parse(v,
            java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          math.max(0L, t.toInstant.toEpochMilli - nowMs)
        }.toOption
      raw.map(math.min(_, MaxRetryAfterMs))
    }

  /** Observed counters for a selective HTTP fetch (the A1 run-counter
    * pattern, on Spark accumulators so executor-side events aggregate
    * to the driver): how many ranged GETs went out, how many were
    * retried, how often the host throttled (408/429), and how long
    * the job spent sleeping on throttle backoff. A 100 TB fetch that
    * spent half its wall clock throttled should REPORT that, not hide
    * it in task time.
    */
  final class FetchMetrics(sc: org.apache.spark.SparkContext)
      extends Serializable {
    val requests = sc.longAccumulator("graft.cdx.http.requests")
    val retries = sc.longAccumulator("graft.cdx.http.retries")
    val throttled = sc.longAccumulator("graft.cdx.http.throttled")
    val throttleSleepMs = sc.longAccumulator("graft.cdx.http.throttle_sleep_ms")
    def snapshot: Map[String, Long] = Map(
      "http_requests" -> requests.value,
      "http_retries" -> retries.value,
      "http_throttled" -> throttled.value,
      "throttle_sleep_ms" -> throttleSleepMs.value)
  }

  /** A [[java.util.concurrent.Semaphore]] whose permit count can be
    * retargeted after construction (`reducePermits` is protected in
    * the JDK; this exposes a synchronized resize). Waiters under the
    * old bound drain naturally — a shrink takes effect as permits
    * return.
    */
  private[read] final class HostSemaphore(permits0: Int)
      extends java.util.concurrent.Semaphore(permits0) {
    @volatile private[read] var bound: Int = permits0
    def resize(target: Int): Unit = synchronized {
      if (target > bound) release(target - bound)
      else if (target < bound) reducePermits(bound - target)
      bound = target
    }
  }

  /** Per-host in-flight request gates, one pool per executor JVM (the
    * politeness analogue of [[graft.ops.Links.frontierSchedule]]'s
    * per-host crawl budget): with 32 task threads all fetching from
    * one archive host, an unbounded fan-out IS the reason the host
    * throttles. Keyed by HOST alone — two jobs asking different
    * bounds for the same host share one gate, resized to the latest
    * request, never two independent pools.
    *
    * SCOPE CONTRACT: the gate is JVM-local. At `local[N]` it is a
    * true global bound; on a K-executor cluster the cluster-wide
    * per-host in-flight is `maxInFlightPerHost × K`. Size a cluster
    * politeness budget as `budget / K` (floor 1) — see
    * [[fetch]]'s `maxInFlightPerHost` note and SCALE.md.
    */
  @transient private lazy val hostGates =
    new java.util.concurrent.ConcurrentHashMap[String, HostSemaphore]()

  private[read] def hostGate(host: String, permits: Int): HostSemaphore = {
    val g = hostGates.computeIfAbsent(host, _ => new HostSemaphore(permits))
    if (g.bound != permits) g.resize(permits)
    g
  }

  /** The per-executor `maxInFlightPerHost` that keeps a CLUSTER-WIDE
    * per-host in-flight at `clusterBudget`: the host gate is JVM-local
    * (see [[hostGate]]), so K executors each holding `b` permits put
    * `b×K` requests in flight. K is the CONFIGURED ceiling when one
    * exists (`spark.executor.instances`, or dynamic allocation's
    * `maxExecutors`) — the registered-executor count only as a
    * fallback, because under dynamic allocation executors attach
    * AFTER this is called and each late arrival would otherwise carry
    * the full budget. `clusterBudget / K`, floor 1 — with the floor,
    * tiny budgets on big clusters still overshoot (K × 1 > budget);
    * there the right lever is fewer fetch partitions (SCALE.md), and
    * the archive's own 429 + honored `Retry-After` are the backstop.
    */
  def perExecutorHostBound(clusterBudget: Int,
                           spark: SparkSession): Int = {
    require(clusterBudget >= 1, s"clusterBudget must be >= 1: $clusterBudget")
    val conf = spark.sparkContext.getConf
    def confInt(k: String): Option[Int] =
      conf.getOption(k).flatMap(_.toIntOption).filter(_ >= 1)
    // under dynamic allocation the CEILING is maxExecutors —
    // spark.executor.instances is only the INITIAL count there and
    // must not be consulted first
    val configured =
      if (conf.getBoolean("spark.dynamicAllocation.enabled", false))
        confInt("spark.dynamicAllocation.maxExecutors")
      else confInt("spark.executor.instances")
    // fallback: driver-registered executors, minus the driver itself
    val execs = configured.getOrElse(
      math.max(1, spark.sparkContext.getExecutorMemoryStatus.size - 1))
    math.max(1, clusterBudget / execs)
  }

  /** One `Range: bytes=off..off+len-1` GET with the engine's standard
    * retry posture ([[graft.engine.api.HttpApiClient]]): `maxAttempts`
    * tries, 1s/2s/4s/8s exponential backoff on 5xx/408/429 and IO
    * errors — except that a server-sent `Retry-After` (the way
    * `data.commoncrawl.org` paces clients on 429, and maintenance
    * windows announce themselves on 503) OVERRIDES the exponential
    * wait for that attempt on any retryable status, clamped to
    * [[MaxRetryAfterMs]]. `gate` bounds in-flight requests per host
    * (held around the wire exchange only, never across a backoff
    * sleep, so one throttled task does not serialize its siblings).
    * Fails loud on a non-206 success (server ignored `Range`), a
    * short body, or any other terminal status — a selective-fetch
    * pipeline must never silently read the wrong bytes.
    */
  private[read] def rangedGet(url: String, off: Long, len: Long,
                              maxAttempts: Int = 5,
                              backoffBaseMs: Long = 1000,
                              sleep: Long => Unit = Thread.sleep,
                              gate: Option[java.util.concurrent.Semaphore] = None,
                              metrics: Option[FetchMetrics] = None): Array[Byte] = {
    val req = java.net.http.HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofMinutes(5))
      .header("Range", s"bytes=$off-${off + len - 1}")
      .GET().build()
    var attempt = 0
    var lastErr = "no attempt made"
    // next wait: the exponential schedule unless the previous response
    // carried a Retry-After, which then speaks for the server
    var waitOverrideMs: Option[Long] = None
    var lastWasThrottle = false
    while (attempt < maxAttempts) {
      if (attempt > 0) {
        val wait = waitOverrideMs.getOrElse(backoffBaseMs << (attempt - 1))
        if (lastWasThrottle) metrics.foreach(_.throttleSleepMs.add(wait))
        sleep(wait)
      }
      waitOverrideMs = None
      lastWasThrottle = false
      attempt += 1
      try {
        metrics.foreach(_.requests.add(1))
        gate.foreach(_.acquire())
        val r =
          try httpClient.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofByteArray())
          finally gate.foreach(_.release())
        r.statusCode() match {
          case 206 =>
            val body = r.body()
            if (body.length != len) throw new IllegalStateException(
              s"ranged GET $url@$off+$len returned ${body.length} bytes")
            return body
          case 200 => throw new IllegalStateException(
            s"server ignored Range for $url@$off+$len (HTTP 200 full " +
              "body): refusing to stream the whole archive per record")
          case s if HttpRetryStatuses(s) =>
            lastErr = s"HTTP $s"
            // a retry is an attempt that FOLLOWS — the final failed
            // attempt is not one (retries/requests must read as the
            // true retry rate)
            if (attempt < maxAttempts) metrics.foreach(_.retries.add(1))
            // Retry-After is honored on ANY retryable status — RFC
            // 9110 pairs it with 503 (maintenance windows) as much as
            // with 429; when the server names a wait, it speaks
            waitOverrideMs = retryAfterMs(
              Option(r.headers().firstValue("Retry-After").orElse(null)),
              System.currentTimeMillis())
            if (ThrottleStatuses(s) || waitOverrideMs.isDefined) {
              lastWasThrottle = true
              if (ThrottleStatuses(s)) metrics.foreach(_.throttled.add(1))
            }
          case s => throw new IllegalStateException(
            s"ranged GET $url@$off+$len failed: HTTP $s")
        }
      } catch {
        case e: java.io.IOException =>
          lastErr = s"IO error: ${e.getMessage}"
          if (attempt < maxAttempts) metrics.foreach(_.retries.add(1))
      }
    }
    throw new IllegalStateException(
      s"ranged GET $url@$off+$len failed after $maxAttempts attempts: $lastErr")
  }

  /** Maximum byte gap between selected entries that one spanned HTTP
    * GET bridges ([[fetch]]'s request coalescing). 64 KB of waste per
    * bridge is far cheaper than another round trip on an archive host.
    */
  val HttpCoalesceGap: Long = 1L << 16

  def fetch(cdx: DataFrame, base: String = "",
            maxPayloadBytes: Int = Warc.DefaultMaxPayloadBytes,
            maxRangeBytes: Long = 1L << 30,
            maxInFlightPerHost: Int = 4,
            metrics: Option[FetchMetrics] = None): DataFrame = {
    require(maxInFlightPerHost >= 1,
      s"maxInFlightPerHost must be >= 1: $maxInFlightPerHost")
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
        def open(resolved: String): org.apache.hadoop.fs.FSDataInputStream = {
          if (resolved != openFile) {
            if (in != null) in.close()
            val p = new Path(new URI(resolved))
            in = p.getFileSystem(conf.value).open(p)
            openFile = resolved
          }
          in
        }
        def parse(f: String, off: Long, len: Long,
                  buf: Array[Byte]): Seq[Warc.ScanRow] =
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
        val buf = it.buffered
        // one work unit per iterator step: a single FS range, or — on
        // http(s), where every range is its own round trip — a SPAN of
        // consecutive same-file entries whose gaps are ≤
        // HttpCoalesceGap, fetched with ONE ranged GET and sliced
        // per entry (sorted offsets make the greedy coalesce optimal;
        // overlapping/duplicate ranges, e.g. resolved revisits, fetch
        // once instead of once per entry)
        val out = new Iterator[Seq[Warc.ScanRow]] {
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[Warc.ScanRow] = {
            val (f, off, len) = buf.next()
            require(len > 0 && len <= maxRangeBytes,
              s"CDX range length $len out of (0, $maxRangeBytes] for $f@$off")
            val resolved =
              if (f.contains("://") || f.startsWith("/")) f else prefix + f
            if (resolved.startsWith("http://") ||
                resolved.startsWith("https://")) {
              var entries = Vector((off, len))
              var end = off + len
              var more = true
              while (more && buf.hasNext && buf.head._1 == f) {
                val (_, o2, l2) = buf.head
                val newEnd = math.max(end, o2 + l2)
                if (o2 <= end + HttpCoalesceGap && l2 > 0 &&
                    newEnd - off <= maxRangeBytes) {
                  require(l2 <= maxRangeBytes,
                    s"CDX range length $l2 out of (0, $maxRangeBytes] for $f@$o2")
                  buf.next()
                  entries :+= ((o2, l2))
                  end = newEnd
                } else more = false
              }
              val blob = rangedGet(resolved, off, end - off,
                gate = Some(hostGate(URI.create(resolved).getAuthority,
                  maxInFlightPerHost)),
                metrics = metrics)
              entries.flatMap { case (o, l) =>
                parse(f, o, l, java.util.Arrays.copyOfRange(
                  blob, (o - off).toInt, (o - off + l).toInt))
              }
            } else {
              val s = open(resolved)
              s.seek(off)
              val b = new Array[Byte](len.toInt)
              s.readFully(b)
              parse(f, off, len, b)
            }
          }
        }.flatten
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
