package graft.engine.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General tar archive source — public corpora ship as tar far more
  * often than as loose files (arXiv source dumps, Pile components,
  * academic mirrors), and [[graft.engine.sink.TarShardSink]] only
  * reads its OWN strict shard subset. This reader takes wild tars
  * from-spec (POSIX.1-1988 ustar + the two long-name mechanisms):
  *
  *  - classic headers with the ustar `prefix` field (155+100 names)
  *  - GNU long names (typeflag 'L': the NEXT entry's name rides a
  *    data block) and long link names ('K', skipped)
  *  - PAX extended headers (typeflag 'x'/'g': `len key=value\n`
  *    records; `path=` overrides the following entry's name)
  *  - regular files extracted; directories, links, FIFOs, devices
  *    and the PAX/GNU meta entries themselves are structural
  *  - checksum verified when present (signed-byte recompute
  *    tolerated — the historic bug the spec documents); zero-block
  *    terminator or a torn tail both end the walk with the members
  *    read so far (the crawl posture)
  *  - per-member and total-bytes caps: a tar bomb fails the ARCHIVE
  *    row, never the executor
  *
  * Spark-first shape: archives load whole via `binaryFile` (tar has
  * no mid-file sync marker, so the FILE is the natural split unit;
  * size caps bound task memory — the WebDataset norm keeps shards
  * 100 MB–1 GB), then ONE kernel walk explodes members as rows.
  * `.tar.gz`/`.tgz`, `.tar.zst` (RFC 8878), `.tar.bz2` and `.tar.xz`
  * payloads decompress first (magic-detected, output-capped).
  * Compose with [[DocumentProbe]] for text:
  * {{{
  *   Tar.members(spark, "/corpora/arxiv/&#42;.tar")
  *     .withColumn("format", document_format($"content"))
  *     .withColumn("text", document_text($"content"))
  * }}}
  */
object Tar {

  /** One archive member. */
  final case class Member(name: String, size: Long, bytes: Array[Byte])

  val DefaultMaxMemberBytes: Long = 256L << 20
  val DefaultMaxTotalBytes: Long = 1L << 30
  val DefaultMaxMembers: Int = 100000

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // GNU base-256 extension: high bit of the first byte set.
    // 12 bytes can encode 95 bits — more than a Long — and a hostile
    // size must not wrap negative (a negative/absurd size would walk
    // `pos` backwards and index the buffer below zero). Saturate to -1
    // so the caller's `size < 0` guard ends the walk on the row.
    if ((b(off) & 0x80) != 0) {
      v = (b(off) & 0x7F).toLong
      i += 1
      while (i < end) {
        if (v > (Long.MaxValue >> 8)) return -1L
        v = (v << 8) | (b(i) & 0xFF)
        i += 1
      }
      return v
    }
    var seen = false
    while (i < end) {
      val c = b(i)
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (seen) return v
      i += 1
    }
    v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, StandardCharsets.UTF_8)
  }

  /** Header checksum: unsigned sum with the checksum field as spaces;
    * the historic signed-byte variant is accepted too.
    */
  private def checksumOk(h: Array[Byte], off: Int): Boolean = {
    val stored = parseOctal(h, off + 148, 8)
    if (stored == 0) return true // some writers leave it blank
    var unsigned = 0L
    var signed = 0L
    var i = 0
    while (i < 512) {
      val raw = if (i >= 148 && i < 156) ' '.toByte else h(off + i)
      unsigned += raw & 0xFF
      signed += raw
      i += 1
    }
    stored == unsigned || stored == signed
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + 512
    while (i < end) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** PAX extended-header records: `len key=value\n`, lengths in
    * DECIMAL bytes including the length digits themselves.
    */
  private[read] def parsePax(data: Array[Byte]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var pos = 0
    while (pos < data.length) {
      var sp = pos
      while (sp < data.length && data(sp) != ' ') sp += 1
      if (sp >= data.length) return out.result()
      val len = try new String(data, pos, sp - pos,
        StandardCharsets.US_ASCII).trim.toInt
      catch { case _: NumberFormatException => return out.result() }
      if (len <= 0 || pos + len > data.length) return out.result()
      val rec = new String(data, sp + 1, pos + len - sp - 2,
        StandardCharsets.UTF_8) // drop the trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0) out += rec.substring(0, eq) -> rec.substring(eq + 1)
      pos += len
    }
    out.result()
  }

  /** Walk a tar buffer into its regular-file members. None when the
    * buffer is not a tar at all (no valid first header); a torn tail
    * ends the walk with the members read so far.
    *
    * All offset arithmetic stays in Long: a hostile GNU base-256 size
    * (e.g. 0x80000000) must not wrap `pos` negative and index the
    * buffer below zero — it just advances past the end, which is the
    * torn-tail exit. As a final backstop any exception inside the
    * walk returns the members read so far: the contract is "a bad
    * archive fails the ROW, never the executor".
    */
  def parse(bytes: Array[Byte],
            maxMemberBytes: Long = DefaultMaxMemberBytes,
            maxTotalBytes: Long = DefaultMaxTotalBytes,
            maxMembers: Int = DefaultMaxMembers): Option[Seq[Member]] = {
    if (bytes == null || bytes.length < 512) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Member]
    var pos = 0L
    var total = 0L
    var pendingName: Option[String] = None // GNU 'L' / PAX path=
    var sawHeader = false
    def done: Option[Seq[Member]] = if (sawHeader) Some(out.toSeq) else None
    try {
      while (pos + 512 <= bytes.length) {
        val hp = pos.toInt // safe: pos + 512 <= bytes.length <= Int.Max
        if (isZeroBlock(bytes, hp)) return done
        if (!checksumOk(bytes, hp)) return done
        val size = parseOctal(bytes, hp + 124, 12)
        if (size < 0) return done
        val typeflag = bytes(hp + 156)
        val dataStart = hp + 512
        val dataEnd = math.min(bytes.length.toLong, dataStart + size).toInt
        val blocks = ((size + 511) / 512) * 512
        sawHeader = true

        typeflag match {
          case 'L' => // GNU longname: data is the NEXT entry's name
            if (size <= (1 << 16))
              pendingName = Some(cstr(bytes, dataStart, dataEnd - dataStart))
          case 'x' => // PAX per-entry header
            if (size <= (1 << 20)) {
              val pax = parsePax(
                java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
              pax.get("path").foreach(p => pendingName = Some(p))
            }
          case 'g' | 'K' => () // global PAX / GNU longlink: structural
          case '0' | 0 => // regular file (old writers use NUL)
            if (out.length >= maxMembers) return Some(out.toSeq)
            val name = pendingName.getOrElse {
              val base = cstr(bytes, hp, 100)
              val prefix = cstr(bytes, hp + 345, 155)
              if (prefix.nonEmpty) prefix + "/" + base else base
            }
            pendingName = None
            if (size <= maxMemberBytes && name.nonEmpty) {
              val take = math.min(size, (dataEnd - dataStart).toLong).toInt
              total += take
              if (total > maxTotalBytes) return Some(out.toSeq)
              out += Member(name, size,
                java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + take))
            }
          case _ => // dirs, links, devices: structural, no payload kept
            pendingName = None
        }
        pos = dataStart.toLong + blocks
      }
      done
    } catch { case _: Exception => done }
  }

  /** Decompress when the payload leads with a known compression magic
    * (`.tar.gz`/`.tgz`, `.tar.zst`, `.tar.bz2`, `.tar.xz` — the
    * shared [[Compressed]] dispatch), capped at `cap` output bytes;
    * otherwise the bytes unchanged. A torn stream keeps whatever
    * decompressed cleanly: the walk then ends at the torn tail.
    */
  private[read] def maybeDecompressed(bytes: Array[Byte], cap: Long): Array[Byte] =
    Compressed.maybeDecompressed(bytes, cap)

  /** Archive glob → one row per regular-file member:
    * `(archive, member, size, content)`. One binaryFile scan + one
    * kernel explode — no shuffle, no driver-side anything.
    */
  def members(spark: SparkSession, pathGlob: String,
              maxMemberBytes: Long = DefaultMaxMemberBytes,
              maxTotalBytes: Long = DefaultMaxTotalBytes): DataFrame = {
    val explode0 = udf { (bytes: Array[Byte]) =>
      parse(maybeDecompressed(bytes, maxTotalBytes),
        maxMemberBytes, maxTotalBytes)
        .map(_.map(m => (m.name, m.size, m.bytes)))
        .getOrElse(Seq.empty)
    }
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path").as("archive"),
        explode(explode0(col("content"))).as("m"))
      .select(col("archive"), col("m._1").as("member"),
        col("m._2").as("size"), col("m._3").as("content"))
  }

  /** Streaming twin of [[members]]: new archives landing in `dir`
    * explode through the same kernel walk, so a live shard drop-box
    * (the WebDataset delivery shape) feeds the same downstream
    * program as a batch read.
    */
  def stream(spark: SparkSession, dir: String,
             maxMemberBytes: Long = DefaultMaxMemberBytes,
             maxTotalBytes: Long = DefaultMaxTotalBytes,
             maxFilesPerTrigger: Int = 100): DataFrame = {
    val explode0 = udf { (bytes: Array[Byte]) =>
      parse(maybeDecompressed(bytes, maxTotalBytes),
        maxMemberBytes, maxTotalBytes)
        .map(_.map(m => (m.name, m.size, m.bytes)))
        .getOrElse(Seq.empty)
    }
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("path").as("archive"),
        explode(explode0(col("content"))).as("m"))
      .select(col("archive"), col("m._1").as("member"),
        col("m._2").as("size"), col("m._3").as("content"))
  }

  private val membersUdf = udf { (bytes: Array[Byte]) =>
    parse(maybeDecompressed(bytes, DefaultMaxTotalBytes))
      .map(_.map(m => (m.name, m.size, m.bytes)))
  }

  /** Members as an array column over raw archive bytes (for columns
    * that already hold tars); NULL when not a tar.
    */
  def membersCol(bytesCol: Column): Column = membersUdf(bytesCol)
}
