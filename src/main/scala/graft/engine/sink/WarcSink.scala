package graft.engine.sink

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.SerializableConfiguration

/** WARC writer — export a documents frame as ISO 28500 `conversion`
  * records in the member-per-record gzip layout Common Crawl uses
  * (each record its own gzip member, so byte ranges stay
  * independently decompressible and [[graft.engine.read.Cdx]] can
  * index the output). The archive loop closes: curate → write WARC →
  * `Cdx.writeCdxj` → selective re-reads, all in-engine.
  *
  * One file per task (`part-NNNNN.warc.gz`), streamed record by
  * record — no whole-partition buffering; records carry
  * `WARC-Record-ID` (from the id column), `WARC-Target-URI`,
  * `WARC-Date`, and a `WARC-Block-Digest` (`sha1:BASE32`, the Common
  * Crawl form) computed over the payload, so
  * [[graft.engine.read.Warc.scan]]'s integrity verdict can confirm
  * every exported record. Writer parallelism = partition count
  * (repartition upstream to choose shard count/order; file CONTENT
  * order is the partition's row order).
  */
object WarcSink {

  /** Write `(idCol, urlCol, textCol)` as conversion records under
    * `dir`. Returns the number of CONTENT records written. NULL text
    * writes an empty payload; NULL ids/urls fail loud (an archive
    * record without identity is unusable downstream). Each file leads
    * with a `warcinfo` record (ISO 28500 §6.2 — software/format
    * warc-fields plus `WARC-Filename`, the shape pywb and ia tools
    * expect at the head of an archive) unless `warcinfo = false`;
    * warcinfo records carry no target URI, so the CDX writer skips
    * them and every existing consumer filters by `warc_type`.
    */
  def write(df: DataFrame, idCol: String, urlCol: String, textCol: String,
            dir: String, date: String = "2026-01-01T00:00:00Z",
            warcinfo: Boolean = true): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = df.select(col(idCol).cast("string").as("id"),
      col(urlCol).cast("string").as("url"),
      coalesce(col(textCol).cast("string"), lit("")).as("text"))
    val counts = rows.as[(String, String, String)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (!it.hasNext) Iterator.empty
      else {
        val path = new org.apache.hadoop.fs.Path(
          dir, f"part-$pid%05d.warc.gz")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        var n = 0L
        // one gzip MEMBER per record: open/finish a deflate stream
        // around each record, all onto the same file stream
        def writeMember(headers: Seq[(String, String)],
                        payload: Array[Byte]): Unit = {
          val digest = graft.engine.read.Warc.base32(
            java.security.MessageDigest.getInstance("SHA-1")
              .digest(payload))
          val head = ("WARC/1.0" +: (headers ++ Seq(
            "WARC-Block-Digest" -> s"sha1:$digest",
            "Content-Length" -> payload.length.toString))
            .map { case (k, v) => s"$k: $v" })
            .mkString("", "\r\n", "\r\n\r\n")
            .getBytes(StandardCharsets.ISO_8859_1)
          val gz = new java.util.zip.GZIPOutputStream(
            new java.io.FilterOutputStream(out) {
              // FilterOutputStream's default write(b,off,len) loops
              // write(int) per byte — catastrophic through a Hadoop
              // checksum stream; delegate the whole chunk
              override def write(b: Array[Byte], off: Int, len: Int): Unit =
                out.write(b, off, len)
              override def close(): Unit = flush() // keep `out` open
            }, 1 << 16)
          gz.write(head)
          gz.write(payload)
          gz.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
          gz.close()
        }
        try {
          if (warcinfo) writeMember(
            Seq("WARC-Type" -> "warcinfo",
              "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
              "WARC-Date" -> date,
              "WARC-Filename" -> path.getName,
              "Content-Type" -> "application/warc-fields"),
            ("software: graft\r\n" +
              "format: WARC File Format 1.0\r\n")
              .getBytes(StandardCharsets.UTF_8))
          it.foreach { case (id, url, text) =>
            require(id != null && url != null,
              s"record without id/url in partition $pid")
            writeMember(
              Seq("WARC-Type" -> "conversion",
                "WARC-Record-ID" -> s"<urn:graft:$id>",
                "WARC-Date" -> date,
                "WARC-Target-URI" -> url,
                "Content-Type" -> "text/plain; charset=UTF-8"),
              text.getBytes(StandardCharsets.UTF_8))
            n += 1
          }
        } finally out.close()
        Iterator.single(n)
      }
    }
    counts.collect().sum
  }
}
