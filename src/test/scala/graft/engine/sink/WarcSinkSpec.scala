package graft.engine.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.read.{Cdx, GzipMembers, Warc}

/** WARC export sink: member-per-record layout (every record its own
  * gzip member — the CDX-indexable property), digest verdicts on
  * re-scan, null/guard behavior, and the full archive loop
  * write → index → selective fetch.
  */
class WarcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "http://a.example/x", "alpha body"),
    (2L, "http://b.example/y", "beta body text"),
    (3L, "http://c.example/z", null: String)).toDF("doc_id", "url", "text")

  test("one gzip member per record; re-scan verifies every block digest") {
    val dir = tmpDir("warcout").toString
    val n = WarcSink.write(docs.repartition(1), "doc_id", "url", "text", dir)
    assert(n == 3L)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(f.length == 1)
    val members = GzipMembers.members(
      new java.io.FileInputStream(f.head)).toList
    // member-per-record, not one big stream: warcinfo head + 3 records
    assert(members.length == 4)
    val all = Warc.scan(spark, dir)
      .select(col("record_id"), col("warc_type"), col("record_index"),
        col("digest_ok"), col("truncated"),
        col("payload").cast("string").as("text"))
      .collect()
    // the shard LEADS with an ISO 28500 warcinfo record (no target
    // URI — the CDX writer skips it), digest-verified like the rest
    val info = all.find(_.getAs[String]("warc_type") == "warcinfo").get
    assert(info.getAs[Long]("record_index") == 0L &&
      info.getAs[Boolean]("digest_ok") &&
      info.getAs[String]("text").contains("WARC File Format 1.0"))
    val back = all.filter(_.getAs[String]("warc_type") == "conversion")
    assert(back.length == 3)
    assert(back.forall(_.getAs[Boolean]("digest_ok")))
    assert(back.forall(!_.getAs[Boolean]("truncated")))
    // null text exports as an EMPTY payload, not a dropped record
    val r3 = back.find(_.getString(0) == "<urn:graft:3>").get
    assert(r3.getAs[String]("text") == "")
  }

  test("write → index → selective fetch closes the archive loop") {
    val dir = tmpDir("warcloop").toString
    WarcSink.write(docs.repartition(1), "doc_id", "url", "text", dir)
    val idx = s"$dir/all.cdxj"
    Cdx.writeCdxj(Cdx.scanWithRanges(spark, s"$dir/*.warc.gz"), idx,
      base = dir)
    val cdx = Cdx.readCdxj(spark, idx)
    assert(cdx.count() == 3)
    val got = Cdx.fetch(cdx.filter(col("url") === "http://b.example/y"),
        base = dir)
      .select(col("record_id"), col("payload").cast("string"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("<urn:graft:2>", "beta body text")))
  }

  test("records without identity fail loud") {
    val dir = tmpDir("warcbad").toString
    val bad = Seq((1L, null: String, "t")).toDF("doc_id", "url", "text")
    val e = intercept[org.apache.spark.SparkException] {
      WarcSink.write(bad, "doc_id", "url", "text", dir)
    }
    assert(e.getMessage.contains("id/url") ||
      Option(e.getCause).exists(_.getMessage.contains("id/url")))
  }
}
