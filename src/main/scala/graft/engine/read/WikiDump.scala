package graft.engine.read

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MediaWiki XML dump source — the standard distribution format of
  * Wikipedia and every other public wiki, and a first-stop corpus for
  * LLM training pipelines.
  *
  * Spark-first shape: the dump is read with `spark.read.option(
  * "lineSep", "</page>")`, so Hadoop's TextInputFormat does the
  * record splitting — which means ONE multi-hundred-GB `.xml.bz2`
  * file parallelizes across the cluster for free (bzip2 is a
  * SPLITTABLE Hadoop codec; the dumps are published exactly this way)
  * and plain `.xml` / `.gz` behave as usual. Each record chunk then
  * parses with a per-row kernel: no whole-file DOM, no driver-side
  * anything.
  *
  * The kernel extracts the page fields a corpus needs — title,
  * namespace, page id, redirect target (pages that are pure pointers
  * carry no prose), the LAST revision's timestamp and wikitext (dumps
  * order revisions oldest-first; current-pages dumps have exactly
  * one) — with XML entities decoded. Records without a `<page>`
  * element (the siteinfo header, the `</mediawiki>` trailer) drop.
  *
  * Compose with [[graft.ops.Wikitext.textCol]] for plain text:
  * {{{
  *   WikiDump.pages(spark, "dump.xml.bz2")
  *     .where(col("ns") === 0 && col("redirect").isNull)
  *     .withColumn("text", graft.ops.Wikitext.textCol(col("wikitext")))
  * }}}
  */
object WikiDump {

  final case class Page(title: String, ns: Int, pageId: Long,
                        redirect: Option[String], timestamp: String,
                        wikitext: String)

  /** Record-size guard: a CURRENT-pages dump (the standard corpus
    * input, and this reader's contract) tops out around the wiki's
    * max article size (2 MiB wikitext on Wikipedia) plus XML
    * overhead, so 64 MiB is generous headroom. A `meta-history` dump
    * can pack GBs of revisions into one hot `<page>` — without a cap
    * that is one record materializing executor-killing buffers.
    * Hadoop's LineRecordReader keeps the first `maxRecordBytes` of an
    * oversized record and SKIPS the rest, so a hostile page costs one
    * (truncated, usually droppable) row, never an executor.
    */
  val DefaultMaxRecordBytes: Int = 64 << 20

  /** One row per `<page>`: title, ns, page_id, redirect (nullable),
    * timestamp, wikitext.
    */
  def pages(spark: SparkSession, path: String,
            maxRecordBytes: Int = DefaultMaxRecordBytes): DataFrame = {
    import spark.implicits._
    val parse = udf { (chunk: String) => parsePage(chunk) }
    spark.read.option("lineSep", "</page>")
      // data source options merge into the per-relation Hadoop conf —
      // scoped to THIS read, no global SparkContext mutation
      .option("mapreduce.input.linerecordreader.line.maxlength",
        maxRecordBytes.toString)
      .text(path)
      .select(parse(col("value")).as("p"))
      .filter(col("p").isNotNull)
      .select(
        col("p.title").as("title"),
        col("p.ns").as("ns"),
        col("p.pageId").as("page_id"),
        col("p.redirect").as("redirect"),
        col("p.timestamp").as("timestamp"),
        col("p.wikitext").as("wikitext"))
  }

  /** The per-record kernel (public for spec reach). */
  def parsePage(chunk: String): Option[Page] = {
    if (chunk == null) return None
    val at = chunk.indexOf("<page>")
    if (at < 0) return None
    val p = chunk.substring(at)
    val title = tag(p, "title").getOrElse(return None)
    val ns = tag(p, "ns").flatMap(v =>
      scala.util.Try(v.trim.toInt).toOption).getOrElse(0)
    val pageId = tag(p, "id").flatMap(v =>
      scala.util.Try(v.trim.toLong).toOption).getOrElse(-1L)
    val redirect = attr(p, "redirect", "title")
    // LAST revision wins (full-history dumps are oldest-first)
    val revAt = p.lastIndexOf("<revision>")
    val rev = if (revAt < 0) p else p.substring(revAt)
    val timestamp = tag(rev, "timestamp").getOrElse("")
    val wikitext = tagWithAttrs(rev, "text").getOrElse("")
    Some(Page(unescape(title), ns, pageId, redirect.map(unescape),
      timestamp, unescape(wikitext)))
  }

  private def tag(s: String, name: String): Option[String] = {
    val open = "<" + name + ">"
    val a = s.indexOf(open)
    if (a < 0) return None
    val b = s.indexOf("</" + name + ">", a + open.length)
    if (b < 0) None else Some(s.substring(a + open.length, b))
  }

  /** `<name attr... >body</name>` (the text element carries bytes=
    * and xml:space attributes) — also handles the self-closed empty
    * form `<name ... />`.
    */
  private def tagWithAttrs(s: String, name: String): Option[String] = {
    val a = s.indexOf("<" + name)
    if (a < 0) return None
    val gt = s.indexOf('>', a)
    if (gt < 0) return None
    if (s.charAt(gt - 1) == '/') return Some("")
    val b = s.indexOf("</" + name + ">", gt + 1)
    if (b < 0) None else Some(s.substring(gt + 1, b))
  }

  private def attr(s: String, tagName: String, attrName: String): Option[String] = {
    val a = s.indexOf("<" + tagName)
    if (a < 0) return None
    val end = s.indexOf('>', a)
    if (end < 0) return None
    val span = s.substring(a, end)
    val m = (attrName + "=\"([^\"]*)\"").r.findFirstMatchIn(span)
    m.map(_.group(1))
  }

  /** The five XML predefined entities plus numeric refs — all a
    * well-formed dump can contain.
    */
  private[read] def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else ""
        ent match {
          case "lt" => out.append('<'); i = semi + 1
          case "gt" => out.append('>'); i = semi + 1
          case "amp" => out.append('&'); i = semi + 1
          case "quot" => out.append('"'); i = semi + 1
          case "apos" => out.append('\''); i = semi + 1
          // surrogate code points (D800–DFFF) are not XML characters;
          // a hostile dump injecting them would produce lone
          // surrogates → invalid UTF-8 at the Parquet boundary. Treat
          // them as malformed (raw '&' passes through), like any
          // other unparseable reference.
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            scala.util.Try(Integer.parseInt(e.drop(2), 16)).toOption match {
              case Some(cp) if cp > 0 && cp <= 0x10FFFF &&
                (cp < 0xD800 || cp > 0xDFFF) =>
                out.appendAll(Character.toChars(cp)); i = semi + 1
              case _ => out.append(c); i += 1
            }
          case e if e.startsWith("#") =>
            scala.util.Try(e.drop(1).toInt).toOption match {
              case Some(cp) if cp > 0 && cp <= 0x10FFFF &&
                (cp < 0xD800 || cp > 0xDFFF) =>
                out.appendAll(Character.toChars(cp)); i = semi + 1
              case _ => out.append(c); i += 1
            }
          case _ => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
