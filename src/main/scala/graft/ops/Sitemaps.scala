package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing — the discovery side of the crawl
  * frontier: robots.txt names the sitemaps
  * ([[RobotsTxt.sitemapsOf]]), the sitemaps name the URLs with the
  * site's OWN priority/freshness hints, and
  * [[Links.frontierSchedule]] turns those into a politeness-bounded
  * fetch plan. This closes the loop.
  *
  * The kernel parses both document kinds from the protocol: a
  * `<urlset>` of `<url>` entries (`loc` required; `lastmod`,
  * `changefreq`, `priority` optional — priority defaults to 0.5 per
  * the spec and clamps to [0,1] against hostile values) and a
  * `<sitemapindex>` of child `<sitemap>` locs (returned separately —
  * fetching children is the caller's loop, bounded by ITS crawl
  * budget, never recursion inside a row kernel). Plain-text sitemaps
  * (one URL per line, also protocol-legal) parse as entries with
  * defaults. A DOCTYPE is stripped before the XML parse (the
  * external-entity guard shared with the container readers);
  * unparseable bodies yield zero entries, never an error.
  */
object Sitemaps {

  final case class Entry(loc: String, lastmod: String,
                         changefreq: String, priority: Double)

  final case class Parsed(entries: Seq[Entry], children: Seq[String])

  def parse(body: String): Parsed = {
    if (body == null) return Parsed(Nil, Nil)
    // a UTF-8 BOM (U+FEFF) survives String.trim and would misroute an
    // XML sitemap into the plain-text branch — strip it first
    val trimmed = body.replaceAll("\\A\uFEFF+", "").trim
    if (trimmed.isEmpty) return Parsed(Nil, Nil)
    if (!trimmed.startsWith("<")) {
      // plain-text sitemap: one absolute URL per line
      val urls = trimmed.split("\n").iterator.map(_.trim)
        .filter(l => l.startsWith("http://") || l.startsWith("https://"))
        .map(Entry(_, "", "", 0.5)).toVector
      return Parsed(urls, Nil)
    }
    // the shared DOCTYPE-stripped guarded parse
    val xml = graft.engine.read.ZipRead.parseXml(trimmed) match {
      case Some(x) => x
      case None    => return Parsed(Nil, Nil)
    }
    xml.label match {
      case "urlset" =>
        val entries = (xml \ "url").flatMap { u =>
          val loc = (u \ "loc").headOption.map(_.text.trim).getOrElse("")
          if (loc.isEmpty) None
          else Some(Entry(
            loc,
            (u \ "lastmod").headOption.map(_.text.trim).getOrElse(""),
            (u \ "changefreq").headOption.map(_.text.trim).getOrElse(""),
            (u \ "priority").headOption.map(_.text.trim)
              .flatMap(v => scala.util.Try(v.toDouble).toOption)
              .map(p => math.min(1.0, math.max(0.0, p)))
              .getOrElse(0.5)))
        }
        Parsed(entries.toVector, Nil)
      case "sitemapindex" =>
        val kids = (xml \ "sitemap").flatMap(sm =>
          (sm \ "loc").headOption.map(_.text.trim)).filter(_.nonEmpty)
        Parsed(Nil, kids.toVector)
      case _ => Parsed(Nil, Nil)
    }
  }

  private val entriesUdf = udf { (body: String) => parse(body).entries }
  private val childrenUdf = udf { (body: String) => parse(body).children }

  /** `array<struct<loc,lastmod,changefreq,priority>>` of a sitemap
    * body column; empty array when unparseable.
    */
  def entriesCol(bodyCol: Column): Column = entriesUdf(bodyCol)

  /** Child sitemap locs of a sitemapindex body column. */
  def childrenCol(bodyCol: Column): Column = childrenUdf(bodyCol)

  /** One row per discovered URL: `(loc, lastmod, changefreq,
    * priority)` plus the caller's columns — feed straight into
    * [[Links.frontierSchedule]] with `priority` as the priority
    * column. A per-row kernel + explode: a 100 TB sitemap corpus
    * fans out in one map stage, no shuffle.
    */
  def urls(df: DataFrame, bodyCol: String): DataFrame =
    df.withColumn("__e", explode(entriesUdf(col(bodyCol))))
      .select(df.columns.filter(_ != bodyCol).map(col).toSeq :+
        col("__e.loc").as("loc") :+
        col("__e.lastmod").as("lastmod") :+
        col("__e.changefreq").as("changefreq") :+
        col("__e.priority").as("priority"): _*)
}
