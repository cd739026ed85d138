package graft.engine.read

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the syndication layer of a crawl:
  * feeds are how fresh documents ANNOUNCE themselves, so a pipeline
  * that ingests them discovers new URLs (into the frontier, like
  * [[graft.ops.Sitemaps]]) and often the full text before the page
  * is ever fetched.
  *
  * One kernel handles both dialects by root element: `<rss>` (and
  * bare `<channel>`) walks `item` children (title, link, guid,
  * pubDate, description/content:encoded), `<feed>` walks Atom
  * `entry` children (title, the alternate-or-first `link href`,
  * id, published/updated, summary/content). Item bodies are HTML
  * more often than not — the summary runs through the SAME
  * htmlToText cascade as every other HTML path (kernel replay, one
  * step list). DOCTYPEs are stripped before the parse (the shared
  * external-entity guard); unparseable bodies yield zero items.
  */
object Feeds {

  final case class Item(feedTitle: String, title: String, link: String,
                        id: String, published: String, summary: String)

  def parse(body: String): Seq[Item] = {
    if (body == null) return Nil
    // real feed bodies often lead with a UTF-8 BOM (U+FEFF), which
    // String.trim does NOT strip — drop it before the "<" dispatch
    val trimmed = body.replaceAll("\\A\uFEFF+", "").trim
    if (trimmed.isEmpty || !trimmed.startsWith("<")) return Nil
    // the shared DOCTYPE-stripped guarded parse (one external-entity
    // guard to harden, not three)
    val xml = ZipRead.parseXml(trimmed) match {
      case Some(x) => x
      case None    => return Nil
    }

    def text(n: scala.xml.NodeSeq): String =
      n.headOption.map(_.text.trim).getOrElse("")

    xml.label match {
      case "rss" | "channel" =>
        val channel =
          if (xml.label == "channel") xml
          else (xml \ "channel").headOption.getOrElse(return Nil)
        val feedTitle = text(channel \ "title")
        (channel \ "item").map { it =>
          val desc = Seq("encoded", "description")
            .map(l => text(it \ l)).find(_.nonEmpty).getOrElse("")
          // first NON-EMPTY link text: a self-closing item-level
          // <atom:link .../> (label-matched too) must not shadow the
          // real <link>url</link>
          val link = (it \ "link").map(_.text.trim)
            .find(_.nonEmpty).getOrElse("")
          Item(feedTitle,
            text(it \ "title"),
            link,
            text(it \ "guid"),
            text(it \ "pubDate"),
            graft.ops.TextAnalysis.htmlToTextKernel(desc))
        }.toVector
      case "feed" =>
        val feedTitle = text(xml \ "title")
        (xml \ "entry").map { e =>
          val links = (e \ "link")
          val href = links
            .find(l => l.attribute("rel").forall(_.text == "alternate"))
            .orElse(links.headOption)
            .flatMap(_.attribute("href")).flatMap(_.headOption)
            .map(_.text.trim).getOrElse("")
          val published = Seq("published", "updated")
            .map(l => text(e \ l)).find(_.nonEmpty).getOrElse("")
          val body = Seq("summary", "content")
            .map(l => text(e \ l)).find(_.nonEmpty).getOrElse("")
          Item(feedTitle,
            text(e \ "title"),
            href,
            text(e \ "id"),
            published,
            graft.ops.TextAnalysis.htmlToTextKernel(body))
        }.toVector
      case _ => Nil
    }
  }

  private val itemsUdf = udf { (body: String) => parse(body) }

  /** `array<struct<feedTitle,title,link,id,published,summary>>`;
    * empty when unparseable.
    */
  def itemsCol(bodyCol: Column): Column = itemsUdf(bodyCol)

  /** One row per feed item plus the caller's columns — a kernel +
    * explode map stage (the [[graft.ops.Sitemaps.urls]] shape); feed
    * links feed the frontier, summaries feed the text stack.
    */
  def items(df: DataFrame, bodyCol: String): DataFrame =
    df.withColumn("__i", explode(itemsUdf(col(bodyCol))))
      .select(df.columns.filter(_ != bodyCol).map(col).toSeq :+
        col("__i.feedTitle").as("feed_title") :+
        col("__i.title").as("title") :+
        col("__i.link").as("link") :+
        col("__i.id").as("item_id") :+
        col("__i.published").as("published") :+
        col("__i.summary").as("summary"): _*)
}
