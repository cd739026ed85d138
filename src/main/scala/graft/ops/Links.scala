package graft.ops

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink extraction — the stage that turns fetched HTML into the
  * link graph [[Graph.pageRank]] ranks and the anchor-text signal
  * search-quality pipelines aggregate per target page. The reference
  * pipeline has no crawl-graph counterpart; this is part of the
  * beyond-reference crawl-to-corpus surface (WARC source → extract →
  * link graph → host rank → quality weight).
  *
  * Extraction semantics:
  *  - `<a>` elements found by a LINEAR case-insensitive scan (no
  *    backtracking regex over the document — the card-scanner lesson);
  *    a tag opener counts only when `<a` is followed by whitespace,
  *    `>` or `/` (so `<abbr>` never matches);
  *  - `href` / `rel` read from the attribute span, double-quoted,
  *    single-quoted or unquoted; entity references decoded with the
  *    same 6-step cascade as the HTML extractor (`&amp;` last);
  *  - anchor text = inner HTML up to the matching `</a` with tags
  *    stripped, entities decoded, whitespace collapsed, clamped to
  *    [[Links.MaxAnchorChars]]; an unterminated anchor clamps at the
  *    same bound instead of swallowing the rest of the page;
  *  - one `<base href>` (first occurrence, the HTML5 rule) re-bases
  *    relative resolution after itself being resolved against the
  *    page URL;
  *  - relative references resolve per RFC 3986 (merge + dot-segment
  *    removal via `java.net.URI.resolve`, with an empty base path
  *    normalized to `/` first); crawl-junk characters (spaces,
  *    brackets, non-ASCII) are percent-encoded before parsing so a
  *    sloppy href degrades to a well-formed URL instead of a parse
  *    error;
  *  - fragment-only refs, `javascript:`/`mailto:`/`tel:`/`data:`/
  *    `about:` schemes, and unresolvable refs yield no edge; the
  *    resulting URL keeps its fragment stripped;
  *  - `rel` tokens are split on whitespace/commas; `nofollow` is
  *    reported per-edge so curation can weight or drop those edges.
  *
  * Scale shape: the kernel is a per-row linear scan with a
  * [[Links.MaxLinksPerPage]] clamp (hostile pages with hundreds of
  * thousands of anchors cannot blow up the explode); extraction is a
  * map stage — the only shuffles in the family are the aggregations
  * the caller composes ([[anchorStats]], [[hostEdges]] → PageRank).
  */
object Links {

  /** Longest anchor text kept (code points are not split: the clamp
    * backs off a trailing high surrogate).
    */
  val MaxAnchorChars = 300

  /** Hard per-page edge clamp — beyond this the page's tail links are
    * dropped (and at 100 TB a >10k-anchor page is boilerplate or spam
    * anyway).
    */
  val MaxLinksPerPage = 10000

  /** One extracted link, pre-explode. */
  case class Link(dst: String, anchor: String, nofollow: Boolean)

  private val schemesDropped =
    Seq("javascript:", "mailto:", "tel:", "data:", "about:")

  /** Plain-string twin of the extractor's entity cascade
    * ([[TextAnalysis.entitySteps]] order: `&amp;` LAST so `&amp;lt;`
    * decodes to `&lt;`).
    */
  private[ops] def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  /** Percent-encode the characters RFC 3986 forbids raw (and all
    * non-ASCII, UTF-8 byte-wise) so `java.net.URI` accepts hrefs the
    * way browsers do. Already-encoded `%xx` sequences pass through.
    */
  private[ops] def encodeForUri(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      val bad = c <= ' ' || c >= 0x7f || "<>\"{}|\\^`".indexOf(c) >= 0
      if (bad) sb.append(f"%%${b & 0xff}%02X") else sb.append(c)
    }
    sb.toString
  }

  /** Resolve `href` against absolute `base` per RFC 3986; None for
    * fragment-only refs, dropped schemes, and anything unresolvable.
    * The fragment of the result is stripped.
    */
  private[ops] def resolve(base: String, href0: String): Option[String] = {
    val href = decodeEntities(href0).trim
    val lower = href.toLowerCase(java.util.Locale.ROOT)
    if (href.isEmpty || href.startsWith("#") ||
      schemesDropped.exists(lower.startsWith)) None
    // Query-only refs: RFC 3986 §5.3 keeps the whole base path, but
    // java.net.URI still implements RFC 2396 here (drops the last
    // segment) — so build the result directly.
    else if (href.startsWith("?")) Try {
      val enc = encodeForUri(base.trim)
      val u = new java.net.URI(enc)
      if (u.isAbsolute && u.getRawAuthority != null) {
        val stem = enc.indexOf('?') match {
          case -1 => enc.indexOf('#') match {
            case -1 => enc
            case h => enc.substring(0, h)
          }
          case q => enc.substring(0, q)
        }
        val withPath =
          if (u.getRawPath == null || u.getRawPath.isEmpty) stem + "/"
          else stem
        val full = withPath + encodeForUri(href)
        val cut = full.indexOf('#')
        Some(if (cut >= 0) full.substring(0, cut) else full)
      } else None
    }.toOption.flatten
    else Try {
      val b0 = new java.net.URI(encodeForUri(base.trim))
      // RFC 3986 §5.3 merge wants "/" when the base path is empty;
      // normalize before resolve so "http://a" + "x" → "http://a/x".
      // The base query never matters here (query-only refs carry their
      // own; empty refs were dropped above) — so rebuild without it
      // rather than risk the encoding constructor double-escaping it.
      val b =
        if (b0.getRawPath == null || b0.getRawPath.isEmpty)
          new java.net.URI(b0.getScheme + "://" + b0.getRawAuthority + "/")
        else b0
      val r = b.resolve(new java.net.URI(encodeForUri(href)))
      val s = r.toString
      val cut = s.indexOf('#')
      val noFrag = if (cut >= 0) s.substring(0, cut) else s
      if (r.isAbsolute && r.getRawAuthority != null && noFrag.nonEmpty)
        Some(noFrag)
      else None
    }.toOption.flatten
  }

  private def indexOfIgnoreCase(s: String, pat: String, from: Int): Int = {
    var i = math.max(from, 0)
    val n = s.length - pat.length
    while (i <= n) {
      var j = 0
      while (j < pat.length &&
        Character.toLowerCase(s.charAt(i + j)) == pat.charAt(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** First value of attribute `name` inside an attribute span:
    * double-quoted, single-quoted, or unquoted-to-whitespace.
    */
  private[ops] def attrValue(attrs: String, name: String): Option[String] = {
    var i = 0
    while (i >= 0 && i < attrs.length) {
      i = indexOfIgnoreCase(attrs, name, i)
      if (i < 0) return None
      // must be a standalone attribute name (start or preceded by ws)
      val okLeft = i == 0 || Character.isWhitespace(attrs.charAt(i - 1))
      var j = i + name.length
      while (j < attrs.length && Character.isWhitespace(attrs.charAt(j))) j += 1
      if (okLeft && j < attrs.length && attrs.charAt(j) == '=') {
        j += 1
        while (j < attrs.length && Character.isWhitespace(attrs.charAt(j))) j += 1
        if (j >= attrs.length) return Some("")
        val q = attrs.charAt(j)
        if (q == '"' || q == '\'') {
          val end = attrs.indexOf(q, j + 1)
          return Some(if (end < 0) attrs.substring(j + 1)
          else attrs.substring(j + 1, end))
        }
        var k = j
        while (k < attrs.length && !Character.isWhitespace(attrs.charAt(k))) k += 1
        return Some(attrs.substring(j, k))
      }
      i = i + name.length
    }
    None
  }

  private val tagPat = "<[^>]*>".r

  private[ops] def cleanAnchorText(inner: String): String = {
    val noTags = tagPat.replaceAllIn(inner, " ")
    val decoded = decodeEntities(noTags)
    val collapsed = decoded.replaceAll("[\\s\\u00A0]+", " ").trim
    if (collapsed.length <= MaxAnchorChars) collapsed
    else {
      var cut = MaxAnchorChars
      if (Character.isHighSurrogate(collapsed.charAt(cut - 1))) cut -= 1
      collapsed.substring(0, cut).trim
    }
  }

  private def relNofollow(attrs: String): Boolean =
    attrValue(attrs, "rel").exists(
      _.toLowerCase(java.util.Locale.ROOT).split("[\\s,]+")
        .contains("nofollow"))

  /** Scan `html` for the first `<base href>` and resolve it against
    * the page URL (HTML5: first base wins; later ones ignored).
    */
  private[ops] def effectiveBase(pageUrl: String, html: String): String = {
    var i = 0
    while (i >= 0) {
      i = indexOfIgnoreCase(html, "<base", i)
      if (i < 0) return pageUrl
      val after = i + 5
      if (after < html.length &&
        (Character.isWhitespace(html.charAt(after)) ||
          html.charAt(after) == '>' || html.charAt(after) == '/')) {
        val gt = html.indexOf('>', after)
        val attrs = html.substring(after, if (gt < 0) html.length else gt)
        attrValue(attrs, "href") match {
          case Some(h) => return resolve(pageUrl, h).getOrElse(pageUrl)
          case None => // <base target=...> — keep scanning
        }
      }
      i = after
    }
    pageUrl
  }

  /** Position of the next `<a` that is a real anchor opener (followed
    * by whitespace, `>` or `/` — so `<abbr>` never matches), or -1.
    */
  private def nextOpener(html: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = indexOfIgnoreCase(html, "<a", i)
      if (i >= 0) {
        val after = i + 2
        if (after < html.length &&
          (Character.isWhitespace(html.charAt(after)) ||
            html.charAt(after) == '>' || html.charAt(after) == '/')) return i
        i = after
      }
    }
    -1
  }

  /** Pure kernel: all links of one page, document order, clamped.
    * Anchors cannot nest — a following `<a` opener auto-closes the
    * current one (the browser rule), so an unclosed anchor neither
    * swallows later links nor unbounded text.
    */
  def extractFromHtml(pageUrl: String, html: String,
                      maxLinks: Int = MaxLinksPerPage): Seq[Link] = {
    if (pageUrl == null || html == null || pageUrl.trim.isEmpty) return Nil
    val base = effectiveBase(pageUrl, html)
    val out = Seq.newBuilder[Link]
    var n = 0
    var i = nextOpener(html, 0)
    while (i >= 0 && n < maxLinks) {
      val after = i + 2
      val gt = html.indexOf('>', after)
      if (gt < 0) i = -1 // unterminated opener: nothing more to parse
      else {
        val attrs = html.substring(after, gt)
        val close = indexOfIgnoreCase(html, "</a", gt + 1)
        val nextA = nextOpener(html, gt + 1)
        val (innerEnd, cont) =
          if (close >= 0 && (nextA < 0 || close < nextA)) (close, close + 3)
          else if (nextA >= 0) (nextA, nextA)
          // unterminated trailing anchor: clamp, don't swallow the page
          else (math.min(html.length, gt + 1 + 4 * MaxAnchorChars), -1)
        val inner = html.substring(gt + 1, innerEnd)
        attrValue(attrs, "href").flatMap(resolve(base, _)).foreach { dst =>
          out += Link(dst, cleanAnchorText(inner), relNofollow(attrs))
          n += 1
        }
        i = if (cont < 0) -1 else nextOpener(html, cont)
      }
    }
    out.result()
  }

  private val extractUdf = udf((url: String, html: String) =>
    extractFromHtml(url, html))

  /** Explode `df`'s pages into one row per extracted link:
    * `(srcUrlCol, dst_url, anchor_text, nofollow)`. Map stage — no
    * shuffle; order within a page is document order but the frame
    * itself is unordered (sort at the sink if needed).
    */
  def extractLinks(df: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    df.select(col(urlCol),
        explode(extractUdf(col(urlCol), col(htmlCol))).as("__l"))
      .select(col(urlCol), col("__l.dst").as("dst_url"),
        col("__l.anchor").as("anchor_text"),
        col("__l.nofollow").as("nofollow"))

  /** Host-level edge list for [[Graph.pageRank]]: eTLD+1 of source and
    * destination under the full bundled public-suffix list, self-loops
    * and unparseable sides dropped, `nofollow` edges excluded (the
    * PageRank convention). One row per surviving link — parallel edges
    * aggregate inside PageRank itself.
    */
  def hostEdges(links: DataFrame, srcUrlCol: String = "src_url",
                dstUrlCol: String = "dst_url",
                nofollowCol: String = "nofollow"): DataFrame = {
    val src = UrlOps.pslDomainFromUrl(col(srcUrlCol))
    val dst = UrlOps.pslDomainFromUrl(col(dstUrlCol))
    links.filter(!coalesce(col(nofollowCol), lit(false)))
      .select(src.as("src"), dst.as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
  }

  /** Per-target anchor profile: `(dst, n_links, n_pages, top_anchor)`
    * — total in-links, distinct linking pages, and the most frequent
    * NON-EMPTY anchor text (ties broken by the lexicographically
    * smallest; null when every anchor is empty). Two aggregations and
    * one window, all keyed/partitioned by `dst`, plus a final join on
    * `dst` — every shuffle is on the natural key.
    */
  def anchorStats(links: DataFrame, srcCol: String, dstCol: String,
                  anchorCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = links.groupBy(col(dstCol).as("dst"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col(srcCol)).as("n_pages"))
    val perAnchor = links.filter(col(anchorCol) =!= "")
      .groupBy(col(dstCol).as("dst"), col(anchorCol).as("__anchor"))
      .agg(count(lit(1)).as("__n"))
    val top = perAnchor
      .withColumn("__rk", row_number().over(
        Window.partitionBy("dst")
          .orderBy(col("__n").desc, col("__anchor").asc)))
      .filter(col("__rk") === 1)
      .select(col("dst"), col("__anchor").as("top_anchor"))
    totals.join(top, Seq("dst"), "left")
      .select(col("dst"), col("n_links"), col("n_pages"), col("top_anchor"))
  }

  /** Politeness-scheduled fetch plan for a crawl frontier: per host,
    * URLs are slotted by `(priority desc, url asc)` (the tie column
    * makes the plan deterministic) and the fetch offset is
    * `slot · crawl_delay` — the earliest second each URL may be
    * fetched while honoring the host's [[RobotsTxt.crawlDelaySecs]]
    * budget (`defaultDelay` where the host declared none or is
    * absent from `delays`).
    *
    * Returns the frontier columns plus `(host, fetch_slot,
    * fetch_offset_s)`. Shape: host extraction is a column expression,
    * the delay table is host-bounded and broadcast, and the slotting
    * window partitions BY HOST — a 100 TB frontier schedules in one
    * shuffle keyed by host, and the per-host sequentialism is exactly
    * the politeness constraint, not a plan defect. Non-absolute URLs
    * (NULL host) group together and schedule under `defaultDelay`.
    */
  def frontierSchedule(df: DataFrame, urlCol: String, priorityCol: String,
                       delays: DataFrame, delayHostCol: String,
                       delayCol: String,
                       defaultDelay: Double = 1.0): DataFrame = {
    require(defaultDelay >= 0, s"defaultDelay must be >= 0: $defaultDelay")
    for (r <- Seq("host", "fetch_slot", "fetch_offset_s", "__graft_delay"))
      require(!df.columns.contains(r),
        s"input already has a reserved '$r' column")
    val build = broadcast(delays
      .groupBy(lower(col(delayHostCol)).as("host"))
      .agg(min(col(delayCol)).cast("double").as("__graft_delay")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host")
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    df.withColumn("host", UrlOps.urlHost(col(urlCol)))
      .join(build, Seq("host"), "left")
      .withColumn("fetch_slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_offset_s",
        col("fetch_slot") *
          coalesce(col("__graft_delay"), lit(defaultDelay)))
      .drop("__graft_delay")
  }
}
