package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Graph

/** Link-graph gate queries ([[graft.ops.Graph]]): weighted PageRank
  * and degree cards over a deterministic 3-layer purchase graph
  * derived from the TPC-H-ish tables — customer→supplier edges (one
  * per order line, via orders ⋈ lineitem) and supplier→part edges
  * (one per line). Parts have no out-edges, so the dangling-mass
  * redistribution path is exercised on every iteration; parallel
  * edges aggregate to weights.
  *
  * The PageRank oracle unrolls the SAME per-iteration algebra into a
  * CTE chain (one contrib/dangling/rank trio per round), with every
  * float literal cast to DOUBLE so DuckDB's decimal literals don't
  * change the arithmetic; the node id is the row sort key, so float
  * rank values never decide row order.
  */
object GraphQueries {

  private val Iters = 5

  private def purchaseEdges(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val cs = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val sp = lineitem.select(
      concat(lit("s"), col("l_suppkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst"))
    cs.unionByName(sp)
  }

  private val g3InDir = "/tmp/graft_gate_g3_pages"
  private val g3ExpDir = "/tmp/graft_gate_g3_links"

  /** Authored HTML pages + the hand-resolved edge list the extractor
    * must produce (the m14 authored-fixture pattern — every expected
    * row derived by hand from RFC 3986 §5: merge, dot-segment removal,
    * protocol-relative refs, `<base href>` re-basing, entity-decoded
    * hrefs, nofollow rel tokens, and an unterminated trailing anchor).
    */
  private def writeG3Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val pages = Seq(
      ("http://example.com/blog/post1.html",
        """<html><head><title>t</title></head><body>
          |<p>Intro <a href="/about">About <b>Us</b></a></p>
          |<a href="page2.html">Next post</a>
          |<a href="../index.html">Home</a>
          |<A HREF='HTTPS://other.ORG/x?b=2&amp;a=1'>Other&nbsp;site</A>
          |<a rel="nofollow sponsored" href="//cdn.example.net/asset">CDN</a>
          |<a href="#section">skip</a>
          |<a href="javascript:void(0)">skip2</a>
          |<a name="x">no href</a>
          |<a href="mailto:a@b.c">mail</a>
          |</body></html>""".stripMargin),
      ("http://b.org/dir/page.html",
        """<head><base href="/root/"></head>
          |<a href="x.html">X</a>
          |<a href="http://abs.example/y">Y</a>""".stripMargin),
      ("http://c.net",
        """<abbr>no</abbr><a href="a/b.html">deep</a><a href="/z">tail text"""),
      ("http://d.io/p",
        """<a href="http://t.example/p">Target</a><a href="http://t.example/p">Target</a><a href="http://t.example/p"></a><a href="http://t.example/q">Other</a>"""),
      ("http://e.com/",
        """<a href="http://t.example/p">Alpha</a><a href="http://t.example/p">Target</a><a href="http://t.example/r">b</a><a href="http://t.example/r">a</a>"""))
    pages.toDF("page_url", "html")
      .coalesce(1).write.mode("overwrite").parquet(g3InDir)
    val exp = Seq(
      ("http://example.com/blog/post1.html", "http://example.com/about",
        "About Us", false),
      ("http://example.com/blog/post1.html",
        "http://example.com/blog/page2.html", "Next post", false),
      ("http://example.com/blog/post1.html", "http://example.com/index.html",
        "Home", false),
      ("http://example.com/blog/post1.html", "HTTPS://other.ORG/x?b=2&a=1",
        "Other site", false),
      ("http://example.com/blog/post1.html", "http://cdn.example.net/asset",
        "CDN", true),
      ("http://b.org/dir/page.html", "http://b.org/root/x.html", "X", false),
      ("http://b.org/dir/page.html", "http://abs.example/y", "Y", false),
      ("http://c.net", "http://c.net/a/b.html", "deep", false),
      ("http://c.net", "http://c.net/z", "tail text", false),
      ("http://d.io/p", "http://t.example/p", "Target", false),
      ("http://d.io/p", "http://t.example/p", "Target", false),
      ("http://d.io/p", "http://t.example/p", "", false),
      ("http://d.io/p", "http://t.example/q", "Other", false),
      ("http://e.com/", "http://t.example/p", "Alpha", false),
      ("http://e.com/", "http://t.example/p", "Target", false),
      ("http://e.com/", "http://t.example/r", "b", false),
      ("http://e.com/", "http://t.example/r", "a", false))
    exp.toDF("src_url", "dst_url", "anchor_text", "nofollow")
      .coalesce(1).write.mode("overwrite").parquet(g3ExpDir)
  }

  // -- g6 fixture: sitemap bodies hand-authored forward from
  //    sitemaps.org — a urlset with defaults/clamping, a plain-text
  //    sitemap, an unparseable body.
  private val g6Urlset =
    """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>https://alpha.example.com/hot</loc>
      |    <lastmod>2024-05-01</lastmod><changefreq>daily</changefreq>
      |    <priority>0.9</priority></url>
      |  <url><loc>https://alpha.example.com/about</loc></url>
      |  <url><loc>https://alpha.example.com/spiky</loc>
      |    <priority>7</priority></url>
      |  <url><priority>0.4</priority></url>
      |</urlset>""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- g6: sitemap discovery → frontier — urlset parse (loc
    //    required, priority default 0.5 / clamped to [0,1]), text
    //    sitemaps, torn XML to zero rows, then the same politeness
    //    schedule as g5. Hand-derived literals under the hash. -------
    "g6_sitemap_frontier" -> { (s, _) =>
      import s.implicits._
      val bodies = Seq(
        ("alpha", g6Urlset),
        ("beta", "https://beta.example.com/x\nnot a url\n" +
          "https://beta.example.com/y\n"),
        ("broken", "<urlset><unclosed")).toDF("site", "body")
      val delays = Seq(("alpha.example.com", 2.0)).toDF("h", "delay_s")
      graft.ops.Links.frontierSchedule(
          graft.ops.Sitemaps.urls(bodies, "body"), "loc", "priority",
          delays, "h", "delay_s", defaultDelay = 1.0)
        .select(col("site"), col("loc"), col("lastmod"),
          col("changefreq"), col("priority"), col("host"),
          col("fetch_slot"),
          round(col("fetch_offset_s"), 4).as("fetch_offset_s"))
        .orderBy("site", "fetch_slot")
    },

    // -- g1: weighted PageRank, 5 fixed rounds, damping 0.85. -------
    "g1_pagerank" -> { (s, d) =>
      Graph.pageRank(purchaseEdges(s, d), iterations = Iters)
        .orderBy("node")
    },

    // -- g2: per-node degree/weight card over the same graph. -------
    "g2_degree_stats" -> { (s, d) =>
      Graph.degreeStats(purchaseEdges(s, d)).orderBy("node")
    },

    // -- g3: outlink extraction — linear anchor scan, RFC 3986
    //    resolution, <base href>, entity-decoded hrefs, rel=nofollow.
    //    Oracle reads the hand-resolved expected edges back. ---------
    // -- g5: politeness-scheduled crawl frontier — per-host fetch
    //    slots by (priority desc, url) and offsets = slot × the host's
    //    crawl delay (defaults where undeclared). Slots AND offsets
    //    under the hash; the oracle replays the join + window. --------
    "g5_frontier_schedule" -> { (s, d) =>
      import s.implicits._
      val frontier = Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://host"), col("doc_id") % 5,
            lit(".example.com/p/"), col("doc_id")).as("url"),
          (col("doc_id") % 7).cast("long").as("priority"))
      val delays = Seq(("host0.example.com", 2.5),
        ("host1.example.com", 0.5)).toDF("h", "delay_s")
      graft.ops.Links.frontierSchedule(frontier, "url", "priority",
          delays, "h", "delay_s", defaultDelay = 1.0)
        .select(col("doc_id"), col("host"), col("fetch_slot"),
          round(col("fetch_offset_s"), 4).as("fetch_offset_s"))
        .orderBy("doc_id")
    },

    "g3_extract_links" -> { (s, _) =>
      writeG3Fixture(s)
      graft.ops.Links.extractLinks(
          s.read.parquet(g3InDir), "page_url", "html")
        .select(col("page_url").as("src_url"), col("dst_url"),
          col("anchor_text"), col("nofollow"))
        .orderBy("src_url", "dst_url", "anchor_text", "nofollow")
    },

    // -- g4: per-target anchor profile composed ON TOP of the live
    //    extractor (not the stored edges): in-link totals, distinct
    //    linking pages, most-frequent non-empty anchor with a
    //    deterministic tie-break. The oracle computes the same
    //    aggregation in SQL from the expected edge list — so both the
    //    extraction AND the aggregation must agree. ------------------
    "g4_anchor_stats" -> { (s, _) =>
      writeG3Fixture(s)
      val links = graft.ops.Links.extractLinks(
        s.read.parquet(g3InDir), "page_url", "html")
      graft.ops.Links.anchorStats(links, "page_url", "dst_url",
          "anchor_text")
        .orderBy("dst")
    })

  private val edgeSql =
    """SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT 's' || l_suppkey, 'p' || l_partkey FROM lineitem""".stripMargin

  /** One CTE trio per PageRank round; r0 is the uniform start. */
  private def pagerankSql: String = {
    val head =
      s"""WITH ed AS (
         |  $edgeSql
         |), w AS (
         |  SELECT src, dst, count(*) AS w FROM ed GROUP BY 1, 2
         |), ow AS (
         |  SELECT src, sum(w) AS wout FROM w GROUP BY 1
         |), nodes AS (
         |  SELECT src AS node FROM w UNION SELECT dst FROM w
         |), nn AS (
         |  SELECT count(*)::DOUBLE AS cnt FROM nodes
         |), r0 AS (
         |  SELECT node, 1.0::DOUBLE / nn.cnt AS rank FROM nodes, nn
         |)""".stripMargin
    val rounds = (1 to Iters).map { i =>
      val p = s"r${i - 1}"
      s""", c$i AS (
         |  SELECT w.dst AS node, sum(r.rank * w.w / ow.wout) AS contrib
         |  FROM w JOIN ow USING (src) JOIN $p r ON r.node = w.src
         |  GROUP BY 1
         |), d$i AS (
         |  SELECT coalesce(sum(rank), 0.0::DOUBLE) AS dang FROM $p
         |  WHERE node NOT IN (SELECT src FROM ow)
         |), r$i AS (
         |  SELECT n.node,
         |    (1.0::DOUBLE - 0.85::DOUBLE) / nn.cnt +
         |    0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE) +
         |                    d.dang / nn.cnt) AS rank
         |  FROM nodes n LEFT JOIN c$i c USING (node), d$i d, nn
         |)""".stripMargin
    }.mkString
    s"$head$rounds\nSELECT node, rank FROM r$Iters ORDER BY node"
  }

  def oracle: Map[String, String] = Map(
    // Hand-derived: alpha slots by clamped/default priorities at the
    // declared 2 s delay; beta's text sitemap ties break by loc at
    // the 1 s default; the torn body contributes zero rows.
    "g6_sitemap_frontier" ->
      """SELECT * FROM (VALUES
        |  ('alpha', 'https://alpha.example.com/spiky', '', '',
        |   1.0::DOUBLE, 'alpha.example.com', 0::BIGINT, 0.0::DOUBLE),
        |  ('alpha', 'https://alpha.example.com/hot', '2024-05-01',
        |   'daily', 0.9::DOUBLE, 'alpha.example.com', 1::BIGINT,
        |   2.0::DOUBLE),
        |  ('alpha', 'https://alpha.example.com/about', '', '',
        |   0.5::DOUBLE, 'alpha.example.com', 2::BIGINT, 4.0::DOUBLE),
        |  ('beta', 'https://beta.example.com/x', '', '',
        |   0.5::DOUBLE, 'beta.example.com', 0::BIGINT, 0.0::DOUBLE),
        |  ('beta', 'https://beta.example.com/y', '', '',
        |   0.5::DOUBLE, 'beta.example.com', 1::BIGINT, 1.0::DOUBLE))
        |  t(site, loc, lastmod, changefreq, priority, host,
        |    fetch_slot, fetch_offset_s)
        |ORDER BY site, fetch_slot""".stripMargin,
    "g5_frontier_schedule" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    'https://host' || (doc_id % 5) || '.example.com/p/' || doc_id AS url,
        |    (doc_id % 7)::BIGINT AS priority,
        |    'host' || (doc_id % 5) || '.example.com' AS host
        |  FROM documents
        |), d AS (
        |  SELECT 'host0.example.com' AS h, 2.5 AS delay_s
        |  UNION ALL SELECT 'host1.example.com', 0.5
        |), slotted AS (
        |  SELECT doc_id, host,
        |    (row_number() OVER (PARTITION BY host
        |       ORDER BY priority DESC, url) - 1)::BIGINT AS fetch_slot,
        |    coalesce(delay_s, 1.0) AS dly
        |  FROM f LEFT JOIN d ON f.host = d.h
        |)
        |SELECT doc_id, host, fetch_slot,
        |  round(fetch_slot * dly, 4) AS fetch_offset_s
        |FROM slotted ORDER BY doc_id""".stripMargin,
    "g3_extract_links" ->
      s"""SELECT src_url, dst_url, anchor_text, nofollow
         |FROM read_parquet('$g3ExpDir/*.parquet')
         |ORDER BY src_url, dst_url, anchor_text, nofollow""".stripMargin,
    "g4_anchor_stats" ->
      s"""WITH e AS (SELECT * FROM read_parquet('$g3ExpDir/*.parquet')),
         |t AS (
         |  SELECT dst_url AS dst, count(*) AS n_links,
         |         count(DISTINCT src_url) AS n_pages
         |  FROM e GROUP BY 1
         |), pa AS (
         |  SELECT dst_url AS dst, anchor_text AS a, count(*) AS n
         |  FROM e WHERE anchor_text <> '' GROUP BY 1, 2
         |), tops AS (
         |  SELECT dst, a,
         |         row_number() OVER (PARTITION BY dst
         |                            ORDER BY n DESC, a ASC) AS rk
         |  FROM pa
         |)
         |SELECT t.dst, t.n_links, t.n_pages, tops.a AS top_anchor
         |FROM t LEFT JOIN tops ON tops.dst = t.dst AND tops.rk = 1
         |ORDER BY t.dst""".stripMargin,
    "g1_pagerank" -> pagerankSql,
    "g2_degree_stats" ->
      s"""WITH ed AS (
         |  $edgeSql
         |), w AS (
         |  SELECT src, dst, count(*) AS w FROM ed GROUP BY 1, 2
         |), o AS (
         |  SELECT src AS node, count(*) AS out_deg, sum(w) AS out_weight
         |  FROM w GROUP BY 1
         |), i AS (
         |  SELECT dst AS node, count(*) AS in_deg, sum(w) AS in_weight
         |  FROM w GROUP BY 1
         |)
         |SELECT node,
         |  coalesce(out_deg, 0)::BIGINT AS out_deg,
         |  coalesce(in_deg, 0)::BIGINT AS in_deg,
         |  coalesce(out_weight, 0)::BIGINT AS out_weight,
         |  coalesce(in_weight, 0)::BIGINT AS in_weight
         |FROM o FULL OUTER JOIN i USING (node)
         |ORDER BY node""".stripMargin)
}
