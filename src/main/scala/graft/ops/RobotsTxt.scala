package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309, the published Robots Exclusion
  * Protocol) — the crawl-consent side of corpus construction: a WARC
  * sweep carries each host's robots.txt alongside its pages, and a
  * responsible pipeline drops pages their host disallowed BEFORE any
  * content rule (the [[TextAnalysis.robotsNoindex]] meta check covers
  * per-page consent; this covers per-host).
  *
  * Semantics implemented, straight from the RFC:
  *
  *  - records group under `User-agent:` lines; consecutive agent
  *    lines share one group; the agent token matches
  *    case-insensitively and `*` is the catch-all group;
  *  - the MOST SPECIFIC group wins: the group whose agent token is
  *    the longest one contained in the product token, else the `*`
  *    group, else everything is allowed;
  *  - `Allow:` / `Disallow:` values are path patterns where `*`
  *    matches any run (including `/`) and a trailing `$` anchors the
  *    end; matching is from the path START;
  *  - the rule with the LONGEST pattern wins; on a length tie, Allow
  *    wins; no matching rule (or an empty pattern) → allowed;
  *  - lines after `#` are comments; unknown fields are ignored.
  *
  * Evaluation is a per-row kernel (rule matching is an imperative
  * scan — the documented UDF precedent), so checking a billion
  * (page, robots) pairs is a pure map stage: the robots body rides
  * the row (or a broadcast host→robots join upstream), nothing
  * shuffles.
  */
object RobotsTxt {

  /** One parsed rule: allow? plus the original pattern (whose length
    * drives longest-match precedence; wildcard splitting happens at
    * match time in [[matches]]).
    */
  private[ops] final case class Rule(allow: Boolean, pattern: String)

  /** Per-executor parse cache: rules are invariant per (body, agent),
    * but the kernel sees one (page, robots) pair per ROW — a host with
    * a million pages would otherwise pay a million identical parses.
    * Value-keyed (broadcast rows decode fresh String instances, so
    * identity would never hit), bounded by a crude clear at 4096
    * entries (robots bodies per executor are |hosts|-bounded anyway).
    */
  private object RuleCache {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[Rule]]()
    def get(robots: String, ua: String): Seq[Rule] = {
      if (robots == null) return Nil
      if (cache.size > 4096) cache.clear()
      cache.computeIfAbsent((robots, ua),
        (k: (String, String)) => rulesFor(k._1, k._2))
    }
  }

  /** One parsed group: agent tokens, rules, and the group's
    * `Crawl-delay` (a de-facto extension most crawlers honor; not in
    * RFC 9309 but group-scoped like Allow/Disallow in every published
    * implementation).
    */
  private[ops] final case class Group(agents: List[String],
                                      rules: List[Rule],
                                      delay: Option[Double])

  /** All groups plus the file-global `Sitemap:` values (per the
    * sitemaps.org protocol, Sitemap lines are NOT group-scoped — they
    * apply to the whole file wherever they appear).
    */
  private[ops] def parseGroups(robots: String): (List[Group], List[String]) = {
    if (robots == null) return (Nil, Nil)
    var groups = List.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var delay: Option[Double] = None
    var sitemaps = List.empty[String]
    var inAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty) groups ::= Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None
    }
    robots.split("\n", -1).foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            agents ::= value.toLowerCase
          case "allow" | "disallow" =>
            inAgents = false
            rules ::= Rule(field == "allow", value)
          case "crawl-delay" =>
            inAgents = false
            delay = try Some(value.toDouble).filter(d => d >= 0 && d.isFinite)
            catch { case _: NumberFormatException => None }
          case "sitemap" =>
            // global, and does NOT end an agent run (it may legally sit
            // between User-agent lines of one group)
            if (value.nonEmpty) sitemaps ::= value
          case _ => // unknown fields: ignored
        }
      }
    }
    flush()
    (groups.reverse, sitemaps.reverse)
  }

  /** Groups applicable to `userAgent`: every group carrying the most
    * specific matching token (longest contained in ua), else the `*`
    * groups (RFC: same-agent groups combine).
    */
  private def applicableGroups(robots: String,
                               userAgent: String): List[Group] = {
    val (all, _) = parseGroups(robots)
    val ua = userAgent.toLowerCase
    val specific = all.flatMap { g =>
      g.agents.filter(a => a != "*" && a.nonEmpty && ua.contains(a))
        .map(a => (a.length, g))
    }
    if (specific.nonEmpty) {
      val best = specific.map(_._1).max
      specific.collect { case (l, g) if l == best => g }
    } else all.filter(_.agents.contains("*"))
  }

  /** Rules of the group that applies to `userAgent`. */
  private[ops] def rulesFor(robots: String, userAgent: String): Seq[Rule] =
    applicableGroups(robots, userAgent).flatMap(_.rules)

  /** The applicable group's `Crawl-delay` in seconds (first declared
    * wins across merged same-agent groups); None when absent/invalid —
    * the crawler's politeness default applies.
    */
  def crawlDelayOf(robots: String, userAgent: String): Option[Double] =
    applicableGroups(robots, userAgent).flatMap(_.delay).headOption

  /** All `Sitemap:` URLs of the file, in order (file-global). */
  def sitemapsOf(robots: String): Seq[String] = parseGroups(robots)._2

  /** Does `pattern` (with `*` wildcards, optional trailing `$`) match
    * the path from its start? Greedy segment scan — `*` never needs
    * backtracking beyond first-occurrence search because segments are
    * matched left to right (the standard glob-containment argument;
    * with an end anchor the LAST segment must sit at the end).
    */
  private[ops] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val segs = p.split("\\*", -1)
    // first segment must match at position 0
    if (!path.startsWith(segs.head)) return false
    var pos = segs.head.length
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (i == segs.length - 1 && anchored) {
        // last segment must END the path (at or after pos)
        return path.length - s.length >= pos && path.endsWith(s)
      }
      if (s.isEmpty) {
        // trailing '*' (or consecutive '*'): matches the rest
        if (i == segs.length - 1) return true
      } else {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** RFC 9309 verdict for one (robots body, path): longest matching
    * pattern wins, Allow on ties, allowed when nothing matches.
    */
  def isAllowed(robots: String, userAgent: String, path: String): Boolean = {
    if (path == null) return true
    val rs = RuleCache.get(robots, userAgent)
    var bestLen = -1
    var bestAllow = true
    rs.foreach { r =>
      if (r.pattern.nonEmpty && matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          if (len > bestLen) { bestLen = len; bestAllow = r.allow }
          else bestAllow = true
        }
      }
    }
    bestAllow
  }

  private val allowedUdf =
    udf { (robots: String, ua: String, path: String) =>
      isAllowed(robots, if (ua == null) "" else ua, path)
    }

  /** Column form: `robots_allowed(robotsCol, path)` for a fixed
    * product token.
    */
  def allowed(robotsCol: Column, pathCol: Column,
              userAgent: String): Column =
    allowedUdf(robotsCol, lit(userAgent), pathCol)

  /** Append a boolean consent flag (`flagCol`) to `pages`: does the
    * host's robots.txt allow this row's path for `userAgent`? The ONE
    * shared implementation behind [[filterAllowed]] and the pipeline
    * stage:
    *
    *  - hosts match CASE-INSENSITIVELY (hostnames are — the blocklist
    *    stage's rule);
    *  - the build side deduplicates per host (min body wins,
    *    deterministic) — a crawl that fetched robots.txt twice must
    *    not multiply page rows through the left join;
    *  - rows with no robots entry flag true (absent robots.txt
    *    permits crawling — the RFC fail-open rule);
    *  - the build side is |hosts|-bounded and broadcast.
    */
  def withAllowedFlag(pages: DataFrame, hostCol: String, pathCol: String,
                      robots: DataFrame, robotsHostCol: String,
                      robotsBodyCol: String, userAgent: String,
                      flagCol: String = "robots_ok"): DataFrame = {
    for (r <- Seq("__graft_rhost", "__graft_rbody", flagCol))
      require(!pages.columns.contains(r),
        s"input already has a reserved '$r' column")
    val build = broadcast(robots
      .groupBy(lower(col(robotsHostCol)).as("__graft_rhost"))
      .agg(min(col(robotsBodyCol)).as("__graft_rbody")))
    pages.join(build,
        lower(col(hostCol)) === col("__graft_rhost"), "left")
      .withColumn(flagCol,
        col("__graft_rbody").isNull ||
          allowed(col("__graft_rbody"), col(pathCol), userAgent))
      .drop("__graft_rhost", "__graft_rbody")
  }

  /** Drop rows whose host's robots.txt disallows their path for
    * `userAgent` — [[withAllowedFlag]] then the filter.
    */
  def filterAllowed(pages: DataFrame, hostCol: String, pathCol: String,
                    robots: DataFrame, robotsHostCol: String,
                    robotsBodyCol: String, userAgent: String): DataFrame =
    withAllowedFlag(pages, hostCol, pathCol, robots, robotsHostCol,
      robotsBodyCol, userAgent, flagCol = "__graft_robots_ok_tmp")
      .filter(col("__graft_robots_ok_tmp"))
      .drop("__graft_robots_ok_tmp")

  private val crawlDelayUdf = udf((robots: String, ua: String) =>
    crawlDelayOf(robots, ua).map(Double.box).orNull)
  private val sitemapsUdf = udf((robots: String) => sitemapsOf(robots))

  /** `Crawl-delay` seconds of the applicable group as a nullable
    * double column — the per-host politeness budget a frontier
    * scheduler joins onto its queue.
    */
  def crawlDelaySecs(robotsCol: Column, userAgent: String): Column =
    crawlDelayUdf(robotsCol, lit(userAgent))

  /** `Sitemap:` URLs of the file as an array column (file-global). */
  def sitemapList(robotsCol: Column): Column = sitemapsUdf(robotsCol)
}
