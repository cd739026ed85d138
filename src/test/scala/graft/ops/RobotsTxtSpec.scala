package graft.ops

import graft.SparkSpec
import graft.ops.RobotsTxt.isAllowed

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private val robots =
    """# demo robots
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp/*.pdf$
      |Allow: /dup
      |Disallow: /dup
      |Allow: /
      |Crawl-delay: 10
      |
      |User-agent: graftbot
      |Disallow: /only-graft
      |""".stripMargin

  test("longest-match, Allow-on-tie, wildcards and end anchors") {
    def ok(p: String) = isAllowed(robots, "otherbot", p)
    assert(!ok("/private/file")) // Disallow /private (8) > Allow / (1)
    assert(ok("/private/ok/x")) // Allow /private/ok (11) > Disallow (8)
    assert(!ok("/tmp/a.pdf")) // /tmp/*.pdf$ matches, len 11
    assert(ok("/tmp/a.pdfx")) // anchor fails -> only Allow /
    assert(ok("/pub"))
    assert(ok("/dup/a")) // equal-length Allow and Disallow -> Allow
  }

  test("specific agent group overrides *; case-insensitive token") {
    assert(!isAllowed(robots, "GraftBot/1.0", "/only-graft/x"))
    // the graftbot group says nothing about /private -> allowed
    assert(isAllowed(robots, "graftbot", "/private/file"))
    // the '*' group has no /only-graft rule -> allowed for otherbot
    assert(isAllowed(robots, "otherbot", "/only-graft-not"))
  }

  test("fail-open: no robots, no matching group, empty patterns") {
    assert(isAllowed(null, "x", "/anything"))
    assert(isAllowed("User-agent: onlybot\nDisallow: /", "other", "/a"))
    assert(isAllowed("User-agent: *\nDisallow:", "x", "/a"))
    assert(isAllowed(robots, "otherbot", null))
  }

  test("same-agent groups merge (RFC group combination)") {
    val r = "User-agent: a\nDisallow: /x\n\nUser-agent: a\nDisallow: /y"
    assert(!isAllowed(r, "a", "/x1"))
    assert(!isAllowed(r, "a", "/y1"))
    // consecutive agent lines share one group
    val r2 = "User-agent: a\nUser-agent: b\nDisallow: /z"
    assert(!isAllowed(r2, "b", "/z"))
  }

  test("filterAllowed: broadcast host join, absent robots passes") {
    val pages = Seq(
      (1L, "a.com", "/private/x"),
      (2L, "a.com", "/pub"),
      (3L, "b.com", "/private/x")) // no robots for b.com -> allowed
      .toDF("id", "host", "path")
    val hosts = Seq(("a.com", robots)).toDF("host_name", "body")
    val kept = RobotsTxt.filterAllowed(pages, "host", "path",
        hosts, "host_name", "body", userAgent = "otherbot")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
  }

  test("withAllowedFlag: case-insensitive hosts, duplicate hosts don't multiply") {
    val pages = Seq(
      (1L, "Ex.COM", "/private/x"),
      (2L, "ex.com", "/pub")).toDF("id", "host", "path")
    // duplicate host rows (http+https fetches) and mixed case
    val hosts = Seq(("EX.com", robots), ("ex.com", robots))
      .toDF("host_name", "body")
    val out = RobotsTxt.withAllowedFlag(pages, "host", "path",
        hosts, "host_name", "body", "otherbot")
      .select("id", "robots_ok").as[(Long, Boolean)].collect().toSeq
      .sorted
    // exactly one row per page (no join multiplication), verdicts
    // applied despite the case difference
    assert(out == Seq((1L, false), (2L, true)))
    intercept[IllegalArgumentException] {
      RobotsTxt.withAllowedFlag(
        pages.withColumn("robots_ok",
          org.apache.spark.sql.functions.lit(true)),
        "host", "path", hosts, "host_name", "body", "x")
    }
  }

  test("crawl-delay: group-scoped, specificity, merge, invalid values") {
    val body = Seq(
      "User-agent: *", "Crawl-delay: 10", "Disallow: /x",
      "User-agent: graftbot", "Crawl-delay: 1.5", "Allow: /").mkString("\n")
    // specific group's delay, not the catch-all's
    assert(RobotsTxt.crawlDelayOf(body, "graftbot-v2") == Some(1.5))
    assert(RobotsTxt.crawlDelayOf(body, "randombot") == Some(10.0))
    // applicable group without a delay: the * value must NOT leak in
    val noDelay = Seq("User-agent: *", "Crawl-delay: 5",
      "User-agent: graftbot", "Disallow: /y").mkString("\n")
    assert(RobotsTxt.crawlDelayOf(noDelay, "graftbot").isEmpty)
    // merged same-agent groups: first declared wins
    val merged = Seq("User-agent: graftbot", "Crawl-delay: 2",
      "", "User-agent: graftbot", "Crawl-delay: 7").mkString("\n")
    assert(RobotsTxt.crawlDelayOf(merged, "graftbot") == Some(2.0))
    // invalid / negative / absent / null all resolve to None
    assert(RobotsTxt.crawlDelayOf("User-agent: *\nCrawl-delay: soon", "b").isEmpty)
    assert(RobotsTxt.crawlDelayOf("User-agent: *\nCrawl-delay: -3", "b").isEmpty)
    assert(RobotsTxt.crawlDelayOf("User-agent: *\nAllow: /", "b").isEmpty)
    assert(RobotsTxt.crawlDelayOf(null, "b").isEmpty)
    // a crawl-delay line must not detach rules from their group
    val glued = Seq("User-agent: *", "Crawl-delay: 4",
      "Disallow: /z").mkString("\n")
    assert(!RobotsTxt.isAllowed(glued, "anybot", "/z/page"))
  }

  test("sitemaps: file-global, position-independent, ordered") {
    val body = Seq(
      "Sitemap: https://a.example/one.xml",
      "User-agent: *", "Disallow: /x",
      "Sitemap: https://a.example/two.xml",
      "User-agent: other", "Allow: /",
      "Sitemap: https://a.example/three.xml").mkString("\n")
    assert(RobotsTxt.sitemapsOf(body) == Seq(
      "https://a.example/one.xml", "https://a.example/two.xml",
      "https://a.example/three.xml"))
    // a sitemap line between rules must not split the group
    assert(!RobotsTxt.isAllowed(body, "anybot", "/x/q"))
    assert(RobotsTxt.sitemapsOf("User-agent: *\nAllow: /") == Seq.empty)
    assert(RobotsTxt.sitemapsOf(null) == Seq.empty)
  }
}
