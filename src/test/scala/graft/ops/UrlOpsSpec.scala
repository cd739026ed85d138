package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  private def domain(url: String): String =
    Seq(url).toDF("u")
      .select(UrlOps.registrableDomainFromUrl(col("u")).as("d"))
      .collect().head.getString(0)

  test("scheme/host case-fold, default port drop, fragment drop, query sort") {
    assert(canon("HTTP://WWW.Example.COM:80/path/a?b=2&a=1#frag") ==
      "http://www.example.com/path/a?a=1&b=2")
    assert(canon("https://X.org:443/") == "https://x.org/")
    // non-default port survives; path case preserved
    assert(canon("http://x.org:8080/CaseSensitive") ==
      "http://x.org:8080/CaseSensitive")
    // ftp has no default-port rule entry: port survives
    assert(canon("ftp://files.x.net:21/pub") == "ftp://files.x.net:21/pub")
  }

  test("userinfo dropped, empty path becomes /, empty params pruned") {
    assert(canon("http://user:pw@Host.ORG/x") == "http://host.org/x")
    assert(canon("https://x.com") == "https://x.com/")
    assert(canon("https://x.com?") == "https://x.com/")
    assert(canon("https://x.com/?a=1&&b=2&") == "https://x.com/?a=1&b=2")
    // duplicate keys: sorted bytewise, both kept (semantics-preserving)
    assert(canon("https://x.com/?z=1&y=2&z=0") == "https://x.com/?y=2&z=0&z=1")
  }

  test("equivalent spellings canonicalize identically") {
    val variants = Seq(
      "HTTP://X.com/a?b=2&a=1",
      "http://x.COM:80/a?a=1&b=2",
      "http://x.com/a?b=2&a=1#section")
    assert(variants.map(canon).distinct.size == 1)
  }

  test("non-absolute inputs map to NULL, never half-canonical strings") {
    assert(canon("not a url") == null)
    assert(canon("/relative/path?a=1") == null)
    assert(canon("mailto:a@b.com") == null) // no ://
    val r = Seq((1, null: String)).toDF("i", "u")
      .select(UrlOps.canonicalizeUrl(col("u"))).collect().head
    assert(r.isNullAt(0))
  }

  test("registrable domain: eTLD+1 with the multi-part suffix snapshot") {
    assert(domain("http://www.example.com/x") == "example.com")
    assert(domain("https://news.bbc.CO.UK/story") == "bbc.co.uk")
    assert(domain("https://deep.sub.tree.example.com/") == "example.com")
    assert(domain("https://user.github.io/repo") == "user.github.io")
    assert(domain("http://localhost:9000/x") == "localhost")
    // bare two-label host under a multi-part suffix: stays itself
    assert(domain("http://example.com.au/") == "example.com.au")
  }

  test("composition: canonicalize → registrable domain → capPerGroup") {
    // one skewed "domain" spelled five ways + one small domain: the cap
    // must see ONE group for the five spellings
    val docs = Seq(
      (1L, "HTTP://WWW.Spam.COM:80/a", 0.9),
      (2L, "http://spam.com/b", 0.8),
      (3L, "https://Mirror.SPAM.com/c", 0.7),
      (4L, "http://cdn.spam.com:8080/d?x=1", 0.6),
      (5L, "http://spam.com/e#frag", 0.5),
      (6L, "https://tiny.org/only", 0.4))
      .toDF("id", "url", "score")
    val keyed = docs.withColumn("domain",
      UrlOps.registrableDomainFromUrl(col("url")))
    val capped = Curation.capPerGroup(keyed, Seq("domain"), "score", "id", 2)
    val byDomain = capped.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain == Map("spam.com" -> 2L, "tiny.org" -> 1L))
    // quality keeps the best: ids 1 and 2 survive the spam.com cap
    val kept = capped.filter(col("domain") === "spam.com")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("surt: reversed host key, www strip, canonical port/query") {
    val got = Seq(
      "HTTP://WWW.Example.COM:80/path/a?b=2&a=1#frag",
      "https://news.bbc.co.uk/sport",
      "http://www2.Site.ORG:8080/x",
      "https://single/",
      "not a url",
      null: String)
      .toDF("u").select(UrlOps.surt(col("u"))).as[String].collect().toSeq
    assert(got == Seq(
      "com,example)/path/a?a=1&b=2",
      "uk,co,bbc,news)/sport",
      "org,site:8080)/x",
      "single)/",
      null,
      null))
    // the key clusters a domain's hosts adjacently under a plain sort
    val keys = Seq("http://a.example.com/1", "http://other.net/x",
      "http://b.example.com/2", "http://example.com/0")
      .toDF("u").select(UrlOps.surt(col("u")).as("k"))
      .as[String].collect().toSeq.sorted
    assert(keys.count(_.startsWith("com,example")) == 3)
    assert(keys.slice(0, 3).forall(_.startsWith("com,example")))
  }
}
