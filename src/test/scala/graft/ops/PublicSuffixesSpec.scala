package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the PSL matcher against publicsuffix.org's OWN published test
  * vectors (the `checkPublicSuffix` cases from the list's test data —
  * public content), adapted to the engine's passthrough convention:
  * where the reference vectors expect NULL (host is itself a public
  * suffix, or a single label), this engine returns the host unchanged
  * as the grouping key, which the cases below encode explicitly.
  */
class PublicSuffixesSpec extends SparkSpec {
  import spark.implicits._

  private val R = PublicSuffixes.bundled

  test("bundled list parses to full-size rule sets") {
    assert(R.exact.size > 9000, s"exact rules: ${R.exact.size}")
    assert(R.wildcard.size > 100, s"wildcard rules: ${R.wildcard.size}")
    assert(R.exception.size >= 8, s"exception rules: ${R.exception.size}")
    // spot entries the 35-entry snapshot missed — the point of the change
    for (s <- Seq("com.hk", "co.il", "com.tw", "co.th", "or.kr",
      "netlify.app", "pages.dev", "web.app", "pvt.k12.ma.us"))
      assert(R.exact.contains(s), s"missing PSL entry $s")
    assert(R.wildcard.contains("ck"))
    assert(R.exception.contains("www.ck"))
  }

  test("publicsuffix.org test vectors (registrable domain)") {
    val cases = Seq(
      // (host, expected eTLD+1); passthrough convention where the
      // upstream vectors say NULL
      "com" -> "com",
      "example.com" -> "example.com",
      "www.example.com" -> "example.com",
      "uk.com" -> "uk.com", // private registry, itself a suffix
      "example.uk.com" -> "example.uk.com",
      "b.example.uk.com" -> "example.uk.com",
      "co.uk" -> "co.uk",
      "example.co.uk" -> "example.co.uk",
      "www.example.co.uk" -> "example.co.uk",
      "jp" -> "jp",
      "test.jp" -> "test.jp",
      "www.test.jp" -> "test.jp",
      "ac.jp" -> "ac.jp",
      "test.ac.jp" -> "test.ac.jp",
      "www.test.ac.jp" -> "test.ac.jp",
      // jp geographic 3-level suffixes + city exceptions
      "kyoto.jp" -> "kyoto.jp",
      "test.kyoto.jp" -> "test.kyoto.jp",
      "ide.kyoto.jp" -> "ide.kyoto.jp",
      "b.ide.kyoto.jp" -> "b.ide.kyoto.jp",
      "a.b.ide.kyoto.jp" -> "b.ide.kyoto.jp",
      "c.kobe.jp" -> "c.kobe.jp",
      "b.c.kobe.jp" -> "b.c.kobe.jp",
      "a.b.c.kobe.jp" -> "b.c.kobe.jp",
      "city.kobe.jp" -> "city.kobe.jp", // exception rule
      "www.city.kobe.jp" -> "city.kobe.jp",
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "www.city.kawasaki.jp" -> "city.kawasaki.jp",
      // wildcard TLDs
      "ck" -> "ck",
      "test.ck" -> "test.ck",
      "b.test.ck" -> "b.test.ck",
      "a.b.test.ck" -> "b.test.ck",
      "www.ck" -> "www.ck", // the !www.ck exception
      "www.www.ck" -> "www.ck",
      // us K12 deep suffixes
      "us" -> "us",
      "test.us" -> "test.us",
      "www.test.us" -> "test.us",
      "ak.us" -> "ak.us",
      "test.ak.us" -> "test.ak.us",
      "www.test.ak.us" -> "test.ak.us",
      "k12.ak.us" -> "k12.ak.us",
      "test.k12.ak.us" -> "test.k12.ak.us",
      "www.test.k12.ak.us" -> "test.k12.ak.us",
      "pvt.k12.ma.us" -> "pvt.k12.ma.us",
      "school.pvt.k12.ma.us" -> "school.pvt.k12.ma.us",
      "www.school.pvt.k12.ma.us" -> "school.pvt.k12.ma.us",
      // unlisted TLD → implicit * rule
      "example" -> "example",
      "example.example" -> "example.example",
      "b.example.example" -> "example.example",
      "a.b.example.example" -> "example.example",
      // private-section hosting suffixes
      "blogspot.com" -> "blogspot.com",
      "foo.blogspot.com" -> "foo.blogspot.com",
      "x.foo.blogspot.com" -> "foo.blogspot.com",
      "user.github.io" -> "user.github.io",
      "site.netlify.app" -> "site.netlify.app",
      "proj.pages.dev" -> "proj.pages.dev",
      "app.web.app" -> "app.web.app")
    for ((host, want) <- cases)
      assert(R.registrableDomain(host) == want,
        s"registrableDomain($host) = ${R.registrableDomain(host)}, want $want")
  }

  test("IDN rules match in both unicode and punycode spellings") {
    // the list stores 公司.cn in unicode; crawl hosts arrive punycoded
    assert(R.exact.contains("公司.cn"))
    assert(R.exact.contains("xn--55qx5d.cn"))
    assert(R.registrableDomain("shop.foo.公司.cn") == "foo.公司.cn")
    assert(R.registrableDomain("shop.foo.xn--55qx5d.cn") ==
      "foo.xn--55qx5d.cn")
  }

  test("edges: null, empty, surrounding dots, IPs") {
    assert(R.registrableDomain(null) == null)
    assert(R.registrableDomain("") == "")
    assert(R.registrableDomain("localhost") == "localhost")
    assert(R.registrableDomain(".example.com.") == "example.com")
    // IP literals have no suffix semantics — implicit * groups the tail
    assert(R.registrableDomain("192.168.0.1") == "0.1")
  }

  test("parse: whitespace truncation, comments, case-fold") {
    val r = PublicSuffixes.parse(Iterator(
      "// comment", "", "com", "CO.UK extra-tokens-ignored",
      "*.ck", "!www.ck", "  "))
    assert(r.exact == Set("com", "co.uk"))
    assert(r.wildcard == Set("ck"))
    assert(r.exception == Set("www.ck"))
  }

  test("pslDomain column matches the scala kernel through Spark") {
    val hosts = Seq("www.example.co.uk", "a.b.test.ck", "www.city.kobe.jp",
      "x.foo.blogspot.com", "shop.example.com.hk", null)
    val out = hosts.toDF("h")
      .select(UrlOps.pslDomain(col("h")).as("d"))
      .as[String].collect()
    assert(out.toSeq == hosts.map(h =>
      if (h == null) null else R.registrableDomain(h)))
  }
}
