package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — the upstream
  * the per-source cap ([[Curation.capPerGroup]]) needs: without it
  * `WWW.X.com:80/?b=1&a=2` and `x.com/?a=2&b=1` count as two sources
  * and the cap under-groups. Pure column expressions (regexp parse +
  * array sort), one scan, codegen-friendly, Java ⇄ RE2 parity rules as
  * everywhere (`\A`/`\z` anchors, no lookarounds).
  *
  * Canonical form: `scheme://host[:port]path[?sortedQuery]` with
  * scheme/host lowercased, userinfo dropped, default ports (http:80,
  * https:443) dropped, empty path normalized to `/`, query parameters
  * sorted bytewise with empty params dropped, fragment dropped.
  * Deliberately NOT done: percent-decoding and dot-segment resolution
  * (both change semantics on hostile inputs; crawl pipelines normalize
  * those at fetch time). Non-absolute inputs (no `scheme://`) map to
  * NULL — fail visible, not a half-canonical string.
  */
object UrlOps {

  private val urlPat =
    "\\A([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?\\z"

  /** Tiny TWO-LABEL suffix snapshot for the pure-column
    * [[registrableDomain]] variant (small custom suffix sets, plans
    * that must stay UDF-free). The production path is [[pslDomain]],
    * which matches the FULL bundled public-suffix list — wildcard and
    * exception rules included — via [[PublicSuffixes]].
    */
  val defaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.my",
    "co.in", "co.kr", "co.za", "co.nz", "co.id",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "cloudfront.net", "herokuapp.com")

  /** Lowercased host of an absolute URL (userinfo and port stripped);
    * NULL for non-absolute inputs.
    */
  def urlHost(url: Column): Column = {
    val u = trim(url)
    val auth = regexp_extract(u, urlPat, 2)
    val hostPort = regexp_replace(auth, "\\A.*@", "")
    when(u.rlike(urlPat),
      lower(regexp_replace(hostPort, ":[0-9]*\\z", "")))
      .otherwise(lit(null).cast("string"))
  }

  /** Canonical URL string (see object doc); NULL for non-absolute
    * inputs.
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, urlPat, 1))
    val auth = regexp_extract(u, urlPat, 2)
    val path0 = regexp_extract(u, urlPat, 3)
    val query0 = regexp_extract(u, urlPat, 4)
    val hostPort = regexp_replace(auth, "\\A.*@", "")
    val host = lower(regexp_replace(hostPort, ":[0-9]*\\z", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)\\z", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qInner = regexp_replace(query0, "\\A\\?", "")
    val sortedQ = array_join(
      array_sort(filter(split(qInner, "&"), p => p =!= "")), "&")
    val canon = concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
    when(u.rlike(urlPat), canon).otherwise(lit(null).cast("string"))
  }

  /** SURT-form URL key (Sort-friendly URI Reordering Transform — the
    * Heritrix / wayback-CDX canonical key): the canonical parts of
    * [[canonicalizeUrl]] with the scheme dropped, a leading
    * `www[0-9]*.` host prefix stripped, and the host labels REVERSED
    * comma-joined —
    * `HTTP://WWW.Example.COM:80/a?b=2&a=1#f` → `com,example)/a?a=1&b=2`.
    * Sorting or range-partitioning a crawl frontier on this key
    * clusters every host of a domain (and every path of a host)
    * adjacently — the dedup/partition key CDX indexes are built on,
    * and at 100 TB the difference between per-domain locality and a
    * random shuffle of hosts. Pure column expressions (mirrored by the
    * c27 oracle); NULL for non-absolute inputs.
    */
  def surt(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, urlPat, 1))
    val auth = regexp_extract(u, urlPat, 2)
    val path0 = regexp_extract(u, urlPat, 3)
    val query0 = regexp_extract(u, urlPat, 4)
    val hostPort = regexp_replace(auth, "\\A.*@", "")
    val host = lower(regexp_replace(hostPort, ":[0-9]*\\z", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)\\z", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qInner = regexp_replace(query0, "\\A\\?", "")
    val sortedQ = array_join(
      array_sort(filter(split(qInner, "&"), p => p =!= "")), "&")
    val bare = regexp_replace(host, "\\Awww[0-9]*\\.", "")
    val revHost = array_join(reverse(split(bare, "\\.")), ",")
    val key = concat(revHost,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      lit(")"), path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
    when(u.rlike(urlPat), key).otherwise(lit(null).cast("string"))
  }

  /** Registrable domain (eTLD+1) of an already-extracted lowercase
    * host: the last two labels, or three when the last two form a
    * known multi-part public suffix (`bbc.co.uk`, not `co.uk`).
    * Single-label hosts (`localhost`) and NULLs pass through — they
    * have no registrable domain and their own value is the best
    * grouping key available. IP literals group as-is (the heuristic
    * yields the last two octets' dotted tail — acceptable for a cap
    * key; a pipeline that must treat IPs specially filters them first
    * with a `[0-9.]+` match).
    */
  def registrableDomain(host: Column,
                        multiPartSuffixes: Seq[String] = defaultMultiPartSuffixes): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(host.isNull || n < 2, host)
      .when(n >= 3 && array_contains(typedLit(multiPartSuffixes), lastTwo),
        lastThree)
      .otherwise(lastTwo)
  }

  /** eTLD+1 straight from a raw URL — the one-call grouping key for
    * [[Curation.capPerGroup]]: `capPerGroup(df.withColumn("domain",
    * registrableDomainFromUrl(col("url"))), Seq("domain"), …)`.
    */
  def registrableDomainFromUrl(url: Column,
                               multiPartSuffixes: Seq[String] = defaultMultiPartSuffixes): Column =
    registrableDomain(urlHost(url), multiPartSuffixes)

  /** Registrable domain (eTLD+1) under the FULL bundled public-suffix
    * list — wildcard (`*.ck`) and exception (`!www.ck`) rules included
    * ([[PublicSuffixes]]). This is the production grouping key for
    * per-domain caps and blocklists on real crawl hosts; the
    * Seq-parameterized [[registrableDomain]] stays as the pure-column
    * variant for small custom suffix sets. Same passthrough convention:
    * NULL, single-label hosts and hosts that ARE a public suffix map
    * to themselves.
    *
    * A per-row UDF kernel (≤ label-count hash probes against the
    * per-JVM rule sets) — the 9.5k-rule table cannot live in a
    * `typedLit` without bloating every plan that uses it.
    */
  def pslDomain(host: Column): Column = {
    val f = udf((h: String) => PublicSuffixes.bundled.registrableDomain(h))
    f(host)
  }

  /** [[pslDomain]] composed over [[urlHost]] — eTLD+1 straight from a
    * raw URL under the full bundled list.
    */
  def pslDomainFromUrl(url: Column): Column = pslDomain(urlHost(url))

  /** Every dotted suffix of a host, most-specific first:
    * `a.b.co.uk → [a.b.co.uk, b.co.uk, co.uk, uk]`. The match key for
    * blocklist filtering ([[Curation.dropBlockedDomains]]): an entry
    * `b.co.uk` must block `a.b.co.uk` too — domain blocklists (UT1 and
    * kin) list registrable domains and expect subdomain inheritance.
    * NULL host → empty array (nothing to match).
    */
  def hostSuffixChain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    when(host.isNull, typedLit(Seq.empty[String]))
      .otherwise(transform(sequence(lit(1), n),
        i => array_join(slice(labels, i, n - i + 1), ".")))
  }
}
