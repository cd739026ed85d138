package graft.ops

import scala.io.{Codec, Source}

/** The public-suffix list (publicsuffix.org), bundled as a resource and
  * matched with the published algorithm — full wildcard (`*.ck`) and
  * exception (`!www.ck`) rule support. This is the production
  * registrable-domain (eTLD+1) path behind [[UrlOps.pslDomain]]: the
  * per-domain cap and blocklist grouping are only as good as the
  * suffix data, and real crawls constantly hit `com.hk`, `co.il`,
  * `or.kr`, `netlify.app`, `pages.dev`, … — thousands of suffixes the
  * 35-entry [[UrlOps.defaultMultiPartSuffixes]] snapshot misses.
  *
  * Matching rules (publicsuffix.org/list, "Algorithm"):
  *  1. a rule matches when its labels are a suffix of the host's
  *     labels; `*` stands for exactly one label.
  *  2. exception rules (leading `!`) prevail over everything; the
  *     public suffix is the exception rule minus its leftmost label.
  *  3. otherwise the prevailing rule is the longest match; with no
  *     match at all the implicit rule `*` applies (pslen 1).
  *  4. registrable domain = public suffix plus one more label.
  *
  * Hosts are expected lowercase (what [[UrlOps.urlHost]] emits).
  * Either IDN spelling works: every rule is indexed in BOTH its listed
  * unicode form and its punycode (ACE) form, so `公司.cn` and
  * `xn--55qx5d.cn` hosts match the same suffix.
  *
  * Scale shape: rules load once per JVM from the classpath (executors
  * read their own copy from the shipped jar — ~9.5k entries, nothing
  * is serialized into tasks beyond the object reference), and each row
  * does ≤ label-count hash-set probes.
  *
  * Reference analogue: the reference has no suffix handling at all —
  * this backs the beyond-reference curation surface (per-source caps,
  * domain blocklists) on real crawl hosts.
  */
object PublicSuffixes {

  /** Parsed rule sets: `exact` plain rules, `wildcard` the base after
    * `*.` (rule `*.ck` → entry `ck`), `exception` the rule after `!`.
    */
  final case class Rules(exact: Set[String], wildcard: Set[String],
                         exception: Set[String]) {
    /** Label count of the host's public suffix under these rules. */
    def publicSuffixLabels(labels: Array[String]): Int = {
      val n = labels.length
      var best = 1 // the implicit `*` rule
      var i = 0
      while (i < n) {
        val sfx = join(labels, i, n)
        val klen = n - i
        if (exception.contains(sfx)) return klen - 1 // rule 2: prevails
        if (exact.contains(sfx) && klen > best) best = klen
        if (klen >= 2 && wildcard.contains(join(labels, i + 1, n)) &&
          klen > best) best = klen
        i += 1
      }
      math.min(best, n)
    }

    /** Registrable domain (public suffix + one label). Hosts that ARE
      * a public suffix, single labels (`localhost`) and NULL pass
      * through unchanged — they have no eTLD+1 and their own value is
      * the best grouping key available (the [[UrlOps]] convention).
      */
    def registrableDomain(host: String): String = {
      if (host == null) return null
      val trimmed = host.stripPrefix(".").stripSuffix(".")
      if (trimmed.isEmpty) return host
      val labels = trimmed.split('.')
      val ps = publicSuffixLabels(labels)
      if (labels.length <= ps) host
      else join(labels, labels.length - ps - 1, labels.length)
    }
  }

  private def join(labels: Array[String], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < until) {
      if (i > from) sb.append('.')
      sb.append(labels(i))
      i += 1
    }
    sb.toString
  }

  /** The punycode (ACE) form of a dotted rule, or None when the IDN
    * transform rejects it. The published list stores its ~460 IDN
    * rules in UNICODE form only, while crawl hosts arrive punycoded
    * (`xn--55qx5d.cn`, not `公司.cn`) — indexing both forms makes
    * either spelling match.
    */
  private def aceForm(rule: String): Option[String] =
    try {
      val ace = java.net.IDN.toASCII(rule)
      if (ace != rule) Some(ace.toLowerCase(java.util.Locale.ROOT)) else None
    } catch { case _: IllegalArgumentException => None }

  /** PSL text → rule sets. Comment (`//`) and blank lines skipped;
    * per spec each line is read only up to the first whitespace.
    * Every rule is indexed in BOTH its listed form and its punycode
    * form (see [[aceForm]]).
    */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    def add(b: scala.collection.mutable.Builder[String, Set[String]],
            rule: String): Unit = {
      b += rule
      aceForm(rule).foreach(b += _)
    }
    lines.foreach { raw =>
      val line = raw.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val l = line.toLowerCase
        if (l.startsWith("!")) add(exc, l.substring(1))
        else if (l.startsWith("*.")) add(wild, l.substring(2))
        else add(exact, l)
      }
    }
    Rules(exact.result(), wild.result(), exc.result())
  }

  private val resourcePath = "/graft/public_suffix_list.dat"

  /** The bundled snapshot (Mozilla PSL, MPL-2.0 — public content),
    * parsed once per JVM.
    */
  lazy val bundled: Rules = {
    val in = getClass.getResourceAsStream(resourcePath)
    require(in != null, s"missing classpath resource $resourcePath")
    val src = Source.fromInputStream(in)(Codec.UTF8)
    try parse(src.getLines()) finally src.close()
  }

  /** The raw rules as (kind, base) pairs — what the correctness gates
    * dump to parquet so the DuckDB oracle can re-implement the match
    * independently. kind ∈ {exact, wild, exc}; base is the rule with
    * its `*.` / `!` marker stripped.
    */
  def bundledRuleRows: Seq[(String, String)] =
    bundled.exact.toSeq.sorted.map(("exact", _)) ++
      bundled.wildcard.toSeq.sorted.map(("wild", _)) ++
      bundled.exception.toSeq.sorted.map(("exc", _))
}
