package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Curation

/** Dataset-curation gate queries: deterministic split assignment,
  * stratified sampling and PII redaction over the documents table.
  * Every query is reproducible from content hashes alone (no RNG), so
  * the DuckDB oracle can rebuild the identical result.
  */
object CurationQueries {

  /** Deterministically dirtied text: every 5th doc gains an email,
    * every 5th+1 a phone, every 5th+2 an IPv4 — so each redaction rule
    * fires on a knowable subset and the oracle mirrors the injection.
    */
  private def dirtied = concat(col("text"),
    when(col("doc_id") % 5 === 0,
      concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
      .when(col("doc_id") % 5 === 1, lit(" call +1-555-0100-123"))
      .when(col("doc_id") % 5 === 2,
        concat(lit(" from 10.0.0."), col("doc_id") % 256))
      .otherwise(lit("")))

  private val dirtiedSql =
    """text || CASE
      |  WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com'
      |  WHEN doc_id % 5 = 1 THEN ' call +1-555-0100-123'
      |  WHEN doc_id % 5 = 2 THEN ' from 10.0.0.' || (doc_id % 256)
      |  ELSE '' END""".stripMargin

  /** c30: the leaked-benchmark sentence (injected verbatim on even
    * doc_ids; the probe row is the same string, so the sentence-level
    * map must flag exactly that ordinal).
    */
  private val c30Probe =
    "The forbidden benchmark answer sentence appears verbatim right here."

  private def c30Text = concat(col("text"),
    lit(". More ordinary prose continues here after the base text."),
    when(col("doc_id") % 2 === 0,
      lit(s" $c30Probe And a clean closing line follows."))
      .otherwise(lit("")))

  private val c30TextSql =
    "text || '. More ordinary prose continues here after the base text.'" +
      " || CASE WHEN doc_id % 2 = 0 THEN ' " + c30Probe +
      " And a clean closing line follows.' ELSE '' END"

  /** c13 fixture: card-shaped injections per doc_id % 6 — a Luhn-valid
    * Visa, a checksum-off-by-one 16-digit run, a 20-digit run the `\b`
    * guard must reject wholesale, a Luhn-valid 15-digit Amex. Fixed
    * test PANs (the industry's published test numbers), never real.
    */
  private def cardDirtied = concat(coalesce(col("text"), lit("")),
    when(col("doc_id") % 6 === 0, lit(" pay 4111 1111 1111 1111 now"))
      .when(col("doc_id") % 6 === 1, lit(" ref 4111 1111 1111 1112 x"))
      .when(col("doc_id") % 6 === 2, lit(" acct 41111111111111111111 ."))
      .when(col("doc_id") % 6 === 3, lit(" amex 378282246310005 ok"))
      .otherwise(lit("")))

  private val cardDirtiedSql =
    """coalesce(text, '') || CASE
      |  WHEN doc_id % 6 = 0 THEN ' pay 4111 1111 1111 1111 now'
      |  WHEN doc_id % 6 = 1 THEN ' ref 4111 1111 1111 1112 x'
      |  WHEN doc_id % 6 = 2 THEN ' acct 41111111111111111111 .'
      |  WHEN doc_id % 6 = 3 THEN ' amex 378282246310005 ok'
      |  ELSE '' END""".stripMargin

  /** c10 fixture URLs: four deterministic shapes cycling with
    * doc_id % 4 — case-mangled host + default port + unsorted query +
    * fragment; an https co.uk with default port and duplicate-key
    * params; a userinfo + non-default port; an ftp (port rules don't
    * apply). Same string algebra both engines.
    */
  private def c10Url = {
    val k = (col("doc_id") % 7).cast("string")
    when(col("doc_id") % 4 === 0,
      concat(lit("HTTP://WWW.Example"), k, lit(".COM:80/path/a?b=2&a=1#frag")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://News.Site"), k, lit(".co.uk:443/?z=1&y=2&z=0")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("http://user:pw@Host"), k, lit(".ORG:8080/x/y")))
      .otherwise(concat(lit("ftp://Files.Example"), k, lit(".NET:21/pub")))
  }

  /** c15 blocklist: a registrable domain (blocks www. subdomain hosts),
    * an exact multi-label host, a .co.uk registrable, and a bare TLD
    * (blocks every .net host) — one entry per match class.
    */
  private val c15Blocked = Seq("example3.com", "host1.org", "site5.co.uk", "net")

  private val c10UrlSql =
    """CASE
      |  WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.Example' || (doc_id % 7) || '.COM:80/path/a?b=2&a=1#frag'
      |  WHEN doc_id % 4 = 1 THEN 'https://News.Site' || (doc_id % 7) || '.co.uk:443/?z=1&y=2&z=0'
      |  WHEN doc_id % 4 = 2 THEN 'http://user:pw@Host' || (doc_id % 7) || '.ORG:8080/x/y'
      |  ELSE 'ftp://Files.Example' || (doc_id % 7) || '.NET:21/pub'
      |END""".stripMargin

  /** c16 fixture: adversarial host inventory for the FULL-PSL
    * registrable-domain gate — wildcard (`*.ck`) and exception
    * (`!www.ck`, `!city.kobe.jp`) rules, 3-label suffixes
    * (`pvt.k12.ma.us`, `ide.kyoto.jp`), ccTLD second levels the old
    * snapshot missed (`com.hk`, `co.il`, `or.kr`…), private hosting
    * suffixes, unlisted TLDs, IPs, single labels and NULL. The rule
    * table itself is dumped alongside so the DuckDB oracle re-implements
    * the published matching algorithm INDEPENDENTLY over the same data
    * — a real cross-engine check, not stored-expected readback.
    */
  private val c16Dir = "/tmp/graft_gate_c16_psl"

  private def writeC16Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val hosts: Seq[(Long, Option[String])] = Seq(
      1L -> Some("www.example.com"),
      2L -> Some("example.com"),
      3L -> Some("shop.example.com.hk"),
      4L -> Some("news.co.il"),
      5L -> Some("a.b.site.com.tw"),
      6L -> Some("foo.example.co.th"),
      7L -> Some("bar.example.or.kr"),
      8L -> Some("my.site.netlify.app"),
      9L -> Some("proj.pages.dev"),
      10L -> Some("app.web.app"),
      11L -> Some("user.github.io"),
      12L -> Some("blog.blogspot.com"),
      13L -> Some("www.example.co.uk"),
      14L -> Some("a.b.ide.kyoto.jp"),   // 3-label geographic suffix
      15L -> Some("www.city.kobe.jp"),   // exception under *.kobe.jp
      16L -> Some("city.kawasaki.jp"),   // exception, host = eTLD+1
      17L -> Some("a.b.test.ck"),        // wildcard *.ck
      18L -> Some("www.www.ck"),         // exception !www.ck
      19L -> Some("www.school.pvt.k12.ma.us"), // 4-label suffix
      20L -> Some("school.pvt.k12.ma.us"),
      21L -> Some("a.b.example.example"), // unlisted TLD → implicit *
      22L -> Some("192.168.0.1"),        // IP literal
      23L -> Some("localhost"),          // single label
      24L -> Some("com"),                // host IS a public suffix
      25L -> Some("co.uk"),
      26L -> Some("example.uk.com"),     // private registry suffix
      27L -> Some("deep.sub.example.org"),
      28L -> Some("x.y.z.example.ac.jp"),
      29L -> Some("test.ck"),            // wildcard: host IS a suffix
      30L -> None,
      31L -> Some("shop.foo.xn--55qx5d.cn"), // IDN suffix, punycode host
      32L -> Some("shop.foo.公司.cn"))        // same suffix, unicode host
    hosts.toDF("host_id", "host")
      .coalesce(1).write.mode("overwrite").parquet(s"$c16Dir/hosts")
    graft.ops.PublicSuffixes.bundledRuleRows.toDF("kind", "base")
      .coalesce(1).write.mode("overwrite").parquet(s"$c16Dir/rules")
  }

  /** pipe1 fixture algebra, shared verbatim between the Spark gate and
    * the oracle: odd docs are the incoming crawl (every `%10==1` doc
    * carrying a 95%-token near-dup of its even neighbor), even docs
    * are the already-curated seen corpus backing the signature index,
    * and `%30==9` docs' raw text is the benchmark/eval probe set.
    */
  private val pipe1HtmlPrefix =
    "<html><head><title>Corpus</title><style>a{b:c}</style></head><body>" +
      "<h1>Shared header</h1><p>"
  private val pipe1HtmlSuffix =
    "</p><div><a href=\"/a\">A</a> | <a href=\"/b\">B</a></div></body></html>"

  /** c26 term list: messy raw forms (case, doubled whitespace) plus
    * overlapping entries — normalization + output-chain merging are
    * part of what the gate checks. One term never occurs (proves no
    * false hits from automaton construction).
    */
  private val c26Terms = Seq(
    "BadTerm", "Spam  phrase", "forbidden words", "Forbidden", "spam",
    "the", "data", "model", "never-seen-xyzzy phrase")

  private def c26Canon: Seq[String] =
    c26Terms.map(_.trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")).distinct

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- c20: temperature-scaled mixture sampling (mT5 α-sampling) —
    //    α = 0.5 routes through IEEE-exact sqrt; at this corpus no
    //    group saturates (rate = 2/√n_g < 1 for n_g ≥ 4), so the
    //    oracle replays the one-shot rate formula + the shared
    //    hash-bucket selection without the waterfill loop (the spec
    //    covers saturation). ------------------------------------------
    "c20_temperature_mix" -> { (s, d) =>
      Curation.temperatureSample(Tables.documents(s, d),
          "source", "doc_id", alpha = 0.5, budget = 200)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum("doc_id").cast("long").as("sum_ids"))
        .orderBy("source")
    },

    // -- c21: the COMPOSED Gopher quality filter (paper table A1
    //    defaults) — all 13 repetition signals + line/word-shape +
    //    lexical rules folded into one gopher_pass flag, rolled up per
    //    (source, verdict). The oracle replays every rule input from
    //    scratch (GopherSql fragments shared with t26). --------------
    "c21_gopher_filter" -> { (s, d) =>
      graft.ops.RepetitionSignals
        .gopherFilter(graft.util.Par.spread(Tables.documents(s, d),
          "doc_id"), "text")
        .groupBy("source", "gopher_pass")
        .agg(count(lit(1)).as("n"),
          round(avg(col("tok_n")), 4).as("avg_tok"))
        .orderBy("source", "gopher_pass")
    },

    // -- c25: deterministic global training shuffle — pseudorandom
    //    (shard, position) from sha256(seed:id); the oracle replays
    //    the hash → mod-shard → within-shard row_number pipeline from
    //    the hex digest (p5 HUGEINT pattern). No global sort: the
    //    window partitions by shard. ----------------------------------
    "c25_global_shuffle" -> { (s, d) =>
      Curation.globalShuffle(Tables.documents(s, d), "doc_id",
          nShards = 8, seed = 42L)
        .select(col("doc_id"), col("shuffle_shard").cast("int")
          .as("shuffle_shard"), col("shuffle_pos"))
        .orderBy("doc_id")
    },

    // -- c24: robots.txt evaluation (RFC 9309) — longest-match rules,
    //    Allow-on-tie, * wildcards, $ anchors, specific-agent groups.
    //    Fixture verdicts hand-derived from the RFC's own rules (see
    //    writeC24Fixture); kernel not SQL-expressible (stored-
    //    expectation pattern like t22). --------------------------------
    // -- c29: robots.txt directive extensions — group-scoped
    //    Crawl-delay (specificity + merge rules shared with c24's
    //    gated group selection) and file-global Sitemap collection.
    //    Expectations hand-derived at the fixture (writeC29Fixture). --
    "c29_robots_directives" -> { (s, _) =>
      writeC29Fixture(s)
      s.read.parquet(c29Dir)
        .select(col("case_id"),
          graft.ops.RobotsTxt.crawlDelaySecs(col("robots"), "graftbot")
            .as("crawl_delay"),
          array_join(graft.ops.RobotsTxt.sitemapList(col("robots")), "|")
            .as("sitemaps"))
        .orderBy("case_id")
    },

    "c24_robots_txt" -> { (s, _) =>
      writeC24Fixture(s)
      s.read.parquet(c24Dir)
        .select(col("case_id"),
          graft.ops.RobotsTxt.allowed(col("robots"), col("path"),
            userAgent = "otherbot").as("allowed"))
        .orderBy("case_id")
    },

    // -- c23: tokenize-and-pack TERMINUS — greedy vocab ids + eos per
    //    doc, concatenated per source in sha order, chopped at exact
    //    64-id boundaries (docs split across examples). The oracle
    //    re-derives everything: t14's recursive greedy CTE extended
    //    with an id accumulator, then stream slicing. ----------------
    "c23_pack_token_ids" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val withIds = docs.select(col("doc_id"), col("source"),
        graft.ops.VocabTokenizer.greedyIds(col("text"), c23Vocab).as("tids"))
      Curation.packTokenIds(withIds, "source", "doc_id", "tids",
          seqLen = 64, eosId = Some(c23Vocab.length + 1))
        .select(col("source"), col("example_id"),
          array_join(col("ids").cast("array<string>"), " ").as("ids"),
          col("n_ids"))
        .orderBy("source", "example_id")
    },

    // -- c22: per-rule Gopher violation counts — the drop report a
    //    pipeline logs before committing to thresholds; one aggregate
    //    row, every rule counted independently. ----------------------
    "c22_gopher_rules" -> { (s, d) =>
      graft.ops.RepetitionSignals
        .ruleViolationCounts(graft.util.Par.spread(Tables.documents(s, d),
          "doc_id"), "text")
    },

    // -- pipe1: the COMPOSED golden curation pipeline — html extract →
    //    langid → quality → corpus-wide segment dedup → near-dup vs
    //    the minhash signature index → decontamination → mix reweight
    //    → sequence packing → sharded export, as ONE program
    //    (CurationPipeline.curate) with observed per-stage metrics.
    //    The final kept rows' content digests are UNDER the hash; the
    //    oracle computes the identical composition in SQL. ------------
    "pipe1_golden" -> { (s, d) =>
      import graft.ops.{CurationPipeline, Dedup}
      val docs = Tables.documents(s, d).select("doc_id", "text", "source")
      val nb = docs.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("__prev"))
      val toks = split(col("__prev"), " ")
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .join(nb, Seq("doc_id"), "left")
        .withColumn("content", coalesce(
          when(col("doc_id") % 10 === 1 && col("__prev").isNotNull,
            array_join(slice(toks, lit(1),
              ceil(size(toks) * 0.95).cast("int")), " "))
            .otherwise(col("text")), lit("")))
        .select(col("doc_id"), col("source"),
          concat(lit(pipe1HtmlPrefix), col("content"),
            lit(pipe1HtmlSuffix)).as("html"))
      val seen = docs.filter(col("doc_id") % 2 === 0)
      val index = Dedup.buildMinhashIndex(seen, "doc_id", "text")
      val probes = docs.filter(col("doc_id") % 30 === 9).select("text")
      val out = CurationPipeline.curate(incoming, index, probes, "text",
        CurationPipeline.Config("doc_id", "html", "source",
          targetMix = Map("src0" -> 40, "src1" -> 30, "src2" -> 20,
            "src3" -> 10),
          exportDir = Some("/tmp/graft_gate_pipe1_export"),
          extractor = "blocks"))
      out.data.orderBy("doc_id")
    },

    // -- c17: DSIR importance weights (Xie et al. 2023) — hashed
    //    unigram+bigram bucket distributions (target = en docs, raw =
    //    all), add-1 smoothing, per-doc log-likelihood ratio. The
    //    oracle recomputes EVERYTHING from the documents table: its own
    //    feature extraction, its own sha256-52-bit bucketing, its own
    //    smoothed distributions. Every 10th doc keeps the gate small;
    //    the distributions still come from the full corpus. -----------
    "c17_dsir_weights" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.importanceWeights(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", buckets = 256, alpha = 1.0)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("n_feats"),
          round(col("log_importance"), 4).as("log_w"))
        .orderBy("doc_id")
    },

    // -- c18: CCNet-style per-language score buckets — fit exact
    //    quartile thresholds (0.25/0.75 — quarter fractions make the
    //    interpolation weight exact, see fitScoreThresholds) on the
    //    4-dp-rounded bigram-LM score, stamp head/middle/tail, roll up.
    //    Fit + apply are separate calls, the deployment shape. --------
    "c18_ppl_buckets" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = graft.ops.TextAnalysis
        .bigramLogProb(docs, "doc_id", "text")
        .select(col("doc_id"), round(col("lm_logprob"), 4).as("score"))
        .join(docs.select("doc_id", "lang"), "doc_id")
      val thresholds = Curation.fitScoreThresholds(scored, Seq("lang"),
        "score", fractions = Seq(0.25, 0.75), exact = true)
      Curation.bucketByThresholds(scored, thresholds, Seq("lang"), "score")
        .groupBy("lang", "score_bucket")
        .agg(count(lit(1)).as("n"), round(avg("score"), 4).as("avg_score"))
        .orderBy("lang", "score_bucket")
    },

    // -- c26: the SCALE path of the term blocklist — Aho-Corasick
    //    automaton (one scan per row, list size unbounded) with the
    //    same padded word-boundary semantics as c19's expression tree.
    //    Overlapping terms (forbidden / forbidden words, spam /
    //    spam phrase) exercise the merged-output chains; the oracle
    //    recomputes every hit with uniform ' term ' substring tests
    //    over the same normalization. ---------------------------------
    "c26_aho_blocklist" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val dirty = docs.withColumn("t",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" BadTerm")))
          .when(col("doc_id") % 7 === 0,
            concat(lit("spam   PHRASE leads. "), col("text")))
          .when(col("doc_id") % 11 === 0,
            concat(lit("totally Forbidden\tWords here. "), col("text"),
              lit(" BadTerm")))
          .otherwise(col("text")))
      dirty.select(col("doc_id"),
          Curation.blockedTermsMatched(col("t"), c26Terms).as("__h"))
        .select(col("doc_id"),
          array_join(col("__h"), ",").as("hits"),
          size(col("__h")).cast("long").as("n_hits"))
        .filter(col("n_hits") > 0)
        .orderBy("doc_id")
    },

    // -- c19: C4-style term-blocklist flag — deterministic dirtying
    //    injects a single word (every 5th doc) and a two-word phrase
    //    (every 7th, spelled with case + run-whitespace differences so
    //    normalization is what matches). Oracle replays the same
    //    when-chain and both match rules. -----------------------------
    "c19_term_filter" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val dirty = docs.withColumn("t",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" BadTerm")))
          .when(col("doc_id") % 7 === 0,
            concat(lit("spam   PHRASE leads. "), col("text")))
          .otherwise(col("text")))
      dirty.select(col("source"),
          Curation.blockedTermFlag(col("t"),
            Seq("badterm", "Spam  phrase")).as("blocked"))
        .groupBy("source", "blocked")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "blocked")
    },

    // -- c16: registrable domain under the FULL bundled public-suffix
    //    list (9.5k rules, wildcard + exception semantics). The oracle
    //    gets only the raw (kind, base) rule rows and re-derives every
    //    domain with its own implementation of the algorithm. ---------
    "c16_psl_domain" -> { (s, _) =>
      import graft.ops.UrlOps
      writeC16Fixture(s)
      s.read.parquet(s"$c16Dir/hosts")
        .select(col("host_id"), col("host"),
          UrlOps.pslDomain(col("host")).as("domain"))
        .orderBy("host_id")
    },

    // -- c11: deterministic token-budget subset — the maximal
    //    sha256(id)-order prefix whose whitespace-token total stays
    //    within budget. Kept (doc_id, n_tok) rows are under the hash;
    //    the oracle replays the same order + inclusive running-sum rule
    //    with a plain window (oracle scale permits what the operator's
    //    two-level bucket shape exists to avoid). ---------------------
    "c11_token_budget" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.tokenCount(col("text"))
            .cast("long").as("n_tok"))
      Curation.takeTokenBudget(docs, "doc_id", "n_tok", budget = 5000L)
        .orderBy("doc_id")
    },
    // -- c12: domain-mix reweighting — subsample sources to a 4:3:2:1
    //    target mix (other sources dropped). Per-source kept counts AND
    //    sum of kept ids are under the hash, so the exact kept SET —
    //    integer thresholds + bucket membership — is pinned, not just
    //    its size. ----------------------------------------------------
    "c12_mix_reweight" -> { (s, d) =>
      Curation.mixReweight(Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 40, "src1" -> 30, "src2" -> 20, "src3" -> 10))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("sum_ids"))
        .orderBy("source")
    },

    // -- c10: URL canonicalization + registrable domain (eTLD+1) — the
    //    per-source cap's grouping key. Canonical strings are under
    //    the hash, so scheme/host case-folding, userinfo/default-port/
    //    fragment drop, query sort and the multi-part-suffix rule are
    //    all pinned exactly. ------------------------------------------
    "c10_url_canon" -> { (s, d) =>
      import graft.ops.UrlOps
      Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0)
        .withColumn("url", c10Url)
        .select(col("doc_id"),
          UrlOps.canonicalizeUrl(col("url")).as("canon"),
          // the full-PSL path; on these fixture hosts (.com/.co.uk/
          // .org/.net) it provably agrees with the snapshot rule the
          // oracle embeds — c16 covers the cases where they differ
          UrlOps.pslDomainFromUrl(col("url")).as("domain"))
        .orderBy("doc_id")
    },

    // -- c27: SURT-form URL keys (the wayback-CDX canonical key) —
    //    reversed comma-joined host (www-prefix stripped), canonical
    //    port/path/query, scheme dropped. Full keys under the hash;
    //    the oracle re-derives every key from the c10 parsing CTEs
    //    plus list_reverse. --------------------------------------------
    "c27_surt" -> { (s, d) =>
      import graft.ops.UrlOps
      Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0)
        .withColumn("url", c10Url)
        .select(col("doc_id"), UrlOps.surt(col("url")).as("surt"))
        .orderBy("doc_id")
    },

    // -- c15: domain-blocklist filter (UT1-style) — a row is dropped
    //    when its host or ANY dotted suffix of it is listed: a
    //    registrable-domain entry blocks all subdomains, a bare-TLD
    //    entry blocks the whole TLD. The kept set is the gate result;
    //    the oracle expresses the same rule as host = d OR host LIKE
    //    '%.' || d (suffix-on-dot-boundary ≡ the suffix chain). ------
    "c15_blocklist" -> { (s, d) =>
      import graft.ops.UrlOps
      import s.implicits._
      val blocked = c15Blocked.toDF("domain")
      val hosts = Tables.documents(s, d)
        .withColumn("host", UrlOps.urlHost(c10Url))
      Curation.dropBlockedDomains(hosts, "host", blocked)
        .groupBy("host")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("sum_ids"))
        .orderBy("host")
    },

    // -- c1: hash-stable train/val/test assignment ---------------------
    "c1_split_assign" -> { (s, d) =>
      Curation.withSplit(Tables.documents(s, d), "doc_id",
        trainPct = 80, valPct = 10)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("min_id"),
          sum("doc_id").as("sum_ids"))
        .orderBy("split")
    },

    // -- c2: deterministic per-stratum sample (k lowest hashes) --------
    "c2_stratified_sample" -> { (s, d) =>
      Curation.samplePerStratum(Tables.documents(s, d), "lang", "doc_id", k = 5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("sum_ids"))
        .orderBy("lang")
    },

    // -- c4: benchmark decontamination — every 50th doc plays the eval
    //    set; any training doc sharing a 3-gram with it is contaminated
    //    (the probes trivially contaminate themselves, plus whatever
    //    shares phrases — the oracle rebuilds the identical truth) ----
    "c4_decontamination" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val probes = docs.filter(col("doc_id") % 50 === 0).select("text")
      Curation.contaminatedBy(docs, "doc_id", "text", probes, "text")
        .agg(
          count(lit(1)).as("n_contaminated"),
          sum("n_hits").as("total_hits"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
    },

    // -- c14: graded contamination — per-doc overlap FRACTION with the
    //    same probe set c4 uses; the thresholdable form of the binary
    //    membership rule. Per-doc rows keep every (n_shingles, n_hits)
    //    pair under the hash. --------------------------------------
    "c14_contamination_score" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val probes = docs.filter(col("doc_id") % 50 === 0).select("text")
      Curation.contaminationScore(docs, "doc_id", "text", probes, "text")
        .orderBy("doc_id")
    },

    // -- c5: per-group quality-quantile filter — keep docs at/above the
    //    per-lang median length (Spark's exact `percentile` ≡ DuckDB
    //    `quantile_cont`; tiny threshold frame broadcast back onto one
    //    corpus scan) -----------------------------------------------
    "c5_quality_quantile" -> { (s, d) =>
      Curation.filterByQualityQuantile(
        Tables.documents(s, d), "n_chars", Seq("lang"), q = 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          min("n_chars").as("min_kept_chars"),
          sum("n_chars").as("sum_kept_chars"))
        .orderBy("lang")
    },

    // -- c6: per-domain cap — each source keeps its 3 longest docs
    //    (ties by doc_id). Two-phase bounded top-k; the oracle's
    //    row_number window rebuilds the same (n_chars DESC, doc_id)
    //    rank truth. --------------------------------------------------
    "c6_source_cap" -> { (s, d) =>
      Curation.capPerGroup(Tables.documents(s, d),
          Seq("source"), "n_chars", "doc_id", k = 3)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum("doc_id").as("sum_ids"),
          min("n_chars").as("min_chars"))
        .orderBy("source")
    },

    // -- c7: sequence packing — contiguous fill of 2000-char packs per
    //    source shard; pack_id = floor(running_sum_before / capacity).
    //    One keyed window on both engines. --------------------------
    "c7_pack_sequences" -> { (s, d) =>
      Curation.packSequences(Tables.documents(s, d),
          "source", "doc_id", "n_chars", capacity = 2000)
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("pack_chars"),
          min("doc_id").as("first_id"))
        .orderBy("source", "pack_id")
    },

    // -- c8: per-type winsorization of event values at the exact
    //    [5%, 95%] band — threshold frame broadcast onto one scan. ----
    "c8_winsorize" -> { (s, d) =>
      Curation.winsorize(Tables.events(s, d), "value",
          Seq("event_type"), pLo = 0.05, pHi = 0.95)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum("value_winsorized"), 2).as("sum_w"),
          round(min("value_winsorized"), 4).as("min_w"),
          round(max("value_winsorized"), 4).as("max_w"))
        .orderBy("event_type")
    },

    // -- c9: weighted sampling (Efraimidis–Spirakis, hash-derived
    //    uniforms) — 4 docs per language, probability ∝ n_chars. The
    //    sampled ids themselves are under the hash. -------------------
    "c9_weighted_sample" -> { (s, d) =>
      Curation.weightedSample(Tables.documents(s, d),
          "doc_id", "n_chars", k = 4, groupCols = Seq("lang"))
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    },

    // -- c13: Luhn-validated card redaction. Injection classes by
    //    doc_id % 6: 0 = valid Visa (redacts), 1 = checksum-off-by-one
    //    (candidate, NOT redacted), 2 = 20-digit run (no candidate at
    //    all — the \b guard), 3 = valid 15-digit Amex (redacts),
    //    4/5 = nothing. Grouping by class makes each behavior a
    //    separate hashed row instead of one blended total. ------------
    "c13_card_redaction" -> { (s, d) =>
      val base = Tables.documents(s, d).withColumn("dirty", cardDirtied)
      // Candidates = digit ZONES in the PAN length range (13–19
      // digits) — the same zone-then-length-filter rule the kernel
      // applies, so n_candidates counts exactly the zones the Luhn
      // check then arbitrates.
      base
        .withColumn("n_candidates",
          size(filter(
            regexp_extract_all(col("dirty"),
              lit(graft.functions.CardNumberUtil.candidateRegex), lit(0)),
            x => length(regexp_replace(x, "[^0-9]", ""))
              .between(graft.functions.CardNumberUtil.minDigits,
                graft.functions.CardNumberUtil.maxDigits)))
            .cast("long"))
        .withColumn("n_cards", Curation.cardCount(col("dirty")).cast("long"))
        .withColumn("clean", Curation.redactCards(col("dirty")))
        .groupBy((col("doc_id") % 6).as("k"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_candidates").as("total_candidates"),
          sum("n_cards").as("total_cards"),
          sum(length(col("dirty")) - length(col("clean"))).as("chars_delta"),
          sum(when(col("clean").contains("[CARD]"), 1L).otherwise(0L))
            .as("n_docs_redacted"))
        .orderBy("k")
    },

    // -- c3: PII detection counts + redaction length delta -------------
    // -- c31: GROUP-consistent (leakage-safe) split — keying the
    //    hash-stable split on the GROUP column (source/host) puts every
    //    document of one group in the SAME split, so near-duplicates
    //    within a site can never straddle train/test. The oracle
    //    re-derives the sha-256 bucket with HUGEINT arithmetic (the p5
    //    pattern) and the same percentage cuts; one output row per
    //    (source, split) pair — a source landing in two splits would
    //    change the row set itself. --------------------------------
    "c31_group_split" -> { (s, d) =>
      graft.ops.Curation.withSplit(Tables.documents(s, d), "source",
          trainPct = 80, valPct = 10)
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("doc_id").as("n_distinct"))
        .orderBy("source", "split")
    },

    // -- c30: SENTENCE-level decontamination map — which sentence
    //    ordinals of each doc overlap the probe set (the surgical
    //    alternative to c4's whole-doc verdict). Injected probe
    //    sentence on even doc_ids; ordinals under the hash. ------------
    "c30_sentence_decon" -> { (s, d) =>
      import s.implicits._
      val probes = Seq(c30Probe).toDF("text")
      Curation.contaminatedSentences(
          Tables.documents(s, d)
            .filter(col("doc_id") % 3 === 0)
            .withColumn("t", c30Text),
          "doc_id", "t", probes, "text")
        // the driver's compare hashes scalar cells — ordinals ride as
        // a joined string; the op itself returns the real array
        .withColumn("contaminated_idx",
          concat_ws(",", col("contaminated_idx")))
        .orderBy("doc_id")
    },

    // -- c28: PII match AUDIT — every matched email/phone/IPv4 string
    //    exploded to a row (the attribute log reviewed before the c3
    //    redaction commits). Matched text itself is under the hash;
    //    the oracle replays regexp_extract_all over the same masked
    //    chain and unnests with ordinality. -----------------------------
    "c28_pii_matches" -> { (s, d) =>
      Curation.piiMatches(
          Tables.documents(s, d).withColumn("dirty", dirtied),
          "doc_id", "dirty")
        .orderBy("doc_id", "kind", "match_idx")
    },

    "c3_pii_redaction" -> { (s, d) =>
      val base = Tables.documents(s, d).withColumn("dirty", dirtied)
      val withCounts = Curation.piiCounts(col("dirty"))
        .foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
      withCounts
        .withColumn("clean", Curation.redactPii(col("dirty")))
        .agg(
          sum("n_emails").as("total_emails"),
          sum("n_phones").as("total_phones"),
          sum("n_ipv4").as("total_ipv4"),
          sum(length(col("dirty")) - length(col("clean"))).as("chars_delta"),
          sum(when(col("clean").contains("[EMAIL]"), 1).otherwise(0)).as("n_docs_email_redacted"))
    })

  /** Marker-hit count over a named column — delegates to the ONE
    * t1/t2 mirror helper so the two oracles cannot drift.
    */
  private def pipe1Hits(c: String, markers: Seq[String]): String =
    TextQueries.sqlHits(markers, c)

  /** 3-gram word-shingle set over a token-list column. (The same
    * expression appears inline in the pre-existing c4/c14/d10 oracle
    * strings; new oracles should use this helper.)
    */
  private def pipe1Shingles(toks: String): String =
    s"list_distinct(CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')] " +
      s"ELSE list_transform(range(1, len($toks) - 1), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]) END)"

  /** c24 fixture: one robots body, ten paths, verdicts hand-derived
    * from RFC 9309 (ua = "otherbot" → the `*` group):
    *
    *  rules: Disallow /private (8) | Allow /private/ok (11) |
    *  Disallow "/tmp/&#42;.pdf$" (11 — star wildcard, end anchor) |
    *  Allow /dup (4) | Disallow /dup (4) | Allow / (1)
    *
    *  0 /private/file → Disallow(8) beats Allow /(1) → false
    *  1 /private/ok/x → Allow(11) beats Disallow(8) → true
    *  2 /privateer    → /private prefix-matches → false
    *  3 /tmp/a.pdf    → anchored wildcard matches (11) → false
    *  4 /tmp/a.pdfx   → anchor fails → Allow / → true
    *  5 /tmp/deep/x.pdf → '*' spans '/' → false
    *  6 /dup/a        → tie (4 vs 4) → Allow wins → true
    *  7 /pub          → only Allow / matches → true
    *  8 /only-graft   → that rule lives in the graftbot group → true
    *  9 '' (empty)    → nothing matches → true
    */
  private val c24Dir = "/tmp/graft_gate_c24_robots"

  private def writeC24Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val robots = Seq(
      "# demo", "User-agent: *", "Disallow: /private",
      "Allow: /private/ok", "Disallow: /tmp/*.pdf$", "Allow: /dup",
      "Disallow: /dup", "Allow: /", "", "User-agent: graftbot",
      "Disallow: /only-graft").mkString("\n")
    val rows: Seq[(Long, String, String, Boolean)] = Seq(
      (0L, robots, "/private/file", false),
      (1L, robots, "/private/ok/x", true),
      (2L, robots, "/privateer", false),
      (3L, robots, "/tmp/a.pdf", false),
      (4L, robots, "/tmp/a.pdfx", true),
      (5L, robots, "/tmp/deep/x.pdf", false),
      (6L, robots, "/dup/a", true),
      (7L, robots, "/pub", true),
      (8L, robots, "/only-graft", true),
      (9L, robots, "", true))
    s.createDataset(rows)
      .toDF("case_id", "robots", "path", "exp_allowed")
      .coalesce(1).write.mode("overwrite").parquet(c24Dir)
  }

  /** c29 fixture: robots bodies exercising the directive extensions —
    * group-scoped Crawl-delay (specific group beats `*`, invalid and
    * negative values ignored, first declared wins across merged
    * same-agent groups) and file-global Sitemap lines (position-
    * independent, may interleave groups). Expectations hand-derived
    * from the group-selection rules the c24 verdicts already pin.
    */
  private val c29Dir = "/tmp/graft_gate_c29_robots_dir"

  private def writeC29Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val bodyA = Seq(
      "Sitemap: https://a.example/sitemap.xml",
      "User-agent: *", "Crawl-delay: 10", "Disallow: /x",
      "", "User-agent: graftbot", "Crawl-delay: 1.5", "Allow: /",
      "Sitemap: https://a.example/news.xml").mkString("\n")
    val bodyB = Seq( // invalid delay in *, none for graftbot
      "User-agent: *", "Crawl-delay: soon",
      "User-agent: graftbot", "Disallow: /y").mkString("\n")
    val bodyC = Seq( // merged same-agent groups: first delay wins
      "User-agent: graftbot", "Crawl-delay: 2",
      "", "User-agent: graftbot", "Crawl-delay: 7",
      "", "User-agent: *", "Crawl-delay: -3").mkString("\n")
    // (case_id, robots, exp_delay nullable, exp_sitemaps joined)
    val rows: Seq[(java.lang.Long, String, java.lang.Double, String)] = Seq(
      // graftbot group is more specific than * → 1.5, both sitemaps
      (0L, bodyA, 1.5,
        "https://a.example/sitemap.xml|https://a.example/news.xml"),
      // graftbot matched; its group has no delay; * delay must NOT leak
      (1L, bodyB, null, ""),
      // merged graftbot groups: first declared delay (2) wins
      (2L, bodyC, 2.0, ""),
      // no robots at all → fail-open: no delay, no sitemaps
      (3L, null, null, ""),
      (4L, "", null, ""))
    s.createDataset(rows)
      .toDF("case_id", "robots", "exp_delay", "exp_sitemaps")
      .coalesce(1).write.mode("overwrite").parquet(c29Dir)
  }

  /** c23 vocabulary: multi-char pieces with overlapping prefixes (so
    * greedy longest-match is exercised) plus the full lowercase
    * alphabet (so letters never go unknown; digits/punct do →
    * unk id = |vocab|, eos id = |vocab|+1).
    */
  private[queries] val c23Vocab: Seq[String] =
    Seq("scan", "sc", "an", "table", "ta", "ble", "row", "val", "ue",
      "the", "th") ++ ('a' to 'z').map(_.toString)

  /** The c21/c22 oracle's per-doc Gopher rule-input CTE chain — every
    * signal recomputed from scratch in SQL (GopherSql fragments shared
    * with t26). Ends with `pd(doc_id, source, tok_n, …, dup10)`.
    */
  private def gopherPdSql: String = {
    val stopHits = graft.ops.RepetitionSignals.stopwords
      .map(w => s"(CASE WHEN list_contains(tk, '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    raw"""WITH base AS (
       |  SELECT doc_id, source, text, coalesce(text, '') AS t
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, regexp_extract_all(t, '[^ \t\n\f\r]+') AS tk
       |  FROM base),
       |tot AS (
       |  SELECT doc_id,
       |    coalesce(list_sum(list_transform(tk, x -> len(x))), 0)::DOUBLE
       |      AS tc
       |  FROM toks),
       |${GopherSql.unitDupCtes("l", "string_split(t, chr(10))")},
       |${GopherSql.unitDupCtes("p", "regexp_split_to_array(t, '\n{2,}')")},
       |${GopherSql.topGramCtes(2)},
       |${GopherSql.topGramCtes(3)},
       |${GopherSql.topGramCtes(4)},
       |${GopherSql.dupGramCtes(5)},
       |${GopherSql.dupGramCtes(6)},
       |${GopherSql.dupGramCtes(7)},
       |${GopherSql.dupGramCtes(8)},
       |${GopherSql.dupGramCtes(9)},
       |${GopherSql.dupGramCtes(10)},
       |pd AS (
       |  SELECT b.doc_id, b.source,
       |    len(k.tk)::BIGINT AS tok_n,
       |    CASE WHEN len(k.tk) > 0 THEN
       |      len(regexp_replace(b.t, '[ \t\n\f\r]+', '', 'g'))::DOUBLE
       |        / len(k.tk) ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN len(k.tk) > 0 THEN
       |      (len(regexp_extract_all(b.t, '#')) +
       |       len(regexp_extract_all(b.t, '\.\.\.')))::DOUBLE
       |        / len(k.tk) ELSE 0.0 END AS symbol_word_ratio,
       |    CASE WHEN b.text IS NULL THEN 0.0
       |         WHEN len(string_split(b.t, chr(10))) > 0 THEN
       |      len(regexp_extract_all(b.t, '(?m)^[ \t]*[-*•]'))::DOUBLE
       |        / len(string_split(b.t, chr(10))) ELSE 0.0 END
       |      AS bullet_line_ratio,
       |    CASE WHEN b.text IS NULL THEN 0.0
       |         WHEN len(string_split(b.t, chr(10))) > 0 THEN
       |      len(regexp_extract_all(b.t, '(?m)(\.\.\.|…)\r?$$'))::DOUBLE
       |        / len(string_split(b.t, chr(10))) ELSE 0.0 END
       |      AS ellipsis_line_ratio,
       |    CASE WHEN len(k.tk) > 0 THEN
       |      len(list_filter(k.tk, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
       |        / len(k.tk) ELSE 0.0 END AS alpha_word_ratio,
       |    ($stopHits) AS stopword_hits,
       |    coalesce(ls.f, 0) AS dlf, coalesce(ls.cf, 0) AS dlcf,
       |    coalesce(ps.f, 0) AS dpf, coalesce(ps.cf, 0) AS dpcf,
       |    ${GopherSql.charFrac("coalesce(t2.num, 0)")} AS top2,
       |    ${GopherSql.charFrac("coalesce(t3.num, 0)")} AS top3,
       |    ${GopherSql.charFrac("coalesce(t4.num, 0)")} AS top4,
       |    ${GopherSql.charFrac("coalesce(d5.cc, 0)")} AS dup5,
       |    ${GopherSql.charFrac("coalesce(d6.cc, 0)")} AS dup6,
       |    ${GopherSql.charFrac("coalesce(d7.cc, 0)")} AS dup7,
       |    ${GopherSql.charFrac("coalesce(d8.cc, 0)")} AS dup8,
       |    ${GopherSql.charFrac("coalesce(d9.cc, 0)")} AS dup9,
       |    ${GopherSql.charFrac("coalesce(d10.cc, 0)")} AS dup10
       |  FROM base b
       |  JOIN toks k USING (doc_id)
       |  JOIN tot tt USING (doc_id)
       |  LEFT JOIN lstat ls USING (doc_id)
       |  LEFT JOIN pstat ps USING (doc_id)
       |  LEFT JOIN top2 t2 USING (doc_id)
       |  LEFT JOIN top3 t3 USING (doc_id)
       |  LEFT JOIN top4 t4 USING (doc_id)
       |  LEFT JOIN dup5 d5 USING (doc_id)
       |  LEFT JOIN dup6 d6 USING (doc_id)
       |  LEFT JOIN dup7 d7 USING (doc_id)
       |  LEFT JOIN dup8 d8 USING (doc_id)
       |  LEFT JOIN dup9 d9 USING (doc_id)
       |  LEFT JOIN dup10 d10 USING (doc_id))""".stripMargin
  }

  /** The full 22-term Gopher pass conjunction over `pd`'s columns. */
  private val gopherPassSql: String =
    """(tok_n >= 50 AND tok_n <= 100000 AND
      |   mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND
      |   symbol_word_ratio <= 0.1 AND
      |   bullet_line_ratio <= 0.9 AND ellipsis_line_ratio <= 0.3 AND
      |   alpha_word_ratio >= 0.8 AND stopword_hits >= 2 AND
      |   dlf <= 0.30 AND dpf <= 0.30 AND
      |   dlcf <= 0.20 AND dpcf <= 0.20 AND
      |   top2 <= 0.20 AND top3 <= 0.18 AND top4 <= 0.16 AND
      |   dup5 <= 0.15 AND dup6 <= 0.14 AND dup7 <= 0.13 AND
      |   dup8 <= 0.12 AND dup9 <= 0.11 AND dup10 <= 0.10)""".stripMargin

  def oracle: Map[String, String] = Map(
    // Rate r_g = budget·(√n_g/Σ√n)/n_g, threshold floor(round(r·10⁴,6)),
    // selection by the shared sha-256 16-hex-digit bucket (the c12
    // replay). Operation order mirrors temperatureSample exactly.
    "c20_temperature_mix" ->
      """WITH cnt AS (
        |  SELECT source AS g, count(*) AS n FROM documents
        |  WHERE source IS NOT NULL GROUP BY 1),
        |q AS (SELECT g, n, sqrt(n::DOUBLE) AS s FROM cnt),
        |tot AS (SELECT sum(s) AS qs FROM q),
        |th AS (
        |  SELECT g, floor(round(200 * (s / qs) / n * 10000, 6))::INT AS t
        |  FROM q, tot),
        |bkt AS (
        |  SELECT doc_id, source,
        |    ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::HUGEINT
        |               * (1::HUGEINT << ((16 - i) * 4)))
        |      FROM generate_series(1, 16) g(i)) % 10000)::INT AS bucket
        |  FROM (SELECT doc_id, source, sha256(doc_id::VARCHAR) AS h
        |        FROM documents))
        |SELECT source, count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_ids
        |FROM bkt JOIN th ON bkt.source = th.g
        |WHERE bucket < t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Stored expectation: delays/sitemaps hand-derived at the fixture
    // (writeC29Fixture) — the c24 pattern.
    "c29_robots_directives" ->
      s"""SELECT case_id, exp_delay AS crawl_delay, exp_sitemaps AS sitemaps
         |FROM read_parquet('$c29Dir/*.parquet')
         |ORDER BY case_id""".stripMargin,
    "c24_robots_txt" ->
      s"""SELECT case_id, exp_allowed AS allowed
         |FROM read_parquet('$c24Dir/*.parquet')
         |ORDER BY case_id""".stripMargin,
    // Shard = unsigned first-8-bytes of sha256('42:'||id) mod 8 (p5
    // HUGEINT reconstruction); position = row_number per shard ordered
    // by the full hex digest (hex order ≡ unsigned numeric order).
    "c25_global_shuffle" ->
      """SELECT doc_id, shard AS shuffle_shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
        |    AS shuffle_pos
        |FROM (
        |  SELECT doc_id, h,
        |    ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::HUGEINT
        |               * (1::HUGEINT << ((16 - i) * 4)))
        |      FROM generate_series(1, 16) g(i)) % 8)::INT AS shard
        |  FROM (SELECT doc_id, sha256('42:' || doc_id::VARCHAR) AS h
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // The packing oracle builds the SAME deterministic stream a
    // different way: recursive greedy segmentation per distinct word
    // (t14's CTE + an id accumulator), per-doc flatten in word order +
    // eos, per-source flatten in (sha256(id), id) order, then direct
    // slicing of the whole stream — equivalence with the engine's
    // windowed fragment reassembly is exactly what the gate checks.
    "c23_pack_token_ids" -> {
      val vocabValues = c23Vocab.zipWithIndex
        .map { case (v, i) => s"('$v', $i)" }.mkString(", ")
      raw"""WITH RECURSIVE vocab(v, tid) AS (VALUES $vocabValues),
         |toksrc AS (
         |  SELECT doc_id, source,
         |    regexp_extract_all(text, '[^ \t\n\f\r]+') AS tk
         |  FROM documents),
         |words AS (
         |  SELECT doc_id, i, tk[i] AS w
         |  FROM toksrc, unnest(range(1, len(tk) + 1)) u(i)),
         |dw AS (SELECT DISTINCT w FROM words),
         |seg AS (
         |  SELECT w, 1 AS pos, []::INT[] AS ids FROM dw
         |  UNION ALL
         |  SELECT w, pos + coalesce(ml, 1) AS pos,
         |    list_append(ids, coalesce(
         |      (SELECT min(tid) FROM vocab WHERE v = substr(w, pos, ml)),
         |      ${c23Vocab.length})::INT) AS ids
         |  FROM (
         |    SELECT w, pos, ids,
         |      (SELECT max(len(v)) FROM vocab
         |       WHERE v = substr(w, pos, len(v))) AS ml
         |    FROM seg WHERE pos <= len(w))),
         |fin AS (SELECT w, ids FROM seg WHERE pos > len(w)),
         |docids AS (
         |  SELECT wo.doc_id, flatten(list(f.ids ORDER BY wo.i)) AS ids
         |  FROM words wo JOIN fin f USING (w) GROUP BY 1),
         |perdoc AS (
         |  SELECT t.doc_id, t.source,
         |    list_append(coalesce(d.ids, []::INT[]),
         |      ${c23Vocab.length + 1}::INT) AS doc_ids
         |  FROM toksrc t LEFT JOIN docids d USING (doc_id)),
         |stream AS (
         |  SELECT source,
         |    flatten(list(doc_ids
         |      ORDER BY sha256(doc_id::VARCHAR), doc_id)) AS s_ids
         |  FROM perdoc GROUP BY source),
         |ex AS (
         |  SELECT source, e::BIGINT AS example_id,
         |    s_ids[e*64 + 1 : least((e+1)*64, len(s_ids))] AS ids
         |  FROM stream, unnest(range(0, (len(s_ids) + 63) // 64)) u(e))
         |SELECT source, example_id,
         |  list_aggregate(list_transform(ids, x -> x::VARCHAR),
         |    'string_agg', ' ') AS ids,
         |  len(ids)::BIGINT AS n_ids
         |FROM ex ORDER BY source, example_id""".stripMargin
    },
    // Every Gopher rule input recomputed from scratch (tokenization,
    // guarded ratios, all 9 n-gram families via the t26 fragment
    // builders) — shared by c21 (the composed verdict rollup) and c22
    // (per-rule violation counts).
    "c21_gopher_filter" ->
      (gopherPdSql + "\n" +
        s"""SELECT source,
           |  $gopherPassSql AS gopher_pass,
           |  count(*) AS n, round(avg(tok_n), 4) AS avg_tok
           |FROM pd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // One row; every rule counted independently (a doc can fail many).
    "c22_gopher_rules" -> {
      def fail(name: String, ok: String): String =
        s"  coalesce(sum(CASE WHEN NOT ($ok) THEN 1 ELSE 0 END), 0)::BIGINT" +
          s" AS fail_$name"
      val rules = Seq(
        "words" -> "tok_n >= 50 AND tok_n <= 100000",
        "mean_word_len" -> "mean_word_len >= 3.0 AND mean_word_len <= 10.0",
        "symbol_ratio" -> "symbol_word_ratio <= 0.1",
        "bullet_lines" -> "bullet_line_ratio <= 0.9",
        "ellipsis_lines" -> "ellipsis_line_ratio <= 0.3",
        "alpha_words" -> "alpha_word_ratio >= 0.8",
        "stopwords" -> "stopword_hits >= 2",
        "dup_line" -> "dlf <= 0.30",
        "dup_line_char" -> "dlcf <= 0.20",
        "dup_para" -> "dpf <= 0.30",
        "dup_para_char" -> "dpcf <= 0.20",
        "top_2gram" -> "top2 <= 0.20",
        "top_3gram" -> "top3 <= 0.18",
        "top_4gram" -> "top4 <= 0.16",
        "dup_5gram" -> "dup5 <= 0.15",
        "dup_6gram" -> "dup6 <= 0.14",
        "dup_7gram" -> "dup7 <= 0.13",
        "dup_8gram" -> "dup8 <= 0.12",
        "dup_9gram" -> "dup9 <= 0.11",
        "dup_10gram" -> "dup10 <= 0.10")
      gopherPdSql + "\n" +
        "SELECT count(*)::BIGINT AS n_docs,\n" +
        rules.map { case (n, ok) => fail(n, ok) }.mkString(",\n") + ",\n" +
        s"  coalesce(sum(CASE WHEN $gopherPassSql THEN 1 ELSE 0 END), 0)" +
        "::BIGINT AS n_pass\nFROM pd"
    },
    "c26_aho_blocklist" -> {
      val termArray = c26Canon.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH dirty AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' BadTerm'
         |         WHEN doc_id % 7 = 0 THEN 'spam   PHRASE leads. ' || text
         |         WHEN doc_id % 11 = 0
         |           THEN 'totally Forbidden\tWords here. ' || text
         |                || ' BadTerm'
         |         ELSE text END AS t
         |  FROM documents
         |), norm AS (
         |  SELECT doc_id,
         |    ' ' || lower(regexp_replace(coalesce(t, ''),
         |                 '[ \t\n\f\r]+', ' ', 'g')) || ' ' AS nt
         |  FROM dirty
         |), h AS (
         |  SELECT doc_id,
         |    list_sort(list_filter($termArray,
         |      x -> strpos(nt, ' ' || x || ' ') > 0)) AS hits
         |  FROM norm
         |)
         |SELECT doc_id, array_to_string(hits, ',') AS hits,
         |       len(hits)::BIGINT AS n_hits
         |FROM h WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin
    },
    "c19_term_filter" ->
      """WITH dirty AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' BadTerm'
        |         WHEN doc_id % 7 = 0 THEN 'spam   PHRASE leads. ' || text
        |         ELSE text END AS t
        |  FROM documents
        |), norm AS (
        |  SELECT source,
        |    lower(regexp_replace(coalesce(t, ''), '[ \t\n\f\r]+', ' ', 'g'))
        |      AS nt
        |  FROM dirty
        |)
        |SELECT source,
        |  (list_contains(string_split(nt, ' '), 'badterm') OR
        |   strpos(' ' || nt || ' ', ' spam phrase ') > 0) AS blocked,
        |  count(*) AS n
        |FROM norm GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "c17_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, regexp_extract_all(text, '[^ \t\n\f\r]+') AS t
        |  FROM documents
        |), feats AS (
        |  SELECT doc_id, lang, unnest(t) AS f FROM toks
        |  UNION ALL
        |  SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS f
        |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
        |        FROM toks)
        |), fb AS (
        |  SELECT doc_id, lang,
        |    ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::BIGINT
        |               * (1::BIGINT << ((13 - i) * 4)))
        |      FROM generate_series(1, 13) g(i)) % 256)::INT AS b
        |  FROM (SELECT doc_id, lang, sha256(f) AS h FROM feats)
        |), dt AS (
        |  SELECT b, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY 1
        |), dr AS (
        |  SELECT b, count(*) AS cr FROM fb GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT count(*) FROM fb WHERE lang = 'en') AS nt,
        |         (SELECT count(*) FROM fb) AS nr
        |), ratio AS (
        |  SELECT dr.b,
        |    ln((coalesce(dt.ct, 0) + 1.0) / (tot.nt + 256.0)) -
        |    ln((dr.cr + 1.0) / (tot.nr + 256.0)) AS lr
        |  FROM dr LEFT JOIN dt USING (b) CROSS JOIN tot
        |), k AS (
        |  SELECT doc_id, b, count(*) AS k FROM fb GROUP BY 1, 2
        |)
        |SELECT k.doc_id, sum(k.k)::BIGINT AS n_feats,
        |  round(sum(k.k * r.lr), 4) AS log_w
        |FROM k JOIN ratio r USING (b)
        |WHERE k.doc_id % 10 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c18_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        |), g AS (
        |  SELECT doc_id, t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
        |), bc AS (
        |  SELECT w1, w2, count(*) AS cbg FROM g GROUP BY 1, 2
        |), cc AS (
        |  SELECT w1, count(*) AS cw1 FROM g GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT w) AS nv FROM (
        |    SELECT w1 AS w FROM g UNION ALL SELECT w2 FROM g)
        |), scored AS (
        |  SELECT g.doc_id,
        |    round(sum(ln((bc.cbg + 1)::DOUBLE / (cc.cw1 + v.nv))) / count(*),
        |          4) AS score
        |  FROM g JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
        |  GROUP BY g.doc_id
        |), sl AS (
        |  SELECT s.doc_id, s.score, d.lang
        |  FROM scored s JOIN documents d USING (doc_id)
        |), th AS (
        |  SELECT lang, quantile_cont(score, 0.25) AS t1,
        |         quantile_cont(score, 0.75) AS t2
        |  FROM sl GROUP BY 1
        |), lab AS (
        |  SELECT sl.lang, sl.score,
        |    CASE WHEN sl.score >= th.t2 THEN 'head'
        |         WHEN sl.score >= th.t1 THEN 'middle'
        |         ELSE 'tail' END AS score_bucket
        |  FROM sl JOIN th USING (lang)
        |)
        |SELECT lang, score_bucket, count(*) AS n,
        |  round(avg(score), 4) AS avg_score
        |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The full composition replayed stage-for-stage in SQL from the
    // proven per-stage mirrors: t34's block-classifier verdicts (the
    // fixed pipe1 page shape makes them closed-form), t1's langid
    // argmax, t2's quality algebra, d14's segment dedup, d10's
    // exact-jaccard near-dup truth, c14's contamination rule, c12's
    // HUGEINT mix thresholds and c7's packing window.
    "pipe1_golden" -> {
      val m = graft.ops.TextAnalysis.markers
      s"""WITH nb AS (
         |  SELECT doc_id + 1 AS doc_id, text AS prev_text FROM documents
         |), inc AS (
         |  SELECT d.doc_id, d.source, coalesce(
         |    CASE WHEN d.doc_id % 10 = 1 AND nb.prev_text IS NOT NULL THEN
         |      array_to_string(list_slice(string_split(nb.prev_text, ' '), 1,
         |        ceil(len(string_split(nb.prev_text, ' ')) * 0.95)::INT), ' ')
         |    ELSE d.text END, '') AS content
         |  FROM documents d LEFT JOIN nb USING (doc_id)
         |  WHERE d.doc_id % 2 = 1
         |), ext AS (
         |  -- block-extractor mirror for the fixed pipe1 page shape:
         |  -- blocks are [Corpus(1w), Shared header(2w), content(nw),
         |  -- A | B(link density 2/3)]. NumWordsRules verdicts: Corpus
         |  -- always drops (1<=16, next 2<=15, prev 0<=4); the header
         |  -- keeps iff next block (content) has > 15 words; content
         |  -- keeps iff its own count > 16 (its neighbors fail 15/4);
         |  -- the link bar always drops (density > 1/3).
         |  SELECT doc_id, source,
         |    CASE WHEN nw >= 17 THEN 'Shared header' || chr(10) || flat
         |         WHEN nw = 16 THEN 'Shared header'
         |         ELSE '' END AS txt
         |  FROM (SELECT doc_id, source, flat,
         |          len(regexp_extract_all(flat, '\\S+')) AS nw
         |        FROM (SELECT doc_id, source,
         |                trim(regexp_replace(content, ' +', ' ', 'g')) AS flat
         |              FROM inc))
         |), lid AS (
         |  SELECT doc_id, source, txt,
         |    CASE WHEN best = 0 THEN 'unknown'
         |         WHEN en = best THEN 'en' WHEN es = best THEN 'es'
         |         WHEN de = best THEN 'de' ELSE 'fr' END AS lang_pred
         |  FROM (SELECT *, greatest(en, es, de, fr) AS best FROM (
         |    SELECT doc_id, source, txt,
         |      ${pipe1Hits("txt", m("en"))} AS en,
         |      ${pipe1Hits("txt", m("es"))} AS es,
         |      ${pipe1Hits("txt", m("de"))} AS de,
         |      ${pipe1Hits("txt", m("fr"))} AS fr
         |    FROM ext))
         |), q AS (
         |  SELECT doc_id, source, txt FROM (
         |    SELECT *, round(1.0 - punct - digit + least(stopr, 0.2), 4) AS score
         |    FROM (
         |      SELECT *,
         |        CASE WHEN length(txt) > 0 THEN (length(txt) - length(regexp_replace(txt, '[.,!?;:]', '', 'g')))::DOUBLE / length(txt) ELSE 0.0 END AS punct,
         |        CASE WHEN length(txt) > 0 THEN (length(txt) - length(regexp_replace(txt, '[0-9]', '', 'g')))::DOUBLE / length(txt) ELSE 0.0 END AS digit,
         |        CASE WHEN tok_n > 0 THEN (${pipe1Hits("txt", m("en"))})::DOUBLE / tok_n ELSE 0.0 END AS stopr
         |      FROM (
         |        SELECT *, CASE WHEN txt IS NULL OR trim(txt) = '' THEN 0
         |          ELSE len(regexp_extract_all(trim(txt), '\\S+')) END AS tok_n
         |        FROM lid WHERE lang_pred <> 'unknown')))
         |  WHERE score >= 0.8
         |), seg AS (
         |  SELECT doc_id, unnest(string_split(txt, chr(10))) AS seg,
         |    generate_subscripts(string_split(txt, chr(10)), 1) AS pos
         |  FROM q WHERE length(txt) > 0
         |), segcnt AS (
         |  SELECT seg, count(*) AS n FROM seg WHERE length(seg) >= 1 GROUP BY seg
         |), segkeep AS (
         |  SELECT s.doc_id, s.pos, s.seg,
         |    (length(s.seg) < 1 OR coalesce(c.n, 0) <= 1) AS kept
         |  FROM seg s LEFT JOIN segcnt c ON s.seg = c.seg
         |), clean0 AS (
         |  SELECT doc_id, coalesce(string_agg(CASE WHEN kept THEN seg END,
         |    chr(10) ORDER BY pos), '') AS text_clean
         |  FROM segkeep GROUP BY doc_id
         |), cleaned AS (
         |  SELECT q.doc_id, q.source, coalesce(c.text_clean, '') AS text_clean
         |  FROM q LEFT JOIN clean0 c USING (doc_id)
         |), shi AS (
         |  SELECT doc_id, ${pipe1Shingles("toks")} AS sh
         |  FROM (SELECT doc_id, regexp_extract_all(trim(text_clean), '\\S+') AS toks FROM cleaned)
         |), shs AS (
         |  SELECT ${pipe1Shingles("toks")} AS sh
         |  FROM (SELECT regexp_extract_all(trim(text), '\\S+') AS toks
         |        FROM documents WHERE doc_id % 2 = 0)
         |), matched AS (
         |  SELECT DISTINCT a.doc_id FROM shi a JOIN shs b
         |    ON len(a.sh) >= 0.8 * len(b.sh) AND len(b.sh) >= 0.8 * len(a.sh)
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
         |), ndk AS (
         |  SELECT c.* FROM cleaned c
         |  WHERE NOT EXISTS (SELECT 1 FROM matched mm WHERE mm.doc_id = c.doc_id)
         |), dsh AS (
         |  SELECT doc_id, unnest(sh) AS h FROM (
         |    SELECT doc_id, ${pipe1Shingles("toks")} AS sh
         |    FROM (SELECT doc_id, regexp_extract_all(trim(text_clean), '\\S+') AS toks FROM ndk))
         |), psh AS (
         |  SELECT DISTINCT unnest(sh) AS h FROM (
         |    SELECT ${pipe1Shingles("toks")} AS sh
         |    FROM (SELECT regexp_extract_all(trim(text), '\\S+') AS toks
         |          FROM documents WHERE doc_id % 30 = 9))
         |), contam AS (
         |  SELECT dsh.doc_id, count(*) AS n_sh,
         |    sum(CASE WHEN psh.h IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
         |  FROM dsh LEFT JOIN psh ON dsh.h = psh.h GROUP BY 1
         |), deck AS (
         |  SELECT n.* FROM ndk n LEFT JOIN contam c USING (doc_id)
         |  WHERE coalesce(round(c.n_hits::DOUBLE / c.n_sh, 6), 0.0) <= 0.2
         |), cnt AS (
         |  SELECT source AS g, count(*)::HUGEINT AS n FROM deck
         |  WHERE source IN ('src0', 'src1', 'src2', 'src3') GROUP BY 1
         |), tgt(g, p) AS (
         |  SELECT * FROM (VALUES ('src0', 40::HUGEINT), ('src1', 30::HUGEINT),
         |    ('src2', 20::HUGEINT), ('src3', 10::HUGEINT))
         |), j AS (SELECT cnt.g, n, p FROM cnt JOIN tgt USING (g)
         |), th AS (
         |  SELECT a.g, least(min((b.n * a.p * 10000) // (b.p * a.n)),
         |    10000::HUGEINT) AS th
         |  FROM j a, j b GROUP BY a.g
         |), bkt AS (
         |  SELECT dk.doc_id, dk.source, dk.text_clean,
         |    ((SELECT sum((strpos('0123456789abcdef', substr(dk.h, i, 1)) - 1)::HUGEINT
         |               * (1::HUGEINT << ((16 - i) * 4)))
         |      FROM generate_series(1, 16) g(i)) % 10000)::INT AS bucket
         |  FROM (SELECT deck.*, sha256(doc_id::VARCHAR) AS h FROM deck) dk
         |), mixk AS (
         |  SELECT bkt.doc_id, bkt.source, bkt.text_clean
         |  FROM bkt JOIN th ON bkt.source = th.g WHERE bucket < th
         |)
         |SELECT doc_id, source, n_tok,
         |  ((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - n_tok) // 512)::BIGINT AS pack_id,
         |  sha256(text_clean) AS content_sha
         |FROM (
         |  SELECT doc_id, source, text_clean,
         |    (CASE WHEN text_clean IS NULL OR trim(text_clean) = '' THEN 0
         |          ELSE len(regexp_extract_all(trim(text_clean), '\\S+'))
         |     END)::BIGINT AS n_tok
         |  FROM mixk)
         |ORDER BY doc_id""".stripMargin
    },
    // Independent PSL re-implementation: explode every dotted suffix of
    // every host, match the raw rule rows (exact / wildcard / exception)
    // and apply the published prevailing-rule order — exception first,
    // else longest match, else the implicit `*` (pslen 1); registrable
    // domain = public suffix + one label, passthrough when the host has
    // no extra label.
    "c16_psl_domain" ->
      s"""WITH hosts AS (
         |  SELECT host_id, host FROM read_parquet('$c16Dir/hosts/*.parquet')
         |), lab AS (
         |  SELECT host_id, string_split(trim(host, '.'), '.') AS ls,
         |         len(string_split(trim(host, '.'), '.')) AS n
         |  FROM hosts WHERE host IS NOT NULL AND trim(host, '.') <> ''
         |), sfx AS (
         |  SELECT host_id, n, ls, unnest(generate_series(1, n)) AS i FROM lab
         |), sfx2 AS (
         |  SELECT host_id, n, i,
         |    array_to_string(list_slice(ls, i, n), '.') AS s,
         |    array_to_string(list_slice(ls, i + 1, n), '.') AS tail,
         |    n - i + 1 AS klen
         |  FROM sfx
         |), matches AS (
         |  SELECT f.host_id,
         |    CASE WHEN r.kind = 'exc' THEN f.klen - 1 END AS exc_len,
         |    CASE WHEN r.kind = 'exact' THEN f.klen END AS match_len
         |  FROM sfx2 f JOIN read_parquet('$c16Dir/rules/*.parquet') r
         |    ON r.base = f.s AND r.kind IN ('exact', 'exc')
         |  UNION ALL
         |  SELECT f.host_id, NULL, f.klen
         |  FROM sfx2 f JOIN read_parquet('$c16Dir/rules/*.parquet') r
         |    ON r.base = f.tail AND r.kind = 'wild' AND f.klen >= 2
         |), agg AS (
         |  SELECT host_id, max(exc_len) AS exc_len, max(match_len) AS match_len
         |  FROM matches GROUP BY 1
         |)
         |SELECT h.host_id, h.host,
         |  CASE
         |    WHEN l.n IS NULL THEN h.host
         |    WHEN l.n <= least(coalesce(a.exc_len, a.match_len, 1), l.n) THEN h.host
         |    ELSE array_to_string(list_slice(l.ls,
         |      l.n - least(coalesce(a.exc_len, a.match_len, 1), l.n), l.n), '.')
         |  END AS domain
         |FROM hosts h
         |LEFT JOIN lab l USING (host_id)
         |LEFT JOIN agg a USING (host_id)
         |ORDER BY host_id""".stripMargin,
    // Same exact-integer threshold rule (min over groups of the floored
    // cross ratio, HUGEINT floor division — no float on either side),
    // same sha256-bucket membership (the c1 HUGEINT kernel, mod 10000).
    "c12_mix_reweight" ->
      """WITH cnt AS (
        |  SELECT source AS g, count(*)::HUGEINT AS n FROM documents
        |  WHERE source IN ('src0','src1','src2','src3') GROUP BY 1),
        |tgt(g, p) AS (
        |  SELECT * FROM (VALUES ('src0', 40::HUGEINT), ('src1', 30::HUGEINT),
        |    ('src2', 20::HUGEINT), ('src3', 10::HUGEINT))),
        |j AS (SELECT cnt.g, n, p FROM cnt JOIN tgt USING (g)),
        |th AS (
        |  SELECT a.g, least(min((b.n * a.p * 10000) // (b.p * a.n)),
        |    10000::HUGEINT) AS th
        |  FROM j a, j b GROUP BY a.g),
        |bkt AS (
        |  SELECT doc_id, source,
        |    ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::HUGEINT
        |               * (1::HUGEINT << ((16 - i) * 4)))
        |      FROM generate_series(1, 16) g(i)) % 10000)::INT AS bucket
        |  FROM (SELECT doc_id, source, sha256(doc_id::VARCHAR) AS h
        |        FROM documents))
        |SELECT source, count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_ids
        |FROM bkt JOIN th ON bkt.source = th.g
        |WHERE bucket < th
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same (sha256(id), id) order, same inclusive running-sum rule —
    // as one window, which is fine at oracle scale.
    "c11_token_budget" ->
      """SELECT doc_id, n_tok FROM (
        |  SELECT doc_id, n_tok,
        |    sum(n_tok) OVER (ORDER BY sha256(doc_id::VARCHAR), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM (
        |    SELECT doc_id,
        |      (CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |            ELSE len(regexp_extract_all(trim(text), '\S+'))
        |       END)::BIGINT AS n_tok
        |    FROM documents))
        |WHERE cum <= 5000 ORDER BY doc_id""".stripMargin,
    // The canonicalization cascade rebuilt step-for-step in SQL CTEs;
    // the suffix list literal is generated from the SAME Scala Seq the
    // engine uses, so the two sides cannot drift.
    "c15_blocklist" -> {
      val blockedVals = c15Blocked.map(b => s"('$b')").mkString(", ")
      s"""WITH blocked(domain) AS (VALUES $blockedVals),
         |h AS (
         |  SELECT doc_id, lower(regexp_replace(regexp_replace(
         |    regexp_extract(trim($c10UrlSql),
         |      '\\A([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?\\z', 2),
         |    '\\A.*@', ''), ':[0-9]*\\z', '')) AS host
         |  FROM documents)
         |SELECT host, count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_ids
         |FROM h
         |WHERE NOT EXISTS (SELECT 1 FROM blocked b
         |  WHERE h.host = b.domain OR h.host LIKE '%.' || b.domain)
         |GROUP BY host ORDER BY host""".stripMargin
    },

    "c27_surt" -> {
      val pat = "'\\A([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?\\z'"
      s"""WITH u0 AS (
         |  SELECT doc_id, trim($c10UrlSql) AS u
         |  FROM documents WHERE doc_id % 5 = 0
         |), p AS (
         |  SELECT doc_id, u,
         |    lower(regexp_extract(u, $pat, 1)) AS scheme,
         |    regexp_extract(u, $pat, 2) AS auth,
         |    regexp_extract(u, $pat, 3) AS path0,
         |    regexp_extract(u, $pat, 4) AS query0
         |  FROM u0
         |), hp AS (
         |  SELECT *,
         |    lower(regexp_replace(regexp_replace(auth, '\\A.*@', ''),
         |      ':[0-9]*\\z', '')) AS host,
         |    regexp_extract(regexp_replace(auth, '\\A.*@', ''),
         |      ':([0-9]+)\\z', 1) AS port
         |  FROM p
         |), q AS (
         |  SELECT *, array_to_string(list_sort(list_filter(
         |    string_split(regexp_replace(query0, '\\A\\?', ''), '&'),
         |    x -> x <> '')), '&') AS sq
         |  FROM hp
         |)
         |SELECT doc_id,
         |  array_to_string(list_reverse(string_split(
         |    regexp_replace(host, '\\Awww[0-9]*\\.', ''), '.')), ',') ||
         |  CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
         |         OR (scheme = 'https' AND port = '443'))
         |       THEN ':' || port ELSE '' END ||
         |  ')' ||
         |  CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
         |  CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS surt
         |FROM q ORDER BY doc_id""".stripMargin
    },
    "c10_url_canon" -> {
      val suffixes = graft.ops.UrlOps.defaultMultiPartSuffixes
        .map(s => s"'$s'").mkString("[", ", ", "]")
      val pat = "'\\A([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?\\z'"
      s"""WITH u0 AS (
         |  SELECT doc_id, trim($c10UrlSql) AS u
         |  FROM documents WHERE doc_id % 5 = 0
         |), p AS (
         |  SELECT doc_id, u,
         |    lower(regexp_extract(u, $pat, 1)) AS scheme,
         |    regexp_extract(u, $pat, 2) AS auth,
         |    regexp_extract(u, $pat, 3) AS path0,
         |    regexp_extract(u, $pat, 4) AS query0
         |  FROM u0
         |), h AS (
         |  SELECT *, regexp_replace(auth, '\\A.*@', '') AS hostport FROM p
         |), hp AS (
         |  SELECT *,
         |    lower(regexp_replace(hostport, ':[0-9]*\\z', '')) AS host,
         |    regexp_extract(hostport, ':([0-9]+)\\z', 1) AS port
         |  FROM h
         |), q AS (
         |  SELECT *, array_to_string(list_sort(list_filter(
         |    string_split(regexp_replace(query0, '\\A\\?', ''), '&'),
         |    x -> x <> '')), '&') AS sq
         |  FROM hp
         |), dom AS (
         |  SELECT *, string_split(host, '.') AS labels FROM q
         |)
         |SELECT doc_id,
         |  scheme || '://' || host ||
         |  CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
         |         OR (scheme = 'https' AND port = '443'))
         |       THEN ':' || port ELSE '' END ||
         |  CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
         |  CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS canon,
         |  CASE WHEN len(labels) < 2 THEN host
         |       WHEN len(labels) >= 3 AND list_contains($suffixes,
         |              labels[-2] || '.' || labels[-1])
         |       THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
         |       ELSE labels[-2] || '.' || labels[-1] END AS domain
         |FROM dom ORDER BY doc_id""".stripMargin
    },
    // Bucket math mirrors LabelHashBucket: unsigned first-8-bytes of
    // sha256(id) mod 100, reconstructed from the hex digest in HUGEINT
    // arithmetic (the p5_label_bucket oracle pattern).
    "c1_split_assign" ->
      """SELECT split, count(*) AS n, min(doc_id) AS min_id,
        | sum(doc_id)::BIGINT AS sum_ids
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN bucket < 80 THEN 'train'
        |         WHEN bucket < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (
        |    SELECT doc_id,
        |      ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::HUGEINT
        |                 * (1::HUGEINT << ((16 - i) * 4)))
        |        FROM generate_series(1, 16) g(i)) % 100)::INT AS bucket
        |    FROM (SELECT doc_id, sha256(doc_id::VARCHAR) AS h FROM documents)))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c2_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, sum(doc_id)::BIGINT AS sum_ids
        |FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY sha256(doc_id::VARCHAR), doc_id) AS r
        |  FROM documents)
        |WHERE r <= 5 GROUP BY 1 ORDER BY 1""".stripMargin,
    // IS NOT DISTINCT FROM mirrors the engine's null-safe group join: a
    // NULL lang forms its own stratum and survives (plain `=` would
    // silently drop every NULL-lang row only on the oracle side).
    "c5_quality_quantile" ->
      """WITH th AS (
        |  SELECT lang, quantile_cont(n_chars, 0.5) AS q
        |  FROM documents GROUP BY lang
        |)
        |SELECT d.lang, count(*) AS n_kept, min(d.n_chars) AS min_kept_chars,
        |  sum(d.n_chars)::BIGINT AS sum_kept_chars
        |FROM documents d JOIN th ON d.lang IS NOT DISTINCT FROM th.lang
        |WHERE d.n_chars >= th.q
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    // u rebuilt from the first 13 sha-256 hex chars as a 52-bit dyadic
    // rational (the c1 HUGEINT trick, BIGINT-sized here); rank by
    // ln(u)/weight DESC per language — hash-spread keys make cross-
    // engine ln() ulp reorders impossible in practice.
    "c9_weighted_sample" ->
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY esk DESC, doc_id) AS r
        |  FROM (
        |    SELECT lang, doc_id, n_chars,
        |      ln((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::BIGINT
        |                     * (1::BIGINT << ((13 - i) * 4)))
        |          FROM generate_series(1, 13) g(i))::DOUBLE / 4503599627370496)
        |        / n_chars AS esk
        |    FROM (SELECT lang, doc_id, n_chars, sha256(doc_id::VARCHAR) AS h
        |          FROM documents
        |          WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0)))
        |WHERE r <= 4 ORDER BY lang, doc_id""".stripMargin,
    "c8_winsorize" ->
      """WITH th AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_type, count(*) AS n,
        |  round(sum(least(greatest(e.value, th.lo), th.hi)), 2) AS sum_w,
        |  round(min(least(greatest(e.value, th.lo), th.hi)), 4) AS min_w,
        |  round(max(least(greatest(e.value, th.lo), th.hi)), 4) AS max_w
        |FROM events e JOIN th ON e.event_type IS NOT DISTINCT FROM th.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c7_pack_sequences" ->
      """SELECT source, pack_id, count(*) AS n_docs,
        | sum(n_chars)::BIGINT AS pack_chars, min(doc_id) AS first_id
        |FROM (
        |  SELECT source, doc_id, n_chars,
        |    ((sum(coalesce(n_chars, 0)) OVER (PARTITION BY source
        |        ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - coalesce(n_chars, 0)) // 2000)::BIGINT AS pack_id
        |  FROM documents WHERE doc_id IS NOT NULL)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "c6_source_cap" ->
      """SELECT source, count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_ids,
        | min(n_chars) AS min_chars
        |FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS r
        |  FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL)
        |WHERE r <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,
    // The c4 shingle CTE verbatim, left-joined so every document keeps
    // its (n_shingles, n_hits) pair; the string-equality join is the
    // oracle twin of the engine's hash-equality join (as in c4).
    "c14_contamination_score" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(
        |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |        ELSE list_transform(range(1, len(toks)-1),
        |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)) AS h
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents)
        |), probe AS (
        |  SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0
        |)
        |SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
        |  sum(CASE WHEN probe.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
        |  round(sum(CASE WHEN probe.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |          / count(*), 6) AS contamination
        |FROM sh LEFT JOIN probe ON sh.h = probe.h
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    "c4_decontamination" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(
        |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |        ELSE list_transform(range(1, len(toks)-1),
        |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)) AS h
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents)
        |), probe AS (
        |  SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0
        |)
        |SELECT count(DISTINCT doc_id) AS n_contaminated,
        | count(*)::BIGINT AS total_hits,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM sh JOIN probe USING (h)""".stripMargin,
    // Candidate extraction with the SAME `\b`-guarded pattern (ASCII
    // word boundary in RE2 as in Java), then the Luhn arithmetic
    // replayed in SQL over each candidate's digit-stripped form. The
    // redacted string itself is not rebuilt — chars_delta is derived as
    // Σ(len(valid candidate) − len('[CARD]')), which equals the splice
    // delta because regex matches are non-overlapping.
    "c13_card_redaction" -> {
      // The engine's candidate pattern verbatim (s-interpolation
      // processes \-escapes even in triple quotes, so the pattern is
      // interpolated from the shared constant, never inlined).
      val cand = graft.functions.CardNumberUtil.candidateRegex
      val lo = graft.functions.CardNumberUtil.minDigits
      val hi = graft.functions.CardNumberUtil.maxDigits
      s"""WITH dirty AS (
         |  SELECT doc_id, $cardDirtiedSql AS dirty FROM documents),
         |cand AS (
         |  SELECT doc_id,
         |    list_filter(regexp_extract_all(dirty, '$cand'),
         |      c -> len(regexp_replace(c, '[^0-9]', '', 'g'))
         |             BETWEEN $lo AND $hi) AS cs
         |  FROM dirty),
         |v AS (
         |  SELECT doc_id, len(cs) AS n_candidates,
         |    list_filter(cs, c ->
         |      (list_sum(list_transform(
         |        range(1, len(regexp_replace(c, '[^0-9]', '', 'g')) + 1), i ->
         |        CASE WHEN (len(regexp_replace(c, '[^0-9]', '', 'g')) - i) % 2 = 1 THEN
         |          CASE WHEN 2 * substr(regexp_replace(c, '[^0-9]', '', 'g'), i::INT, 1)::INT > 9
         |               THEN 2 * substr(regexp_replace(c, '[^0-9]', '', 'g'), i::INT, 1)::INT - 9
         |               ELSE 2 * substr(regexp_replace(c, '[^0-9]', '', 'g'), i::INT, 1)::INT END
         |        ELSE substr(regexp_replace(c, '[^0-9]', '', 'g'), i::INT, 1)::INT END)) % 10 = 0)) AS vc
         |  FROM cand)
         |SELECT doc_id % 6 AS k, count(*)::BIGINT AS n_docs,
         |  sum(n_candidates)::BIGINT AS total_candidates,
         |  sum(len(vc))::BIGINT AS total_cards,
         |  sum(coalesce(list_sum(list_transform(vc, c -> length(c) - 6)), 0))::BIGINT AS chars_delta,
         |  sum(CASE WHEN len(vc) > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_redacted
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // The split bucket re-derived from sha256(source) with HUGEINT
    // arithmetic (unsigned first-8-bytes mod 100), cut at 80/10/10.
    "c31_group_split" ->
      """SELECT source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs, count(DISTINCT doc_id) AS n_distinct
        |FROM (
        |  SELECT doc_id, source,
        |    ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::HUGEINT
        |               * (1::HUGEINT << ((16 - i) * 4)))
        |      FROM generate_series(1, 16) g(i)) % 100)::INT AS b
        |  FROM (SELECT doc_id, source, sha256(source) AS h FROM documents)
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Sentence split re-derived from the t42 cascade (shared step
    // table via TextQueries.duckSentenceMark), shingles via the c4
    // string-shingle rule, hit ordinals re-aggregated from scratch.
    "c30_sentence_decon" -> {
      val sentMark = TextQueries.duckSentenceMark("t")
      s"""WITH src AS (
         |  SELECT doc_id, $c30TextSql AS t
         |  FROM documents WHERE doc_id % 3 = 0
         |), psh AS (
         |  SELECT DISTINCT unnest(${pipe1Shingles(
               s"regexp_extract_all(trim('$c30Probe'), '\\S+')")}) AS sh
         |), arr AS (
         |  SELECT doc_id, list_filter(list_transform(
         |    string_split($sentMark, chr(1)), x -> trim(x)),
         |    x -> x <> '') AS l
         |  FROM src
         |), sentidx AS (
         |  SELECT doc_id, unnest(range(1, len(l) + 1)) AS i, l FROM arr
         |), sent AS (
         |  SELECT doc_id, (i - 1)::INT AS si,
         |    regexp_extract_all(trim(l[i]), '\\S+') AS toks
         |  FROM sentidx
         |), ssh AS (
         |  SELECT DISTINCT doc_id, si, unnest(${pipe1Shingles("toks")}) AS sh
         |  FROM sent
         |), hits AS (
         |  SELECT DISTINCT doc_id, si FROM ssh JOIN psh USING (sh)
         |), agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_sentences FROM sent GROUP BY 1
         |), hagg AS (
         |  SELECT doc_id, count(*)::BIGINT AS nc, list_sort(list(si)) AS cidx
         |  FROM hits GROUP BY 1
         |)
         |SELECT a.doc_id, n_sentences,
         |  coalesce(nc, 0)::BIGINT AS n_contaminated,
         |  coalesce(array_to_string(cidx, ','), '') AS contaminated_idx
         |FROM agg a LEFT JOIN hagg USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "c28_pii_matches" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{3,4}"
      s"""WITH d AS (
         |  SELECT doc_id, $dirtiedSql AS dirty FROM documents
         |), m AS (
         |  SELECT doc_id,
         |    regexp_replace(dirty, '$email', '[EMAIL]', 'g') AS no_email,
         |    regexp_extract_all(dirty, '$email') AS em
         |  FROM d
         |), m2 AS (
         |  SELECT doc_id, em,
         |    regexp_extract_all(no_email, '$phone') AS ph,
         |    regexp_replace(no_email, '$phone', '[PHONE]', 'g') AS no_phone
         |  FROM m
         |), m3 AS (
         |  SELECT doc_id, em, ph,
         |    regexp_extract_all(no_phone, '$ipv4') AS ip
         |  FROM m2
         |), k AS (
         |  SELECT doc_id, 'email' AS kind, em AS ms FROM m3
         |  UNION ALL SELECT doc_id, 'phone', ph FROM m3
         |  UNION ALL SELECT doc_id, 'ipv4', ip FROM m3
         |), idx AS (
         |  SELECT doc_id, kind, unnest(range(1, len(ms) + 1)) AS i, ms FROM k
         |)
         |SELECT doc_id, kind, ms[i] AS "match", (i - 1)::INT AS match_idx
         |FROM idx ORDER BY doc_id, kind, match_idx""".stripMargin
    },
    "c3_pii_redaction" -> {
      val email ="[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{3,4}"
      // Counts chain exactly like piiCounts/redactPii: phones counted on
      // email-redacted text, IPs on phone-redacted text.
      s"""SELECT
         | sum(len(regexp_extract_all(dirty, '$email')))::BIGINT AS total_emails,
         | sum(len(regexp_extract_all(no_email, '$phone')))::BIGINT AS total_phones,
         | sum(len(regexp_extract_all(no_phone, '$ipv4')))::BIGINT AS total_ipv4,
         | sum(length(dirty) - length(clean))::BIGINT AS chars_delta,
         | sum(CASE WHEN contains(clean, '[EMAIL]') THEN 1 ELSE 0 END)::BIGINT
         |   AS n_docs_email_redacted
         |FROM (
         |  SELECT dirty, no_email, no_phone,
         |    regexp_replace(no_phone, '$ipv4', '[IP]', 'g') AS clean
         |  FROM (
         |    SELECT dirty, no_email,
         |      regexp_replace(no_email, '$phone', '[PHONE]', 'g') AS no_phone
         |    FROM (
         |      SELECT dirty, regexp_replace(dirty, '$email', '[EMAIL]', 'g') AS no_email
         |      FROM (SELECT $dirtiedSql AS dirty FROM documents))))""".stripMargin
    })
}
