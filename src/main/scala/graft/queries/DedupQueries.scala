package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => F}

/** Deduplication operator family for large-scale training-data pipelines:
  * exact (hash-groupBy), normalized-fingerprint, MinHash+LSH near-dup
  * (shingle → minhash → band → bucket-join → exact-jaccard verify),
  * SimHash, and embedding-cosine near-dup.
  *
  * The testdata documents are all distinct, so each query constructs a
  * corpus with KNOWN duplicates (exact copies, case/whitespace variants,
  * token-truncated near-dups, copied vectors) deterministically from
  * doc_id — the oracle rebuilds the identical corpus in SQL.
  *
  * Scale design: every variant is a groupBy/self-equi-join on a derived
  * key (text, fingerprint, LSH band key, vector copy id) — never a
  * cartesian product. The LSH band-join bounds candidate pairs to
  * same-bucket collisions; the exact-jaccard verify runs only on
  * candidates. At 100 TB: band keys salt/distribute naturally (64-bit
  * hash space), and the only skew risk is a degenerate corpus where one
  * band bucket collects millions of docs — mitigated by raising bands
  * (smaller rows-per-band) or pre-limiting bucket width.
  */
object DedupQueries {

  /** Snapshot a persisted+materialized ops result into an eager
    * localCheckpoint and release its cache entry: the dedup ops return
    * persisted frames for reuse, but a GATE query has no later hook to
    * unpersist them, and Verify/Bench/Explain construct all 60+ queries
    * in one session — without this every run strands a cache entry and
    * leans on LRU eviction. The checkpoint's backing RDD frees on GC.
    */
  private def snapshot(df: DataFrame): DataFrame = {
    val snap = df.localCheckpoint(true)
    df.unpersist()
    snap
  }

  /** Base ∪ exact copies (doc_id%10==0 → +100000) ∪ case+whitespace
    * variants (doc_id%10==5 → +200000, upper-cased, doubled spaces).
    */
  private def corpusExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 200000).as("doc_id"),
          upper(regexp_replace(col("text"), " ", "  ")).as("text")))
  }

  private val corpusExactSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id+100000, text FROM documents WHERE doc_id%10=0
      |  UNION ALL SELECT doc_id+200000, upper(regexp_replace(text,' ','  ','g'))
      |    FROM documents WHERE doc_id%10=5""".stripMargin

  /** Base ∪ token-truncated near-dups: doc_id%10==0 → +300000 keeping
    * the first ceil(0.95·n) tokens (3-gram jaccard ≈ 0.9 vs original).
    */
  private def corpusNear(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val toks = split(col("text"), " ")
    val keep = ceil(size(toks) * 0.95).cast("int")
    docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1), keep)).as("text")))
  }

  private val corpusNearSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id+300000,
      |         array_to_string(list_slice(string_split(text,' '), 1,
      |           ceil(len(string_split(text,' ')) * 0.95)::INT), ' ')
      |  FROM documents WHERE doc_id%10=0""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- d21: canonical-URL dedup — the page's OWN duplicate
    //    declaration (<link rel=canonical>) falls back to the fetch
    //    URL, both through canonicalizeUrl, exact dedup keeps the
    //    min-id copy per canonical key. Hand-derived literals. -------
    "d21_canonical_dedup" -> { (s, _) =>
      import s.implicits._
      def page(canonical: String): String =
        if (canonical.isEmpty) "<html><head></head><body>x"
        else s"""<html><head><link rel="canonical" href="$canonical"></head>"""
      val rows = Seq(
        (1L, "https://Example.org/page?b=2&a=1#frag", page("")),
        // a tracking-reshuffled copy declaring the same canonical
        (2L, "https://cdn.example.org/mirror/page",
          page("HTTPS://EXAMPLE.ORG:443/page?b=2&a=1")),
        (3L, "http://crawler.example/fetched",
          page("http://Other.net:80/x")),
        // userinfo + fragment noise, no declaration: the fetch URL is
        // the fallback
        (4L, "http://user@other.net/x#section", page("")),
        (5L, "https://unique.example/", page("")))
        .toDF("doc_id", "url", "html")
      val declared = graft.ops.TextAnalysis.canonicalHref(col("html"))
      val key = graft.ops.UrlOps.canonicalizeUrl(
        coalesce(when(declared =!= "", declared), col("url")))
      val keyed = rows.withColumn("canon", key)
      graft.ops.Dedup.exact(keyed, Seq("canon"), "doc_id")
        .select("doc_id", "canon")
        .orderBy("doc_id")
    },

    // -- exact dedup: hash-groupBy on content --------------------------
    "d1_dedup_exact" -> { (s, d) =>
      graft.ops.Dedup.exactStats(corpusExact(s, d), "text", "doc_id")
    },

    // -- d14: SEGMENT-level dedup (C4/CCNet paragraph rule). The flat
    //    corpus has no newlines, so the gate synthesizes 4-line docs:
    //    two unique body slices, a footer shared by ALL docs (dropped
    //    everywhere), and a promo header shared by every %10==0 doc
    //    (dropped everywhere), with minChars exempting the short/empty
    //    tail slices. Oracle replicates split → global count → ordered
    //    rebuild in SQL. ------------------------------------------------
    "d14_segment_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val ml = docs.select(col("doc_id"),
        concat_ws("\n",
          when(col("doc_id") % 10 === 0, lit("promo header repeated line"))
            .otherwise(substring(col("text"), 1, 40)),
          substring(col("text"), 41, 40),
          lit("shared footer boilerplate"),
          substring(col("text"), 81, 40)).as("text"))
      graft.ops.Dedup.dedupSegments(ml, "doc_id", "text", minChars = 5)
        .orderBy("doc_id")
    },

    // -- d15: C4 within-document line dedup. Injection classes by
    //    doc_id % 3: 0 = a line duplicated around a unique one (one
    //    copy must drop), 1 = two distinct appended lines (nothing
    //    drops), 2 = untouched. Per-class line counts in/out and the
    //    character delta pin both the filter rule and the rejoin. ----
    "d15_line_dedup" -> { (s, d) =>
      val dirty = concat(coalesce(col("text"), lit("")),
        when(col("doc_id") % 3 === 0,
          lit("\ndup line A\nunique B\ndup line A"))
          .when(col("doc_id") % 3 === 1, lit("\nunique C\nunique D"))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .withColumn("t", dirty)
        .withColumn("clean", graft.ops.TextAnalysis.dedupLines(col("t")))
        .withColumn("lines_in", size(split(col("t"), "\n")).cast("long"))
        .withColumn("lines_out", size(split(col("clean"), "\n")).cast("long"))
        .groupBy((col("doc_id") % 3).as("k"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum("lines_in").as("total_lines_in"),
          sum("lines_out").as("total_lines_out"),
          sum(length(col("t")) - length(col("clean"))).as("chars_delta"))
        .orderBy("k")
    },

    // -- d16: crawl-over-crawl snapshot diff. cur = documents minus
    //    %7==0 (removed), plus re-keyed clones of %11==0 (added), with
    //    %5==0 text mutated (changed); everything else unchanged. The
    //    oracle rebuilds the same cur and classifies by direct text
    //    comparison — digest equality on the engine side must agree. -
    "d16_snapshot_diff" -> { (s, d) =>
      val prev = Tables.documents(s, d).select("doc_id", "text")
      val cur = prev.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(prev.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      graft.ops.Dedup.snapshotDiff(prev, cur, "doc_id", Seq("text"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_ids"))
        .orderBy("status")
    },

    // -- the user-facing keeper API: exact() keeps the min-id row per
    //    content group (min_by aggregate — the plan spec lives in
    //    OpsSpec; this pins the VALUES under the driver hash) ----------
    "d1b_exact_keeper" -> { (s, d) =>
      graft.ops.Dedup.exact(corpusExact(s, d), Seq("text"), "doc_id")
        .agg(
          count(lit(1)).as("n_kept"),
          sum("doc_id").as("sum_kept_ids"),
          max("doc_id").as("max_kept_id"))
    },

    // -- d9: incremental dedup — a "new crawl" (verbatim clones of
    //    %10==0 plus case/whitespace variants of %10==5) anti-joined by
    //    content digest against the already-ingested base; only the
    //    genuinely-new variants survive. The production shape: the
    //    corpus never re-shuffles, only the new slice does. ----------
    "d9_incremental_dedup" -> { (s, d) =>
      val base = Tables.documents(s, d).select("doc_id", "text")
      val incoming = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(base.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 200000).as("doc_id"),
            upper(regexp_replace(col("text"), " ", "  ")).as("text")))
      graft.ops.Dedup.dedupAgainst(incoming, base, Seq("text"))
        .select("doc_id").orderBy("doc_id")
    },

    // -- d13: d9's semantics through the Bloom-prefiltered path — the
    //    shape that never shuffles the corpus (definitely-new rows skip
    //    the verify; maybe-dups broadcast to a semi+anti pair). Same
    //    oracle truth as d9 by construction: the Bloom filter has no
    //    false negatives and false positives fall through to the exact
    //    digest verify. --------------------------------------------
    "d13_bloom_dedup" -> { (s, d) =>
      val base = Tables.documents(s, d).select("doc_id", "text")
      val incoming = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(base.filter(col("doc_id") % 10 === 5)
          .select((col("doc_id") + 200000).as("doc_id"),
            upper(regexp_replace(col("text"), " ", "  ")).as("text")))
      // size from the corpus (a parquet count is metadata-cheap): a
      // fixed guess under-sizes at larger SFs, saturating the filter
      val bloom = graft.ops.Dedup.digestBloom(base, Seq("text"),
        expectedItems = base.count(), fpp = 0.01)
      graft.ops.Dedup.dedupAgainstBloom(incoming, base, Seq("text"), bloom)
        .select("doc_id").orderBy("doc_id")
    },

    // -- normalized-fingerprint dedup (case/whitespace-insensitive):
    //    64-bit rolling hash of lower+collapsed text -------------------
    "d2_fingerprint_dedup" -> { (s, d) =>
      corpusExact(s, d)
        .withColumn("fp", F.fingerprint(col("text")))
        .groupBy("fp").agg(count(lit(1)).as("n"))
        .agg(
          sum("n").as("n_rows"),
          count(lit(1)).as("n_distinct_fp"),
          sum(col("n") - 1).as("n_dupes_removed"),
          sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_groups"))
    },

    // -- MinHash + LSH near-dup: sig(64 hashes) → 32 bands × 2 rows →
    //    band-key equi-join → exact 3-gram-jaccard verify ≥ 0.8.
    //    With r=2,b=32: P(candidate | j=0.8) = 1-(1-0.64)^32 ≈ 1-5e-15,
    //    so the LSH pass provably recovers every pair the full-scan
    //    oracle finds (which is what makes this oracle-comparable).
    //    The banded frame is persisted: a self-join otherwise evaluates
    //    the minhash UDF once PER SIDE — the dominant cost. -----------
    "d3_minhash_lsh" -> { (s, d) =>
      snapshot(graft.ops.Dedup
        .nearDuplicates(corpusNear(s, d), "doc_id", "text",
          threshold = 0.8, numHashes = 64, bands = 32, shingle = 3))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // -- One-permutation MinHash (OPH + rotation densification): the
    //    k×-cheaper signature kernel must land on the SAME verified
    //    pair set as d3 — candidates may differ, the exact-jaccard
    //    verify makes the output kernel-independent, and the oracle is
    //    the same full-scan jaccard truth both d3 and d5 answer to. --
    "d20_minhash_oph" -> { (s, d) =>
      snapshot(graft.ops.Dedup
        .nearDuplicates(corpusNear(s, d), "doc_id", "text",
          threshold = 0.8, numHashes = 64, bands = 32, shingle = 3,
          oph = true))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // -- SimHash near-dup: 60-bit sha-256-based simhash, pairs within
    //    hamming ≤ 6 (band the 60 bits into 4×15-bit keys: hamming≤3
    //    guarantees one identical band; ≤6 is found when any band
    //    collides). The sha basis makes the WHOLE pipeline — token
    //    hash, weighted bit votes, banding, hamming — DuckDB-
    //    expressible, so this is hash-checked end to end (it was
    //    rows-only under the old FNV kernel). ------------------------
    "d4_simhash_neardup" -> { (s, d) =>
      graft.ops.Dedup.simhashPairs(corpusExact(s, d), "doc_id", "text",
        maxHamming = 6)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    },

    // -- d10: incremental NEAR-dedup — a new crawl of 95%-token-
    //    truncated variants (≈0.9 jaccard vs their seen originals →
    //    dropped) and token-REVERSED docs (3-gram jaccard ≈ 0 → kept)
    //    anti-joined against the seen corpus through the banded-
    //    MinHash × exact-verify pipeline. Oracle = full-scan jaccard
    //    truth between the two corpora. --------------------------------
    "d10_neardup_against" -> { (s, d) =>
      val base = Tables.documents(s, d).select("doc_id", "text")
      val toks = split(col("text"), " ")
      val keep = ceil(size(toks) * 0.95).cast("int")
      val incoming = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1), keep)).as("text"))
        .unionByName(base.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
      graft.ops.Dedup.nearDupAgainst(incoming, base, "doc_id", "text",
        threshold = 0.8, shingle = 3)
        .select("doc_id").orderBy("doc_id")
    },

    // -- EXACT n-gram-jaccard near-dup via inverted shingle index: no
    //    LSH approximation anywhere — recall 1 by construction, so the
    //    full-scan oracle matches identically. Same corpus/threshold as
    //    d3: the two mechanisms (LSH-banded vs inverted-index) must
    //    produce the SAME pair set, which this query pins. ------------
    "d5_ngram_jaccard" -> { (s, d) =>
      // maxDocFreq disabled for the GATE: the oracle is a full
      // (uncapped) scan, and a common 3-gram crossing the default cap
      // at a larger SF would silently diverge. The cap's behavior is
      // unit-tested separately; production callers keep the default.
      snapshot(graft.ops.Dedup
        .jaccardNearDuplicates(corpusNear(s, d), "doc_id", "text",
          threshold = 0.8, shingle = 3, maxDocFreq = Int.MaxValue))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // -- SimHash recall check on the KNOWABLE subset: every exact clone
    //    (doc_id%10==0 → +100000, verbatim copy) has an identical
    //    simhash, so its pair MUST surface at hamming 0. Kept alongside
    //    the full d4 hash check as a kernel-independent recall
    //    invariant (its oracle never computes a hash at all). ---------
    "d4b_simhash_clone_pairs" -> { (s, d) =>
      graft.ops.Dedup.simhashPairs(corpusExact(s, d), "doc_id", "text",
        maxHamming = 6)
        .filter(col("id_a") < 100000 && col("id_a") % 10 === 0 &&
          col("id_b") === col("id_a") + 100000)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a")
    },

    // -- embedding-cosine near-dup: copied vectors (vec_id%5==0) must
    //    pair with their originals at cosine ≈ 1; the max cosine among
    //    distinct random embeddings is ~0.51, so threshold 0.99 is
    //    unambiguous. Equi-join on a coarse quantized-norm key would be
    //    the 100 TB path; at gate scale an LSH-free block join on
    //    norm-bucket suffices (here: plain self-join pruned by id). ----
    // -- end-to-end curation: dropNearDuplicates keeps each near-dup
    //    group's smallest id (greedy single-pass; the user-facing
    //    dedup operator a pipeline actually calls) -------------------
    "d7_drop_neardups" -> { (s, d) =>
      val kept = graft.ops.Dedup.dropNearDuplicates(
        corpusNear(s, d), "doc_id", "text", threshold = 0.8)
      kept.agg(
        count(lit(1)).as("n_kept"),
        sum(when(col("doc_id") >= 300000, 1).otherwise(0)).as("n_kept_copies"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
    },

    // -- connected-components duplicate grouping: min-label propagation
    //    over the verified pair graph — every cluster labeled with its
    //    GLOBAL min id (transitive closure), unlike d7's greedy rule.
    //    Output pins full cluster membership per component. The tiny
    //    (id, comp) frame is localCheckpoint-backed (stable for the
    //    deferred aggregate; its RDD frees on GC). ---------------------
    "d8_dup_groups" -> { (s, d) =>
      val verified = graft.ops.Dedup.nearDuplicates(corpusNear(s, d),
        "doc_id", "text", threshold = 0.8, numHashes = 64, bands = 32,
        shingle = 3)
      val groups = graft.ops.Dedup.duplicateGroups(verified)
      verified.unpersist()
      groups.groupBy("comp")
        .agg(count(lit(1)).as("n_members"),
          concat_ws(",",
            transform(sort_array(collect_list(col("id"))),
              _.cast("string"))).as("members"))
        .orderBy("comp")
    },

    // -- d17: representative selection — the C4 "keep the best copy"
    //    terminus over d8's components: within each near-dup group keep
    //    the longest text (id tiebreak). The truncated +300000 clones
    //    lose to their originals except where truncation was a no-op
    //    (short docs: ceil(n*0.95) = n) and the higher-id clone wins
    //    the tie — both arms exercised by the fixture. --------------
    "d17_keep_representative" -> { (s, d) =>
      val corpus = corpusNear(s, d)
      val verified = graft.ops.Dedup.nearDuplicates(corpus,
        "doc_id", "text", threshold = 0.8, numHashes = 64, bands = 32,
        shingle = 3)
      val groups = graft.ops.Dedup.duplicateGroups(verified)
      verified.unpersist()
      val kept = graft.ops.Dedup.keepRepresentative(
        corpus.withColumn("s", length(col("text")).cast("long")),
        groups, "doc_id", "s")
      kept.agg(
        count(lit(1)).as("n_kept"),
        sum("doc_id").as("sum_kept_ids"),
        sum(when(col("doc_id") >= 300000, 1L).otherwise(0L))
          .as("n_clones_kept"))
    },

    // -- d18: span-level duplication signal (the n-gram-window
    //    approximation of exact-substring dedup). On the exact-copy
    //    corpus every span of a copied doc (and its original) repeats
    //    → dup_fraction 1; the upper-cased variants re-case every
    //    token, so their spans duplicate only among THEMSELVES via the
    //    natural cross-doc boilerplate the synthetic corpus carries —
    //    the oracle recomputes whatever that distribution is. --------
    "d18_dup_spans" -> { (s, d) =>
      graft.ops.Dedup.duplicatedSpanStats(corpusExact(s, d),
        "doc_id", "text", window = 5)
    },

    // -- d19: EXACT-substring dedup (Lee et al. 2022 ExactSubstr) —
    //    real span REMOVAL at minLen=50 over a fixture with planted
    //    overlaps: a 60-token shared block, an exactly-50 block (in),
    //    a 49-token block (out), self-repetition, adjacent blocks that
    //    must merge to ONE span, a whole-doc duplicate pair (text
    //    cleaned to empty), a short doc and an empty doc (untouched).
    //    The oracle replays window-count → coverage → gaps-and-islands
    //    → rebuild in SQL over the same parquet, grouping by the
    //    window STRING itself (even stronger than the engine's sha-2
    //    digests). ----------------------------------------------------
    "d19_exact_substring" -> { (s, _) =>
      writeD19Fixture(s)
      graft.ops.Dedup.exactSubstrDedup(
          s.read.parquet(d19Dir), "doc_id", "text", minLen = 50)
        .orderBy("doc_id")
    },

    // -- d11: incremental embedding dedup — copied vectors (+100000,
    //    cos 1 vs their originals → dropped) and rotated vectors
    //    (+200000, decorrelated direction → kept) against the seen
    //    embedding corpus. ------------------------------------------
    "d11_embedding_against" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val rot = concat(
        slice(col("embedding"), lit(8), size(col("embedding")) - 7),
        slice(col("embedding"), lit(1), lit(7)))
      val incoming = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") % 5 === 2)
          .select((col("vec_id") + 200000).as("vec_id"), rot.as("embedding")))
      graft.ops.Dedup.embeddingNearDupAgainst(incoming, emb,
        "vec_id", "embedding", threshold = 0.99)
        .select("vec_id").orderBy("vec_id")
    },

    "d6_embedding_neardup" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val corpus = emb.unionByName(
        emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      snapshot(graft.ops.Dedup
        .embeddingNearDuplicates(corpus, "vec_id", "embedding", threshold = 0.99))
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
        .orderBy("id_a", "id_b")
    },

    // -- d12: SemDeDup — k-means clusters (2 Lloyd's iterations, same
    //    deterministic recipe as ann_kmeans_ivf), then drop every
    //    vector with a smaller-id cluster-mate at cosine ≥ 0.99. The
    //    injected exact copies always share their source's cluster, so
    //    exactly they drop; the oracle unrolls the identical training
    //    over the same corpus. -----------------------------------------
    "d12_semantic_dedup" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val corpus = emb.unionByName(
        emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val cents = graft.ops.Similarity.kmeans(corpus, "vec_id", "embedding",
        step = 50, iters = 2)
      graft.ops.Dedup.semanticDedup(corpus, "vec_id", "embedding",
          cents, threshold = 0.99)
        .agg(count(lit(1)).as("n_kept"),
          sum("vec_id").as("sum_kept_ids"),
          max("vec_id").as("max_kept_id"))
    })

  private lazy val fullScanJaccardSql =
    s"""WITH corpus AS ($corpusNearSql),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
       |      ELSE list_transform(range(1, len(toks)-1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
       |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS toks FROM corpus)
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
       |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
       |FROM sh a JOIN sh b
       |  ON a.doc_id < b.doc_id
       | AND len(a.sh) >= 0.8 * len(b.sh) AND len(b.sh) >= 0.8 * len(a.sh)
       |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
       |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  private val d19Dir = "/tmp/graft_gate_d19_exactsubstr"

  /** Planted-overlap fixture for exact-substring dedup. Tokens are
    * synthetic prefixed counters so every case is hand-checkable:
    * blocks shared across docs are exactly where stated and nowhere
    * else (distinct prefixes guarantee no accidental 50-gram overlap).
    */
  private def writeD19Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def run(p: String, n: Int): Seq[String] = (0 until n).map(i => s"$p$i")
    val shared60 = run("s", 60)
    val shared50 = run("t", 50)
    val shared49 = run("u", 49)
    val self55 = run("v", 55)
    def doc(toks: Seq[String]): String = toks.mkString(" ")
    val rows: Seq[(Long, String)] = Seq(
      // 60-token block shared by docs 0/1 (and 9): removed from all
      (0L, doc(run("a", 100) ++ shared60 ++ run("b", 100))),
      (1L, doc(run("c", 30) ++ shared60 ++ run("cc", 30))),
      // exactly-minLen 50-token block shared by docs 2/3: removed
      (2L, doc(run("d", 50) ++ shared50 ++ run("dd", 30))),
      (3L, doc(run("e", 10) ++ shared50 ++ run("ee", 10))),
      // 49-token block shared by docs 4/5: BELOW minLen, kept intact
      (4L, doc(run("f", 20) ++ shared49 ++ run("ff", 20))),
      (5L, doc(run("g", 20) ++ shared49 ++ run("gg", 20))),
      // self-repetition: both copies of the 55-token run removed
      (6L, doc(self55 ++ run("h", 20) ++ self55)),
      // short (< minLen tokens) and empty docs: untouched
      (7L, doc(run("x", 30))),
      (8L, ""),
      // adjacent repeated blocks: coverage [10,69] ++ [70,119] must
      // merge into ONE removed span of 110 tokens
      (9L, doc(run("m", 10) ++ shared60 ++ shared50 ++ run("mm", 10))),
      // whole-doc duplicate pair: text_clean becomes empty
      (10L, doc(run("p", 70))),
      (11L, doc(run("p", 70))))
    s.createDataset(rows).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(d19Dir)
  }

  def oracle: Map[String, String] = Map(
    // Hand-derived: declared canonicals collapse the mirror (2) into
    // the origin (1); the userinfo/fragment fetch URL (4) collapses
    // into the declared canonical (3); 5 stands alone.
    "d21_canonical_dedup" ->
      """SELECT * FROM (VALUES
        |  (1::BIGINT, 'https://example.org/page?a=1&b=2'),
        |  (3::BIGINT, 'http://other.net/x'),
        |  (5::BIGINT, 'https://unique.example/'))
        |  t(doc_id, canon)
        |ORDER BY doc_id""".stripMargin,
    // Same synthetic 4-line construction, then: explode with position,
    // count segments >= 5 chars globally, keep a segment iff short/
    // exempt or globally unique, rebuild per doc in position order
    // (string_agg skips the NULLed-out dropped segments but keeps
    // kept empty strings, matching array_join).
    // Same first-occurrence rule via DuckDB's indexed lambda:
    // list_position returns the FIRST 1-based index of x, so keeping
    // elements where list_position(ls, x) = i is exactly "drop lines
    // seen earlier in this document".
    "d15_line_dedup" ->
      """WITH dirty AS (
        |  SELECT doc_id, coalesce(text, '') || CASE
        |    WHEN doc_id % 3 = 0 THEN chr(10) || 'dup line A' || chr(10) ||
        |      'unique B' || chr(10) || 'dup line A'
        |    WHEN doc_id % 3 = 1 THEN chr(10) || 'unique C' || chr(10) || 'unique D'
        |    ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls FROM dirty),
        |r AS (
        |  SELECT doc_id, t, len(ls) AS lines_in,
        |    array_to_string(list_filter(ls, (x, i) -> list_position(ls, x) = i),
        |      chr(10)) AS clean
        |  FROM c)
        |SELECT doc_id % 3 AS k, count(*)::BIGINT AS n_docs,
        |  sum(lines_in)::BIGINT AS total_lines_in,
        |  sum(len(string_split(clean, chr(10))))::BIGINT AS total_lines_out,
        |  sum(length(t) - length(clean))::BIGINT AS chars_delta
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // Classifies by DIRECT text comparison where the engine compares
    // content digests — agreement is itself part of the check (digest
    // equality must coincide with content equality).
    "d16_snapshot_diff" ->
      """WITH prev AS (SELECT doc_id, text FROM documents),
        |cur AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM prev WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM prev WHERE doc_id % 11 = 0),
        |j AS (
        |  SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
        |    CASE WHEN p.doc_id IS NULL THEN 'added'
        |         WHEN c.doc_id IS NULL THEN 'removed'
        |         WHEN p.text IS NOT DISTINCT FROM c.text THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id)
        |SELECT status, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS sum_ids
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "d14_segment_dedup" ->
      """WITH ml AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      CASE WHEN doc_id % 10 = 0 THEN 'promo header repeated line'
        |           ELSE substr(text, 1, 40) END,
        |      substr(text, 41, 40),
        |      'shared footer boilerplate',
        |      substr(text, 81, 40)) AS text
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS seg,
        |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
        |  FROM ml WHERE length(text) > 0),
        |cnt AS (
        |  SELECT seg, count(*) AS n FROM seg
        |  WHERE length(seg) >= 5 GROUP BY seg),
        |keep AS (
        |  SELECT s.doc_id, s.pos, s.seg,
        |    (length(s.seg) < 5 OR coalesce(c.n, 0) <= 1) AS kept
        |  FROM seg s LEFT JOIN cnt c ON s.seg = c.seg)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN kept THEN seg END, chr(10)
        |    ORDER BY pos), '') AS text_clean,
        |  count(*)::BIGINT AS n_segments,
        |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d1_dedup_exact" ->
      s"""SELECT sum(n)::BIGINT AS n_rows, count(*) AS n_distinct_text,
         | sum(n-1)::BIGINT AS n_dupes_removed,
         | sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
         | min(keeper) AS min_keeper
         |FROM (SELECT text, count(*) AS n, min(doc_id) AS keeper FROM (
         |  $corpusExactSql
         |) GROUP BY text)""".stripMargin,
    "d1b_exact_keeper" ->
      s"""SELECT count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_kept_ids,
         | max(doc_id) AS max_kept_id
         |FROM (SELECT min(doc_id) AS doc_id FROM (
         |  $corpusExactSql
         |) GROUP BY text)""".stripMargin,
    "d2_fingerprint_dedup" ->
      s"""SELECT sum(n)::BIGINT AS n_rows, count(*) AS n_distinct_fp,
         | sum(n-1)::BIGINT AS n_dupes_removed,
         | sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups
         |FROM (SELECT norm, count(*) AS n FROM (
         |  SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm FROM (
         |  $corpusExactSql
         |)) GROUP BY norm)""".stripMargin,
    // Full-scan exact-jaccard oracle with a LOSSLESS size-ratio prune:
    // j(A,B) >= 0.8 requires |A|/|B| >= 0.8 (|A|<=|B|), so pairs whose
    // distinct-shingle counts differ by more than 20% can be skipped.
    // Shared by d3 (LSH-banded) and d5 (inverted-index): both engines'
    // mechanisms must land on this same full-scan truth.
    "d3_minhash_lsh" -> fullScanJaccardSql,
    "d20_minhash_oph" -> fullScanJaccardSql,
    "d5_ngram_jaccard" -> fullScanJaccardSql,
    // Oracle replicates the greedy rule exactly: a doc is dropped iff it
    // has a jaccard>=0.8 neighbor with a smaller id.
    "d7_drop_neardups" ->
      s"""WITH corpus AS ($corpusNearSql),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
         |      ELSE list_transform(range(1, len(toks)-1),
         |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
         |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS toks FROM corpus)
         |),
         |losers AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |   AND len(a.sh) >= 0.8 * len(b.sh) AND len(b.sh) >= 0.8 * len(a.sh)
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
         |)
         |SELECT count(*) AS n_kept,
         |  sum(CASE WHEN doc_id >= 300000 THEN 1 ELSE 0 END)::BIGINT AS n_kept_copies,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    // Transitive closure over the same full-scan pair set via a
    // recursive reachability CTE; comp = min reachable id (incl. self).
    // d8's exact-jaccard component derivation, extended with the
    // winner rule: rank each component by (text length DESC, id DESC)
    // — the oracle twin of max_by(id, struct(score, id)) — and keep
    // everything that is not a grouped non-winner.
    "d17_keep_representative" ->
      s"""WITH RECURSIVE corpus AS ($corpusNearSql),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
         |      ELSE list_transform(range(1, len(toks)-1),
         |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
         |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS toks FROM corpus)
         |),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |   AND len(a.sh) >= 0.8 * len(b.sh) AND len(b.sh) >= 0.8 * len(a.sh)
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs
         |),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
         |),
         |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
         |ranked AS (
         |  SELECT c.id,
         |    row_number() OVER (PARTITION BY c.comp
         |      ORDER BY length(corpus.text) DESC, c.id DESC) AS rn
         |  FROM comp c JOIN corpus ON c.id = corpus.doc_id),
         |losers AS (SELECT id FROM ranked WHERE rn > 1)
         |SELECT count(*)::BIGINT AS n_kept,
         |  sum(doc_id)::BIGINT AS sum_kept_ids,
         |  sum(CASE WHEN doc_id >= 300000 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_clones_kept
         |FROM corpus
         |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    // Window construction is the c4/c14 shingle CTE without
    // list_distinct (multiplicity is the point), joined on the window
    // STRING — the oracle twin of the engine's hash-equality join.
    "d18_dup_spans" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(1, len(toks)-3),
         |             i -> array_to_string(toks[i:i+4], ' ')) END) AS g
         |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS toks
         |        FROM ($corpusExactSql))
         |  WHERE len(toks) >= 1
         |), c AS (
         |  SELECT g, count(*) AS n FROM w GROUP BY g
         |)
         |SELECT w.doc_id, count(*)::BIGINT AS n_windows,
         |  sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_windows,
         |  round(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         |    AS dup_fraction
         |FROM w JOIN c USING (g)
         |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,

    // Exact-substring removal replayed in SQL: repeated 50-gram
    // windows (grouped by the window STRING), interval coverage,
    // gaps-and-islands merge, and a NOT EXISTS token rebuild.
    "d19_exact_substring" ->
      s"""WITH docs AS (SELECT doc_id, text
         |              FROM read_parquet('$d19Dir/*.parquet')),
         |tok AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
         |        FROM docs),
         |win AS (
         |  SELECT doc_id, i - 1 AS start,
         |    array_to_string(tk[i:i+49], ' ') AS w
         |  FROM tok, unnest(range(1, len(tk) - 48)) u(i)
         |  WHERE len(tk) >= 50),
         |dup AS (SELECT w FROM win GROUP BY w HAVING count(*) >= 2),
         |cov AS (SELECT doc_id, start AS s, start + 49 AS e
         |        FROM win WHERE w IN (SELECT w FROM dup)),
         |isl AS (
         |  SELECT doc_id, s, e,
         |    sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s) AS isl_id
         |  FROM (SELECT doc_id, s, e,
         |          max(e) OVER (PARTITION BY doc_id ORDER BY s
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |        FROM cov)),
         |spans AS (
         |  SELECT doc_id, isl_id, min(s) AS s, max(e) AS e
         |  FROM isl GROUP BY doc_id, isl_id),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_dup_spans,
         |    sum(e - s + 1) AS n_removed_tokens
         |  FROM spans GROUP BY doc_id),
         |tp AS (SELECT doc_id, i - 1 AS pos, tk[i] AS t
         |       FROM tok, unnest(range(1, len(tk) + 1)) u(i)),
         |kept AS (
         |  SELECT tp.doc_id,
         |    array_to_string(list(tp.t ORDER BY tp.pos), ' ') AS text_clean
         |  FROM tp
         |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
         |    WHERE sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.s AND sp.e)
         |  GROUP BY tp.doc_id)
         |SELECT d.doc_id,
         |  coalesce(k.text_clean, '') AS text_clean,
         |  len(t.tk)::BIGINT AS n_tokens,
         |  coalesce(p.n_removed_tokens, 0)::BIGINT AS n_removed_tokens,
         |  coalesce(p.n_dup_spans, 0)::BIGINT AS n_dup_spans
         |FROM docs d JOIN tok t USING (doc_id)
         |LEFT JOIN kept k USING (doc_id)
         |LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "d8_dup_groups" ->
      s"""WITH RECURSIVE corpus AS ($corpusNearSql),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
         |      ELSE list_transform(range(1, len(toks)-1),
         |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
         |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\\S+') AS toks FROM corpus)
         |),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |   AND len(a.sh) >= 0.8 * len(b.sh) AND len(b.sh) >= 0.8 * len(a.sh)
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs
         |),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
         |),
         |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
         |SELECT comp, count(*) AS n_members,
         |  string_agg(id::VARCHAR, ',' ORDER BY id) AS members
         |FROM comp GROUP BY comp ORDER BY comp""".stripMargin,
    // Full-scan jaccard truth between the incoming and seen corpora,
    // with the same lossless size-ratio prune the d3/d5 oracles use.
    "d10_neardup_against" ->
      """WITH incoming AS (
        |  SELECT doc_id+300000 AS doc_id,
        |         array_to_string(list_slice(string_split(text,' '), 1,
        |           ceil(len(string_split(text,' ')) * 0.95)::INT), ' ') AS text
        |  FROM documents WHERE doc_id%10=0
        |  UNION ALL
        |  SELECT doc_id+500000,
        |         array_to_string(list_reverse(string_split(text,' ')), ' ')
        |  FROM documents WHERE doc_id%10=7
        |),
        |shi AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |      ELSE list_transform(range(1, len(toks)-1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks FROM incoming)
        |),
        |shs AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |      ELSE list_transform(range(1, len(toks)-1),
        |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks FROM documents)
        |),
        |matched AS (
        |  SELECT DISTINCT a.doc_id
        |  FROM shi a JOIN shs b
        |    ON len(a.sh) >= 0.8 * len(b.sh) AND len(b.sh) >= 0.8 * len(a.sh)
        |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
        |)
        |SELECT doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.doc_id = i.doc_id)
        |ORDER BY doc_id""".stripMargin,
    // The digest details are invisible to the result given one parity
    // rule: dedupAgainst digests NULL to its own tag, so an incoming
    // NULL matches a seen NULL — hence IS NOT DISTINCT FROM, not `=`
    // (which would keep every NULL-text incoming row the engine drops).
    "d9_incremental_dedup" ->
      """WITH incoming AS (
        |  SELECT doc_id+100000 AS doc_id, text FROM documents WHERE doc_id%10=0
        |  UNION ALL
        |  SELECT doc_id+200000, upper(regexp_replace(text,' ','  ','g'))
        |    FROM documents WHERE doc_id%10=5
        |)
        |SELECT doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM documents s
        |                  WHERE s.text IS NOT DISTINCT FROM i.text)
        |ORDER BY doc_id""".stripMargin,
    "d13_bloom_dedup" ->
      """WITH incoming AS (
        |  SELECT doc_id+100000 AS doc_id, text FROM documents WHERE doc_id%10=0
        |  UNION ALL
        |  SELECT doc_id+200000, upper(regexp_replace(text,' ','  ','g'))
        |    FROM documents WHERE doc_id%10=5
        |)
        |SELECT doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM documents s
        |                  WHERE s.text IS NOT DISTINCT FROM i.text)
        |ORDER BY doc_id""".stripMargin,
    // Full replication of the 60-bit sha-based SimHash pipeline: token
    // hash = first 15 sha256 hex chars as a BIGINT (the label-bucket
    // hex-sum trick; 60 bits keeps all arithmetic positive in signed
    // 64-bit on both engines), weighted bit votes over generate_series,
    // then the SAME candidate rule the engine uses — some 15-bit band
    // equal AND hamming ≤ 6.
    "d4_simhash_neardup" ->
      s"""WITH corpus AS ($corpusExactSql),
         |toks AS (
         |  SELECT doc_id, tok, count(*)::BIGINT AS w
         |  FROM (SELECT doc_id, unnest(regexp_extract_all(trim(text), '\\S+')) AS tok
         |        FROM corpus)
         |  GROUP BY doc_id, tok
         |),
         |th AS (
         |  SELECT doc_id, w,
         |    (SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::BIGINT
         |                * (1::BIGINT << ((15 - i) * 4)))
         |     FROM generate_series(1, 15) g(i)) AS h
         |  FROM (SELECT doc_id, w, sha256(tok) AS h FROM toks)
         |),
         |votes AS (
         |  SELECT doc_id, b.b AS bit,
         |    sum(CASE WHEN (h >> b.b) & 1 = 1 THEN w ELSE -w END) AS acc
         |  FROM th, generate_series(0, 59) b(b)
         |  GROUP BY doc_id, b.b
         |),
         |shash AS (
         |  SELECT c.doc_id,
         |    coalesce((SELECT sum(CASE WHEN v.acc > 0 THEN (1::BIGINT << v.bit)
         |                              ELSE 0::BIGINT END)
         |              FROM votes v WHERE v.doc_id = c.doc_id), 0)::BIGINT AS sh
         |  FROM corpus c
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
         |FROM shash a JOIN shash b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 6
         |  AND ((a.sh >> 0) & 32767 = (b.sh >> 0) & 32767
         |    OR (a.sh >> 15) & 32767 = (b.sh >> 15) & 32767
         |    OR (a.sh >> 30) & 32767 = (b.sh >> 30) & 32767
         |    OR (a.sh >> 45) & 32767 = (b.sh >> 45) & 32767)
         |ORDER BY id_a, id_b""".stripMargin,
    "d4b_simhash_clone_pairs" ->
      """SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 0::BIGINT AS hamming
        |FROM documents WHERE doc_id % 10 = 0 AND doc_id < 100000
        |ORDER BY id_a""".stripMargin,
    "d11_embedding_against" ->
      """WITH incoming AS (
        |  SELECT vec_id+100000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id%5=0
        |  UNION ALL
        |  SELECT vec_id+200000, list_concat(embedding[8:], embedding[1:7])
        |  FROM embeddings WHERE vec_id%5=2
        |),
        |matched AS (
        |  SELECT DISTINCT i.vec_id
        |  FROM incoming i JOIN embeddings s
        |    ON list_cosine_similarity(i.embedding::DOUBLE[],
        |                              s.embedding::DOUBLE[]) >= 0.99
        |)
        |SELECT vec_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.vec_id = i.vec_id)
        |ORDER BY vec_id""".stripMargin,
    "d6_embedding_neardup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id+100000, embedding FROM embeddings WHERE vec_id%5=0
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_r
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,
    // Two Lloyd's iterations unrolled over the injected-copy corpus —
    // the ann_kmeans_ivf recipe (FLOAT round-trip per new coordinate,
    // (cos DESC, cent_id) assignment tie order), then the SemDeDup
    // drop rule as a within-bucket smaller-id EXISTS.
    "d12_semantic_dedup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id+100000, embedding FROM embeddings WHERE vec_id%5=0
        |), cent0 AS (
        |  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent_emb
        |  FROM corpus WHERE vec_id % 50 = 0
        |), a0 AS (
        |  SELECT vec_id, embedding, cent_id AS bucket FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cent_emb) DESC,
        |                 c.cent_id) AS arank
        |    FROM corpus e CROSS JOIN cent0 c
        |  ) WHERE arank = 1
        |), e0 AS (
        |  SELECT bucket, unnest(range(len(embedding))) AS pos,
        |         unnest(embedding::DOUBLE[]) AS v
        |  FROM a0
        |), cent1 AS (
        |  SELECT bucket AS cent_id,
        |    list_transform(list(m ORDER BY pos),
        |                   x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS cent_emb
        |  FROM (SELECT bucket, pos, avg(v) AS m FROM e0 GROUP BY bucket, pos)
        |  GROUP BY bucket
        |), a1 AS (
        |  SELECT vec_id, embedding, cent_id AS bucket FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cent_emb) DESC,
        |                 c.cent_id) AS arank
        |    FROM corpus e CROSS JOIN cent1 c
        |  ) WHERE arank = 1
        |), e1 AS (
        |  SELECT bucket, unnest(range(len(embedding))) AS pos,
        |         unnest(embedding::DOUBLE[]) AS v
        |  FROM a1
        |), cent2 AS (
        |  SELECT bucket AS cent_id,
        |    list_transform(list(m ORDER BY pos),
        |                   x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS cent_emb
        |  FROM (SELECT bucket, pos, avg(v) AS m FROM e1 GROUP BY bucket, pos)
        |  GROUP BY bucket
        |), assigned AS (
        |  SELECT vec_id, embedding, cent_id AS bucket FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cent_emb) DESC,
        |                 c.cent_id) AS arank
        |    FROM corpus e CROSS JOIN cent2 c
        |  ) WHERE arank = 1
        |), losers AS (
        |  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
        |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.99
        |)
        |SELECT count(*) AS n_kept, sum(vec_id)::BIGINT AS sum_kept_ids,
        |  max(vec_id) AS max_kept_id
        |FROM corpus
        |WHERE vec_id NOT IN (SELECT vec_id FROM losers)""".stripMargin)
}
