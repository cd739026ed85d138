package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}
import graft.util.Par
import graft.ops.Checkpoints.Truncatable

/** Deduplication operators for training-data pipelines, as a public
  * library surface. Every variant is shuffle-shaped as a groupBy /
  * equi-join on a derived key — never a cartesian product — so the
  * same code runs at gate scale and at 100 TB:
  *
  *  - exact: hash-groupBy on content columns;
  *  - fingerprint: 64-bit rolling hash of normalized text (case/
  *    whitespace-insensitive exact);
  *  - MinHash+LSH: shingle → signature → band keys → band equi-join →
  *    exact-jaccard verify (bounded candidates, provable recall);
  *  - SimHash: 60-bit sha-256-based sketch, 15-bit band join, hamming
  *    verify (sha basis keeps the sketch SQL-replicable end to end);
  *  - embedding cosine: self-join pruned by id with a codegen'd
  *    cosine expression.
  *
  * Skew note: a degenerate corpus (millions of identical docs) makes
  * one band bucket huge; cap with `maxBucket` — buckets larger than
  * the cap are dropped from candidate generation (they are, by
  * construction, near-identical groups better handled by exact dedup
  * first).
  */
object Dedup {

  /** Keep one row per distinct value of `cols` (the smallest `idCol`
    * wins — deterministic, unlike dropDuplicates' arbitrary winner).
    *
    * Shaped as `min_by(struct(*), idCol)` — a hash aggregate that
    * partial-aggregates map-side, so each mapper ships one candidate
    * row per local key instead of the full shuffle + per-partition sort
    * a `row_number` window would cost.
    *
    * CONTRACT: `idCol` must be non-null (same contract as
    * [[Curation.samplePerStratum]]'s id). `min_by` skips NULL ordering
    * values, so a row with a NULL id can never win its group, and a
    * group whose ids are ALL NULL would surface a row of NULLs rather
    * than any real member — pre-filter or assign ids first if your
    * data can contain NULL ids.
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame = {
    val keep = df.columns.filterNot(cols.contains)
    if (keep.isEmpty) df.distinct()
    else df.groupBy(cols.map(col): _*)
      // getField, not col("__keeper.name"): a literal dot in a column
      // name must stay a field name, never a nested path.
      .agg(min_by(struct(keep.map(col).toSeq: _*), col(idCol)).as("__keeper"))
      .select(cols.map(col) ++ keep.map(c => col("__keeper").getField(c).as(c)): _*)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Group-size statistics for exact duplicates of `textCol`. */
  def exactStats(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(textCol)
      .agg(count(lit(1)).as("n"), min(idCol).as("keeper"))
      .agg(
        sum("n").as("n_rows"),
        count(lit(1)).as("n_distinct_text"),
        sum(col("n") - 1).as("n_dupes_removed"),
        sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_groups"),
        min("keeper").as("min_keeper"))

  /** SEGMENT-level exact dedup WITHIN documents across the corpus — the
    * C4 / CCNet cleanup that document-level dedup cannot do: boilerplate
    * lines and paragraphs (navigation, footers, cookie banners) repeat
    * across millions of otherwise-distinct pages, and the pipeline must
    * remove the repeated SEGMENTS while keeping the documents. Splits
    * `textCol` on `sep` (a literal, not a regex), counts each segment's
    * corpus-wide occurrences, and rebuilds every document from the kept
    * segments in original order. Returns
    * `(idCol, text_clean, n_segments, n_kept)` — one row per input row,
    * including rows whose text is NULL/empty (0 segments, empty clean
    * text) or whose every segment was dropped.
    *
    * Keep rule: a segment survives iff its corpus-wide count is ≤
    * `maxOccurrences` (default 1: only globally-unique segments stay),
    * OR it is shorter than `minChars` (short/empty segments — blank
    * lines, "Introduction" — are structure, not signal; they are exempt
    * and always kept). With `keepFirst = true` the single occurrence
    * with the smallest `(idCol, position)` additionally survives, so a
    * duplicated paragraph's content is retained exactly once in the
    * corpus (C4's rule) instead of dropped everywhere (CCNet's).
    *
    * Scale shape: the occurrence count aggregates on a 256-bit digest —
    * map-side partial, only digests shuffle. The drop decision comes
    * back as a per-document position set (narrow: id + integer array,
    * bounded by segments-per-doc), joined onto the exploded segments BY
    * ID — the same key the rebuild aggregates on, so segment text
    * crosses the wire exactly once and the final aggregate reuses the
    * join's partitioning. No window over the corpus, no global sort;
    * per-doc `sort_array(collect_list)` is bounded by document size,
    * the same bound `chunkDocuments` and every per-doc aggregate
    * already assumes.
    *
    * CONTRACT: `idCol` non-null and unique (the rebuild groups by it;
    * duplicate ids would merge documents). NULL text is treated as zero
    * segments, never an error.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
                    sep: String = "\n", maxOccurrences: Long = 1,
                    minChars: Int = 1,
                    keepFirst: Boolean = false): DataFrame = {
    require(sep.nonEmpty, "sep must be a non-empty literal separator")
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1")
    for (r <- Seq("text_clean", "n_segments", "n_kept"))
      require(idCol != r, s"idCol '$r' collides with an output column")
    for (r <- Seq("__t", "__pos", "__seg", "__d", "__n", "__first",
        "__drops", "__keep"))
      require(idCol != r, s"idCol '$r' is reserved")
    val sepPattern = java.util.regex.Pattern.quote(sep)
    // A NULL/empty text splits to [""] — a phantom segment. Filter on
    // the (still in scope) raw text so such rows contribute zero
    // segments; the final left join restores them as empty documents.
    //
    // `segs` is deliberately NOT persisted across its two uses (the
    // digest leg and the rebuild leg): split+explode is cheap linear
    // work over a scan, while caching the exploded corpus would spill
    // ~the whole text volume to local disk — the same recompute-over-
    // persist trade dedupAgainstBloom documents. Consequence: the
    // source is read more than once, so feed a fixed snapshot when the
    // underlying path is being written concurrently.
    val segs = df
      .select(col(idCol), coalesce(col(textCol), lit("")).as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col(idCol),
        posexplode(split(col("__t"), sepPattern))
          .as(Seq("__pos", "__seg")))
    val eligible = segs.filter(length(col("__seg")) >= minChars)
      .select(col(idCol), col("__pos"), sha2(col("__seg"), 256).as("__d"))
    val dupDigests = eligible.groupBy("__d")
      .agg(count(lit(1)).as("__n"),
        min(struct(col(idCol), col("__pos"))).as("__first"))
      .filter(col("__n") > maxOccurrences)
    val dropPositions = eligible
      .join(dupDigests, Seq("__d"))
      .filter(if (keepFirst)
        not(struct(col(idCol), col("__pos")) === col("__first"))
      else lit(true))
      .groupBy(col(idCol))
      .agg(collect_set(col("__pos")).as("__drops"))
    val rebuilt = segs
      .join(dropPositions, Seq(idCol), "left")
      .withColumn("__keep",
        col("__drops").isNull || !array_contains(col("__drops"), col("__pos")))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__seg"))))),
          _.getField("__seg")), sep).as("text_clean"),
        count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** SPAN-level duplication signal — the scalable form of
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", which uses a suffix array on
    * one machine; the n-gram-window digest count is its standard
    * distributed approximation). For every document: the number of
    * sliding `window`-word spans, how many of those spans occur at
    * least `minCount` times ANYWHERE in the corpus (other documents OR
    * the same document — self-repetition is precisely part of the
    * signal), and the duplicated fraction. Returns
    * `(idCol, n_windows, n_dup_windows, dup_fraction)` for every
    * document with at least one token; a document shorter than
    * `window` words contributes its whole text as one span. Feed
    * `dup_fraction` to a drop/trim threshold: a high fraction marks
    * boilerplate-heavy or templated pages that document-level and
    * paragraph-level ([[dedupSegments]]) dedup both miss.
    *
    * Scale shape: windows never materialize as strings beyond the
    * hashing kernel — only 64-bit digests flow. Two aggregates: a
    * corpus-wide digest count (map-side partial; duplicated digests
    * collapse before the shuffle) and a per-document count after the
    * digest equi-join (bounded by matches; no broadcast assumption —
    * the duplicated-digest side can be corpus-scale). The source is
    * scanned twice (once per side of the join) — the
    * [[dedupSegments]] trade: re-deriving digests from the scan beats
    * caching the exploded frame at 100 TB.
    *
    * CONTRACT: `idCol` non-null (null ids would merge in the per-doc
    * aggregate). NULL/token-free text yields no output row.
    */
  def duplicatedSpanStats(df: DataFrame, idCol: String, textCol: String,
                          window: Int = 8, minCount: Long = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(minCount >= 2, s"minCount must be >= 2: $minCount")
    for (r <- Seq("n_windows", "n_dup_windows", "dup_fraction"))
      require(idCol != r, s"idCol '$r' collides with an output column")
    for (r <- Seq("__wh", "__n", "__dup"))
      require(idCol != r, s"idCol '$r' is reserved")
    val wins = df.select(col(idCol),
      explode(F.windowHashes(col(textCol), window)).as("__wh"))
    val dupDigests = wins.groupBy("__wh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select(col("__wh"), lit(1).as("__dup"))
    wins.join(dupDigests, Seq("__wh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("__dup"), lit(0))).cast("long").as("n_dup_windows"))
      .withColumn("dup_fraction",
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
  }

  /** EXACT-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", §4.1 ExactSubstr): remove
    * every token that lies inside a token substring of length >=
    * `minLen` occurring at least twice anywhere in the corpus (other
    * documents OR elsewhere in the same document — the reference
    * tool's `self-similar` mode removes all occurrences, and so does
    * this). Unlike [[duplicatedSpanStats]] (a per-document signal for
    * thresholding), this is the real span REMOVAL — the output text
    * has the duplicated spans cut out, not the whole document dropped.
    *
    * The paper finds repeated substrings with a single-node suffix
    * array; that structure does not distribute. This implementation
    * computes the IDENTICAL removal set from repeated fixed-width
    * windows, which is exact, not an approximation, by the following
    * lemma: a token is inside some repeated substring of length >=
    * minLen  <=>  it is covered by some repeated minLen-token window.
    * (=>: if S with |S| >= minLen occurs at two distinct positions,
    * every minLen-window inside S also occurs at both, so each token
    * of S — every one lies in at least one such window — is covered
    * by a repeated window. <=: a repeated minLen-window IS a repeated
    * substring of length minLen containing its tokens.) So the union
    * of [start, start+minLen-1] over repeated windows equals the
    * suffix-array removal set exactly; what the window form cannot
    * name is WHICH partner each span matches — irrelevant to removal.
    *
    * Shape at 100 TB: windows never materialize beyond one row in
    * codegen — positions explode, each position hashes its window to a
    * 256-bit sha-2 digest (space-joined tokens: injective, since
    * whitespace-split tokens cannot contain the separator; collisions
    * 2^-128-scale, the [[dedupAgainst]] argument). One hash aggregate
    * over digests (map-side partial collapses every locally-repeated
    * window before the shuffle), one LEFT SEMI join back, then
    * per-document gaps-and-islands interval merge (window functions
    * partitioned by id — state is O(spans per doc), never corpus-
    * sized) and an index-aware HOF rebuild. Cost is O(n·minLen)
    * digest bytes per n-token shard, the same order as the suffix
    * array's construction scan, but embarrassingly parallel.
    *
    * Output, one row per input row:
    * `(idCol, text_clean, n_tokens, n_removed_tokens, n_dup_spans)`.
    * `text_clean` is the kept tokens space-joined (token-stream
    * normalization, exactly the paper's setting: dedup operates on
    * the token sequence, not raw bytes). Documents shorter than
    * `minLen` tokens are returned untouched (they cannot contain a
    * >= minLen span); NULL text yields an empty clean text.
    *
    * CONTRACT: `idCol` non-null and unique (it keys the per-document
    * interval merge and the final left join).
    */
  def exactSubstrDedup(df: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 50): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2: $minLen")
    for (r <- Seq("text_clean", "n_tokens", "n_removed_tokens", "n_dup_spans"))
      require(idCol != r, s"idCol '$r' collides with an output column")
    val toks = df.select(col(idCol),
      filter(split(coalesce(col(textCol), lit("")), "\\s+"),
        t => t =!= "").as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // (id, start, digest) for every minLen-window; docs with fewer
    // than minLen tokens emit nothing.
    val wins = toks.filter(col("__n") >= minLen)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__n") - minLen)).as("__start"))
      .select(col(idCol), col("__start"),
        sha2(array_join(
          slice(col("__toks"), col("__start") + 1, lit(minLen)), " "), 256)
          .as("__wh"))
    val dup = wins.groupBy("__wh").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__wh")
    val covered = wins.join(dup, Seq("__wh"), "left_semi")
      .select(col(idCol), col("__start"),
        (col("__start") + (minLen - 1)).as("__end"))
    // Gaps-and-islands: running max of prior ends; a window starting
    // more than one past it opens a new removed span (start ==
    // prevMax+1 is contiguous coverage — same span).
    val w = Window.partitionBy(idCol).orderBy("__start")
    val islands = covered
      .withColumn("__pmax", max(col("__end"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__start") > col("__pmax") + 1, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("__start").as("__s"), max("__end").as("__e"))
    val spans = islands.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__s"), col("__e"))))
          .as("__spans"),
        count(lit(1)).as("n_dup_spans"),
        sum(col("__e") - col("__s") + 1).as("n_removed_tokens"))
    toks.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__spans").isNull, array_join(col("__toks"), " "))
          .otherwise(array_join(
            transform(
              filter(zip_with(col("__toks"),
                  sequence(lit(0), col("__n") - 1),
                  (t, i) => struct(t.as("t"), i.as("i"))),
                s => !exists(col("__spans"), sp =>
                  s.getField("i") >= sp.getField("__s") &&
                    s.getField("i") <= sp.getField("__e"))),
              s => s.getField("t")), " "))
          .as("text_clean"),
        col("__n").cast("long").as("n_tokens"),
        coalesce(col("n_removed_tokens"), lit(0L)).cast("long")
          .as("n_removed_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).cast("long")
          .as("n_dup_spans"))
  }

  /** Incremental dedup: keep only `incoming` rows whose content — the
    * `on` columns, null-tagged — does not already appear in `seen`.
    * The standard "dedup the new crawl against the ingested corpus"
    * pass: at 100 TB the corpus side is read-only history and only the
    * new slice needs filtering, so re-deduplicating the union from
    * scratch (d1's shape) would re-shuffle the whole corpus for
    * nothing.
    *
    * Shape: both sides reduce to a 256-bit sha-2 content digest; the
    * seen side distincts to one row per digest and a LEFT ANTI hash
    * join drops matches. What shuffles is the 64-hex-char digest —
    * never document bodies — and the digest frame is exactly what a
    * pipeline would persist as its "seen" index between crawls.
    * Collisions: 2^-128-scale, ignorable. Each column is length-
    * prefixed before concatenation ("3:abc"), which makes the encoding
    * injective (no value can smuggle a separator that makes two
    * different tuples digest equal), and NULL gets its own tag,
    * distinct from the empty string.
    */
  def dedupAgainst(incoming: DataFrame, seen: DataFrame,
                   on: Seq[String]): DataFrame = {
    requireDigestable(incoming, seen, on)
    require(!incoming.columns.contains("__graft_seen_k"),
      "incoming already has a '__graft_seen_k' column")
    val seenKeys = seen.select(contentDigest(seen, on).as("__graft_seen_k")).distinct()
    incoming.join(seenKeys,
      contentDigest(incoming, on) === col("__graft_seen_k"), "left_anti")
  }

  /** Crawl-over-crawl snapshot diff: per-id status of `cur` vs `prev`
    * — `added` (id only in cur), `removed` (only in prev), `changed`
    * (both, content digest differs over `on`), `unchanged`. The
    * reporting terminus of an incremental ingest: what this crawl
    * actually did to the corpus, as one frame to aggregate or join
    * downstream.
    *
    * Shape: both sides project to (id, digest) BEFORE the full-outer
    * join, so the shuffle moves two narrow columns per row — never
    * document bodies — and the digest is the same length-prefixed
    * sha256 the dedup family uses ([[contentDigest]]). One shuffle on
    * the id; a full outer join has no broadcast variant, and co-
    * partitioning both snapshots on the id (bucketed tables) removes
    * even that shuffle at scale.
    *
    * CONTRACT: `idCol` must be non-null and unique per snapshot (the
    * [[exact]] contract): NULL ids never join, so a NULL-id row would
    * surface as a spurious added+removed pair.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, idCol: String,
                   on: Seq[String]): DataFrame = {
    requireDigestable(prev, cur, on)
    require(prev.columns.contains(idCol) && cur.columns.contains(idCol),
      s"both snapshots need id column '$idCol'")
    // Output/internal-name guards (the round-6 reserved-column rule):
    // an idCol named like an internal or the output column would
    // silently shadow it.
    require(idCol != "status", "idCol 'status' collides with the output column")
    for (r <- Seq("__graft_id", "__graft_dp", "__graft_dc"))
      require(idCol != r, s"idCol '$r' is reserved")
    val p = prev.select(col(idCol).as("__graft_id"),
      contentDigest(prev, on).as("__graft_dp"))
    val c = cur.select(col(idCol).as("__graft_id"),
      contentDigest(cur, on).as("__graft_dc"))
    p.join(c, Seq("__graft_id"), "full_outer")
      .select(col("__graft_id").as(idCol),
        when(col("__graft_dp").isNull, "added")
          .when(col("__graft_dc").isNull, "removed")
          .when(col("__graft_dp") === col("__graft_dc"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The shared injective content digest of [[dedupAgainst]] /
    * [[dedupAgainstBloom]]: each `on` column length-prefixed ("3:abc",
    * NULL tagged distinctly from ""), concatenated, sha-256'd.
    */
  private def contentDigest(d: DataFrame, on: Seq[String]): Column = {
    val parts = on.map { name =>
      val s = d(name).cast("string")
      when(s.isNull, lit("-"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    sha2(concat_ws("|", parts: _*), 256)
  }

  // The length-prefix encoding is injective over STRINGS; for
  // array/map/struct columns cast-to-string is lossy ("[a, b]" from
  // Seq("a","b") and from Seq("a, b") alike) and a false match
  // silently DROPS genuinely-new rows — fail loud instead.
  private def requireDigestable(incoming: DataFrame, seen: DataFrame,
                                on: Seq[String]): Unit = {
    require(on.nonEmpty, "dedupAgainst needs at least one content column")
    for (d <- Seq(incoming, seen); c <- on) {
      val dt = d.schema(c).dataType
      require(!dt.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.MapType] &&
        !dt.isInstanceOf[org.apache.spark.sql.types.StructType],
        s"dedupAgainst content column '$c' has non-atomic type $dt: " +
          "cast-to-string is not injective there; project to a string " +
          "(e.g. to_json) first")
    }
  }

  /** Train the reusable Bloom prefilter over the SEEN corpus digests —
    * one aggregation scan, result lives on the driver and broadcasts to
    * every later [[dedupAgainstBloom]] call (batches or microbatches).
    * Sizing: ~9.6 bits/item at fpp 0.01 → 1e9 corpus digests ≈ 1.2 GB;
    * beyond that raise `fpp` (false positives only cost exact-verify
    * work, never correctness) or shard the corpus. Rebuild cadence is a
    * pipeline choice — a stale filter stays CORRECT (new corpus rows it
    * doesn't know about simply fall through to the exact verify as
    * maybe-misses... they are definitely-new under the old corpus and
    * pass the verify against whatever `seen` frame the caller passes).
    */
  def digestBloom(seen: DataFrame, on: Seq[String], expectedItems: Long,
                  fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    requireDigestable(seen, seen, on)
    seen.select(contentDigest(seen, on).as("__graft_k"))
      .stat.bloomFilter("__graft_k", expectedItems, fpp)
  }

  /** [[dedupAgainst]] with a Bloom prefilter: identical keep/drop
    * semantics (Bloom filters have NO false negatives — a definitely-new
    * verdict is exact; false positives go through the same exact digest
    * verify as before), but the SEEN corpus is never shuffled:
    *
    *  1. the (small) maybe-duplicate digest set broadcasts to a
    *     LEFT SEMI over `seen` — one map-side scan finds the digests
    *     that truly collide;
    *  2. those collided digests broadcast back to ONE LEFT ANTI over
    *     all incoming rows — definitely-new rows pass as hash-probe
    *     misses against the small broadcast.
    *
    * Per batch the moving data is `|true dups| + fpp·|incoming|` digest
    * rows — vs [[dedupAgainst]]'s full shuffle of the corpus digest
    * set. That is the difference between re-keying 10 B corpus rows per
    * crawl batch and reading them in place once. If a batch is MOSTLY
    * duplicates the maybe set is too large to broadcast; rather than
    * rely on the caller reading this doc, the operator COUNTS the maybe
    * set on big batches (one action over the persisted digest
    * projection — the plan is shape-dependent, so this call is eager,
    * unlike most of this module) and falls back to
    * [[dedupAgainstBloomPrefilter]]'s
    * shuffle anti-join, whose cost is sized to the duplicate volume.
    * `maxMaybeKeys` is that pivot (64-byte digest rows: the default
    * 2M ≈ 128 MB broadcast, a deliberate notch above the usual 8–32 MB
    * auto-broadcast threshold because the alternative is shuffling the
    * corpus).
    *
    * Whether that pivot COUNT runs at all is ADAPTIVE, decided before
    * any job from the optimizer's estimate of the keyed batch
    * (`optimizedPlan.stats.sizeInBytes` — file-source stats, free):
    *
    *  - SMALL batch (≤ `smallBatchMaxBytes`): the maybe set is bounded
    *    by the batch itself, so the broadcast cannot blow the driver
    *    and the pivot is unnecessary — the operator returns ONE fully
    *    lazy plan (maybe digests → semi over seen → anti over the
    *    batch) with no pre-count, no persist, no checkpoint. At gate/
    *    microbatch scale the eager plumbing, not the data, was the
    *    cost: the counted shape ran three driver-visible jobs where
    *    one suffices. SIZING CONTRACT: the estimate is essentially
    *    on-disk bytes (file-source stats), and what the lazy path
    *    actually bounds is the worst case `rows(batch) ≈ bytes /
    *    compressed-row-size` — the 64 MB default keeps even a
    *    short-row (URL-sized, ~30 B/row compressed) batch's maybe set
    *    in the same ~2 M-digest class as `maxMaybeKeys`. Raise it only
    *    for long-document batches, where rows-per-byte is tiny.
    *  - BIG batch (the 100 TB design point): the maybe-set size is
    *    only observable by running the scan, and caching the scanned
    *    batch to share it would spill a batch-sized copy to executor
    *    disks — costlier than recomputing digests. So the DIGEST-ONLY
    *    maybe projection persists across the pivot count, capped by
    *    construction (≤ maybe-set rows), freed as soon as the
    *    collided index materializes (or on fallback/failure — a
    *    MEMORY_AND_DISK block spilled to disk is never evicted by
    *    memory pressure, so "aging out" would leak one entry per call
    *    in a long-lived session), and the final anti-join re-scans
    *    the source.
    *
    * On the big-batch path the count and the subsequent
    * `broadcast(maybeKeys)` must see ONE snapshot — the digest persist
    * — or a live source (a landing directory gaining files between
    * jobs) could pass the count at just under `maxMaybeKeys` and then
    * materialize a far larger key set inside the broadcast; its final
    * anti-join also re-scans the source, so rows that appear AFTER the
    * pivot flow through it unguarded. Feed this operator a fixed file
    * list / snapshot when the underlying path is being written
    * concurrently. The small-batch path is one plan, so all reads
    * happen within one execution; its broadcast stays bounded by the
    * file listing the estimate was computed from.
    */
  def dedupAgainstBloom(incoming: DataFrame, seen: DataFrame, on: Seq[String],
                        bloom: org.apache.spark.util.sketch.BloomFilter,
                        maxMaybeKeys: Long = 2000000L,
                        smallBatchMaxBytes: Long = 64L << 20): DataFrame = {
    requireDigestable(incoming, seen, on)
    require(!incoming.columns.contains("__graft_k"),
      "incoming already has a '__graft_k' column")
    val spark = incoming.sparkSession
    val bloomB = spark.sparkContext.broadcast(bloom)
    val might = udf((s: String) => bloomB.value.mightContainString(s))

    val keyed = incoming.withColumn("__graft_k", contentDigest(incoming, on))

    // ONE anti-join over ALL rows, not a definitely-new/maybe union of
    // two filter branches: a row the filter never flagged cannot be in
    // `seen`, hence cannot be in `collided` — same keep set with one
    // join node. Definitely-new rows pass through as cheap hash-probe
    // misses against the small broadcast.
    def broadcastJoin(collided: DataFrame): DataFrame =
      keyed.join(broadcast(collided), Seq("__graft_k"), "left_anti")
        .drop("__graft_k")

    def collidedFrom(maybeKeys: DataFrame): DataFrame =
      seen.select(contentDigest(seen, on).as("__graft_k"))
        .join(broadcast(maybeKeys), Seq("__graft_k"), "left_semi")
        .distinct()

    val estBytes = keyed.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes <= BigInt(smallBatchMaxBytes)) {
      // small batch: single lazy plan, no pivot, nothing persisted
      broadcastJoin(collidedFrom(
        keyed.filter(might(col("__graft_k"))).select("__graft_k").distinct()))
    } else {
      // big batch: persist only the digest projection across the pivot
      val maybeKeys = keyed.filter(might(col("__graft_k")))
        .select("__graft_k").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nMaybe =
        try maybeKeys.count()
        catch { case e: Throwable => maybeKeys.unpersist(false); throw e }
      if (nMaybe > maxMaybeKeys) {
        // Dup-heavy batch: the reverse-semi's broadcast would blow the
        // driver. Anti-join the flagged maybe slice against the corpus
        // digest index instead — the definitely-new majority still
        // bypasses the shuffle. The digest snapshot is not reused; free it.
        maybeKeys.unpersist(false)
        val seenKeys = seen.select(contentDigest(seen, on).as("__graft_k"))
          .distinct()
        keyed.filter(!might(col("__graft_k")))
          .unionByName(keyed.filter(might(col("__graft_k")))
            .join(seenKeys, Seq("__graft_k"), "left_anti"))
          .drop("__graft_k")
      } else {
        // collided materialized eagerly (small: ≤ maybe-set rows) so
        // the maybeKeys snapshot frees NOW rather than leaking per call
        val collided =
          try collidedFrom(maybeKeys).truncated
          finally maybeKeys.unpersist(false)
        broadcastJoin(collided)
      }
    }
  }

  /** Stream-safe [[dedupAgainstBloom]]: on a streaming `incoming`, the
    * batch shape's reverse SEMI (seen probed by a broadcast of
    * stream-derived keys) is illegal — the static side of a
    * stream-static join must stay static. This variant keeps the
    * original anti-join against the full seen digest index but runs it
    * ONLY over the maybe-duplicate slice; the definitely-new majority
    * of every microbatch bypasses the join entirely. Identical keep
    * semantics; works on batch frames too.
    */
  def dedupAgainstBloomPrefilter(incoming: DataFrame, seen: DataFrame,
                                 on: Seq[String],
                                 bloom: org.apache.spark.util.sketch.BloomFilter)
      : DataFrame = {
    requireDigestable(incoming, seen, on)
    require(!incoming.columns.contains("__graft_k"),
      "incoming already has a '__graft_k' column")
    val bloomB = incoming.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((s: String) => bloomB.value.mightContainString(s))
    val keyed = incoming.withColumn("__graft_k", contentDigest(incoming, on))
    val seenKeys = seen.select(contentDigest(seen, on).as("__graft_k")).distinct()
    keyed.filter(!might(col("__graft_k")))
      .unionByName(keyed.filter(might(col("__graft_k")))
        .join(seenKeys, Seq("__graft_k"), "left_anti"))
      .drop("__graft_k")
  }

  /** Normalized-fingerprint column (lower + collapsed whitespace). */
  def fingerprint(textCol: Column): Column = F.fingerprint(textCol)

  /** Per-document sorted distinct shingle-hash sets — computed ONCE and
    * shared by signature generation and the exact-jaccard verify (the
    * round-1 profile showed per-pair re-shingling dominating the verify).
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
                  shingle: Int): DataFrame =
    df.select(col(idCol), F.shingleHashSet(col(textCol), shingle).as("__sh"))

  /** Candidate `(id_a, id_b)` pairs from a PERSISTED exploded
    * `(id, __band, __key)` frame, shared by every banded LSH variant:
    * drop pathological buckets (the skew cap), self-equi-join per
    * bucket, dedup ordered pairs. The returned frame is persisted and
    * materialized so the (much larger) banded input can be released by
    * the caller immediately after.
    */
  private def cappedPairs(banded: DataFrame, idCol: String,
                          maxBucket: Int): DataFrame = {
    val bucketSizes = banded.groupBy("__band", "__key")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket && col("__n") > 1)
    val pruned = banded.join(bucketSizes, Seq("__band", "__key"), "left_semi")
    val a = pruned.select(col(idCol).as("id_a"), col("__band"), col("__key"))
    val b = pruned.select(col(idCol).as("id_b"), col("__band"), col("__key"))
    val pairs = a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .persist()
    pairs.count()
    pairs
  }

  /** Candidate pairs from a `(id, __sh)` sets frame (ideally persisted by
    * the caller): sig → band keys → bucket equi-join, with the skew cap.
    */
  private def candidatesFromSets(sets: DataFrame, idCol: String,
                                 numHashes: Int, bands: Int,
                                 maxBucket: Int,
                                 oph: Boolean = false): DataFrame = {
    // `oph` swaps the k-wise signature kernel (k mixes per shingle)
    // for one-permutation hashing with rotation densification (one mix
    // per shingle) — same banding, same exact verify downstream, ~k×
    // less signature compute. Candidate SETS differ slightly between
    // the kernels; the verified pair set does not (the verify is
    // exact), which is what the d3/d20 gates pin.
    //
    // Regime guidance (measured, SCALE.md): OPH pays off when
    // |shingles| >> numHashes (long documents — the signature pass
    // dominates and drops k-fold). On SHORT documents (|shingles| <
    // numHashes) most bins are empty, densified runs raise the band
    // collision rate, and the extra exact-verify work outweighs the
    // signature saving (d20 ran 1.3-1.8x d3 on the ~60-token gate
    // corpus). Default stays k-wise; flip per-corpus.
    val sig =
      if (oph) F.minhashSigOphFromHashes(col("__sh"), numHashes)
      else F.minhashSigFromHashes(col("__sh"), numHashes)
    val banded = sets
      .select(col(idCol),
        posexplode(F.minhashBands(sig, bands)).as(Seq("__band", "__key")))
      .persist()
    try cappedPairs(banded, idCol, maxBucket)
    finally banded.unpersist()
  }

  /** Candidate near-duplicate pairs via MinHash LSH: `(id_a, id_b)`
    * with id_a < id_b, deduplicated. With `rows = numHashes / bands`
    * hash rows per band, P(candidate | jaccard=j) = 1-(1-j^rows)^bands.
    * Defaults (64, 32 → r=2) make recall at j≥0.8 effectively 1.
    *
    * Returns a MATERIALIZED, persisted pair frame (small: candidates
    * only); the internal exploded band frame is unpersisted before
    * returning. Callers may `unpersist()` the result when done.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 32,
                        shingle: Int = 3, maxBucket: Int = 10000,
                        oph: Boolean = false): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingle).persist()
    try candidatesFromSets(sets, idCol, numHashes, bands, maxBucket, oph)
    finally sets.unpersist()
  }

  /** Near-duplicate pairs with exact-jaccard verification ≥ threshold:
    * `(id_a, id_b, jaccard)`. LSH candidates only, and the verify
    * intersects the SAME precomputed shingle-hash sets the signatures
    * came from — each document is tokenized exactly once. The returned
    * frame is persisted + materialized; callers may `unpersist()` it.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.8, numHashes: Int = 64,
                     bands: Int = 32, shingle: Int = 3,
                     maxBucket: Int = 10000, oph: Boolean = false): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingle).persist()
    try {
      val pairs =
        candidatesFromSets(sets, idCol, numHashes, bands, maxBucket, oph)
      val verified = pairs
        .join(sets.select(col(idCol).as("id_a"), col("__sh").as("__sa")), "id_a")
        .join(sets.select(col(idCol).as("id_b"), col("__sh").as("__sb")), "id_b")
        .withColumn("jaccard", F.jaccardSortedSim(col("__sa"), col("__sb")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .persist()
      verified.count() // materialize before dropping sets + pairs
      pairs.unpersist()
      verified
    } finally sets.unpersist()
  }

  /** One-sided banded candidates (incoming × seen): cap pathological
    * SEEN-side buckets at `maxBucket`, equi-join on (band, key), dedup.
    * Shared by [[nearDupAgainst]] and [[embeddingNearDupAgainst]].
    *
    * The banded seen frame is persisted here — it is read twice (bucket
    * sizes + the capped semi-join), and the banding itself (MinHash
    * signatures / sign sketches) is the dominant compute at corpus
    * scale, so recomputing it per leg would double the most expensive
    * stage. The returned candidate frame is persisted and MATERIALIZED
    * so the banded cache can drop immediately; the caller unpersists it
    * once its verify output is materialized.
    */
  private def oneSidedCandidates(bandedIn: DataFrame, bandedSeen: DataFrame,
                                 maxBucket: Int): DataFrame = {
    val seenB = bandedSeen.persist()
    try {
      val sizes = seenB.groupBy("__band", "__key")
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucket)
        .select("__band", "__key")
      val capped = seenB.join(sizes, Seq("__band", "__key"), "left_semi")
      val cand = bandedIn.join(capped, Seq("__band", "__key"))
        .select("__in_id", "__seen_id").distinct()
        .persist()
      cand.count()
      cand
    } finally seenB.unpersist()
  }

  /** Reusable MinHash signature index over a corpus — the artifact a
    * pipeline PERSISTS between crawl batches so the incremental
    * near-dup pass ([[nearDupAgainstIndex]]) never re-reads, let alone
    * re-shingles, the corpus raw text. One row per document:
    * `(idCol, sig_hashes, band_keys, num_hashes, bands, shingle)` —
    * the sorted shingle-hash set (the exact-jaccard verify side), the
    * banded LSH keys (the candidate side), and the build parameters as
    * constant columns (they RLE away in parquet) so a loaded index
    * carries its own contract: incoming batches are banded with the
    * index's parameters, read off the frame, and a mismatched probe is
    * structurally impossible rather than a silent zero-recall bug.
    *
    * Lifecycle: build once over the full corpus (`write.parquet`),
    * then per ingested batch append the KEPT rows' index entries
    * (`buildMinhashIndex(keptBatch, …).write.mode("append")`) — the
    * index grows with the corpus and each batch pays signature cost
    * only for itself; SignatureIndexSpec pins append-then-probe ≡
    * one-shot build. At 10 B documents the index is ~|corpus| rows of
    * a few hundred bytes — document-count scale, not corpus-byte
    * scale.
    *
    * COMPACTION: every appended batch adds its own small parquet
    * files, and after thousands of batches the probe-side scan goes
    * file-listing-bound (plus per-file footer reads). Run
    * [[compactIndex]] periodically — it rewrites to ~128 MB files and
    * swaps the directory in place. Row content is
    * position-independent (the equivalence spec compares entries, not
    * layout), so compaction never changes verdicts.
    */
  def buildMinhashIndex(corpus: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 32,
                        shingle: Int = 3): DataFrame =
    shingleSets(corpus, idCol, textCol, shingle)
      .select(col(idCol), col("__sh").as("sig_hashes"),
        F.minhashBands(
          F.minhashSigFromHashes(col("__sh"), numHashes), bands)
          .as("band_keys"),
        lit(numHashes).as("num_hashes"), lit(bands).as("bands"),
        lit(shingle).as("shingle"))

  /** Incremental NEAR-duplicate dedup against a PRE-BUILT signature
    * index ([[buildMinhashIndex]], usually loaded from parquet): drop
    * `incoming` rows within `threshold` jaccard of ANY indexed
    * document. The corpus raw text is never touched — the index frame
    * does not even carry it — which is the 100-TB difference between
    * paying signature compute once per corpus and once per crawl.
    * Shingle/banding parameters come FROM the index (one narrow
    * min/max probe that also REQUIRES them uniform — a mixed-parameter
    * index fails loud instead of silently losing recall); an empty
    * index keeps everything.
    *
    * CONTRACT: `idCol` must be non-null and unique within `incoming`
    * (same as [[exact]]): the final anti-join is by id, so a NULL id
    * never matches its own loser row, and duplicate incoming ids drop
    * together if either matches. Index-side ids only label candidates
    * and carry no constraint.
    */
  def nearDupAgainstIndex(incoming: DataFrame, index: DataFrame,
                          idCol: String, textCol: String,
                          threshold: Double = 0.8,
                          maxBucket: Int = 10000): DataFrame = {
    for (c <- Seq(idCol, "sig_hashes", "band_keys", "num_hashes", "bands",
        "shingle"))
      require(index.columns.contains(c),
        s"not a minhash signature index: missing column '$c'")
    val params = uniformParams(index, Seq("num_hashes", "bands", "shingle"))
    if (params.isEmpty) return incoming // empty corpus: nothing seen yet
    val Seq(numHashes, bands, shingle) = params.get
    nearDupAgainstCore(incoming, index, idCol, textCol, threshold,
      numHashes, bands, shingle, maxBucket)
  }

  /** Incremental NEAR-duplicate dedup from raw frames: builds the seen
    * side's [[buildMinhashIndex]] in-flight (persisted for the call's
    * two reads), then runs the index path. Only the incoming slice is
    * deduplicated; the seen corpus NEVER self-joins. For repeated
    * batches against the same corpus, build the index once and call
    * [[nearDupAgainstIndex]] — this overload re-signatures `seen` on
    * every invocation.
    *
    * Recall follows the [[minhashCandidates]] band math:
    * 1-(1-j^rows)^bands, effectively 1 at j ≥ 0.8 with the defaults.
    * Same `idCol` contract as [[nearDupAgainstIndex]].
    */
  def nearDupAgainst(incoming: DataFrame, seen: DataFrame, idCol: String,
                     textCol: String, threshold: Double = 0.8,
                     numHashes: Int = 64, bands: Int = 32,
                     shingle: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val idx = buildMinhashIndex(seen, idCol, textCol, numHashes, bands,
      shingle).persist()
    // Core materializes the loser set eagerly (truncated), so the index
    // cache is safe to drop before the returned lazy frame runs.
    try nearDupAgainstCore(incoming, idx, idCol, textCol, threshold,
      numHashes, bands, shingle, maxBucket)
    finally idx.unpersist()
  }

  /** Read build-parameter columns off a signature index, REQUIRING
    * them uniform: `None` for an empty index, the single value per
    * column otherwise. An index whose batches were appended under
    * different parameters would band incoming rows with one parameter
    * set against keys built with another — band keys never collide for
    * the mismatched slice and its duplicates pass through silently, so
    * this fails loud instead of probing an arbitrary head row. One
    * narrow min/max aggregate over constant RLE'd parquet columns —
    * cheap next to the probe join that follows.
    */
  private def uniformParams(index: DataFrame,
                            cols: Seq[String]): Option[Seq[Int]] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val row = index.agg(aggs.head, aggs.tail: _*).head()
    if (row.isNullAt(0)) return None // min of an empty frame is NULL
    Some(cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (row.getInt(2 * i), row.getInt(2 * i + 1))
      require(lo == hi,
        s"signature index is not parameter-uniform: '$c' ranges " +
          s"[$lo, $hi] — batches were appended with different build " +
          "parameters; rebuild or split the index")
      lo
    })
  }

  /** Shared index-probe shape: band incoming with the index's
    * parameters, capped one-sided candidates, exact-jaccard verify on
    * the stored sets, one left-anti join out.
    */
  private def nearDupAgainstCore(incoming: DataFrame, index: DataFrame,
                                 idCol: String, textCol: String,
                                 threshold: Double, numHashes: Int,
                                 bands: Int, shingle: Int,
                                 maxBucket: Int): DataFrame = {
    val inSets = shingleSets(incoming, idCol, textCol, shingle).persist()
    try {
      val bandedIn = inSets.select(
        col(idCol).as("__in_id"),
        posexplode(F.minhashBands(
          F.minhashSigFromHashes(col("__sh"), numHashes), bands))
          .as(Seq("__band", "__key")))
      val bandedSeen = index.select(
        col(idCol).as("__seen_id"),
        posexplode(col("band_keys")).as(Seq("__band", "__key")))
      val cand = oneSidedCandidates(bandedIn, bandedSeen, maxBucket)
      val matched = cand
        .join(inSets.select(col(idCol).as("__in_id"), col("__sh").as("__sa")),
          "__in_id")
        .join(index.select(col(idCol).as("__seen_id"),
          col("sig_hashes").as("__sb")), "__seen_id")
        .filter(F.jaccardSortedSim(col("__sa"), col("__sb")) >= threshold)
        .select(col("__in_id").as(idCol)).distinct()
        .truncated // materialize the (tiny) loser set before the caches drop
      cand.unpersist()
      incoming.join(matched, Seq(idCol), "left_anti")
    } finally inSets.unpersist()
  }

  /** EXACT n-gram-Jaccard near-duplicate pairs via a PREFIX-FILTERED
    * inverted shingle index (the AllPairs/ppjoin candidate scheme):
    * under the global sorted-hash order, any pair with jaccard ≥ t must
    * share an element among each side's first `|S| - ⌈t·|S|⌉ + 1`
    * hashes (pigeonhole on the smallest common element), so only those
    * PREFIXES are indexed — at t = 0.8 that is ~20% of the index and
    * quadratically fewer candidate collisions than a full inverted
    * index. Candidates additionally pass the lossless size-ratio filter
    * (j ≥ t forces |A|/|B| ≥ t) before the exact-jaccard verify on the
    * precomputed sets.
    *
    * Recall is exactly 1, modulo the `maxDocFreq` cap, which drops
    * prefix hashes present in more than that many documents from
    * candidate generation (ubiquitous shingles pair everything with
    * everything — the skew killer). A qualifying pair escapes detection
    * only if EVERY shared prefix shingle is ubiquitous — near-boilerplate
    * corpora; run exact/fingerprint dedup first for those. Versus
    * [[nearDuplicates]]: exact instead of probabilistic recall and no
    * signature cost, but candidate volume tracks prefix co-occurrence
    * instead of LSH band collisions — prefer MinHash at very large N.
    */
  def jaccardNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.8, shingle: Int = 3,
                            maxDocFreq: Int = 1000): DataFrame = {
    // threshold > 1 drives prefixLen non-positive (a runtime slice()
    // error mid-job, after the shingle sets were already computed);
    // threshold <= 0 silently indexes EVERY shingle — the quadratic
    // candidate blowup the prefix filter exists to prevent.
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    val sets = shingleSets(df, idCol, textCol, shingle).persist()
    try {
      val sz = size(col("__sh"))
      val prefixLen = (sz - ceil(sz * threshold).cast("int") + 1)
      val inverted = sets.select(col(idCol), sz.as("__sz"),
        explode(slice(col("__sh"), lit(1), prefixLen)).as("__h"))
      val joinable = inverted.groupBy("__h").agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxDocFreq && col("__n") > 1)
      val pruned = inverted.join(joinable, Seq("__h"), "left_semi")
      val pairs = pruned
        .select(col(idCol).as("id_a"), col("__sz").as("__sza"), col("__h"))
        .join(pruned.select(col(idCol).as("id_b"), col("__sz").as("__szb"),
          col("__h")), Seq("__h"))
        .filter(col("id_a") < col("id_b") &&
          col("__sza") >= col("__szb") * threshold &&
          col("__szb") >= col("__sza") * threshold)
        .select("id_a", "id_b").distinct()
        .persist()
      pairs.count()
      val verified = pairs
        .join(sets.select(col(idCol).as("id_a"), col("__sh").as("__sa")), "id_a")
        .join(sets.select(col(idCol).as("id_b"), col("__sh").as("__sb")), "id_b")
        .withColumn("jaccard", F.jaccardSortedSim(col("__sa"), col("__sb")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .persist()
      verified.count()
      pairs.unpersist()
      verified
    } finally sets.unpersist()
  }

  /** Duplicate-group labels by transitive closure over a verified pair
    * frame `(idA, idB)`: every id that appears in a pair is labeled
    * with the global MINIMUM id reachable through the pair graph —
    * iterative min-label propagation, each round one equi-join + a
    * map-side-partial `min` aggregate, convergence-checked. Returns a
    * checkpoint-backed `(id, comp)` frame (ids from pairs only —
    * singletons have no group); no unpersist contract, the backing RDD
    * frees on GC.
    *
    * Rounds needed = graph diameter. Near-duplicate clusters are
    * near-cliques (diameter 2–3 in practice) so this converges in a
    * handful of rounds; `maxIters` bounds adversarial chain graphs,
    * and hitting it raises rather than returning half-merged groups.
    * Shuffle per round is keyed on id — the same partitioning every
    * round, so AQE coalesces and no round re-keys. Each round is
    * eagerly checkpointed ([[Checkpoints.truncate]] — reliable when a
    * checkpoint dir is set, local otherwise): without truncation the
    * plan embeds TWO copies of the previous round's plan (once in the
    * carry-over union arm, once under the join) and grows 2^rounds —
    * the mandatory pattern for any iterative DataFrame algorithm.
    *
    * Convergence probe: the self arm of the union is tagged, so the
    * SAME per-id aggregate that computes the new label also carries the
    * previous one (`min(when(self, comp))` — ids are unique, exactly
    * one self row). Changed-ness then rides the round's checkpoint
    * materialization as an observe() accumulator — not an equi-join of
    * consecutive label frames (which would roughly double per-round
    * shuffle cost at scale) and not even a dedicated count job over
    * the checkpointed blocks.
    */
  def duplicateGroups(pairs: DataFrame, idA: String = "id_a",
                      idB: String = "id_b", maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().persist()
    try {
      // One Rounds tracker per invocation: on the reliable-checkpoint
      // path it deletes round N-1's DFS files once round N is
      // materialized, so a long propagation never accumulates one full
      // label-frame copy per round in the checkpoint dir.
      val rounds = new Checkpoints.Rounds
      var labels = rounds.truncate(
        edges.select(col("src").as("id")).distinct()
          .withColumn("comp", col("id")))
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        val viaNeighbor = edges
          .join(labels.select(col("id").as("src"), col("comp")), "src")
          .select(col("dst").as("id"), col("comp"), lit(false).as("__self"))
        // The changed-count rides the checkpoint materialization as an
        // observe() accumulator (firing-on-truncate proven in OpsSpec)
        // — the rows already stream through the checkpoint action, so
        // the probe costs zero extra jobs instead of one count job per
        // round over the checkpointed blocks.
        val roundObs = org.apache.spark.sql.Observation()
        val next = rounds.truncate(labels.withColumn("__self", lit(true))
          .unionByName(viaNeighbor)
          .groupBy("id")
          .agg(min("comp").as("comp"),
            min(when(col("__self"), col("comp"))).as("__prev"))
          .observe(roundObs, coalesce(
            sum(when(col("comp") =!= col("__prev"), 1L).otherwise(0L)),
            lit(0L)).as("__changed")))
        val changed = roundObs.get("__changed").asInstanceOf[Long]
        labels = next.select("id", "comp")
        converged = changed == 0
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"duplicateGroups did not converge in $maxIters rounds — " +
            "pathological chain graph; raise maxIters")
      labels
    } finally edges.unpersist()
  }

  /** Collapse duplicate groups to ONE representative row each: within
    * every component of `groups` ([[duplicateGroups]]' `(id, comp)`
    * output), keep the `df` row maximizing `(scoreCol, idCol)` — the
    * C4-style "keep the best copy" terminus (longest text, highest
    * quality score, ...); the id tiebreak makes re-runs deterministic,
    * and NULL scores rank below every non-NULL score. Rows in no group
    * keep themselves. Returns the kept rows of `df` unchanged.
    *
    * Shape: `groups` holds only duplicated ids — small next to the
    * corpus — so the winner-per-component `max_by` aggregate runs on
    * the grouped slice alone, and the corpus-wide work is one
    * left-anti join against the (even smaller) loser id set. The full
    * frame never shuffles.
    *
    * CONTRACT: `idCol` non-null and unique (the [[exact]] contract).
    */
  def keepRepresentative(df: DataFrame, groups: DataFrame, idCol: String,
                         scoreCol: String, memberCol: String = "id",
                         compCol: String = "comp"): DataFrame = {
    for (c <- Seq(idCol, scoreCol))
      require(df.columns.contains(c), s"df needs column '$c'")
    for (c <- Seq(memberCol, compCol))
      require(groups.columns.contains(c), s"groups needs column '$c'")
    for (c <- Seq("__graft_mid", "__graft_comp", "__graft_win"))
      require(!df.columns.contains(c),
        s"input already has a reserved '$c' column")
    val member = groups.select(col(memberCol).as("__graft_mid"),
      col(compCol).as("__graft_comp"))
    val scored = df.select(col(idCol), col(scoreCol))
      .join(member, col(idCol) === col("__graft_mid"))
    val winners = scored.groupBy("__graft_comp")
      .agg(max_by(col(idCol), struct(col(scoreCol), col(idCol)))
        .as("__graft_win"))
      .select(col("__graft_win").as("__graft_mid"))
    val losers = member.select("__graft_mid")
      .join(winners, Seq("__graft_mid"), "left_anti")
    df.join(losers, col(idCol) === col("__graft_mid"), "left_anti")
  }

  /** Remove near-duplicates, keeping each group's smallest id.
    *
    * Greedy (default): a row is dropped iff it has a verified neighbor
    * with a smaller id — one LSH pass, no iteration. A node whose
    * neighbors are all LARGER survives even when its transitive
    * cluster contains a smaller id (a~c, b~c with a<b<c keeps both a
    * AND b).
    *
    * `transitive = true`: clusters are the connected components of the
    * verified pair graph ([[duplicateGroups]]); exactly the global-min
    * id of each cluster survives — the standard curation-pipeline
    * semantics, worth the extra O(diameter) rounds.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8,
                         maxBucket: Int = 10000,
                         transitive: Boolean = false): DataFrame = {
    val verified = nearDuplicates(df, idCol, textCol, threshold,
      maxBucket = maxBucket)
    // Snapshot the (id-only, tiny) loser set via an eager
    // localCheckpoint so the large verified pair cache can be released
    // immediately — otherwise the persisted frame returned by
    // nearDuplicates leaks with no caller-reachable handle. Unlike a
    // persist, the checkpoint leaves no CacheManager entry behind: its
    // backing RDD frees on GC, so long-lived sessions (Verify/Bench
    // run 60+ queries in one JVM) accumulate nothing.
    val losers = (
      if (transitive) {
        val groups = duplicateGroups(verified)
        val l = groups.filter(col("id") =!= col("comp"))
          .select(col("id").as(idCol)).truncated
        // The loser set is materialized; the label frame's final-round
        // reliable-checkpoint files (cluster path) are now dead weight —
        // reclaim them instead of leaving one full copy per invocation
        // in the checkpoint dir.
        Checkpoints.release(groups)
        l
      } else
        verified.select(col("id_b").as(idCol)).distinct().truncated)
    verified.unpersist()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): partition the corpus into clusters by nearest
    * `centroids` (train with [[Similarity.kmeans]] or pass any small
    * `(cent_id, cent_emb)` frame), compare embeddings pairwise ONLY
    * within each cluster, and drop every vector that has a smaller-id
    * cluster-mate with cosine ≥ `threshold` — the greedy min-id-keeper
    * convention of [[dropNearDuplicates]]. Returns the kept rows with
    * the input schema.
    *
    * Shape: one assignment scan (centroids broadcast — the
    * [[Similarity.ivfAssign]] crossJoin, waived in the plan audit),
    * then a bucket-keyed self equi-join. The within-cluster pairwise
    * compare is quadratic in cluster size BY DESIGN — that is the
    * SemDeDup trade: |C| controls the quadratic term, so size the
    * centroid count to hold clusters near N/|C| ≈ 10^3..10^4 at 100 TB
    * (train on a sample; assignment stays one full scan). A cluster
    * the size of the corpus (|C| = 1) degenerates to all-pairs — pick
    * |C|, don't let it pick you.
    *
    * Known SemDeDup approximation, inherited deliberately: a near-dup
    * pair STRADDLING two clusters is not compared and both survive.
    * Identical vectors always share a cluster (identical scores,
    * same min-id argmax), so exact copies are always caught.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, threshold: Double = 0.95): DataFrame = {
    // Fail loud: an empty centroid frame would assign nothing and
    // silently "keep everything" — the caller's clustering went wrong,
    // not the corpus. Centroids are small by contract; isEmpty is a
    // limit-1 probe.
    require(!centroids.isEmpty,
      "semanticDedup needs a non-empty (cent_id, cent_emb) centroid frame")
    val assigned = Similarity.ivfAssign(
      df.select(col(idCol), col(vecCol)), centroids, idCol, vecCol)
    val a = assigned.select(col(idCol).as("__id_a"), col(vecCol).as("__va"),
      col("bucket"))
    val b = assigned.select(col(idCol).as("__id_b"), col(vecCol).as("__vb"),
      col("bucket"))
    val losers = a.join(b, "bucket")
      .filter(col("__id_a") < col("__id_b") &&
        F.cosineSim(col("__va"), col("__vb")) >= threshold)
      .select(col("__id_b").as(idCol)).distinct()
      .truncated // tiny id set; frees the join inputs from the lineage
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash near-duplicate pairs within `maxHamming` bits over the
    * 60-bit sha-256-based sketch, banded into 4×15-bit keys (hamming
    * ≤ 3 is guaranteed by pigeonhole; up to the cap is found when any
    * band collides).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val withSh = df.select(col(idCol), F.simhash(col(textCol)).as("__sh"))
    val banded0 = withSh.select(col(idCol), col("__sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("__sh"), i * 15).bitwiseAND(lit(0x7fffL))): _*))
        .as(Seq("__band", "__key")))
    // Optional skew cap, same contract as minhashCandidates' maxBucket:
    // a degenerate band bucket (~1M identical docs → all 4 bands equal)
    // would emit a quadratic pair blowup on one reducer; capped buckets
    // are DROPPED — run exact dedup first, as the near-dup family
    // documents. Default keeps the historical uncapped (oracle-exact)
    // behavior.
    val banded =
      if (maxBucket == Int.MaxValue) banded0
      else {
        val ok = banded0.groupBy("__band", "__key")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBucket)
        banded0.join(ok, Seq("__band", "__key"), "left_semi")
      }
    val a = banded.select(col(idCol).as("id_a"), col("__sh").as("__sha"),
      col("__band"), col("__key"))
    val b = banded.select(col(idCol).as("id_b"), col("__sh").as("__shb"),
      col("__band"), col("__key"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__sha", "__shb").distinct()
      .withColumn("hamming", F.hamming(col("__sha"), col("__shb")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Reusable sign-sketch index over a vector corpus — the embedding
    * sibling of [[buildMinhashIndex]], persisted between crawls so
    * [[embeddingNearDupAgainstIndex]] never re-sketches the corpus
    * (the planes×dim projection is the dominant compute). One row per
    * vector: `(idCol, vecCol, band_keys, planes, bands)` — the vector
    * rides along because the exact-cosine verify needs it; parquet
    * stores it once and column pruning skips it on the candidate leg.
    * Append each ingested batch's kept rows, same lifecycle as the
    * MinHash index.
    */
  def buildEmbeddingIndex(corpus: DataFrame, idCol: String, vecCol: String,
                          planes: Int = 128, bands: Int = 8): DataFrame =
    Par.spread(corpus, idCol).select(col(idCol), col(vecCol),
      F.signBandKeys(col(vecCol), planes, bands).as("band_keys"),
      lit(planes).as("planes"), lit(bands).as("bands"))

  /** Candidate probability of the banded-MinHash scheme: a pair with
    * true Jaccard `s` collides in at least one band with probability
    * `1 − (1 − s^r)^b`, r = numHashes/bands — the standard LSH S-curve
    * (Mining of Massive Datasets §3.4, public knowledge).
    */
  def lshCandidateProbability(s: Double, numHashes: Int,
                              bands: Int): Double = {
    require(s >= 0 && s <= 1, s"jaccard must be in [0,1]: $s")
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val r = numHashes / bands
    1.0 - math.pow(1.0 - math.pow(s, r), bands)
  }

  /** Pick the band count whose S-curve threshold `(1/b)^(1/r)` — the
    * similarity where candidate probability crosses ~0.5 — sits
    * closest to the caller's dedup `threshold`. Use it to size
    * [[buildMinhashIndex]]/[[nearDupAgainst]] instead of guessing:
    * too many bands wastes shuffle volume on sub-threshold candidates
    * (the verify stage re-filters them, but each one travels), too few
    * silently loses recall near the threshold. Ties prefer MORE bands
    * (recall over shuffle — the verify stage makes false positives
    * cheap, false negatives are unrecoverable).
    */
  def lshBandsFor(numHashes: Int, threshold: Double): Int = {
    require(numHashes > 0, s"numHashes must be positive: $numHashes")
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1): $threshold")
    val divisors = (1 to numHashes).filter(numHashes % _ == 0)
    divisors.minBy { b =>
      val mid = math.pow(1.0 / b, b.toDouble / numHashes)
      (math.abs(mid - threshold), -b): (Double, Int)
    }
  }

  final case class CompactStats(rows: Long, filesBefore: Int,
                                filesAfter: Int, bytes: Long)

  /** Compact a persisted signature index (MinHash or embedding — any
    * append-grown parquet directory whose `paramCols` must stay
    * uniform): rewrite to ~`targetFileBytes` files and swap the
    * directory in place. This is the periodic maintenance the
    * [[buildMinhashIndex]] lifecycle note prescribes — after thousands
    * of per-batch appends the probe scan goes file-listing- and
    * footer-bound; row content is position-independent, so compaction
    * never changes verdicts (SignatureIndexSpec pins probe-equivalence
    * across it).
    *
    * The parameter-uniformity guard runs BEFORE the rewrite: a drifted
    * index fails here, at maintenance time, rather than at the next
    * probe. Swap is rename-based (`path` → `path.compact.old`, tmp →
    * `path`, drop old): each rename is atomic on HDFS-like stores; a
    * crash between them leaves the data intact under one of the two
    * names, never half-mixed. Readers concurrent with the swap should
    * be quiesced, as with any parquet-directory rewrite.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   paramCols: Seq[String],
                   targetFileBytes: Long = 128L << 20): CompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(fsPath), s"no index directory at $path")
    val dataFiles = fs.listStatus(fsPath)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val df = spark.read.parquet(path)
    uniformParams(df, paramCols) // fail loud on drift before any I/O
    val parts = math.max(1,
      math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact.old")
    if (fs.exists(tmp)) fs.delete(tmp, true) // leftover of a dead run
    df.repartition(parts).write.parquet(tmp.toString)
    // footer-metadata count — no data scan
    val rows = spark.read.parquet(tmp.toString).count()
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(fsPath, old), s"could not stage $path aside")
    require(fs.rename(tmp, fsPath), s"could not swap compacted index " +
      s"into $path — original preserved at $old")
    fs.delete(old, true)
    val after = fs.listStatus(fsPath)
      .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    CompactStats(rows, dataFiles.length, after, totalBytes)
  }

  /** Incremental embedding-cosine dedup against a PRE-BUILT
    * [[buildEmbeddingIndex]]: drop `incoming` vectors within
    * `threshold` cosine of ANY indexed vector. Sketch parameters come
    * from the index (uniformity-checked, as in [[nearDupAgainstIndex]]);
    * an empty index keeps everything.
    * Same `idCol` contract as [[nearDupAgainstIndex]].
    */
  def embeddingNearDupAgainstIndex(incoming: DataFrame, index: DataFrame,
                                   idCol: String, vecCol: String,
                                   threshold: Double = 0.99,
                                   maxBucket: Int = 10000): DataFrame = {
    for (c <- Seq(idCol, vecCol, "band_keys", "planes", "bands"))
      require(index.columns.contains(c),
        s"not an embedding signature index: missing column '$c'")
    val params = uniformParams(index, Seq("planes", "bands"))
    if (params.isEmpty) return incoming
    val Seq(planes, bands) = params.get
    embeddingAgainstCore(incoming, index, idCol, vecCol, threshold,
      planes, bands, maxBucket)
  }

  /** Incremental embedding-cosine dedup from raw frames: drop
    * `incoming` vectors within `threshold` cosine of ANY `seen` vector
    * — completes the incremental family ([[dedupAgainst]] exact,
    * [[nearDupAgainst]] text-jaccard) for the embedding modality. The
    * band join is incoming × seen, so the corpus never self-pairs and
    * only the new slice shuffles. Builds the seen side's sketch
    * in-flight — for repeated batches persist [[buildEmbeddingIndex]]
    * once and call [[embeddingNearDupAgainstIndex]] instead.
    *
    * CONTRACT: `idCol` non-null and unique within `incoming`, as in
    * [[nearDupAgainst]].
    */
  def embeddingNearDupAgainst(incoming: DataFrame, seen: DataFrame,
                              idCol: String, vecCol: String,
                              threshold: Double = 0.99, planes: Int = 128,
                              bands: Int = 8, maxBucket: Int = 10000): DataFrame = {
    // The persist is load-bearing beyond the two-reads economy (banded
    // leg + cosine verify): an UN-materialized index is a Project whose
    // `band_keys` alias Catalyst substitutes when it pushes the
    // Generate's inferred `size(band_keys) > 0` filter down through it
    // — re-evaluating the planes×dim sketch UDF per filter conjunct,
    // 3× per corpus row (measured 1.7× wall on the whole operator).
    // InferFiltersFromGenerate skips expensive generator inputs, but
    // alias substitution through an in-flight Project reintroduces
    // them; the cache boundary is what keeps the sketch single-pass.
    val idx = buildEmbeddingIndex(seen, idCol, vecCol, planes, bands)
      .persist()
    try embeddingAgainstCore(incoming, idx, idCol, vecCol, threshold,
      planes, bands, maxBucket)
    finally idx.unpersist()
  }

  private def embeddingAgainstCore(incoming: DataFrame, index: DataFrame,
                                   idCol: String, vecCol: String,
                                   threshold: Double, planes: Int,
                                   bands: Int, maxBucket: Int): DataFrame = {
    val bandedIn = Par.spread(incoming, idCol).select(
      col(idCol).as("__in_id"),
      posexplode(F.signBandKeys(col(vecCol), planes, bands))
        .as(Seq("__band", "__key")))
    val bandedSeen = index.select(
      col(idCol).as("__seen_id"),
      posexplode(col("band_keys")).as(Seq("__band", "__key")))
    val cand = oneSidedCandidates(bandedIn, bandedSeen, maxBucket)
    val matched = cand
      .join(incoming.select(col(idCol).as("__in_id"), col(vecCol).as("__va")),
        "__in_id")
      .join(index.select(col(idCol).as("__seen_id"), col(vecCol).as("__vb")),
        "__seen_id")
      .filter(F.cosineSim(col("__va"), col("__vb")) >= threshold)
      .select(col("__in_id").as(idCol)).distinct()
      .truncated // materialize the small loser set once
    cand.unpersist()
    incoming.join(matched, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs ≥ threshold, bucketed by a
    * random-hyperplane sign sketch: `planes` sign bits → `bands` keys →
    * band equi-join → exact cosine verify on candidates only. The plan
    * is a shuffled equi-join, never a BroadcastNestedLoopJoin cartesian.
    *
    * Recall: identical vectors share every band (p = 1); at the default
    * 128 planes × 8 bands (16-bit keys), pairs at exactly cos = 0.99
    * (θ ≈ 8.1°) collide with p ≈ 0.995, and tighter pairs approach 1.
    * For recall-critical runs at looser thresholds raise `bands` (more,
    * shorter keys); for huge N raise `planes` (longer keys, fewer
    * random collisions). The `maxBucket` skew cap drops degenerate
    * buckets, same contract as [[minhashCandidates]].
    */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
                              threshold: Double = 0.99, planes: Int = 128,
                              bands: Int = 8, maxBucket: Int = 10000): DataFrame = {
    val banded = Par.spread(df, idCol).select(col(idCol),
      posexplode(F.signBandKeys(col(vecCol), planes, bands))
        .as(Seq("__band", "__key")))
      .persist()
    try {
      val pairs = cappedPairs(banded, idCol, maxBucket)
      val vecs = df.select(col(idCol), col(vecCol))
      val verified = pairs
        .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
        .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
        .withColumn("cos", F.cosineSim(col("__va"), col("__vb")))
        .filter(col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .persist()
      verified.count() // materialize so the pair cache can be freed now
      pairs.unpersist()
      verified
    } finally banded.unpersist()
  }
}
