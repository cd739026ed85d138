package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Dataset-curation operators for training-data pipelines: deterministic
  * split assignment, stratified sampling, and PII redaction. All are
  * reproducible across runs, engines and executors — assignment derives
  * from content hashes, never from RNG state or row order.
  */
object Curation {

  /** Deterministic split bucket in [0, buckets): unsigned
    * sha256-first-8-bytes of the stringified id, mod buckets (the same
    * stable hash as the label privacy bucket — see
    * [[graft.functions.LabelHashBucket]]). A row's split NEVER changes
    * when the dataset grows, shrinks or reorders — the property that
    * keeps train/test membership stable across pipeline re-runs (a
    * random split re-shuffles contamination into the test set on every
    * run).
    */
  def splitBucket(idCol: Column, buckets: Int = 100): Column =
    F.labelBucket(idCol.cast("string"), buckets)

  /** Assign train/val/test by hash bucket: [0,trainPct) → train,
    * [trainPct,trainPct+valPct) → val, rest → test. One codegen'd
    * column expression — no shuffle, no RNG.
    *
    * LEAKAGE-SAFE (group-consistent) splits fall out of the key
    * choice: pass the GROUP column (site host, author, thread id) as
    * `idCol` and every document of one group lands in the SAME split
    * — near-duplicates inside a site can then never straddle
    * train/test (the c31 gate pins this property).
    *
    * Rows whose id cannot be keyed (null / blank / "nan" — the hash's
    * -1 sentinel) get a NULL split: silently pooling them into any one
    * split would contaminate it with un-keyable rows, so the caller
    * must route or drop them explicitly.
    */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
                valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = splitBucket(col(idCol))
    df.withColumn("split",
      when(b < 0, lit(null).cast("string"))
        .when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic per-stratum sample: the k rows whose sha256(id) sorts
    * lowest within each stratum (ties broken by id). Hash-ordering makes
    * the sample stable under reordering and incremental growth — a row
    * only leaves the sample when a lower-hashed row arrives.
    *
    * Scale shape: a LOSSLESS pre-prune bounds the within-stratum window
    * sort. A 16-bit hash-prefix histogram per stratum (one aggregation
    * with map-side partial combine; ≤ 65536 tiny rows per stratum)
    * picks the smallest prefix whose cumulative count reaches k, and
    * only rows at or below that prefix reach the sort — expected
    * k + n/65536 rows per stratum instead of n, so a degenerate
    * billion-row stratum sorts ~k + 15k rows, not 10^9. Losslessness:
    * the true k lowest hashes all carry prefixes ≤ the crossing prefix
    * by construction, and strata smaller than k keep every row.
    */
  def samplePerStratum(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int): DataFrame = {
    // Determinism requires a total order: ids must be UNIQUE (duplicate
    // ids tie on (hash, id) and row_number breaks the tie by partition
    // order). Null ids are excluded — they cannot be hash-ranked, and
    // Spark's nulls-first ascending sort would let them claim sample
    // slots nondeterministically.
    val rank = "__graft_sample_rank"
    val reserved = Seq(rank, "__graft_pfx", "__graft_s", "__graft_pmax")
    reserved.foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    val h = sha2(col(idCol).cast("string"), 256)
    val base = df.filter(col(idCol).isNotNull)
    val pfx = conv(substring(h, 1, 4), 16, 10).cast("int")
    val cum = Window.partitionBy("__graft_s").orderBy("__graft_pfx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thresholds = base
      .groupBy(col(stratumCol).as("__graft_s"), pfx.as("__graft_pfx"))
      .agg(count(lit(1)).as("__graft_n"))
      .withColumn("__graft_cum", sum("__graft_n").over(cum))
      // keep prefixes whose PRECEDING cumulative count is still < k:
      // the largest of these is the bucket where the k-th row lands
      .filter(col("__graft_cum") - col("__graft_n") < k)
      .groupBy("__graft_s").agg(max("__graft_pfx").as("__graft_pmax"))
    val pruned = base
      // null-safe match: a NULL stratum is a legitimate window
      // partition and must survive the prune like any other
      .join(thresholds, col(stratumCol) <=> col("__graft_s") &&
        pfx <= col("__graft_pmax"))
      .drop("__graft_s", "__graft_pmax")
    val w = Window.partitionBy(stratumCol).orderBy(h, col(idCol))
    pruned
      .withColumn(rank, row_number().over(w))
      .filter(col(rank) <= k)
      .drop(rank)
  }

  /** Benchmark decontamination: documents sharing any word `shingle`-gram
    * with a probe corpus (an eval/test set) — the pre-training hygiene
    * pass that keeps benchmark answers out of the training data.
    * Returns `(idCol, n_hits)` for contaminated documents only, where
    * n_hits counts the document's DISTINCT shingles that appear
    * anywhere in the probe set.
    *
    * Shape: distinct probe shingle hashes (small — eval sets are tiny
    * next to the corpus; AQE broadcasts the build side) equi-joined
    * against the corpus's exploded shingle-hash sets. One corpus scan,
    * shuffle bounded by matches.
    */
  /** Drop rows whose host matches a DOMAIN BLOCKLIST — the UT1-style
    * hygiene pass every web-crawl curation pipeline runs before
    * quality/dedup work (CCNet, RefinedWeb). Match rule: a row is
    * blocked when its host, or ANY dotted suffix of it
    * ([[UrlOps.hostSuffixChain]]), equals a blocklist entry — so the
    * entry `casino.example` blocks `www.casino.example` without the
    * list enumerating subdomains.
    *
    * Shape for 100 TB: data rows NEVER shuffle. The distinct hosts
    * (web-scale: ~1e7–1e8, orders of magnitude below row count) are the
    * only thing aggregated; their suffix chains explode on that small
    * frame, semi-join the blocklist (a few million entries — AQE
    * broadcasts it when it fits), and the resulting blocked-host set —
    * bounded by the blocklist size — broadcasts back as the build side
    * of a left-anti join on the scan.
    *
    * @param blocklist one string column `blockedCol` of lowercase
    *                  domains (no scheme, no port)
    * @param broadcastBlocked hint the blocked-host set as broadcast for
    *                  the final anti-join (default). Its size is
    *                  bounded by the distinct hosts that MATCH — pass
    *                  false only when the corpus is subdomain-farm
    *                  heavy (millions of random hosts under blocked
    *                  domains), trading a host-keyed shuffle of the
    *                  data rows for bounded memory.
    */
  def dropBlockedDomains(df: DataFrame, hostCol: String,
                         blocklist: DataFrame,
                         blockedCol: String = "domain",
                         broadcastBlocked: Boolean = true): DataFrame = {
    val flagged = withBlockedDomainFlag(df, hostCol, blocklist, blockedCol,
      broadcastBlocked)
    flagged.filter(!col("__graft_blocked")).drop("__graft_blocked")
  }

  /** [[dropBlockedDomains]] as a FLAG instead of a filter: the input
    * plus boolean `__graft_blocked`. For pipelines that fold the
    * blocklist verdict into an existing single-scan aggregate (keep
    * count + drop count from one pass) rather than paying a dedicated
    * pre-filter job — [[CurationPipeline]]'s shape. Same matching rule
    * and same build-side bounds as the filter form, which delegates
    * here.
    */
  def withBlockedDomainFlag(df: DataFrame, hostCol: String,
                            blocklist: DataFrame,
                            blockedCol: String = "domain",
                            broadcastBlocked: Boolean = true): DataFrame = {
    // the helper frame derives from df, so its host column must not
    // shadow one already on df (resolution would be ambiguous — the
    // CorpusStats reserved-name rule)
    val h = "__graft_blocked_host"
    for (r <- Seq(h, "__graft_blocked"))
      require(!df.columns.contains(r),
        s"withBlockedDomainFlag: input already has a column named $r")
    val blockedHosts = df.select(lower(col(hostCol)).as(h)).distinct()
      .select(col(h), explode(UrlOps.hostSuffixChain(col(h))).as("__sfx"))
      .join(blocklist.select(col(blockedCol).as("__sfx")).distinct(), "__sfx")
      .select(col(h)).distinct()
    val build = if (broadcastBlocked) broadcast(blockedHosts) else blockedHosts
    // condition references the ACTUAL join frame (build), not the
    // pre-broadcast one — correctness must not lean on broadcast()
    // preserving attribute ids. The build side is DISTINCT matched
    // hosts, so the left join cannot multiply rows.
    df.join(build, lower(col(hostCol)) === build(h), "left")
      .withColumn("__graft_blocked", col(h).isNotNull)
      .drop(h)
  }

  def contaminatedBy(df: DataFrame, idCol: String, textCol: String,
                     probes: DataFrame, probeTextCol: String,
                     shingle: Int = 3): DataFrame = {
    require(idCol != "n_hits", "idCol 'n_hits' collides with an output column")
    require(idCol != "__h", "idCol '__h' is reserved")
    val docSh = df
      .select(col(idCol), explode(F.shingleHashSet(col(textCol), shingle)).as("__h"))
    val probeSh = probes
      .select(explode(F.shingleHashSet(col(probeTextCol), shingle)).as("__h"))
      .distinct()
    docSh.join(probeSh, "__h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** SENTENCE-level decontamination map: which sentences of each
    * document overlap the probe set — the surgical alternative to
    * [[contaminatedBy]]'s whole-document verdict (drop the leaked
    * benchmark sentence, keep the rest of the page; the Llama-2
    * decontamination appendix's unit). Returns one row per document
    * that has ≥ 1 sentence: `(idCol, n_sentences, n_contaminated,
    * contaminated_idx)` with the hit sentence ordinals as a sorted
    * array.
    *
    * Shape: sentences explode with their ordinal
    * ([[TextAnalysis.splitSentences]] — the t42 cascade), each
    * sentence's shingle-hash set explodes once, the (tiny, distinct)
    * probe hashes semi-join it, and two keyed aggregates rebuild the
    * per-doc map. Exploded rows stay in their document's partition
    * until the final per-doc aggregate — one real shuffle.
    */
  def contaminatedSentences(df: DataFrame, idCol: String, textCol: String,
                            probes: DataFrame, probeTextCol: String,
                            shingle: Int = 3): DataFrame = {
    for (r <- Seq("n_sentences", "n_contaminated", "contaminated_idx",
        "__si", "__sent", "__h"))
      require(idCol != r, s"idCol '$r' is reserved or collides")
    val sents = df.select(col(idCol),
      posexplode(TextAnalysis.splitSentences(col(textCol)))
        .as(Seq("__si", "__sent")))
    val probeSh = probes
      .select(explode(F.shingleHashSet(col(probeTextCol), shingle)).as("__h"))
      .distinct()
    val hits = sents
      .select(col(idCol), col("__si"),
        explode(F.shingleHashSet(col("__sent"), shingle)).as("__h"))
      .join(probeSh, Seq("__h"), "left_semi")
      .select(col(idCol), col("__si")).distinct()
    sents.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sentences"))
      .join(hits.groupBy(col(idCol))
          .agg(count(lit(1)).as("__nc"),
            array_sort(collect_list(col("__si"))).as("__idx")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_sentences"),
        coalesce(col("__nc"), lit(0L)).as("n_contaminated"),
        coalesce(col("__idx"), array().cast("array<int>"))
          .as("contaminated_idx"))
  }

  /** GRADED contamination: for every document, the fraction of its
    * distinct word `shingle`-grams that appear in the probe corpus —
    * the thresholdable form of [[contaminatedBy]] (the GPT-3/Llama
    * n-gram-overlap hygiene rule: drop above a contamination cutoff,
    * audit the band below it). Returns
    * `(idCol, n_shingles, n_hits, contamination)` for every document
    * that has at least one shingle; contamination = n_hits/n_shingles
    * rounded to 6 dp.
    *
    * Shape: ONE pass — the corpus's exploded shingle hashes left-join
    * the distinct probe hashes (eval sets are tiny; AQE broadcasts),
    * then a single per-doc aggregate. Exploded shingles stay in their
    * document's partition, so partial aggregation collapses to one row
    * per document before any exchange.
    */
  def contaminationScore(df: DataFrame, idCol: String, textCol: String,
                         probes: DataFrame, probeTextCol: String,
                         shingle: Int = 3): DataFrame = {
    for (r <- Seq("n_shingles", "n_hits", "contamination"))
      require(idCol != r, s"idCol '$r' collides with an output column")
    for (r <- Seq("__h", "__hit"))
      require(idCol != r, s"idCol '$r' is reserved")
    val docSh = df
      .select(col(idCol), explode(F.shingleHashSet(col(textCol), shingle)).as("__h"))
    val probeSh = probes
      .select(explode(F.shingleHashSet(col(probeTextCol), shingle)).as("__h"))
      .distinct()
      .withColumn("__hit", lit(1))
    docSh.join(probeSh, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("contamination",
        round(col("n_hits").cast("double") / col("n_shingles"), 6))
  }

  /** Keep rows at or above the per-group `q`-quantile of `scoreCol` —
    * the "drop the bottom 30% quality per language" curation pass that
    * follows quality scoring ([[TextAnalysis]]) in a training-data
    * pipeline. Exact and deterministic: the threshold is Spark's exact
    * `percentile` (≡ SQL `quantile_cont`), so re-runs keep identical
    * rows.
    *
    * Shape: one hash aggregate computes a tiny `(group, threshold)`
    * frame (|groups| rows — broadcast), then a broadcast join + filter
    * over a single corpus scan. NULL group values form their own group
    * (null-safe join); NULL scores cannot be ranked and are dropped.
    *
    * 100 TB note: exact `percentile` buffers each group's values on the
    * aggregating executor. For groups of billions of rows substitute
    * `approx_percentile(score, q, accuracy)` in the threshold frame —
    * the join/filter shape is unchanged; the cutoff gains a bounded
    * rank error instead of an exact one.
    */
  def filterByQualityQuantile(df: DataFrame, scoreCol: String,
                              groupCols: Seq[String], q: Double): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0,1), got $q")
    require(groupCols.nonEmpty, "need at least one group column")
    val gAliases = groupCols.indices.map(i => s"__graft_g$i")
    require(!df.columns.exists(c => gAliases.contains(c) || c == "__graft_qth"),
      "input already has a __graft_* column")
    val thresholds = df
      .groupBy(groupCols.map(col): _*)
      .agg(percentile(col(scoreCol), lit(q)).as("__graft_qth"))
      .select(groupCols.zip(gAliases).map { case (c, a) => col(c).as(a) } :+
        col("__graft_qth"): _*)
    val cond = groupCols.zip(gAliases)
      .map { case (c, a) => col(c) <=> col(a) }.reduce(_ && _)
    df.join(broadcast(thresholds), cond)
      .filter(col(scoreCol) >= col("__graft_qth"))
      .drop("__graft_qth")
      .drop(gAliases: _*)
  }

  /** Keep at most `k` rows per group — the best by (`scoreCol` DESC,
    * `idCol` ASC) — the per-domain cap of web-corpus curation ("no
    * source may contribute more than k documents", C4/RefinedWeb
    * practice) with quality deciding who stays. Rows with a NULL score
    * or id are dropped (unrankable); a NULL group is its own group.
    *
    * Scale shape — ONE hash aggregate whose buffer is bounded at k by
    * construction: [[graft.functions.BoundedTopK]] keeps a size-capped
    * heap per group, so the partial (map-side) aggregate emits at most
    * k rows per group per partition, the shuffle moves ≤ k·P survivors
    * per group, and NO stage — including the aggregation buffer itself —
    * ever materializes more than k rows of a group. The global top-k is
    * always contained in the union of per-partition top-k, so the cap
    * is exact. A plain `row_number` window would shuffle and SORT every
    * row of a group in one task — a billion-document domain becomes a
    * single-task sort at 100 TB.
    *
    * Only (score, id) is compared; the row payload is opaque cargo, so
    * payload columns may be maps or any other non-orderable type.
    *
    * DETERMINISM REQUIRES A UNIQUE `idCol`: the heap discards an
    * incoming element whose full (score, id) rank key ties the current
    * worst survivor ([[graft.functions.TopKHeap.insert]]), so duplicate
    * ids at an equal score keep a PARTITION-ORDER-DEPENDENT winner —
    * output can differ across runs and task retries. With unique ids
    * the rank key is total and the result is exactly reproducible.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                  idCol: String, k: Int): DataFrame = {
    require(k > 0, s"cap must be positive: $k")
    // groupCols may be EMPTY: a global top-k. The partial aggregate
    // still bounds each partition's contribution to k, so the final
    // reduce sees k·P rows in one group — fine for any driver-sized k.
    val reserved = Seq("__graft_kr", "__graft_top")
    reserved.foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    require(df.schema(scoreCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"score column '$scoreCol' must be numeric to rank descending")
    // Sort key: descending-mapped score (ascending struct order =
    // score DESC), then id ASC. Integral scores map via bitwise NOT
    // (~x = -x-1, a monotone-decreasing bijection over the FULL range):
    // unary minus overflows on Long.MinValue — an ArithmeticException
    // under ANSI, a silently inverted rank without it. Fractional/
    // decimal negation cannot overflow.
    val descScore = df.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => bitwise_not(col(scoreCol))
      case _ => -col(scoreCol)
    }
    val rankKey = struct(descScore.as("s"), col(idCol).as("i"))
    val payload = struct(df.columns.map(col): _*)
    df.filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.BoundedTopK.of(rankKey, payload, k)
        .as("__graft_top"))
      .select(explode(col("__graft_top")).as("__graft_kr"))
      .select(col("__graft_kr.*"))
  }

  /** Deterministic weighted sampling without replacement — the
    * Efraimidis–Spirakis A-Res scheme with HASH-derived uniforms: each
    * row draws `u` from the first 52 bits of sha256(id) (an exact
    * dyadic rational — no RNG state, reproducible across runs, engines
    * and partitionings) and the k largest `u^(1/w)` per group win,
    * which selects each row with probability proportional to its
    * weight. Ranking uses the monotone-equivalent `ln(u)/w` (both
    * negative, closer to zero is better). Rows with NULL/non-positive
    * weight or NULL id are unsampleable and dropped.
    *
    * Use it to sample training subsets proportional to a quality score
    * while keeping the [[samplePerStratum]] stability property: a
    * row's key never changes as the corpus grows, so a row only leaves
    * the sample when a better-keyed row arrives.
    *
    * Shape: a codegen'd key expression + [[capPerGroup]]'s two-phase
    * bounded top-k (empty `groupCols` = one global sample).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, groupCols: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains("__graft_esk"),
      "input already has a '__graft_esk' column")
    // 13 hex chars = 52 bits: exactly representable in a double, so
    // u = bits / 2^52 is the same dyadic rational in any engine.
    val u = conv(substring(sha2(col(idCol).cast("string"), 256), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0)
    val keyed = df
      .filter(col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__graft_esk", log(u) / col(weightCol))
    capPerGroup(keyed, groupCols, "__graft_esk", idCol, k)
      .drop("__graft_esk")
  }

  /** Winsorize (clip) a numeric column to its per-group
    * [`pLo`, `pHi`] exact-percentile band — the outlier taming applied
    * to reward/score/length features before they feed training or
    * quality thresholds. Adds `<valueCol>_winsorized`; NULL values
    * stay NULL, a NULL group is its own group.
    *
    * Same shape as [[filterByQualityQuantile]]: one hash aggregate
    * builds the tiny per-group threshold frame (exact `percentile` ≡
    * DuckDB `quantile_cont`), broadcast back onto a single scan with a
    * codegen'd `least(greatest(...))` clamp. For billion-row groups
    * substitute `approx_percentile` in the threshold frame; the clamp
    * is unchanged.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1: ($pLo, $pHi)")
    require(groupCols.nonEmpty, "need at least one group column")
    val outCol = s"${valueCol}_winsorized"
    val gAliases = groupCols.indices.map(i => s"__graft_wg$i")
    require(!df.columns.exists(c =>
        gAliases.contains(c) || c == outCol || c == "__graft_lo" || c == "__graft_hi"),
      s"input already has a reserved/'$outCol' column")
    val thresholds = df
      .groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(pLo)).as("__graft_lo"),
        percentile(col(valueCol), lit(pHi)).as("__graft_hi"))
      .select(groupCols.zip(gAliases).map { case (c, a) => col(c).as(a) } ++
        Seq(col("__graft_lo"), col("__graft_hi")): _*)
    val cond = groupCols.zip(gAliases)
      .map { case (c, a) => col(c) <=> col(a) }.reduce(_ && _)
    df.join(broadcast(thresholds), cond)
      // least/greatest SKIP nulls in both Spark and DuckDB (non-
      // standard!), so an unguarded clamp would turn a NULL value into
      // the lower bound — guard explicitly to keep NULL → NULL.
      .withColumn(outCol,
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__graft_lo")), col("__graft_hi"))))
      .drop("__graft_lo", "__graft_hi")
      .drop(gAliases: _*)
  }

  /** Assign documents to fixed-`capacity` training sequences ("packs")
    * by contiguous fill: within each shard, documents in `idCol` order
    * accumulate into a pack until the next one would start at or past
    * a capacity boundary — `pack_id = floor(running_sum_before /
    * capacity)`. Deterministic (id order), contiguous (a pack is an id
    * range), and over-long documents simply span multiple capacity
    * units — the cheap sequence-packing pipelines run before
    * tokenize-and-concat (exact bin packing is NP-hard and
    * order-destroying; contiguous fill is the standard trade).
    *
    * Scale shape: ONE window (running sum) partitioned by `shardCol` —
    * packing is per-shard BY DESIGN, matching how training data is
    * written (packs never straddle output shards). Shard granularity
    * bounds the in-partition sort exactly like any keyed window; a
    * single global shard would funnel the corpus into one task, so
    * don't pass one (same caveat family as the file-order validator
    * W2). NULL ids are unrankable and dropped; NULL weights count 0.
    */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
                    weightCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(!df.columns.contains("pack_id"),
      "input already has a 'pack_id' column")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore =
      sum(coalesce(col(weightCol), lit(0))).over(w) -
        coalesce(col(weightCol), lit(0))
    df.filter(col(idCol).isNotNull)
      .withColumn("pack_id", floor(cumBefore / capacity))
  }

  /** Tokenize-and-pack TERMINUS: concatenate per-document token-id
    * arrays (e.g. [[graft.ops.VocabTokenizer.greedyIds]]) into
    * FIXED-LENGTH training examples — the GPT-style document packing
    * that actually feeds a trainer, where [[packSequences]] only
    * assigns capacity bins. Documents concatenate within each shard in
    * `(sha256(id), id)` order (the engine-wide deterministic order —
    * stable across runs, partitionings and engines), each optionally
    * terminated by `eosId`; the shard's id stream is chopped at exact
    * `seqLen` boundaries, documents SPLITTING across examples. The
    * last example of a shard may be short — `padId` tops it up to
    * `seqLen` (with `n_ids` still reporting the real count), or the
    * caller drops it; output is `(shardCol, example_id, ids, n_ids)`
    * with `example_id` dense from 0 per shard.
    *
    * Scale shape: one window per shard for running offsets (shuffle
    * 1), then each document explodes to only the examples it SPANS
    * (≤ n/seqLen + 1 rows) carrying sliced fragments, and a keyed
    * aggregate reassembles each example from its ≤ few fragments
    * (shuffle 2) — token ids cross the wire twice, no driver
    * involvement, no single-task global stream. Fragment order inside
    * an example recovers from the offset (array_sort on (offset,
    * fragment) structs). Zero-token documents contribute nothing
    * unless `eosId` is set (then every document marks its boundary).
    */
  def packTokenIds(df: DataFrame, shardCol: String, idCol: String,
                   idsCol: String, seqLen: Int,
                   eosId: Option[Int] = None,
                   padId: Option[Int] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    for (r <- Seq("example_id", "ids", "n_ids", "__graft_ids",
        "__graft_n", "__graft_off", "__graft_frag"))
      require(!df.columns.contains(r) || (r == "ids" && idsCol == "ids"),
        s"input already has a reserved '$r' column")
    val withEos = eosId match {
      case Some(e) => df.withColumn("__graft_ids",
        concat(coalesce(col(idsCol), array().cast("array<int>")),
          array(lit(e))))
      case None => df.withColumn("__graft_ids",
        coalesce(col(idsCol), array().cast("array<int>")))
    }
    val w = Window.partitionBy(shardCol)
      .orderBy(sha2(col(idCol).cast("string"), 256), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withEos
      .filter(col(idCol).isNotNull)
      .withColumn("__graft_n", size(col("__graft_ids")).cast("long"))
      .filter(col("__graft_n") > 0)
      .withColumn("__graft_off",
        coalesce(sum("__graft_n").over(w), lit(0L)))
    val first = expr(s"__graft_off div $seqLen")
    val last = expr(s"(__graft_off + __graft_n - 1) div $seqLen")
    val fragStart = greatest(col("example_id") * seqLen, col("__graft_off"))
    val fragEnd = least((col("example_id") + 1) * seqLen,
      col("__graft_off") + col("__graft_n"))
    val frag = slice(col("__graft_ids"),
      (fragStart - col("__graft_off") + 1).cast("int"),
      (fragEnd - fragStart).cast("int"))
    offs.select(col(shardCol), col("__graft_ids"), col("__graft_off"),
        col("__graft_n"), explode(sequence(first, last)).as("example_id"))
      .select(col(shardCol), col("example_id"),
        struct(col("__graft_off").as("o"), frag.as("f")).as("__graft_frag"))
      .groupBy(col(shardCol), col("example_id"))
      .agg(flatten(transform(array_sort(collect_list("__graft_frag")),
        x => x.getField("f"))).as("ids"))
      // n_ids reports the REAL token count even when padding tops the
      // final short example up to seqLen
      .withColumn("n_ids", size(col("ids")).cast("long"))
      .withColumn("ids", padId match {
        case Some(pd) => concat(col("ids"),
          array_repeat(lit(pd), (lit(seqLen) - size(col("ids")))
            .cast("int")))
        case None => col("ids")
      })
  }

  /** Deterministic TOKEN-BUDGET subset: the maximal sha-order prefix of
    * the corpus whose running token total stays ≤ `budget` — "give me a
    * 50 B-token training subset of this 10 T-token corpus" as one
    * operator, reproducible across runs, engines and cluster layouts
    * (the order is `sha256(id)`, never partition or insertion order).
    * Keeps a row iff the cumulative `tokenCol` sum up to AND INCLUDING
    * it (in `(sha256(id), id)` order) is within budget; NULL token
    * counts weigh 0, NULL ids are unrankable and dropped (the
    * [[withSplit]] contract).
    *
    * A global running sum is the textbook scale trap — a windowed
    * cumsum with no PARTITION BY plans every row into ONE task. This
    * operator two-levels it instead: rows bucket by the first
    * `prefixHexDigits` of their sort hash (4096 ordered, sha-uniform
    * buckets by default), one hash aggregate computes per-bucket token
    * sums, the driver prefix-scans that tiny vector (4096 longs) into
    * exclusive per-bucket bases, and a per-BUCKET window adds the base
    * to the within-bucket cumsum — the same partial-then-offset shape
    * `packSequences` uses per shard, here derived purely from row
    * CONTENT so no persist/checkpoint is needed to keep two passes
    * consistent (`spark_partition_id` would tie the result to physical
    * planning). The bucket-sum collect is a deliberate driver action at
    * plan-construction time, like the k-means training loop.
    */
  def takeTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                      budget: Long, prefixHexDigits: Int = 3): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    // 5 hex digits max (16^5 ≈ 1M buckets): the bucket sums are
    // collected and prefix-scanned on the DRIVER, so the binding
    // constraint is driver memory — 1M (Int, Long) tuples is tens of
    // MB and already 4096× finer than the default 3, while 7 digits
    // would let a ~268M-row multi-GB driver collect through. (8+
    // digits would additionally overflow conv(...).cast("int").)
    require(prefixHexDigits >= 1 && prefixHexDigits <= 5,
      s"prefixHexDigits must be in [1, 5]: $prefixHexDigits")
    val reserved = Seq("__graft_ord", "__graft_bkt", "__graft_tok",
      "__graft_sum", "__graft_base", "__graft_cum")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input already has a reserved '$r' column"))
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.filter(col(idCol).isNotNull)
      .withColumn("__graft_ord", sha2(col(idCol).cast("string"), 256))
      .withColumn("__graft_bkt",
        conv(substring(col("__graft_ord"), 1, prefixHexDigits), 16, 10)
          .cast("int"))
      .withColumn("__graft_tok",
        greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L)))
    val bucketSums = keyed.groupBy("__graft_bkt")
      .agg(sum("__graft_tok").as("__graft_sum"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val bases = bucketSums
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (b, s)) => (b, acc + s) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
      .toSeq
    val baseDf = broadcast(bases.toDF("__graft_bkt", "__graft_base"))
    val w = Window.partitionBy("__graft_bkt")
      .orderBy("__graft_ord", idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(baseDf, Seq("__graft_bkt"))
      .withColumn("__graft_cum",
        col("__graft_base") + sum("__graft_tok").over(w))
      .filter(col("__graft_cum") <= budget)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Deterministic domain-mix reweighting (DoReMi/Pile-style "hit a
    * target source distribution"): subsample each group so the kept
    * rows approximate `parts` as a proportion — e.g.
    * `Map("web"->70, "code"->20, "books"->10)` keeps web:code:books at
    * 7:2:1, scaled to the LARGEST total the data can supply (the
    * binding group — the one scarcest relative to its target — is kept
    * whole; every other group downsamples to match it). Upsampling is
    * deliberately out of scope: repeating rows is an epoch decision for
    * the trainer, not a silent data-engine behavior.
    *
    * Determinism and oracle parity: per-group keep thresholds are
    * computed in EXACT integer arithmetic —
    * `th(g) = min over g' of floor(n(g') * parts(g) * buckets /
    * (parts(g') * n(g)))` (monotone floor ⇒ the min over groups equals
    * the floor of the binding ratio; no float ever enters) — and a row
    * is kept iff its [[splitBucket]] (stable sha-256 content hash)
    * lands below its group's threshold. Same inputs ⇒ the same kept
    * SET on any engine, partitioning or row order; kept counts track
    * `n(g) * th(g) / buckets` to hash-uniformity accuracy.
    *
    * Scale shape: one tiny per-group count aggregate (map-side combine,
    * ≤ |parts| rows collected), then a single codegen'd filter on the
    * scan — the group→threshold table rides in the plan as a literal
    * predicate chain; no join, no shuffle of data rows. Rows whose
    * group is absent from `parts` (or NULL), and rows whose id cannot
    * be keyed (the hash's -1 sentinel), are dropped. Groups named in
    * `parts` but empty in the data are ignored (an unsuppliable target
    * would otherwise force an empty result).
    *
    * The per-group counts n(g) are taken over KEYABLE rows only
    * (splitBucket ≥ 0): unkeyable rows can never be kept, so counting
    * them would inflate a group's apparent supply and skew the
    * achieved mix whenever groups differ in unkeyable-id rate (a group
    * half-full of NULL ids would be downsampled as if twice its
    * usable size).
    */
  def mixReweight(df: DataFrame, groupCol: String, idCol: String,
                  parts: Map[String, Int],
                  buckets: Int = 10000): DataFrame = {
    require(parts.nonEmpty, "parts must be non-empty")
    parts.foreach { case (g, p) =>
      require(p > 0, s"parts must be positive: $g -> $p") }
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(!df.columns.contains("__graft_bkt"),
      "input already has a reserved '__graft_bkt' column")
    val spark = df.sparkSession
    import spark.implicits._
    val groups = parts.keys.toSeq
    val keyed = df.withColumn("__graft_bkt", splitBucket(col(idCol), buckets))
    val counts: Map[String, Long] = keyed
      .filter(col(groupCol).isin(groups: _*) && col("__graft_bkt") >= 0)
      .groupBy(col(groupCol).cast("string").as("__g")).count()
      .as[(String, Long)].collect().toMap
    val present = parts.filter { case (g, _) => counts.getOrElse(g, 0L) > 0L }
    if (present.isEmpty) return df.filter(lit(false))
    val th: Map[String, Int] = present.map { case (g, pg) =>
      val ng = BigInt(counts(g))
      val t = present.map { case (g2, pg2) =>
        (BigInt(counts(g2)) * pg * buckets) / (BigInt(pg2) * ng)
      }.min
      g -> t.min(BigInt(buckets)).toInt
    }
    val keep = th.toSeq.sortBy(_._1).map { case (g, t) =>
      col(groupCol) === g && col("__graft_bkt") < t
    }.reduce(_ || _)
    keyed.filter(col("__graft_bkt") >= 0 && keep).drop("__graft_bkt")
  }

  /** Temperature-scaled mixture sampling (the mT5 / XLM-R recipe:
    * sample group `g` with probability `q_g ∝ p_g^α`, `p_g = n_g/N`) —
    * where [[mixReweight]] enforces EXPLICIT part ratios, this derives
    * the ratios from the observed group sizes and a temperature:
    * `α = 1` keeps the natural mix, `α → 0` flattens it, and the
    * standard `α = 0.5`–`0.7` range upweights small groups (languages,
    * sources) without letting any one dominate.
    *
    * Keep-rate per group: `r_g = min(1, budget·(q_g/Q)/n_g)`,
    * waterfilled — a group whose rate saturates at 1 keeps every row
    * and the remaining budget re-normalizes over the rest (≤ |groups|
    * driver-side rounds over a |groups|-row collect; data rows never
    * collect). Selection is deterministic: a row survives iff its id's
    * [[splitBucket]] hash bucket falls below
    * `floor(round(r_g · buckets, 6))` — stable under growth/reorder
    * like every other sampling operator here, and exactly replayable
    * in SQL (the c20 gate). The round-to-6-then-floor kills
    * last-ulp float divergence between engines' `pow`; `α = 0.5`
    * additionally routes through IEEE-exact `sqrt`.
    *
    * Rows with a NULL group are dropped (they cannot claim budget from
    * any group); the output hits `budget` only in expectation — hash
    * buckets are uniform, not exact counters (use [[mixReweight]] /
    * [[takeTokenBudget]] for exact-threshold semantics).
    *
    * Scale shape: one hash aggregate to |groups| rows, then a
    * codegen'd filter — no shuffle of data rows, no window, no join.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        alpha: Double, budget: Long,
                        buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(budget > 0, s"budget must be positive: $budget")
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(!df.columns.contains("__graft_bkt"),
      "input already has a reserved '__graft_bkt' column")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.withColumn("__graft_bkt", splitBucket(col(idCol), buckets))
    // Canonical ascending-group order everywhere a float sum happens,
    // so repeated runs are bit-identical. Counts exclude rows the
    // selection can never keep (NULL group, unkeyable -1-bucket id) —
    // counting them would dilute their group's keep-rate and
    // systematically under-deliver the budget (the mixReweight rule).
    val counts: Seq[(String, Long)] = keyed
      .filter(col(groupCol).isNotNull && col("__graft_bkt") >= 0)
      .groupBy(col(groupCol).cast("string").as("__g")).count()
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    if (counts.isEmpty) return df.filter(lit(false))
    def share(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else math.pow(n.toDouble, alpha)
    // Waterfill: rates over unsaturated groups, re-derived after each
    // saturation round.
    var sat = Set.empty[String]
    var rates = Map.empty[String, Double]
    var done = false
    while (!done) {
      val un = counts.filterNot { case (g, _) => sat(g) }
      val qsum = un.map { case (_, n) => share(n) }.sum
      val used = counts.collect { case (g, n) if sat(g) => n }.sum
      val left = (budget - used).max(0L)
      if (un.isEmpty || qsum <= 0) { rates = Map.empty; done = true }
      else {
        val r = un.map { case (g, n) =>
          g -> left * (share(n) / qsum) / n }
        val newSat = r.collect { case (g, x) if x >= 1.0 => g }
        if (newSat.isEmpty) { rates = r.toMap; done = true }
        else sat ++= newSat
      }
    }
    val th: Seq[(String, Int)] = counts.map { case (g, _) =>
      val r = if (sat(g)) 1.0 else rates.getOrElse(g, 0.0)
      g -> math.floor(BigDecimal(r * buckets)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toInt
    }
    val keep = th.map { case (g, t) =>
      col(groupCol).cast("string") === g && col("__graft_bkt") < t
    }.reduce(_ || _)
    keyed.filter(col("__graft_bkt") >= 0 && keep)
      .drop("__graft_bkt")
  }

  /** PII patterns redacted by [[redactPii]] — deliberately expressible
    * in both Java regex (Spark) and RE2 (DuckDB oracle parity): no
    * backreferences, no lookarounds.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{3,4}"

  /** Redact emails, IPv4 addresses and international-format phone
    * numbers to fixed tags. Order matters: phones before IPs (a phone's
    * digit groups must not be half-eaten by the IP rule first).
    */
  /** Per-group multi-threshold score bucketing — the CCNet shape
    * (Wenzek et al. 2020 §4.3: per-language perplexity terciles →
    * head/middle/tail). Two phases, because that is how it deploys:
    * [[fitScoreThresholds]] learns the per-group cut points once (on a
    * reference corpus), [[bucketByThresholds]] stamps any frame with
    * them — new batches bucket against the TRAINED thresholds, exactly
    * like CCNet applies Wikipedia-trained perplexity cuts to each new
    * crawl snapshot.
    *
    * Scale shape: the fit is one hash aggregate to a |groups|-row
    * frame; the apply is a broadcast join plus a codegen-friendly
    * count-of-thresholds-≤-score lookup — no window over the data, no
    * per-row sort. `exact=false` (default) fits with
    * `approx_percentile` (billion-row groups never sort);
    * `exact=true` is for gate-grade reproducibility.
    *
    * Cross-engine determinism note (pinned by the c18 gate): with
    * quarter fractions (k/4) the interpolation weight is EXACTLY
    * representable, so exact thresholds are bit-identical across
    * engines; scores should be pre-rounded if they come from float
    * pipelines.
    */
  def fitScoreThresholds(df: DataFrame, groupCols: Seq[String],
                         scoreCol: String,
                         fractions: Seq[Double] = Seq(0.25, 0.75),
                         exact: Boolean = false): DataFrame = {
    require(fractions.nonEmpty && fractions == fractions.sorted &&
      fractions.forall(f => f > 0 && f < 1),
      s"fractions must be ascending in (0,1): $fractions")
    require(groupCols.nonEmpty, "need at least one group column")
    val fr = array(fractions.map(lit): _*)
    val agg =
      if (exact) percentile(col(scoreCol), fr)
      else percentile_approx(col(scoreCol), fr, lit(10000))
    df.filter(col(scoreCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg.as("__graft_ts"))
  }

  /** Stamp `<scoreCol>_bucket` from a [[fitScoreThresholds]] frame:
    * label index = number of thresholds ≤ score (ties promote upward,
    * the CCNet convention), `labels(0)` below all cuts,
    * `labels.last` at/above all. Rows whose group is absent from the
    * thresholds frame (or whose score is NULL) get a NULL bucket.
    */
  def bucketByThresholds(df: DataFrame, thresholds: DataFrame,
                         groupCols: Seq[String], scoreCol: String,
                         labels: Seq[String] = Seq("tail", "middle", "head"))
  : DataFrame = {
    val gAliases = groupCols.indices.map(i => s"__graft_tg$i")
    require(!df.columns.exists(c =>
      gAliases.contains(c) || c == "__graft_ts"),
      "input already has a __graft_* column")
    val renamed = thresholds.select(
      groupCols.zip(gAliases).map { case (c, a) => col(c).as(a) } :+
        col("__graft_ts"): _*)
    val cond = groupCols.zip(gAliases)
      .map { case (c, a) => col(c) <=> col(a) }.reduce(_ && _)
    val score = col(scoreCol)
    val k = size(filter(col("__graft_ts"), t => t <= score))
    val lab = element_at(array(labels.map(lit): _*), k + 1)
    df.join(broadcast(renamed), cond, "left")
      .withColumn(s"${scoreCol}_bucket",
        when(score.isNotNull && col("__graft_ts").isNotNull, lab))
      .drop("__graft_ts").drop(gAliases: _*)
  }

  // ------------------------------------------------------------------
  // DSIR — data selection with importance resampling (Xie et al. 2023,
  // arXiv:2302.03169): score every raw document by how target-like its
  // hashed bag-of-ngrams is, then sample ∝ exp(score).
  // ------------------------------------------------------------------

  /** Hashed n-gram features of one text column: whitespace unigrams
    * plus adjacent bigrams (the paper's feature set), each mapped to a
    * bucket by the engine's stable sha256 hash
    * ([[graft.functions.LabelHashBucket]] — cross-engine replicable,
    * unlike murmur3). One explode, no UDF.
    */
  private def ngramFeatures(textCol: Column): Column = {
    val toks = when(textCol.isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(textCol,
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val m = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    concat(toks, bigrams)
  }

  /** DSIR importance weights: for each raw document,
    * `log_importance = Σ_features ln p̂_target(b) − ln p̂_raw(b)`
    * over hashed-n-gram buckets, with add-α smoothed bucket
    * distributions — the log-likelihood ratio of the doc under the
    * target vs raw bag-of-ngrams models. Returns
    * `(idCol, n_feats, log_importance)`; documents with no features
    * (empty/NULL text) are omitted — they carry no evidence and DSIR
    * never selects them.
    *
    * Scale shape: two hash aggregates build the ≤`buckets`-row
    * distributions (the only full-corpus passes); the ratio frame is
    * bucket-bounded, its totals come from a window over that SMALL
    * frame (never the data); per-doc scoring is one explode →
    * broadcast join → keyed aggregate. Nothing driver-side, nothing
    * quadratic, no vocabulary-scale state — `buckets` (default 2^16)
    * caps every intermediate except the per-doc feature stream, which
    * is the input re-read once. Feature hashing is WHY DSIR scales:
    * the distributions never grow with corpus vocabulary.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 1 << 16,
                        alpha: Double = 1.0): DataFrame = {
    require(buckets > 1, s"buckets must be > 1: $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing): $alpha")
    Seq("__graft_b", "__graft_k", "n_feats", "log_importance").foreach(r =>
      require(!raw.columns.contains(r), s"input already has a '$r' column"))
    // explode must be a top-level generator; bucket in a second select.
    // Bucket = sha256-first-52-bits mod buckets — NOT LabelHashBucket,
    // whose null/blank/"nan" → -1 sentinel is right for labels but
    // would corrupt a corpus containing the literal token "nan". 52
    // bits fit a long exactly and replicate in any engine.
    def feats(df: DataFrame, keep: Seq[String]): DataFrame =
      df.select(keep.map(col) :+
          explode(ngramFeatures(col(textCol))).as("__graft_f"): _*)
        .select(keep.map(col) :+
          pmod(conv(substring(sha2(col("__graft_f"), 256), 1, 13), 16, 10)
            .cast("long"), lit(buckets.toLong)).cast("int")
            .as("__graft_b"): _*)
    val distT = feats(target, Nil).groupBy("__graft_b")
      .agg(count(lit(1)).as("__ct"))
    val distR = feats(raw, Nil).groupBy("__graft_b")
      .agg(count(lit(1)).as("__cr"))
    // ratio frame: ≤ buckets rows. Totals ride in on the one-row
    // ScalarFold (broadcast hash join on a non-foldable constant key
    // — free at any scale, lazier than a driver-side count() action).
    // Both frames here are bucket-bounded; the corpus is long gone.
    val aB = lit(alpha * buckets)
    val joined = distT
      .join(distR, Seq("__graft_b"), "full_outer")
      .select(col("__graft_b"),
        coalesce(col("__ct"), lit(0L)).as("__ct"),
        coalesce(col("__cr"), lit(0L)).as("__cr"))
    val totals = joined
      .agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"))
    val ratio = ScalarFold.withScalars(joined, totals)
      .select(col("__graft_b"),
        (log((col("__ct") + alpha) / (col("__nt") + aB)) -
          log((col("__cr") + alpha) / (col("__nr") + aB)))
          .as("__graft_lr"))
    feats(raw, Seq(idCol))
      .groupBy(col(idCol), col("__graft_b"))
      .agg(count(lit(1)).as("__graft_k"))
      .join(broadcast(ratio), Seq("__graft_b"))
      .groupBy(col(idCol))
      .agg(sum("__graft_k").as("n_feats"),
        sum(col("__graft_k") * col("__graft_lr")).as("log_importance"))
  }

  /** Gumbel-top-k importance resampling: keep `k` rows (per group)
    * sampled WITHOUT replacement with probability ∝
    * `exp(logWeightCol)` — softmax sampling via the Gumbel-max trick
    * (perturb each log-weight with deterministic Gumbel noise, take
    * the top k), the resampling half of DSIR. Working in log space
    * sidesteps exp overflow/underflow entirely. Noise derives from
    * sha256(id) exactly like [[weightedSample]]'s uniforms
    * ((bits + ½)/2^52 — exact dyadic, never 0 or 1, identical in any
    * engine), so selection is reproducible across runs AND replicable
    * by the oracle. Same bounded-heap shape as [[capPerGroup]]: no
    * stage materializes more than k rows per group.
    */
  def importanceResample(df: DataFrame, idCol: String,
                         logWeightCol: String, k: Int,
                         groupCols: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains("__graft_gk"),
      "input already has a '__graft_gk' column")
    val u = (conv(substring(sha2(col(idCol).cast("string"), 256), 1, 13),
      16, 10).cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val gumbel = -log(-log(u))
    val keyed = df
      .filter(col(idCol).isNotNull && col(logWeightCol).isNotNull)
      .withColumn("__graft_gk", col(logWeightCol) + gumbel)
    capPerGroup(keyed, groupCols, "__graft_gk", idCol, k)
      .drop("__graft_gk")
  }

  /** Term-blocklist flag — the C4-style "bad words" content filter
    * (Raffel et al. 2020 §2.2 drops any page containing a listed word
    * or phrase). Match semantics, chosen to be cheap AND
    * engine-replicable: text is lowercased with whitespace runs
    * collapsed; single-word terms match as whole tokens, multi-word
    * terms as whole-token-bounded substrings of the normalized text.
    * Case-insensitive; terms are normalized the same way.
    *
    * Shape: the term list is CURATED-small (C4's is ~400 entries) and
    * rides in the closure as literals — single words as one
    * `arrays_overlap` against the token array (one codegen'd set
    * probe), phrases as an OR-fold of `contains` on the padded
    * normalized text. No join, no shuffle, one scan. A list above
    * `maxTerms` fails loud — web-scale lists (millions of entries)
    * belong in the [[dropBlockedDomains]]-style broadcast-join shape,
    * not in an expression tree.
    */
  def blockedTermFlag(textCol: Column, terms: Seq[String],
                      maxTerms: Int = 1000): Column = {
    require(terms.nonEmpty, "term list must be non-empty")
    require(terms.size <= maxTerms,
      s"${terms.size} terms > $maxTerms — use a broadcast-join filter " +
        "for lists this large")
    val norm = terms.map(_.trim.toLowerCase.replaceAll("\\s+", " "))
      .filter(_.nonEmpty).distinct
    require(norm.nonEmpty, "term list is empty after normalization")
    val (phrases, words) = norm.partition(_.contains(" "))
    val text = lower(regexp_replace(coalesce(textCol, lit("")),
      "[ \\t\\n\\f\\r]+", " "))
    val wordHit =
      if (words.isEmpty) lit(false)
      else arrays_overlap(split(text, " "),
        typedLit(words.toArray))
    val padded = concat(lit(" "), text, lit(" "))
    val phraseHit = phrases.foldLeft(lit(false)) { (acc, p) =>
      acc || padded.contains(s" $p ")
    }
    wordHit || phraseHit
  }

  /** Drop rows whose text trips [[blockedTermFlag]]. */
  def dropBlockedTerms(df: DataFrame, textCol: String,
                       terms: Seq[String]): DataFrame =
    df.filter(!blockedTermFlag(col(textCol), terms))

  private def normalizeTerms(terms: Seq[String], maxTerms: Int): Seq[String] = {
    require(terms.nonEmpty, "term list must be non-empty")
    require(terms.size <= maxTerms,
      s"${terms.size} terms > $maxTerms — split the list (words via a " +
        "hashed-token join, phrases via the automaton)")
    val norm = terms.map(_.trim.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")).filter(_.nonEmpty).distinct
    require(norm.nonEmpty, "term list is empty after normalization")
    norm
  }

  /** Text normalized exactly as [[blockedTermFlag]] (and the c19
    * oracle) does: lowercase, ASCII whitespace runs → one space. Kept
    * in SPARK expressions so unicode case folding stays engine-side —
    * the automaton kernel never lowercases.
    */
  private def normText(textCol: Column): Column =
    lower(regexp_replace(coalesce(textCol, lit("")),
      "[ \\t\\n\\f\\r]+", " "))

  /** The sorted distinct blocked terms occurring in the text — the
    * SCALE path of [[blockedTermFlag]], same word-boundary semantics
    * (each term padded to `" term "`, the text padded the same way, so
    * single words match whole tokens and phrases match across single
    * spaces). One [[AhoCorasick]] scan per row: O(|text|) regardless
    * of list size, where the expression-tree path is O(|text|·terms)
    * and caps at ~1k. The automaton is built once on the driver and
    * rides the task closure.
    */
  def blockedTermsMatched(textCol: Column, terms: Seq[String],
                          maxTerms: Int = 1000000): Column = {
    val norm = normalizeTerms(terms, maxTerms)
    val ac = AhoCorasick.build(norm.map(t => s" $t "))
    val f = udf((nt: String) =>
      ac.matchedPatterns(" " + nt + " ").map(_.trim))
    f(normText(textCol))
  }

  /** Boolean twin of [[blockedTermsMatched]] — early-exits the row's
    * scan on the first hit. Semantically identical to
    * [[blockedTermFlag]] on any list the latter accepts.
    */
  def blockedTermFlagLarge(textCol: Column, terms: Seq[String],
                           maxTerms: Int = 1000000): Column = {
    val norm = normalizeTerms(terms, maxTerms)
    val ac = AhoCorasick.build(norm.map(t => s" $t "))
    val f = udf((nt: String) => ac.anyMatch(" " + nt + " "))
    f(normText(textCol))
  }

  /** Drop rows matching any of an arbitrarily large term list. */
  def dropBlockedTermsLarge(df: DataFrame, textCol: String,
                            terms: Seq[String]): DataFrame =
    df.filter(!blockedTermFlagLarge(col(textCol), terms))

  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, emailPattern, "[EMAIL]")
    val noPhone = regexp_replace(noEmail, phonePattern, "[PHONE]")
    regexp_replace(noPhone, ipv4Pattern, "[IP]")
  }

  /** Per-kind PII match counts (for reporting/thresholding before the
    * redaction pass — "drop documents with > N emails"). Counted on the
    * SAME sequential basis as [[redactPii]] — phones on email-redacted
    * text, IPs on phone-redacted text — so a span consumed by an
    * earlier rule (e.g. the IPv4-shaped host inside
    * "user@10.0.0.7.example.com") is never double-counted under a
    * later kind the redactor would not tag.
    */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val noEmail = regexp_replace(c, emailPattern, "[EMAIL]")
    val noPhone = regexp_replace(noEmail, phonePattern, "[PHONE]")
    Seq(
      "n_emails" -> size(regexp_extract_all(c, lit(emailPattern), lit(0))).cast("long"),
      "n_phones" -> size(regexp_extract_all(noEmail, lit(phonePattern), lit(0))).cast("long"),
      "n_ipv4" -> size(regexp_extract_all(noPhone, lit(ipv4Pattern), lit(0))).cast("long"))
  }

  /** PII match AUDIT — the attribute-extraction mode (every matched
    * email/phone/IPv4 string itself, exploded to one row per match,
    * multiplicity preserved in document order) a pipeline logs and
    * reviews BEFORE committing to destructive redaction: `(idCol,
    * kind, match, match_idx)`. The same masking order as [[redactPii]]
    * (emails first, phones over the email-masked text, IPs over both)
    * so a phone-shaped substring inside an email is attributed to the
    * email, exactly as redaction would consume it. Pure
    * regexp_extract_all + posexplode on one scan — no shuffle, no UDF.
    */
  def piiMatches(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    val noEmail = regexp_replace(c, emailPattern, "[EMAIL]")
    val noPhone = regexp_replace(noEmail, phonePattern, "[PHONE]")
    // all three kinds packed into one struct array on ONE projection,
    // then exploded — a per-kind union would re-scan the source thrice
    val packed = array(
      struct(lit("email").as("kind"),
        regexp_extract_all(c, lit(emailPattern), lit(0)).as("ms")),
      struct(lit("phone").as("kind"),
        regexp_extract_all(noEmail, lit(phonePattern), lit(0)).as("ms")),
      struct(lit("ipv4").as("kind"),
        regexp_extract_all(noPhone, lit(ipv4Pattern), lit(0)).as("ms")))
    df.select(col(idCol), explode(packed).as("__g"))
      .select(col(idCol), col("__g.kind").as("kind"),
        posexplode(col("__g.ms")).as(Seq("match_idx", "match")))
      .select(col(idCol), col("kind"), col("match"),
        col("match_idx").cast("int").as("match_idx"))
  }

  /** Redact Luhn-valid payment-card numbers to `[CARD]`. Unlike the
    * [[redactPii]] kinds this is NOT a bare regexp_replace: any
    * 16-digit run (order ids, tracking numbers) matches the card
    * SHAPE, so the kernel ([[graft.functions.CardNumberUtil]], a
    * codegen Catalyst expression) verifies the ISO/IEC 7812 Luhn
    * checksum per candidate and leaves checksum-failing runs alone.
    */
  def redactCards(c: Column): Column = graft.functions.CardNumber.redact(c)

  /** Count of Luhn-valid card numbers (reporting/thresholding, the
    * [[piiCounts]] analogue for cards).
    */
  def cardCount(c: Column): Column = graft.functions.CardNumber.count(c)

  /** Full PII pass: emails, phones, IPv4 ([[redactPii]] order), then
    * Luhn-valid cards. Cards run LAST so the explicit international
    * phone format wins any overlap — a 13+-digit phone is tagged
    * `[PHONE]`, not half-eaten by the card rule.
    */
  def redactPiiAll(c: Column): Column = redactCards(redactPii(c))

  /** Deterministic global shuffle for training: every row gets a
    * pseudorandom `(shuffle_shard, shuffle_pos)` derived from
    * sha256(seed:id) — reproducible across runs and cluster sizes,
    * independent of input partitioning and file order (the property
    * `orderBy(rand())` cannot give: its result changes with the task
    * layout). A reader streaming shard 0 pos 1.., shard 1 pos 1.., …
    * sees a fixed pseudorandom permutation of the corpus; changing the
    * seed re-deals everything, changing only nShards re-buckets but
    * preserves the within-hash order.
    *
    * 100 TB shape: ONE hash shuffle into nShards groups plus a
    * per-shard sort (the window partitions by shard) — there is no
    * global sort, so shard count is the parallelism/memory knob: pick
    * nShards so a shard's rows fit an executor's sort spill budget,
    * exactly how packTokenIds sizes its shards.
    */
  def globalShuffle(df: DataFrame, idCol: String, nShards: Int,
                    seed: Long): DataFrame = {
    require(nShards > 0, s"globalShuffle needs nShards > 0, got $nShards")
    // Null ids fail loud: a null would hash as just "seed" (concat_ws
    // drops nulls), colliding every null row onto one digest and
    // breaking the sha256(seed:id) contract silently.
    val hashed = df.withColumn("__graft_h",
      sha2(concat_ws(":", lit(seed.toString),
        when(col(idCol).isNotNull, col(idCol).cast("string"))
          .otherwise(raise_error(
            lit(s"globalShuffle: null $idCol — every row needs an id")))), 256))
    // Shard comes from the SAME digest as the within-shard order (the
    // documented sha256(seed:id) contract): unsigned first 8 bytes of
    // the hex digest mod nShards. Deriving it from a second hash of
    // the id string (as a label-bucket kernel would) can disagree for
    // ids with surrounding whitespace, which that kernel trims.
    val w = Window.partitionBy("__graft_shard")
      .orderBy(col("__graft_h"), col(idCol))
    hashed
      .withColumn("__graft_shard",
        pmod(conv(substring(col("__graft_h"), 1, 16), 16, 10)
          .cast("decimal(20,0)"), lit(nShards)).cast("int"))
      .withColumn("shuffle_shard", col("__graft_shard"))
      .withColumn("shuffle_pos", row_number().over(w).cast("long"))
      .drop("__graft_h", "__graft_shard")
  }
}
