package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model, trained and scored
  * in-engine — the real version of the perplexity filter CCNet builds
  * its head/middle/tail buckets from (Wenzek et al. 2020 trains a
  * KenLM n-gram model on the reference domain and buckets crawl docs
  * by perplexity; [[TextAnalysis.bigramLogProb]] is the add-one
  * stand-in, kept as the cheap option).
  *
  * Absolute discounting with interpolation (Kneser & Ney 1995; Chen &
  * Goodman 1999 eq. 4.25, bigram case, fixed discount D):
  *
  *   P(w2|w1) = (max(c(w1,w2) − D, 0) + D · N1+(w1,•) · Pcont(w2)) / c(w1,•)
  *   Pcont(w2) = N1+(•,w2) / |{(a,b) : c(a,b) > 0}|
  *
  * where N1+(w1,•) = #distinct continuations of w1 and N1+(•,w2) =
  * #distinct contexts preceding w2 — the "how many doors lead here"
  * count that makes KN beat raw-frequency smoothing on words that are
  * frequent only inside fixed phrases.
  *
  * Out-of-model events at score time (never exercised when scoring the
  * training corpus itself, the CCNet self-score shape the gate pins):
  *  - unseen context w1 → back off to Pcont(w2) alone;
  *  - unseen w2 (no continuation mass) → D / B, the discount floor —
  *    bounded away from zero so one OOV token cannot −∞ a document.
  *
  * Scale shape: the model is three count frames keyed by token —
  * bigram counts, context totals, continuation counts — plus ONE
  * scalar (the bigram-type total B) carried as a one-row broadcast;
  * everything shuffles by token key exactly like tfidf, nothing is
  * collected, and scoring is three equi-joins off the per-doc bigram
  * counts. Training and scoring the same frame plans the gram
  * explode once per side with identical subtrees (ReuseExchange).
  */
object LanguageModel {

  /** Whitespace tokens as an array column — the corpus basis shared
    * with [[TextAnalysis.bigramLogProb]] / tfidf, so model vocabularies
    * line up across the quality operators.
    */
  private def toks(textCol: String) =
    when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))

  private def withScalars(df: DataFrame, scalars: DataFrame): DataFrame =
    ScalarFold.withScalars(df, scalars)

  /** Per-doc bigram occurrence counts `(idCol, __w1, __w2, __k)` — the
    * small frame every aggregate and the scorer hang off.
    */
  private def docGrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(textCol)
    val m = greatest(size(t) - 1, lit(0))
    // Spread before the tokenize+explode: the gram explosion is the
    // heaviest map work in the tower and otherwise rides the (possibly
    // single-task) scan stage — see graft.util.Par.
    graft.util.Par.spread(df, idCol).select(col(idCol),
        explode(arrays_zip(slice(t, lit(1), m).as("w1"),
          slice(t, lit(2), m).as("w2"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
      .groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__k"))
  }

  /** Train on `train`, score `df`: one row per document of `df` with
    * ≥ 1 bigram — `(idCol, n_bigrams, kn_logprob, kn_ppl)` where
    * `kn_logprob` is the mean ln P(w2|w1) over the doc's bigrams and
    * `kn_ppl = exp(−kn_logprob)` its per-bigram perplexity. Feed
    * `kn_ppl` to [[Curation.fitScoreThresholds]] /
    * [[Curation.bucketByThresholds]] for the CCNet head/middle/tail
    * split over a real model.
    */
  def kneserNeyScore(train: DataFrame, df: DataFrame, idCol: String,
                     textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0, 1), got $discount")
    Seq("n_bigrams", "kn_logprob", "kn_ppl").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))

    val trainGrams = docGrams(train, idCol, textCol)
    // Persisted for the same reason as the trigram path's triC: FOUR
    // consumers (probe join, contextC, contC, totals) would each
    // re-run the corpus explode + count shuffle; the cached frame is
    // bigram-TYPE counts — vocabulary-scale, spill-safe, LRU-evictable.
    val bigramC = trainGrams.groupBy("__w1", "__w2")
      .agg(sum("__k").as("__cbg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Context totals and distinct-continuation counts in ONE pass over
    // the (already tiny) bigram-type frame.
    val contextC = bigramC.groupBy("__w1")
      .agg(sum("__cbg").as("__cw1"), count(lit(1)).as("__n1p_after"))
    val contC = bigramC.groupBy("__w2")
      .agg(count(lit(1)).as("__n1p_before"))
    // B = total bigram types, as a one-row broadcast (the t8 shape).
    val totals = bigramC.agg(count(lit(1)).as("__b"))

    val d = lit(discount)
    val scoreGrams = docGrams(df, idCol, textCol)
    val pcont =
      coalesce(col("__n1p_before").cast("double"), d) / col("__b")
    val seenCtx =
      (greatest(col("__cbg").cast("double") - d, lit(0.0)) +
        d * col("__n1p_after") * pcont) / col("__cw1")
    val p = when(col("__cw1").isNotNull, seenCtx).otherwise(pcont)

    // One-shot call: the score frame is materialized eagerly
    // (doc-scale, 4 narrow columns) so the model cache can be released
    // HERE — before r18 bigramC was never unpersisted, leaking one
    // model cache per call into the session (and letting a later
    // identical training plan silently reuse the stale cache, which
    // made repeat bench passes read the cache instead of computing).
    try {
      Checkpoints.truncate(withScalars(scoreGrams
        .join(bigramC, Seq("__w1", "__w2"), "left")
        .join(contextC, Seq("__w1"), "left")
        .join(contC, Seq("__w2"), "left"), totals)
        .groupBy(col(idCol))
        .agg(
          sum("__k").as("n_bigrams"),
          (sum(col("__k") * log(p)) / sum("__k")).as("kn_logprob"))
        .withColumn("kn_ppl", exp(-col("kn_logprob"))))
    } finally { bigramC.unpersist(); () }
  }

  /** Self-scored corpus (train == score) — the CCNet configuration
    * where each document's perplexity is measured under the corpus's
    * own statistics, so boilerplate and keyboard-mash land in the tail.
    */
  def kneserNeySelfScore(df: DataFrame, idCol: String, textCol: String,
                         discount: Double = 0.75): DataFrame =
    kneserNeyScore(df, df, idCol, textCol, discount)

  /** The trigram-KN count frames, shared by scoring
    * ([[kneserNey3Score]]) and ARPA export ([[saveKn3Arpa]]) so the
    * two derive probabilities from IDENTICAL formulas.
    */
  private final case class Kn3Counts(triC: DataFrame, ctx12: DataFrame,
                                     cont2: DataFrame, ctx2: DataFrame,
                                     bigramC: DataFrame, contU: DataFrame,
                                     totals: DataFrame)

  private def kn3Counts(train: DataFrame, idCol: String,
                        textCol: String): Kn3Counts = {
    // Persisted: triC feeds THREE consumers (the probe join, ctx12,
    // cont2→ctx2) and bigramC two — without the cache each consumer
    // re-runs the corpus explode + count shuffle (16 source scans in
    // the un-cached plan; 2.4x wall at sf1). Both frames are gram-TYPE
    // counts (vocabulary-scale), spill-safe, LRU-evictable.
    val st = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val triC = docTrigrams(train, idCol, textCol)
      .groupBy("__w1", "__w2", "__w3").agg(sum("__k").as("__ctg"))
      .persist(st)
    // The DERIVED count frames are persisted too: score and saveArpa
    // each join all of them, so an unpersisted ctx12/cont2/ctx2/contU
    // re-runs its groupBy shuffle once per consumer (score + export =
    // 2x; the export's merged backoff join reads ctx frames twice
    // more). All are gram-type-scale (≤ the already-cached triC),
    // spill-safe, and released by Kn3Model.unpersist.
    val ctx12 = triC.groupBy("__w1", "__w2")
      .agg(sum("__ctg").as("__cw12"), count(lit(1)).as("__n1p_after12"))
      .persist(st)
    // middle level: continuation counts N1+(•,w2,w3)
    val cont2 = triC.groupBy("__w2", "__w3")
      .agg(count(lit(1)).as("__n1p_mid"))
      .persist(st)
    val ctx2 = cont2.groupBy("__w2")
      .agg(sum("__n1p_mid").as("__cw2cont"),
        count(lit(1)).as("__n2typ_after"))
      .persist(st)
    // bottom level: unigram continuation over TRUE bigram types. A
    // bigram instance at position i < n−1 is the (w1,w2) head of the
    // trigram at i, so c(a,b) = Σ_c c(a,b,c) + #docs whose FINAL
    // bigram is (a,b) — i.e. ctx12 (already derived from the cached
    // trigram counts) plus a per-doc last-bigram frame. This replaces
    // the second full corpus explode+shuffle with one light scan that
    // shuffles ONE row per document.
    val t = toks(textCol)
    val lastBi = train
      .select(t.as("__t")).filter(size(col("__t")) >= 2)
      .select(element_at(col("__t"), -2).as("__w1"),
        element_at(col("__t"), -1).as("__w2"))
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__clast"))
    val bigramC = ctx12.select(col("__w1"), col("__w2"), col("__cw12"))
      .join(lastBi, Seq("__w1", "__w2"), "full_outer")
      .select(col("__w1"), col("__w2"),
        (coalesce(col("__cw12"), lit(0L)) +
          coalesce(col("__clast"), lit(0L))).as("__cbg"))
      .persist(st)
    val contU = bigramC.groupBy(col("__w2").as("__w3"))
      .agg(count(lit(1)).as("__n1p_before"))
      .persist(st)
    val totals = bigramC.agg(count(lit(1)).as("__b"))
    Kn3Counts(triC, ctx12, cont2, ctx2, bigramC, contU, totals)
  }

  /** Per-doc trigram occurrence counts `(idCol, __w1, __w2, __w3, __k)`. */
  private def docTrigrams(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val t = toks(textCol)
    val m = greatest(size(t) - 2, lit(0))
    graft.util.Par.spread(df, idCol).select(col(idCol),
        explode(arrays_zip(slice(t, lit(1), m).as("w1"),
          slice(t, lit(2), m).as("w2"),
          slice(t, lit(3), m).as("w3"))).as("__tg"))
      .select(col(idCol), col("__tg.w1").as("__w1"),
        col("__tg.w2").as("__w2"), col("__tg.w3").as("__w3"))
      .groupBy(col(idCol), col("__w1"), col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__k"))
  }

  /** Interpolated trigram Kneser–Ney with the standard RECURSIVE
    * backoff chain (Chen & Goodman 1999 §4.1.6, modified to a single
    * fixed discount D per level — the KenLM `-S` shape CCNet trains):
    *
    *   P3(w3|w1w2) = (max(c(w1w2w3) − D, 0) + D·N1+(w1w2•)·P2(w3|w2)) / c(w1w2•)
    *   P2(w3|w2)   = (max(N1+(•w2w3) − D, 0) + D·N1+typ(w2•)·P1(w3)) / N1+(•w2•)
    *   P1(w3)      = N1+(•w3) / B
    *
    * Every level below the top runs on CONTINUATION counts ("how many
    * distinct left contexts"), not raw frequencies — the property that
    * makes KN assign low unigram mass to words frequent only inside a
    * fixed phrase. Out-of-model events back off one level at a time:
    * unseen (w1,w2) context → P2; unseen w2 middle context → P1;
    * unseen w3 → D/B, the same bounded floor as the bigram model.
    *
    * Scale shape mirrors [[kneserNeyScore]] exactly, one level deeper:
    * five count frames keyed by token grams (trigram types, (w1,w2)
    * context totals, (w2,w3) continuation counts, w2 continuation
    * totals, w3 left-context counts) plus the one-row bigram-type
    * total B; scoring is five equi-joins off the per-doc trigram
    * counts. Nothing collects; everything shuffles by gram key.
    *
    * Returns one row per document of `df` with ≥ 1 trigram:
    * `(idCol, n_trigrams, kn3_logprob, kn3_ppl)`.
    */
  def kneserNey3Score(train: DataFrame, df: DataFrame, idCol: String,
                      textCol: String, discount: Double = 0.75): DataFrame = {
    // One-shot wrapper: the model handle never escapes, so the score
    // frame is materialized eagerly (doc-scale, 4 narrow columns) and
    // the count-frame caches released HERE — before r18 they were
    // never unpersisted, leaking one model's caches per call into the
    // session (and silently letting a later identical training plan —
    // its own next call, or t48's — reuse the stale cache, which made
    // the bench's repeat passes read the cache instead of computing).
    val m = kn3Train(train, idCol, textCol, discount)
    try Checkpoints.truncate(m.score(df, idCol, textCol))
    finally m.unpersist()
  }

  /** A TRAINED trigram-KN model handle: the count frames are built
    * (and persisted) ONCE and shared by every [[Kn3Model.score]] call
    * and the ARPA export [[Kn3Model.saveArpa]] — the round-trip path
    * (t48) derives the corpus statistics a single time instead of
    * once per consumer. Call [[Kn3Model.unpersist]] when the LAST
    * consumer's action has run (the Dedup persist/finally pattern);
    * un-unpersisted frames are LRU-evictable.
    */
  final class Kn3Model private[LanguageModel] (
      c: Kn3Counts, val discount: Double,
      spark: org.apache.spark.sql.SparkSession) {
    // r18 rejected experiment (recorded): pre-materializing the
    // persisted count frames with per-frame count() actions before the
    // towers are planned — so join planning sees REAL InMemoryRelation
    // sizes instead of inflated child estimates — moved the cache-build
    // cost out of the tower but returned it as 6 extra jobs: Prof t48
    // saveArpa 33→36 jobs / warm 3.74→3.90 s, t53 58→70 jobs /
    // 7.47→7.25 s. The export is AQE stage-latency bound at this SF,
    // not join-strategy bound; AQE's runtime SMJ→BHJ conversion
    // already handles the small frames.
    def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
      kn3ScoreWith(c, df, idCol, textCol, discount)
    def saveArpa(path: String): Unit =
      saveKn3ArpaFrom(c, spark, path, discount)
    def unpersist(): Unit = {
      Seq(c.triC, c.ctx12, c.cont2, c.ctx2, c.bigramC, c.contU)
        .foreach(_.unpersist())
      ()
    }
  }

  /** Train the trigram-KN count frames once; see [[Kn3Model]]. */
  def kn3Train(train: DataFrame, idCol: String, textCol: String,
               discount: Double = 0.75): Kn3Model = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0, 1), got $discount")
    new Kn3Model(kn3Counts(train, idCol, textCol), discount,
      train.sparkSession)
  }

  private def kn3ScoreWith(c: Kn3Counts, df: DataFrame, idCol: String,
                           textCol: String, discount: Double): DataFrame = {
    Seq("n_trigrams", "kn3_logprob", "kn3_ppl").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    import c.{triC, ctx12, cont2, ctx2, contU, totals}

    val d = lit(discount)
    val p1 = coalesce(col("__n1p_before").cast("double"), d) / col("__b")
    val p2 = when(col("__cw2cont").isNotNull,
      (greatest(coalesce(col("__n1p_mid"), lit(0L)).cast("double") - d,
          lit(0.0)) +
        d * col("__n2typ_after") * p1) / col("__cw2cont")).otherwise(p1)
    val p3 = when(col("__cw12").isNotNull,
      (greatest(coalesce(col("__ctg"), lit(0L)).cast("double") - d,
          lit(0.0)) +
        d * col("__n1p_after12") * p2) / col("__cw12")).otherwise(p2)

    withScalars(docTrigrams(df, idCol, textCol)
      .join(triC, Seq("__w1", "__w2", "__w3"), "left")
      .join(ctx12, Seq("__w1", "__w2"), "left")
      .join(cont2, Seq("__w2", "__w3"), "left")
      .join(ctx2, Seq("__w2"), "left")
      .join(contU, Seq("__w3"), "left"), totals)
      .groupBy(col(idCol))
      .agg(
        sum("__k").as("n_trigrams"),
        (sum(col("__k") * log(p3)) / sum("__k")).as("kn3_logprob"))
      .withColumn("kn3_ppl", exp(-col("kn3_logprob")))
  }

  /** Self-scored trigram corpus perplexity — the CCNet configuration
    * one order deeper than [[kneserNeySelfScore]].
    */
  def kneserNey3SelfScore(df: DataFrame, idCol: String, textCol: String,
                          discount: Double = 0.75): DataFrame =
    kneserNey3Score(df, df, idCol, textCol, discount)

  // -------------------------------------------------- order-N KN (2..5)

  /** Count frames of an interpolated order-`n` Kneser–Ney model, all
    * keyed RIGHT-ALIGNED on canonical columns `__w1..__wn` (a level-k
    * gram occupies `__w(n−k+1)..__wn`) so scoring and export share one
    * join pipeline. `top` carries RAW n-gram counts; `cont(k)` the
    * continuation counts N1+(•g) over the raw (k+1)-gram TYPE sets —
    * which are themselves derived downward (prefix-projection of the
    * level above ∪ each document's final k-gram), never by extra
    * corpus explodes; `ctx(k)` the per-context normalizers
    * (Σ counts, distinct continuations); `b` = |raw bigram types|.
    */
  private final case class KnNCounts(
      n: Int,
      top: DataFrame,                 // __w1..__wn, __cn
      topCtx: DataFrame,              // __w1..__w{n-1}, __sum_n, __ntyp_n
      types: Map[Int, DataFrame],     // k -> right-aligned key set
      cont: Map[Int, DataFrame],      // k -> keys + __c{k}   (k = 1..n-1)
      ctx: Map[Int, DataFrame],       // k -> ctx keys + __sum_k, __ntyp_k (k = 2..n-1)
      b: DataFrame,                   // one row: __b
      lasts: DataFrame)               // per-doc tail tokens (persisted)

  private def wcols(n: Int, k: Int): Seq[String] =
    (n - k + 1 to n).map(i => s"__w$i")

  private def knNCounts(train: DataFrame, idCol: String, textCol: String,
                        n: Int): KnNCounts = {
    val st = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // ONE corpus explode: raw n-gram counts (the kn3 lesson — every
    // lower-order type set derives from this frame plus the per-doc
    // tail frame below, never from another explode+shuffle)
    val top = docNgrams(train, idCol, textCol, n)
      .groupBy(wcols(n, n).map(col): _*)
      .agg(sum("__k").as("__cn"))
      .persist(st)
    // topCtx / cont(k) / ctx(k) below are persisted as well: score and
    // saveArpa BOTH join every one of them (and the export's merged
    // backoff frames read each ctx a second time), so leaving them
    // lazy re-runs one groupBy shuffle per consumer per frame. All are
    // aggregates of already-cached parents (type-scale, ≤ |top|),
    // spill-safe, released by KnModel.unpersist.
    val topCtx = top.groupBy(wcols(n, n).dropRight(1).map(col): _*)
      .agg(sum("__cn").as(s"__sum_$n"), count(lit(1)).as(s"__ntyp_$n"))
      .persist(st)
    // per-doc tail tokens: ONE light scan, one row per document — the
    // final (m < n)-grams no n-gram covers. Docs shorter than n-1
    // tokens keep their whole token array: slice(t, -(n-1), n-1) on a
    // shorter array returns EMPTY (Spark semantics for a negative
    // start past the front), which would drop those docs' words from
    // every type set and the exported vocabulary.
    val t = toks(textCol)
    val lasts = train
      .select(when(size(t) < n - 1, t)
        .otherwise(slice(t, lit(-(n - 1)), lit(n - 1))).as("__t"))
      .persist(st)
    // raw type sets downward: types(k) = prefix(types(k+1)) ∪ finals(k)
    val typesBuf = scala.collection.mutable.Map[Int, DataFrame](
      n -> top.select(wcols(n, n).map(col): _*))
    for (k <- n - 1 to 1 by -1) {
      val fromAbove = typesBuf(k + 1)
        .select(wcols(n, k + 1).dropRight(1).map(col): _*)
        .toDF(wcols(n, k): _*)
      val finals = lasts.filter(size(col("__t")) >= k)
        .select((1 to k).map(i =>
          element_at(col("__t"), i - k - 1).as(s"__w${n - k + i}")): _*)
      val tk = fromAbove.unionByName(finals).distinct()
      typesBuf(k) = (if (k >= 2) tk.persist(st) else tk)
    }
    // continuation counts: c_k(g) = #distinct left-extensions of g
    // among the raw (k+1)-gram types
    val cont = (1 until n).map { k =>
      k -> typesBuf(k + 1)
        .groupBy(wcols(n, k).map(col): _*)
        .agg(count(lit(1)).as(s"__c$k"))
        .persist(st)
    }.toMap
    val ctx = (2 until n).map { k =>
      k -> cont(k)
        .groupBy(wcols(n, k).dropRight(1).map(col): _*)
        .agg(sum(s"__c$k").as(s"__sum_$k"), count(lit(1)).as(s"__ntyp_$k"))
        .persist(st)
    }.toMap
    val b = cont(1).agg(sum("__c1").as("__b"))
    KnNCounts(n, top, topCtx, typesBuf.toMap, cont, ctx, b, lasts)
  }

  /** The recursive interpolated-KN probability chain over an already-
    * joined frame carrying the count columns — shared verbatim by
    * scoring and export (the t48 exactness mechanism, generalized).
    */
  private def knNProb(n: Int, upTo: Int, discount: Double): Column = {
    val d = lit(discount)
    var p: Column = coalesce(col("__c1").cast("double"), d) / col("__b")
    for (k <- 2 to upTo) {
      val cCol =
        if (k == n) col("__cn") else col(s"__c$k")
      val inner = (greatest(coalesce(cCol, lit(0L)).cast("double") - d,
          lit(0.0)) +
        d * col(s"__ntyp_$k") * p) / col(s"__sum_$k")
      p = when(col(s"__sum_$k").isNotNull, inner).otherwise(p)
    }
    p
  }

  /** Attach every count frame to a right-aligned gram frame (document
    * n-grams, or the export's mixed-order entry frame).
    */
  private def knNJoin(c: KnNCounts, grams: DataFrame): DataFrame = {
    var j = grams
      .join(c.top, wcols(c.n, c.n), "left")
      .join(c.topCtx, wcols(c.n, c.n).dropRight(1), "left")
    for (k <- c.n - 1 to 1 by -1)
      j = j.join(c.cont(k), wcols(c.n, k), "left")
    for (k <- c.n - 1 to 2 by -1)
      j = j.join(c.ctx(k), wcols(c.n, k).dropRight(1), "left")
    withScalars(j, c.b)
  }

  /** A trained order-`n` interpolated Kneser–Ney model (2 ≤ n ≤ 5 —
    * n = 5 is the shape CCNet's published KenLM artifacts are).
    * [[score]] and [[saveArpa]] share the persisted count frames and
    * the SAME probability chain, so export → [[loadArpaN]] →
    * [[arpaScoreN]] reproduces [[score]] exactly (the t48 mechanism
    * at any order). Call [[unpersist]] when the last consumer's
    * action has run.
    */
  final class KnModel private[LanguageModel] (
      c: KnNCounts, val discount: Double,
      spark: org.apache.spark.sql.SparkSession) {
    def n: Int = c.n


    /** `(idCol, n_ngrams, kn_logprob, kn_ppl)` — natural-log mean over
      * the doc's interior n-grams, ppl = exp(−logprob); docs with
      * fewer than n tokens emit no row.
      */
    def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
      Seq("n_ngrams", "kn_logprob", "kn_ppl").foreach(r =>
        require(!df.columns.contains(r), s"input already has a '$r' column"))
      val g = docNgrams(df, idCol, textCol, c.n)
      knNJoin(c, g)
        .groupBy(col(idCol))
        .agg(
          sum("__k").as("n_ngrams"),
          (sum(col("__k") * log(knNProb(c.n, c.n, discount))) / sum("__k"))
            .as("kn_logprob"))
        .withColumn("kn_ppl", exp(-col("kn_logprob")))
    }

    /** Standard ARPA export at order n — interpolated probabilities,
      * backoff weight of a context = its interpolation coefficient
      * λ = D·N1+typ(ctx)/Σ(ctx); unigram section covers the full
      * vocabulary, `<unk>` = D/B floor, literal `<unk>` escapes to
      * [[LiteralUnkSpelling]]; distributed sort + ordered concat.
      */
    def saveArpa(path: String): Unit = {
      val d = lit(discount)
      val log10 = (x: Column) => log(10.0, x)
      val esc = (g: Column) =>
        when(g === "<unk>", lit(LiteralUnkSpelling)).otherwise(g)
      val n = c.n
      // mixed-order entry frame: level-k entries right-aligned, with
      // unused key columns null
      val entries = (1 to n).map { k =>
        val nulls = (1 to n - k).map(i =>
          lit(null).cast("string").as(s"__w$i"))
        c.types(k).select(nulls ++ wcols(n, k).map(col) :+
          lit(k).as("__lvl"): _*)
      }.reduce(_ unionByName _)
      // the tower, with each level's backoff source MERGED into its
      // cont join: a level-k entry's backoff frame (its ctx/topCtx
      // re-keyed onto the entry's own gram) shares cont(k)'s join keys
      // exactly, so pre-joining the two SMALL count frames full-outer
      // (both keys unique — they are groupBy results) attaches both in
      // ONE shuffle of the big entry union instead of two: 9 big-frame
      // joins instead of 13, at any scale
      var joined = entries
        .join(c.top, wcols(n, n), "left")
        .join(c.topCtx, wcols(n, n).dropRight(1), "left")
      for (k <- n - 1 to 1 by -1) {
        val src = if (k == n - 1) c.topCtx else c.ctx(k + 1)
        val boFrame = src.toDF(
          wcols(n, k) ++ Seq(s"__bosum_$k", s"__bontyp_$k"): _*)
        joined = joined.join(
          c.cont(k).join(boFrame, wcols(n, k), "full_outer"),
          wcols(n, k), "left")
      }
      for (k <- n - 1 to 2 by -1)
        joined = joined.join(c.ctx(k), wcols(n, k).dropRight(1), "left")
      joined = withScalars(joined, c.b)
      val lp = (2 to n).foldLeft(
        when(col("__lvl") === 1, log10(knNProb(n, 1, discount)))) {
        (acc, k) => acc.when(col("__lvl") === k, log10(knNProb(n, k, discount)))
      }
      val bo = (1 until n).foldLeft(lit(null).cast("double")) { (acc, k) =>
        when(col("__lvl") === k && col(s"__bosum_$k").isNotNull,
          log10(d * col(s"__bontyp_$k") / col(s"__bosum_$k")))
          .otherwise(acc)
      }
      val g = concat_ws(" ", (1 to n).map(i => esc(col(s"__w$i"))): _*)
      val sectionLines = joined.select(
        (col("__lvl") * 2 - 1).as("ord"), g.as("key"),
        concat(lp.cast("string"), lit("\t"), g,
          when(bo.isNotNull, concat(lit("\t"), bo.cast("string")))
            .otherwise(lit(""))).as("line"),
        col("__lvl").as("__s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      import spark.implicits._
      try {
        val sizes = sectionLines.groupBy("__s")
          .agg(count(lit(1)).as("__cnt"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val counts = (1 to n).map(k =>
          s"ngram $k=${sizes.getOrElse(k, 0L) + (if (k == 1) 1 else 0)}")
        val unkLine = c.b.select(lit(1).as("ord"), lit("<unk>").as("key"),
          concat(log10(d / col("__b")).cast("string"),
            lit("\t<unk>")).as("line"))
        def marker(ord: Int, text: Seq[String]): DataFrame =
          text.zipWithIndex.map { case (l, i) => (ord, f"$i%04d", l) }
            .toDF("ord", "key", "line")
        val markers = (2 to n).map(k =>
          marker(k * 2 - 2, Seq("", s"\\$k-grams:")))
        val all = (Seq(
          marker(0, Seq("\\data\\") ++ counts ++ Seq("", "\\1-grams:")),
          sectionLines.select("ord", "key", "line"), unkLine) ++
          markers :+ marker(n * 2, Seq("", "\\end\\")))
          .reduce(_ unionByName _)
        graft.util.OrderedText.writeSorted(all, Seq("ord", "key"), path)
      } finally { sectionLines.unpersist(); () }
    }

    def unpersist(): Unit = {
      c.top.unpersist()
      c.topCtx.unpersist()
      c.lasts.unpersist()
      c.types.foreach { case (k, df) => if (k >= 2 && k < c.n) df.unpersist() }
      c.cont.values.foreach(_.unpersist())
      c.ctx.values.foreach(_.unpersist())
      ()
    }
  }

  /** Train an order-`n` interpolated KN model (2 ≤ n ≤ 5). */
  def knTrain(train: DataFrame, idCol: String, textCol: String, n: Int,
              discount: Double = 0.75): KnModel = {
    require(n >= 2 && n <= 5, s"order must be in [2, 5], got $n")
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0, 1), got $discount")
    new KnModel(knNCounts(train, idCol, textCol, n), discount,
      train.sparkSession)
  }

  // ------------------------------------------------------- ARPA interop

  /** Export the in-engine interpolated trigram KN model as a standard
    * ARPA file — the representation SRILM/KenLM use for interpolated
    * models: each entry stores the INTERPOLATED probability and each
    * context's backoff weight is its interpolation coefficient
    * λ(ctx) = D·N1+(ctx,•)/c(ctx,•), so the Katz lookup
    * ([[arpaScore]]) reproduces [[kneserNey3Score]]'s probabilities
    * EXACTLY on every branch — seen trigram, context backoff, middle
    * backoff, and the `<unk>` = D/B floor (the round-trip the t48
    * gate pins, including the ln↔log10 base change cancelling in the
    * perplexity).
    *
    * Entry sets: unigrams = the FULL vocabulary (every word occupying
    * any bigram position — a superset of the continuation vocabulary,
    * so every word referenced by a 2/3-gram entry has a 1-gram entry,
    * the closure property strict consumers like KenLM `build_binary` /
    * SRILM enforce; non-continuation words, i.e. words appearing only
    * document-initially, carry the D/B floor their in-engine score
    * resolves to) + `<unk>`; bigrams = continuation pairs ∪ trigram
    * contexts (a context-only pair still writes its interpolated
    * probability, so the lookup through it cannot drift); trigrams =
    * seen trigrams.
    *
    * A literal corpus token `<unk>` would collide with the OOV entry,
    * so it is exported under the reserved spelling
    * [[LanguageModel.LiteralUnkSpelling]] with its REAL statistics;
    * [[arpaScore]]'s `escapeLiteralUnk = true` applies the matching
    * remap at lookup, keeping the round trip exact on corpora that
    * contain the literal token. (A corpus token equal to the reserved
    * spelling itself is out of contract.)
    *
    * The file is assembled WITHOUT collecting the model: every section
    * is a line frame, unioned with the header/markers, range-sort
    * partitioned (a DISTRIBUTED sort — no single-task global sort) and
    * written as N ordered part files which the driver stream-concats
    * in part order through the Hadoop FileSystem API, so the write
    * works on HDFS/S3 as well as local disk and the only single-stream
    * step is the byte copy ARPA's one-file format itself demands.
    */
  def saveKn3Arpa(train: DataFrame, idCol: String, textCol: String,
                  path: String, discount: Double = 0.75): Unit = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0, 1), got $discount")
    val c = kn3Counts(train, idCol, textCol)
    try saveKn3ArpaFrom(c, train.sparkSession, path, discount)
    finally {
      Seq(c.triC, c.ctx12, c.cont2, c.ctx2, c.bigramC, c.contU)
        .foreach(_.unpersist())
      ()
    }
  }

  private def saveKn3ArpaFrom(c: Kn3Counts,
                              spark: org.apache.spark.sql.SparkSession,
                              path: String, discount: Double): Unit = {
    val d = lit(discount)
    val b = col("__b")
    val log10 = (x: Column) => log(10.0, x)
    val esc = (g: Column) =>
      when(g === "<unk>", lit(LiteralUnkSpelling)).otherwise(g)

    // ---- unified entry frame: (ord, k1, k2, k3 [, ctg]) ------------
    // ord1 = full vocabulary (every bigram position — the closure
    // strict consumers need; non-continuation words get the D/B
    // floor); ord2 = continuation pairs ∪ trigram contexts; ord3 =
    // seen trigrams (whose counts ride the union, saving the probe
    // join). ONE join pipeline then attaches every count frame —
    // six equi-joins total instead of three per-section chains, so
    // the export is one pass over the model with a fraction of the
    // exchanges (this is also what keeps the gate latency sane:
    // stage-scheduling overhead, not data, dominates at small SF).
    val nilS = lit(null).cast("string")
    val vocab = c.bigramC.select(col("__w1").as("__w3"))
      .unionByName(c.bigramC.select(col("__w2").as("__w3")))
      .distinct()
    val biKeys = c.cont2.select(col("__w2"), col("__w3"))
      .unionByName(c.ctx12.select(col("__w1").as("__w2"),
        col("__w2").as("__w3")))
      .distinct()
    val entries = vocab.select(lit(1).as("__ord"), nilS.as("__k1"),
        nilS.as("__k2"), col("__w3").as("__k3"),
        lit(null).cast("long").as("__ctg"))
      .unionByName(biKeys.select(lit(2).as("__ord"), nilS.as("__k1"),
        col("__w2").as("__k2"), col("__w3").as("__k3"),
        lit(null).cast("long").as("__ctg")))
      .unionByName(c.triC.select(lit(3).as("__ord"),
        col("__w1").as("__k1"), col("__w2").as("__k2"),
        col("__w3").as("__k3"), col("__ctg")))

    val ctxTop = c.ctx12.select(col("__w1").as("__k1"),
      col("__w2").as("__k2"), col("__cw12"), col("__n1p_after12"))
    val boPair = c.ctx12.select(col("__w1").as("__k2"),
      col("__w2").as("__k3"), col("__cw12").as("__bo_cw12"),
      col("__n1p_after12").as("__bo_n1p"))
    val mid = c.cont2.select(col("__w2").as("__k2"),
      col("__w3").as("__k3"), col("__n1p_mid"))
    val midCtx = c.ctx2.select(col("__w2").as("__k2"),
      col("__cw2cont"), col("__n2typ_after"))
    val boUni = c.ctx2.select(col("__w2").as("__k3"),
      col("__cw2cont").as("__ubo_cw"), col("__n2typ_after").as("__ubo_n"))
    val cont = c.contU.select(col("__w3").as("__k3"), col("__n1p_before"))

    val joined = withScalars(entries
      .join(ctxTop, Seq("__k1", "__k2"), "left")
      .join(mid, Seq("__k2", "__k3"), "left")
      .join(midCtx, Seq("__k2"), "left")
      .join(boPair, Seq("__k2", "__k3"), "left")
      .join(boUni, Seq("__k3"), "left")
      .join(cont, Seq("__k3"), "left"), c.totals)

    // the same recursive-KN formulas as kn3ScoreWith, selected by ord
    val p1 = coalesce(col("__n1p_before").cast("double"), d) / b
    val p2 = when(col("__cw2cont").isNotNull,
      (greatest(coalesce(col("__n1p_mid"), lit(0L)).cast("double") - d,
          lit(0.0)) +
        d * col("__n2typ_after") * p1) / col("__cw2cont")).otherwise(p1)
    val p3 = (greatest(col("__ctg").cast("double") - d, lit(0.0)) +
      d * col("__n1p_after12") * p2) / col("__cw12")
    val lp = when(col("__ord") === 1, log10(p1))
      .when(col("__ord") === 2, log10(p2))
      .otherwise(log10(p3))
    val bo = when(col("__ord") === 1 && col("__ubo_cw").isNotNull,
        log10(d * col("__ubo_n") / col("__ubo_cw")))
      .when(col("__ord") === 2 && col("__bo_cw12").isNotNull,
        log10(d * col("__bo_n1p") / col("__bo_cw12")))
    val g = when(col("__ord") === 1, esc(col("__k3")))
      .when(col("__ord") === 2,
        concat_ws(" ", esc(col("__k2")), esc(col("__k3"))))
      .otherwise(concat_ws(" ", esc(col("__k1")), esc(col("__k2")),
        esc(col("__k3"))))
    // section lines, already in final form: sort ord = 1/3/5 (markers
    // take the even slots)
    val sectionLines = joined.select(
      (col("__ord") * 2 - 1).as("ord"), g.as("key"),
      concat(lp.cast("string"), lit("\t"), g,
        when(bo.isNotNull, concat(lit("\t"), bo.cast("string")))
          .otherwise(lit(""))).as("line"),
      col("__ord").as("__s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    import spark.implicits._
    try {
    def t[A](n: String)(f: => A): A = {
      if (sys.env.contains("GRAFT_PROF")) {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof]   saveArpa/$n%-20s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
      } else f
    }
    // all three header counts in ONE job (fills the cache the sort's
    // sampling pass and write then reuse)
    val sizes = t("sizes collect")(sectionLines.groupBy("__s")
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val n1 = sizes.getOrElse(1, 0L) + 1 // + <unk>
    val n2 = sizes.getOrElse(2, 0L)
    val n3 = sizes.getOrElse(3, 0L)
    val unkLine = c.totals.select(lit(1).as("ord"),
      lit("<unk>").as("key"),
      concat(log10(d / b).cast("string"), lit("\t<unk>")).as("line"))
    def marker(ord: Int, text: Seq[String]): DataFrame =
      text.zipWithIndex
        .map { case (l, i) => (ord, f"$i%04d", l) }
        .toDF("ord", "key", "line")
    val all = marker(0, Seq("\\data\\", s"ngram 1=$n1", s"ngram 2=$n2",
        s"ngram 3=$n3", "", "\\1-grams:"))
      .unionByName(sectionLines.select("ord", "key", "line"))
      .unionByName(unkLine)
      .unionByName(marker(2, Seq("", "\\2-grams:")))
      .unionByName(marker(4, Seq("", "\\3-grams:")))
      .unionByName(marker(6, Seq("", "\\end\\")))
    // Distributed global sort + ordered part concat (OrderedText): no
    // single-task sort, no driver-local-disk assumption.
    t("writeSorted")(
      graft.util.OrderedText.writeSorted(all, Seq("ord", "key"), path))
    } finally { sectionLines.unpersist(); () }
  }

  /** Reserved export spelling for a literal corpus `<unk>` token —
    * see [[saveKn3Arpa]].
    */
  val LiteralUnkSpelling = "<raw_unk>"

  /** Parsed ARPA model: per-order gram frames. `uni` =
    * `(w, lp, bo)`, `bi` = `(w1, w2, lp, bo)`, `tri` =
    * `(w1, w2, w3, lp)`; `lp`/`bo` are the file's log10 values,
    * absent backoffs NULL.
    */
  final case class ArpaModel(uni: DataFrame, bi: DataFrame, tri: DataFrame)

  /** Load a KenLM/SRILM ARPA file (≤ trigram used; higher orders are
    * ignored) — the interop path for scoring a crawl under the
    * EXTERNALLY trained model CCNet actually ships, instead of the
    * in-engine KN estimates.
    *
    * Parsing is ORDER-FREE and fully distributed: an ARPA data line is
    * `log10p<TAB>w1[ w2 …][<TAB>backoff]`, so the gram order is the
    * word count of the middle field and no section state is needed —
    * headers, counts and `\\N-grams:` markers simply fail the
    * leading-float test and drop. One `spark.read.text` scan; a
    * 100 GB model parses like any other text table. (Tab-separated
    * fields per the SRILM/KenLM writers; space-only variants are out
    * of scope by documented contract.)
    */
  def loadArpa(spark: org.apache.spark.sql.SparkSession,
               path: String): ArpaModel = {
    val lines = spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .select(
        // guarded try_cast (graft.functions precedent): structure
        // lines ("\data\", "ngram 1=4", section markers) must yield
        // NULL, not an ANSI cast exception
        graft.functions.GraftFunctions
          .tryCastNumeric(element_at(col("f"), 1), "double").as("lp"),
        element_at(col("f"), 2).as("g"),
        when(size(col("f")) >= 3,
          graft.functions.GraftFunctions
            .tryCastNumeric(element_at(col("f"), 3), "double"))
          .as("bo"))
      .filter(col("lp").isNotNull && col("g").isNotNull)
      .withColumn("ws", split(col("g"), " "))
    val uni = lines.filter(size(col("ws")) === 1)
      .select(element_at(col("ws"), 1).as("w"), col("lp"), col("bo"))
    val bi = lines.filter(size(col("ws")) === 2)
      .select(element_at(col("ws"), 1).as("w1"),
        element_at(col("ws"), 2).as("w2"), col("lp"), col("bo"))
    val tri = lines.filter(size(col("ws")) === 3)
      .select(element_at(col("ws"), 1).as("w1"),
        element_at(col("ws"), 2).as("w2"),
        element_at(col("ws"), 3).as("w3"), col("lp"))
    ArpaModel(uni, bi, tri)
  }

  /** Parsed ARPA model of arbitrary order: `grams(k)` has columns
    * `w1..wk, lp, bo` (bo NULL where absent). `maxOrder` = highest
    * order with entries.
    */
  final case class ArpaModelN(grams: Map[Int, DataFrame]) {
    require(grams.nonEmpty, "empty ARPA model")
    val maxOrder: Int = grams.keys.max
    /** Release the per-order caches once the last scoring action has
      * run (model-sized frames, LRU-evictable if skipped).
      */
    def unpersist(): Unit = { grams.values.foreach(_.unpersist()); () }
  }

  /** Order-N ARPA load (N ≤ `maxOrder`, default 5 — the order CCNet's
    * published KenLM models actually are). Same order-free distributed
    * parse as [[loadArpa]]: gram order = word count of the middle tab
    * field, so one text scan covers every section.
    */
  def loadArpaN(spark: org.apache.spark.sql.SparkSession, path: String,
                maxOrder: Int = 5): ArpaModelN = {
    require(maxOrder >= 1 && maxOrder <= 8,
      s"maxOrder must be in [1, 8], got $maxOrder")
    val lines = spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .select(
        graft.functions.GraftFunctions
          .tryCastNumeric(element_at(col("f"), 1), "double").as("lp"),
        element_at(col("f"), 2).as("g"),
        when(size(col("f")) >= 3,
          graft.functions.GraftFunctions
            .tryCastNumeric(element_at(col("f"), 3), "double"))
          .as("bo"))
      .filter(col("lp").isNotNull && col("g").isNotNull)
      .withColumn("ws", split(col("g"), " "))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val present = lines.select(size(col("ws")).as("k"))
        .filter(col("k").between(1, maxOrder))
        .distinct().collect().map(_.getInt(0)).sorted
      require(present.nonEmpty, s"$path: no ARPA data lines")
      val grams = present.map { k =>
        k -> lines.filter(size(col("ws")) === k)
          .select((1 to k).map(i =>
            element_at(col("ws"), i).as(s"w$i")) ++
            Seq(col("lp"), col("bo")): _*)
      }.toMap
      // materialize EVERY order's cache in ONE job (tagged-union
      // count) off the shared cached parse, before unpersisting it
      val out = grams.map { case (k, df) =>
        k -> df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      out.values.map(_.select(lit(1).as("__one")))
        .reduce(_ unionByName _).count()
      ArpaModelN(out)
    } finally { lines.unpersist(); () }
  }

  /** Per-doc N-gram occurrence counts `(idCol, __w1.., __k)`. */
  private def docNgrams(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val t = toks(textCol)
    val m = greatest(size(t) - (n - 1), lit(0))
    graft.util.Par.spread(df, idCol).select(col(idCol),
        explode(arrays_zip((1 to n).map(j =>
          slice(t, lit(j), m).as(s"w$j")): _*)).as("__ng"))
      .select(col(idCol) +:
        (1 to n).map(j => col(s"__ng.w$j").as(s"__w$j")): _*)
      .groupBy(col(idCol) +: (1 to n).map(j => col(s"__w$j")): _*)
      .agg(count(lit(1)).as("__k"))
  }

  /** Score `df` under an order-N ARPA model with the standard Katz
    * backoff lookup, generalized from [[arpaScore]]:
    *
    *   P(w_N | w_1..w_{N−1}) = lp_N                       if the N-gram exists
    *     = bo_{N−1}(w_1..w_{N−1}) + P(w_N | w_2..w_{N−1}) else (absent bo → 0)
    *   …recursively down to lp_1(w_N), else lp_1(<unk>), else −99.
    *
    * Documents score over their interior N-gram stream where
    * N = the model's max order (a doc with < N tokens emits no row) —
    * 2N−1 gram-keyed equi-joins plus one aggregate; AQE broadcasts
    * real-model sides, nothing collects. Returns
    * `(idCol, n_ngrams, arpa_logprob, arpa_ppl)` (log10 mean;
    * `arpa_ppl = 10^(−arpa_logprob)`).
    */
  def arpaScoreN(model: ArpaModelN, df: DataFrame, idCol: String,
                 textCol: String,
                 escapeLiteralUnk: Boolean = false): DataFrame = {
    Seq("n_ngrams", "arpa_logprob", "arpa_ppl").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    val n = model.maxOrder
    val empty = (k: Int) => {
      val s = df.sparkSession
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          (1 to k).map(i => org.apache.spark.sql.types.StructField(
            s"w$i", org.apache.spark.sql.types.StringType)) ++ Seq(
            org.apache.spark.sql.types.StructField("lp",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("bo",
              org.apache.spark.sql.types.DoubleType))))
    }
    def order(k: Int): DataFrame = model.grams.getOrElse(k, empty(k))

    val docs0 = docNgrams(df, idCol, textCol, n)
    val docs =
      if (!escapeLiteralUnk) docs0
      else (1 to n).map(i => s"__w$i").foldLeft(docs0)((acc, w) =>
        acc.withColumn(w, when(col(w) === "<unk>",
          lit(LiteralUnkSpelling)).otherwise(col(w))))

    // suffix lp of order k matches doc positions n-k+1..n; context bo
    // of order k matches positions n-k..n-1
    var joined = docs
    for (k <- 1 to n) {
      val lpSide = order(k).select(
        (1 to k).map(i => col(s"w$i").as(s"__w${n - k + i}")) :+
          col("lp").as(s"__lp$k"): _*)
      joined = joined.join(lpSide,
        (n - k + 1 to n).map(i => s"__w$i"), "left")
    }
    for (k <- 1 until n) {
      val boSide = order(k).select(
        (1 to k).map(i => col(s"w$i").as(s"__w${n - k - 1 + i}")) :+
          col("bo").as(s"__bo$k"): _*)
      joined = joined.join(boSide,
        (n - k to n - 1).map(i => s"__w$i"), "left")
    }
    val unk = order(1).filter(col("w1") === "<unk>")
      .agg(min(col("lp")).as("__lpunk"))

    var p: Column = coalesce(col("__lp1"), col("__lpunk"), lit(-99.0))
    for (k <- 2 to n)
      p = when(col(s"__lp$k").isNotNull, col(s"__lp$k"))
        .otherwise(coalesce(col(s"__bo${k - 1}"), lit(0.0)) + p)

    withScalars(joined, unk)
      .groupBy(col(idCol))
      .agg(
        sum("__k").as("n_ngrams"),
        (sum(col("__k") * p) / sum("__k")).as("arpa_logprob"))
      .withColumn("arpa_ppl", pow(lit(10.0), -col("arpa_logprob")))
  }

  /** Score `df` under a loaded ARPA trigram model with the standard
    * backoff lookup (Katz-style, the semantics every ARPA consumer
    * implements):
    *
    *   P(w3|w1w2) = lp3(w1w2w3)                    if the trigram exists
    *              = bo(w1w2) + P(w3|w2)            else (absent bo → 0)
    *   P(w3|w2)   = lp2(w2w3)                      if the bigram exists
    *              = bo(w2) + P(w3)                 else
    *   P(w3)      = lp1(w3), else lp1(<unk>), else −99 (SRILM's floor)
    *
    * Documents score over their interior trigram stream (no BOS/EOS
    * padding — the same basis as [[kneserNey3Score]], so the two are
    * bucket-comparable). Returns `(idCol, n_trigrams, arpa_logprob,
    * arpa_ppl)` where `arpa_logprob` is the mean log10 probability and
    * `arpa_ppl = 10^(−arpa_logprob)`.
    *
    * Shape: the model rides as five equi-join sides keyed by gram
    * (AQE broadcasts real-model sizes); scoring is the per-doc trigram
    * frame joined five ways, then one aggregate — nothing collects.
    * The `<unk>` scalar folds in as a constant-key broadcast hash
    * join (never a nested loop).
    *
    * `escapeLiteralUnk = true` remaps literal document tokens `<unk>`
    * to [[LiteralUnkSpelling]] before lookup — set it when scoring
    * under a [[saveKn3Arpa]] export (whose writer applies the same
    * remap) for an exact round trip on corpora containing the literal
    * token; leave it false (default) for externally trained models,
    * where a literal `<unk>` should hit the model's OOV entry.
    */
  def arpaScore(model: ArpaModel, df: DataFrame, idCol: String,
                textCol: String,
                escapeLiteralUnk: Boolean = false): DataFrame = {
    Seq("n_trigrams", "arpa_logprob", "arpa_ppl").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    val tri = model.tri.select(col("w1").as("__w1"), col("w2").as("__w2"),
      col("w3").as("__w3"), col("lp").as("__lp3"))
    val bi23 = model.bi.select(col("w1").as("__w2"), col("w2").as("__w3"),
      col("lp").as("__lp23"))
    val bo12 = model.bi.select(col("w1").as("__w1"), col("w2").as("__w2"),
      col("bo").as("__bo12"))
    val uni3 = model.uni.select(col("w").as("__w3"), col("lp").as("__lp1"),
      lit(1).as("__seen1"))
    val bo2 = model.uni.select(col("w").as("__w2"), col("bo").as("__bo2"))
    val unk = model.uni.filter(col("w") === "<unk>")
      .agg(min(col("lp")).as("__lpunk"))
    val p1 = when(col("__seen1").isNotNull, col("__lp1"))
      .otherwise(coalesce(col("__lpunk"), lit(-99.0)))
    val p2 = when(col("__lp23").isNotNull, col("__lp23"))
      .otherwise(coalesce(col("__bo2"), lit(0.0)) + p1)
    val p3 = when(col("__lp3").isNotNull, col("__lp3"))
      .otherwise(coalesce(col("__bo12"), lit(0.0)) + p2)
    val docTri0 = docTrigrams(df, idCol, textCol)
    val docTri =
      if (!escapeLiteralUnk) docTri0
      else Seq("__w1", "__w2", "__w3").foldLeft(docTri0)((acc, w) =>
        acc.withColumn(w, when(col(w) === "<unk>",
          lit(LiteralUnkSpelling)).otherwise(col(w))))
    withScalars(docTri
      .join(tri, Seq("__w1", "__w2", "__w3"), "left")
      .join(bi23, Seq("__w2", "__w3"), "left")
      .join(bo12, Seq("__w1", "__w2"), "left")
      .join(uni3, Seq("__w3"), "left")
      .join(bo2, Seq("__w2"), "left"), unk)
      .groupBy(col(idCol))
      .agg(
        sum("__k").as("n_trigrams"),
        (sum(col("__k") * p3) / sum("__k")).as("arpa_logprob"))
      .withColumn("arpa_ppl", pow(lit(10.0), -col("arpa_logprob")))
  }
}
