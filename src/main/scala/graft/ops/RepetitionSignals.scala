package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher",
  * appendix A1.1) — the character-fraction family that
  * [[TextAnalysis.repetitionFeatures]]' distinct-ratio signals do not
  * cover:
  *
  *  - `dup_line_frac` / `dup_para_frac`: fraction of lines /
  *    paragraphs that are repeats of an earlier identical line /
  *    paragraph within the document;
  *  - `dup_line_char_frac` / `dup_para_char_frac`: fraction of line /
  *    paragraph characters inside those repeats (occurrences after the
  *    first);
  *  - `top_{2,3,4}gram_char_frac`: `count · chars / total_chars` of
  *    the most frequent word n-gram (0 when nothing repeats — a
  *    document of all-distinct n-grams has no repetition to measure);
  *  - `dup_{5..10}gram_char_frac`: fraction of non-whitespace
  *    characters covered by ANY word n-gram that occurs at least
  *    twice — a union over token positions, so overlapping repeats are
  *    not double-counted (the top-n-gram signal deliberately keeps the
  *    paper's simpler `count · chars` overcount).
  *
  * Everything is computed by ONE per-row kernel pass (a scalar UDF
  * returning a struct): per-document repetition is embarrassingly
  * parallel, so the operator is a pure map stage — no shuffle, no
  * state, and at 100 TB it rides whatever partitioning the scan
  * produced. A loop-dominated per-row kernel is the documented UDF
  * precedent here (MinHash/SimHash/shingles): each of the nine n-gram
  * sizes wants a hash map over the document's grams, which a Catalyst
  * expression tree cannot express without per-element interpreted
  * lambdas (higher-order functions are CodegenFallback).
  *
  * Exact-definition notes, mirrored verbatim by the `t26` /
  * `c21` oracles:
  *  - tokens are the `[^ \t\n\f\r]+` whitespace class used by every
  *    other text operator; character counts are Unicode code points
  *    (`codePointCount`, matching Spark's `length` and DuckDB's
  *    `len`), total = sum of token lengths (whitespace never counts);
  *  - lines split on `\n`, paragraphs on `\n{2,}` runs; empty units
  *    are dropped (a run of blank lines is formatting, not repeated
  *    content); unit character counts are code points of the raw unit;
  *  - n-gram identity is exact string equality of the joined tokens
  *    (a `\u0001` separator, so `["ab","c"]` ≠ `["a","bc"]`) — no
  *    rolling hashes, because the oracle groups by the real gram and a
  *    hash collision would diverge from it;
  *  - top-n-gram ties break by larger character length; beyond that
  *    the tie cannot change the value (`count` and `chars` are the
  *    value), so no further order is needed;
  *  - NULL text measures as all-zero signals, never NULL (the
  *    [[TextAnalysis.qualityFeatures]] NaN/NULL contract: one
  *    degenerate row must not poison a group average).
  *
  * Reference provenance: the reference validates per-record content
  * (`tracebloc_ingestor` V1–V18) but has no corpus-repetition
  * operators; this family comes from the published Gopher rules, as
  * SURVEY.md's beyond-reference text-analysis mandate.
  */
object RepetitionSignals {

  /** Top-n-gram signal sizes (paper: 2–4). */
  val topNs: Seq[Int] = Seq(2, 3, 4)

  /** Duplicate-n-gram coverage signal sizes (paper: 5–10). */
  val dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  /** One document's signals. Field order is the output column order. */
  case class Signals(
      dup_line_frac: Double, dup_line_char_frac: Double,
      dup_para_frac: Double, dup_para_char_frac: Double,
      top_2gram_char_frac: Double, top_3gram_char_frac: Double,
      top_4gram_char_frac: Double,
      dup_5gram_char_frac: Double, dup_6gram_char_frac: Double,
      dup_7gram_char_frac: Double, dup_8gram_char_frac: Double,
      dup_9gram_char_frac: Double, dup_10gram_char_frac: Double)

  val signalNames: Seq[String] = Seq(
    "dup_line_frac", "dup_line_char_frac",
    "dup_para_frac", "dup_para_char_frac",
    "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
    "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
    "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")

  private val Zero =
    Signals(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  private def cp(s: String): Long =
    s.codePointCount(0, s.length).toLong

  // The engine-wide whitespace tokenization — ONE definition
  // (TextHash.tokens) so a future change to the token class cannot
  // silently split this kernel from the oracles and the other text
  // operators.
  private def tokenize(text: String): Array[String] =
    graft.functions.TextHash.tokens(text)

  /** (dup unit fraction, dup char fraction) over repeated exact units:
    * a unit value occurring `c ≥ 2` times contributes `c−1` duplicate
    * units and `(c−1)·len` duplicate characters.
    */
  private def dupUnitFracs(units: Array[String]): (Double, Double) = {
    if (units.isEmpty) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < units.length) {
      counts.merge(units(i), 1, (a: Int, b: Int) => a + b); i += 1
    }
    var dupN = 0L; var dupC = 0L; var totC = 0L
    val it = counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong; val l = cp(e.getKey)
      totC += c * l
      if (c >= 2) { dupN += c - 1; dupC += (c - 1) * l }
    }
    (dupN.toDouble / units.length,
      if (totC == 0) 0.0 else dupC.toDouble / totC)
  }

  /** Gram keys for one n: tokens joined by `\u0001`. A gram's character
    * length is recovered as `cp(key) − (n−1)` — exact even if a token
    * itself contains `\u0001`, which is also precisely what the oracle's
    * `len(gram) − (n−1)` computes.
    */
  private def gramKeys(toks: Array[String], n: Int): Array[String] = {
    val m = toks.length - n + 1
    val keys = new Array[String](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('\u0001')
        sb.append(toks(i + j)); j += 1
      }
      keys(i) = sb.toString
      i += 1
    }
    keys
  }

  private def topNgramFrac(toks: Array[String], n: Int, totC: Long): Double = {
    if (totC == 0 || toks.length < n) return 0.0
    val keys = gramKeys(toks, n)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < keys.length) {
      counts.merge(keys(i), 1, (a: Int, b: Int) => a + b); i += 1
    }
    var bestC = 0L; var bestL = 0L
    val it = counts.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      val l = cp(e.getKey) - (n - 1)
      if (c > bestC || (c == bestC && l > bestL)) { bestC = c; bestL = l }
    }
    if (bestC < 2) 0.0 else bestC.toDouble * bestL / totC
  }

  private def dupNgramFrac(toks: Array[String], tokLens: Array[Long],
                           n: Int, totC: Long): Double = {
    if (totC == 0 || toks.length < n) return 0.0
    val keys = gramKeys(toks, n)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < keys.length) {
      counts.merge(keys(i), 1, (a: Int, b: Int) => a + b); i += 1
    }
    val covered = new Array[Boolean](toks.length)
    i = 0
    while (i < keys.length) {
      if (counts.get(keys(i)) >= 2) {
        var j = i; val end = i + n
        while (j < end) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var cc = 0L
    i = 0
    while (i < toks.length) { if (covered(i)) cc += tokLens(i); i += 1 }
    cc.toDouble / totC
  }

  /** All thirteen signals of one document — the per-row kernel. */
  def compute(text: String): Signals = {
    if (text == null) return Zero
    val lines = text.split("\n", -1).filter(_.nonEmpty)
    val (dlf, dlcf) = dupUnitFracs(lines)
    val paras = text.split("\\n{2,}", -1).filter(_.nonEmpty)
    val (dpf, dpcf) = dupUnitFracs(paras)
    val toks = tokenize(text)
    val tokLens = toks.map(cp)
    var totC = 0L
    var i = 0
    while (i < tokLens.length) { totC += tokLens(i); i += 1 }
    Signals(
      dlf, dlcf, dpf, dpcf,
      topNgramFrac(toks, 2, totC),
      topNgramFrac(toks, 3, totC),
      topNgramFrac(toks, 4, totC),
      dupNgramFrac(toks, tokLens, 5, totC),
      dupNgramFrac(toks, tokLens, 6, totC),
      dupNgramFrac(toks, tokLens, 7, totC),
      dupNgramFrac(toks, tokLens, 8, totC),
      dupNgramFrac(toks, tokLens, 9, totC),
      dupNgramFrac(toks, tokLens, 10, totC))
  }

  private val signalsUdf = udf(compute _)

  /** The thirteen signals as one struct column. */
  def signals(textCol: Column): Column = signalsUdf(textCol)

  /** Append the signals as thirteen flat double columns. */
  def withSignals(df: DataFrame, textCol: String): DataFrame = {
    val tmp = "__graft_rep"
    (signalNames :+ tmp).foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    df.withColumn(tmp, signals(col(textCol)))
      .select(df.columns.map(col) ++
        signalNames.map(s => col(s"$tmp.$s").as(s)): _*)
  }

  // ------------------------------------------------------------------
  // The composed Gopher quality filter (paper table A1). Thresholds are
  // the published defaults; every rule is also exposed individually so
  // a pipeline can log per-rule rejection counts.
  // ------------------------------------------------------------------

  /** Gopher's required-stopword list (the document must contain at
    * least [[GopherThresholds.minStopwordHits]] of these as exact
    * whitespace tokens).
    */
  val stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  case class GopherThresholds(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9, maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8, minStopwordHits: Int = 2,
      maxDupLineFrac: Double = 0.30, maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20, maxDupParaCharFrac: Double = 0.20,
      maxTopNgramCharFrac: Map[Int, Double] =
        Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      maxDupNgramCharFrac: Map[Int, Double] =
        Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11,
          10 -> 0.10))

  /** Lexical rule inputs the existing feature sets don't provide:
    * fraction of words containing an ASCII letter, and the number of
    * DISTINCT [[stopwords]] present as exact tokens. Column algebra
    * only; the `filter` HOF runs once over the token array (this is a
    * coarse gate column, not a hot aggregation kernel).
    */
  def lexicalFeatures(textCol: Column): Seq[(String, Column)] = {
    val toks = when(textCol.isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(textCol, lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val n = size(toks)
    val alpha = size(filter(toks, t => regexp_count(t, lit("[A-Za-z]")) > 0))
    val hits = stopwords
      .map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)
    Seq(
      "alpha_word_ratio" ->
        when(n > 0, alpha.cast("double") / n).otherwise(lit(0.0)),
      "stopword_hits" -> hits.cast("long"))
  }

  /** English is Gopher's calibration language; CJK scripts break every
    * WORD-shaped rule under whitespace tokenization (an unsegmented
    * sentence is one huge "word": token counts collapse, mean word
    * length explodes, no ASCII letters, no English stopwords). This
    * preset disables the word-shape rules and keeps the rules that
    * survive the script change — line/paragraph duplication, bullet
    * and ellipsis line ratios, the n-gram character fractions — the
    * FineWeb-2-style per-language adaptation. A production deployment
    * would pair it with language-specific pre-segmentation; absent
    * that, disabling a meaningless rule beats silently rejecting an
    * entire script family.
    */
  val cjkThresholds: GopherThresholds = GopherThresholds(
    minWords = 1, maxWords = 100000,
    minMeanWordLen = 0.0, maxMeanWordLen = Double.PositiveInfinity,
    maxSymbolWordRatio = Double.PositiveInfinity,
    minAlphaWordRatio = 0.0, minStopwordHits = 0)

  /** Default per-language table for [[gopherFilterByLang]]: the CJK
    * codes [[LangId]] emits route to [[cjkThresholds]]; everything
    * else keeps the English-calibrated defaults.
    */
  val thresholdsByLanguage: Map[String, GopherThresholds] =
    Seq("zh", "ja", "ko").map(_ -> cjkThresholds).toMap

  /** Append every Gopher rule input column in ONE projection: the
    * [[withSignals]] repetition kernel, the
    * [[TextAnalysis.gopherLineFeatures]] line/word-shape columns, the
    * [[lexicalFeatures]] columns, and `tok_n`.
    */
  private def withRuleInputs(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val lineFeats = TextAnalysis.gopherLineFeatures(t)
    val lexFeats = lexicalFeatures(t)
    require(!df.columns.contains("gopher_pass"),
      "input already has a 'gopher_pass' column")
    (Seq("tok_n" -> F.tokenCount(t).cast("long")) ++
      lineFeats.filterNot(_._1 == "n_lines") ++ lexFeats)
      .foldLeft(withSignals(df, textCol)) { case (d, (n, c)) =>
        require(!df.columns.contains(n), s"input already has a '$n' column")
        d.withColumn(n, c)
      }
  }

  /** The composed pass predicate, with every threshold LIFTED to a
    * Column: `lit` for the single-table case, a language-keyed when
    * chain for [[gopherFilterByLang]] — so both paths share one rule
    * expression and cannot drift.
    */
  private def passColumn(lift: (GopherThresholds => Double) => Column,
                         topNs: Seq[Int], dupNs: Seq[Int]): Column =
    col("tok_n") >= lift(_.minWords.toDouble) &&
      col("tok_n") <= lift(_.maxWords.toDouble) &&
      col("mean_word_len") >= lift(_.minMeanWordLen) &&
      col("mean_word_len") <= lift(_.maxMeanWordLen) &&
      col("symbol_word_ratio") <= lift(_.maxSymbolWordRatio) &&
      col("bullet_line_ratio") <= lift(_.maxBulletLineRatio) &&
      col("ellipsis_line_ratio") <= lift(_.maxEllipsisLineRatio) &&
      col("alpha_word_ratio") >= lift(_.minAlphaWordRatio) &&
      col("stopword_hits") >= lift(_.minStopwordHits.toDouble) &&
      col("dup_line_frac") <= lift(_.maxDupLineFrac) &&
      col("dup_para_frac") <= lift(_.maxDupParaFrac) &&
      col("dup_line_char_frac") <= lift(_.maxDupLineCharFrac) &&
      col("dup_para_char_frac") <= lift(_.maxDupParaCharFrac) &&
      topNs.map { n =>
        col(s"top_${n}gram_char_frac") <= lift(_.maxTopNgramCharFrac(n))
      }.reduce(_ && _) &&
      dupNs.map { n =>
        col(s"dup_${n}gram_char_frac") <= lift(_.maxDupNgramCharFrac(n))
      }.reduce(_ && _)

  /** Append every Gopher rule input plus a single `gopher_pass` flag:
    * one scan, one UDF pass, zero shuffle.
    */
  def gopherFilter(df: DataFrame, textCol: String,
                   th: GopherThresholds = GopherThresholds()): DataFrame =
    withRuleInputs(df, textCol).withColumn("gopher_pass",
      passColumn(f => lit(f(th)),
        th.maxTopNgramCharFrac.keys.toSeq.sorted,
        th.maxDupNgramCharFrac.keys.toSeq.sorted))

  /** [[gopherFilter]] with per-LANGUAGE thresholds: each document's
    * rule bounds come from `byLang(langCol value)`, falling back to
    * `default` for unmapped (or null) languages. The thresholds lift
    * to a when-chain over the language column, so the whole thing is
    * still one codegen'd projection — no join, no shuffle, and a
    * corpus mixing 29 languages pays exactly what the monolingual
    * filter pays. Pair with [[thresholdsByLanguage]] for the stock
    * CJK adaptation.
    */
  def gopherFilterByLang(df: DataFrame, textCol: String, langCol: String,
                         byLang: Map[String, GopherThresholds] =
                           thresholdsByLanguage,
                         default: GopherThresholds = GopherThresholds())
  : DataFrame = {
    val topNs = default.maxTopNgramCharFrac.keys.toSeq.sorted
    val dupNs = default.maxDupNgramCharFrac.keys.toSeq.sorted
    byLang.foreach { case (l, th) =>
      require(th.maxTopNgramCharFrac.keySet == topNs.toSet &&
          th.maxDupNgramCharFrac.keySet == dupNs.toSet,
        s"per-language thresholds for '$l' must cover the same " +
          s"n-gram orders as the default table")
    }
    val lift: (GopherThresholds => Double) => Column = f =>
      byLang.toSeq.sortBy(_._1).foldLeft(lit(f(default))) {
        case (acc, (l, th)) =>
          when(col(langCol) === l, lit(f(th))).otherwise(acc)
      }
    withRuleInputs(df, textCol)
      .withColumn("gopher_pass", passColumn(lift, topNs, dupNs))
  }

  /** Rule-level observability: ONE aggregate row counting, per Gopher
    * rule, how many documents violate it (independently — a document
    * can fail several rules at once, so the columns are not a
    * partition), plus `n_docs` and `n_pass`. The rule inputs come from
    * [[gopherFilter]]'s single scan, so at any scale the report costs
    * one pass over the text plus a one-row aggregate with map-side
    * partial combine — the per-rule drop report a curation pipeline
    * logs before committing to thresholds. Empty input yields a
    * single all-zero row, never NULLs.
    */
  def ruleViolationCounts(df: DataFrame, textCol: String,
                          th: GopherThresholds = GopherThresholds())
  : DataFrame = {
    val g = gopherFilter(df, textCol, th)
    def fails(name: String, ok: Column): Column =
      coalesce(sum(when(!ok, 1L).otherwise(0L)), lit(0L)).as(s"fail_$name")
    val aggs = Seq(
      fails("words",
        col("tok_n") >= th.minWords && col("tok_n") <= th.maxWords),
      fails("mean_word_len",
        col("mean_word_len") >= th.minMeanWordLen &&
          col("mean_word_len") <= th.maxMeanWordLen),
      fails("symbol_ratio",
        col("symbol_word_ratio") <= th.maxSymbolWordRatio),
      fails("bullet_lines",
        col("bullet_line_ratio") <= th.maxBulletLineRatio),
      fails("ellipsis_lines",
        col("ellipsis_line_ratio") <= th.maxEllipsisLineRatio),
      fails("alpha_words",
        col("alpha_word_ratio") >= th.minAlphaWordRatio),
      fails("stopwords", col("stopword_hits") >= th.minStopwordHits),
      fails("dup_line", col("dup_line_frac") <= th.maxDupLineFrac),
      fails("dup_line_char",
        col("dup_line_char_frac") <= th.maxDupLineCharFrac),
      fails("dup_para", col("dup_para_frac") <= th.maxDupParaFrac),
      fails("dup_para_char",
        col("dup_para_char_frac") <= th.maxDupParaCharFrac)) ++
      th.maxTopNgramCharFrac.toSeq.sortBy(_._1).map { case (n, x) =>
        fails(s"top_${n}gram", col(s"top_${n}gram_char_frac") <= x)
      } ++
      th.maxDupNgramCharFrac.toSeq.sortBy(_._1).map { case (n, x) =>
        fails(s"dup_${n}gram", col(s"dup_${n}gram_char_frac") <= x)
      } ++
      Seq(coalesce(sum(when(col("gopher_pass"), 1L).otherwise(0L)), lit(0L))
        .as("n_pass"))
    g.agg(count(lit(1)).as("n_docs"), aggs: _*)
  }
}
