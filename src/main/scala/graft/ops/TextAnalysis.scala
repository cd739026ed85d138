package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Text-analysis operators for corpus curation — language ID, quality
  * scoring, token counting — as pure column expressions: single-scan,
  * codegen-friendly, no UDFs in the scoring path. All deterministic
  * (rule-based) so results are reproducible across runs and engines.
  */
object TextAnalysis {

  /** Marker-word sets per language. Deliberately small and transparent:
    * at 100 TB a scan with `array_intersect`-style counting beats any
    * model inference by orders of magnitude, and for pipeline routing
    * (keep/drop/bucket-by-language) transparent rules are debuggable.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Predicted language code by marker-hit argmax; deterministic tie
    * order en > es > de > fr; NULL text or zero hits → "unknown".
    * (The NULL branch must be explicit: NULL scores skip every `when`,
    * and without it a null document would fall through to the last
    * language's `otherwise` — silently labeled, not unknown.)
    */
  def languageId(textCol: Column): Column = {
    val toks = split(textCol, " ")
    val scores = Seq("en", "es", "de", "fr").map(l => l -> markerHits(toks, markers(l)))
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(textCol.isNull || best === 0, lit("unknown"))) {
      case (acc, (lang, score)) => acc.when(score === best, lit(lang))
    }.otherwise(lit("fr"))
  }

  /** Structural quality features: token count, punctuation/digit
    * ratios, stopword ratio, average token length, and a composite
    * score in [0, ~1.2]. All ratios over character length.
    */
  def qualityFeatures(textCol: Column): Seq[(String, Column)] = {
    val len = length(textCol).cast("double")
    val punct = length(textCol) - length(regexp_replace(textCol, "[.,!?;:]", ""))
    val digits = length(textCol) - length(regexp_replace(textCol, "[0-9]", ""))
    val toks = split(textCol, " ")
    val stop = markerHits(toks, markers("en"))
    val tokN = F.tokenCount(textCol)
    Seq(
      // long, matching repetitionFeatures' tok_n: the two feature sets
      // compose via the same foldLeft-withColumn pattern, and a shared
      // name with a different dtype would silently flip int32/int64
      // depending on fold order (the oracle compare is dtype-strict).
      //
      // Ratios guard their denominators: empty/whitespace-only/NULL
      // text measures as 0.0, never 0/0 = NaN — Spark's avg skips NULL
      // but PROPAGATES NaN, so one degenerate document would otherwise
      // poison its whole group's quality report.
      "tok_n" -> tokN.cast("long"),
      "punct_ratio" -> when(len > 0, punct / len).otherwise(lit(0.0)),
      "digit_ratio" -> when(len > 0, digits / len).otherwise(lit(0.0)),
      "stop_ratio" -> when(tokN > 0, stop.cast("double") / tokN).otherwise(lit(0.0)),
      "avg_tok_len" -> when(tokN > 0, (len - (tokN - 1)) / tokN).otherwise(lit(0.0)))
  }

  def qualityScore(punctRatio: Column, digitRatio: Column, stopRatio: Column): Column =
    round(lit(1.0) - punctRatio - digitRatio + least(stopRatio, lit(0.2)), 4)

  /** Encoding-damage signals — the mojibake/corruption tells a crawl
    * pipeline filters on before any content-quality rule (a page whose
    * bytes were mangled in transit scores plausibly on length/stopword
    * features while being garbage):
    *
    *  - `replacement_char_ratio`: U+FFFD per character — the decoder
    *    already said "this byte sequence was invalid";
    *  - `control_char_ratio`: C0 controls (minus \t\n\r, which are
    *    legitimate text) + DEL + C1 per character — binary-in-text and
    *    double-decode damage;
    *  - `mojibake_ratio`: UTF-8-read-as-Latin-1/cp1252 artifacts per
    *    character — `Ã`/`Â`/`â€` followed by a Latin-1-supplement
    *    continuation is the signature of é→Ã©, ü→Ã¼, '→â€™.
    *
    * Pure `regexp_count` column algebra; every pattern is `\x{...}`
    * class escapes shared verbatim by Java regex and RE2. NULL/empty
    * text measures 0.0 ratios (the [[qualityFeatures]] NaN contract).
    */
  def encodingQualityFeatures(textCol: Column): Seq[(String, Column)] = {
    val n = when(textCol.isNull, lit(0)).otherwise(length(textCol))
    def ratio(cnt: Column): Column =
      when(n === 0, lit(0.0))
        .otherwise(coalesce(cnt, lit(0)).cast("double") / n)
    val repl = regexp_count(textCol, lit("\\x{FFFD}"))
    val ctrl = regexp_count(textCol,
      lit("[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}" +
        "\\x{007F}-\\x{009F}]"))
    val moji = regexp_count(textCol,
      lit("[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00FF}]|" +
        "\\x{00E2}\\x{20AC}"))
    Seq(
      "replacement_char_ratio" -> ratio(repl),
      "control_char_ratio" -> ratio(ctrl),
      "mojibake_ratio" -> ratio(moji))
  }

  /** Unicode text normalization — the canonical pre-dedup fold (C4 and
    * CCNet normalize before hashing; without it `"don’t"` and `"don't"`
    * are different shingles and near-dup recall silently drops):
    *
    *  - curly/prime quotes → ASCII `'` / `"`;
    *  - hyphen/dash family (U+2010–U+2015, U+2212) → `-`;
    *  - ellipsis char → `...`;
    *  - NBSP + Unicode space family → plain space;
    *  - zero-width chars (ZWSP/ZWNJ/ZWJ/BOM) and soft hyphen → removed
    *    (invisible, but they split tokens and defeat exact-dedup);
    *  - whitespace runs collapsed to one space, ends trimmed.
    *
    * Case is deliberately NOT folded — that's a semantic choice the
    * caller makes (`lower(normalizeText(c))` for dedup keys; raw case
    * for training text). Pure `regexp_replace` chain — codegen'd, no
    * UDF; every class is `\x{...}` escapes shared by Java regex and
    * RE2, and the whitespace class is explicit (Java `\s` and RE2 `\s`
    * disagree on U+000B). NULL stays NULL.
    */
  def normalizeText(c: Column): Column =
    trim(normalizeFold.foldLeft(c) {
      case (acc, (pat, rep)) => regexp_replace(acc, pat, rep)
    })

  /** End-of-line DEhyphenation — the scanned/column-layout repair
    * every PDF-extracted corpus needs (`exam-⏎ple` is one token to a
    * human and two to a tokenizer). The standard conservative rule:
    *
    *  - letter `-` ⏎ lowercase-letter → JOIN, hyphen dropped (a
    *    typesetter's line break inside a word);
    *  - letter `-` ⏎ uppercase/digit → join KEEPING the hyphen (a
    *    true compound split across lines: `state-⏎Machine`);
    *  - everything else — blank lines, mid-line hyphens, lines not
    *    ending in a hyphen — untouched (paragraph structure
    *    survives).
    *
    * Trailing spaces before and indentation after the break are
    * absorbed. Pure `regexp_replace` chain — codegen'd, no UDF;
    * NULL stays NULL.
    */
  def dehyphenate(c: Column): Column =
    regexp_replace(
      regexp_replace(c,
        "(\\p{L})-[ \\t]*\\r?\\n[ \\t]*(\\p{Ll})", "$1$2"),
      "(\\p{L})-[ \\t]*\\r?\\n[ \\t]*(\\p{Lu}|[0-9])", "$1-$2")

  /** C4-style within-document line dedup: drop every line that already
    * appeared earlier in the SAME document, keeping first occurrences
    * in order (the C4 "deduplicate lines within a page" rule —
    * navigation chrome, repeated footers, boilerplate menus collapse
    * to one copy). NULL stays NULL.
    *
    * Pure per-row higher-order-function algebra (split → indexed
    * filter on first-occurrence position → join): no shuffle,
    * O(lines²) comparisons per document in the worst case — bounded by
    * document size, never by corpus size. The split array is bound
    * ONCE as a lambda variable (the single-element `transform` wrap):
    * referencing the `split` expression directly inside the filter
    * lambda would re-split the whole document per line — lambda bodies
    * re-evaluate their subtrees per element, there is no
    * common-subexpression elimination — turning the per-document cost
    * cubic-ish on line count. NULL stays NULL (the null array
    * propagates through the lambda body). Cross-corpus segment dedup
    * is [[Dedup.dedupSegments]]'s job; this is the intra-document
    * complement. SQL surface: `dedup_lines`
    * ([[graft.GraftExtensions]] builds the identical catalyst tree;
    * GraftExtensionsSpec pins the two surfaces equal).
    */
  def dedupLines(c: Column): Column =
    element_at(
      transform(array(split(c, "\n")), a =>
        array_join(filter(a, (x, i) => array_position(a, x) === i + 1),
          "\n")),
      1)

  /** The [[normalizeText]] fold as an ordered (pattern → replacement)
    * table — the single source of truth shared by the Column API above
    * and the `normalize_text` SQL registration
    * ([[graft.GraftExtensions]]), so the two surfaces cannot drift.
    * Order matters: the whitespace-run collapse must run LAST (earlier
    * rules emit the spaces it collapses).
    */
  val normalizeFold: Seq[(String, String)] = Seq(
    "[\\x{2018}\\x{2019}\\x{201A}\\x{201B}\\x{2032}]" -> "'",
    "[\\x{201C}\\x{201D}\\x{201E}\\x{201F}\\x{2033}]" -> "\"",
    "[\\x{2010}-\\x{2015}\\x{2212}]" -> "-",
    "\\x{2026}" -> "...",
    "[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]" -> " ",
    "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{00AD}]" -> "",
    "[ \\t\\n\\r\\f\\x{000B}]+" -> " ")

  /** Homoglyph fold pair — Cyrillic and Greek letters whose standard
    * glyphs are indistinguishable from Latin (the UCD confusables
    * core): the table adversarial spam uses to slip identical text
    * past exact/dedup keys ("sосiаl" with Cyrillic о/а hashes as a
    * different document). Written as parallel from/to strings for ONE
    * codegen `translate` — both engines have it. Deliberately NOT
    * applied to stored text (folding real Cyrillic prose to Latin
    * destroys it); this is a KEY transform.
    */
  val homoglyphFrom: String =
    "аеорсухіјѕ" + // а е о р с у х і ј ѕ
      "АВЕКМНОРСТУХ" + // А В Е К М Н О Р С Т У Х
      "οΑΒΕΖΗΙΚΜΝΟΡΤΥΧ" // ο Α Β Ε Ζ Η Ι Κ Μ Ν Ο Ρ Τ Υ Χ
  val homoglyphTo: String =
    "aeopcyxijs" + "ABEKMHOPCTYX" + "oABEZHIKMNOPTYX"

  /** Fold confusable Cyrillic/Greek homoglyphs to their Latin
    * lookalikes — see [[homoglyphFrom]].
    */
  def foldHomoglyphs(c: Column): Column =
    translate(c, homoglyphFrom, homoglyphTo)

  /** Robust exact-dedup key: homoglyph fold → [[normalizeText]]
    * (typographic/space fold) → lowercase → digit runs to `0`. Two
    * documents that differ only by confusable scripts, curly
    * punctuation, space flavors, case, or serial numbers land on ONE
    * key — the hash basis for [[graft.ops.Dedup]]'s exact family when
    * the corpus is adversarial or noisily retyped. Pure codegen column
    * algebra (translate + the shared fold table + two regexes), fully
    * SQL-mirrorable; width/ligature variants are [[UnicodeNorm.nfkc]]'s
    * job and deliberately out of this key (NFKC is not expressible in
    * the oracle's engine — compose the two when that matters).
    */
  def robustDedupKey(c: Column): Column =
    regexp_replace(lower(normalizeText(foldHomoglyphs(c))), "[0-9]+", "0")

  /** Hashed-feature LINEAR quality classifier — the scoring half of the
    * fastText-style model every published curation pipeline (CCNet,
    * RefinedWeb, FineWeb) runs after the rule-based filters: tokens
    * hash into `weights.length` buckets (the hashing trick — no
    * vocabulary file ships with the job, collisions are part of the
    * model), the document's score is
    * `sigmoid(bias + mean(weights[bucket(token)]))`, and training
    * happens OFFLINE (a logistic regression over the same hashed
    * features on a labeled sample) — at 100 TB inference must be a
    * column expression on the scan, never model-server calls.
    *
    * Pure column algebra: one `regexp_extract_all` tokenize, the
    * per-token bucket through the codegen'd sha-256 kernel
    * ([[graft.functions.LabelHashBucket]] — unsigned-64 prefix mod,
    * SQL-replicable), a higher-order `transform`/`aggregate` dot
    * product against the weight-array LITERAL riding in the plan
    * (broadcast-free: |weights| is model-sized, thousands at most).
    * Zero-token and NULL documents score `sigmoid(bias)` — the model's
    * prior, not NULL. Tokens the bucket kernel maps to its -1 sentinel
    * are excluded by filtering on the BUCKET VALUE itself (not a
    * re-implementation of the sentinel rule): the kernel sentinels
    * anything that JVM-trims to empty or to "nan" case-insensitively —
    * e.g. a lone vertical tab (not in the whitespace split class) or
    * "nan\u0001" — and a literal `element_at(w, -1 + 1)` on any such
    * token would throw at runtime on exactly the damaged crawl text
    * this scorer exists to process.
    */
  def hashedLinearScore(textCol: Column, weights: Seq[Double],
                        bias: Double = 0.0): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val d = weights.length
    val w = typedLit(weights.toArray)
    val toks =
      when(textCol.isNull, array().cast("array<string>"))
        .otherwise(regexp_extract_all(textCol,
          lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val buckets = filter(transform(toks, t => F.labelBucket(t, d)),
      b => b >= 0)
    val summed = aggregate(buckets, lit(0.0),
      (acc, b) => acc + element_at(w, b + 1))
    val n = size(buckets)
    val z = lit(bias) + when(n === 0, lit(0.0)).otherwise(summed / n)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** A loaded linear model for [[hashedLinearScore]]: the bridge that
    * lets OFFLINE-trained weights (fastText-style hashed-feature
    * logistic regression, exported from any training stack) drive the
    * scoring expression without recompiling. `score` is the same
    * codegen'd column the inline-literal path produces.
    */
  final case class LinearModel(weights: Seq[Double], bias: Double) {
    def score(textCol: Column): Column =
      hashedLinearScore(textCol, weights, bias)
  }

  /** Load [[LinearModel]] weights from a file the training side wrote.
    * Two public contracts, dispatched on extension:
    *
    *  - `*.json`: one object `{"bias": b, "weights": [w0, w1, …]}` —
    *    the shape Python training code naturally dumps;
    *  - otherwise parquet: rows `(idx int, weight double)` with idx
    *    0-based dense for the weight vector and the single row
    *    idx = -1 carrying the bias (absent → bias 0.0).
    *
    * Weights are model-sized (the hash-bucket dimension, thousands at
    * most), so the driver collect here is bounded by contract — the
    * vector has to reach every task as a literal anyway. Loud
    * validation: non-empty, dense, finite — a NaN weight would
    * otherwise poison every score downstream silently.
    */
  def loadWeights(spark: org.apache.spark.sql.SparkSession,
                  path: String): LinearModel = {
    val model =
      if (path.toLowerCase.endsWith(".json")) {
        val df = spark.read.option("multiLine", "true").json(path)
        require(df.columns.contains("weights") && df.columns.contains("bias"),
          s"$path must hold one object with 'weights' and 'bias' fields")
        val row = df.select(col("bias").cast("double"),
          col("weights").cast("array<double>")).head()
        require(!row.isNullAt(0) && !row.isNullAt(1),
          s"$path: bias/weights must be non-null")
        // element-level guard: a null INSIDE the array survives the
        // row-level check and would NPE on unboxing in the finiteness
        // require — fail loud with the path instead
        val raw = row.getSeq[Any](1)
        require(raw.forall(_ != null),
          s"$path: weights array contains null elements")
        LinearModel(raw.map(_.asInstanceOf[java.lang.Double].doubleValue),
          row.getDouble(0))
      } else {
        val rows = spark.read.parquet(path)
          .select(col("idx").cast("int"), col("weight").cast("double"))
          .collect()
        require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
          s"$path: idx/weight must be non-null")
        val (biasRows, wRows) = rows.partition(_.getInt(0) < 0)
        require(biasRows.forall(_.getInt(0) == -1),
          s"$path: negative idx other than the -1 bias row")
        require(biasRows.length <= 1, s"$path: multiple bias rows")
        val sorted = wRows.sortBy(_.getInt(0))
        require(sorted.map(_.getInt(0)).toSeq == sorted.indices,
          s"$path: weight idx must be dense 0..d-1")
        LinearModel(sorted.map(_.getDouble(1)).toSeq,
          biasRows.headOption.map(_.getDouble(1)).getOrElse(0.0))
      }
    require(model.weights.nonEmpty, s"$path: empty weight vector")
    require(model.weights.forall(w => !w.isNaN && !w.isInfinite) &&
      !model.bias.isNaN && !model.bias.isInfinite,
      s"$path: non-finite weight or bias")
    model
  }

  /** Write a [[LinearModel]] in the parquet contract [[loadWeights]]
    * reads — round-trip support for pipelines that re-export a model
    * alongside their outputs.
    */
  def saveWeights(spark: org.apache.spark.sql.SparkSession,
                  model: LinearModel, path: String): Unit = {
    import spark.implicits._
    (model.weights.zipWithIndex.map { case (w, i) => (i, w) } :+
      ((-1, model.bias)))
      .toDF("idx", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Train the [[hashedLinearScore]] model IN-ENGINE: full-batch
    * logistic-regression gradient descent over exactly the features
    * the scorer evaluates — per-document MEAN of token hash-bucket
    * weights plus a bias, through a sigmoid (the fastText linear
    * recipe). Closes the loop with [[saveWeights]]/[[loadWeights]]:
    * label a sample (an LLM judge, heuristics, a reference corpus vs
    * crawl — the CCNet/FineWeb pattern), train here, save, and the
    * same t15 scoring expression serves the model.
    *
    * Scale shape: features are computed ONCE — one explode +
    * `(id, bucket)` aggregate — and cached; each iteration is then
    * two keyed aggregates (scores per doc via a broadcast d-row
    * weight frame, gradients per bucket) plus a d-bounded collect,
    * exactly the k-means training-loop precedent: driver state is the
    * d-vector the model ships as anyway, data rows never collect.
    * Full-batch (not SGD) keeps every iteration deterministic given
    * the dataset — no shuffling-order dependence beyond float-sum
    * jitter, which the 4-dp gate rounding absorbs.
    *
    * `labelCol` must be 0/1 (castable to double). Documents with no
    * scorable tokens still train the bias (their z is the bias alone,
    * like the scorer's empty-text path).
    */
  def trainQualityWeights(df: DataFrame, idCol: String, textCol: String,
                          labelCol: String, dim: Int, iters: Int = 5,
                          lr: Double = 1.0): LinearModel = {
    require(dim > 0 && dim <= (1 << 20), s"dim out of range: $dim")
    require(iters >= 1 && iters <= 1000, s"iters out of range: $iters")
    require(lr > 0 && lr.isFinite, s"lr must be positive finite: $lr")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val bks = filter(transform(toks, t => F.labelBucket(t, dim)),
      b => b >= 0)
    val base = df.select(col(idCol).as("__id"),
      col(labelCol).cast("double").as("__y"), bks.as("__bks"))
      .withColumn("__n", size(col("__bks")))
    val labels = base.select("__id", "__y").cache()
    val feats = base.filter(col("__n") > 0)
      .select(col("__id"), explode(col("__bks")).as("__b"), col("__n"))
      .groupBy("__id", "__b")
      .agg((count(lit(1)).cast("double") / max("__n")).as("__x"))
      .cache()
    val nDocs = labels.count().toDouble
    require(nDocs > 0, "cannot train on an empty frame")

    val w = Array.fill(dim)(0.0)
    var bias = 0.0
    var it = 0
    while (it < iters) {
      val wDf = broadcast(w.zipWithIndex
        .map { case (wt, b) => (b, wt) }.toSeq.toDF("__b", "__w"))
      val zsum = feats.join(wDf, "__b")
        .groupBy("__id").agg(sum(col("__x") * col("__w")).as("__z"))
      val resid = labels.join(zsum, Seq("__id"), "left")
        .select(col("__id"),
          (lit(1.0) / (lit(1.0) +
            exp(-(lit(bias) + coalesce(col("__z"), lit(0.0))))) -
            col("__y")).as("__r"))
      // two actions read resid (bucket gradients + bias gradient) —
      // cache it for the iteration or the score join runs twice
      resid.cache()
      val gradRows = resid.join(feats, "__id")
        .groupBy("__b").agg(sum(col("__r") * col("__x")).as("__g"))
        .as[(Int, Double)].collect() // ≤ dim rows, the model's own size
      val biasGrad = resid.agg(avg("__r")).head.getDouble(0)
      resid.unpersist()
      gradRows.foreach { case (b, g) => w(b) -= lr * (g / nDocs) }
      bias -= lr * biasGrad
      it += 1
    }
    feats.unpersist()
    labels.unpersist()
    LinearModel(w.toSeq, bias)
  }

  /** Repetition signals — the published web-curation rules (Gopher's
    * repetition filters, RefinedWeb's duplicate-n-gram fractions) as
    * pure column algebra, one scan, no UDF:
    *
    *  - `tok_repeat_ratio`: fraction of tokens that are repeats of an
    *    earlier token, `1 - distinct/total` (0 for empty text);
    *  - `dup_ngram_ratio`: same over word `ngram`-grams — boilerplate
    *    and looped generations score high here long before exact dedup
    *    would catch them.
    *
    * Thresholding happens downstream (`filter(col("dup_ngram_ratio") >
    * 0.3)` or similar); the operator only measures.
    */
  def repetitionFeatures(textCol: Column, ngram: Int = 2): Seq[(String, Column)] = {
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    // NULL text measures as empty (0 tokens, 0.0 ratios), matching
    // tokenCount's contract — not as NULL ratios that poison averages.
    // Explicit whitespace class, not \S — Java/RE2 parity, see
    // TextHash.tokens.
    val toks = when(textCol.isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(textCol, lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val n = size(toks)
    // n-grams as arrays_zip of `ngram` shifted views, NOT
    // transform(sequence(...), i => slice...): higher-order functions
    // are CodegenFallback (interpreted per row per element) and the
    // lambda does an O(ngram) slice per position — the zip is plain
    // codegen'd expressions, structs compare without building strings,
    // and slice with a 0 length yields the empty array so short texts
    // need no special case.
    val m = greatest(n - (ngram - 1), lit(0))
    val grams = arrays_zip((1 to ngram).map(j => slice(toks, lit(j), m)): _*)
    val g = size(grams)
    def ratio(total: Column, distinct: Column): Column =
      when(total === 0, lit(0.0))
        .otherwise(lit(1.0) - distinct.cast("double") / total.cast("double"))
    Seq(
      "tok_n" -> n.cast("long"),
      "tok_repeat_ratio" -> ratio(n, size(array_distinct(toks))),
      "dup_ngram_ratio" -> ratio(g, size(array_distinct(grams))))
  }

  /** Gopher-style LINE-level quality signals (Rae et al. 2021 §A1.1:
    * bullet/ellipsis line fractions, mean word length, symbol-to-word
    * ratio) as pure column expressions — the remaining standard rules
    * [[qualityFeatures]] and [[repetitionFeatures]] don't cover.
    * Single scan, all `regexp_count`/`length` built-ins (no HOF
    * lambdas in the hot path).
    *
    * Regex parity notes (Java ⇄ RE2, same contract as
    * [[graft.functions.TextHash.tokens]]): `(?m)` anchors per line in
    * both engines; the ellipsis rule carries `\r?` so CRLF texts agree
    * (Java treats `\r\n` as one terminator, RE2 anchors only at `\n`);
    * mean word length derives from the explicit whitespace class, not
    * `\s`. NULL text measures as zeros.
    */
  def gopherLineFeatures(textCol: Column): Seq[(String, Column)] = {
    val t = coalesce(textCol, lit(""))
    val tokN = F.tokenCount(textCol)
    val nLines = when(textCol.isNull, lit(0)).otherwise(size(split(t, "\n")))
    val bullet = regexp_count(t, lit("(?m)^[ \\t]*[-*\u2022]"))
    val ellipsis = regexp_count(t, lit("(?m)(\\.\\.\\.|\u2026)\\r?$"))
    val nonspaceChars = length(regexp_replace(t, "[ \\t\\n\\f\\r]+", ""))
    val symbols = regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    Seq(
      "n_lines" -> nLines.cast("long"),
      "bullet_line_ratio" -> ratio(bullet, nLines),
      "ellipsis_line_ratio" -> ratio(ellipsis, nLines),
      "mean_word_len" -> ratio(nonspaceChars, tokN),
      "symbol_word_ratio" -> ratio(symbols, tokN))
  }

  /** Corpus-level vocabulary statistics in ONE token shuffle:
    * total token occurrences, vocabulary size, hapax count (tokens
    * occurring exactly once — the Zipf tail that dominates vocab
    * size), and the highest term frequency. The inner aggregate is a
    * `groupBy(token)` with map-side partial combine; the outer reduces
    * |vocab| tiny rows to one.
    *
    * 100 TB note: the exact shape shuffles one row per distinct token
    * per partition after partial aggregation — fine for natural-
    * language vocabularies (≤ ~10^8 terms). If only the cardinality is
    * needed, `approx_count_distinct` over exploded tokens avoids the
    * exact groupBy entirely.
    */
  def corpusVocabStats(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        when(col(textCol).isNull, array().cast("array<string>"))
          .otherwise(regexp_extract_all(col(textCol),
            lit("[^ \\t\\n\\f\\r]+"), lit(0)))).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__n"))
      .agg(
        sum("__n").as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("__n") === 1, 1).otherwise(0)).as("n_hapax"),
        max("__n").as("max_token_freq"))

  /** Readability scores (Flesch 1948 / Kincaid et al. 1975) — the
    * classic document-difficulty signals an instruction-data or
    * educational-corpus filter thresholds on:
    *
    *   reading_ease = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    *   fk_grade     = 0.39·(W/S) + 11.8·(Y/W) − 15.59
    *
    * with S = sentences ([[splitSentences]] — the same cascade the t42
    * gate pins), W = whitespace tokens, Y = syllable estimate. The
    * syllable rule is the published vowel-group heuristic, chosen to
    * be Java-regex ⇄ RE2 mirrorable: per token, count `[aeiouy]+`
    * runs (case-insensitive), subtract one for a silent final `e`
    * (final `e` after a consonant other than `l` — "cake" 1, "table"
    * 2), floor at one syllable. Tokens without letters count one.
    *
    * One codegen projection per row (sentence cascade + an aggregate
    * HOF over the token array), no shuffle. Documents with no tokens
    * return NULL scores rather than dividing by zero. Scores rounded
    * to 4 dp (cross-engine double parity, the t8 precedent).
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksArr = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    // letters only per token, so "nice." still triggers the silent-e
    // rule and "don't" counts its one vowel group
    val sylOf = (t0: Column) => {
      val t = regexp_replace(t0, "[^A-Za-z]", "")
      greatest(
        regexp_count(t, lit("(?i)[aeiouy]+")) -
          when(t.rlike("(?i)[bcdfghjkmnpqrstvwxz]e$"), lit(1))
            .otherwise(lit(0)),
        lit(1))
    }
    val base = df.select(col(idCol),
      size(splitSentences(col(textCol))).cast("long").as("n_sents"),
      size(toksArr).cast("long").as("n_words"),
      aggregate(toksArr, lit(0L), (acc, t) => acc + sylOf(t).cast("long"))
        .as("n_syllables"))
    val ws = col("n_words").cast("double") / col("n_sents")
    val yw = col("n_syllables").cast("double") / col("n_words")
    base.select(col(idCol), col("n_sents"), col("n_words"), col("n_syllables"),
      when(col("n_words") > 0 && col("n_sents") > 0,
        round(lit(206.835) - lit(1.015) * ws - lit(84.6) * yw, 4))
        .as("reading_ease"),
      when(col("n_words") > 0 && col("n_sents") > 0,
        round(lit(0.39) * ws + lit(11.8) * yw - lit(15.59), 4))
        .as("fk_grade"))
  }

  /** Zipf-law corpus card: fit `ln f = intercept + slope · ln r` by
    * exact least squares over the full rank-frequency table (rank 1 =
    * most frequent; ties rank by term ascending so both engines
    * derive the identical permutation). A healthy natural-language
    * corpus fits slope ≈ −1; template/boilerplate farms flatten the
    * head (slope → 0) and OCR noise fattens the tail — one cheap
    * number that flags a corrupt crawl slice before any per-doc rule.
    *
    * Scale shape: token explode → term counts (one shuffle), then the
    * GLOBAL rank is two-level — `n_higher` = types with a strictly
    * larger count, from a cumulative sum over the count-of-counts
    * frame (|distinct counts| rows — heavy-tailed, thousands at any
    * corpus size — the c11 bucket-scan precedent for the one small
    * single-partition window), plus a row_number over the (count)
    * partition for ties. Never a global single-partition sort of the
    * vocabulary. `minCount` trims the noise tail before fitting
    * (hapax ranks are dominated by tokenization accidents).
    *
    * One row: `(n_types, n_fit_types, n_tokens, zipf_slope,
    * zipf_intercept)`, slope/intercept rounded to 4 dp (the t8
    * precedent for cross-engine double parity).
    */
  def zipfCard(df: DataFrame, textCol: String,
               minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val termC = df.select(explode(
        when(col(textCol).isNull, array().cast("array<string>"))
          .otherwise(regexp_extract_all(col(textCol),
            lit("[^ \\t\\n\\f\\r]+"), lit(0)))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // count-of-counts → types with a strictly larger count
    val cumW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__n").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val higher = termC.groupBy("__n").agg(count(lit(1)).as("__types"))
      .withColumn("__n_higher", coalesce(sum("__types").over(cumW), lit(0L)))
      .select(col("__n"), col("__n_higher"))
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy("__n").orderBy("__t")
    val ranked = termC.filter(col("__n") >= minCount)
      .withColumn("__tie", row_number().over(tieW))
      .join(broadcast(higher), Seq("__n"))
      .withColumn("__r", (col("__n_higher") + col("__tie")).cast("double"))
    val x = log(col("__r"))
    val y = log(col("__n").cast("double"))
    val fit = ranked.agg(
      count(lit(1)).as("__m"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
    val slope = (col("__sxy") - col("__sx") * col("__sy") / col("__m")) /
      (col("__sxx") - col("__sx") * col("__sx") / col("__m"))
    val icept = col("__sy") / col("__m") - slope * col("__sx") / col("__m")
    val totals = termC.agg(count(lit(1)).as("n_types"),
      sum("__n").as("n_tokens"))
    // The card is ONE row: materialize it eagerly so termC (the only
    // corpus-scale cache here) can be released before returning,
    // instead of leaking a MEMORY_AND_DISK frame per call (the
    // Dedup persist/finally pattern — result stays a DataFrame via
    // a 1-row local relation).
    val spark = df.sparkSession
    try {
      val row = ScalarFold.withScalars(totals, fit)
        .select(col("n_types"), col("__m").as("n_fit_types"),
          col("n_tokens"), round(slope, 4).as("zipf_slope"),
          round(icept, 4).as("zipf_intercept"))
        .collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(row.toSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_types",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_fit_types",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_tokens",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("zipf_slope",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("zipf_intercept",
            org.apache.spark.sql.types.DoubleType))))
    } finally { termC.unpersist(); () }
  }

  /** Per-document TF-IDF over whitespace tokens (same `[^ \t\n\f\r]+`
    * class as every other text operator): one row per (doc, term) with
    * raw term frequency, document frequency, and
    * `tfidf = tf · ln(N / df)`. NULL text contributes no terms but
    * still counts toward N (it is a document of the corpus).
    *
    * Shape: two keyed aggregations — (id, term) for tf, then (term)
    * for df, both with map-side partial combine — and an equi-join on
    * term that AQE broadcasts when the vocabulary is small. N rides a
    * one-row broadcast frame, not a driver action, so the whole thing
    * stays one lazy plan. At 100 TB the tf shuffle carries one row per
    * distinct (doc, term) — already sublinear in corpus bytes — and the
    * vocabulary join is the same |vocab|-bounded frame as
    * [[corpusVocabStats]].
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Seq("__graft_n", "term", "tf", "n_docs_with_term", "tfidf").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val tf = df.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term")
      .agg(count(lit(1)).as("n_docs_with_term"))
    // N rides a ONE-ROW broadcast frame, kept lazy instead of a
    // driver-side count() action; ScalarFold's non-foldable constant
    // key makes it a BroadcastHashJoin, not a nested loop.
    val nDocs = df.agg(count(lit(1)).as("__graft_n"))
    ScalarFold.withScalars(tf.join(docFreq, "term"), nDocs)
      .withColumn("tfidf",
        col("tf") * log(col("__graft_n").cast("double") / col("n_docs_with_term")))
      .select(col(idCol), col("term"), col("tf"),
        col("n_docs_with_term"), col("tfidf"))
  }

  /** BM25 relevance of every document against a fixed query-term bag
    * (Robertson & Zaragoza 2009, "The Probabilistic Relevance
    * Framework: BM25 and Beyond") — the ranking a curation pipeline
    * uses to pull domain-relevant documents toward a target topic
    * (complementing [[Curation.importanceWeights]]' DSIR view):
    *
    * `bm25 = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`
    * with the always-non-negative `idf = ln(1 + (N−df+0.5)/(df+0.5))`,
    * so a document scores 0 iff it matches no query term.
    *
    * Scale shape: corpus statistics (N, total token count, one
    * document frequency per query term) are ONE aggregate collapsing
    * to a single row, carried back on a one-row `crossJoin(broadcast)`
    * (the waived t8_tfidf shape — each task loops over exactly one
    * broadcast row, kept lazy instead of a driver action). Scoring is
    * then a pure map stage: per-row `tf` via a `filter` HOF over the
    * token array, O(|terms| · tokens) per row with |terms| query-sized
    * — no (doc, term) shuffle at all, unlike the [[tfidf]] shape,
    * because the term set is fixed up front. NULL text scores 0 and
    * still counts toward N and avgdl.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
  : DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    require(k1 >= 0 && b >= 0 && b <= 1, s"invalid k1=$k1 b=$b")
    val reserved = Seq("n_tok", "bm25", "__graft_toks", "__graft_n",
      "__graft_toktot") ++ terms.indices.map(i => s"__graft_df$i")
    reserved.foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    // Tokenize ONCE into a bound column — the per-term tf lambdas then
    // walk the materialized array instead of re-running the regex
    // |terms| times per row.
    val toked = df.withColumn("__graft_toks",
      when(col(textCol).isNull, array().cast("array<string>"))
        .otherwise(regexp_extract_all(col(textCol),
          lit("[^ \\t\\n\\f\\r]+"), lit(0))))
    val toks = col("__graft_toks")
    val stats = toked.agg(
      count(lit(1)).as("__graft_n"),
      sum(size(toks)).cast("long").as("__graft_toktot") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(toks, t), 1).otherwise(0))
            .as(s"__graft_df$i")
        }: _*)
    // avgdl guard: an all-empty corpus divides by it — any positive
    // stand-in works because every tf is 0 there and the tf>0 gate
    // below already forces the score to 0.
    val avgdl = when(col("__graft_toktot") > 0,
      col("__graft_toktot").cast("double") / col("__graft_n"))
      .otherwise(lit(1.0))
    val dl = col("n_tok").cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = col(s"__graft_df$i").cast("double")
      val tf = size(filter(toks, x => x === t)).cast("double")
      val idf = log(lit(1.0) +
        (col("__graft_n").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      // tf = 0 contributes EXACTLY 0, never 0/0: with k1 = 0 (allowed)
      // the denominator is tf alone, and with b = 1 a zero-token
      // document zeroes it too — both legal parameter points would
      // otherwise emit NaN instead of the documented 0.
      when(tf > 0,
        idf * (tf * lit(k1 + 1)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl)))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    ScalarFold.withScalars(
        toked.withColumn("n_tok", size(toks).cast("long")), stats)
      .withColumn("bm25", score)
      .drop("__graft_toks", "__graft_n", "__graft_toktot")
      .drop(terms.indices.map(i => s"__graft_df$i"): _*)
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * adjacent word pairs scored by `ln(P(w1,w2) / (P(w1)·P(w2)))` with
    * `P(w1,w2) = c12/B` over bigram instances and `P(w) = c/T` over
    * token instances. Returns the `topK` pairs with `c12 ≥ minCount`
    * as `(w1, w2, n_pair, pmi)` — pmi rounded to 4 dp, ties broken by
    * `(w1, w2)` so the cut is total-ordered and deterministic.
    *
    * 100 TB shape: bigram and unigram counts are each ONE shuffle on
    * their key (the bigram explode reuses the same tokenization scan);
    * the unigram frame joins back by `w1`/`w2` (vocabulary-sized —
    * sort-merge at web scale, AQE-broadcast at gate scale); `T`/`B`
    * ride as a one-row broadcast. The final top-K is a
    * TakeOrderedAndProject, not a global sort.
    */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5L, topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be ≥ 1: $minCount")
    require(topK >= 1, s"topK must be ≥ 1: $topK")
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    // Shape note (r18, measured): persisting the unigram and pair
    // aggregates and eagerly truncating the topK result — the §2.4
    // "one tokenize pass per view" rewrite — measured 1.29→1.68 s on
    // t39 (3-iter A/B, same session): the extra cache+checkpoint
    // materialization jobs cost more than the saved tokenize passes at
    // this scale, the same trade r17 measured and rejected for the
    // DSIR weights (c17). The lazy multi-consumer shape stays.
    val words = df.select(explode(toks).as("w"))
    val uni = words.groupBy("w").agg(count(lit(1)).as("c"))
    // adjacent pairs: zip the token array against itself shifted by one
    val pairs = df.select(explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    // T and B as one one-row frame (two scalar aggs, broadcast once)
    val totals = ScalarFold.withScalars(uni.agg(sum("c").as("__t")),
      pairs.agg(count(lit(1)).as("__b")))
    ScalarFold.withScalars(bi
      .join(uni.select(col("w").as("w1"), col("c").as("__c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("__c2")), "w2"),
      totals)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(
          log(col("n_pair").cast("double") / col("__b")) -
            log(col("__c1").cast("double") / col("__t")) -
            log(col("__c2").cast("double") / col("__t")), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-group vocabulary coverage report — the corpus card a
    * tokenizer owner reads before retraining: `(group, n_tokens,
    * n_oov, oov_rate, n_distinct_oov)` where OOV means the WHOLE
    * whitespace word is absent from `vocab` (exact membership — the
    * budget-accurate segmentation view is [[VocabTokenizer
    * .wordPieceCounts]]). One explode + one shuffle on the group key;
    * the vocabulary ships in the task closure (tokenizer-sized). Empty
    * groups report 0 tokens and a 0.0 rate, not NULL.
    */
  def vocabCoverage(df: DataFrame, groupCol: String, textCol: String,
                    vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "vocabCoverage needs a non-empty vocabulary")
    val vset = vocab.toSet
    val inVocab = udf { w: String => vset.contains(w) }
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    df.select(col(groupCol), explode_outer(toks).as("__w"))
      .withColumn("__oov",
        when(col("__w").isNotNull && !inVocab(col("__w")), 1L)
          .otherwise(0L))
      .groupBy(groupCol)
      .agg(
        sum(when(col("__w").isNotNull, 1L).otherwise(0L)).as("n_tokens"),
        sum(col("__oov")).as("n_oov"),
        countDistinct(when(col("__oov") === 1L, col("__w")))
          .as("n_distinct_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          round(col("n_oov").cast("double") / col("n_tokens"), 4))
          .otherwise(lit(0.0)))
      .select(col(groupCol), col("n_tokens"), col("n_oov"),
        col("oov_rate"), col("n_distinct_oov"))
  }

  /** Split documents into fixed-size token chunks with overlap — the
    * context-window chunking a training pipeline runs before
    * tokenization-and-pack: chunk i covers tokens
    * `[i·(chunkTokens−overlap), …+chunkTokens)` of the whitespace
    * tokenization, re-joined with single spaces (runs of whitespace do
    * NOT round-trip; chunking is for model consumption, not archival).
    * Output: one row per chunk — `(input columns…, chunk_idx,
    * n_chunk_tokens, chunk_text)`. Empty/NULL text yields zero chunks.
    *
    * Pure per-row column algebra (`sequence` → `posexplode` → `slice`
    * → `array_join`): one scan, zero shuffle, codegen-friendly, and
    * chunks inherit their document's partition — at 100 TB this is a
    * map stage with ~`1/(1−overlap/chunkTokens)`× output amplification
    * and nothing else.
    */
  def chunkDocuments(df: DataFrame, textCol: String,
                     chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap")
    Seq("chunk_idx", "n_chunk_tokens", "chunk_text", "__graft_toks",
      "__graft_start").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    val stride = chunkTokens - overlap
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val n = size(toks)
    // Last start = the FIRST stride multiple whose chunk reaches the
    // document end: once a chunk covers the tail, any later start would
    // emit a strict suffix of it — duplicated training text from the
    // chunker itself (with overlap 2 and chunk 4 on 7 tokens, the old
    // `range(0, n)` rule emitted tokens 7..7 again after 5..7).
    // sequence() demands stop >= start for a positive step — guard the
    // zero-token case to an empty start list (zero chunks).
    val lastStart = when(n <= chunkTokens, lit(0))
      .otherwise(ceil((n - chunkTokens).cast("double") / stride).cast("int")
        * stride)
    val starts = when(n > 0,
      sequence(lit(0), lastStart, lit(stride))).otherwise(array().cast("array<int>"))
    df.withColumn("__graft_toks", toks)
      .select(col("*"),
        posexplode(starts).as(Seq("chunk_idx", "__graft_start")))
      .withColumn("chunk_text",
        array_join(slice(col("__graft_toks"), col("__graft_start") + 1,
          lit(chunkTokens)), " "))
      .withColumn("n_chunk_tokens",
        least(lit(chunkTokens), size(col("__graft_toks")) - col("__graft_start"))
          .cast("long"))
      .drop("__graft_toks", "__graft_start")
  }

  /** Per-document character (code-point) Shannon entropy in nats —
    * the information-theoretic quality signal that separates natural
    * text (≈3–4.5) from padding/boilerplate (low) and random bytes
    * (high); a standard cheap filter next to the Gopher rules. Output:
    * `(idCol, n_cp, entropy)` where n_cp counts code points and
    * entropy = ln n − (Σ c·ln c)/n over per-character counts c.
    *
    * Code points, not UTF-16 units: the characters come from
    * `regexp_extract_all(text, '[^\n]')` — character classes are
    * code-point-aware in BOTH Java regex and RE2, so surrogate-pair
    * emoji count once and the DuckDB oracle sees identical
    * frequencies. The explicit `[^\n]` class (NOT `.`) is the
    * cross-engine contract: Java's `.` excludes ALL line terminators
    * (`\r`, `U+0085`, `U+2028`, `U+2029`) while RE2's excludes only
    * `\n` — on CRLF text the two engines would count different
    * characters. `[^\n]` means the same thing in both.
    *
    * Shape: explode to (id, char) → count (map-side partial) → one
    * more keyed aggregate. No join: the ln n − (Σ c ln c)/n identity
    * folds the total into the same per-id aggregate. NULL/empty text →
    * n_cp 0, entropy 0.0.
    */
  // ------------------------------------------------------------------
  // Unicode-script detection — the routing signal a multilingual crawl
  // splits on BEFORE language ID (script is cheap and unambiguous;
  // language within a script needs the trigram model). Ranges are the
  // core Unicode blocks of each script (public standard); "common"
  // characters (digits, punctuation, space, symbols) belong to none.
  // ------------------------------------------------------------------

  /** Script name → Unicode block ranges (inclusive code-point pairs —
    * built numerically so the class bodies are unambiguous; identical
    * semantics in Java regex and RE2, where the oracle states the same
    * ranges as `\x{…}` escapes). Order is the tie-break priority of
    * [[dominantScript]]. Latin skips U+00D7/U+00F7 (× ÷ — math signs
    * inside the Latin-1 letter run).
    */
  private[graft] val scriptBlocks: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq(('A'.toInt, 'Z'.toInt), ('a'.toInt, 'z'.toInt),
      (0x00C0, 0x00D6), (0x00D8, 0x00F6), (0x00F8, 0x024F)),
    "cyrillic" -> Seq((0x0400, 0x052F)),
    "greek" -> Seq((0x0370, 0x03FF)),
    "arabic" -> Seq((0x0600, 0x06FF), (0x0750, 0x077F)),
    "hebrew" -> Seq((0x0590, 0x05FF)),
    "devanagari" -> Seq((0x0900, 0x097F)),
    "thai" -> Seq((0x0E00, 0x0E7F)),
    "hangul" -> Seq((0xAC00, 0xD7AF), (0x1100, 0x11FF), (0x3130, 0x318F)),
    "kana" -> Seq((0x3040, 0x309F), (0x30A0, 0x30FF)),
    "han" -> Seq((0x4E00, 0x9FFF), (0x3400, 0x4DBF)))

  private[graft] val scriptRanges: Seq[(String, String)] =
    scriptBlocks.map { case (name, blocks) =>
      name -> blocks.map { case (lo, hi) =>
        s"${lo.toChar}-${hi.toChar}"
      }.mkString
    }

  /** One code-point pass classifying into ALL script counts at once —
    * scripts checked in table order, first matching block wins (the
    * blocks are disjoint anyway); BMP blocks only, so supplementary
    * code points (emoji) match nothing, exactly like the regex
    * character classes the oracle restates.
    */
  private[graft] def scriptCountsKernel(text: String): Array[Long] = {
    val counts = new Array[Long](scriptBlocks.length)
    if (text != null) {
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        i += Character.charCount(cp)
        var k = 0
        var hit = -1
        while (k < scriptBlocks.length && hit < 0) {
          val blocks = scriptBlocks(k)._2
          var b = 0
          while (b < blocks.length && hit < 0) {
            if (cp >= blocks(b)._1 && cp <= blocks(b)._2) hit = k
            b += 1
          }
          k += 1
        }
        if (hit >= 0) counts(hit) += 1
      }
    }
    counts
  }

  private val scriptCountsUdf = udf(scriptCountsKernel _)

  /** Per-script code-point counts as named columns — ONE per-row
    * kernel pass produces all ten counts (field projections off the
    * same deterministic UDF call, which whole-stage codegen's common
    * subexpression elimination evaluates once); no explode, no
    * shuffle. Replaces the original ten-`regexp_replace` cascade,
    * which re-scanned every document once per script (10× the
    * character work) and dominated the t24 bench.
    */
  def scriptCounts(textCol: Column): Seq[(String, Column)] = {
    val arr = scriptCountsUdf(textCol)
    scriptRanges.zipWithIndex.map { case ((name, _), i) =>
      name -> element_at(arr, i + 1)
    }
  }

  /** The document's dominant script: the FIRST script in
    * [[scriptRanges]] order reaching the maximum count (a later script
    * wins only strictly — deterministic, engine-replicable ties), or
    * `"unknown"` when no script reaches `minChars` (digits-only,
    * emoji-only, empty, NULL).
    */
  def dominantScript(textCol: Column, minChars: Int = 1): Column = {
    require(minChars >= 1, s"minChars must be ≥ 1: $minChars")
    val counts = scriptCounts(textCol)
    // Each per-script count is bound ONCE into an array and the winner
    // found positionally: array_position returns the FIRST index of
    // the max, which IS the first-script-wins tie rule. The previous
    // when/greatest fold re-embedded every earlier count in each step,
    // growing the expression tree exponentially in |scripts| — it
    // compiled ~2^10 nodes and made t24 the slowest query on the
    // whole bench (8.7 s at sf0.1; this shape is ~20× cheaper).
    val arr = array(counts.map(_._2): _*)
    val names = array(counts.map(c => lit(c._1)): _*)
    val best = array_max(arr)
    when(best >= minChars,
      element_at(names, array_position(arr, best).cast("int")))
      .otherwise(lit("unknown"))
  }

  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol), lit("[^\\n]"), lit(0)))
    df.select(col(idCol), explode_outer(chars).as("__ch"))
      .groupBy(col(idCol), col("__ch"))
      .agg(count(when(col("__ch").isNotNull, 1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        sum("__c").as("n_cp"),
        coalesce(
          when(sum("__c") > 0,
            log(sum("__c").cast("double")) -
              sum(col("__c") * log(col("__c").cast("double"))) / sum("__c")),
          lit(0.0)).as("entropy"))
  }

  /** Corpus-trained token-bigram log-probability score — the cheap
    * language-model quality proxy (CCNet-style: score each document
    * under a model TRAINED ON THE CORPUS ITSELF; boilerplate and
    * keyboard-mash score far from the corpus mean). For each document:
    * `lm_logprob` = mean over its token bigrams (w1,w2) of
    * `ln P(w2 | w1)` with add-one smoothing over the corpus vocabulary
    * (`P = (c(w1,w2) + 1) / (c(w1·) + V)`), and `n_bigrams`. Documents
    * with < 2 tokens have no bigrams and produce NO output row —
    * left-join the result back when every document needs a score.
    *
    * Shape: ONE aggregate over the exploded bigrams produces the
    * per-doc occurrence counts (`docGrams`); the bigram model, the
    * unigram-context counts and the vocabulary all DERIVE from that
    * far smaller frame, and the model aggregates run over bigram
    * COUNTS, not raw occurrences — the naive shape keyed each
    * aggregate directly over the exploded grams and re-ran the
    * dominant tokenize+explode ~5×. Every join key is a token or
    * (token, token), so the whole thing shuffle-partitions like tfidf.
    * Nothing is collected; the "model" never leaves the cluster.
    *
    * The bigram MODEL frame is PERSISTED for the call and the per-doc
    * score frame is materialized eagerly ([[Checkpoints.truncate]] —
    * doc-count scale, three narrow columns) before the cache releases:
    * relying on plan-level exchange reuse instead re-planned the
    * tokenize+explode subtree once per consumer branch (12 scans / 20
    * tokenizer nodes in t11's formatted plan; c18, which fits
    * thresholds AND buckets off the scores, doubled that) because each
    * branch prunes different columns and the exchanges stop being
    * byte-identical. docGrams itself stays lazy — two consumers, so
    * one extra tokenize pass, strictly cheaper than caching the
    * corpus-gram-scale frame (measured as a pessimization in r17).
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Seq("__graft_v", "lm_logprob", "n_bigrams").foreach(r =>
      require(!df.columns.contains(r), s"input already has a '$r' column"))
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val n = size(toks)
    val m = greatest(n - 1, lit(0))
    // doc bigrams as a zip of two shifted views — the t5 pattern (plain
    // codegen'd slices, no CodegenFallback lambdas)
    val grams = df.select(col(idCol),
      explode(arrays_zip(slice(toks, lit(1), m).as("w1"),
        slice(toks, lit(2), m).as("w2"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    val st = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // docGrams stays LAZY: it has exactly two consumers (the bigram
    // model build and the final score join), so leaving it lazy costs
    // ONE extra tokenize+aggregate pass — strictly cheaper than
    // materializing the near-gram-scale (id, w1, w2, k) frame into the
    // cache, which the r17 driver run measured as a t11 pessimization
    // (1.54→2.12 s; the builder's own snapshots agreed 2.16→3.03).
    // The MODEL frame (bigramC — distinct corpus bigrams, no doc
    // dimension) is the one with three consumers (context counts,
    // vocabulary, score join) and is orders of magnitude smaller;
    // persisting only it keeps the single-model-build shape without
    // the corpus-scale cache write.
    val docGrams = grams.groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__k"))
    val bigramC = docGrams.groupBy("__w1", "__w2")
      .agg(sum("__k").as("__cbg"))
      .persist(st)
    try {
      val contextC = bigramC.groupBy("__w1")
        .agg(sum("__cbg").as("__cw1"))
      // one consumption of the cached bigramC: explode both token
      // positions instead of a two-arm union (same distinct count)
      val vocab = bigramC
        .select(explode(array(col("__w1"), col("__w2"))).as("__w"))
        .agg(countDistinct("__w").as("__graft_v"))
      Checkpoints.truncate(ScalarFold.withScalars(docGrams
        .join(bigramC, Seq("__w1", "__w2"))
        .join(contextC, Seq("__w1")), vocab)
        .groupBy(col(idCol))
        .agg(
          sum("__k").as("n_bigrams"),
          (sum(col("__k") * log((col("__cbg") + 1).cast("double") /
            (col("__cw1") + col("__graft_v")))) / sum("__k"))
            .as("lm_logprob")))
    } finally { bigramC.unpersist(); () }
  }

  /** Corpus-level boilerplate token removal (the df-threshold rule
    * behind stopword pruning and boilerplate stripping): a token
    * appearing in more than `maxDocFrac` of all documents carries no
    * per-document signal — drop every occurrence, preserving the order
    * of what remains. Returns `(id, text_clean, n_before, n_after)`.
    *
    * Shape: one exploded doc-frequency aggregate (map-side partial),
    * the resulting drop SET collected into a one-row broadcast frame
    * (bounded: only tokens in > maxDocFrac of docs fit — vocabulary-
    * scale, not corpus-scale), then a single scan rebuilds each text
    * with the codegen'd `filter`/`array_join` higher-order functions.
    * No window, no reconstruction join: array order IS document order.
    */
  def dropUbiquitousTokens(df: DataFrame, idCol: String, textCol: String,
                           maxDocFrac: Double): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1,
      s"maxDocFrac must be in (0, 1], got $maxDocFrac")
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    // Scan-parallelism repair (guide §2.5, the Par.spread rule): the
    // tokenize kernel runs over BOTH consumers of `base` (drop-set
    // model pass + rebuild pass) and otherwise rides a single-split
    // scan — t12 profiled as 18 single-task stages. The exchange
    // carries (id, text) once and is materialized once (AQE stage
    // reuse) for both consumers; no-op at production scale (byte rule).
    val base = graft.util.Par
      .spread(df.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol), toks.as("__toks"))
    val n = df.agg(count(lit(1)).as("__n"))
    val dropSet = ScalarFold.withScalars(base
      .select(col(idCol), explode(col("__toks")).as("__t"))
      .groupBy("__t").agg(countDistinct(col(idCol)).as("__df")), n)
      .filter(col("__df") > col("__n") * maxDocFrac)
      .agg(coalesce(collect_set("__t"),
        typedLit(Array.empty[String])).as("__drop"))
    val kept = filter(col("__toks"),
      x => !array_contains(col("__drop"), x))
    ScalarFold.withScalars(base, dropSet)
      .select(col(idCol),
        array_join(kept, " ").as("text_clean"),
        size(col("__toks")).cast("long").as("n_before"),
        size(kept).cast("long").as("n_after"))
  }

  // ------------------------------------------------------------------
  // HTML → text extraction — real web-scale ingest starts from markup.
  // Everything below is a pure column-expression cascade (regexp + the
  // codegen'd string built-ins): one scan, zero shuffle, and every
  // regex is written for Java ⇄ RE2 parity (no lookarounds, no
  // backreferences; `\A`/`\z` instead of `^`/`$` — Java's bare `$`
  // matches BEFORE a final newline while RE2's does not).
  // ------------------------------------------------------------------

  /** One extraction-cascade step: `(isRegex, pattern/from, rep/to)`.
    * The tables below are the SINGLE source of truth for the html and
    * markdown cascades — the Column API folds them with
    * `regexp_replace`/`replace` here, and
    * [[graft.GraftExtensions]] folds the SAME tables into raw catalyst
    * `RegExpReplace`/`StringReplace` nodes for the SQL surface (a
    * registry builder cannot round-trip Column-built trees: their
    * unresolved function nodes never re-enter analysis).
    */
  private[graft] type CascadeStep = (Boolean, String, String)

  /** Script/style/comment drop + block tags → newlines (see
    * [[htmlToText]]); shared with [[stripBoilerplateLines]], which
    * needs the line structure with inline anchors still present.
    */
  private[graft] val blockLineSteps: Seq[CascadeStep] = Seq(
    (true, "(?is)<script[^>]*>.*?</script>", " "),
    (true, "(?is)<style[^>]*>.*?</style>", " "),
    (true, "(?s)<!--.*?-->", " "),
    (true,
      "(?i)<(br|hr)[^>]*>|</(p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|title|blockquote)[^>]*>",
      "\n"))

  /** The five named entities a regex-cascade extractor decodes (plus
    * the apostrophe code point): `&amp;` LAST, so `&amp;lt;` decodes to
    * the literal text `&lt;` — not to `<` (double-decoding would
    * resurrect stripped markup). `&nbsp;` becomes a plain space.
    * Literal `replace`, not regexp — nothing to escape, nothing to
    * diverge between engines.
    */
  private[graft] val entitySteps: Seq[CascadeStep] = Seq(
    (false, "&lt;", "<"), (false, "&gt;", ">"), (false, "&quot;", "\""),
    (false, "&#39;", "'"), (false, "&nbsp;", " "), (false, "&amp;", "&"))

  /** Whitespace normalization for extracted text: horizontal runs → one
    * space, spaces trimmed around newlines, 3+ newlines → one blank
    * line, leading/trailing whitespace dropped (`\A`/`\z` anchors — see
    * the parity note above).
    */
  private[graft] val cleanupSteps: Seq[CascadeStep] = Seq(
    (true, "[ \\t\\f\\r]+", " "),
    (true, " ?\\n ?", "\n"),
    (true, "\\n{3,}", "\n\n"),
    (true, "\\A[\\n ]+|[\\n ]+\\z", ""))

  private def foldCascade(c: Column, steps: Seq[CascadeStep]): Column =
    steps.foldLeft(coalesce(c, lit(""))) {
      case (acc, (true, pat, rep)) => regexp_replace(acc, pat, rep)
      case (acc, (false, from, to)) => replace(acc, lit(from), lit(to))
    }

  private def blockLined(html: Column): Column =
    foldCascade(html, blockLineSteps)

  private def decodeEntities(c: Column): Column =
    foldCascade(c, entitySteps)

  private def cleanupText(c: Column): Column =
    foldCascade(c, cleanupSteps)

  /** HTML → visible text as a single-scan column cascade: script/style/
    * comment blocks dropped, block tags → newlines, remaining tags → a
    * space, entities decoded ([[decodeEntities]]), whitespace
    * normalized. Deliberately a REGEX extractor, not a DOM parser: at
    * 100 TB the extraction must be a codegen'd map stage, and the
    * published web-curation pipelines (C4, CCNet, RefinedWeb) accept
    * exactly this fidelity class for training text.
    *
    * Documented edge semantics (pinned by HtmlExtractSpec):
    * a CDATA section with no `>` in its content is dropped whole (it
    * parses as one pseudo-tag); an unclosed trailing `<tag ...` with no
    * `>` stays as literal text; entity-encoded brackets decode AFTER
    * tag stripping, so `&lt;script&gt;` renders as text and is never
    * executed-then-stripped.
    */
  private[graft] val htmlSteps: Seq[CascadeStep] =
    blockLineSteps ++ Seq((true, "<[^>]*>", " ")) ++ entitySteps ++ cleanupSteps

  def htmlToText(html: Column): Column = foldCascade(html, htmlSteps)

  /** JVM-side replay of the EXACT [[htmlSteps]] cascade (same Java
    * regex semantics `regexp_replace` compiles to), for kernels that
    * need HTML→text inside one expression ([[graft.engine.read
    * .DocumentProbe]]'s auto-routed `document_text`). Column path and
    * kernel path stay in lockstep by construction — one step list.
    */
  private[graft] def htmlToTextKernel(html: String): String =
    htmlSteps.foldLeft(if (html == null) "" else html) {
      case (acc, (true, pat, rep)) => acc.replaceAll(pat, rep)
      case (acc, (false, from, to)) => acc.replace(from, to)
    }

  // ------------------------------------------------ block-level extraction

  /** Block-element boundary for [[htmlBlockFeatures]]: OPEN and CLOSE
    * of every HTML block-level element (plus void br/hr). Unlike
    * [[blockLineSteps]] (close-tags only — line granularity), block
    * segmentation needs both sides so `<div><p>x</p><p>y</p></div>`
    * yields two blocks, the granularity boilerpipe's shallow-text
    * classifier was trained at.
    */
  private val blockBoundaryPat =
    "(?i)<(br|hr)[^>]*>|</?(p|div|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|tfoot|title|blockquote|header|footer|nav|aside|section|article|main|form|figure|figcaption|pre|dl|dt|dd|fieldset|address|center)[^>]*>"

  /** DOM-block segmentation with boilerpipe's shallow text features
    * (Kohlschütter, Fankhauser & Nejdl, "Boilerplate Detection using
    * Shallow Text Features", WSDM 2010): split the page at block-level
    * tag boundaries and measure, per non-empty block,
    * `(text, n_words, link_density)` in document order.
    *
    *  - source newlines/tabs flatten to spaces FIRST (HTML whitespace
    *    is insignificant; a newline inside a `<p>` must not split the
    *    block — the line-granularity cascade above deliberately keeps
    *    them, which is exactly the fidelity gap this closes);
    *  - `link_density` = non-space chars inside `<a>…</a>` over the
    *    block's non-space visible chars (the paper's feature);
    *  - `n_words` counts space-separated tokens of the tag-stripped
    *    block BEFORE entity decoding (decoding shifts nothing for the
    *    count's purpose; the emitted `text` IS decoded).
    *
    * One codegen'd map stage over HOFs — no shuffle, no UDF; the same
    * scale shape as [[htmlToText]].
    */
  def htmlBlockFeatures(html: Column): Column = {
    val flat = foldCascade(html, Seq(
      (true, "(?is)<script[^>]*>.*?</script>", " "),
      (true, "(?is)<style[^>]*>.*?</style>", " "),
      (true, "(?s)<!--.*?-->", " "),
      (true, "[\\n\\r\\t\\f]+", " "),
      (true, blockBoundaryPat, "\n")))
    val raw = split(flat, "\n")
    // Two HOF stages so the tag-strip chain runs once per block (no
    // common-subexpression elimination inside lambdas — the
    // stripBoilerplateLines trade).
    val measured = transform(raw, b => {
      val vis = trim(regexp_replace(
        regexp_replace(b, lit("<[^>]*>"), lit(" ")), lit(" +"), lit(" ")))
      val anchorText = array_join(
        regexp_extract_all(b, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), "")
      val anchorChars = length(regexp_replace(
        regexp_replace(anchorText, lit("<[^>]*>"), lit("")),
        lit(" +"), lit("")))
      struct(vis.as("vis"), anchorChars.as("a"))
    })
    val features = transform(measured, s => {
      val vis = s.getField("vis")
      val nChars = length(regexp_replace(vis, lit(" "), lit("")))
      struct(
        decodeEntities(vis).as("text"),
        when(vis === "", 0).otherwise(size(split(vis, " "))).as("n_words"),
        when(nChars === 0, 0.0)
          .otherwise(s.getField("a").cast("double") / nChars)
          .as("link_density"))
    })
    filter(features, b => b.getField("n_words") > 0)
  }

  /** Short-block phrases that terminate article text (boilerpipe's
    * TerminatingBlocksFinder vocabulary — comment headers, copyright
    * lines, feedback prompts). Applied only to blocks under 15 words,
    * as published.
    */
  private val terminatorPat =
    "(?i)^([0-9]+ comments|comments|© |&#169; |copyright |all rights reserved|terms of (use|service)|privacy policy|post a comment|please rate|thanks for your comments)"

  /** HTML → main content via block classification — the published
    * boilerpipe `NumWordsRulesClassifier` decision tree (WSDM 2010
    * code release), verbatim thresholds, over [[htmlBlockFeatures]]:
    *
    * {{{
    * curr.linkDensity > 1/3                  -> boilerplate
    * else if prev.linkDensity <= 0.555556:
    *   content iff curr.words > 16 || next.words > 15 || prev.words > 4
    * else:
    *   content iff curr.words > 40 || next.words > 17
    * }}}
    *
    * plus the TerminatingBlocksFinder rule (short blocks opening with
    * comment/copyright phrases are never content — applied per block;
    * the full boilerpipe pipeline also drops everything AFTER a
    * terminator, a sequential pass this column form trades away).
    * Out-of-range neighbors count as empty blocks (0 words, 0
    * density), boilerpipe's convention. Kept blocks join on newlines
    * and pass the shared whitespace cleanup. Note the tree KEEPS short
    * headlines right before long paragraphs (next.words > 15) — that
    * is by design in the paper; a repeated site header is then exactly
    * what corpus-level segment dedup ([[Dedup.dedupSegments]])
    * removes, which is why [[graft.ops.CurationPipeline]] composes
    * the two.
    */
  def extractMainContent(html: Column): Column = {
    // LET-BIND the block array once: `transform` over a one-element
    // wrapper makes `arr` a lambda VARIABLE, so the neighbor lookups
    // below are O(1) reads of an evaluated array. Referencing
    // htmlBlockFeatures(html) directly inside the filter lambda would
    // re-evaluate the whole regex cascade PER BLOCK (HOF lambdas get
    // no common-subexpression elimination) — measured as a 7×
    // pipeline-level slowdown before this binding.
    val joined = transform(array(htmlBlockFeatures(html)), arr => {
      val n = size(arr)
      val indexed = zip_with(arr,
        sequence(lit(0), greatest(n - 1, lit(0))),
        (b, i) => struct(b.as("b"), i.as("i")))
      val kept = filter(indexed, s => {
        val b = s.getField("b")
        val i = s.getField("i")
        val currW = b.getField("n_words")
        val currLd = b.getField("link_density")
        val prevB = get(arr, i - 1)
        val nextB = get(arr, i + 1)
        val prevW = coalesce(prevB.getField("n_words"), lit(0))
        val prevLd = coalesce(prevB.getField("link_density"), lit(0.0))
        val nextW = coalesce(nextB.getField("n_words"), lit(0))
        val isTerminator =
          currW < 15 && b.getField("text").rlike(terminatorPat)
        b.isNotNull && !isTerminator && currLd <= lit(0.333333) &&
          when(prevLd <= lit(0.555556),
            currW > 16 || nextW > 15 || prevW > 4)
            .otherwise(currW > 40 || nextW > 17)
      })
      array_join(transform(kept, s => s.getField("b").getField("text")), "\n")
    })
    cleanupText(get(joined, lit(0)))
  }

  /** HTML → text with the LINK-DENSITY boilerplate rule (the jusText/
    * Readability heuristic): a line whose anchor text makes up more
    * than `maxLinkDensity` of its visible characters is navigation
    * chrome, not content — drop it. Density compares NON-SPACE
    * character counts of `<a>…</a>` innards vs the whole line, both
    * measured after tag stripping and BEFORE entity decoding (the
    * ratio is what matters; decoding shifts both counts together).
    * Lines with no visible text are dropped. Still one scan: the
    * per-line work runs in `transform`/`filter` higher-order functions
    * over the split lines — CodegenFallback per element, but a map
    * stage with no shuffle, acceptable for an operator that reads
    * every byte of its input anyway.
    */
  def stripBoilerplateLines(html: Column, maxLinkDensity: Double = 0.5): Column = {
    require(maxLinkDensity > 0 && maxLinkDensity <= 1,
      s"maxLinkDensity must be in (0, 1], got $maxLinkDensity")
    val lines = split(blockLined(html), "\n")
    // Two transform stages so the vis regexp chain (the dominant
    // per-line cost) runs ONCE: HOF lambdas get no common-subexpression
    // elimination, so a single struct(vis, length(f(vis))) would embed
    // — and evaluate — the chain twice per line.
    val stripped = transform(lines, l => {
      val vis = trim(regexp_replace(
        regexp_replace(l, lit("<[^>]*>"), lit(" ")),
        lit("[ \\t\\f\\r]+"), lit(" ")))
      val anchorText = array_join(
        regexp_extract_all(l, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), "")
      val anchorChars = length(
        regexp_replace(regexp_replace(anchorText, lit("<[^>]*>"), lit("")),
          lit("[ \\t\\f\\r ]+"), lit("")))
      struct(vis.as("vis"), anchorChars.as("a"))
    })
    val analyzed = transform(stripped, s =>
      struct(s.getField("vis").as("vis"),
        length(regexp_replace(s.getField("vis"), lit(" "), lit("")))
          .as("n"),
        s.getField("a").as("a")))
    val kept = filter(analyzed,
      s => s.getField("n") > 0 &&
        s.getField("a") <= s.getField("n") * lit(maxLinkDensity))
    cleanupText(decodeEntities(
      array_join(transform(kept, s => s.getField("vis")), "\n")))
  }

  /** Markdown → plain text as the same single-scan regexp-cascade
    * fidelity class as [[htmlToText]] — README/docs/forum corpora ship
    * as markdown, and the formatting syntax (not the prose) is what a
    * training pipeline strips. Step order matters and is mirrored
    * verbatim by the t19 oracle:
    *
    *  1. fence marker lines (``` / ~~~ + info string) drop; the CODE
    *     between them stays — code is text to an LLM corpus
    *  2. HTML comments, then inline HTML tags (markdown allows raw
    *     HTML) — tags must start `</letter` so prose like `5 < 6 and
    *     7 > 4` survives (unlike in true HTML, bare `<` is legal
    *     markdown text)
    *  3. table separator rows (`|---|---|`) drop; data-row pipes
    *     become spaces later
    *  4. horizontal rules + setext underlines (`---`/`===`/`***`
    *     lines, incl. consecutive runs) drop
    *  5. reference-link definition lines (`[ref]: url`) drop
    *  6. images → alt text, inline links → link text, reference
    *     links → link text (images BEFORE links or `![a](u)` leaves
    *     a stray `!a`)
    *  7. ATX header `#` prefixes, blockquote `>` markers (nested too),
    *     bullet/numbered list markers drop — their text stays
    *  8. emphasis/strikethrough/underline runs (`*` `~~` `__`) and
    *     backticks strip; pipes → space. Single `_` is deliberately
    *     NOT stripped: snake_case identifiers outnumber `_emphasis_`
    *     in real corpora
    *  9. entity decode + whitespace normalize (shared with the HTML
    *     path)
    *
    * Known fidelity limits (pinned by MarkdownExtractSpec): setext
    * underlines need 3+ marker chars; `*` multiplication signs strip;
    * indented (4-space) code blocks keep their indentation semantics
    * only through whitespace collapse.
    */
  private[graft] val markdownSteps: Seq[CascadeStep] = Seq(
    // marker LINES are consumed with their trailing newline (as a run,
    // so back-to-back markers fall in one match — replaceAll continues
    // AFTER a match, and the next line's leading \n anchor is already
    // spent); "$1" preserves the \A/\n distinction so no blank line is
    // left where the marker was
    (true, "(\\A|\\n)((```|~~~)[^\\n]*(\\n|\\z))+", "$1"), // fence markers
    (true, "(?s)<!--.*?-->", " "), // html comments
    (true, "</?[A-Za-z][^>\\n]*>", " "), // inline html tags
    (true, // table separator rows
      "(\\A|\\n)[ \\t]*(\\|[ \\t:|-]*-[ \\t:|-]*|-[ \\t:|-]*\\|[ \\t:|-]*)(\\n|\\z)",
      "\n"),
    (true, // hr / setext underline lines, incl. consecutive runs
      "(\\A|\\n)[ \\t]*[-*_=]{3,}[ \\t]*(\\n[ \\t]*[-*_=]{3,}[ \\t]*)*(\\n|\\z)",
      "\n"),
    (true, "(\\A|\\n)([ \\t]*\\[[^\\]\\n]+\\]:[^\\n]*(\\n|\\z))+", "$1"), // ref defs
    (true, "!\\[([^\\]]*)\\]\\(([^)\\n]*)\\)", "$1"), // images → alt
    (true, "\\[([^\\]]*)\\]\\(([^)\\n]*)\\)", "$1"), // inline links → text
    (true, "\\[([^\\]]*)\\]\\[[^\\]\\n]*\\]", "$1"), // ref links → text
    (true, "(\\A|\\n)[ \\t]*#{1,6}[ \\t]+", "\n"), // ATX headers
    (true, "(\\A|\\n)[ \\t]*(>[ \\t]?)+", "\n"), // blockquote markers
    (true, "(\\A|\\n)[ \\t]*([-*+]|[0-9]{1,3}[.)])[ \\t]+", "\n"), // lists
    (true, "\\*{1,3}", ""), // emphasis stars
    (false, "~~", ""), (false, "__", ""), (false, "`", ""),
    (false, "|", " ")) ++ entitySteps ++ cleanupSteps

  def markdownToText(md: Column): Column = foldCascade(md, markdownSteps)

  // ------------------------------------------------ sentence segmentation

  /** Sentence-boundary step table — rule-based segmentation in the
    * Punkt/srx spirit, written as a regex cascade so the Column
    * implementation and the DuckDB oracle share the SAME steps (the
    * htmlToText pattern; every pattern is Java-regex ⇄ RE2 compatible —
    * no lookarounds). Boundary model:
    *
    *  1. protect dotted two-letter abbreviations (`e.g.`, `i.e.`,
    *     `a.m.`, `U.S.` — case-insensitive) by swapping their dots for
    *     `\u0002`;
    *  2. protect a closed list of common single-token abbreviations
    *     (`Dr.`, `vs.`, `etc.`, …);
    *  3. protect intra-number dots (`3.14`, `v2.1`);
    *  4. protect single-capital initials before a space (`J. Smith`);
    *  5. a run of terminators `[.!?…]` plus optional closing
    *     quotes/brackets followed by horizontal whitespace is a
    *     boundary (the whitespace is consumed);
    *  6. newlines are unconditional boundaries;
    *  7. restore the protected dots.
    *
    * The sentinel chars `U+0001` (boundary) and `U+0002` (protected
    * dot) never survive: 7 restores dots and [[splitSentences]] splits
    * on the boundary. Text containing literal control chars 1/2 is
    * out of scope by construction (they are stripped upstream by the
    * encoding-quality stage).
    */
  private[graft] val sentenceSteps: Seq[CascadeStep] = Seq(
    (true, "(?i)\\b([a-z])\\.([a-z])\\.", "$1\u0002$2\u0002"),
    (true, "(?i)\\b(mr|mrs|ms|dr|prof|sr|jr|st|vs|etc|fig|no|vol|pp|" +
      "cf|al|inc|ltd|co|corp|dept|est|approx|ca|resp)\\.", "$1\u0002"),
    (true, "([0-9])\\.([0-9])", "$1\u0002$2"),
    (true, "\\b([A-Z])\\. ", "$1\u0002 "),
    (true, "([.!?…]+[\"'”’)\\]]*)[ \\t]+", "$1\u0001"),
    (true, "[\\n\\r]+", "\u0001"),
    (false, "\u0002", "."))

  /** Sentences of `c` as an `array<string>` in document order — the
    * unit the chunking, decontamination-at-sentence-level and LM
    * training stages split on. One codegen'd regexp cascade + split
    * per row, no shuffle, NULL-safe (NULL → empty array).
    */
  def splitSentences(c: Column): Column = {
    val marked = foldCascade(c, sentenceSteps)
    filter(transform(split(marked, "\u0001"), s => trim(s)),
      s => s =!= "")
  }

  /** Greedy sentence packing: consecutive sentences fill a chunk until
    * the NEXT sentence would push its whitespace-token sum past
    * `maxTokens`; a single over-long sentence becomes its own chunk
    * (never split mid-sentence — the retrieval/window property
    * [[chunkDocuments]]' fixed token windows cannot give). Returns
    * `(chunk_idx, chunk_text, n_chunk_tokens)` structs in order.
    */
  private def packSentencesKernel(sents: Seq[String],
                                  maxTokens: Int): Seq[(Int, String, Int)] = {
    if (sents == null || sents.isEmpty) return Seq.empty
    val out = scala.collection.mutable.Buffer[(Int, String, Int)]()
    val cur = new StringBuilder
    var curTok = 0
    // explicit RE2-\s class (NOT Character.isWhitespace: that includes
    // U+000B and the Unicode space family, which RE2's \S+ — the
    // oracle's tokenizer — does not treat as separators)
    def isWs(ch: Char): Boolean =
      ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'
    def nTok(s: String): Int = {
      var n = 0
      var inTok = false
      var i = 0
      while (i < s.length) {
        val ws = isWs(s.charAt(i))
        if (!ws && !inTok) n += 1
        inTok = !ws
        i += 1
      }
      n
    }
    def flush(): Unit = if (curTok > 0) {
      out += ((out.length, cur.toString, curTok)); cur.clear(); curTok = 0
    }
    for (s <- sents) {
      val n = nTok(s)
      if (curTok > 0 && curTok + n > maxTokens) flush()
      if (curTok > 0) cur.append(' ')
      cur.append(s)
      curTok += n
    }
    flush()
    out.toSeq
  }

  private val packSentencesUdf =
    udf((sents: Seq[String], cap: Int) => packSentencesKernel(sents, cap))

  /** Sentence-aware chunking: `(idCol, chunk_idx, chunk_text,
    * n_chunk_tokens)` — [[splitSentences]] then greedy packing, one
    * per-row kernel + explode, no shuffle. The chunking mode a RAG /
    * eval-harness pipeline wants when fixed token windows would cut
    * sentences in half.
    */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
                       maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    df.select(col(idCol),
        explode(packSentencesUdf(splitSentences(col(textCol)),
          lit(maxTokens))).as("__c"))
      .select(col(idCol), col("__c._1").as("chunk_idx"),
        col("__c._2").as("chunk_text"), col("__c._3").as("n_chunk_tokens"))
  }

  /** The four robots-meta content extractors (name-first / content-
    * first × quoted / unquoted value), shared verbatim with the t31
    * oracle so the two sides cannot drift. Construction rules:
    *
    *  - the `name` attribute must be WHITESPACE/quote-delimited
    *    (`[\s"']name`) — `data-name="robots"` is not a robots tag;
    *  - the value `robots` must be followed by a delimiter; in the
    *    name-first forms the consumed delimiter may itself be the
    *    whitespace before `content`, so the bridge is
    *    `(?:[^>]*\s)?` — RE2-legal (no lookarounds);
    *  - unquoted values (`content=noindex` — legal HTML5) take
    *    `[^"'\s>]+`; the quoted and unquoted forms are disjoint (a
    *    quote can never start an unquoted value), so at most one of
    *    each pair extracts.
    */
  /** Both attribute orders × both value syntaxes for a
    * `<tag key=VALUE val=(captured)>` pair — the robots-meta pattern
    * shape, generalized so canonical links and og:/description metas
    * ride the same Java ⇄ RE2-parity regexes.
    */
  private[graft] def attrPairPatterns(tag: String, key: String,
                                      value: String,
                                      valAttr: String): Seq[String] = {
    val kFirst =
      s"[\\s\"']$key\\s*=\\s*[\"']?$value[\"'\\s](?:[^>]*\\s)?"
    val kLast = s"[\\s\"']$key\\s*=\\s*[\"']?$value[\"'\\s/>]"
    Seq(
      s"(?i)<$tag[^>]*$kFirst$valAttr\\s*=\\s*[\"']([^\"']*)[\"']",
      s"(?i)<$tag[^>]*$kFirst$valAttr\\s*=\\s*([^\"'\\s>]+)",
      s"(?i)<$tag[^>]*[\\s\"']$valAttr\\s*=\\s*[\"']([^\"']*)[\"'][^>]*$kLast",
      s"(?i)<$tag[^>]*[\\s\"']$valAttr\\s*=\\s*([^\"'\\s>]+)[^>]*$kLast")
  }

  private[graft] val robotsContentPatterns: Seq[String] =
    attrPairPatterns("meta", "name", "robots", "content")

  /** `<meta name="robots">` directives of an HTML document, lowercased
    * (`""` when absent) — the page's own indexing consent, which a
    * responsible crawl corpus filters on BEFORE any content rule. Both
    * attribute orders and both value syntaxes (quoted and unquoted)
    * are matched; patterns are Java ⇄ RE2 parity like the rest of the
    * HTML cascade (no lookarounds, explicit classes).
    */
  def metaRobotsContent(html: Column): Column = {
    val h = coalesce(html, lit(""))
    // no-match extractions ('') nullify so concat_ws skips them — the
    // absent-tag result is '' with no stray separators (both engines'
    // concat_ws skips NULLs but keeps empty strings)
    lower(concat_ws(",", robotsContentPatterns.map { p =>
      val e = regexp_extract(h, p, 1)
      when(e =!= "", e)
    }: _*))
  }

  /** First non-empty extraction across the attribute-order/value-
    * syntax variants — the generic `<meta ...>`-family reader.
    */
  private def firstAttrMatch(html: Column, patterns: Seq[String]): Column = {
    val h = coalesce(html, lit(""))
    coalesce(patterns.map { p =>
      val e = regexp_extract(h, p, 1)
      when(e =!= "", e)
    } :+ lit(""): _*)
  }

  /** `<meta name=NAME content=...>` (both attribute orders, quoted
    * and unquoted), entity-decoded, whitespace-collapsed; `""` when
    * absent. `metaDescription` is the corpus-card summary field.
    */
  def metaNamedContent(html: Column, name: String): Column =
    cleanupText(decodeEntities(firstAttrMatch(html, attrPairPatterns(
      "meta", "name", java.util.regex.Pattern.quote(name), "content"))))

  def metaDescription(html: Column): Column =
    metaNamedContent(html, "description")

  /** `<meta property="og:PROP" content=...>` — the OpenGraph card
    * fields social crawlers key on; `""` when absent.
    */
  def ogContent(html: Column, prop: String): Column =
    cleanupText(decodeEntities(firstAttrMatch(html, attrPairPatterns(
      "meta", "property",
      java.util.regex.Pattern.quote(s"og:$prop"), "content"))))

  /** `<link rel="canonical" href=...>` — the page's OWN duplicate
    * declaration, the strongest URL-level dedup signal a crawl gets
    * (compose with [[UrlOps.canonicalizeUrl]] and exact dedup on the
    * result); `""` when absent. No entity decode: it is a URL, and
    * `&amp;` inside query strings decodes at canonicalization time.
    */
  def canonicalHref(html: Column): Column =
    firstAttrMatch(html, attrPairPatterns("link", "rel", "canonical", "href"))

  /** The `<html lang=...>` declaration (primary subtag lowercased,
    * e.g. "en" from "en-US"); `""` when absent — a declared-language
    * PRIOR for the langid router, never a verdict.
    */
  def htmlLangDeclared(html: Column): Column = {
    val h = coalesce(html, lit(""))
    val raw = regexp_extract(h,
      "(?i)<html[^>]*[\\s\"']lang\\s*=\\s*[\"']?([A-Za-z][A-Za-z0-9-]*)", 1)
    lower(regexp_extract(raw, "\\A([A-Za-z]+)", 1))
  }

  /** `<title>` text, entity-decoded, whitespace-collapsed; `""` when
    * absent or unclosed.
    */
  def htmlTitle(html: Column): Column =
    cleanupText(decodeEntities(regexp_extract(coalesce(html, lit("")),
      "(?is)<title[^>]*>([^<]*)</title>", 1)))

  private val JsonLdPattern =
    "(?is)<script[^>]*type\\s*=\\s*[\"']?application/ld\\+json[\"']?" +
      "[^>]*>(.*?)</script>"

  /** Raw `<script type="application/ld+json">` payloads — the
    * schema.org structured-data layer (articles declare headline/
    * datePublished/author here with more fidelity than any meta tag).
    * Raw JSON strings, trimmed, empties dropped; parse downstream
    * with `get_json_object`/`from_json` against the schema the
    * pipeline actually wants.
    */
  def jsonLdBlocks(html: Column): Column =
    filter(
      transform(
        regexp_extract_all(coalesce(html, lit("")),
          lit(JsonLdPattern), lit(1)),
        b => trim(b)),
      b => b =!= "")

  /** The `@type` of each well-formed JSON-LD object block (array
    * values and unparseable blocks drop) — the one-line page-kind
    * signal (Article/Product/Recipe…) corpus routing keys on.
    */
  def jsonLdTypes(html: Column): Column =
    filter(
      transform(jsonLdBlocks(html),
        b => get_json_object(b, "$['@type']")),
      t => t.isNotNull && !t.startsWith("["))

  /** Whole-token directive probe over [[metaRobotsContent]] —
    * `\A`/`\z` anchors, not `^`/`$` (Java's bare `$` matches before a
    * final newline, RE2's does not); separators are comma plus the
    * whitespace that can legally live inside an attribute value
    * (`content="noindex,\nnofollow"` keeps its newline).
    */
  private[graft] def robotsTokenPattern(directive: String): String =
    s"(\\A|[ \\t\\n\\r,])$directive([ \\t\\n\\r,]|\\z)"

  private def robotsDirective(html: Column, directive: String): Column =
    metaRobotsContent(html).rlike(robotsTokenPattern(directive))

  /** True when the page declares `noindex` — or `none`, the
    * spec-defined equivalent of `noindex, nofollow` — it asked to stay
    * out of corpora built from crawls that honor robots meta.
    */
  def robotsNoindex(html: Column): Column =
    robotsDirective(html, "noindex") || robotsDirective(html, "none")

  /** True when the page declares `nofollow` (or `none`). */
  def robotsNofollow(html: Column): Column =
    robotsDirective(html, "nofollow") || robotsDirective(html, "none")

  /** Whitespace token count — see [[F.tokenCount]]. */
  def tokenCount(textCol: Column): Column = F.tokenCount(textCol)

  /** BPE-ish subword estimate — see [[F.subwordCount]]. */
  def subwordCount(textCol: Column): Column = F.subwordCount(textCol)
}
