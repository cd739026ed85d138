package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-API surface of the engine's reusable scalar functions.
  *
  * Everything here is either a built-in composition (codegen'd for free)
  * or a JVM Scala UDF over the deterministic kernels in [[TextHash]] —
  * used only where built-ins genuinely can't express the semantics.
  */
object GraftFunctions {

  // ---------------------------------------------------------------- nulls

  /** Tabular-category null vocabulary (reference `csv_ingestor.py:62-67`):
    * "", "NA", "NULL", "None" (post-trim) all mean SQL NULL.
    */
  val tabularNullTokens: Seq[String] = Seq("", "NA", "NULL", "None")

  /** Normalize the 4-way null vocabulary to SQL NULL and trim survivors
    * (reference `ingestors/base.py:342-377`). For non-tabular categories
    * pass `tokens = Seq("")`.
    */
  def nullNormalized(c: Column, tokens: Seq[String] = tabularNullTokens): Column =
    when(c.isNull || trim(c).isin(tokens: _*), lit(null)).otherwise(trim(c))

  // ------------------------------------------------------------- numerics

  /** `try_cast` to a numeric type without the ANSI exception tax.
    *
    * Under ANSI mode (Spark 4 default) TRY-mode casts are implemented as
    * throw-and-catch: every failing row constructs a full SparkException
    * (~8 µs for int/bigint, ~2 µs for double/decimal — measured 25× wall
    * slowdown on a 600k-row column that never parses). A string with no
    * decimal digit (`\p{Nd}` — Spark's decimal cast accepts full-width
    * Unicode digits too) can never cast to any numeric type except the
    * Infinity/NaN double literals, so a digit-or-inf-or-nan pre-filter
    * returns the identical NULLs while skipping exception construction
    * for the common all-alpha garbage. Strings that pass the guard still
    * take the real `try_cast`, so semantics are bit-identical.
    */
  def tryCastNumeric(c: Column, target: String): Column =
    when(c.rlike("(?i)\\p{Nd}|inf|nan"), c.try_cast(target))

  // -------------------------------------------------------------- boolean

  /** Textual boolean vocabulary (reference `csv_ingestor.py:233-247`,
    * `data_validator.py:639-742`): true/false, yes/no, t/f, y/n, 1/0,
    * "1.0"/"0.0", and any numeric string coercible to exactly 0 or 1.
    * Unrecognized non-null input → NULL (callers count those as invalid).
    */
  def parseBool(c: Column): Column = {
    val s = lower(trim(c))
    val d = tryCastNumeric(s, "double")
    when(c.isNull, lit(null).cast("boolean"))
      .when(s.isin("true", "yes", "t", "y", "1"), lit(true))
      .when(s.isin("false", "no", "f", "n", "0"), lit(false))
      .when(d === 1.0, lit(true))
      .when(d === 0.0, lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  // ---------------------------------------------------------- date / time

  /** Ordered pattern list for the reference's "mixed-format" lenient
    * datetime parse (`csv_ingestor.py:70-109`): ISO datetime first, then
    * ISO date, then slashed/dotted forms whose day/month order follows
    * `dayFirst`. First pattern that parses wins; all fail → NULL.
    *
    * Each attempt is gated by a PERMISSIVE shape regex (a superset of
    * what the pattern can parse — digit counts looser than the strict
    * formatter, `\d{4,}`/optional sign where the year field accepts
    * them): a failing `try_to_timestamp` throws-and-catches internally
    * (~20 µs/row through the full 10-pattern chain — a 40× tax on
    * non-ISO or garbage columns), while a failing regex on a short
    * string is nanoseconds. A string rejected by a guard is one its
    * pattern could never parse, so the coalesce result is unchanged;
    * strings passing a guard still take the real parse.
    */
  def parseDatetimeLenient(c: Column, dayFirst: Boolean = false): Column = {
    val t = trim(c)
    def attempt(pattern: String, shape: String): Column =
      when(t.rlike(shape), try_to_timestamp(t, lit(pattern)))
    val slashTime = if (dayFirst) "d/M/yyyy H:m:s" else "M/d/yyyy H:m:s"
    val slash = if (dayFirst) "d/M/yyyy" else "M/d/yyyy"
    val dash = if (dayFirst) "d-M-yyyy" else "M-d-yyyy"
    val dot = if (dayFirst) "d.M.yyyy" else "M.d.yyyy"
    coalesce(
      attempt("yyyy-MM-dd HH:mm:ss.SSSSSS",
        "^[+-]?\\d{4,}-\\d{1,2}-\\d{1,2} \\d{1,2}:\\d{1,2}:\\d{1,2}\\.\\d+$"),
      attempt("yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        "^[+-]?\\d{4,}-\\d{1,2}-\\d{1,2}T\\d{1,2}:\\d{1,2}:\\d{1,2}\\.\\d+$"),
      attempt("yyyy-MM-dd HH:mm:ss",
        "^[+-]?\\d{4,}-\\d{1,2}-\\d{1,2} \\d{1,2}:\\d{1,2}:\\d{1,2}$"),
      attempt("yyyy-MM-dd'T'HH:mm:ss",
        "^[+-]?\\d{4,}-\\d{1,2}-\\d{1,2}T\\d{1,2}:\\d{1,2}:\\d{1,2}$"),
      attempt("yyyy-MM-dd HH:mm",
        "^[+-]?\\d{4,}-\\d{1,2}-\\d{1,2} \\d{1,2}:\\d{1,2}$"),
      attempt("yyyy-MM-dd", "^[+-]?\\d{4,}-\\d{1,2}-\\d{1,2}$"),
      attempt("yyyy/MM/dd", "^[+-]?\\d{4,}/\\d{1,2}/\\d{1,2}$"),
      attempt(slashTime,
        "^\\d{1,2}/\\d{1,2}/[+-]?\\d{4,} \\d{1,2}:\\d{1,2}:\\d{1,2}$"),
      attempt(slash, "^\\d{1,2}/\\d{1,2}/[+-]?\\d{4,}$"),
      attempt(dash, "^\\d{1,2}-\\d{1,2}-[+-]?\\d{4,}$"),
      attempt(dot, "^\\d{1,2}\\.\\d{1,2}\\.[+-]?\\d{4,}$"))
  }

  /** A value is locale-ambiguous when it parses BOTH day-first and
    * month-first to different instants and is not ISO-shaped (reference
    * `time_format_validator.py:79-106`'s guard).
    */
  def isAmbiguousDate(c: Column): Column = {
    val mdy = parseDatetimeLenient(c, dayFirst = false)
    val dmy = parseDatetimeLenient(c, dayFirst = true)
    mdy.isNotNull && dmy.isNotNull && (mdy =!= dmy) && !trim(c).rlike("^\\d{4}-")
  }

  // ------------------------------------------------------------- text ops

  /** Whitespace token count — lockstep with [[TextHash.tokens]] (count
    * of non-whitespace runs). Counting matches, not split segments,
    * keeps parity for leading TABS too: SQL `trim` strips only spaces,
    * so `split("\tfoo bar", "\s+")` yields a leading "" segment and
    * would overcount by one versus the JVM tokenizer and the DuckDB
    * oracles' `regexp_extract_all('\S+')`. The explicit `[^ \t\n\f\r]`
    * class (not `\S`) is the cross-engine whitespace contract — see
    * [[TextHash.tokens]]: Java's `\s` includes `\x0B`, RE2's does not.
    */
  def tokenCount(c: Column): Column =
    when(c.isNull, lit(0))
      .otherwise(size(regexp_extract_all(c, lit("[^ \\t\\n\\f\\r]+"), lit(0))))

  /** BPE-ish subword estimate: word-parts, digits runs, and punctuation
    * each count as a token (a cheap `\p{L}+|\p{N}+|[^\p{L}\p{N}\s]`
    * regex proxy for byte-pair tokenizers). Whitespace is the explicit
    * `[ \t\n\f\r]` class for Java/RE2 parity (see [[TextHash.tokens]]);
    * the oracle uses the same literal class.
    */
  def subwordCount(c: Column): Column =
    when(c.isNull, lit(0)).otherwise(
      size(regexp_extract_all(c,
        lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N} \\t\\n\\f\\r]"), lit(0))))

  private val udfSim = udf((s: String) => TextHash.simhash60(s))
  private val udfFp = udf((s: String) => TextHash.fingerprint(s))
  private val udfMinhash =
    udf((s: String, k: Int, n: Int) => TextHash.minhash(s, k, n))
  private val udfBands =
    udf((sig: Seq[Long], bands: Int) => TextHash.bandKeys(sig.toArray, bands))
  private val udfJaccard =
    udf((a: String, b: String, n: Int) => TextHash.jaccard(a, b, n))
  private val udfShingleHashes =
    udf((s: String, n: Int) => TextHash.shingleHashes(s, n))
  private val udfMinhashFromHashes =
    udf((h: Seq[Long], k: Int) => TextHash.minhashFromHashes(h.toArray, k))
  private val udfMinhashOphFromHashes =
    udf((h: Seq[Long], k: Int) => TextHash.minhashOphFromHashes(h.toArray, k))
  private val udfWindowHashes =
    udf((s: String, n: Int) => TextHash.windowHashes(s, n))
  private val udfJaccardSorted =
    udf((a: Seq[Long], b: Seq[Long]) => TextHash.jaccardSorted(a.toArray, b.toArray))
  // Null-safe: a NULL embedding yields NO band keys (empty → explode
  // emits nothing → the row simply never becomes a candidate), instead
  // of an undiagnosable NullPointerException out of the kernel.
  private val udfSignBands =
    udf((v: Seq[Float], planes: Int, bands: Int) =>
      if (v == null) Array.empty[Long]
      else VectorOpsUtil.signBandKeys(v, planes, bands))

  def simhash(c: Column): Column = udfSim(c)
  def fingerprint(c: Column): Column = udfFp(c)
  def minhashSig(c: Column, k: Int, shingleN: Int): Column =
    udfMinhash(c, lit(k), lit(shingleN))
  def minhashBands(sig: Column, bands: Int): Column = udfBands(sig, lit(bands))
  def jaccardSim(a: Column, b: Column, shingleN: Int): Column =
    udfJaccard(a, b, lit(shingleN))

  /** Sorted distinct shingle-hash set — see [[TextHash.shingleHashes]]. */
  def shingleHashSet(c: Column, shingleN: Int): Column =
    udfShingleHashes(c, lit(shingleN))

  /** Ordered non-distinct window hashes — see [[TextHash.windowHashes]]. */
  def windowHashes(c: Column, windowN: Int): Column =
    udfWindowHashes(c, lit(windowN))
  def minhashSigFromHashes(h: Column, k: Int): Column =
    udfMinhashFromHashes(h, lit(k))

  /** One-permutation signature — see [[TextHash.minhashOphFromHashes]]. */
  def minhashSigOphFromHashes(h: Column, k: Int): Column =
    udfMinhashOphFromHashes(h, lit(k))
  def jaccardSortedSim(a: Column, b: Column): Column = udfJaccardSorted(a, b)

  /** Cosine-LSH band keys — see [[VectorOpsUtil.signBandKeys]]. */
  def signBandKeys(c: Column, planes: Int, bands: Int): Column =
    udfSignBands(c, lit(planes), lit(bands))

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Label privacy bucket — see [[LabelHashBucket]]. */
  def labelBucket(c: Column, buckets: Int = 64): Column =
    LabelHashBucket.of(c, buckets)

  def cosineSim(a: Column, b: Column): Column = VectorOps.cosineSim(a, b)
  def dotProduct(a: Column, b: Column): Column = VectorOps.dotProduct(a, b)
}
