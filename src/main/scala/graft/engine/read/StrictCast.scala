package graft.engine.read

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.SqlType
import graft.engine.ValidationResult
import graft.functions.{GraftFunctions => F}

/** The strict cast layer (SURVEY.md §2.2 P3 + §2.3 V1): given an
  * all-string manifest frame and the declared schema, either produce the
  * typed frame or a structured per-column error report.
  *
  * Disposition matches the reference:
  *  - a PRESENT value that fails its declared type is an error
  *    (CSV path fails the run, `csv_ingestor.py:184-280`);
  *  - a missing/null value is fine everywhere;
  *  - errors are counted per column with ≤5 offending samples
  *    (`data_validator.py:528-537`), ALL columns reported in one pass —
  *    a single aggregation scan, no chunk loop (§4: the 50k-row chunking
  *    is a pandas memory workaround, not semantics).
  *
  * For the tolerate-and-skip JSON disposition (`json_ingestor.py:367-388`)
  * use [[validRowFilter]] instead: same vocabulary, row-level predicate.
  */
object StrictCast {

  /** Integer parse accepting scientific notation ("1e5") and
    * float-rendered integers ("7.0") — the reference's int path goes
    * through a float cast (`csv_ingestor.py:211-221`), so those ingest
    * clean; true fractions and out-of-range values stay invalid.
    * Exact digits take the direct cast (no double precision loss).
    */
  private def intViaDouble(c: Column, lo: Double, hi: Double, target: String): Column = {
    val d = F.tryCastNumeric(trim(c), "double")
    coalesce(
      F.tryCastNumeric(trim(c), target),
      when(d.isNotNull && !isnan(d) && d === floor(d) && d.between(lo, hi),
        d.cast(target)))
  }

  /** try-parse expression per declared type; null ⟺ unparseable-or-null. */
  def tryParse(c: Column, t: SqlType): Column = t match {
    case SqlType.Varchar(_) | SqlType.Char(_) | SqlType.Text => c
    case SqlType.IntT => intViaDouble(c, Int.MinValue, Int.MaxValue, "int")
    case SqlType.BigIntT =>
      // double bound uses 2^63 exactly; values ≥ 2^63 overflow → invalid
      intViaDouble(c, Long.MinValue.toDouble, 9.223372036854775e18, "bigint")
    case SqlType.FloatT | SqlType.DoubleT => F.tryCastNumeric(c, "double")
    case SqlType.Decimal(p, s) => F.tryCastNumeric(c, s"decimal($p,$s)")
    case SqlType.BoolT => F.parseBool(c)
    case SqlType.DateT => F.parseDatetimeLenient(c).cast("date")
    case SqlType.DateTimeT => F.parseDatetimeLenient(c)
    case SqlType.TimeT =>
      // Range-checked, not just shape-checked: '99:99' must fail HERE
      // with a structured validator error, not later at the JDBC sink
      // as an undiagnosed per-row DB failure.
      when(c.rlike("^\\s*([01]?\\d|2[0-3]):[0-5]\\d(:[0-5]\\d)?\\s*$"), trim(c))
    case SqlType.Blob => c.cast("binary")
  }

  /** Additional per-type validity predicate beyond parseability:
    * VARCHAR length cap, CHAR exact length, finite numerics
    * (`data_validator.py:373-452`, overflow-to-±inf reject
    * `csv_ingestor.py:24-54`).
    */
  def extraInvalid(c: Column, t: SqlType): Column = t match {
    case SqlType.Varchar(n) => length(c) > n
    case SqlType.Char(n) => length(c) =!= n
    case SqlType.FloatT | SqlType.DoubleT =>
      val d = F.tryCastNumeric(c, "double")
      d.isNotNull && (isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity)
    case _ => lit(false)
  }

  /** Per-column invalid predicate: present but unparseable, or parseable
    * but violating the extra constraint. `nullTokens` is the category's
    * null vocabulary (`csv_ingestor.py:62-67` — the reference applies it
    * at parse time via na_values, so validation must treat those tokens
    * as ABSENT, not as junk).
    */
  def invalid(c: Column, t: SqlType, nullTokens: Seq[String] = Seq("")): Column = {
    val present = c.isNotNull && !trim(c).isin(nullTokens: _*)
    (present && tryParse(c, t).isNull) || (present && extraInvalid(c, t))
  }

  /** One-scan validation: per column count + ≤5 samples of offenders.
    * Returns Right(typed frame) or Left(report).
    */
  def apply(df: DataFrame, schema: Seq[(String, SqlType)],
            nullTokens: Seq[String] = Seq("")): Either[ValidationResult, DataFrame] = {
    val missing = schema.map(_._1).filterNot(df.columns.toSet)
    if (missing.nonEmpty)
      return Left(ValidationResult.fail(
        missing.map(c => s"Schema column '$c' not found in source data"): _*))

    val aggs: Seq[Column] = schema.flatMap { case (name, t) =>
      val c = col(name)
      val inv = invalid(c, t, nullTokens)
      Seq(
        sum(when(inv, 1).otherwise(0)).cast("long").as(s"${name}__bad"),
        slice(collect_list(when(inv, c)), 1, 5).as(s"${name}__samples"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()

    val errors = schema.flatMap { case (name, t) =>
      val bad = row.getAs[Long](s"${name}__bad")
      if (bad > 0) {
        val samples = row.getAs[Seq[String]](s"${name}__samples").mkString("'", "', '", "'")
        Some(s"Column '$name': $bad value(s) not valid for declared type ${t.ddl} " +
          s"(samples: $samples)")
      } else None
    }
    if (errors.nonEmpty) Left(ValidationResult(isValid = false, errors = errors.toList))
    else Right(cast(df, schema))
  }

  /** The typed projection (no checks — callers validate first, or accept
    * nulls for junk via the try-parse semantics).
    */
  def cast(df: DataFrame, schema: Seq[(String, SqlType)]): DataFrame = {
    val typed = schema.map { case (name, t) => tryParse(col(name), t).as(name) }
    val passthrough = df.columns.filterNot(schema.map(_._1).toSet)
      .map(col).toSeq
    df.select(typed ++ passthrough: _*)
  }

  /** JSON-category disposition: keep only rows whose every declared
    * column is valid; callers count the dropped rows as `skipped`
    * (`json_ingestor.py:367-388` — skip with warning, not fatal).
    */
  def validRowFilter(schema: Seq[(String, SqlType)],
                     nullTokens: Seq[String] = Seq("")): Column =
    schema.map { case (name, t) => !invalid(col(name), t, nullTokens) }
      .reduceOption(_ && _).getOrElse(lit(true))
}
