package graft.engine.validate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{SqlType, StandardColumns, TaskCategory}
import graft.engine.{ValidationContext, ValidationResult, Validator}
import graft.engine.read.StrictCast
import graft.functions.{GraftFunctions => F}

/** The validator battery (SURVEY.md §2.3): each validator is a boolean
  * aggregate query with a structured error report. DataFrame validators
  * are single scans with map-side partial aggregation; filesystem and
  * config validators run on the driver (they touch no data).
  */
object Validators {

  // ---------------------------------------------------------------- V7
  /** Table name shape + reserved-keyword warning
    * (`table_name_validator.py:22-281`).
    */
  final class TableNameValidator extends Validator {
    val name = "table_name"
    private val Shape = "^[a-zA-Z][a-zA-Z0-9_]*$".r
    private val reservedKeywords = Set(
      "select", "insert", "update", "delete", "table", "index", "key",
      "primary", "foreign", "create", "drop", "alter", "grant", "revoke",
      "from", "where", "group", "order", "having", "join", "union", "into",
      "values", "set", "and", "or", "not", "null", "default", "check",
      "constraint", "references", "database", "schema", "view", "trigger",
      "procedure", "function", "cursor", "declare", "begin", "end", "commit",
      "rollback", "transaction", "lock", "unlock", "desc", "asc", "distinct",
      "limit", "offset", "between", "like", "in", "exists", "case", "when",
      "then", "else", "cast", "convert", "left", "right", "inner", "outer",
      "cross", "full", "on", "using", "natural", "as", "by", "is", "all",
      "any", "some", "column", "add", "modify", "change", "rename", "truncate")

    def validate(ctx: ValidationContext): ValidationResult = {
      val t = ctx.config.tableName
      if (t.isEmpty || Shape.findFirstIn(t).isEmpty)
        ValidationResult.fail(
          s"Invalid table name '$t': must match ^[a-zA-Z][a-zA-Z0-9_]*$$")
      else if (t.length > StandardColumns.maxIdentifierLength)
        ValidationResult.fail(
          s"Table name '$t' exceeds ${StandardColumns.maxIdentifierLength} characters")
      else if (reservedKeywords.contains(t.toLowerCase))
        ValidationResult.warn(s"Table name '$t' is a reserved SQL keyword")
      else ValidationResult.ok
    }
  }

  // ---------------------------------------------------------------- V8
  /** Destination dir must not exist non-empty (empty = reuse with a
    * warning) — `duplicate_validator.py:22-145`.
    */
  final class DuplicateValidator extends Validator {
    val name = "duplicate"
    def validate(ctx: ValidationContext): ValidationResult =
      ctx.config.destPath match {
        case None => ValidationResult.ok
        case Some(dest) =>
          val p = new Path(dest)
          val fs = p.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(p)) {
            val parent = p.getParent
            if (parent != null && !fs.exists(parent))
              ValidationResult.warn(
                s"Parent directory ${parent} does not exist; it will be created")
            else ValidationResult.ok
          } else if (fs.listStatus(p).isEmpty)
            ValidationResult.warn(s"Destination $dest exists but is empty; reusing")
          else
            ValidationResult.fail(
              s"Destination $dest already exists and is not empty " +
                "(refusing to mix datasets)")
      }
  }

  // ---------------------------------------------------------------- V1
  /** Declared-schema type validation: one aggregation scan counting
    * present-but-unparseable values per column with ≤5 samples
    * (`data_validator.py:28-841` — the 50k chunk loop is a pandas
    * memory workaround; a Spark scan streams by design).
    */
  final class DataValidator extends Validator {
    val name = "data"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      SqlType.parseSchema(ctx.config.schema) match {
        case Left(errs) => ValidationResult(isValid = false, errors = errs)
        case Right(parsed) =>
          val tokens = graft.engine.transform.TransformPipeline
            .nullTokensFor(ctx.config.category)
          StrictCast(df, parsed, tokens) match {
            case Left(report) => report
            case Right(_) => ValidationResult.ok
          }
      }
    }
  }

  // ---------------------------------------------------------------- V2
  /** All schema columns except `timestamp` numeric; nulls tolerated
    * (lag/window features carry leading NULLs) —
    * `numeric_columns_validator.py:23-144`.
    */
  final class NumericColumnsValidator extends Validator {
    val name = "numeric_columns"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      val cols = ctx.config.schema.map(_._1)
        .filterNot(_ == "timestamp").filter(df.columns.contains)
      if (cols.isEmpty) return ValidationResult.ok
      val aggs = cols.flatMap { c =>
        val present = col(c).isNotNull && trim(col(c)) =!= ""
        Seq(
          sum(when(present && F.tryCastNumeric(col(c), "double").isNull, 1).otherwise(0))
            .cast("long").as(s"${c}__nonnum"),
          sum(when(!present, 1).otherwise(0)).cast("long").as(s"${c}__null"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val errors = cols.flatMap { c =>
        val bad = row.getAs[Long](s"${c}__nonnum")
        if (bad > 0) Some(s"Column '$c': $bad non-numeric value(s)") else None
      }
      val meta = cols.map(c => s"null_count.$c" -> row.getAs[Long](s"${c}__null").toString)
      ValidationResult(errors.isEmpty, errors.toList, Nil, meta.toMap)
    }
  }

  // ---------------------------------------------------------------- V3
  /** `timestamp` column: declared TIMESTAMP, all present values parse,
    * and no value is locale-ambiguous (parses differently day-first vs
    * month-first and is not ISO-shaped) —
    * `time_format_validator.py:22-136`.
    */
  final class TimeFormatValidator extends Validator {
    val name = "time_format"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      val declared = ctx.config.schema.toMap.get("timestamp")
      if (declared.isEmpty)
        return ValidationResult.fail("Schema must declare a 'timestamp' column")
      if (!declared.exists(t => SqlType.parse(t).exists(_ == SqlType.DateTimeT)))
        return ValidationResult.fail(
          s"'timestamp' must be DATETIME/TIMESTAMP, got '${declared.get}'")
      if (!df.columns.contains("timestamp"))
        return ValidationResult.fail("Source data has no 'timestamp' column")
      val c = col("timestamp")
      val present = c.isNotNull && trim(c) =!= ""
      val mdy = F.parseDatetimeLenient(c, dayFirst = false)
      val dmy = F.parseDatetimeLenient(c, dayFirst = true)
      val ambiguous = mdy.isNotNull && dmy.isNotNull && (mdy =!= dmy) &&
        !trim(c).rlike("^\\d{4}-")
      val row = df.agg(
        sum(when(present && mdy.isNull && dmy.isNull, 1).otherwise(0)).cast("long").as("unparseable"),
        sum(when(ambiguous, 1).otherwise(0)).cast("long").as("ambiguous"),
        slice(collect_list(when(ambiguous, c)), 1, 5).as("samples")).head()
      val errs = List(
        Option.when(row.getAs[Long]("unparseable") > 0)(
          s"${row.getAs[Long]("unparseable")} timestamp value(s) unparseable"),
        Option.when(row.getAs[Long]("ambiguous") > 0)(
          s"${row.getAs[Long]("ambiguous")} timestamp value(s) are locale-ambiguous " +
            s"(parse differently day-first vs month-first; samples: " +
            s"${row.getAs[Seq[String]]("samples").mkString(", ")}). Use ISO dates.")).flatten
      ValidationResult(errs.isEmpty, errs)
    }
  }

  // ---------------------------------------------------------------- V4
  /** Timestamps monotonic non-decreasing in FILE order; counts
    * out-of-order adjacent pairs (`time_ordered_validator.py:22-85`).
    * File order needs a stable row index: a single-file CSV read is one
    * narrow partition per file split, so a coalesce(1) +
    * monotonically_increasing_id gives exact file order. At 100 TB this
    * check is inherently sequential — the reference semantics IS a
    * global order; for partitioned data use per-key monotonicity (see
    * CoreQueries.w1_monotonic).
    */
  final class TimeOrderedValidator extends Validator {
    val name = "time_ordered"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      if (!df.columns.contains("timestamp"))
        return ValidationResult.fail("Source data has no 'timestamp' column")
      val indexed = df.coalesce(1)
        .withColumn("__idx", monotonically_increasing_id())
        .withColumn("__ts", F.parseDatetimeLenient(col("timestamp")))
      val w = Window.orderBy("__idx")
      val row = indexed
        .withColumn("__prev", lag("__ts", 1).over(w))
        .agg(sum(when(col("__ts") < col("__prev"), 1).otherwise(0))
          .cast("long").as("ooo")).head()
      val n = row.getAs[Long]("ooo")
      if (n > 0)
        ValidationResult.fail(s"$n adjacent timestamp pair(s) out of order " +
          "(data must be sorted by timestamp)")
      else ValidationResult.ok
    }
  }

  // ---------------------------------------------------------------- V5
  /** No timestamp at/after today (normalized); reports earliest/latest
    * (`time_before_today_validator.py:22-88`).
    */
  final class TimeBeforeTodayValidator extends Validator {
    val name = "time_before_today"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      if (!df.columns.contains("timestamp"))
        return ValidationResult.fail("Source data has no 'timestamp' column")
      val ts = F.parseDatetimeLenient(col("timestamp"))
      val row = df.agg(
        sum(when(date_trunc("day", ts) >= current_date().cast("timestamp"), 1)
          .otherwise(0)).cast("long").as("future"),
        min(ts).as("earliest"), max(ts).as("latest")).head()
      val n = row.getAs[Long]("future")
      val meta = Map(
        "earliest" -> String.valueOf(row.get(1)),
        "latest" -> String.valueOf(row.get(2)))
      if (n > 0)
        ValidationResult(isValid = false,
          errors = List(s"$n timestamp(s) at or after today"), metadata = meta)
      else ValidationResult(isValid = true, metadata = meta)
    }
  }

  // ---------------------------------------------------------------- V6
  /** Required `time` column: present exactly, numeric, non-negative;
    * min/max/mean stats (`time_to_event_validator.py:32-234`).
    */
  final class TimeToEventValidator extends Validator {
    val name = "time_to_event"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      val timeCol = ctx.config.timeColumn.getOrElse("time")
      if (!df.columns.contains(timeCol))
        return ValidationResult.fail(s"Required column '$timeCol' not found")
      val c = col(timeCol)
      val present = c.isNotNull && trim(c) =!= ""
      val d = F.tryCastNumeric(c, "double")
      val row = df.agg(
        sum(when(present && d.isNull, 1).otherwise(0)).cast("long").as("nonnum"),
        sum(when(d < 0, 1).otherwise(0)).cast("long").as("neg"),
        min(d).as("min"), max(d).as("max"), avg(d).as("mean")).head()
      val errs = List(
        Option.when(row.getAs[Long]("nonnum") > 0)(
          s"Column '$timeCol': ${row.getAs[Long]("nonnum")} non-numeric value(s)"),
        Option.when(row.getAs[Long]("neg") > 0)(
          s"Column '$timeCol': ${row.getAs[Long]("neg")} negative value(s)")).flatten
      ValidationResult(errs.isEmpty, errs, Nil, Map(
        "time.min" -> String.valueOf(row.get(2)),
        "time.max" -> String.valueOf(row.get(3)),
        "time.mean" -> String.valueOf(row.get(4))))
    }
  }

  // --------------------------------------------------------------- V13
  /** Keypoint `Annotation` JSON: valid dict, `[x,y]` numeric ≥ 0 pairs,
    * declared keypoint count, non-degenerate bbox, key set consistent
    * with the first record (`keypoint_annotation_validator.py:23-224`).
    */
  final class KeypointAnnotationValidator extends Validator {
    val name = "keypoint_annotation"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      val annCol = ctx.config.annotationColumn.getOrElse("Annotation")
      if (!df.columns.contains(annCol))
        return ValidationResult.fail(s"Annotation column '$annCol' not found")
      val k = ctx.config.fileOptions.get("number_of_keypoints")
        .map(v => String.valueOf(v).toInt)
      val parsed = from_json(col(annCol), lit("map<string,array<double>>"))
      val keys = sort_array(map_keys(parsed))
      val vals = map_values(parsed)
      val badShape = exists(vals, a => size(a) =!= 2 ||
        a.getItem(0).isNull || a.getItem(1).isNull ||
        a.getItem(0) < 0 || a.getItem(1) < 0)
      val xs = transform(vals, a => a.getItem(0))
      val ys = transform(vals, a => a.getItem(1))
      val degenerate = (array_max(xs) - array_min(xs) <= 0) ||
        (array_max(ys) - array_min(ys) <= 0)
      val wrongCount = k.map(kk => size(map_keys(parsed)) =!= kk).getOrElse(lit(false))
      // Key-set consistency compares against the FIRST record's sorted
      // key list (`keypoint_annotation_validator.py:205-224`); carried
      // as a joined string to stay driver-type-agnostic.
      val refKeys = first(concat_ws(",", keys), ignoreNulls = true)
      val agg1 = df.agg(
        sum(when(col(annCol).isNotNull && parsed.isNull, 1).otherwise(0)).cast("long").as("bad_json"),
        sum(when(badShape, 1).otherwise(0)).cast("long").as("bad_shape"),
        sum(when(degenerate, 1).otherwise(0)).cast("long").as("degenerate"),
        sum(when(wrongCount, 1).otherwise(0)).cast("long").as("wrong_count"),
        refKeys.as("ref_keys")).head()
      val ref = agg1.getAs[String]("ref_keys")
      val inconsistent =
        if (ref == null) 0L
        else df.agg(sum(when(parsed.isNotNull &&
          concat_ws(",", keys) =!= lit(ref), 1).otherwise(0)).cast("long")).head().getLong(0)
      val errs = List(
        Option.when(agg1.getAs[Long]("bad_json") > 0)(
          s"${agg1.getAs[Long]("bad_json")} row(s) with invalid Annotation JSON"),
        Option.when(agg1.getAs[Long]("bad_shape") > 0)(
          s"${agg1.getAs[Long]("bad_shape")} row(s) with non-[x,y]/negative keypoints"),
        Option.when(agg1.getAs[Long]("degenerate") > 0)(
          s"${agg1.getAs[Long]("degenerate")} row(s) with degenerate bounding box"),
        Option.when(agg1.getAs[Long]("wrong_count") > 0)(
          s"${agg1.getAs[Long]("wrong_count")} row(s) with wrong keypoint count" +
            k.map(kk => s" (expected $kk)").getOrElse("")),
        Option.when(inconsistent > 0)(
          s"$inconsistent row(s) whose keypoint names differ from the first record")).flatten
      ValidationResult(errs.isEmpty, errs)
    }
  }

  // --------------------------------------------------------------- V14
  /** Keypoint `Visibility` JSON: values ∈ {0,1}, key set == Annotation
    * keys (`keypoint_visibility_validator.py:23-120`).
    */
  final class KeypointVisibilityValidator extends Validator {
    val name = "keypoint_visibility"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      val annCol = ctx.config.annotationColumn.getOrElse("Annotation")
      if (!df.columns.contains("Visibility"))
        return ValidationResult.ok // optional column
      val ann = from_json(col(annCol), lit("map<string,array<double>>"))
      val vis = from_json(col("Visibility"), lit("map<string,double>"))
      val badVal = exists(map_values(vis), v => v =!= 0.0 && v =!= 1.0)
      val keyMismatch = size(array_except(map_keys(ann), map_keys(vis))) > 0 ||
        size(array_except(map_keys(vis), map_keys(ann))) > 0
      val row = df.agg(
        sum(when(col("Visibility").isNotNull && vis.isNull, 1).otherwise(0)).cast("long").as("bad_json"),
        sum(when(badVal, 1).otherwise(0)).cast("long").as("bad_val"),
        sum(when(ann.isNotNull && vis.isNotNull && keyMismatch, 1).otherwise(0))
          .cast("long").as("mismatch")).head()
      val errs = List(
        Option.when(row.getAs[Long]("bad_json") > 0)(
          s"${row.getAs[Long]("bad_json")} row(s) with invalid Visibility JSON"),
        Option.when(row.getAs[Long]("bad_val") > 0)(
          s"${row.getAs[Long]("bad_val")} row(s) with visibility values outside {0,1}"),
        Option.when(row.getAs[Long]("mismatch") > 0)(
          s"${row.getAs[Long]("mismatch")} row(s) whose Visibility keys differ from Annotation")).flatten
      ValidationResult(errs.isEmpty, errs)
    }
  }
}
