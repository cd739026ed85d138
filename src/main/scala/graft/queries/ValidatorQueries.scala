package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => F}

/** The reference's validator battery (SURVEY.md §2.3 V1–V18) re-expressed
  * as DataFrame aggregation queries over the testdata tables: each
  * validator is a per-column boolean aggregate ("how many present values
  * fail the declared-type predicate"), which is exactly what the
  * reference computes with pandas Series ops
  * (`validators/data_validator.py:329-354`).
  *
  * At 100 TB these are single full scans with map-side partial
  * aggregation — no shuffle beyond the final 1-row (or per-group)
  * combine, no driver-side data movement.
  */
object ValidatorQueries {

  /** v11 fixture: parseable Pascal-VOC XML strings whose error/warning
    * counts are INDEPENDENTLY derivable in SQL from regexp-extracted
    * fields (every file is structurally complete with integer coords,
    * so the only rules that can fire are the coordinate/area/difficult
    * rules plus the root-tag and no-objects checks — all
    * regexp-computable). Spark runs the real
    * [[graft.engine.validate.XmlValidators.checkVocXml]] kernel
    * (`xml_validator.py:22-643`); DuckDB re-derives the counts from the
    * raw XML text. Unparseable XML stays unit-test-only: SQL cannot
    * decide well-formedness. */
  private val v11Dir = "/tmp/graft_gate_v11_voc"

  private def voc(objects: String*): String =
    s"""<annotation>
       |  <folder>imgs</folder><filename>a.jpg</filename>
       |  <source><database>fixture</database></source>
       |  <size><width>640</width><height>480</height><depth>3</depth></size>
       |  <segmented>0</segmented>
       |  ${objects.mkString("\n  ")}
       |</annotation>""".stripMargin

  private def obj(xmin: Int, ymin: Int, xmax: Int, ymax: Int,
                  difficult: Int = 0): String =
    s"""<object><name>cat</name><pose>Left</pose><truncated>0</truncated>
       |    <difficult>$difficult</difficult>
       |    <bndbox><xmin>$xmin</xmin><ymin>$ymin</ymin><xmax>$xmax</xmax><ymax>$ymax</ymax></bndbox>
       |  </object>""".stripMargin

  private def vocFixture: Seq[(Long, String)] = Seq(
    // valid: 2 objects, difficult 0/1 — no issues
    1L -> voc(obj(10, 20, 110, 220), obj(5, 5, 50, 60, difficult = 1)),
    // no objects — 1 warning
    2L -> voc(),
    // wrong root element — 1 error, early return
    3L -> "<document><size><width>1</width></size></document>",
    // degenerate box xmin==xmax — 1 error, no area warning (x1<x2 false)
    4L -> voc(obj(50, 10, 50, 90)),
    // negative coordinate (still xmin<xmax) — 1 error
    5L -> voc(obj(-5, 10, 60, 90)),
    // tiny 3x2 box — area-6 warning only
    6L -> voc(obj(10, 10, 13, 12)),
    // difficult=2 warns; difficult=-1 errors
    7L -> voc(obj(10, 10, 60, 60, difficult = 2),
      obj(20, 20, 80, 80, difficult = -1)),
    // inverted y — 1 error
    8L -> voc(obj(10, 90, 60, 10)),
    // mixed: ok + doubly-inverted (2 errors) + tiny 2x2 (warning)
    9L -> voc(obj(0, 0, 100, 100), obj(70, 80, 30, 40), obj(1, 1, 3, 3)),
    // 5 valid objects — no issues
    10L -> voc((1 to 5).map(i => obj(i * 10, i * 10, i * 10 + 40, i * 10 + 30)): _*))

  private def writeV11Fixture(s: SparkSession): Unit = {
    import s.implicits._
    s.createDataset(vocFixture).toDF("xml_id", "xml")
      .coalesce(1).write.mode("overwrite").parquet(v11Dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- V11 kernel gate: the real checkVocXml parse over an XML-string
    //    column; the oracle recomputes root tag, object count, and
    //    error/warning totals from the text with regexp extraction. ----
    "v11_voc_fields" -> { (s, _) =>
      writeV11Fixture(s)
      val analyze = udf { (id: Long, xmlText: String) =>
        val issues = graft.engine.validate.XmlValidators.checkVocXml(s"x$id", xmlText)
        val root = scala.xml.XML.loadString(xmlText)
        (root.label, (root \ "object").length.toLong,
          issues.errors.length.toLong, issues.warnings.length.toLong)
      }
      s.read.parquet(v11Dir)
        .withColumn("__a", analyze(col("xml_id"), col("xml")))
        .select(col("xml_id"), col("__a._1").as("root_tag"),
          col("__a._2").as("n_objects"), col("__a._3").as("n_errors"),
          col("__a._4").as("n_warnings"))
        .orderBy("xml_id")
    },

    // -- V1: present-but-unparseable counts per declared type ----------
    // (data_validator.py:356-821 — try-parse each value, count failures;
    // here over stringified columns so the cast is genuine.)
    "v1_typecheck_counts" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_quantity").cast("string").as("qty_s"),
          col("l_returnflag").as("flag_s"),
          col("l_linenumber").cast("string").as("ln_s"))
        .agg(
          sum(when(F.tryCastNumeric(col("qty_s"), "double").isNull && col("qty_s").isNotNull, 1)
            .otherwise(0)).as("bad_double"),
          sum(when(F.tryCastNumeric(col("flag_s"), "int").isNull && col("flag_s").isNotNull, 1)
            .otherwise(0)).as("bad_int_flag"),
          sum(when(F.tryCastNumeric(col("ln_s"), "int").isNull && col("ln_s").isNotNull, 1)
            .otherwise(0)).as("bad_int_ln"),
          count(lit(1)).as("n_rows"))
    },

    // -- V1: VARCHAR(n) length overflow + CHAR exact-length ------------
    // (data_validator.py:373-452)
    "v1_varchar_len" -> { (s, d) =>
      Tables.documents(s, d).agg(
        max(length(col("text"))).cast("long").as("max_len"),
        sum(when(length(col("text")) > 255, 1).otherwise(0)).as("n_over_255"),
        sum(when(length(col("lang")) =!= 2, 1).otherwise(0)).as("n_char2_violation"),
        count(lit(1)).as("n_rows"))
    },

    // -- V1: boolean textual vocabulary (csv_ingestor.py:233-247,
    //    data_validator.py:639-742) incl. "1.0" and numeric coercion ---
    "v1_bool_vocab" -> { (s, d) =>
      val boolStr = when(col("event_type") === "click", lit("yes"))
        .when(col("event_type") === "view", lit("1.0"))
        .when(col("event_type") === "error", lit("f"))
        .when(col("event_type") === "purchase", lit("TRUE"))
        .otherwise(lit("maybe"))
      Tables.events(s, d)
        .withColumn("b", F.parseBool(boolStr))
        .groupBy("event_type")
        .agg(
          sum(when(col("b") === true, 1).otherwise(0)).as("n_true"),
          sum(when(col("b") === false, 1).otherwise(0)).as("n_false"),
          sum(when(col("b").isNull, 1).otherwise(0)).as("n_unparseable"))
        .orderBy("event_type")
    },

    // -- V3: locale-ambiguity guard (time_format_validator.py:79-106):
    //    a non-ISO date string that parses BOTH day-first and
    //    month-first to different instants is ambiguous. Spark side
    //    does the real dual parse over rendered strings; the oracle
    //    states the analytic truth (day<=12 && day!=month). -----------
    "v3_date_ambiguity" -> { (s, d) =>
      val rendered = date_format(col("ts"), "M/d/yyyy")
      val mdy = F.parseDatetimeLenient(rendered, dayFirst = false)
      val dmy = F.parseDatetimeLenient(rendered, dayFirst = true)
      Tables.events(s, d)
        .select(rendered.as("s"), mdy.as("mdy"), dmy.as("dmy"))
        .agg(
          sum(when(col("mdy").isNotNull && col("dmy").isNotNull &&
            col("mdy") =!= col("dmy"), 1).otherwise(0)).as("n_ambiguous"),
          sum(when(col("dmy").isNull, 1).otherwise(0)).as("n_dayfirst_unparseable"),
          sum(when(col("mdy").isNull, 1).otherwise(0)).as("n_monthfirst_unparseable"),
          count(lit(1)).as("n_rows"))
    },

    // -- V5: no timestamp at/after a cutoff; earliest/latest report ----
    // (time_before_today_validator.py:22-88; fixed cutoff instead of
    // current_date so the oracle is reproducible at any wall time)
    "v5_before_cutoff" -> { (s, d) =>
      Tables.events(s, d).agg(
        sum(when(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"), 1)
          .otherwise(0)).as("n_at_or_after"),
        unix_micros(min(col("ts"))).as("earliest_us"),
        unix_micros(max(col("ts"))).as("latest_us"))
    },

    // -- V6: numeric non-negative column with min/max/mean stats -------
    // (time_to_event_validator.py:32-234)
    "v6_numeric_stats" -> { (s, d) =>
      Tables.events(s, d).agg(
        sum(when(col("value") < 0, 1).otherwise(0)).as("n_negative"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("n_null"),
        round(min("value"), 4).as("min_v"),
        round(max("value"), 4).as("max_v"),
        round(avg("value"), 4).as("mean_v"))
    },

    // -- V13/V14: JSON payload shape validation via from_json ----------
    // (keypoint_annotation_validator.py:104-167 — JSON string column,
    // typed extraction, per-field predicate counts)
    "v13_json_payload" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", from_json(col("props"), lit("k INT")).getField("k"))
        .agg(
          sum(when(col("k").isNull && col("props").isNotNull, 1).otherwise(0)).as("n_bad_json"),
          min("k").as("min_k"),
          max("k").as("max_k"),
          round(avg("k"), 4).as("avg_k"))
    },

    // -- V2: all-columns-numeric check, nulls tolerated ---------------
    // (numeric_columns_validator.py:23-144)
    "v2_numeric_columns" -> { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_acctbal").cast("string").as("bal_s"),
          col("c_name").as("name_s"))
        .agg(
          sum(when(F.tryCastNumeric(col("bal_s"), "double").isNull && col("bal_s").isNotNull, 1)
            .otherwise(0)).as("bad_bal"),
          sum(when(F.tryCastNumeric(col("name_s"), "double").isNull && col("name_s").isNotNull, 1)
            .otherwise(0)).as("bad_name"),
          sum(when(col("bal_s").isNull, 1).otherwise(0)).as("null_bal"))
    },

    // -- V14: keypoint visibility-flag domain + coordinate bounds ------
    // (keypoint_visibility_validator.py — vis must be in {0,1,2}, x/y
    // inside the declared frame). Keypoints constructed deterministically
    // from event_id so every branch (valid vis, invalid vis=3, bounds)
    // is exercised and the oracle rebuilds the identical set in SQL.
    "v14_keypoint_visibility" -> { (s, d) =>
      val kps = array((0 until 3).map { i =>
        struct(
          ((col("event_id") * 7 + i * 13) % 640).as("x"),
          ((col("event_id") * 11 + i * 17) % 480).as("y"),
          ((col("event_id") + i) % 4).as("vis"))
      }: _*)
      Tables.events(s, d)
        .select(explode(kps).as("kp"))
        .agg(
          count(lit(1)).as("n_keypoints"),
          sum(when(col("kp.vis").isin(0, 1, 2), 0).otherwise(1)).as("n_bad_vis"),
          sum(when(col("kp.x") < 0 || col("kp.x") >= 640 ||
            col("kp.y") < 0 || col("kp.y") >= 480, 1).otherwise(0)).as("n_oob"),
          sum(when(col("kp.vis") === 2, 1).otherwise(0)).as("n_visible"))
    },

    // -- V18: per-record skip disposition (JSON ingest skip semantics,
    //    json_ingestor skip paths): each record is kept, skipped-empty
    //    or skipped-uncastable; the pipeline reports counts per
    //    disposition instead of failing the batch. --------------------
    "v18_skip_disposition" -> { (s, d) =>
      val raw = when(col("doc_id") % 11 === 0, lit("not_a_number"))
        .when(col("doc_id") % 11 === 1, lit(""))
        .otherwise(col("n_chars").cast("string"))
      Tables.documents(s, d)
        .withColumn("raw", raw)
        .withColumn("parsed", F.tryCastNumeric(col("raw"), "bigint"))
        .withColumn("disposition",
          when(col("parsed").isNotNull, lit("ok"))
            .when(col("raw") === "", lit("skipped_empty"))
            .otherwise(lit("skipped_cast")))
        .groupBy("disposition")
        .agg(count(lit(1)).as("n"),
          coalesce(sum("parsed"), lit(0L)).as("sum_parsed"))
        .orderBy("disposition")
    },

    // -- V16/J2: token-count lockstep between label and content --------
    // (bio_label_validator.py:137-163 — declared count must equal the
    // computed word count of the paired text)
    "v16_token_lockstep" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("tc", F.tokenCount(col("text")))
        .groupBy("lang")
        .agg(
          sum("tc").as("total_tokens"),
          sum(when(col("tc") === 0, 1).otherwise(0)).as("n_empty"),
          sum(when(length(col("text")) =!= col("n_chars"), 1).otherwise(0)).as("n_len_mismatch"))
        .orderBy("lang")
    })

  def oracle: Map[String, String] = Map(
    // Independent re-derivation: the oracle never sees the kernel's
    // issue lists — it recomputes the counts from the XML TEXT. Rule
    // map (each a kernel branch in checkVocXml): per-object negative
    // coord (counts once), xmin>=xmax, ymin>=ymax, difficult<0 → errors;
    // no-objects, valid-box area<10, difficult>1 → warnings; root
    // mismatch short-circuits to exactly 1 error.
    "v11_voc_fields" ->
      s"""WITH f AS (
         |  SELECT xml_id,
         |    regexp_extract(xml, '<([A-Za-z]+)', 1) AS root_tag,
         |    [x::INT FOR x IN regexp_extract_all(xml, '<xmin>\\s*(-?\\d+)\\s*</xmin>', 1)] AS xs1,
         |    [x::INT FOR x IN regexp_extract_all(xml, '<ymin>\\s*(-?\\d+)\\s*</ymin>', 1)] AS ys1,
         |    [x::INT FOR x IN regexp_extract_all(xml, '<xmax>\\s*(-?\\d+)\\s*</xmax>', 1)] AS xs2,
         |    [x::INT FOR x IN regexp_extract_all(xml, '<ymax>\\s*(-?\\d+)\\s*</ymax>', 1)] AS ys2,
         |    [x::INT FOR x IN regexp_extract_all(xml, '<difficult>\\s*(-?\\d+)\\s*</difficult>', 1)] AS diffs,
         |    len(regexp_extract_all(xml, '<object>')) AS n_objects
         |  FROM read_parquet('$v11Dir/*.parquet')
         |)
         |SELECT xml_id, root_tag, n_objects,
         |  CASE WHEN root_tag != 'annotation' THEN 1::BIGINT ELSE
         |    len(list_filter(range(len(xs1)),
         |      i -> xs1[i+1] < 0 OR ys1[i+1] < 0 OR xs2[i+1] < 0 OR ys2[i+1] < 0))
         |    + len(list_filter(range(len(xs1)), i -> xs1[i+1] >= xs2[i+1]))
         |    + len(list_filter(range(len(ys1)), i -> ys1[i+1] >= ys2[i+1]))
         |    + len(list_filter(diffs, d -> d < 0))
         |  END AS n_errors,
         |  CASE WHEN root_tag != 'annotation' THEN 0::BIGINT ELSE
         |    (CASE WHEN n_objects = 0 THEN 1 ELSE 0 END)
         |    + len(list_filter(range(len(xs1)),
         |        i -> xs1[i+1] < xs2[i+1] AND ys1[i+1] < ys2[i+1]
         |             AND (xs2[i+1] - xs1[i+1]) * (ys2[i+1] - ys1[i+1]) < 10))
         |    + len(list_filter(diffs, d -> d > 1))
         |  END AS n_warnings
         |FROM f ORDER BY xml_id""".stripMargin,
    "v1_typecheck_counts" ->
      """SELECT
        | sum(CASE WHEN TRY_CAST(qty_s AS DOUBLE) IS NULL AND qty_s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS bad_double,
        | sum(CASE WHEN TRY_CAST(flag_s AS INT) IS NULL AND flag_s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS bad_int_flag,
        | sum(CASE WHEN TRY_CAST(ln_s AS INT) IS NULL AND ln_s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS bad_int_ln,
        | count(*) AS n_rows
        |FROM (SELECT l_quantity::VARCHAR AS qty_s, l_returnflag AS flag_s,
        |             l_linenumber::VARCHAR AS ln_s FROM lineitem)""".stripMargin,
    "v1_varchar_len" ->
      """SELECT max(length(text)) AS max_len,
        | sum(CASE WHEN length(text) > 255 THEN 1 ELSE 0 END)::BIGINT AS n_over_255,
        | sum(CASE WHEN length(lang) != 2 THEN 1 ELSE 0 END)::BIGINT AS n_char2_violation,
        | count(*) AS n_rows
        |FROM documents""".stripMargin,
    "v1_bool_vocab" ->
      """SELECT event_type,
        | sum(CASE WHEN b = true THEN 1 ELSE 0 END)::BIGINT AS n_true,
        | sum(CASE WHEN b = false THEN 1 ELSE 0 END)::BIGINT AS n_false,
        | sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unparseable
        |FROM (
        |  SELECT event_type,
        |    CASE
        |      WHEN lower(trim(bs)) IN ('true','yes','t','y','1') THEN true
        |      WHEN lower(trim(bs)) IN ('false','no','f','n','0') THEN false
        |      WHEN TRY_CAST(lower(trim(bs)) AS DOUBLE) = 1.0 THEN true
        |      WHEN TRY_CAST(lower(trim(bs)) AS DOUBLE) = 0.0 THEN false
        |      ELSE NULL END AS b
        |  FROM (
        |    SELECT event_type,
        |      CASE event_type WHEN 'click' THEN 'yes' WHEN 'view' THEN '1.0'
        |        WHEN 'error' THEN 'f' WHEN 'purchase' THEN 'TRUE'
        |        ELSE 'maybe' END AS bs
        |    FROM events)
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "v3_date_ambiguity" ->
      """SELECT
        | sum(CASE WHEN day(ts) <= 12 AND day(ts) != month(ts) THEN 1 ELSE 0 END)::BIGINT AS n_ambiguous,
        | sum(CASE WHEN day(ts) > 12 THEN 1 ELSE 0 END)::BIGINT AS n_dayfirst_unparseable,
        | 0::BIGINT AS n_monthfirst_unparseable,
        | count(*) AS n_rows
        |FROM events""".stripMargin,
    "v5_before_cutoff" ->
      """SELECT
        | sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END)::BIGINT AS n_at_or_after,
        | epoch_us(min(ts)) AS earliest_us,
        | epoch_us(max(ts)) AS latest_us
        |FROM events""".stripMargin,
    "v6_numeric_stats" ->
      """SELECT
        | sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative,
        | sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        | round(min(value),4) AS min_v,
        | round(max(value),4) AS max_v,
        | round(avg(value),4) AS mean_v
        |FROM events""".stripMargin,
    "v13_json_payload" ->
      """SELECT
        | sum(CASE WHEN k IS NULL AND props IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_bad_json,
        | min(k) AS min_k, max(k) AS max_k, round(avg(k),4) AS avg_k
        |FROM (SELECT props, json_extract_string(props,'$.k')::INT AS k FROM events)""".stripMargin,
    "v2_numeric_columns" ->
      """SELECT
        | sum(CASE WHEN TRY_CAST(bal_s AS DOUBLE) IS NULL AND bal_s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS bad_bal,
        | sum(CASE WHEN TRY_CAST(name_s AS DOUBLE) IS NULL AND name_s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS bad_name,
        | sum(CASE WHEN bal_s IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_bal
        |FROM (SELECT c_acctbal::VARCHAR AS bal_s, c_name AS name_s FROM customer)""".stripMargin,
    "v14_keypoint_visibility" ->
      """SELECT count(*) AS n_keypoints,
        | sum(CASE WHEN vis IN (0,1,2) THEN 0 ELSE 1 END)::BIGINT AS n_bad_vis,
        | sum(CASE WHEN x < 0 OR x >= 640 OR y < 0 OR y >= 480 THEN 1 ELSE 0 END)::BIGINT AS n_oob,
        | sum(CASE WHEN vis = 2 THEN 1 ELSE 0 END)::BIGINT AS n_visible
        |FROM (
        |  SELECT (event_id*7 + i*13) % 640 AS x,
        |         (event_id*11 + i*17) % 480 AS y,
        |         (event_id + i) % 4 AS vis
        |  FROM events CROSS JOIN (SELECT unnest(range(0,3)) AS i))""".stripMargin,
    "v18_skip_disposition" ->
      """SELECT disposition, count(*) AS n, coalesce(sum(parsed), 0)::BIGINT AS sum_parsed
        |FROM (
        |  SELECT TRY_CAST(raw AS BIGINT) AS parsed,
        |    CASE WHEN TRY_CAST(raw AS BIGINT) IS NOT NULL THEN 'ok'
        |         WHEN raw = '' THEN 'skipped_empty'
        |         ELSE 'skipped_cast' END AS disposition
        |  FROM (
        |    SELECT CASE doc_id % 11
        |      WHEN 0 THEN 'not_a_number' WHEN 1 THEN ''
        |      ELSE n_chars::VARCHAR END AS raw
        |    FROM documents))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "v16_token_lockstep" ->
      """SELECT lang,
        | sum(tc)::BIGINT AS total_tokens,
        | sum(CASE WHEN tc = 0 THEN 1 ELSE 0 END)::BIGINT AS n_empty,
        | sum(CASE WHEN length(text) != n_chars THEN 1 ELSE 0 END)::BIGINT AS n_len_mismatch
        |FROM (
        |  SELECT lang, text, n_chars,
        |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |         ELSE len(regexp_extract_all(trim(text), '\S+')) END AS tc
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
