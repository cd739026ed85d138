package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => F}

/** The per-record transform pipeline of the reference (SURVEY.md §2.2
  * P1–P9) as declarative column expressions: schema projection +
  * cleaning, null-vocabulary normalization, data_id assignment, label
  * policy (passthrough and privacy hash-bucket), intent stamping and
  * constant enrichment — i.e. what `ingestors/base.py:328-412` does per
  * Python dict, done once per column over the whole frame.
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- P1/P4/P6/P7/P8: the standard-columns projection ---------------
    // documents as the "manifest": every framework column the sink
    // receives, minus the runtime-generated ones (uuid/timestamps stay
    // out so the output is deterministic and oracle-comparable).
    "p_standard_columns" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id").cast("string").as("data_id"),
        col("lang").as("label"),
        lit("train").as("data_intent"),
        concat(lit("doc_"), col("doc_id"), lit(".txt")).as("filename"),
        lit("txt").as("extension"),
        lit(0).as("status"),
        lit("run-0001").as("ingestor_id"),
        col("n_chars"))
        .orderBy("data_id")
    },

    // -- P5: privacy label policy — hash-bucket distribution -----------
    // (utils/label_policy.py:52-96; custom Catalyst expression because
    // the first 8 sha256 bytes form an UNSIGNED 64-bit int)
    "p5_label_bucket" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(F.labelBucket(col("lang"), 64).as("bucket"))
        .agg(count(lit(1)).as("n"),
          concat_ws(",", sort_array(collect_set("lang"))).as("langs"))
        .orderBy("bucket")
    },

    // -- P1: 4-way null-vocabulary normalization (base.py:342-377 +
    //    tabular tokens csv_ingestor.py:62-67), over deterministically
    //    dirtied strings so every branch is exercised -----------------
    "p1_null_normalize" -> { (s, d) =>
      val dirty = when(col("doc_id") % 7 === 0, lit(""))
        .when(col("doc_id") % 7 === 1, lit("NA"))
        .when(col("doc_id") % 7 === 2, lit(" None "))
        .when(col("doc_id") % 7 === 3, lit("NULL"))
        .when(col("doc_id") % 7 === 4, lit(null).cast("string"))
        .otherwise(concat(lit("  "), col("source"), lit("  ")))
      Tables.documents(s, d)
        .withColumn("norm", F.nullNormalized(dirty))
        .agg(
          sum(when(col("norm").isNull, 1).otherwise(0)).as("n_null"),
          sum(when(col("norm").isNotNull, 1).otherwise(0)).as("n_value"),
          countDistinct("norm").as("n_distinct"),
          min("norm").as("min_v"),
          max("norm").as("max_v"),
          // survivors must be trimmed: count any with edge whitespace
          sum(when(col("norm") =!= trim(col("norm")), 1).otherwise(0)).as("n_untrimmed"))
    },

    // -- P3: strict cast layer — INT stays INT (never "7.0"), junk is
    //    counted not silently nulled (csv_ingestor.py:184-280) ---------
    "p3_strict_casts" -> { (s, d) =>
      // Render ints through a float-looking string and prove the cast
      // path recovers exact integers (the "7 becomes 7.0" trap).
      Tables.part(s, d)
        .withColumn("recovered",
          expr("try_cast(try_cast(concat(cast(p_size AS string), '.0') AS DOUBLE) AS INT)"))
        .agg(
          sum(when(col("recovered") === col("p_size"), 1).otherwise(0)).as("n_roundtrip_ok"),
          sum(when(col("recovered").isNull, 1).otherwise(0)).as("n_failed"),
          count(lit(1)).as("n_rows"))
    },

    // -- P2/P9-adjacent: header/value trim parity ----------------------
    "p2_trim_values" -> { (s, d) =>
      val padded = concat(lit("  "), col("c_mktsegment"), lit("\t"))
      Tables.customer(s, d)
        .groupBy(trim(padded).as("segment"))
        .agg(count(lit(1)).as("n"))
        .orderBy("segment")
    })

  def oracle: Map[String, String] = Map(
    "p_standard_columns" ->
      """SELECT doc_id::VARCHAR AS data_id, lang AS label, 'train' AS data_intent,
        | 'doc_' || doc_id || '.txt' AS filename, 'txt' AS extension,
        | 0 AS status, 'run-0001' AS ingestor_id, n_chars
        |FROM documents ORDER BY data_id""".stripMargin,
    "p5_label_bucket" ->
      """SELECT bucket, count(*) AS n,
        | string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
        |FROM (
        |  SELECT lang,
        |    ((SELECT sum((strpos('0123456789abcdef', substr(h, i, 1)) - 1)::HUGEINT
        |               * (1::HUGEINT << ((16 - i) * 4)))
        |      FROM generate_series(1, 16) g(i)) % 64)::INT AS bucket
        |  FROM (SELECT lang, sha256(lang) AS h FROM documents)
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "p1_null_normalize" ->
      """SELECT
        | sum(CASE WHEN norm IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        | sum(CASE WHEN norm IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_value,
        | count(DISTINCT norm) AS n_distinct,
        | min(norm) AS min_v, max(norm) AS max_v,
        | sum(CASE WHEN norm != trim(norm) THEN 1 ELSE 0 END)::BIGINT AS n_untrimmed
        |FROM (
        |  SELECT CASE WHEN dirty IS NULL OR trim(dirty) IN ('', 'NA', 'NULL', 'None')
        |              THEN NULL ELSE trim(dirty) END AS norm
        |  FROM (
        |    SELECT CASE doc_id % 7
        |      WHEN 0 THEN '' WHEN 1 THEN 'NA' WHEN 2 THEN ' None '
        |      WHEN 3 THEN 'NULL' WHEN 4 THEN NULL
        |      ELSE '  ' || source || '  ' END AS dirty
        |    FROM documents))""".stripMargin,
    "p3_strict_casts" ->
      """SELECT
        | sum(CASE WHEN recovered = p_size THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip_ok,
        | sum(CASE WHEN recovered IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_failed,
        | count(*) AS n_rows
        |FROM (SELECT p_size,
        |        TRY_CAST(TRY_CAST(p_size::VARCHAR || '.0' AS DOUBLE) AS INT) AS recovered
        |      FROM part)""".stripMargin,
    "p2_trim_values" ->
      """SELECT trim('  ' || c_mktsegment || chr(9)) AS segment, count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
}
