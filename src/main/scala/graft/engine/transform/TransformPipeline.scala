package graft.engine.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{LabelPolicy, ResolvedConfig, TaskCategory}
import graft.functions.{GraftFunctions => F}

/** The per-record transform pipeline (SURVEY.md §2.2 P1–P9) as one
  * declarative projection — the reference walks a Python dict per record
  * (`ingestors/base.py:328-412`); here every step is a column expression
  * inside one whole-stage-codegen pass:
  *
  *  P1 schema projection + cleaning (trim, 4-way null normalize)
  *  P2 header trim
  *  P4 data_id: source column (trimmed, null ⇒ record dropped) or uuid()
  *  P5 label policy: passthrough | privacy hash-bucket
  *  P6 intent stamping
  *  P7 constant enrichment (ingestor_id, filename, extension)
  *  P8 annotation mapping
  *  P9 audit timestamps (left to the sink's DDL server defaults, like
  *     the reference — `database.py:363-375`)
  */
object TransformPipeline {

  /** Null token vocabulary is category-dependent (`csv_ingestor.py:62-67`):
    * tabular categories accept "NA"/"NULL"/"None"; everything else only "".
    */
  def nullTokensFor(category: String): Seq[String] =
    if (TaskCategory.tabularCategories.contains(category)) F.tabularNullTokens
    else Seq("")

  def labelExpr(c: Column, policy: LabelPolicy): Column = policy match {
    // str(nan) → "nan" corruption guard: blank/missing stays null
    case LabelPolicy.Passthrough =>
      when(c.isNull || trim(c.cast("string")) === "", lit(null).cast("string"))
        .otherwise(trim(c.cast("string")))
    case LabelPolicy.Bucket(n) => F.labelBucket(c, n).cast("string")
  }

  /** Raw (all-string) manifest frame → standard-columns frame + cleaned
    * feature columns (still strings; callers run
    * [[graft.engine.read.StrictCast]] after, so junk diagnostics refer
    * to the cleaned values exactly like the reference).
    */
  def apply(df0: DataFrame, config: ResolvedConfig, runId: String,
            filenameColumn: Option[String] = None): DataFrame = {
    // P2: trim headers
    val df = df0.toDF(df0.columns.map(_.trim).toIndexedSeq: _*)
    val tokens = nullTokensFor(config.category)

    val special = Set(config.labelColumn, config.annotationColumn,
      config.uniqueIdColumn, filenameColumn).flatten
    // P1: features = declared schema minus remapped special columns
    val featureCols = config.schema.map(_._1).filterNot(special)
      .filter(df.columns.contains)

    val dataId: Column = config.uniqueIdColumn match {
      case Some(uid) => trim(col(uid))
      case None => expr("uuid()")
    }
    val label: Column = config.labelColumn
      .map(lc => labelExpr(col(lc), config.labelPolicy))
      .getOrElse(lit(null).cast("string"))
    val annotation: Column = config.annotationColumn
      .map(ac => col(ac).cast("string"))
      .getOrElse(lit(null).cast("string"))
    val filename: Column = filenameColumn
      .map(fc => trim(col(fc)))
      .getOrElse(lit(null).cast("string"))
    val extension: Column =
      when(filename.isNotNull && filename.rlike("\\.[A-Za-z0-9]+$"),
        regexp_extract(filename, "\\.([A-Za-z0-9]+)$", 1))

    val standard = Seq(
      lit(0).as("status"),
      label.as("label"),
      lit(config.intent).as("data_intent"),
      dataId.as("data_id"),
      filename.as("filename"),
      extension.as("extension"),
      annotation.as("annotation"),
      lit(runId).as("ingestor_id"))
    val features = featureCols.map(c => F.nullNormalized(col(c), tokens).as(c))

    df.select(standard ++ features: _*)
      // P4: a null/blank data_id from a source column drops the record
      // (base.py:315-326 "skip record")
      .filter(col("data_id").isNotNull && col("data_id") =!= "")
  }
}
