package graft.engine

/** Outcome of one validator (reference `validators/base.py:25-39`):
  * errors fail the run, warnings don't, metadata feeds the summary.
  * Results compose by concatenation — the battery runs ALL validators
  * and raises one combined error (`ingestors/base.py:622-688`).
  */
final case class ValidationResult(
    isValid: Boolean,
    errors: List[String] = Nil,
    warnings: List[String] = Nil,
    metadata: Map[String, String] = Map.empty) {

  def ++(other: ValidationResult): ValidationResult = ValidationResult(
    isValid && other.isValid,
    errors ++ other.errors,
    warnings ++ other.warnings,
    metadata ++ other.metadata)
}

object ValidationResult {
  val ok: ValidationResult = ValidationResult(isValid = true)
  def fail(errs: String*): ValidationResult =
    ValidationResult(isValid = false, errors = errs.toList)
  def warn(ws: String*): ValidationResult =
    ValidationResult(isValid = true, warnings = ws.toList)
}

/** A validator computes a boolean aggregate over the data (or a
  * filesystem/config check) and reports structured errors. DataFrame
  * validators must aggregate — never collect data columns to the driver.
  */
trait Validator {
  def name: String
  def validate(ctx: ValidationContext): ValidationResult
}

/** Everything a validator may need. `manifest` is the typed-as-string
  * manifest scan (all columns StringType — the raw tokens); sidecar
  * inventories are loaded lazily by file validators.
  */
final case class ValidationContext(
    spark: org.apache.spark.sql.SparkSession,
    config: graft.core.ResolvedConfig,
    manifest: Option[org.apache.spark.sql.DataFrame])
