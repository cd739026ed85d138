package graft.core

/** Declarative run configuration — the engine-side port of the
  * reference's `IngestConfig` v1 contract (`schema/ingest.v1.json`,
  * `cli/conventions.py:190-302`). Pure data + a pure resolver: no Spark,
  * no I/O, unit-testable on day one (SURVEY.md §7.1 module 1).
  */
object TaskCategory {
  val ImageClassification = "image_classification"
  val ObjectDetection = "object_detection"
  val KeypointDetection = "keypoint_detection"
  val TextClassification = "text_classification"
  val TokenClassification = "token_classification"
  val TabularClassification = "tabular_classification"
  val TabularRegression = "tabular_regression"
  val TimeSeriesForecasting = "time_series_forecasting"
  val TimeToEventPrediction = "time_to_event_prediction"
  val SemanticSegmentation = "semantic_segmentation"
  val InstanceSegmentation = "instance_segmentation"
  val MaskedLanguageModeling = "masked_language_modeling"

  val all: Seq[String] = Seq(
    ImageClassification, ObjectDetection, KeypointDetection,
    TextClassification, TokenClassification, TabularClassification,
    TabularRegression, TimeSeriesForecasting, TimeToEventPrediction,
    SemanticSegmentation, InstanceSegmentation, MaskedLanguageModeling)

  val imageCategories: Set[String] = Set(ImageClassification, ObjectDetection,
    KeypointDetection, SemanticSegmentation, InstanceSegmentation)
  val textCategories: Set[String] = Set(TextClassification, TokenClassification)
  val tabularCategories: Set[String] = Set(TabularClassification, TabularRegression)
  /** Label is a numeric prediction target → privacy policy required
    * (`cli/conventions.py` REGRESSION_CLASS_CATEGORIES). */
  val regressionClassCategories: Set[String] =
    Set(TabularRegression, TimeSeriesForecasting, TimeToEventPrediction)
  /** Categories whose records reference sidecar files (`base.py:56-65`). */
  val fileBearingCategories: Set[String] =
    imageCategories ++ textCategories + MaskedLanguageModeling
}

object Intent {
  val Train = "train"
  val Test = "test"
  val all: Seq[String] = Seq(Train, Test)
}

sealed trait LabelPolicy
object LabelPolicy {
  case object Passthrough extends LabelPolicy
  /** Privacy bucketing: sha256-first-8-bytes mod `buckets`
    * (`utils/label_policy.py:52-96`), -1 sentinel for missing. */
  final case class Bucket(buckets: Int = 64) extends LabelPolicy

  def parse(s: String): Either[String, LabelPolicy] = s match {
    case "passthrough" => Right(Passthrough)
    case "bucket" => Right(Bucket())
    case other => Left(s"Unknown label policy '$other' (expected passthrough|bucket)")
  }
}

/** CSV reader options (defaults per `cli/conventions.py` DEFAULT_CSV_OPTIONS;
  * chunk_size is a pandas memory workaround with no Spark counterpart —
  * partitioned scans stream by design, SURVEY.md §4).
  */
final case class CsvOptions(
    delimiter: String = ",",
    quoteChar: String = "\"",
    // Excel/pandas dialect: quotes escape by doubling ("" inside a
    // quoted field). Spark's default backslash-escape silently corrupts
    // such values; set "\\" explicitly for backslash-escaped data.
    escapeChar: String = "\"",
    encoding: String = "UTF-8")

/** A fully-resolved run configuration: customer values win, category
  * conventions fill the rest (mirror of `ResolvedConfig`,
  * `cli/conventions.py:129-183`).
  */
final case class ResolvedConfig(
    category: String,
    tableName: String,
    intent: String,
    dataFormat: String,
    sourcePath: String,
    images: Option[String] = None,
    annotations: Option[String] = None,
    masks: Option[String] = None,
    texts: Option[String] = None,
    sequences: Option[String] = None,
    schema: Seq[(String, String)] = Nil,
    timeColumn: Option[String] = None,
    labelColumn: Option[String] = None,
    labelPolicy: LabelPolicy = LabelPolicy.Passthrough,
    uniqueIdColumn: Option[String] = None,
    annotationColumn: Option[String] = None,
    csvOptions: CsvOptions = CsvOptions(),
    fileOptions: Map[String, Any] = Map.empty,
    destPath: Option[String] = None,
    batchSize: Int = 4000)

object Conventions {

  /** Top-level vocabulary of the v1 contract — anything else is a typo
    * (`catagory:`, `lable:`) and is rejected by JSON pointer, matching
    * the reference schema's `additionalProperties: false`
    * (`schema/ingest.v1.json`, locked by `tests/test_schema_validation
    * .py:141-145`).
    */
  private val knownTopLevelKeys: Set[String] = Set(
    "apiVersion", "kind", "category", "table", "intent", "csv", "json",
    "schema", "label", "data_id", "images", "annotations", "masks",
    "texts", "sequences", "time_column", "target_size",
    "number_of_keypoints", "batch_size", "dest", "spec")

  /** Resolve a parsed YAML body (already structurally validated) into a
    * ResolvedConfig. Mirrors `cli/conventions.py:resolve` decision order:
    * identity → source dispatch → sidecars → schema → label → data_id →
    * options merge → category bridges — and enforces the ingest.v1
    * schema contract's rejection paths (unknown fields, category
    * sidecar requirements, self-supervised label ban, data_id strategy
    * coherence, apiVersion/kind locks) with one JSON-pointer-prefixed
    * error per violation, all accumulated before returning.
    */
  def resolve(config: Map[String, Any]): Either[List[String], ResolvedConfig] = {
    val errs = List.newBuilder[String]
    def str(k: String): Option[String] = config.get(k).collect { case s: String => s }

    (config.keySet -- knownTopLevelKeys).toSeq.sorted.foreach { k =>
      errs += s"/$k: unknown field (allowed: ${knownTopLevelKeys.toSeq.sorted.mkString(", ")})"
    }
    str("apiVersion").foreach { v =>
      if (v != "graft/v1") errs += s"/apiVersion: '$v' is not 'graft/v1'"
    }
    str("kind").foreach { v =>
      if (v != "IngestConfig") errs += s"/kind: '$v' is not 'IngestConfig'"
    }

    val category = str("category").getOrElse { errs += "/category: required"; "" }
    if (category.nonEmpty && !TaskCategory.all.contains(category))
      errs += s"/category: '$category' is not one of ${TaskCategory.all.mkString(", ")}"
    val table = str("table").getOrElse { errs += "/table: required"; "" }
    val intent = str("intent").getOrElse { errs += "/intent: required"; "" }
    if (intent.nonEmpty && !Intent.all.contains(intent))
      errs += s"/intent: '$intent' is not one of ${Intent.all.mkString(", ")}"

    // Category sidecar/field requirements (ingest.v1.json conditional
    // blocks; each locked by a test_schema_validation.py rejection case).
    if (TaskCategory.imageCategories.contains(category) && str("images").isEmpty)
      errs += s"/images: required for category '$category'"
    if (category == TaskCategory.ObjectDetection && str("annotations").isEmpty)
      errs += "/annotations: required for category 'object_detection'"
    if (category == TaskCategory.SemanticSegmentation && str("masks").isEmpty)
      errs += "/masks: required for category 'semantic_segmentation'"
    if (TaskCategory.textCategories.contains(category) && str("texts").isEmpty)
      errs += s"/texts: required for category '$category'"
    if (category == TaskCategory.MaskedLanguageModeling && str("sequences").isEmpty)
      errs += "/sequences: required for category 'masked_language_modeling'"
    if (category == TaskCategory.TokenClassification && !config.contains("label"))
      errs += "/label: required for category 'token_classification'"
    if (TaskCategory.tabularCategories.contains(category) && !config.contains("schema"))
      errs += s"/schema: required for category '$category'"
    // Self-supervised categories MUST NOT carry label: the rows would
    // ingest and then fail at backend registration with a misleading
    // error (reference issue #213, test_schema_validation.py:235-245).
    if (category == TaskCategory.MaskedLanguageModeling && config.contains("label"))
      errs += "/label: not allowed for self-supervised category 'masked_language_modeling'"

    def anyMap(v: Any): Map[String, Any] = v match {
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.map { case (k, vv) => (String.valueOf(k), vv: Any) }.toMap
      case m: Map[_, _] => m.map { case (k, vv) => (String.valueOf(k), vv: Any) }
      case _ => Map.empty
    }

    val (sourcePath, dataFormat) = (str("csv"), str("json")) match {
      case (Some(p), None) => (p, "csv")
      case (None, Some(p)) => (p, "json")
      case (Some(_), Some(_)) => errs += "/csv: exactly one of csv|json allowed"; ("", "")
      case _ => errs += "/csv: one of csv|json required"; ("", "")
    }

    val declaredSchema: Seq[(String, String)] = config.get("schema") match {
      case Some(m: java.util.Map[_, _]) =>
        import scala.jdk.CollectionConverters._
        m.asScala.toSeq.map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }
      case Some(m: Map[_, _]) =>
        m.toSeq.map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }
      case Some(_) => errs += "/schema: must be a column->type mapping"; Nil
      case None => Nil
    }

    val (labelColumn, labelPolicy) = config.get("label") match {
      case Some(s: String) => (Some(s), LabelPolicy.Passthrough)
      case Some(m: java.util.Map[_, _]) =>
        import scala.jdk.CollectionConverters._
        val mm = m.asScala.map { case (k, v) => (String.valueOf(k), v) }.toMap
        // Same additionalProperties:false rule as the top level: a
        // typo'd `polcy` key would otherwise default the policy to
        // passthrough and silently ship raw labels.
        (mm.keySet -- Set("column", "policy")).toSeq.sorted.foreach(k =>
          errs += s"/label/$k: unknown key (allowed: column, policy)")
        val colName = mm.get("column").map(String.valueOf(_))
        if (colName.isEmpty) errs += "/label/column: required in object form"
        val policy = mm.get("policy").map(String.valueOf(_)).getOrElse("passthrough")
        LabelPolicy.parse(policy) match {
          case Right(p) => (colName, p)
          case Left(e) => errs += s"/label/policy: $e"; (colName, LabelPolicy.Passthrough)
        }
      case Some(_) => errs += "/label: string or {column, policy} object"; (None, LabelPolicy.Passthrough)
      case None => (None, LabelPolicy.Passthrough)
    }
    // Regression-class targets must not ship raw (schema rule in
    // ingest.v1.json: policy required for these categories).
    if (TaskCategory.regressionClassCategories.contains(category) &&
      labelColumn.isDefined && labelPolicy == LabelPolicy.Passthrough)
      errs += s"/label/policy: category '$category' requires an explicit non-passthrough policy"

    val uniqueIdColumn = config.get("data_id") match {
      case Some(m: java.util.Map[_, _]) =>
        import scala.jdk.CollectionConverters._
        val mm = m.asScala.map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }.toMap
        (mm.keySet -- Set("strategy", "column")).toSeq.sorted.foreach(k =>
          errs += s"/data_id/$k: unknown key (allowed: strategy, column)")
        mm.get("strategy") match {
          case Some("column") =>
            val c = mm.get("column")
            if (c.isEmpty) errs += "/data_id/column: required when strategy=column"
            c
          case Some("uuid") => None
          case Some(other) =>
            errs += s"/data_id/strategy: '$other' is not one of column, uuid"; None
          case None =>
            // Guard against the vacuous-if bug (test_schema_validation
            // .py:314-322): `{column: x}` without `strategy` used to pass
            // validation and be silently IGNORED by the resolver — the
            // customer's explicit column selection dropped on the floor.
            if (mm.contains("column"))
              errs += "/data_id/strategy: required when column is set (did you mean strategy: column?)"
            None
        }
      case Some(_) => errs += "/data_id: must be a {strategy[, column]} object"; None
      case None => None
    }

    // Custom-processor escape hatch: each entry needs script AND class
    // (test_schema_validation.py:325-329).
    config.get("spec").foreach { s =>
      anyMap(s).get("processors").foreach {
        case l: java.util.List[_] =>
          import scala.jdk.CollectionConverters._
          l.asScala.zipWithIndex.foreach { case (p, i) =>
            val pm = anyMap(p)
            if (!pm.contains("script")) errs += s"/spec/processors/$i/script: required"
            if (!pm.contains("class")) errs += s"/spec/processors/$i/class: required"
          }
        case l: Seq[_] =>
          l.zipWithIndex.foreach { case (p, i) =>
            val pm = anyMap(p)
            if (!pm.contains("script")) errs += s"/spec/processors/$i/script: required"
            if (!pm.contains("class")) errs += s"/spec/processors/$i/class: required"
          }
        case _ => errs += "/spec/processors: must be a list"
      }
    }

    // Options merge (steps 6–7 of the reference resolver): customer
    // spec.csv_options / spec.file_options over category defaults, plus
    // the documented top-level bridges (target_size,
    // number_of_keypoints, batch_size).
    config.get("spec").foreach {
      case _: java.util.Map[_, _] | _: Map[_, _] => ()
      case _ => errs += "/spec: must be a mapping"
    }
    val spec = config.get("spec").map(anyMap).getOrElse(Map.empty)
    val csvOv = spec.get("csv_options").map(anyMap).getOrElse(Map.empty)
    // chunk_size is ACCEPTED and ignored (pandas memory workaround, no
    // Spark counterpart — documented above); anything else unknown is a
    // typo that would silently fall back to a default.
    (csvOv.keySet -- Set("delimiter", "quotechar", "escapechar",
      "encoding", "chunk_size")).toSeq.sorted.foreach(k =>
      errs += s"/spec/csv_options/$k: unknown key")
    val csvOptions = CsvOptions(
      delimiter = csvOv.get("delimiter").map(String.valueOf(_)).getOrElse(","),
      quoteChar = csvOv.get("quotechar").map(String.valueOf(_)).getOrElse("\""),
      escapeChar = csvOv.get("escapechar").map(String.valueOf(_)).getOrElse("\""),
      encoding = csvOv.get("encoding").map(String.valueOf(_)).getOrElse("UTF-8"))
    var fileOptions = spec.get("file_options").map(anyMap).getOrElse(Map.empty)
    def intOr(pointer: String, v: Any, default: Int): Int =
      try String.valueOf(v).toInt
      catch { case _: NumberFormatException =>
        errs += s"$pointer: '$v' is not an integer"; default
      }
    config.get("target_size").foreach { ts =>
      if (!fileOptions.contains("target_size")) ts match {
        case l: java.util.List[_] =>
          import scala.jdk.CollectionConverters._
          fileOptions += ("target_size" ->
            l.asScala.toSeq.map(intOr("/target_size", _, 0)))
        case l: Seq[_] =>
          fileOptions += ("target_size" -> l.map(intOr("/target_size", _, 0)))
        case _ => errs += "/target_size: must be a [width, height] list"
      }
    }
    config.get("number_of_keypoints").foreach { k =>
      if (!fileOptions.contains("number_of_keypoints"))
        fileOptions += ("number_of_keypoints" -> intOr("/number_of_keypoints", k, 0))
    }
    val batchSize = config.get("batch_size")
      .map(intOr("/batch_size", _, 4000)).getOrElse(4000)

    def optStr(k: String) = str(k)
    val resolved = ResolvedConfig(
      category = category,
      tableName = table,
      intent = intent,
      dataFormat = dataFormat,
      sourcePath = sourcePath,
      images = optStr("images"),
      annotations = optStr("annotations"),
      masks = optStr("masks"),
      texts = optStr("texts"),
      sequences = optStr("sequences"),
      schema = declaredSchema,
      timeColumn = optStr("time_column"),
      labelColumn = labelColumn,
      labelPolicy = labelPolicy,
      uniqueIdColumn = uniqueIdColumn,
      annotationColumn =
        if (category == TaskCategory.KeypointDetection) Some("Annotation") else None,
      csvOptions = csvOptions,
      fileOptions = fileOptions,
      destPath = optStr("dest"),
      batchSize = batchSize)

    val allErrs = errs.result().sorted // deterministic, pointer-ordered
    if (allErrs.nonEmpty) Left(allErrs) else Right(resolved)
  }
}

/** YAML loading via snakeyaml (ships with Spark). Driver-side only. */
object YamlConfig {
  import scala.jdk.CollectionConverters._

  def parse(yamlText: String): Either[List[String], Map[String, Any]] = {
    val loaded =
      try new org.yaml.snakeyaml.Yaml().load[Any](yamlText)
      catch { case e: Exception => return Left(List(s"/: YAML parse error: ${e.getMessage}")) }
    loaded match {
      case m: java.util.Map[_, _] =>
        Right(m.asScala.map { case (k, v) => (String.valueOf(k), v: Any) }.toMap)
      case _ => Left(List("/: top-level YAML must be a mapping"))
    }
  }

  def load(path: String): Either[List[String], ResolvedConfig] = {
    val text =
      try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case e: Exception => return Left(List(s"/: cannot read $path: ${e.getMessage}")) }
    parse(text).flatMap(Conventions.resolve)
  }
}
