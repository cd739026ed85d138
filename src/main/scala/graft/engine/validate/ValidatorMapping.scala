package graft.engine.validate

import graft.core.{ResolvedConfig, TaskCategory}
import graft.engine.Validator

/** Category → ordered validator battery (the "planner" —
  * `utils/validators_mapping.py:30-236`). Ordering is semantic: cheap
  * driver-side checks first, then filesystem inventories, then data
  * scans (`base.py:639-651` fail-fast preflight ordering).
  */
object ValidatorMapping {
  import Validators._
  import FileValidators._
  import XmlValidators._

  def forConfig(cfg: ResolvedConfig): Seq[Validator] = {
    // CSV disposition: a present-but-invalid value fails the RUN for
    // every category with a declared schema (`csv_ingestor.py:184-280`)
    // — without this, StrictCast.cast in the Ingestor would silently
    // null junk for non-tabular categories. JSON keeps its skip
    // disposition (per-record check in the Ingestor, V18).
    val strictTypes: Seq[Validator] =
      if (cfg.dataFormat == "csv" && cfg.schema.nonEmpty) Seq(new DataValidator)
      else Nil
    val common: Seq[Validator] =
      Seq(new TableNameValidator, new DuplicateValidator) ++ strictTypes

    val byCategory: Seq[Validator] = cfg.category match {
      case TaskCategory.TabularClassification | TaskCategory.TabularRegression =>
        Nil // DataValidator already in the common battery

      case TaskCategory.TimeSeriesForecasting =>
        Seq(new NumericColumnsValidator,
          new TimeFormatValidator, new TimeOrderedValidator,
          new TimeBeforeTodayValidator)

      case TaskCategory.TimeToEventPrediction =>
        Seq(new TimeToEventValidator)

      case TaskCategory.ImageClassification =>
        Seq(new SrcPathValidator(cfg.images, "images")) ++
          cfg.images.map(d => new FileTypeValidator(d,
            Set("jpg", "jpeg", "png"), "images")).toSeq ++
          cfg.images.map(d => new ImageResolutionValidator(d,
            targetSize(cfg))).toSeq

      case TaskCategory.ObjectDetection =>
        Seq(new SrcPathValidator(cfg.images, "images"),
          new SrcPathValidator(cfg.annotations, "annotations")) ++
          (for (i <- cfg.images; a <- cfg.annotations) yield Seq(
            new FileTypeValidator(a, Set("xml"), "annotations"),
            new FilePairingValidator(i, a, "annotation"),
            new PascalVocXmlValidator(a))).toSeq.flatten

      case TaskCategory.SemanticSegmentation | TaskCategory.InstanceSegmentation =>
        Seq(new SrcPathValidator(cfg.images, "images"),
          new SrcPathValidator(cfg.masks, "masks")) ++
          (for (i <- cfg.images; m <- cfg.masks) yield
            new FilePairingValidator(i, m, "mask", stripSuffix = Some("_mask"))).toSeq

      case TaskCategory.KeypointDetection =>
        Seq(new SrcPathValidator(cfg.images, "images"),
          new KeypointAnnotationValidator, new KeypointVisibilityValidator)

      case TaskCategory.TextClassification =>
        Seq(new SrcPathValidator(cfg.texts, "texts")) ++
          cfg.texts.map(d =>
            new FileTypeValidator(d, Set("txt"), "texts")).toSeq :+
          new TokenizerValidator(tokenizerPath(cfg), mandatory = false)

      case TaskCategory.TokenClassification =>
        Seq(new SrcPathValidator(cfg.texts, "texts")) ++
          cfg.texts.map(d => new BioLabelValidator(d,
            filenameColumn = filenameColumn(cfg), labelColumn =
              cfg.labelColumn.getOrElse("label"))).toSeq :+
          new TokenizerValidator(tokenizerPath(cfg), mandatory = false)

      case TaskCategory.MaskedLanguageModeling =>
        Seq(new SrcPathValidator(cfg.sequences, "sequences"),
          new TokenizerValidator(tokenizerPath(cfg), mandatory = true))

      case _ => Nil
    }
    common ++ byCategory
  }

  private def targetSize(cfg: ResolvedConfig): Option[(Int, Int)] =
    cfg.fileOptions.get("target_size").collect {
      case s: Seq[_] if s.size == 2 =>
        (String.valueOf(s.head).toInt, String.valueOf(s(1)).toInt)
    }

  private def tokenizerPath(cfg: ResolvedConfig): Option[String] =
    cfg.fileOptions.get("tokenizer_path").map(String.valueOf(_))
      .orElse(cfg.texts.map(t => s"$t/../tokenizer.json"))
      .orElse(cfg.sequences.map(t => s"$t/../tokenizer.json"))

  private def filenameColumn(cfg: ResolvedConfig): String =
    cfg.fileOptions.get("filename_column").map(String.valueOf(_)).getOrElse("filename")

  /** Run the battery: ALL validators execute, errors accumulate, one
    * combined result (`ingestors/base.py:622-688`).
    */
  def runAll(validators: Seq[Validator],
             ctx: graft.engine.ValidationContext): graft.engine.ValidationResult =
    validators.map { v =>
      try v.validate(ctx)
      catch {
        case e: Exception =>
          graft.engine.ValidationResult.fail(s"[${v.name}] validator crashed: ${e.getMessage}")
      }
    }.foldLeft(graft.engine.ValidationResult.ok)(_ ++ _)
}
