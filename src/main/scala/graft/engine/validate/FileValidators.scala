package graft.engine.validate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ValidationContext, ValidationResult, Validator}
import graft.functions.{GraftFunctions => F}

/** File-inventory validators (SURVEY.md §2.3 V9–V12, V15–V17): sidecar
  * directories are scanned into inventory DataFrames (distributed
  * `binaryFile` scans — at 100 TB a directory listing must never become
  * a driver-side Set), then validated with aggregations and anti-joins.
  */
object FileValidators {

  /** Inventory scan: one row per non-hidden file with name/stem/ext.
    * `binaryFile` lists distributedly and reads content lazily (content
    * column is pruned away unless a validator needs bytes).
    */
  def inventory(spark: SparkSession, dir: String): DataFrame = {
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("path"), col("length"))
      .filter(!col("name").startsWith("."))
      .withColumn("ext", lower(regexp_extract(col("name"), "\\.([A-Za-z0-9]+)$", 1)))
      .withColumn("stem", regexp_replace(col("name"), "\\.[A-Za-z0-9]+$", ""))
  }

  // ---------------------------------------------------------------- V17
  /** SRC_PATH preflight for file-bearing categories: one clear error
    * instead of N per-row misses (`ingestors/base.py:414-456`).
    */
  final class SrcPathValidator(dir: Option[String], label: String) extends Validator {
    val name = s"src_path_$label"
    def validate(ctx: ValidationContext): ValidationResult = dir match {
      case None => ValidationResult.fail(
        s"Category '${ctx.config.category}' requires a '$label' directory")
      case Some(d) =>
        val p = new Path(d)
        if (!p.isAbsolute) ValidationResult.fail(s"$label path '$d' must be absolute")
        else {
          val fs = p.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(p)) ValidationResult.fail(s"$label path '$d' does not exist")
          else ValidationResult.ok
        }
    }
  }

  // ---------------------------------------------------------------- V9
  /** All files in a sidecar dir share ONE extension == the allowed one
    * (`file_validator.py:22-233`).
    */
  final class FileTypeValidator(dir: String, allowed: Set[String], label: String)
      extends Validator {
    val name = s"file_type_$label"
    def validate(ctx: ValidationContext): ValidationResult = {
      val inv = inventory(ctx.spark, dir)
      val row = inv.agg(
        countDistinct("ext").cast("long").as("n_ext"),
        concat_ws(",", sort_array(collect_set("ext"))).as("exts"),
        sum(when(!col("ext").isin(allowed.toSeq: _*), 1).otherwise(0))
          .cast("long").as("n_bad"),
        count(lit(1)).cast("long").as("n_files")).head()
      val exts = row.getAs[String]("exts")
      val errs = List(
        Option.when(row.getAs[Long]("n_files") == 0L)(s"$label directory '$dir' is empty"),
        Option.when(row.getAs[Long]("n_ext") > 1)(
          s"$label files mix extensions: [$exts] (exactly one expected)"),
        Option.when(row.getAs[Long]("n_bad") > 0)(
          s"${row.getAs[Long]("n_bad")} $label file(s) with extension outside " +
            s"${allowed.toList.sorted.mkString("{", ",", "}")}: found [$exts]")).flatten
      ValidationResult(errs.isEmpty, errs,
        metadata = Map(s"$label.n_files" -> row.getAs[Long]("n_files").toString))
    }
  }

  // ---------------------------------------------------------------- V12
  /** Images ↔ sidecars pair 1:1 by filename stem, optional sidecar
    * suffix strip (`_mask` for semseg); missing + orphans reported via
    * two-sided anti-join (`file_pairing_validator.py:27-142`).
    */
  final class FilePairingValidator(imagesDir: String, sidecarDir: String,
                                   sidecarLabel: String, stripSuffix: Option[String] = None)
      extends Validator {
    val name = s"file_pairing_$sidecarLabel"
    def validate(ctx: ValidationContext): ValidationResult = {
      val images = inventory(ctx.spark, imagesDir).select(col("stem"))
      val sidecars0 = inventory(ctx.spark, sidecarDir).select(col("stem"))
      val sidecars = stripSuffix match {
        case Some(suf) => sidecars0.select(
          regexp_replace(col("stem"), java.util.regex.Pattern.quote(suf) + "$", "").as("stem"))
        case None => sidecars0
      }
      def sampleAgg(df: DataFrame) = df.agg(
        count(lit(1)).cast("long").as("n"),
        concat_ws(", ", slice(sort_array(collect_set("stem")), 1, 10)).as("sample")).head()
      val missing = sampleAgg(images.join(sidecars, Seq("stem"), "left_anti"))
      val orphans = sampleAgg(sidecars.join(images, Seq("stem"), "left_anti"))
      val errs = List(
        Option.when(missing.getAs[Long]("n") > 0)(
          s"${missing.getAs[Long]("n")} image(s) without a $sidecarLabel " +
            s"(e.g. ${missing.getAs[String]("sample")})"),
        Option.when(orphans.getAs[Long]("n") > 0)(
          s"${orphans.getAs[Long]("n")} $sidecarLabel file(s) without an image " +
            s"(e.g. ${orphans.getAs[String]("sample")})")).flatten
      ValidationResult(errs.isEmpty, errs)
    }
  }

  // ---------------------------------------------------------------- V10
  /** All images share one resolution == expected (or auto-detected from
    * the lexicographically-first file) — `image_validator.py:33-382`.
    * Dimensions come from ImageIO header reads inside a mapPartitions
    * over the binaryFile scan (no full decode, no driver copies).
    */
  final class ImageResolutionValidator(dir: String, expected: Option[(Int, Int)])
      extends Validator {
    val name = "image_resolution"
    def validate(ctx: ValidationContext): ValidationResult = {
      val spark = ctx.spark
      import spark.implicits._
      val files = spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true").load(dir)
        .select(element_at(split(col("path"), "/"), -1).as("name"), col("content"))
        .filter(!col("name").startsWith("."))
      val dims = files.as[(String, Array[Byte])].mapPartitions { it =>
        it.map { case (fname, bytes) =>
          ImageProbe.dimensions(bytes) match {
            case Some((w, h)) => (fname, w, h, null: String)
            case None => (fname, -1, -1, ImageProbe.diagnose(bytes))
          }
        }
      }.toDF("name", "w", "h", "error")
      // Corrupt-count aggregate FIRST, independent of the expected size:
      // with auto-detection an all-corrupt directory has no reference
      // image, and a crossJoin against an empty expected frame would
      // yield zero rows and a silently-green validator.
      val dimsC = dims.persist()
      try {
        val base = dimsC.agg(
          count(lit(1)).cast("long").as("n_files"),
          sum(when(col("error").isNotNull, 1).otherwise(0)).cast("long").as("n_corrupt"),
          concat_ws(",", sort_array(collect_set(
            when(col("error").isNull, concat_ws("x", col("w"), col("h")))))).as("resolutions"),
          first(concat_ws(": ", col("name"), col("error")), ignoreNulls = true).as("first_err")).head()
        val nFiles = base.getAs[Long]("n_files")
        val nCorrupt = base.getAs[Long]("n_corrupt")
        val expectedDf =
          expected.map(e => Seq(e).toDF("ew", "eh"))
            .getOrElse(dimsC.filter(col("error").isNull)
              .orderBy("name").limit(1).select(col("w").as("ew"), col("h").as("eh")))
        val nWrong =
          if (nCorrupt == nFiles) 0L // no readable reference; corrupt error carries it
          else graft.ops.ScalarFold.withScalars(dimsC, expectedDf)
            .agg(sum(when(col("error").isNull &&
              (col("w") =!= col("ew") || col("h") =!= col("eh")), 1).otherwise(0))
              .cast("long")).head().getLong(0)
        val errs = List(
          Option.when(nFiles == 0L)(s"image directory '$dir' is empty"),
          Option.when(nCorrupt > 0)(
            s"$nCorrupt unreadable image(s) (first: ${base.getAs[String]("first_err")})"),
          Option.when(nWrong > 0)(
            s"$nWrong image(s) with unexpected resolution " +
              s"(found: ${base.getAs[String]("resolutions")})")).flatten
        ValidationResult(errs.isEmpty, errs,
          metadata = Map("resolutions" -> base.getAs[String]("resolutions")))
      } finally dimsC.unpersist()
    }
  }

  // ---------------------------------------------------------------- V16
  /** BIO label lockstep: label = space-separated IOB2 tags, exactly one
    * per word of the paired `.txt` (`bio_label_validator.py:42-172`).
    * Manifest ↔ word-count join; error cap 50.
    */
  final class BioLabelValidator(textsDir: String, filenameColumn: String,
                                labelColumn: String, errorCap: Int = 50)
      extends Validator {
    val name = "bio_label"
    private val tagShape = "^(O|[BI]-[A-Za-z0-9_]+)$"
    def validate(ctx: ValidationContext): ValidationResult = {
      val df = ctx.manifest.getOrElse(return ValidationResult.ok)
      val spark = ctx.spark
      // F.tokenCount counts \S+ runs — blank lines are ZERO words (a
      // bare split would yield [""], inflating every file containing an
      // empty line and flagging correct label rows as mismatches).
      // input_file_name() returns a URI-ENCODED path: 'my file.txt'
      // arrives as '.../my%20file.txt', so the basename must be
      // percent-decoded before matching the manifest's literal
      // filename — otherwise every file with a space (or any
      // %-escapable char) is falsely reported "text file not found".
      // Percent-decoding ONLY (not url_decode, whose form-encoding
      // rules turn a literal '+' into a space — '+' is legal and
      // unencoded in path URIs).
      val percentDecode = udf((s: String) =>
        if (s == null) null
        else java.net.URLDecoder.decode(
          s.replace("+", "%2B"), java.nio.charset.StandardCharsets.UTF_8))
      val words = spark.read.textFile(s"$textsDir/*.txt")
        .withColumn("path", input_file_name())
        .withColumn("fname",
          percentDecode(element_at(split(col("path"), "/"), -1)))
        .groupBy("fname")
        .agg(sum(F.tokenCount(col("value"))).as("word_count"))
      val joined = df
        .withColumn("__fname",
          when(col(filenameColumn).rlike("\\.txt$"), col(filenameColumn))
            .otherwise(concat(col(filenameColumn), lit(".txt"))))
        .join(words, col("__fname") === words("fname"), "left")
      // Tag tokenization stays in lockstep with tagCount — the same
      // explicit [ \t\n\f\r] whitespace class (see TextHash.tokens), so
      // a tag containing \x0B can never count as one token but split
      // into two. Filter the empty fragments a leading tab leaves
      // behind, so a valid whitespace-separated label never fires
      // "malformed".
      val tags = filter(split(trim(col(labelColumn)), "[ \t\n\f\r]+"), t => t =!= "")
      val tagCount = F.tokenCount(col(labelColumn))
      val badTag = exists(tags, t => !t.rlike(tagShape))
      // NULL label = not-applicable (the reference skips unlabeled
      // rows), never a count mismatch.
      val countMismatch = col(labelColumn).isNotNull &&
        col("word_count").isNotNull && tagCount =!= col("word_count")
      val offenders = joined.select(
        col("__fname"),
        when(col("word_count").isNull, lit("text file not found"))
          .when(badTag, lit("malformed IOB2 tag"))
          .when(countMismatch, lit("tag count != word count")).as("problem"))
        .filter(col("problem").isNotNull)
      val rows = offenders.limit(errorCap + 1).collect()
      val errs = rows.take(errorCap).map(r => s"${r.getString(0)}: ${r.getString(1)}").toList
      val capped = if (rows.length > errorCap) List(s"... (capped at $errorCap errors)") else Nil
      ValidationResult(errs.isEmpty, errs ++ capped)
    }
  }

  // ---------------------------------------------------------------- V15
  /** tokenizer.json: exists (mandatory only for MLM), vocab ⊇ required
    * tokens (`tokenizer_validator.py:24-179`). Single small file —
    * driver-side JSON parse (json4s ships with Spark).
    */
  final class TokenizerValidator(path: Option[String], mandatory: Boolean,
                                 required: Set[String] = Set("[MASK]", "[PAD]"))
      extends Validator {
    val name = "tokenizer"
    def validate(ctx: ValidationContext): ValidationResult = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      path match {
        case None =>
          if (mandatory) ValidationResult.fail("tokenizer.json is required for this category")
          else ValidationResult.ok
        case Some(p) =>
          val fsPath = new Path(p)
          val fs = fsPath.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(fsPath))
            return if (mandatory) ValidationResult.fail(s"tokenizer.json not found at $p")
            else ValidationResult.warn(s"tokenizer.json not found at $p; skipping check")
          val text = {
            val in = fs.open(fsPath)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          }
          val json = try JsonMethods.parse(text) catch {
            case e: Exception => return ValidationResult.fail(s"tokenizer.json: invalid JSON: ${e.getMessage}")
          }
          val vocab: Set[String] = (json \ "model" \ "vocab") match {
            case JObject(fields) => fields.map(_._1).toSet
            case JArray(items) => // Unigram form: [[token, score], ...]
              items.collect { case JArray(JString(tok) :: _) => tok }.toSet
            case _ => Set.empty
          }
          val added: Set[String] = (json \ "added_tokens") match {
            case JArray(items) => items.collect {
              case obj: JObject => (obj \ "content") match {
                case JString(s) => s
                case _ => null
              }
            }.filter(_ != null).toSet
            case _ => Set.empty
          }
          val all = vocab ++ added
          val missing = required -- all
          if (all.isEmpty) ValidationResult.fail("tokenizer.json has no extractable vocab")
          else if (missing.nonEmpty)
            ValidationResult.fail(
              s"tokenizer vocab missing required token(s): ${missing.toList.sorted.mkString(", ")}")
          else ValidationResult.ok
      }
    }
  }
}
