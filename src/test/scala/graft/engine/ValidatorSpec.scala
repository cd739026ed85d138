package graft.engine

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.SparkSpec
import graft.core.{ResolvedConfig, TaskCategory}
import graft.engine.validate._

class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def baseCfg = ResolvedConfig(
    category = TaskCategory.TabularClassification, tableName = "t",
    intent = "train", dataFormat = "csv", sourcePath = "/x")

  private def ctx(cfg: ResolvedConfig,
                  df: Option[org.apache.spark.sql.DataFrame] = None) =
    ValidationContext(spark, cfg, df)

  test("V7 table name: shape, length, reserved keyword warning") {
    def res(t: String) =
      new Validators.TableNameValidator().validate(ctx(baseCfg.copy(tableName = t)))
    assert(!res("1bad").isValid)
    assert(!res("has space").isValid)
    assert(!res("x" * 65).isValid)
    assert(res("select").warnings.nonEmpty && res("select").isValid)
    assert(res("good_table_1") == ValidationResult.ok)
  }

  test("V8 duplicate destination: non-empty fails, empty warns") {
    val d = tmpDir("dest")
    val v = new Validators.DuplicateValidator()
    assert(v.validate(ctx(baseCfg.copy(destPath = Some(d.toString)))).warnings.nonEmpty)
    write(d.resolve("existing.txt"), "x")
    assert(!v.validate(ctx(baseCfg.copy(destPath = Some(d.toString)))).isValid)
    assert(v.validate(ctx(baseCfg.copy(destPath = Some(d.resolve("new").toString)))).isValid)
  }

  test("V2 numeric columns: non-numeric counted, nulls tolerated") {
    val df = Seq(("1.5", "x"), (null, "2"), ("oops", "3")).toDF("lag_1", "f2")
    val cfg = baseCfg.copy(category = TaskCategory.TimeSeriesForecasting,
      schema = Seq("lag_1" -> "FLOAT", "f2" -> "FLOAT"))
    val r = new Validators.NumericColumnsValidator().validate(ctx(cfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.exists(e => e.contains("lag_1") && e.contains("1 non-numeric")))
    assert(r.metadata("null_count.lag_1") == "1")
  }

  test("V3 time format: ambiguity guard catches 1/2/2024") {
    val df = Seq("2024-03-01 10:00:00", "1/2/2024", "13/1/2024").toDF("timestamp")
    val cfg = baseCfg.copy(schema = Seq("timestamp" -> "TIMESTAMP"))
    val r = new Validators.TimeFormatValidator().validate(ctx(cfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("locale-ambiguous")))
  }

  test("V4 time ordered: out-of-order adjacent pairs counted in file order") {
    val df = Seq("2024-01-01 00:00:00", "2024-01-03 00:00:00", "2024-01-02 00:00:00")
      .toDF("timestamp")
    val cfg = baseCfg.copy(schema = Seq("timestamp" -> "TIMESTAMP"))
    val r = new Validators.TimeOrderedValidator().validate(ctx(cfg, Some(df)))
    assert(!r.isValid && r.errors.head.contains("1 adjacent"))
    val sorted = Seq("2024-01-01", "2024-01-02", "2024-01-02").toDF("timestamp")
    assert(new Validators.TimeOrderedValidator().validate(ctx(cfg, Some(sorted))).isValid)
  }

  test("V5 before today: future timestamps fail; earliest/latest reported") {
    val df = Seq("2020-01-01 00:00:00", "2999-01-01 00:00:00").toDF("timestamp")
    val r = new Validators.TimeBeforeTodayValidator().validate(ctx(baseCfg, Some(df)))
    assert(!r.isValid)
    assert(r.metadata("earliest").startsWith("2020"))
  }

  test("V6 time-to-event: negative + non-numeric counted, stats emitted") {
    val df = Seq("1.5", "-2", "x", "10").toDF("time")
    val cfg = baseCfg.copy(category = TaskCategory.TimeToEventPrediction)
    val r = new Validators.TimeToEventValidator().validate(ctx(cfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("non-numeric")))
    assert(r.errors.exists(_.contains("negative")))
    assert(r.metadata.contains("time.min"))
  }

  test("V13 keypoints: bad JSON, wrong count, degenerate bbox, drift") {
    val good = """{"nose": [10, 20], "ear": [30, 40]}"""
    val degenerate = """{"nose": [10, 20], "ear": [10, 40]}""" // zero x-range
    val wrongKeys = """{"nose": [10, 20], "tail": [30, 40]}"""
    val df = Seq(good, degenerate, wrongKeys, "not json").toDF("Annotation")
    val cfg = baseCfg.copy(category = TaskCategory.KeypointDetection,
      annotationColumn = Some("Annotation"),
      fileOptions = Map("number_of_keypoints" -> 2))
    val r = new Validators.KeypointAnnotationValidator().validate(ctx(cfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("invalid Annotation JSON")))
    assert(r.errors.exists(_.contains("degenerate")))
    assert(r.errors.exists(_.contains("differ from the first record")))
  }

  test("V14 visibility: values outside {0,1} and key drift counted") {
    val df = Seq(
      ("""{"a": [1, 2], "b": [3, 4]}""", """{"a": 1, "b": 0}"""),
      ("""{"a": [1, 2], "b": [3, 4]}""", """{"a": 2, "b": 0}"""),
      ("""{"a": [1, 2], "b": [3, 4]}""", """{"a": 1, "c": 0}"""))
      .toDF("Annotation", "Visibility")
    val cfg = baseCfg.copy(annotationColumn = Some("Annotation"))
    val r = new Validators.KeypointVisibilityValidator().validate(ctx(cfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("outside {0,1}")))
    assert(r.errors.exists(_.contains("keys differ")))
  }

  test("V9 file type: mixed extensions rejected") {
    val d = tmpDir("files")
    write(d.resolve("a.jpg"), "x")
    write(d.resolve("b.png"), "x")
    write(d.resolve(".hidden"), "x") // ignored
    val v = new FileValidators.FileTypeValidator(d.toString, Set("jpg"), "images")
    val r = v.validate(ctx(baseCfg))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("mix extensions")))
  }

  test("V12 pairing: missing + orphans via anti-joins, suffix strip") {
    val imgs = tmpDir("imgs")
    val masks = tmpDir("masks")
    write(imgs.resolve("a.jpg"), "x")
    write(imgs.resolve("b.jpg"), "x")
    write(masks.resolve("a_mask.png"), "x")
    write(masks.resolve("c_mask.png"), "x")
    val v = new FileValidators.FilePairingValidator(
      imgs.toString, masks.toString, "mask", stripSuffix = Some("_mask"))
    val r = v.validate(ctx(baseCfg))
    assert(!r.isValid)
    assert(r.errors.exists(e => e.contains("1 image(s) without") && e.contains("b")))
    assert(r.errors.exists(e => e.contains("1 mask file(s) without") && e.contains("c")))
  }

  test("V10 image resolution: mismatch + corrupt diagnosed via ImageIO") {
    val d = tmpDir("pix")
    def png(p: java.nio.file.Path, w: Int, h: Int): Unit =
      ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB), "png", p.toFile)
    png(d.resolve("a.png"), 64, 64)
    png(d.resolve("b.png"), 64, 64)
    png(d.resolve("c.png"), 32, 32)
    write(d.resolve("broken.png"), "this is not a png")
    val v = new FileValidators.ImageResolutionValidator(d.toString, Some((64, 64)))
    val r = v.validate(ctx(baseCfg))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("1 unreadable")))
    assert(r.errors.exists(_.contains("1 image(s) with unexpected resolution")))
    // auto-detect from first file: a.png (64x64) becomes the standard
    val auto = new FileValidators.ImageResolutionValidator(d.toString, None)
      .validate(ctx(baseCfg))
    assert(auto.errors.exists(_.contains("unexpected resolution")))
  }

  test("V11 VOC XML: structural + geometry checks") {
    val ok =
      """<annotation><folder>f</folder><filename>a.jpg</filename>
        |<source><database>d</database></source>
        |<size><width>100</width><height>100</height><depth>3</depth></size>
        |<segmented>0</segmented>
        |<object><name>car</name><pose>Left</pose><truncated>0</truncated>
        |<difficult>0</difficult>
        |<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>50</ymax></bndbox>
        |</object></annotation>""".stripMargin
    assert(XmlValidators.checkVocXml("ok.xml", ok).errors.isEmpty)
    val badBox = ok.replace("<xmax>50</xmax>", "<xmax>5</xmax>")
    assert(XmlValidators.checkVocXml("bad.xml", badBox)
      .errors.exists(_.contains("xmin")))
    val wrongRoot = "<notvoc></notvoc>"
    assert(XmlValidators.checkVocXml("r.xml", wrongRoot)
      .errors.exists(_.contains("root element")))
    val tinyBox = ok.replace("<xmax>50</xmax>", "<xmax>12</xmax>")
      .replace("<ymax>50</ymax>", "<ymax>12</ymax>")
    assert(XmlValidators.checkVocXml("t.xml", tinyBox)
      .warnings.exists(_.contains("small box")))
  }

  test("V11 VOC XML over a directory via Spark") {
    val d = tmpDir("voc")
    write(d.resolve("good.xml"),
      """<annotation><folder>f</folder><filename>a.jpg</filename>
        |<source/><size><width>10</width><height>10</height><depth>3</depth></size>
        |<segmented>0</segmented></annotation>""".stripMargin)
    write(d.resolve("bad.xml"), "<oops>")
    val v = new XmlValidators.PascalVocXmlValidator(d.toString)
    val r = v.validate(ctx(baseCfg))
    assert(!r.isValid)
    assert(r.errors.exists(e => e.contains("bad.xml") && e.contains("not parseable")))
  }

  test("V16 BIO labels: tag/word lockstep via join") {
    val texts = tmpDir("texts")
    // d1 carries a BLANK line — it must count zero words, not one
    // (split(trim(""), "\s+") yields [""], size 1).
    write(texts.resolve("d1.txt"), "John lives in Berlin\n\n")
    write(texts.resolve("d2.txt"), "hello world")
    val df = Seq(
      ("d1", "B-PER O O B-LOC"), // 4 tags, 4 words (+ blank line) → ok
      ("d2", "O O O"), //            3 tags, 2 words → mismatch
      ("d3", "O O")) //              file missing
      .toDF("filename", "label")
    val v = new FileValidators.BioLabelValidator(texts.toString, "filename", "label")
    val r = v.validate(ctx(baseCfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.exists(e => e.contains("d2") && e.contains("tag count")))
    assert(r.errors.exists(e => e.contains("d3") && e.contains("not found")))
    assert(!r.errors.exists(_.contains("d1"))) // blank line ≠ a word
    val badTag = Seq(("d1", "B-PER O X-LOC O")).toDF("filename", "label")
    val r2 = v.validate(ctx(baseCfg, Some(badTag)))
    assert(r2.errors.exists(_.contains("malformed IOB2")))
  }

  test("V15 tokenizer: vocab extraction + required tokens") {
    val d = tmpDir("tok")
    val p = write(d.resolve("tokenizer.json"),
      """{"model": {"vocab": {"[MASK]": 1, "[PAD]": 2, "hello": 3}},
        |"added_tokens": [{"content": "[CLS]"}]}""".stripMargin)
    val v = new FileValidators.TokenizerValidator(Some(p.toString), mandatory = true)
    assert(v.validate(ctx(baseCfg)).isValid)
    val missing = write(d.resolve("t2.json"), """{"model": {"vocab": {"a": 1}}}""")
    val r = new FileValidators.TokenizerValidator(Some(missing.toString), mandatory = true)
      .validate(ctx(baseCfg))
    assert(r.errors.exists(e => e.contains("[MASK]") && e.contains("[PAD]")))
    val absent = new FileValidators.TokenizerValidator(
      Some(d.resolve("nope.json").toString), mandatory = false).validate(ctx(baseCfg))
    assert(absent.isValid && absent.warnings.nonEmpty)
  }

  test("battery composition: errors accumulate across validators") {
    val cfg = baseCfg.copy(tableName = "1bad",
      schema = Seq("f" -> "NOT_A_TYPE"))
    val df = Seq("x").toDF("f")
    val r = ValidatorMapping.runAll(
      ValidatorMapping.forConfig(cfg), ctx(cfg, Some(df)))
    assert(!r.isValid)
    assert(r.errors.size >= 2) // table name AND schema type both reported
  }
}

class ReviewRegressionSpec extends SparkSpec {
  import spark.implicits._
  import graft.core.{ResolvedConfig, TaskCategory}

  test("all-corrupt image directory fails validation (not silently green)") {
    val d = tmpDir("corrupt")
    write(d.resolve("a.png"), "not a png at all")
    write(d.resolve("b.png"), "also junk")
    val v = new FileValidators.ImageResolutionValidator(d.toString, None)
    val r = v.validate(ValidationContext(spark,
      ResolvedConfig(TaskCategory.ImageClassification, "t", "train", "csv", "/x"), None))
    assert(!r.isValid)
    assert(r.errors.exists(_.contains("2 unreadable")))
  }

  test("non-tabular CSV categories still fail on junk typed values") {
    val cfg = ResolvedConfig(TaskCategory.ImageClassification, "t", "train",
      "csv", "/x", images = Some("/tmp"),
      schema = Seq("confidence" -> "FLOAT"))
    val validators = ValidatorMapping.forConfig(cfg)
    assert(validators.exists(_.isInstanceOf[Validators.DataValidator]))
    val df = Seq("abc").toDF("confidence")
    val r = ValidatorMapping.runAll(
      Seq(new Validators.DataValidator),
      ValidationContext(spark, cfg, Some(df)))
    assert(!r.isValid && r.errors.exists(_.contains("confidence")))
  }

  test("JSON categories keep the skip disposition (no fail-fast DataValidator)") {
    val cfg = ResolvedConfig(TaskCategory.MaskedLanguageModeling, "t", "train",
      "json", "/x", sequences = Some("/tmp"),
      schema = Seq("f" -> "FLOAT"))
    assert(!ValidatorMapping.forConfig(cfg).exists(_.isInstanceOf[Validators.DataValidator]))
  }

  test("lock release after stale takeover does not clobber the new holder") {
    val dir = java.nio.file.Files.createTempDirectory("locks2").toString
    var clock = 1000L
    val a = new TableLock(dir, "t2", staleAfterMs = 5000, now = () => clock)
    val b = new TableLock(dir, "t2", staleAfterMs = 5000, now = () => clock)
    assert(a.acquire("a").isRight)
    clock += 6000
    assert(b.acquire("b").isRight) // stale takeover
    a.release() // must NOT delete b's lock
    val c = new TableLock(dir, "t2", staleAfterMs = 5000, now = () => clock)
    assert(c.acquire("c").isLeft) // b still holds it
    b.release()
    assert(c.acquire("c").isRight)
  }
}
