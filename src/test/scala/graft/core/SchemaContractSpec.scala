package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The ingest.v1 config contract's rejection paths, mirroring the
  * reference's schema acceptance suite (`tests/test_schema_validation
  * .py`, 343 LoC): every case that suite locks against
  * `schema/ingest.v1.json` must be rejected here by the resolver, with
  * a JSON-pointer-prefixed error naming the offending field.
  */
class SchemaContractSpec extends AnyFunSuite {

  private def resolve(y: String) = YamlConfig.parse(y).flatMap(Conventions.resolve)
  private def errsOf(y: String): List[String] = resolve(y).left.getOrElse(Nil)

  private val imageBase =
    """category: image_classification
      |table: t
      |intent: train
      |csv: /data/labels.csv
      |images: /data/images
      |label: image_label
      |""".stripMargin

  test("known-good image config validates") {
    assert(resolve(imageBase).isRight)
  }

  test("unknown top-level field (typo) rejected with pointer") {
    val errs = errsOf(imageBase + "lable: image_label\n")
    assert(errs.exists(_.startsWith("/lable: unknown field")))
  }

  test("invalid category names the valid options in the message") {
    val errs = errsOf(imageBase.replace("image_classification", "image_klassification"))
    assert(errs.exists(e => e.startsWith("/category") && e.contains("image_classification")))
  }

  test("missing table / intent rejected") {
    assert(errsOf(imageBase.replace("table: t\n", "")).exists(_.startsWith("/table")))
    assert(errsOf(imageBase.replace("intent: train\n", "")).exists(_.startsWith("/intent")))
  }

  test("neither csv nor json / both rejected") {
    assert(errsOf(imageBase.replace("csv: /data/labels.csv\n", ""))
      .exists(e => e.startsWith("/csv") && e.contains("required")))
    assert(errsOf(imageBase + "json: /data/labels.json\n")
      .exists(_.contains("exactly one")))
  }

  test("image category without images rejected") {
    assert(errsOf(imageBase.replace("images: /data/images\n", ""))
      .exists(_.startsWith("/images")))
  }

  test("object_detection without annotations rejected") {
    val y = imageBase.replace("image_classification", "object_detection")
    assert(errsOf(y).exists(_.startsWith("/annotations")))
    assert(resolve(y + "annotations: /data/ann\n").isRight)
  }

  test("semantic_segmentation without masks rejected") {
    val y = imageBase.replace("image_classification", "semantic_segmentation")
    assert(errsOf(y).exists(_.startsWith("/masks")))
  }

  test("text categories without texts rejected; token_classification also needs label") {
    val tc =
      """category: text_classification
        |table: t
        |intent: train
        |csv: /l.csv
        |label: y
        |""".stripMargin
    assert(errsOf(tc).exists(_.startsWith("/texts")))
    val tok = tc.replace("text_classification", "token_classification")
      .replace("label: y\n", "")
    val errs = errsOf(tok)
    assert(errs.exists(_.startsWith("/texts")))
    assert(errs.exists(_.startsWith("/label")))
  }

  test("tabular without schema rejected") {
    val y =
      """category: tabular_classification
        |table: t
        |intent: train
        |csv: /l.csv
        |label: y
        |""".stripMargin
    assert(errsOf(y).exists(_.startsWith("/schema")))
  }

  test("self-supervised category with label rejected, without label accepted") {
    val mlm =
      """category: masked_language_modeling
        |table: t
        |intent: train
        |json: /data/seqs.json
        |sequences: /data/seqs
        |""".stripMargin
    assert(resolve(mlm).isRight)
    assert(errsOf(mlm + "label: some_column\n")
      .exists(e => e.startsWith("/label") && e.contains("self-supervised")))
    // MLM is file-bearing: its sequences sidecar is required like
    // images/texts are for their categories.
    assert(errsOf(mlm.replace("sequences: /data/seqs\n", ""))
      .exists(_.startsWith("/sequences")))
    assert(errsOf(imageBase + "spec: just_a_string\n").exists(_.startsWith("/spec")))
  }

  test("regression-class shorthand string label rejected; explicit bucket accepted") {
    val base =
      """category: tabular_regression
        |table: t
        |intent: train
        |csv: /l.csv
        |schema:
        |  target: FLOAT
        |""".stripMargin
    assert(errsOf(base + "label: target\n").exists(_.startsWith("/label/policy")))
    assert(errsOf(base + "label:\n  column: target\n").exists(_.startsWith("/label/policy")))
    assert(resolve(base + "label:\n  column: target\n  policy: bucket\n").isRight)
  }

  test("data_id strategy coherence: column without strategy is an error, not silently dropped") {
    assert(errsOf(imageBase + "data_id:\n  column: filename\n")
      .exists(_.startsWith("/data_id/strategy")))
    assert(errsOf(imageBase + "data_id:\n  strategy: column\n")
      .exists(_.startsWith("/data_id/column")))
    assert(resolve(imageBase + "data_id:\n  strategy: uuid\n").isRight)
    assert(errsOf(imageBase + "data_id:\n  strategy: nope\n")
      .exists(_.startsWith("/data_id/strategy")))
  }

  test("processor entries require script and class, pointer names the index") {
    val errs = errsOf(imageBase +
      "spec:\n  processors:\n    - script: /custom/x.scala\n")
    assert(errs.exists(_.startsWith("/spec/processors/0/class")))
  }

  test("apiVersion and kind locked to v1 vocabulary") {
    assert(errsOf(imageBase + "apiVersion: graft/v2\n").exists(_.startsWith("/apiVersion")))
    assert(errsOf(imageBase + "kind: Ingest\n").exists(_.startsWith("/kind")))
    assert(resolve(imageBase + "apiVersion: graft/v1\nkind: IngestConfig\n").isRight)
  }

  test("non-integer batch_size / number_of_keypoints rejected with pointer") {
    assert(errsOf(imageBase + "batch_size: lots\n").exists(_.startsWith("/batch_size")))
    assert(errsOf(imageBase + "number_of_keypoints: many\n")
      .exists(_.startsWith("/number_of_keypoints")))
  }

  test("errors accumulate across fields and sort by pointer") {
    val errs = errsOf("category: nope\nintent: maybe\nlable: x\n")
    assert(errs.size >= 4) // category, intent, lable, table, csv
    assert(errs == errs.sorted)
  }
}
