package graft.engine

import java.sql.DriverManager

import graft.SparkSpec
import graft.core.{LabelPolicy, ResolvedConfig, TaskCategory}
import graft.engine.api.LocalApiClient
import graft.engine.sink.JdbcUpsert

/** Golden end-to-end runs per modality over generated sample data —
  * the Spark-side mirror of the reference's `e2e/test_ingest_e2e.py`:
  * run the real engine end-to-end (lock → validate → scan → transform →
  * upsert into embedded Derby → API mock → registration) and assert
  * exit 0 + rows landed + counter accounting.
  */
/** Serializable executor-side client whose batch sends always fail —
  * exercises the fail-loud abort path of the distributed send.
  */
class FailingBatchApiClient extends graft.engine.api.ApiClient {
  import graft.engine.api.MetaRecord
  def sendBatch(table: String, batch: Seq[MetaRecord]): Either[String, Int] =
    Left("backend rejected the batch")
  def sendGenerateEdgeLabelMeta(table: String): Either[String, Unit] = Right(())
  def sendGlobalMeta(table: String, schemaJson: String): Either[String, Unit] = Right(())
  def prepareDataset(table: String): Either[String, Unit] = Right(())
  def createDataset(table: String): Either[String, Unit] = Right(())
}

class IngestorE2ESpec extends SparkSpec {

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  test("tabular_classification: CSV → validated → typed → upserted → registered") {
    val dir = tmpDir("e2e_tab")
    val csv = write(dir.resolve("labels.csv"),
      """feature_00,feature_01,feature_02,target,row_id
        |1.5,2.5,3.5,cat,r1
        |4.5,NA,6.5,dog,r2
        |7.5,8.5,,cat,r3
        |""".stripMargin)
    val cfg = ResolvedConfig(
      category = TaskCategory.TabularClassification,
      tableName = "tab_e2e", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      schema = Seq("feature_00" -> "FLOAT", "feature_01" -> "FLOAT",
        "feature_02" -> "FLOAT", "target" -> "VARCHAR(50)",
        "row_id" -> "VARCHAR(50)"),
      labelColumn = Some("target"),
      uniqueIdColumn = Some("row_id"))
    val api = new LocalApiClient
    val jdbc = JdbcUpsert.Config(derbyUrl("e2e1"), "tab_e2e",
      JdbcUpsert.GenericDialect)
    val result = new Ingestor(spark, cfg, api, Some(jdbc),
      lockDir = tmpDir("locks").toString).ingest("run-e2e-1")

    assert(result.errors.isEmpty, result.errors.mkString("; "))
    assert(result.exitCode == 0)
    assert(result.summary.totalRecords.value == 3)
    assert(result.summary.inserted.value == 3)
    assert(result.summary.apiSent.value == 3)
    assert(!result.summary.hasFailures)

    val conn = DriverManager.getConnection(derbyUrl("e2e1"))
    val rs = conn.createStatement().executeQuery(
      """SELECT "data_id", "label", "feature_01" FROM "tab_e2e" ORDER BY "data_id"""")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getString(1), r.getString(2),
        Option(r.getObject(3)).map(_.toString))).toList
    conn.close()
    assert(rows.map(_._1) == List("r1", "r2", "r3"))
    assert(rows.map(_._2) == List("cat", "dog", "cat"))
    assert(rows(1)._3.isEmpty) // "NA" null-normalized before typing
    // Registration sequence ran in order, fail-loud contract intact
    assert(api.calls.toArray.map(String.valueOf(_)).toList == List(
      "edge_label_meta:tab_e2e", "global_meta:tab_e2e",
      "prepare:tab_e2e", "create:tab_e2e"))
  }

  test("validation failure: junk typed column stops the run with exit 2") {
    val dir = tmpDir("e2e_bad")
    val csv = write(dir.resolve("labels.csv"),
      "f0,target,rid\nnot_a_number,cat,r1\n2.5,dog,r2\n")
    val cfg = ResolvedConfig(
      category = TaskCategory.TabularClassification,
      tableName = "tab_bad", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      schema = Seq("f0" -> "FLOAT", "target" -> "VARCHAR(10)", "rid" -> "VARCHAR(10)"),
      labelColumn = Some("target"), uniqueIdColumn = Some("rid"))
    val result = new Ingestor(spark, cfg, new LocalApiClient, None,
      lockDir = tmpDir("locks").toString).ingest("run-bad")
    assert(result.exitCode == 2)
    assert(result.errors.exists(e => e.contains("f0") && e.contains("not valid")))
  }

  test("JSON disposition: bad record skipped with counter, not fatal") {
    val dir = tmpDir("e2e_json")
    val json = write(dir.resolve("data.json"),
      """[{"f0": "1.5", "target": "a", "rid": "r1"},
        | {"f0": "junk", "target": "b", "rid": "r2"},
        | {"f0": "3.5", "target": "c", "rid": "r3"}]""".stripMargin)
    val cfg = ResolvedConfig(
      category = TaskCategory.MaskedLanguageModeling, // json-format category
      tableName = "json_e2e", intent = "train", dataFormat = "json",
      sourcePath = json.toString,
      schema = Seq("f0" -> "FLOAT", "target" -> "VARCHAR(10)", "rid" -> "VARCHAR(10)"),
      labelColumn = Some("target"), uniqueIdColumn = Some("rid"),
      // MLM normally wants sequences+tokenizer; keep this test focused
      // on the skip disposition by giving it a sequences dir + tokenizer.
      sequences = Some(dir.toString),
      fileOptions = Map("tokenizer_path" -> write(dir.resolve("tokenizer.json"),
        """{"model": {"vocab": {"[MASK]": 1, "[PAD]": 2}}}""").toString))
    val result = new Ingestor(spark, cfg, new LocalApiClient, None,
      lockDir = tmpDir("locks").toString).ingest("run-json")
    assert(result.errors.isEmpty, result.errors.mkString("; "))
    assert(result.summary.totalRecords.value == 3)
    assert(result.summary.skipped.value == 1) // the junk record
    assert(result.summary.inserted.value == 2)
  }

  test("failed-upsert rows are excluded from API metadata (committed-rows invariant)") {
    val dir = tmpDir("e2e_inv")
    val csv = write(dir.resolve("labels.csv"),
      "v,target,rid\nok,cat,r1\ntoolong,dog,r2\nxy,cat,r3\n")
    // Pre-create the Derby table with a NARROWER column than the
    // declared schema: drift-check compares names only, so r2's 7-char
    // value passes validation (VARCHAR(50)) but fails the DB write
    // (VARCHAR(2)) — landing in the failed-db channel.
    val url = derbyUrl("e2einv")
    val conn0 = DriverManager.getConnection(url)
    conn0.createStatement().executeUpdate(
      JdbcUpsert.GenericDialect.createTableSql("tab_inv",
        Seq("v" -> graft.core.SqlType.Varchar(2))))
    conn0.close()
    val cfg = ResolvedConfig(
      category = TaskCategory.TabularClassification,
      tableName = "tab_inv", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      schema = Seq("v" -> "VARCHAR(50)", "target" -> "VARCHAR(10)",
        "rid" -> "VARCHAR(10)"),
      labelColumn = Some("target"), uniqueIdColumn = Some("rid"))
    val api = new LocalApiClient
    val jdbc = JdbcUpsert.Config(url, "tab_inv", JdbcUpsert.GenericDialect)
    val result = new Ingestor(spark, cfg, api, Some(jdbc),
      lockDir = tmpDir("locks").toString).ingest("run-inv")

    assert(result.errors.isEmpty, result.errors.mkString("; "))
    assert(result.exitCode == 1) // failures present, run not aborted
    assert(result.summary.failedDb.value == 1)
    assert(result.summary.inserted.value == 2)
    assert(result.summary.apiSent.value == 2)
    val sentIds = {
      val b = scala.collection.mutable.Set[String]()
      api.batches.forEach { case (_, recs) => recs.foreach(b += _.dataId) }
      b.toSet
    }
    assert(sentIds == Set("r1", "r3")) // r2 failed the upsert → never registered
  }

  test("API batch-send failure aborts the run fail-loud with exit 2") {
    val dir = tmpDir("e2e_apifail")
    val csv = write(dir.resolve("labels.csv"),
      "f0,target,rid\n1.0,a,r1\n2.0,b,r2\n")
    val cfg = ResolvedConfig(
      category = TaskCategory.TabularClassification,
      tableName = "tab_apifail", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      schema = Seq("f0" -> "FLOAT", "target" -> "VARCHAR(10)", "rid" -> "VARCHAR(10)"),
      labelColumn = Some("target"), uniqueIdColumn = Some("rid"))
    val result = new Ingestor(spark, cfg, new FailingBatchApiClient, None,
      lockDir = tmpDir("locks").toString).ingest("run-apifail")
    assert(result.exitCode == 2)
    assert(result.errors.exists(_.contains("API batch send failed")))
    assert(result.errors.exists(_.contains("backend rejected the batch")))
  }

  test("table lock blocks concurrent ingest into the same table") {
    val locks = tmpDir("locks").toString
    val lock = new TableLock(locks, "contended")
    assert(lock.acquire("other-run").isRight)
    val dir = tmpDir("e2e_lock")
    val csv = write(dir.resolve("l.csv"), "f0,target,rid\n1.0,a,r1\n")
    val cfg = ResolvedConfig(
      category = TaskCategory.TabularClassification,
      tableName = "contended", intent = "train", dataFormat = "csv",
      sourcePath = csv.toString,
      schema = Seq("f0" -> "FLOAT", "target" -> "VARCHAR(10)", "rid" -> "VARCHAR(10)"),
      labelColumn = Some("target"), uniqueIdColumn = Some("rid"))
    val result = new Ingestor(spark, cfg, new LocalApiClient, None,
      lockDir = locks).ingest("run-locked")
    assert(result.errors.exists(_.contains("locked")))
    lock.release()
  }
}
