package graft.engine

import java.sql.DriverManager

import graft.SparkSpec
import graft.core.SqlType
import graft.engine.sink.{FileCopySink, JdbcUpsert}

/** Embedded-Derby integration tests for the JDBC upsert sink — the real
  * foreachPartition path with batches, conflicts, per-row fallback and
  * drift detection.
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def cfg(db: String, table: String = "t1", batch: Int = 2) =
    JdbcUpsert.Config(derbyUrl(db), table, JdbcUpsert.GenericDialect, batchSize = batch)

  private def features = Seq("f1" -> SqlType.DoubleT, "f2" -> SqlType.Varchar(5))

  private def frame(rows: Seq[(String, Double, String)]) =
    rows.toDF("data_id", "f1", "f2")

  test("create table, upsert batch, re-upsert updates not duplicates") {
    val c = cfg("db1")
    assert(JdbcUpsert.ensureTable(c, features).isRight)
    val up = sc.longAccumulator; val fail = sc.longAccumulator
    JdbcUpsert.write(frame(Seq(("a", 1.0, "x"), ("b", 2.0, "y"), ("c", 3.0, "z"))),
      c, up, fail)
    assert(up.value == 3 && fail.value == 0)
    // Second pass: same keys, new values → updates (count stays 3)
    val up2 = sc.longAccumulator; val fail2 = sc.longAccumulator
    JdbcUpsert.write(frame(Seq(("a", 10.0, "x2"), ("b", 20.0, "y2"))), c, up2, fail2)
    assert(up2.value == 2 && fail2.value == 0)
    val conn = DriverManager.getConnection(derbyUrl("db1"))
    val rs = conn.createStatement().executeQuery(
      """SELECT "data_id", "f1" FROM "t1" ORDER BY "data_id"""")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getString(1), r.getDouble(2))).toList
    conn.close()
    assert(rows == List(("a", 10.0), ("b", 20.0), ("c", 3.0)))
  }

  test("per-row fallback isolates the offending record and reports its key") {
    val c = cfg("db2")
    assert(JdbcUpsert.ensureTable(c, features).isRight)
    val up = sc.longAccumulator; val fail = sc.longAccumulator
    val failedKeys = sc.collectionAccumulator[String]("failed_keys")
    // "toolong" exceeds VARCHAR(5) → that row alone must fail
    JdbcUpsert.write(frame(Seq(("a", 1.0, "ok"), ("b", 2.0, "toolong"), ("c", 3.0, "ok"))),
      c, up, fail, Some(failedKeys))
    assert(up.value == 2, s"expected 2 upserted, got ${up.value}")
    assert(fail.value == 1, s"expected 1 failed, got ${fail.value}")
    // The caller uses these keys to keep failed rows OUT of backend
    // metadata registration.
    assert(failedKeys.value.size == 1 && failedKeys.value.get(0) == "b")
  }

  test("systemic failure: key collection capped per partition, count uncapped") {
    val c = cfg("dbcap")
    assert(JdbcUpsert.ensureTable(c, features).isRight)
    val up = sc.longAccumulator; val fail = sc.longAccumulator
    val failedKeys = sc.collectionAccumulator[String]("failed_keys_cap")
    // EVERY row violates VARCHAR(5) — the outage shape: without the cap
    // the accumulator would haul every key to the driver.
    val rows = (0 until 50).map(i => (f"k$i%03d", i.toDouble, "toolong!"))
    JdbcUpsert.write(frame(rows).repartition(2), c, up, fail,
      Some(failedKeys), maxFailedKeysPerPartition = 3)
    assert(fail.value == 50, s"full failure magnitude, got ${fail.value}")
    // ≤ cap × partitions keys collected; the report is a sample.
    assert(failedKeys.value.size <= 6,
      s"expected ≤ 6 collected keys, got ${failedKeys.value.size}")
    assert(failedKeys.value.size > 0)
  }

  test("non-duplicate integrity violation routes to failed, not phantom-upserted") {
    // A CHECK constraint violation raises the same
    // SQLIntegrityConstraintViolationException as a duplicate key; the
    // fallback UPDATE matches nothing (the row was never inserted) and
    // must count the row FAILED — counting it upserted would register
    // API metadata for a row absent from the table.
    val c = cfg("db_check")
    assert(JdbcUpsert.ensureTable(c, features).isRight)
    val conn = DriverManager.getConnection(derbyUrl("db_check"))
    conn.createStatement().executeUpdate(
      """ALTER TABLE "t1" ADD CONSTRAINT pos CHECK ("f1" > 0)""")
    conn.close()
    val up = sc.longAccumulator; val fail = sc.longAccumulator
    val failedKeys = sc.collectionAccumulator[String]("failed_keys_chk")
    JdbcUpsert.write(frame(Seq(("a", 1.0, "ok"), ("bad", -5.0, "ok"))),
      c, up, fail, Some(failedKeys))
    assert(up.value == 1, s"expected 1 upserted, got ${up.value}")
    assert(fail.value == 1, s"expected 1 failed, got ${fail.value}")
    assert(failedKeys.value.size == 1 && failedKeys.value.get(0) == "bad")
  }

  test("writeTracked fails loud when the key column is absent") {
    // A NULL failed_key would never match the caller's left_anti
    // condition — failed rows would silently reach API registration.
    val ex = intercept[IllegalArgumentException] {
      JdbcUpsert.writeTracked(Seq(("a", 1.0)).toDF("not_the_key", "f1"),
        cfg("dbnokey"))
    }
    assert(ex.getMessage.contains("data_id"))
  }

  test("schema drift against an existing table is an actionable error") {
    val c = cfg("db3")
    assert(JdbcUpsert.ensureTable(c, features).isRight)
    val drift = JdbcUpsert.ensureTable(c, Seq("f1" -> SqlType.DoubleT,
      "f9" -> SqlType.IntT))
    assert(drift.left.exists(_.head.contains("f9")))
  }

  test("standard-column guards run before DDL") {
    val c = cfg("db4")
    val r = JdbcUpsert.ensureTable(c, Seq("label" -> SqlType.IntT))
    assert(r.left.exists(_.head.contains("collides")))
  }

  test("database bootstrap: URL split, MySQL CREATE DATABASE, embedded no-op") {
    import JdbcUpsert._
    assert(splitDbUrl("jdbc:mysql://h:3306/mydb") ==
      Some(("jdbc:mysql://h:3306", "mydb")))
    assert(splitDbUrl("jdbc:mysql://h:3306/mydb?useSSL=false&x=1") ==
      Some(("jdbc:mysql://h:3306?useSSL=false&x=1", "mydb")))
    assert(splitDbUrl("jdbc:mariadb://h/db2;opt=v") ==
      Some(("jdbc:mariadb://h;opt=v", "db2")))
    // no database path / embedded engines → None
    assert(splitDbUrl("jdbc:mysql://h:3306").isEmpty)
    assert(splitDbUrl("jdbc:derby:/tmp/db;create=true").isEmpty)
    assert(splitDbUrl("jdbc:derby:memory:x;create=true").isEmpty)
    assert(MySqlDialect.createDatabaseSql("my`db") ==
      Some("CREATE DATABASE IF NOT EXISTS `my``db`"))
    assert(GenericDialect.createDatabaseSql("d").isEmpty)
    // embedded Derby: ensureDatabase is Right(()) and ensureTable still
    // bootstraps a FRESH catalog end-to-end via the URL attribute
    val fresh = tmpDir("derbyboot").resolve("cat").toString
    val cfg = JdbcUpsert.Config(s"jdbc:derby:$fresh;create=true", "boot_t",
      JdbcUpsert.GenericDialect)
    assert(JdbcUpsert.ensureDatabase(cfg) == Right(()))
    val schema = graft.core.SqlType.parseSchema(
      Seq("v" -> "VARCHAR(10)")).getOrElse(fail("schema parse"))
    assert(JdbcUpsert.ensureTable(cfg, schema).isRight)
    // a MySQL-shaped URL with no server listening fails LOUD, not
    // silently green (the bootstrap is part of the contract)
    val bad = JdbcUpsert.Config(
      "jdbc:mysql://127.0.0.1:1/nosuchdb", "t", JdbcUpsert.MySqlDialect)
    JdbcUpsert.ensureDatabase(bad) match {
      case Left(errs) => assert(errs.exists(_.contains("nosuchdb")))
      case Right(_) => fail("expected bootstrap failure")
    }
  }

  test("MySQL dialect renders ON DUPLICATE KEY with backtick escaping") {
    val stmt = JdbcUpsert.MySqlDialect.upsert("tbl",
      Seq("data_id", "UniProt|gene", "created_at"), "data_id").get
    assert(stmt.sql.contains("`UniProt|gene`"))
    assert(stmt.sql.contains("ON DUPLICATE KEY UPDATE"))
    assert(!stmt.sql.contains("`created_at` = VALUES")) // excluded from update-set
  }

  // -- The native-upsert statement is the PRODUCTION path
  //    (`database.py:377-410`); Derby only ever exercises the
  //    insert→update fallback, so the exact SQL text and parameter
  //    bind order are pinned here, and the Some(nativeUpsert) branch
  //    of the partition loop is executed via a bind-reordering stub
  //    dialect below. ------------------------------------------------

  test("MySQL native upsert: exact SQL text and identity bind order") {
    val stmt = JdbcUpsert.MySqlDialect.upsert("jobs",
      Seq("data_id", "label", "score"), "data_id").get
    assert(stmt.sql ==
      "INSERT INTO `jobs` (`data_id`, `label`, `score`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `label` = VALUES(`label`), `score` = VALUES(`score`)")
    assert(stmt.bindOrder == Seq(0, 1, 2))
  }

  test("MySQL native upsert: id/created_at excluded, backticks doubled") {
    val stmt = JdbcUpsert.MySqlDialect.upsert("t",
      Seq("data_id", "id", "created_at", "a`b"), "data_id").get
    assert(stmt.sql.contains("ON DUPLICATE KEY UPDATE `a``b` = VALUES(`a``b`)"))
    assert(!stmt.sql.contains("`id` = VALUES"))
    assert(!stmt.sql.contains("`created_at` = VALUES"))
  }

  test("fallback UPDATE binds updatable columns in order, key last") {
    val stmt = JdbcUpsert.GenericDialect.update("t",
      Seq("data_id", "f1", "id", "f2"), "data_id")
    assert(stmt.sql == """UPDATE "t" SET "f1" = ?, "f2" = ? WHERE "data_id" = ?""")
    assert(stmt.bindOrder == Seq(1, 3, 0))
  }

  /** Stub dialect whose "native upsert" names the columns in REVERSED
    * order: proves the partition loop binds through Stmt.bindOrder
    * (param position → row-field index), not by row-field position. A
    * bind-by-position bug would land data_id in f2 — all columns are
    * VARCHAR so the corruption would succeed silently and the content
    * assertion below catches it.
    */
  private object ReversedBindDialect extends JdbcUpsert.Dialect {
    def quote(id: String): String = JdbcUpsert.GenericDialect.quote(id)
    def createTableSql(table: String, features: Seq[(String, SqlType)]): String =
      JdbcUpsert.GenericDialect.createTableSql(table, features)
    def upsert(table: String, columns: Seq[String], key: String): Option[JdbcUpsert.Stmt] = {
      val rev = columns.reverse
      Some(JdbcUpsert.Stmt(
        s"INSERT INTO ${quote(table)} (${rev.map(quote).mkString(", ")}) " +
          s"VALUES (${rev.map(_ => "?").mkString(", ")})",
        rev.map(columns.indexOf(_))))
    }
  }

  test("native-upsert branch: batch + per-row fallback honor bindOrder") {
    val c = JdbcUpsert.Config(derbyUrl("dbnat"), "t1", ReversedBindDialect,
      batchSize = 2)
    val feats = Seq("fa" -> SqlType.Varchar(10), "fb" -> SqlType.Varchar(5))
    assert(JdbcUpsert.ensureTable(c, feats).isRight)
    val up = sc.longAccumulator; val fail = sc.longAccumulator
    val failedKeys = sc.collectionAccumulator[String]("fk")
    // batch 1 = (a, b): b's fb exceeds VARCHAR(5) → executeBatch fails →
    // per-row NATIVE path (upsertRow case Some) isolates b; batch 2 = (c)
    // succeeds through the batched native statement.
    JdbcUpsert.write(
      Seq(("a", "va", "wa"), ("b", "vb", "toolong"), ("c", "vc", "wc"))
        .toDF("data_id", "fa", "fb").coalesce(1),
      c, up, fail, Some(failedKeys))
    assert(up.value == 2 && fail.value == 1)
    assert(failedKeys.value.get(0) == "b")
    val conn = DriverManager.getConnection(derbyUrl("dbnat"))
    val rs = conn.createStatement().executeQuery(
      """SELECT "data_id", "fa", "fb" FROM "t1" ORDER BY "data_id"""")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toList
    conn.close()
    assert(rows == List(("a", "va", "wa"), ("c", "vc", "wc")))
  }
}

class FileCopySinkSpec extends SparkSpec {
  import spark.implicits._

  test("copies resolve extension, atomic pair pre-check, failure channel") {
    val src = tmpDir("src")
    val xml = tmpDir("xml")
    val dest = tmpDir("dest")
    write(src.resolve("a.jpg"), "A")
    write(src.resolve("b.jpg"), "B")
    write(xml.resolve("a.xml"), "<a/>")
    // b has no xml → atomic pre-check must fail b WITHOUT copying b.jpg
    val df = Seq(("a.jpg", "jpg"), ("b.jpg", "jpg"), ("missing.jpg", "jpg"))
      .toDF("filename", "extension")
    val copied = sc.longAccumulator; val failed = sc.longAccumulator
    FileCopySink.copy(df,
      FileCopySink.CopySpec.imageXml(src.toString, xml.toString, dest.toString),
      copied, failed, sc.hadoopConfiguration)
    assert(copied.value == 1) // only a has BOTH image and xml
    assert(failed.value == 2) // b (no xml), missing (no image)
    assert(java.nio.file.Files.exists(dest.resolve("a.jpg")))
    assert(java.nio.file.Files.exists(dest.resolve("a.xml")))
    // a copied fully or not at all; b must NOT be present (atomicity)
    assert(!java.nio.file.Files.exists(dest.resolve("b.jpg")))
  }

  test("single-dir copy with retry-able overwrite") {
    val src = tmpDir("src2")
    val dest = tmpDir("dest2")
    write(src.resolve("x.txt"), "first")
    val df = Seq(("x", "txt")).toDF("filename", "extension")
    val c1 = sc.longAccumulator; val f1 = sc.longAccumulator
    FileCopySink.copy(df, FileCopySink.CopySpec.single(src.toString, dest.toString),
      c1, f1, sc.hadoopConfiguration)
    assert(c1.value == 1 && f1.value == 0)
    assert(new String(java.nio.file.Files.readAllBytes(dest.resolve("x.txt"))) == "first")
    // overwrite path: change content, copy again
    write(src.resolve("x.txt"), "second")
    val c2 = sc.longAccumulator; val f2 = sc.longAccumulator
    FileCopySink.copy(df, FileCopySink.CopySpec.single(src.toString, dest.toString),
      c2, f2, sc.hadoopConfiguration)
    assert(new String(java.nio.file.Files.readAllBytes(dest.resolve("x.txt"))) == "second")
  }

  test("empty manifest yields zero counts, not an NPE") {
    val dest = tmpDir("dest3")
    val df = Seq.empty[(String, String)].toDF("filename", "extension")
    val c = sc.longAccumulator; val f = sc.longAccumulator
    FileCopySink.copy(df, FileCopySink.CopySpec.single(dest.toString, dest.toString),
      c, f, sc.hadoopConfiguration)
    assert(c.value == 0 && f.value == 0)
  }

  test("illegal-Path filename fails the record, not the task") {
    val src = tmpDir("src4")
    val dest = tmpDir("dest4")
    write(src.resolve("ok.txt"), "fine")
    // ':' is legal on ext4 but rejected by org.apache.hadoop.fs.Path
    val df = Seq(("scan:001", "txt"), ("ok", "txt")).toDF("filename", "extension")
    val c = sc.longAccumulator; val f = sc.longAccumulator
    FileCopySink.copy(df, FileCopySink.CopySpec.single(src.toString, dest.toString),
      c, f, sc.hadoopConfiguration)
    assert(c.value == 1 && f.value == 1) // bad name → failure channel
    assert(java.nio.file.Files.exists(dest.resolve("ok.txt")))
  }

  test("mixed-extension mask directory: probe order png→jpg→jpeg, atomicity kept") {
    val imgs = tmpDir("src5img")
    val masks = tmpDir("src5mask")
    val dest = tmpDir("dest5")
    write(imgs.resolve("a.jpg"), "A")
    write(imgs.resolve("b.jpg"), "B")
    write(imgs.resolve("c.jpg"), "C")
    write(imgs.resolve("d.jpg"), "D")
    write(masks.resolve("a_mask.png"), "MA")   // primary extension
    write(masks.resolve("b_mask.jpg"), "MB")   // first fallback
    write(masks.resolve("c_mask.jpeg"), "MC")  // second fallback
    // d has no mask under ANY probed extension → atomic failure
    write(masks.resolve("d_mask.gif"), "MD")
    val df = Seq(("a.jpg", "jpg"), ("b.jpg", "jpg"), ("c.jpg", "jpg"),
      ("d.jpg", "jpg")).toDF("filename", "extension")
    val c = sc.longAccumulator; val f = sc.longAccumulator
    FileCopySink.copy(df,
      FileCopySink.CopySpec.imageMask(imgs.toString, masks.toString, dest.toString),
      c, f, sc.hadoopConfiguration)
    assert(c.value == 3 && f.value == 1)
    assert(java.nio.file.Files.exists(dest.resolve("a_mask.png")))
    assert(java.nio.file.Files.exists(dest.resolve("b_mask.jpg")))
    assert(java.nio.file.Files.exists(dest.resolve("c_mask.jpeg")))
    // atomicity: d's image must NOT be copied when its mask is missing
    assert(!java.nio.file.Files.exists(dest.resolve("d.jpg")))
    assert(!java.nio.file.Files.exists(dest.resolve("d_mask.gif")))
    // a probe that prefers png still lands png when both exist
    write(masks.resolve("a_mask.jpg"), "WRONG")
    val c2 = sc.longAccumulator; val f2 = sc.longAccumulator
    FileCopySink.copy(Seq(("a.jpg", "jpg")).toDF("filename", "extension"),
      FileCopySink.CopySpec.imageMask(imgs.toString, masks.toString, dest.toString),
      c2, f2, sc.hadoopConfiguration)
    assert(c2.value == 1)
    assert(new String(java.nio.file.Files.readAllBytes(
      dest.resolve("a_mask.png"))) == "MA")
  }

  test("resolveName appends extension only when absent") {
    assert(FileCopySink.resolveName("a.jpg", "jpg") == "a.jpg")
    assert(FileCopySink.resolveName("a", "jpg") == "a.jpg")
    assert(FileCopySink.resolveName("a", "") == "a")
    assert(FileCopySink.resolveName("archive.tar", "gz") == "archive.tar")
  }
}
