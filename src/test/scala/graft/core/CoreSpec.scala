package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SqlTypeSpec extends AnyFunSuite {
  test("vocabulary round-trips") {
    assert(SqlType.parse("VARCHAR(128)") == Right(SqlType.Varchar(128)))
    assert(SqlType.parse("varchar(5)") == Right(SqlType.Varchar(5)))
    assert(SqlType.parse("CHAR(2)") == Right(SqlType.Char(2)))
    assert(SqlType.parse("DECIMAL(10,2)") == Right(SqlType.Decimal(10, 2)))
    assert(SqlType.parse("NUMERIC(8, 3)") == Right(SqlType.Decimal(8, 3)))
    assert(SqlType.parse("decimal(7)") == Right(SqlType.Decimal(7, 0)))
    assert(SqlType.parse("INT") == Right(SqlType.IntT))
    assert(SqlType.parse("TINYINT") == Right(SqlType.IntT))
    assert(SqlType.parse("BIGINT") == Right(SqlType.BigIntT))
    assert(SqlType.parse("FLOAT") == Right(SqlType.FloatT))
    assert(SqlType.parse("DOUBLE") == Right(SqlType.DoubleT))
    assert(SqlType.parse("BOOL") == Right(SqlType.BoolT))
    assert(SqlType.parse("BOOLEAN") == Right(SqlType.BoolT))
    assert(SqlType.parse("DATE") == Right(SqlType.DateT))
    assert(SqlType.parse("DATETIME") == Right(SqlType.DateTimeT))
    assert(SqlType.parse("TIMESTAMP") == Right(SqlType.DateTimeT))
    assert(SqlType.parse("TIME") == Right(SqlType.TimeT))
    assert(SqlType.parse("TEXT") == Right(SqlType.Text))
    assert(SqlType.parse("LONGBLOB") == Right(SqlType.Blob))
    assert(SqlType.parse("GEOMETRY").isLeft)
  }

  test("out-of-range lengths/precision are Left, never a thrown exception") {
    // MySQL allows DECIMAL(65), Spark caps at 38 — must be a
    // structured validation error (exit 2), not a DecimalType require
    // blowing up the CLI with a stack trace.
    assert(SqlType.parse("DECIMAL(65,2)").isLeft)
    assert(SqlType.parse("DECIMAL(0)").isLeft)
    assert(SqlType.parse("DECIMAL(2,5)").isLeft)   // scale > precision
    assert(SqlType.parse("VARCHAR(0)").isLeft)
    assert(SqlType.parse("VARCHAR(99999999999)").isLeft) // Int overflow
    assert(SqlType.parse("CHAR(256)").isLeft)
    assert(SqlType.parse("DECIMAL(38,38)") == Right(SqlType.Decimal(38, 38)))
    assert(SqlType.parse("VARCHAR(65535)") == Right(SqlType.Varchar(65535)))
  }

  test("parseSchema accumulates all errors") {
    val r = SqlType.parseSchema(Seq("a" -> "INT", "b" -> "NOPE", "c" -> "ALSO_NOPE"))
    assert(r.left.exists(_.size == 2))
  }
}

class StandardColumnsSpec extends AnyFunSuite {
  test("reserved-name collision, length, count, dupes") {
    val errs = StandardColumns.check(Seq("label", "x" * 65, "f1", "f1"))
    assert(errs.exists(_.contains("collides")))
    assert(errs.exists(_.contains("exceeds")))
    assert(errs.exists(_.contains("Duplicate")))
    assert(StandardColumns.check(Seq("f1", "f2")).isEmpty)
    assert(StandardColumns.check((1 to 4001).map(i => s"c$i")).nonEmpty)
  }

  test("drift detection names both sides") {
    val err = StandardColumns.driftError(Set("a", "b"), Set("b", "c"))
    assert(err.exists(e => e.contains("c") && e.contains("a")))
    assert(StandardColumns.driftError(Set("a"), Set("a")).isEmpty)
  }

  test("duplicate detection is case-insensitive (MySQL identifier rules)") {
    // ("Qty","qty") is one column to MySQL: must be a structured error
    // here, not a raw DDL 1060 later
    assert(StandardColumns.check(Seq("Qty", "qty")).exists(_.contains("Duplicate")))
  }
}

class ConfigSpec extends AnyFunSuite {
  private val yaml =
    """category: tabular_classification
      |table: trial_data
      |intent: train
      |csv: /data/labels.csv
      |schema:
      |  feature_00: FLOAT
      |  feature_01: FLOAT
      |label: target
      |""".stripMargin

  test("every shipped examples/*.yaml resolves clean, one per category") {
    val dir = java.nio.file.Paths.get("examples")
    assert(java.nio.file.Files.isDirectory(dir), s"missing $dir")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".yaml")).toSeq.sortBy(_.toString)
    assert(files.size == TaskCategory.all.size,
      s"expected one example per category (${TaskCategory.all.size}), got $files")
    val categories = files.map { f =>
      val resolved = YamlConfig.load(f.toString)
      assert(resolved.isRight,
        s"$f did not resolve: ${resolved.left.getOrElse(Nil).mkString("; ")}")
      val cfg = resolved.toOption.get
      // the filename IS the category — keeps the worked examples honest
      assert(f.getFileName.toString == s"${cfg.category}.yaml",
        s"$f: file name must match its category '${cfg.category}'")
      cfg.category
    }
    assert(categories.sorted == TaskCategory.all.sorted) // every category, once
  }

  test("YAML parse + resolve happy path") {
    val r = YamlConfig.parse(yaml).flatMap(Conventions.resolve)
    assert(r.isRight)
    val c = r.toOption.get
    assert(c.tableName == "trial_data")
    assert(c.dataFormat == "csv")
    assert(c.labelColumn.contains("target"))
    assert(c.labelPolicy == LabelPolicy.Passthrough)
    assert(c.schema.toMap == Map("feature_00" -> "FLOAT", "feature_01" -> "FLOAT"))
  }

  test("regression-class category requires explicit label policy") {
    val bad = yaml.replace("tabular_classification", "tabular_regression")
    val r = YamlConfig.parse(bad).flatMap(Conventions.resolve)
    assert(r.left.exists(_.exists(_.contains("policy"))))
  }

  test("typo'd keys inside nested objects are rejected, not silently defaulted") {
    // `polcy: bucket` must NOT resolve to passthrough — that ships raw
    // labels despite the customer asking for bucketing
    val y1 = yaml.replace("label: target",
      "label:\n  column: target\n  polcy: bucket")
    assert(YamlConfig.parse(y1).flatMap(Conventions.resolve)
      .left.exists(_.exists(_.contains("/label/polcy"))))
    val y2 = yaml + "data_id:\n  strategy: column\n  colunm: rid\n"
    assert(YamlConfig.parse(y2).flatMap(Conventions.resolve)
      .left.exists(_.exists(_.contains("/data_id/colunm"))))
    val y3 = yaml + "spec:\n  csv_options:\n    delimeter: ';'\n"
    assert(YamlConfig.parse(y3).flatMap(Conventions.resolve)
      .left.exists(_.exists(_.contains("/spec/csv_options/delimeter"))))
  }

  test("label object form with bucket policy") {
    val y = yaml.replace("label: target",
      "label:\n  column: target\n  policy: bucket")
    val r = YamlConfig.parse(y).flatMap(Conventions.resolve)
    assert(r.toOption.get.labelPolicy == LabelPolicy.Bucket(64))
  }

  test("bad category / intent / both sources rejected with pointer-ish paths") {
    val y = "category: nope\ntable: t\nintent: maybe\ncsv: /a\njson: /b\n"
    val r = YamlConfig.parse(y).flatMap(Conventions.resolve)
    val errs = r.left.getOrElse(Nil)
    assert(errs.exists(_.startsWith("/category")))
    assert(errs.exists(_.startsWith("/intent")))
    assert(errs.exists(_.contains("exactly one")))
  }

  test("keypoint category gets Annotation column convention") {
    val y = yaml.replace("tabular_classification", "keypoint_detection") +
      "images: /data/images\n" // image categories require the sidecar dir
    val r = YamlConfig.parse(y).flatMap(Conventions.resolve)
    assert(r.toOption.get.annotationColumn.contains("Annotation"))
  }
}

class TableLockSpec extends AnyFunSuite {
  import graft.engine.TableLock
  test("exclusive acquire, holder named, stale self-clear") {
    val dir = java.nio.file.Files.createTempDirectory("locks").toString
    var clock = 1000L
    val l1 = new TableLock(dir, "t1", staleAfterMs = 5000, now = () => clock)
    val l2 = new TableLock(dir, "t1", staleAfterMs = 5000, now = () => clock)
    assert(l1.acquire("alice").isRight)
    val denied = l2.acquire("bob")
    assert(denied.left.exists(_.contains("alice")))
    clock += 6000 // past staleness cutoff
    assert(l2.acquire("bob").isRight)
    l2.release()
    assert(l1.acquire("carol").isRight) // release deleted the file
  }

  test("IO failure outside the protocol is a structured Left, not a throw") {
    // lockDir path occupied by a FILE: createDirectories fails — the
    // exit-code contract wants Left, never a raw exception
    val f = java.nio.file.Files.createTempFile("notadir", "")
    val l = new TableLock(f.toString, "t9")
    val r = l.acquire("alice")
    assert(r.isLeft && r.left.exists(_.contains("lock unavailable")))
  }

  test("transient re-verify read failure does not orphan a fresh lock") {
    val dir = java.nio.file.Files.createTempDirectory("locks").toString
    var fails = 2
    val flaky: java.nio.file.Path => Array[Byte] = p => {
      if (fails > 0) { fails -= 1; throw new java.io.IOException("transient") }
      java.nio.file.Files.readAllBytes(p)
    }
    val l = new TableLock(dir, "t3", staleAfterMs = 5000, readFile = flaky)
    assert(l.acquire("alice").isRight) // the retry rode out the hiccup
    l.release()
    val l2 = new TableLock(dir, "t3", staleAfterMs = 5000)
    assert(l2.acquire("bob").isRight) // release really freed the table
  }

  test("persistent re-verify failure parks our file instead of orphaning it") {
    val dir = java.nio.file.Files.createTempDirectory("locks").toString
    val broken: java.nio.file.Path => Array[Byte] =
      _ => throw new java.io.IOException("io down")
    val l = new TableLock(dir, "t4", staleAfterMs = 5000, readFile = broken)
    assert(l.acquire("alice").isLeft) // surfaced as a conflict this once...
    // ...but the unreadable fresh lock was atomically quarantined (not
    // deleted — it could in principle be a racer's), so the table is
    // NOT blocked for the whole stale horizon (the ADVICE orphan
    // scenario) and nothing was destroyed.
    val l2 = new TableLock(dir, "t4", staleAfterMs = 5000)
    assert(l2.acquire("bob").isRight)
  }

  test("release clears the lock even when its verify read fails") {
    val dir = java.nio.file.Files.createTempDirectory("locks").toString
    var failReads = false
    val flaky: java.nio.file.Path => Array[Byte] = p => {
      if (failReads) throw new java.io.IOException("io down")
      java.nio.file.Files.readAllBytes(p)
    }
    val l = new TableLock(dir, "t5", staleAfterMs = 5000, readFile = flaky)
    assert(l.acquire("alice").isRight)
    failReads = true
    l.release() // hold is far younger than the stale horizon → safe delete
    failReads = false
    val l2 = new TableLock(dir, "t5", staleAfterMs = 5000)
    assert(l2.acquire("bob").isRight) // no orphan left behind
  }
}

class OptionsMergeSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("spec.csv_options, file_options and top-level bridges resolve") {
    val y =
      """category: keypoint_detection
        |table: t
        |intent: train
        |csv: /data/l.csv
        |images: /data/images
        |number_of_keypoints: 9
        |target_size: [448, 448]
        |batch_size: 1234
        |spec:
        |  csv_options:
        |    delimiter: ";"
        |    escapechar: "\\"
        |  file_options:
        |    filename_column: image_name
        |""".stripMargin
    val c = YamlConfig.parse(y).flatMap(Conventions.resolve).toOption.get
    assert(c.csvOptions.delimiter == ";")
    assert(c.csvOptions.escapeChar == "\\")
    assert(c.csvOptions.quoteChar == "\"") // default kept
    assert(c.fileOptions("filename_column") == "image_name")
    assert(c.fileOptions("number_of_keypoints") == 9)
    assert(c.fileOptions("target_size") == Seq(448, 448))
    assert(c.batchSize == 1234)
  }

  test("spec.file_options wins over top-level bridge") {
    val y =
      """category: keypoint_detection
        |table: t
        |intent: train
        |csv: /l.csv
        |images: /data/images
        |number_of_keypoints: 9
        |spec:
        |  file_options:
        |    number_of_keypoints: 17
        |""".stripMargin
    val c = YamlConfig.parse(y).flatMap(Conventions.resolve).toOption.get
    assert(String.valueOf(c.fileOptions("number_of_keypoints")) == "17")
  }
}
