package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{CsvOptions, SqlType}
import graft.engine.read.{CsvReader, StrictCast}
import graft.engine.sink.JdbcUpsert

/** The adversarial ingestion contract, ported from the reference's
  * behavioral spec (`tests/test_adversarial_ingestion_harness.py`):
  * raw-data pathologies (Excel exports, `UniProt|gene` headers, yes/no
  * booleans, scientific-notation ints, SQL-ish headers) must either
  * ingest correctly OR fail with a clear actionable error — never crash
  * cryptically, silently corrupt, or silently drop.
  */
class AdversarialSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------- encodings / shape

  test("UTF-8 BOM header is not mangled (Excel export)") {
    val p = tmpDir("adv").resolve("bom.csv")
    java.nio.file.Files.write(p,
      ("﻿" + "feature_00,target\n1.5,cat\n").getBytes("UTF-8"))
    val header = CsvReader.preflightHeader(spark, p.toString)
    assert(header == Right(Seq("feature_00", "target"))) // no ﻿ prefix
  }

  test("CRLF line endings leave no trailing CR in values") {
    val p = tmpDir("adv").resolve("crlf.csv")
    java.nio.file.Files.write(p, "a,b\r\nx,y\r\n".getBytes("UTF-8"))
    val df = CsvReader.open(spark, p.toString).toOption.get
    assert(df.collect().head.getString(1) == "y") // not "y\r"
  }

  test("quoted embedded comma and newline preserved") {
    val p = write(tmpDir("adv").resolve("q.csv"),
      "name,desc\nx,\"a, with comma\"\ny,\"line1\nline2\"\n")
    val df = spark.read.schema("name STRING, desc STRING")
      .option("header", "true").option("multiLine", "true").csv(p.toString)
    val byName = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("x") == "a, with comma")
    assert(byName("y") == "line1\nline2")
  }

  test("wrong delimiter is loud: schema columns come back missing") {
    val p = write(tmpDir("adv").resolve("semi.csv"), "a;b;c\n1;2;3\n")
    val df = CsvReader.open(spark, p.toString).toOption.get // comma-parsed
    val r = StrictCast(df, Seq("a" -> SqlType.IntT, "b" -> SqlType.IntT))
    assert(r.left.exists(_.errors.exists(_.contains("not found"))))
  }

  test("semicolon delimiter with the option works") {
    val p = write(tmpDir("adv").resolve("semi2.csv"), "a;b\n1;2\n")
    val opts = CsvOptions(delimiter = ";")
    val df = CsvReader.open(spark, p.toString, opts).toOption.get
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.collect().head.getString(0) == "1")
  }

  test("ragged row is a hard error, not a silent drop") {
    // Spark's FAILFAST silently tolerates extra trailing tokens, so the
    // engine adds a corrupt-record preflight — it must catch BOTH
    // too-many and too-few token rows with samples.
    val p = write(tmpDir("adv").resolve("ragged.csv"), "a,b\n1,2\n3,4,5\n")
    val r = CsvReader.open(spark, p.toString)
    assert(r.left.exists(_.exists(e =>
      e.contains("malformed") && e.contains("3,4,5"))))
  }

  // ------------------------------------------------------------- numerics

  test("scientific-notation and large ints ingest clean") {
    val df = Seq("1e5", "2147483647", "007", "7.0").toDF("n")
    val typed = StrictCast(df, Seq("n" -> SqlType.IntT)).toOption.get
    assert(typed.as[Int].collect().toSet == Set(100000, 2147483647, 7))
  }

  test("int overflow and true fractions are counted as invalid, not wrapped") {
    val df = Seq("2147483648", "7.5").toDF("n") // Int.MaxValue+1, fraction
    val r = StrictCast(df, Seq("n" -> SqlType.IntT))
    assert(r.left.exists(_.errors.head.contains("2 value(s)")))
  }

  test("bigint overflow is a clear error") {
    val df = Seq("9300000000000000000000").toDF("n") // > 2^63
    val r = StrictCast(df, Seq("n" -> SqlType.BigIntT))
    assert(r.left.exists(_.errors.head.contains("not valid")))
  }

  test("float overflow to infinity rejected; precision preserved") {
    val bad = Seq("1e999").toDF("f")
    assert(StrictCast(bad, Seq("f" -> SqlType.FloatT)).isLeft)
    val ok = Seq("0.1234567890123457").toDF("f")
    val v = StrictCast(ok, Seq("f" -> SqlType.FloatT)).toOption.get
      .as[Double].head()
    assert(v == 0.1234567890123457) // full double precision kept
  }

  test("decimal column supported and scale-coerced") {
    val df = Seq("12.345", "1").toDF("d")
    val typed = StrictCast(df, Seq("d" -> SqlType.Decimal(10, 2))).toOption.get
    val vals = typed.as[java.math.BigDecimal].collect().map(_.toString).toSet
    assert(vals == Set("12.35", "1.00"))
  }

  // ------------------------------------------------------ booleans / dates

  test("yes/no and 1.0/0.0 booleans ingest as real booleans") {
    val df = Seq("yes", "NO", "1.0", "0").toDF("b")
    val typed = StrictCast(df, Seq("b" -> SqlType.BoolT)).toOption.get
    assert(typed.schema("b").dataType.typeName == "boolean")
    assert(typed.as[Boolean].collect().toSeq == Seq(true, false, true, false))
  }

  test("DATE strips spurious time; TIME carries no date") {
    val df = Seq("2024-03-05 00:00:00").toDF("d")
    val typed = StrictCast(df, Seq("d" -> SqlType.DateT)).toOption.get
    assert(typed.as[java.sql.Date].head().toString == "2024-03-05")
    val t = Seq("13:45:10").toDF("t")
    val tt = StrictCast(t, Seq("t" -> SqlType.TimeT)).toOption.get
    assert(tt.as[String].head() == "13:45:10") // plain string, no date
  }

  test("out-of-range TIME is rejected at validation, not at the DB sink") {
    val df = Seq("99:99", "23:59:59", "12:60", "00:00").toDF("t")
    val n = df.filter(graft.engine.read.StrictCast.invalid(col("t"), SqlType.TimeT)).count()
    assert(n == 2) // 99:99 and 12:60 fail the range check
  }

  // -------------------------------------------- pathological headers / DDL

  test("UniProt|gene special-char header survives DDL and upsert") {
    val col = "UniProt|gene (v2.1)"
    // MySQL DDL backtick-quotes it
    val ddl = JdbcUpsert.MySqlDialect.createTableSql("t",
      Seq(col -> SqlType.DoubleT))
    assert(ddl.contains(s"`$col` DOUBLE"))
    // end-to-end through embedded Derby with the generic dialect
    val cfg = JdbcUpsert.Config("jdbc:derby:memory:adv1;create=true", "adv1",
      JdbcUpsert.GenericDialect)
    assert(JdbcUpsert.ensureTable(cfg, Seq(col -> SqlType.DoubleT)).isRight)
    val up = sc.longAccumulator; val fail = sc.longAccumulator
    JdbcUpsert.write(Seq(("a", 1.5)).toDF("data_id", col), cfg, up, fail)
    assert(up.value == 1 && fail.value == 0)
    val conn = java.sql.DriverManager.getConnection("jdbc:derby:memory:adv1")
    val rs = conn.createStatement().executeQuery(
      s"""SELECT "$col" FROM "adv1"""")
    rs.next()
    assert(rs.getDouble(1) == 1.5)
    conn.close()
  }

  test("SQL-injection-shaped header is neutralised by identifier quoting") {
    val evil = """x"); DROP TABLE users; --"""
    val quoted = JdbcUpsert.GenericDialect.quote(evil)
    assert(quoted == "\"x\"\"); DROP TABLE users; --\"") // doubled quote, inert
    val backtick = JdbcUpsert.MySqlDialect.quote("a`b")
    assert(backtick == "`a``b`")
  }

  test("validation scans the whole file, not the first chunk") {
    // junk buried at row ~5000 — a 1000-row-chunk validator would miss it
    val rows = (1 to 6000).map(i => if (i == 5000) "junk" else i.toString)
    val df = rows.toDF("n")
    val r = StrictCast(df, Seq("n" -> SqlType.IntT))
    assert(r.left.exists(_.errors.head.contains("1 value(s)")))
  }

  test("special-char values round-trip (quotes, unicode, tabs)") {
    val payloads = Seq("""he said "hi"""", "naïve café 北京", "tab\there")
    val p = tmpDir("adv").resolve("vals.csv")
    val content = "v\n" + payloads.map(v =>
      "\"" + v.replace("\"", "\"\"") + "\"").mkString("\n") + "\n"
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    val df = CsvReader.open(spark, p.toString).toOption.get
    assert(df.as[String].collect().toSet == payloads.toSet)
  }

  test("varchar overflow names the column and shows the sample") {
    val df = Seq("short", "a" * 300).toDF("v")
    val r = StrictCast(df, Seq("v" -> SqlType.Varchar(255)))
    val err = r.left.toOption.get.errors.head
    assert(err.contains("'v'") && err.contains("VARCHAR(255)"))
  }
}
