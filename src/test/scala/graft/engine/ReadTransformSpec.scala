package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{CsvOptions, LabelPolicy, ResolvedConfig, SqlType, TaskCategory}
import graft.engine.read.{CsvReader, JsonReader, StrictCast}
import graft.engine.transform.TransformPipeline

class CsvReaderSpec extends SparkSpec {

  test("missing source path is a structured error on both readers, not an exception") {
    val gone = "/tmp/graft-definitely-missing-source.csv"
    val csv = CsvReader.open(spark, gone)
    assert(csv.left.exists(_.exists(_.contains("Source path not found"))))
    val json = JsonReader.open(spark, gone, Seq("a"))
    assert(json.left.exists(_.exists(_.contains("Source path not found"))))
    // a directory where a manifest file is expected is equally structured
    val dir = tmpDir("srcdir").toString
    assert(CsvReader.open(spark, dir).left
      .exists(_.exists(_.contains("directory"))))
  }

  test("duplicate post-trim headers rejected before the scan") {
    val p = write(tmpDir("csv").resolve("dup.csv"), "a, a ,b\n1,2,3\n")
    val r = CsvReader.preflightHeader(spark, p.toString)
    assert(r.left.exists(_.contains("a")))
  }

  test("quoted delimiter inside header handled") {
    val p = write(tmpDir("csv").resolve("q.csv"), "\"a,b\",c\n1,2\n")
    assert(CsvReader.preflightHeader(spark, p.toString) == Right(Seq("a,b", "c")))
  }

  test("non-UTF8 bytes rejected with an offset") {
    val p = tmpDir("csv").resolve("latin.csv")
    java.nio.file.Files.write(p, Array[Byte]('a', ',', 'b', '\n', 0xE9.toByte, ',', '1'))
    val r = CsvReader.preflightUtf8(spark, p.toString)
    assert(r.left.exists(_.contains("offset")))
  }

  test("leading zeros survive: string columns never inferred") {
    val p = write(tmpDir("csv").resolve("zip.csv"), "code,qty\n007,1\n042,2\n")
    val df = CsvReader.open(spark, p.toString).toOption.get
    val codes = df.select("code").collect().map(_.getString(0)).toSet
    assert(codes == Set("007", "042"))
  }
}

class StrictCastSpec extends SparkSpec {
  import spark.implicits._

  test("present-but-unparseable counted with samples; missing tolerated") {
    val df = Seq(("1", "x"), ("junk", "y"), (null, "z"), ("3", "w"))
      .toDF("n", "s")
    val r = StrictCast(df, Seq("n" -> SqlType.IntT, "s" -> SqlType.Varchar(10)))
    assert(r.isLeft)
    val errs = r.left.toOption.get.errors
    assert(errs.size == 1 && errs.head.contains("'n'") && errs.head.contains("junk"))
  }

  test("varchar overflow and char exact-length enforced") {
    val df = Seq(("abcdef", "ab"), ("ok", "abc")).toDF("v", "c")
    val r = StrictCast(df, Seq("v" -> SqlType.Varchar(3), "c" -> SqlType.Char(2)))
    val errs = r.left.toOption.get.errors
    assert(errs.exists(_.contains("'v'")))
    assert(errs.exists(_.contains("'c'")))
  }

  test("boolean vocabulary: yes/no/t/f/1.0 parse, junk fails") {
    val df = Seq("yes", "NO", "t", "F", "1.0", "0", "TRUE", "2", "maybe")
      .toDF("b")
    val r = StrictCast(df, Seq("b" -> SqlType.BoolT))
    val errs = r.left.toOption.get.errors
    assert(errs.head.contains("2 value(s)")) // "2" and "maybe"
  }

  test("integers via float-looking strings do not become 7.0 strings") {
    val df = Seq("7", "8").toDF("i")
    val typed = StrictCast(df, Seq("i" -> SqlType.IntT)).toOption.get
    assert(typed.schema("i").dataType.typeName == "integer")
    assert(typed.collect().map(_.getInt(0)).toSet == Set(7, 8))
  }

  test("datetime lenient parse accepts ISO and slashed forms") {
    val df = Seq("2024-01-02 03:04:05", "2024-01-02", "1/31/2024", "31/31/2024")
      .toDF("ts")
    val r = StrictCast(df, Seq("ts" -> SqlType.DateTimeT))
    val errs = r.left.toOption.get.errors
    assert(errs.head.contains("1 value(s)")) // only 31/31/2024 fails
  }

  test("non-finite numerics rejected (overflow-to-inf trap)") {
    val df = Seq("1.5", "Infinity", "NaN").toDF("f")
    val r = StrictCast(df, Seq("f" -> SqlType.FloatT))
    assert(r.left.toOption.get.errors.head.contains("2 value(s)"))
  }

  test("JSON disposition: validRowFilter keeps clean rows only") {
    val df = Seq(("1", "a"), ("junk", "b")).toDF("n", "s")
    val kept = df.filter(StrictCast.validRowFilter(Seq("n" -> SqlType.IntT)))
    assert(kept.count() == 1)
  }
}

class TransformPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(policy: LabelPolicy = LabelPolicy.Passthrough) = ResolvedConfig(
    category = TaskCategory.TabularClassification,
    tableName = "t", intent = "train", dataFormat = "csv", sourcePath = "/x",
    schema = Seq("f1" -> "FLOAT", "target" -> "VARCHAR(10)", "uid" -> "VARCHAR(10)"),
    labelColumn = Some("target"), labelPolicy = policy,
    uniqueIdColumn = Some("uid"))

  test("standard columns produced; null/blank data_id drops the record") {
    val df = Seq(("1.5", "cat", "id1"), ("2.5", "dog", " "), ("3.5", "cat", null))
      .toDF("f1", "target", "uid")
    val out = TransformPipeline(df, cfg(), "run-1")
    assert(out.columns.toSet == Set("status", "label", "data_intent", "data_id",
      "filename", "extension", "annotation", "ingestor_id", "f1"))
    val rows = out.collect()
    assert(rows.length == 1) // blank + null uid rows dropped
    val r = rows.head
    assert(r.getAs[String]("data_id") == "id1")
    assert(r.getAs[String]("label") == "cat")
    assert(r.getAs[String]("data_intent") == "train")
    assert(r.getAs[String]("ingestor_id") == "run-1")
  }

  test("uuid data_id when no source column; labels bucket under policy") {
    val df = Seq(("1.0", "7.5"), ("2.0", "")).toDF("f1", "target")
    val out = TransformPipeline(df, cfg(LabelPolicy.Bucket(64))
      .copy(uniqueIdColumn = None), "run-2")
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("data_id").length == 36)) // uuid shape
    val labels = rows.map(_.getAs[String]("label")).toSet
    assert(labels.contains("-1")) // blank label → sentinel
    assert(labels.forall(l => l.toInt >= -1 && l.toInt < 64))
  }

  test("4-way null vocabulary normalized in feature columns") {
    val df = Seq(("NA", "a"), ("", "b"), ("None", "c"), (" x ", "d"))
      .toDF("f1", "target")
    val out = TransformPipeline(df, cfg().copy(uniqueIdColumn = None), "r")
    val f1 = out.select("f1").collect().map(r => Option(r.getString(0)))
    assert(f1.count(_.isEmpty) == 3)
    assert(f1.flatten.toSet == Set("x")) // trimmed survivor
  }

  test("filename extension split") {
    val df = Seq(("1.0", "x", "img_01.jpg"), ("2.0", "y", "img_02"))
      .toDF("f1", "target", "image")
    val out = TransformPipeline(df, cfg().copy(uniqueIdColumn = None), "r",
      filenameColumn = Some("image"))
    val rows = out.orderBy("filename").collect()
    assert(rows(0).getAs[String]("filename") == "img_01.jpg")
    assert(rows(0).getAs[String]("extension") == "jpg")
    assert(rows(1).getAs[String]("extension") == null)
  }
}

class JsonReaderSpec extends SparkSpec {
  test("shape peek distinguishes object / array / junk") {
    val d = tmpDir("json")
    write(d.resolve("o.json"), """  {"a": 1}""")
    write(d.resolve("a.json"), """[{"a": 1}, {"a": 2}]""")
    write(d.resolve("x.json"), """hello""")
    assert(JsonReader.peekShape(spark, d.resolve("o.json").toString) == Right(JsonReader.SingleObject))
    assert(JsonReader.peekShape(spark, d.resolve("a.json").toString) == Right(JsonReader.ArrayOfObjects))
    assert(JsonReader.peekShape(spark, d.resolve("x.json").toString).isLeft)
  }

  test("array form reads with declared string schema") {
    val d = tmpDir("json")
    val p = write(d.resolve("a.json"),
      """[{"n": 1, "s": "x"}, {"n": "junk", "s": "y"}]""")
    val df = JsonReader.read(spark, p.toString, Seq("n", "s"))
    assert(df.count() == 2)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("malformed JSON fails open() loudly, never a phantom all-null row") {
    val d = tmpDir("json")
    // starts with '{' (passes the shape peek) but is not valid JSON:
    // PERMISSIVE+multiLine would otherwise yield ONE all-null row that
    // sails through the skip disposition and into the DB
    val p = write(d.resolve("bad.json"), """{"a": 1, "b": """)
    val r = JsonReader.open(spark, p.toString, Seq("a", "b"))
    assert(r.left.exists(_.exists(_.contains("unparseable"))))
    // and a well-formed file still opens clean with no corrupt column
    val ok = write(d.resolve("ok.json"), """[{"a": "1"}]""")
    val df = JsonReader.open(spark, ok.toString, Seq("a")).toOption.get
    assert(df.columns.toSeq == Seq("a") && df.count() == 1)
  }
}
