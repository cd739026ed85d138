package graft.engine.read

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON manifest scan (SURVEY.md §2.1 S5): the reference peeks the
  * first non-whitespace byte to pick single-object vs array form
  * (`json_ingestor.py:19-56`) and streams arrays via ijson. Spark's
  * multiLine JSON reader handles both shapes with bounded memory; the
  * peek remains useful for the error message, so it's kept as a cheap
  * preflight.
  *
  * Disposition difference from CSV (SURVEY.md §7.4 #4): a bad record is
  * SKIPPED with a warning, not fatal — callers use
  * [[StrictCast.validRowFilter]] + a skip counter instead of the
  * fail-fast report.
  */
object JsonReader {

  sealed trait Shape
  case object SingleObject extends Shape
  case object ArrayOfObjects extends Shape

  def peekShape(spark: SparkSession, path: String): Either[String, Shape] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      var b = in.read()
      while (b != -1 && Character.isWhitespace(b)) b = in.read()
      b match {
        case '{' => Right(SingleObject)
        case '[' => Right(ArrayOfObjects)
        case -1 => Left(s"$path: file is empty")
        case other =>
          Left(s"$path: first non-whitespace byte '${other.toChar}' is neither '{' nor '['")
      }
    } finally in.close()
  }

  /** All declared columns read as strings (same no-inference rule as
    * CSV); multiLine handles the array form.
    */
  def read(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(c => StructField(c, StringType, nullable = true)))
    spark.read
      .schema(schema)
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .json(path)
  }

  private val CorruptCol = "_graft_corrupt"

  /** Preflights + scan. Malformed JSON must fail LOUDLY here: under
    * PERMISSIVE+multiLine an unparseable file silently becomes one
    * all-null phantom row, which would sail through the per-record
    * skip disposition (all-null = absent = valid), get stamped a
    * uuid data_id, and be committed + API-registered as data. The
    * corrupt-record column makes the parse failure observable; any
    * corrupt row fails the open with a structured error.
    */
  def open(spark: SparkSession, path: String,
           columns: Seq[String]): Either[List[String], DataFrame] =
    SourcePreflight.check(spark, path) match {
      case Left(e) => Left(List(e))
      case Right(_) => peekShape(spark, path) match {
        case Left(e) => Left(List(e))
        case Right(_) =>
          val schema = StructType(
            columns.map(c => StructField(c, StringType, nullable = true)) :+
              StructField(CorruptCol, StringType, nullable = true))
          // Spark refuses corrupt-column-only queries on a raw JSON
          // scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache for the
          // probe, as its error message prescribes, then release: the
          // caller caches the clean projection for the run anyway.
          val df = spark.read
            .schema(schema)
            .option("multiLine", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CorruptCol)
            .json(path)
            .cache()
          try {
            val nCorrupt = df.filter(col(CorruptCol).isNotNull).count()
            if (nCorrupt > 0)
              Left(List(s"$path: $nCorrupt unparseable JSON record(s) — " +
                "file is malformed"))
            else Right(read(spark, path, columns))
          } finally df.unpersist()
      }
    }
}
