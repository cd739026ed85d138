package graft.engine.read

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def open(spark: SparkSession, path: String,
           columns: Seq[String]): Either[List[String], DataFrame] =
    SourcePreflight.check(spark, path) match {
      case Left(e) => Left(List(e))
      case Right(_) => peekShape(spark, path) match {
        case Left(e) => Left(List(e))
        case Right(_) => Right(read(spark, path, columns))
      }
    }
}
