package graft.engine.read

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** SRC_PATH existence preflight (SURVEY.md §2.3 V17,
  * `validators/src_path_validator.py`): a missing or non-file source
  * must surface as a STRUCTURED config/validation error (CLI exit 2),
  * never as a raw FileNotFoundException stack trace out of the first
  * reader preflight that happens to touch the path.
  */
object SourcePreflight {
  def check(spark: SparkSession, path: String): Either[String, Unit] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Left(s"Source path not found: $path")
    else if (fs.getFileStatus(p).isDirectory)
      Left(s"Source path is a directory, expected a manifest file: $path")
    else Right(())
  }
}
