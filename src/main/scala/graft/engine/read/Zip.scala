package graft.engine.read

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP archive source — the [[Tar]] shape over the other dominant
  * corpus container (dataset releases, scraped site exports, code
  * dumps). The walk is the engine's one shared capped
  * [[ZipRead.entries]] (total-bytes + entry-count bomb caps, torn
  * archives → None), so a .zip column and a .zip file behave
  * identically to the document containers built on it.
  *
  * Note [[DocumentProbe]] deliberately CLASSIFIES a plain zip without
  * extracting (an archive is many documents, not one); this source is
  * the explode that turns it into per-member rows, which then route
  * through `document_format`/`document_text` like any crawl column.
  */
object Zip {

  val DefaultMaxTotalBytes: Long = 1L << 30
  val DefaultMaxEntries: Int = 100000

  /** Archive glob → one row per member:
    * `(archive, member, size, content)`. One binaryFile scan + one
    * kernel explode — no shuffle, no driver-side anything.
    */
  def members(spark: SparkSession, pathGlob: String,
              maxTotalBytes: Long = DefaultMaxTotalBytes,
              maxEntries: Int = DefaultMaxEntries): DataFrame = {
    val explode0 = udf { (bytes: Array[Byte]) =>
      ZipRead.entries(bytes, maxTotalBytes, maxEntries)
        .map(_.toSeq.sortBy(_._1)
          .map { case (n, b) => (n, b.length.toLong, b) })
        .getOrElse(Seq.empty)
    }
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path").as("archive"),
        explode(explode0(col("content"))).as("m"))
      .select(col("archive"), col("m._1").as("member"),
        col("m._2").as("size"), col("m._3").as("content"))
  }

  /** Streaming twin of [[members]]: new archives landing in `dir`
    * explode through the same capped walk — the live dataset-release
    * drop-box shape.
    */
  def stream(spark: SparkSession, dir: String,
             maxTotalBytes: Long = DefaultMaxTotalBytes,
             maxEntries: Int = DefaultMaxEntries,
             maxFilesPerTrigger: Int = 100): DataFrame = {
    val explode0 = udf { (bytes: Array[Byte]) =>
      ZipRead.entries(bytes, maxTotalBytes, maxEntries)
        .map(_.toSeq.sortBy(_._1)
          .map { case (n, b) => (n, b.length.toLong, b) })
        .getOrElse(Seq.empty)
    }
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("path").as("archive"),
        explode(explode0(col("content"))).as("m"))
      .select(col("archive"), col("m._1").as("member"),
        col("m._2").as("size"), col("m._3").as("content"))
  }

  private val membersUdf = udf { (bytes: Array[Byte]) =>
    ZipRead.entries(bytes, DefaultMaxTotalBytes, DefaultMaxEntries)
      .map(_.toSeq.sortBy(_._1)
        .map { case (n, b) => (n, b.length.toLong, b) })
  }

  /** Members as an array column over raw archive bytes; NULL when not
    * a ZIP.
    */
  def membersCol(bytesCol: Column): Column = membersUdf(bytesCol)
}
