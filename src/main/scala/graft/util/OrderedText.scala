package graft.util

import org.apache.spark.sql.DataFrame

/** Write a globally-ordered single text file WITHOUT a single-task
  * sort: `orderBy` range-partitions (each task sorts and writes its
  * own part file; global order = part-file order), then the driver
  * stream-concatenates the parts in name order through the Hadoop
  * FileSystem API — works on HDFS/S3 as well as local disk, and the
  * only single-stream step is the byte copy a one-file format itself
  * demands. Used by the ARPA export and the CDXJ writer.
  */
object OrderedText {

  /** `df` must have the sort columns plus a string column `line`;
    * writes the lines ordered by `sortCols` as ONE file at `path`.
    */
  def writeSorted(df: DataFrame, sortCols: Seq[String], path: String): Unit = {
    val spark = df.sparkSession
    val tmp = path + ".sortdir"
    df.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .select("line")
      .write.mode("overwrite").text(tmp)
    val hconf = spark.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = tmpPath.getFileSystem(hconf)
    val parts = fs.listStatus(tmpPath)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    require(parts.nonEmpty, s"no part files under $tmp")
    val dst = new org.apache.hadoop.fs.Path(path)
    val out = dst.getFileSystem(hconf).create(dst, true)
    try parts.foreach { p =>
      val in = fs.open(p.getPath)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 1 << 16, false)
      finally in.close()
    } finally out.close()
    fs.delete(tmpPath, true)
    ()
  }
}
