package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs EVERY SparkEntry query at
  * SPARK_GRAFT_SF_DIR (default sf0.1) on local[SPARK_GRAFT_CPUS] and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * All registered queries are timed (sorted by name, stable round over
  * round) so a regression in ANY operator — not just the headline
  * shapes — is visible in the per-round bench diff.
  */
object Bench {

  /** Every registered gate query, sorted for stable output order. */
  def headline: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the JVM/codegen/file-listing paths outside the timed region.
    Tables.lineitem(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()

    val qs = headline.filter(SparkEntry.queries.contains)
    val results = qs.map { name =>
      val t0 = System.nanoTime()
      val n =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (sec, n)
    }
    val qJson = results.map { case (k, (sec, _)) => s""""$k":${f"$sec%.3f"}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
