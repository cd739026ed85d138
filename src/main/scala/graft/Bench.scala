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
      // Split small local parquet files so scans use the cores — at
      // production scale files exceed 128 MB and split naturally; the
      // default would serialize whole-table scans onto one core at
      // bench SFs and measure single-thread throughput instead of the
      // plan.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the JVM/codegen/file-listing paths outside the timed region.
    Tables.lineitem(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()

    val results = headline.map { name =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune final
      // projections and eliminate trailing sorts, so a regression in a
      // select-only operator would never move the bench. The noop write
      // executes the COMPLETE plan and discards rows at the sink.
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (sec, ok)
    }
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", d)
    // Failed queries report -1 (not their fast-fail wall time): a broken
    // query must read as broken in the JSON, never as a speedup.
    val qJson = results.map { case (k, (sec, ok)) =>
      s""""$k":${if (ok) fmt(sec) else "-1"}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, (sec, true)) => sec }.sum
    val failed = results.collect { case (k, (_, false)) => s""""$k"""" }
    val failedJson =
      if (failed.isEmpty) "" else s""","failed":[${failed.mkString(",")}]"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qJson$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
