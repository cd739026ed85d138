package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at
  * SPARK_GRAFT_SF_DIR (default sf0.1) on local[SPARK_GRAFT_CPUS] and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Headline set: the queries that exercise every heavy physical shape —
  * full-scan agg, shuffle join + broadcast dims, anti-join, window,
  * set ops, LSH band join, brute-force + IVF ANN, text scans — so the
  * number tracks engine throughput, not any single operator.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_pricing_agg", "q2_filter_project", "q3_segment_revenue",
    "j3_region_revenue", "j1_anti_pairing", "j2_left_join_missing",
    "w1_monotonic", "q8_topk_orders", "set_ops_users",
    "f_datetime_daily", "f_string_funcs",
    "p_standard_columns", "p5_label_bucket",
    "v1_typecheck_counts", "v3_date_ambiguity",
    "d1_dedup_exact", "d2_fingerprint_dedup", "d3_minhash_lsh",
    "d6_embedding_neardup", "ann_brute_topk", "ann_ivf_topk",
    "t2_quality", "t3_token_counts", "m1_binary_meta")

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
