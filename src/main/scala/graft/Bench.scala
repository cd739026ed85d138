package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs EVERY SparkEntry query at
  * SPARK_GRAFT_SF_DIR (default sf0.1) on local[SPARK_GRAFT_CPUS] and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * All registered queries are timed (sorted by name, stable round over
  * round) so a regression in ANY operator — not just the headline
  * shapes — is visible in the per-round bench diff.
  *
  * Each query runs SPARK_GRAFT_BENCH_ITERS times (default 3) and
  * reports the per-query MEDIAN ("queries") and min ("queries_min"):
  * a single-run bench on a shared machine turns transient load into
  * phantom 3-5x regressions; the median of 3 is robust to one noisy
  * iteration while staying cheap enough for a per-round gate.
  * Iterations are interleaved (full pass 1, full pass 2, ...) rather
  * than back-to-back per query, so a load spike hurts one PASS, not
  * all 3 samples of the same query.
  */
object Bench {

  /** Every registered gate query, sorted for stable output order. */
  def headline: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Optional trailing args restrict the run to those queries (local
    * A/B iteration); the driver's no-arg invocation still times all.
    */
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
      // Let AQE size the output partitioning of CACHED plans by data
      // volume (advisoryPartitionSizeInBytes) instead of pinning the
      // static shuffle-partition count. Every persisted model/count
      // frame (LM counts, dedup signatures, LSH bands) is re-scanned
      // by several consumers; with the default (false) each scan pays
      // one task per static shuffle partition regardless of bytes —
      // at any scale the cache should hold advisory-sized partitions,
      // not cores-many. Measured on t48: 3349→483 tasks, saveArpa
      // 7.9→3.6 s warm; scale-adaptive by construction (byte-based).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the JVM/codegen/file-listing paths outside the timed region.
    Tables.lineitem(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)

    // One timed execution. noop sink, not count(): count() lets Catalyst
    // prune final projections and eliminate trailing sorts, so a
    // regression in a select-only operator would never move the bench.
    // The noop write executes the COMPLETE plan and discards rows at
    // the sink.
    def runOnce(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      // Label the query's jobs (guide §1.5) so a Spark UI / event-log
      // inspection of a bench run maps jobs back to gates. Thread-local,
      // cleared after the action; no effect on the timed work.
      spark.sparkContext.setJobDescription(s"bench: $name")
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      spark.sparkContext.setJobDescription(null)
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Between-gates block release, OUTSIDE the timed region (r17
      // verdict item 1): a gate's persisted frames are unpersisted by
      // the ops themselves, but localCheckpoint-backed results stay
      // pinned until the DRIVER happens to GC the RDD object — across
      // 279 gates × 3 passes ~35 truncated frames' blocks accumulate
      // in the one bench JVM (measured with the per-gate rdds= log
      // below). Production runs one job per query, so each query's
      // blocks die with its JVM; the sweep models that isolation.
      // Every gate recomputes from the parquet inputs either way — no
      // result ever survives the sweep, so no run can reuse another's
      // work (the caching ban holds).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (elapsed, ok)
    }

    // Interleaved passes: pass i runs every query once. Samples land in
    // samples(name) in pass order.
    val selected =
      if (args.isEmpty) headline
      else {
        val unknown = args.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        headline.filter(args.contains)
      }
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[(Double, Boolean)]](
      selected.map(_ -> Vector.empty[(Double, Boolean)]): _*)
    // Per-gate diagnostics (stderr only, OUTSIDE the timed region): the
    // r17 driver runs showed a 32-core-only slowdown on gates that run
    // right after persist-heavy ones — log per-gate seconds plus the
    // number of persistent RDDs and storage bytes still held so block
    // accumulation across the gate sequence is visible in the log.
    def blockStats(): (Int, Double) = {
      val sc = spark.sparkContext
      val used = org.apache.spark.graft.CheckpointShim.storageUsedBytes(sc)
      (sc.getPersistentRDDs.size, used / 1e6)
    }
    for (pass <- 1 to iters; name <- selected) {
      val r = runOnce(name)
      samples(name) = samples(name) :+ r
      val (nRdds, usedMb) = blockStats()
      System.err.println(
        f"[bench] $name%s pass=$pass sec=${r._1}%.3f rdds=$nRdds%d storageUsedMB=$usedMb%.1f")
      if (name == selected.last)
        System.err.println(s"[bench] pass $pass/$iters done")
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    val results = selected.map { name =>
      val runs = samples(name)
      val okRuns = runs.collect { case (sec, true) => sec }
      // A query is "ok" only if every iteration succeeded — a
      // sometimes-failing query must read as broken, never as fast.
      val ok = okRuns.length == runs.length
      val med = if (ok) median(okRuns) else -1.0
      val min = if (ok) okRuns.min else -1.0
      (name, med, min, ok)
    }
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", d)
    // Failed queries report -1 (not their fast-fail wall time): a broken
    // query must read as broken in the JSON, never as a speedup.
    val qJson = results.map { case (k, med, _, ok) =>
      s""""$k":${if (ok) fmt(med) else "-1"}""" }
      .mkString("{", ",", "}")
    val qMinJson = results.map { case (k, _, min, ok) =>
      s""""$k":${if (ok) fmt(min) else "-1"}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, med, _, true) => med }.sum
    val failed = results.collect { case (k, _, _, false) => s""""$k"""" }
    val failedJson =
      if (failed.isEmpty) "" else s""","failed":[${failed.mkString(",")}]"""
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qJson,"queries_min":$qMinJson,"iters":$iters$failedJson,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: the driver's stdout capture window can
    // truncate the tail of a 140-query JSON line, losing per-query
    // history for the round. The file is the durable copy.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
