package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** sf1 scale-regression gate: run the heaviest gate queries against a
  * 10× replica of sf0.1 (built by [[ScaleData]] on first use) and
  * trip RED on ≥ 30% per-query regression vs the recorded baseline —
  * promoting the ad-hoc sf1 tail runs into a repeatable check, so a
  * scale regression (a new shuffle, a lost pushdown, a skew cliff)
  * surfaces as a failing run, not as judge archaeology.
  *
  * Usage: `runMain graft.tools.BenchSf1 [--rebaseline]`.
  * Writes `BENCH_sf1.json`; compares against `BENCH_sf1_baseline.json`
  * when present (exit 1 on regression), records it when absent or on
  * `--rebaseline`. Baselines are machine-local: re-baseline after a
  * hardware change, never to silence a regression.
  */
object BenchSf1 {

  /** The heavy tail of bench_last.json plus the scale-shape-sensitive
    * dedup kernels — the queries whose plans have the most room to
    * regress super-linearly.
    *
    * Membership rule: >1.5 s at sf0.1 AND sf-dependent. Fixture-local
    * gates are excluded however slow — `m26_subtitle_curation`
    * (~2 s at any SF: nine-stage pipeline overhead over six authored
    * docs) carries no scale signal; its machinery already scales
    * under `pipe1_golden` here. One deliberate exception:
    * `m64_document_corpus` is FAST (~1 s at sf1) but is the document
    * layer's only sf-dependent gate — it rides here so extraction +
    * round-trip + dup structure carry a tripwired 10× number at all.
    */
  val Heavy: Seq[String] = Seq(
    "g1_pagerank", "t53_kn5_roundtrip", "t48_arpa_roundtrip",
    "pipe1_golden", "d17_keep_representative", "t35_kn3",
    "ann_ivfpq_topk", "g2_degree_stats", "d11_embedding_against",
    "d8_dup_groups", "t30_train_classifier", "c18_ppl_buckets",
    "t52_bm25_index", "s17_cdx_write", "t32_kneser_ney",
    "d6_embedding_neardup", "d20_minhash_oph", "d3_minhash_lsh",
    "d5_ngram_jaccard",
    // r15: the document layer's measured sf1 point — render + probe +
    // round-trip + dup structure over the full documents table (the
    // r13/r14 centerpiece finally has a 10× number)
    "m64_document_corpus",
    // r16: the archive + decryption classes' sf1 point — per-row
    // archive render -> memberInventories explosion, with a bounded
    // blank-password OffCrypto slice (the 50k-spin verify bill)
    "m72_archive_corpus",
    // r16: the image layer's sf1 point — real PNG encode + decode +
    // dHash + stats per row over the full documents table
    "m80_image_corpus",
    // r17: the PDF-image kernel's sf1 point — per-row PDF build +
    // XObject walk + Flate/CCITT-G4 decode + lossless PNG re-encode
    // + dHash + stats (the m69 class, 10x-scaled)
    "m85_pdf_image_corpus")

  private val resultPath = "/root/repo/BENCH_sf1.json"
  private val baselinePath = "/root/repo/BENCH_sf1_baseline.json"

  def main(args: Array[String]): Unit = {
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val rebaseline = args.contains("--rebaseline")
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(sf1Dir, "documents.parquet"))) {
      println(s"[bench-sf1] building the 10x replica at $sf1Dir ...")
      ScaleData.main(Array("/root/testdata/sf0.1", sf1Dir, "10"))
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-sf1")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.Tables.lineitem(spark, sf1Dir).count()
    graft.Tables.documents(spark, sf1Dir).count()
    graft.Tables.embeddings(spark, sf1Dir).count()

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // positional args = subset mode (local re-checks of flagged
    // queries): results go to a side file, baseline never updates
    val only = args.filterNot(_.startsWith("--")).toSet
    val subsetMode = only.nonEmpty
    val known = Heavy.filter(SparkEntry.queries.contains)
      .filter(n => only.isEmpty || only.contains(n))
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to iters; name <- known) {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sf1Dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench-sf1] $name failed: ${e.getMessage}")
      }
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val med = known.map(n => n -> median(samples(n))).toMap
    val json = known.map(n => s""""$n":${f"${med(n)}%.3f"}""")
      .mkString("{\"sf\":\"sf1(10x-sf0.1)\",\"queries\":{", ",", "}}")
    val outPath = if (subsetMode) resultPath + ".subset" else resultPath
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"[bench-sf1] wrote $outPath")

    val basePath = java.nio.file.Paths.get(baselinePath)
    if (subsetMode && !java.nio.file.Files.exists(basePath)) {
      // nothing to compare against and subset runs never record one
      println(s"[bench-sf1] no baseline at $baselinePath — subset " +
        "timings written, comparison skipped")
      spark.stop()
      return
    }
    if (!subsetMode && (rebaseline || !java.nio.file.Files.exists(basePath))) {
      java.nio.file.Files.write(basePath, json.getBytes("UTF-8"))
      println(s"[bench-sf1] baseline recorded at $baselinePath")
      spark.stop()
      return
    }
    // minimal parse of our own flat baseline format
    val baseText = new String(java.nio.file.Files.readAllBytes(basePath), "UTF-8")
    val entry = "\"([A-Za-z0-9_]+)\":([0-9.]+)".r
    val base = entry.findAllMatchIn(baseText)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    var flagged = 0
    known.foreach { n =>
      base.get(n).foreach { b =>
        val r = med(n) / b
        val verdict =
          if (med(n) > b * 1.3 && med(n) - b > 0.5) { flagged += 1; "REGRESS" }
          else "ok"
        println(f"[bench-sf1] $verdict%-7s $n%-28s base=$b%7.2fs now=${med(n)}%7.2fs x$r%.2f")
      }
    }
    println(s"[bench-sf1] ${known.size} queries, $flagged regressed (>1.3x and >0.5s)")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
