package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 200L).map(i => (i, s"doc number $i")).toDF("id", "text")

  test("withSplit: deterministic, disjoint, stable under reordering and growth") {
    val s1 = Curation.withSplit(docs, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    // re-run over a shuffled, grown frame: every original id keeps its split
    val grown = (1L to 400L).map(i => (i, s"doc number $i")).toDF("id", "text")
      .orderBy(rand(42))
    val s2 = Curation.withSplit(grown, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, split) => s2(id) == split })
    // rough proportions at n=400 (hash-uniform: train ≈ 80%)
    val trainN = s2.values.count(_ == "train")
    assert(trainN > 280 && trainN < 360, s"train=$trainN of 400")
    assert(s2.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("withSplit rejects nonsense percentages") {
    intercept[IllegalArgumentException] {
      Curation.withSplit(docs, "id", trainPct = 90, valPct = 10)
    }
  }

  test("samplePerStratum: exactly k per stratum, deterministic, stable under growth") {
    val strat = docs.withColumn("g", (col("id") % 4).cast("string"))
    val sampled = Curation.samplePerStratum(strat, "g", "id", k = 3)
      .select("g", "id").as[(String, Long)].collect()
    assert(sampled.groupBy(_._1).forall(_._2.length == 3))
    // deterministic: identical re-run, identical sample
    val again = Curation.samplePerStratum(strat, "g", "id", k = 3)
      .select("g", "id").as[(String, Long)].collect()
    assert(sampled.toSet == again.toSet)
    // GROWTH stability: new rows can only DISPLACE sample members, never
    // promote a previously-losing old row — so any old id in the grown
    // sample must already have been in the original sample.
    val grown = (1L to 400L).map(i => (i, s"doc number $i")).toDF("id", "text")
      .withColumn("g", (col("id") % 4).cast("string"))
    val grownSample = Curation.samplePerStratum(grown, "g", "id", k = 3)
      .select("g", "id").as[(String, Long)].collect().toSet
    val oldSurvivors = grownSample.filter(_._2 <= 200L)
    assert(oldSurvivors.subsetOf(sampled.toSet),
      s"old rows entered the sample only by displacement: $oldSurvivors")
  }

  test("samplePerStratum excludes null ids; withSplit gives unkeyable rows a NULL split") {
    val withNulls = Seq((Some(1L), "a"), (None, "a"), (Some(2L), "a"))
      .toDF("id", "g")
    val s = Curation.samplePerStratum(withNulls, "g", "id", k = 5)
      .select("id").as[Long].collect().toSet
    assert(s == Set(1L, 2L)) // the null id cannot claim a slot
    val split = Curation.withSplit(
      Seq((Some("x1"), 1), (None, 2), (Some("  "), 3)).toDF("key", "v"), "key")
      .select("v", "split").as[(Int, Option[String])].collect().toMap
    assert(split(1).isDefined)
    assert(split(2).isEmpty && split(3).isEmpty) // null/blank → NULL split
  }

  test("samplePerStratum keeps a NULL stratum as its own partition") {
    val withNullStratum = Seq((1L, Some("a")), (2L, None), (3L, None),
      (4L, Some("a"))).toDF("id", "g")
    val s = Curation.samplePerStratum(withNullStratum, "g", "id", k = 1)
    assert(s.count() == 2) // one winner for "a", one for the NULL stratum
    assert(s.filter(col("g").isNull).count() == 1)
  }

  test("repetitionFeatures: doubled text scores high, distinct text near zero, edges at zero") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "all words here are fully distinct tokens"),
      (2L, "spam spam spam spam spam spam"),
      (3L, "one two one two one two one two"),
      (4L, "single"),
      (5L, null.asInstanceOf[String]),
      (6L, "")).toDF("id", "text")
    val out = TextAnalysis.repetitionFeatures(col("text"), ngram = 2)
      .foldLeft(docs) { case (df, (n, e)) => df.withColumn(n, e) }
      .select("id", "tok_n", "tok_repeat_ratio", "dup_ngram_ratio")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 0.0 && out(1L)._4 == 0.0) // fully distinct
    assert(out(2L)._3 > 0.8 && out(2L)._4 > 0.7)   // one repeated token
    assert(out(3L)._4 > 0.7)                        // looped bigram
    assert(out(4L)._2 == 1L && out(4L)._4 == 0.0)   // too short for bigrams
    assert(out(5L)._2 == 0L && out(5L)._3 == 0.0)   // null text = empty
    assert(out(6L)._2 == 0L && out(6L)._4 == 0.0)   // empty text
  }

  test("contaminatedBy flags docs sharing probe n-grams, counts distinct shingle hits") {
    val corpus = Seq(
      (1L, "the secret benchmark answer is forty two exactly"),
      (2L, "the secret benchmark answer appears here too"),
      (3L, "completely unrelated content with no overlap at all"),
      (4L, "another clean document about spark plans")).toDF("id", "text")
    val probes = Seq("the secret benchmark answer is forty two exactly").toDF("ptext")
    val hits = Curation.contaminatedBy(corpus, "id", "text", probes, "ptext")
      .as[(Long, Long)].collect().toMap
    assert(hits(1L) == 6L) // the probe itself: all 6 of its 3-grams hit
    assert(hits(2L) == 2L) // shares "the secret benchmark", "secret benchmark answer"
    assert(!hits.contains(3L) && !hits.contains(4L))
    // Output/reserved name collisions fail loudly, like contaminationScore's.
    for (bad <- Seq("n_hits", "__h"))
      intercept[IllegalArgumentException](Curation.contaminatedBy(
        corpus.withColumnRenamed("id", bad), bad, "text", probes, "ptext"))

    // Graded form: every doc gets a fraction, clean docs score 0.0.
    val scored = Curation.contaminationScore(corpus, "id", "text",
        probes, "ptext")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(scored(1L) == ((6L, 6L, 1.0))) // the probe itself: fully contaminated
    assert(scored(2L) == ((5L, 2L, round6(2.0 / 5)))) // 7 tokens → 5 trigrams
    assert(scored(3L) == ((6L, 0L, 0.0))) // 8 tokens → 6 trigrams
    assert(scored(4L) == ((4L, 0L, 0.0)))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("redactPii replaces emails, phones and IPs; counts match") {
    val df = Seq(
      "write to alice.smith+x@corp.example.org today",
      "call +1-555-0100-123 or +44-207-946-0958 now",
      "server 10.0.0.7 and 192.168.1.254 up",
      "nothing sensitive here").toDF("t")
    val out = df.select(Curation.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "write to [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE] now")
    assert(out(2) == "server [IP] and [IP] up")
    assert(out(3) == "nothing sensitive here")
    val counts = Curation.piiCounts(col("t"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .agg(sum("n_emails"), sum("n_phones"), sum("n_ipv4"))
      .as[(Long, Long, Long)].head()
    assert(counts == ((1L, 2L, 2L)))
  }

  test("filterByQualityQuantile keeps per-group rows at/above the exact quantile") {
    val df = Seq(("en", 1.0), ("en", 2.0), ("en", 3.0), ("en", 4.0),
      ("de", 10.0), ("de", 20.0)).toDF("lang", "score")
    val kept = Curation.filterByQualityQuantile(df, "score", Seq("lang"), 0.5)
      .as[(String, Double)].collect().toSet
    // en: quantile_cont(0.5) = 2.5 -> keep 3,4; de: 15 -> keep 20
    assert(kept == Set(("en", 3.0), ("en", 4.0), ("de", 20.0)))
    // schema passes through untouched
    assert(Curation.filterByQualityQuantile(df, "score", Seq("lang"), 0.5)
      .columns.toSeq == Seq("lang", "score"))
  }

  test("filterByQualityQuantile: NULL group is its own stratum; NULL scores drop") {
    val df = Seq((Option.empty[String], Some(1.0)), (Option.empty[String], Some(3.0)),
      (Some("en"), Some(5.0)), (Some("en"), Option.empty[Double]))
      .toDF("lang", "score")
    val kept = Curation.filterByQualityQuantile(df, "score", Seq("lang"), 0.5)
      .as[(Option[String], Option[Double])].collect().toSet
    // null-lang stratum median = 2.0 -> keeps 3.0; en median over the
    // single non-null score = 5.0 -> keeps it; the null score cannot rank
    assert(kept == Set((None, Some(3.0)), (Some("en"), Some(5.0))))
  }

  test("capPerGroup: keeps the k best per group by (score desc, id asc)") {
    val df = Seq(
      (1L, "a", 10), (2L, "a", 30), (3L, "a", 20), (4L, "a", 30), // tie: 2 < 4
      (5L, "b", 5),
      (6L, null.asInstanceOf[String], 7), (7L, null.asInstanceOf[String], 9))
      .toDF("id", "g", "score")
    val kept = Curation.capPerGroup(df, Seq("g"), "score", "id", k = 2)
      .select("g", "id").as[(Option[String], Long)].collect().toSet
    assert(kept == Set(
      (Some("a"), 2L), (Some("a"), 4L), // the two score-30 rows, ids 2 and 4
      (Some("b"), 5L),
      (None, 7L), (None, 6L)))          // NULL group is its own group
    assert(Curation.capPerGroup(df, Seq("g"), "score", "id", 2)
      .columns.toSeq == df.columns.toSeq) // schema preserved
  }

  test("capPerGroup: drops unrankable rows, never plans a window") {
    val df = Seq(
      (Some(1L), "a", Some(10)), (Some(2L), "a", None),
      (None, "a", Some(99))).toDF("id", "g", "score")
    val out = Curation.capPerGroup(df, Seq("g"), "score", "id", k = 5)
    assert(out.select("id").as[Option[Long]].collect().toSeq == Seq(Some(1L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"capPerGroup must stay a bounded two-phase aggregate:\n$plan")
  }

  test("tfidf: known frequencies on a crafted corpus") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, null.asInstanceOf[String])) // counts toward N, no terms
      .toDF("id", "text")
    val out = TextAnalysis.tfidf(df, "id", "text")
      .select("id", "term", "tf", "n_docs_with_term", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // Spark's log() codegen delegates to StrictMath.log, which may be
    // 1 ulp from Math.log — compare within tolerance (the t8 gate
    // rounds to 4 dp for exactly this reason).
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(out((1L, "apple"))._1 == 2L)
    assert(out((1L, "apple"))._2 == 1L)
    assert(close(out((1L, "apple"))._3, 2 * math.log(3.0 / 1)))
    assert(out((1L, "banana"))._1 == 1L)
    assert(out((1L, "banana"))._2 == 2L) // banana in docs 1 and 2
    assert(close(out((2L, "cherry"))._3, math.log(3.0 / 1)))
    assert(out.size == 4) // (1,apple) (1,banana) (2,banana) (2,cherry)
    // a term in every doc-with-text still has idf ln(3/2) > 0: N counts
    // the NULL-text doc too
    assert(close(out((2L, "banana"))._3, math.log(3.0 / 2)))
  }

  test("dropUbiquitousTokens: df-threshold drop, order preserved, edge docs") {
    val df = Seq(
      (1L, "the cat sat the mat"),   // "the" in 3/4 docs (75%) → dropped
      (2L, "the dog ran"),
      (3L, "the end"),
      (4L, "cat alone"),             // "cat" in 2/4 (50%) → kept at 0.5
      (5L, null.asInstanceOf[String])) // counts toward N, empty output
      .toDF("id", "text")
    val out = TextAnalysis.dropUbiquitousTokens(df, "id", "text", 0.5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // N = 5 (NULL-text doc counts); "the" df=3 > 2.5 → dropped everywhere
    assert(out(1L) == (("cat sat mat", 5L, 3L))) // order preserved
    assert(out(2L) == (("dog ran", 3L, 2L)))
    assert(out(3L) == (("end", 2L, 1L)))
    assert(out(4L) == (("cat alone", 2L, 2L)))   // cat at exactly 40% stays
    assert(out(5L) == (("", 0L, 0L)))            // NULL → empty, zero counts
    // a doc whose every token is ubiquitous reconstructs to "" (the
    // DuckDB oracle needs coalesce: array_to_string([]) is NULL there)
    val all = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("id", "text")
    val emptied = TextAnalysis.dropUbiquitousTokens(all, "id", "text", 0.5)
      .as[(Long, String, Long, Long)].collect()
    assert(emptied.forall { case (_, t, b, a) => t == "" && b == 1 && a == 0 })
  }

  test("chunkDocuments: stride windows with overlap; empty/NULL yield no chunks") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "short"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = TextAnalysis.chunkDocuments(df, "text", chunkTokens = 4, overlap = 1)
      .select("id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect().sortBy(r => (r._1, r._2))
    // NO chunk after one reaches the end: a start at 9 would emit
    // "t10", a strict suffix of chunk 2 — text the chunker itself
    // would be duplicating.
    assert(out.toSeq == Seq(
      (1L, 0, 4L, "t1 t2 t3 t4"),
      (1L, 1, 4L, "t4 t5 t6 t7"),
      (1L, 2, 4L, "t7 t8 t9 t10"),
      (2L, 0, 1L, "short")))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "text", chunkTokens = 4, overlap = 4)
    }
  }

  test("capPerGroup ranks Long.MinValue scores without overflow") {
    // unary minus on Long.MinValue throws under ANSI; the bitwise-NOT
    // descending map must rank it LAST, not kill the job or rank first
    val df = Seq((1L, "g", 5L), (2L, "g", Long.MinValue), (3L, "g", 7L))
      .toDF("id", "g", "score")
    val kept = Curation.capPerGroup(df, Seq("g"), "score", "id", 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // the MinValue row is the worst, capped out
  }

  test("languageId: NULL text is unknown; qualityFeatures never NaN") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "the cat of the hat and")).toDF("id", "text")
    val lang = df.withColumn("l", TextAnalysis.languageId(col("text")))
      .select("id", "l").as[(Long, String)].collect().toMap
    assert(lang(1L) == "unknown" && lang(2L) == "unknown")
    assert(lang(4L) == "en")
    val feats = TextAnalysis.qualityFeatures(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val bad = feats.filter(
      isnan(col("punct_ratio")) || isnan(col("digit_ratio")) ||
        isnan(col("stop_ratio")) || isnan(col("avg_tok_len"))).count()
    assert(bad == 0) // degenerate docs measure 0.0, never NaN
  }

  test("charEntropy: known distributions, code-point counting, empty → zero") {
    val df = Seq(
      (1L, "aabb"),       // two chars × 2 → ln 2
      (2L, "aaaa"),       // one char → 0
      (3L, "😀😀"),       // surrogate pair counts ONCE per emoji
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = TextAnalysis.charEntropy(df, "id", "text")
      .select("id", "n_cp", "entropy")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(out(1L)._1 == 4L && close(out(1L)._2, math.log(2)))
    assert(out(2L) == ((4L, 0.0)))
    assert(out(3L) == ((2L, 0.0))) // 2 code points, both identical
    assert(out(4L) == ((0L, 0.0)))
    assert(out(5L) == ((0L, 0.0)))
  }

  test("packSequences: contiguous fill per shard, long docs span, null ids drop") {
    val df = Seq(
      (1L, "s1", 800L), (2L, "s1", 800L),  // pack 0 (cum_before 0, 800)
      (3L, "s1", 900L),                    // cum_before 1600 → pack 0
      (4L, "s1", 100L),                    // cum_before 2500 → pack 1
      (5L, "s1", 5000L),                   // cum_before 2600 → pack 1 (spans)
      (6L, "s1", 10L),                     // cum_before 7600 → pack 3
      (7L, "s2", 10L))                     // other shard restarts at pack 0
      .toDF("id", "shard", "w")
    val out = Curation.packSequences(df, "shard", "id", "w", capacity = 2000L)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L,
      6L -> 3L, 7L -> 0L))
    val withNull = df.unionByName(
      Seq((Option.empty[Long], "s1", 1L)).toDF("id", "shard", "w"))
    assert(Curation.packSequences(withNull, "shard", "id", "w", 2000L)
      .count() == 7) // null id dropped, not packed nondeterministically
  }

  test("winsorize clamps to the per-group percentile band; NULLs pass through") {
    // group g: values 1..10 → p10 = 1.9, p90 = 9.1 (linear interpolation)
    val df = ((1 to 10).map(i => (i.toLong, "g", Some(i.toDouble))) :+
      (11L, "g", Option.empty[Double]) :+
      (12L, "h", Some(100.0))) // singleton group: lo = hi = 100
      .toDF("id", "grp", "v")
    val out = Curation.winsorize(df, "v", Seq("grp"), 0.1, 0.9)
      .select("id", "v_winsorized").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.9) && out(2L).contains(2.0))
    assert(out(9L).contains(9.0) && out(10L).contains(9.1))
    assert(out(11L).isEmpty)       // NULL value stays NULL
    assert(out(12L).contains(100.0))
    intercept[IllegalArgumentException] {
      Curation.winsorize(df, "v", Seq("grp"), 0.9, 0.1)
    }
  }

  test("bigramLogProb: add-one smoothed corpus model on known counts") {
    val df = Seq(
      (1L, "a b a b"), // bigrams (a,b) (b,a) (a,b)
      (2L, "a b"),     // bigram (a,b)
      (3L, "x"))       // single token → no row
      .toDF("id", "text")
    val out = TextAnalysis.bigramLogProb(df, "id", "text")
      .select("id", "n_bigrams", "lm_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // corpus: c(a,b)=3 c(b,a)=1, c(a·)=3 c(b·)=1, V=2
    val pab = math.log(4.0 / 5)  // (3+1)/(3+2)
    val pba = math.log(2.0 / 3)  // (1+1)/(1+2)
    assert(out(1L)._1 == 3L && close(out(1L)._2, (2 * pab + pba) / 3))
    assert(out(2L)._1 == 1L && close(out(2L)._2, pab))
    assert(!out.contains(3L))
  }

  test("weightedSample: deterministic, weight-biased, stable under reorder") {
    val df = (1L to 100L).map(i =>
      (i, if (i == 50L) 100000.0 else 1.0)).toDF("id", "w")
    val s1 = Curation.weightedSample(df, "id", "w", k = 3)
      .select("id").as[Long].collect().toSet
    assert(s1.size == 3)
    // weight 100000 vs 1: u^(1/w) ≈ 1 for id 50 — it wins its slot
    // (deterministic: u values are fixed by sha256, so this never flakes)
    assert(s1.contains(50L))
    // identical sample from a shuffled frame
    val s2 = Curation.weightedSample(df.orderBy(rand(7)), "id", "w", 3)
      .select("id").as[Long].collect().toSet
    assert(s2 == s1)
    // k >= n keeps every weighted row; zero/null weights drop
    val withBad = df.unionByName(Seq((101L, 0.0)).toDF("id", "w"))
      .unionByName(Seq((102L, Option.empty[Double])).toDF("id", "w"))
    assert(Curation.weightedSample(withBad, "id", "w", 1000).count() == 100)
  }

  test("gopherLineFeatures: known values on crafted lines; NULL measures as zeros") {
    val df = Seq(
      (1L, Some("plain line\n- bullet one\n  * bullet two\nends with...")),
      (2L, Some("no markers here")),
      (3L, Option.empty[String]),
      (4L, Some("tags # and # more...")))
      .toDF("id", "text")
    val out = TextAnalysis.gopherLineFeatures(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .select("id", "n_lines", "bullet_line_ratio", "ellipsis_line_ratio",
        "mean_word_len", "symbol_word_ratio")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 4)
    assert(r1.getDouble(2) == 0.5)  // 2 of 4 lines are bullets
    assert(r1.getDouble(3) == 0.25) // 1 of 4 lines ends with ...
    val r3 = out(3L)
    assert(r3.getLong(1) == 0 && r3.getDouble(4) == 0.0)
    val r4 = out(4L)
    // "tags # and # more..." -> 5 tokens; symbols = 2 '#' + 1 '...'
    assert(r4.getDouble(5) == 3.0 / 5.0)
    // mean word length of "no markers here" = 13 chars / 3 tokens
    assert(out(2L).getDouble(4) == 13.0 / 3.0)
  }

  test("capPerGroup carries non-orderable payload columns (maps)") {
    // Only (score, id) is compared; the payload is opaque cargo — a
    // MapType column must ride through (it would fail analysis if the
    // sort key embedded the full payload struct).
    val df = Seq(
      (1L, "a", 10, Map("k" -> "v1")),
      (2L, "a", 20, Map("k" -> "v2")),
      (3L, "a", 30, Map("k" -> "v3")),
      (4L, "b", 5, Map("k" -> "v4")))
      .toDF("id", "g", "score", "meta")
    val out = Curation.capPerGroup(df, Seq("g"), "score", "id", k = 2)
      .select("id", "meta").as[(Long, Map[String, String])]
      .collect().toMap
    assert(out.keySet == Set(2L, 3L, 4L))
    assert(out(3L) == Map("k" -> "v3")) // payload intact
  }

  test("capPerGroup buffer is bounded: exact across partitions, no collect_list") {
    // 10k rows of ONE group spread over many partitions: the bounded
    // heap keeps ≤k per partition at the partial stage and the result
    // is still the exact global top-k (it is contained in the union of
    // per-partition top-k).
    val df = spark.range(0, 10000).repartition(32)
      .selectExpr("id", "'hot' as g", "cast(id % 1000 as int) as score")
    val out = Curation.capPerGroup(df, Seq("g"), "score", "id", k = 3)
      .select("id").as[Long].collect().toSet
    // score = id % 1000; max score 999 at ids 999, 1999, ..., 9999 —
    // ties on score break by id ASC.
    assert(out == Set(999L, 1999L, 2999L))
    val plan = Curation.capPerGroup(df, Seq("g"), "score", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bounded_top_k"),
      s"expected the bounded top-k aggregate:\n$plan")
    assert(!plan.contains("collect_list"),
      s"collect_list buffers the whole (group × partition) cell:\n$plan")
  }

  test("takeTokenBudget: sha-order prefix, exact against a driver reference") {
    import java.security.MessageDigest
    def sha(s: String): String =
      MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (1L to 200L).map(i => (i, (i % 17 + 1).toInt))
    // Driver reference: same (sha256(id), id) order, same inclusive rule.
    def reference(budget: Long): Set[Long] = {
      var acc = 0L
      rows.sortBy { case (id, _) => (sha(id.toString), id) }
        .takeWhile { case (_, n) => { acc += n; acc <= budget } }
        .map(_._1).toSet
    }
    val df = rows.toDF("id", "n_tok").repartition(7) // layout-independent
    for (budget <- Seq(0L, 100L, 777L, 10000L)) {
      val kept = Curation.takeTokenBudget(df, "id", "n_tok", budget,
        prefixHexDigits = 1) // 16 buckets: exercises the base offsets
        .select("id").as[Long].collect().toSet
      assert(kept == reference(budget), s"budget=$budget")
    }
    // Full budget keeps everything; prefix monotonicity.
    assert(Curation.takeTokenBudget(df, "id", "n_tok", Long.MaxValue / 2)
      .count() == 200)
    assert(reference(100L).subsetOf(reference(777L)))
    // 6+ hex digits would allow a multi-GB driver bucket-sum collect
    // (and 8+ would overflow the Int bucket cast) — rejected at the
    // API, not discovered as a driver OOM / NULL buckets mid-job.
    for (d <- Seq(6, 8))
      intercept[IllegalArgumentException](
        Curation.takeTokenBudget(df, "id", "n_tok", 100L,
          prefixHexDigits = d))
    // Every internal name is guarded — a user '__graft_cum' column
    // would otherwise be silently overwritten by the running sum.
    intercept[IllegalArgumentException](
      Curation.takeTokenBudget(df.withColumn("__graft_cum", lit(1)),
        "id", "n_tok", 100L))
  }

  test("takeTokenBudget: NULL ids drop, NULL token counts weigh zero") {
    val df = Seq(
      (Option(1L), Option(5)), (Option(2L), None),
      (Option.empty[Long], Option(50)), (Option(3L), Option(5)))
      .toDF("id", "n_tok")
    val all = Curation.takeTokenBudget(df, "id", "n_tok", 1000L)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L)) // null id gone, null count kept free
    val plan = Curation.takeTokenBudget(df, "id", "n_tok", 10L)
      .queryExecution.executedPlan.toString
    // The window must be per-bucket, never a global single-partition sort.
    assert(plan.contains("Window"))
    assert(!plan.contains("Window [") ||
      plan.contains("__graft_bkt"), s"expected bucket-partitioned window:\n$plan")
  }

  test("encodingQualityFeatures: known damage counts, clean text is zero") {
    val docs = Seq(
      (1L, "clean plain text"),
      (2L, "cafÃ©"),            // one mojibake pair in 5 chars
      (3L, "a�b�c"),            // two replacement chars in 5
      (4L, "xy"),             // C0 + C1 controls in 4
      (5L, "tab\tand\nnewline ok"),       // \t \n are NOT damage
      (6L, ""), (7L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = TextAnalysis.encodingQualityFeatures(col("text"))
      .foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }
      .select("id", "replacement_char_ratio", "control_char_ratio",
        "mojibake_ratio")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((0.0, 0.0, 0.0)))
    assert(out(2L) == ((0.0, 0.0, 1.0 / 5)))
    assert(out(3L) == ((2.0 / 5, 0.0, 0.0)))
    assert(out(4L) == ((0.0, 2.0 / 4, 0.0)))
    assert(out(5L) == ((0.0, 0.0, 0.0)))
    assert(out(6L) == ((0.0, 0.0, 0.0)))
    assert(out(7L) == ((0.0, 0.0, 0.0)))
  }

  test("mixReweight: binding group kept whole, mix ratio, drops, determinism") {
    // web:code = 1:1 targets over 400 web / 100 code rows → code is the
    // binding group (100/1 < 400/1): code keeps all 100, web threshold
    // = floor(100*1*10000/(1*400)) = 2500 → ~25% of web kept.
    val rows = (1 to 400).map(i => (i.toLong, "web")) ++
      (401 to 500).map(i => (i.toLong, "code")) ++
      (501 to 520).map(i => (i.toLong, "junk")) ++ // not in targets
      Seq((0L, null.asInstanceOf[String]))         // null group
    val df = rows.toDF("id", "src")
    val out = Curation.mixReweight(df, "src", "id",
      Map("web" -> 1, "code" -> 1))
    val byGroup = out.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(byGroup("code") == 100L, s"binding group must keep all: $byGroup")
    assert(!byGroup.contains("junk") && !byGroup.contains(null))
    // ~25% of 400 web rows under hash uniformity; bound loosely.
    assert(byGroup("web") > 50 && byGroup("web") < 150, s"web: $byGroup")
    // Determinism: same kept ids regardless of input order/partitioning.
    val shuffled = df.orderBy(rand(7)).repartition(7)
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Curation.mixReweight(shuffled, "src", "id",
      Map("web" -> 1, "code" -> 1)).select("id").as[Long].collect()
      .sorted.toSeq
    assert(a == b)
    // A targeted-but-empty group is ignored, not mix-forcing.
    val c = Curation.mixReweight(df, "src", "id",
      Map("web" -> 1, "absent" -> 99)).groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(c("web") == 400L, s"sole present group keeps all rows: $c")
    // Null id (hash sentinel) is dropped even in a kept group.
    val d = Seq((Option.empty[Long], "web"), (Some(1L), "web"))
      .toDF("id", "src")
    assert(Curation.mixReweight(d, "src", "id", Map("web" -> 1))
      .count() == 1L)
  }

  test("mixReweight: unkeyable rows don't inflate a group's supply") {
    // web: 200 keyable + 200 NULL-id rows; code: 100 keyable. With
    // counts over ALL rows, web would look 2x its usable size, both
    // thresholds would open fully, and the kept mix would be 2:1
    // instead of the requested 1:1. Counting keyable rows only makes
    // web the non-binding group at threshold 5000 → ~100 of 200 kept.
    val rows = (1 to 200).map(i => (Option(i.toLong), "web")) ++
      (1 to 200).map(_ => (Option.empty[Long], "web")) ++
      (301 to 400).map(i => (Option(i.toLong), "code"))
    val out = Curation.mixReweight(rows.toDF("id", "src"), "src", "id",
      Map("web" -> 1, "code" -> 1))
    val byGroup = out.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(byGroup("code") == 100L, s"binding group keeps all: $byGroup")
    assert(byGroup("web") > 60 && byGroup("web") < 140,
      s"web must downsample toward code's usable size, got: $byGroup")
  }

  test("dehyphenate: line-break joins, compound keeps, structure survives") {
    val rows = Seq(
      (1L, "exam-\nple"),                     // classic join
      (2L, "exam- \n  ple"),                  // trailing/leading space
      (3L, "exam-\r\nple"),                   // CRLF
      (4L, "state-\nMachine"),                // uppercase: keep hyphen
      (5L, "room-\n42 was free"),             // digit: keep hyphen
      (6L, "a mid-line hyphen stays"),        // no line break: untouched
      (7L, "para one.\n\npara two"),          // blank line survives
      (8L, "trailing-\n"),                    // nothing follows: untouched
      (9L, "7-\nup"),                         // digit BEFORE: untouched
      (10L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = rows
      .select(col("id"), TextAnalysis.dehyphenate(col("text")).as("d"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("example"))
    assert(out(2L).contains("example"))
    assert(out(3L).contains("example"))
    assert(out(4L).contains("state-Machine"))
    assert(out(5L).contains("room-42 was free"))
    assert(out(6L).contains("a mid-line hyphen stays"))
    assert(out(7L).contains("para one.\n\npara two"))
    assert(out(8L).contains("trailing-\n"))
    assert(out(9L).contains("7-\nup"))
    assert(out(10L).isEmpty)
  }

  test("normalizeText: each fold rule, idempotence, null/empty") {
    val rows = Seq(
      (1L, "it’s “fine”"),
      (2L, "a—b–c−d"),
      (3L, "wait… ok"),
      (4L, "non breaking thin　ideographic"),
      (5L, "zero​width­soft﻿bom"),
      (6L, "  runs\t of\n whitespace   "),
      (7L, ""), (8L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = rows
      .select(col("id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("it's \"fine\""))
    assert(out(2L).contains("a-b-c-d"))
    assert(out(3L).contains("wait... ok"))
    assert(out(4L).contains("non breaking thin ideographic"))
    assert(out(5L).contains("zerowidthsoftbom"))
    assert(out(6L).contains("runs of whitespace"))
    assert(out(7L).contains(""))
    assert(out(8L).isEmpty)
    // Idempotence: normalizing the normalized form is a no-op.
    val twice = rows
      .select(col("id"),
        TextAnalysis.normalizeText(col("text")).as("once"),
        TextAnalysis.normalizeText(
          TextAnalysis.normalizeText(col("text"))).as("twice"))
      .filter(col("once") =!= col("twice")).count()
    assert(twice == 0L)
  }

  test("hashedLinearScore: kernel-exact scores, empty prior, nan exclusion") {
    import graft.functions.LabelHashBucketUtil
    import org.apache.spark.unsafe.types.UTF8String
    val weights = Seq.tabulate(16)(i => (i - 8) / 10.0)
    def w(tok: String): Double =
      weights(LabelHashBucketUtil.bucket(UTF8String.fromString(tok), 16))
    def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "alpha NaN nan"), // nan-like tokens excluded from the mean
      (5L, "alpha"),
      // Sentinel tokens the old literal-'nan' filter missed: a lone
      // vertical tab (outside the whitespace split class, JVM-trims to
      // empty) and "nan" + control char (JVM-trims to "nan") — both
      // must be EXCLUDED, not crash element_at(w, 0).
      (6L, "alpha \u000B nan\u0001")).toDF("id", "text")
    val out = docs.select(col("id"),
      TextAnalysis.hashedLinearScore(col("text"), weights, bias = 0.3)
        .as("s")).as[(Long, Double)].collect().toMap
    val exp1 = sigmoid(0.3 + (w("alpha") + w("beta") + w("gamma")) / 3)
    assert(math.abs(out(1L) - exp1) < 1e-12)
    assert(math.abs(out(2L) - sigmoid(0.3)) < 1e-12) // empty → prior
    assert(math.abs(out(3L) - sigmoid(0.3)) < 1e-12) // NULL → prior
    assert(math.abs(out(4L) - sigmoid(0.3 + w("alpha"))) < 1e-12)
    assert(math.abs(out(5L) - sigmoid(0.3 + w("alpha"))) < 1e-12)
  }

  test("loadWeights: parquet round-trip and JSON load drive identical scores") {
    val model = TextAnalysis.LinearModel(
      Seq.tabulate(64)(i => (i % 7 - 3) / 10.0), 0.2)
    // parquet contract round-trip
    val pqPath = "/tmp/graft_spec_weights_pq"
    TextAnalysis.saveWeights(spark, model, pqPath)
    val fromPq = TextAnalysis.loadWeights(spark, pqPath)
    assert(fromPq == model)
    // JSON contract: the shape a Python training stack dumps
    val jsonPath = "/tmp/graft_spec_weights.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(jsonPath),
      s"""{"bias": 0.2, "weights": [${model.weights.mkString(", ")}]}"""
        .getBytes("UTF-8"))
    val fromJson = TextAnalysis.loadWeights(spark, jsonPath)
    assert(fromJson.bias == model.bias)
    assert(fromJson.weights.zip(model.weights)
      .forall { case (a, b) => math.abs(a - b) < 1e-15 })
    // loaded weights score identically to the inline literals
    val docs = Seq((1L, "alpha beta gamma"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val inline = docs.select(col("id"),
      TextAnalysis.hashedLinearScore(col("text"), model.weights, model.bias)
        .as("s")).as[(Long, Double)].collect().toMap
    val loaded = docs.select(col("id"), fromPq.score(col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(inline == loaded)
  }

  test("loadWeights: loud rejection of sparse, empty and non-finite files") {
    // sparse idx (gap at 1)
    Seq((0, 0.1), (2, 0.2), (-1, 0.0)).toDF("idx", "weight")
      .write.mode("overwrite").parquet("/tmp/graft_spec_weights_bad1")
    intercept[IllegalArgumentException] {
      TextAnalysis.loadWeights(spark, "/tmp/graft_spec_weights_bad1")
    }
    // non-finite weight
    Seq((0, Double.NaN)).toDF("idx", "weight")
      .write.mode("overwrite").parquet("/tmp/graft_spec_weights_bad2")
    intercept[IllegalArgumentException] {
      TextAnalysis.loadWeights(spark, "/tmp/graft_spec_weights_bad2")
    }
    // bias-only file (empty weight vector)
    Seq((-1, 0.5)).toDF("idx", "weight")
      .write.mode("overwrite").parquet("/tmp/graft_spec_weights_bad3")
    intercept[IllegalArgumentException] {
      TextAnalysis.loadWeights(spark, "/tmp/graft_spec_weights_bad3")
    }
    // JSON with a null ELEMENT inside the weights array: must be the
    // loud require (with the path), never a bare NPE from unboxing
    val nullElem = "/tmp/graft_spec_weights_bad4.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(nullElem),
      """{"bias": 0.1, "weights": [0.5, null, 0.2]}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.loadWeights(spark, nullElem)
    }
    assert(e.getMessage.contains("null elements"))
  }

  test("dropBlockedDomains: exact, subdomain, TLD matches drop; others keep") {
    val rows = Seq(
      (1L, "www.bad.com"), // subdomain of listed registrable domain
      (2L, "bad.com"), // exact
      (3L, "notbad.com"), // suffix only on a NON-dot boundary — keep
      (4L, "deep.sub.bad.com"), // multi-level subdomain
      (5L, "good.org"),
      (6L, "anything.xyz"), // bare-TLD entry blocks the whole TLD
      (7L, "CaSe.BAD.com"), // host case-folds before matching
      (8L, null.asInstanceOf[String])) // null host: nothing to match, keep
      .toDF("id", "host")
    val blocked = Seq("bad.com", "xyz").toDF("domain")
    val kept = Curation.dropBlockedDomains(rows, "host", blocked)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L, 8L))
  }

  test("dropBlockedDomains: a df that already has a __host column works") {
    // the helper frame's host alias must not shadow user columns —
    // pre-fix this was ambiguous-resolution territory
    val rows = Seq((1L, "bad.com", "x"), (2L, "good.org", "y"))
      .toDF("id", "host", "__host")
    val kept = Curation.dropBlockedDomains(rows, "host",
      Seq("bad.com").toDF("domain"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("hostSuffixChain: most-specific-first dotted suffixes; null → empty") {
    val out = Seq(("a.b.co.uk"), ("single"), (null.asInstanceOf[String]))
      .toDF("h")
      .select(UrlOps.hostSuffixChain(col("h")).as("c"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a.b.co.uk", "b.co.uk", "co.uk", "uk"))
    assert(out(1) == Seq("single"))
    assert(out(2) == Seq.empty)
  }

  // ---- term blocklist (C4-style content filter) --------------------

  test("blockedTermFlag: whole-token words, normalized phrases, edges") {
    val rows = Seq(
      (1L, "contains the badword here"),        // word hit
      (2L, "contains badwords plural"),         // NOT a whole-token hit
      (3L, "BADWORD uppercase"),                // case-insensitive
      (4L, "a spam  phrase with doubled space"),// phrase hit after collapse
      (5L, "spam\nphrase across a linebreak"),  // phrase across \n
      (6L, "spamphrase glued"),                 // not the phrase
      (7L, "badword."),                         // punctuation glues the token
      (8L, null.asInstanceOf[String]),
      (9L, "clean text entirely"))
    val df = rows.toDF("id", "t")
    val out = df.select(col("id"),
        Curation.blockedTermFlag(col("t"),
          Seq("BadWord", "spam phrase")).as("b"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L) && out(3L) && out(4L) && out(5L))
    assert(!out(2L) && !out(6L) && !out(7L) && !out(8L) && !out(9L))
    val kept = Curation.dropBlockedTerms(df, "t", Seq("badword"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L, 6L, 7L, 8L, 9L))
    intercept[IllegalArgumentException](
      Curation.blockedTermFlag(col("t"), Seq.empty))
    intercept[IllegalArgumentException](
      Curation.blockedTermFlag(col("t"), Seq("  ", "\t")))
    intercept[IllegalArgumentException](
      Curation.blockedTermFlag(col("t"), (1 to 1001).map("w" + _)))
  }

  // ---- DSIR importance weights + resampling ------------------------

  private def dsirCorpus = {
    // two dialects: "code"-flavored vs "prose"-flavored vocabularies
    val code = (1L to 40L).map(i =>
      (i, s"def fn$i ( x ) return x + $i", "code"))
    val prose = (41L to 80L).map(i =>
      (i, s"the quick story number $i was told again", "prose"))
    (code ++ prose).toDF("id", "text", "kind")
  }

  test("importanceWeights: target-like docs score higher; empty docs absent") {
    val raw = dsirCorpus.unionByName(
      Seq((81L, "", "empty"), (82L, null.asInstanceOf[String], "empty"))
        .toDF("id", "text", "kind"))
    val target = dsirCorpus.filter(col("kind") === "code")
    val w = Curation.importanceWeights(raw, target, "id", "text",
      buckets = 512, alpha = 1.0)
    val byId = w.select("id", "log_importance").as[(Long, Double)]
      .collect().toMap
    // empty/null docs carry no features → absent
    assert(!byId.contains(81L) && !byId.contains(82L))
    val codeAvg = (1L to 40L).map(byId).sum / 40
    val proseAvg = (41L to 80L).map(byId).sum / 40
    assert(codeAvg > proseAvg,
      s"code-like docs must out-score prose: $codeAvg vs $proseAvg")
    // n_feats = unigrams + bigrams = 2*tokens - 1
    val nf = w.filter(col("id") === 1L).select("n_feats")
      .as[Long].head()
    assert(nf == 2 * 9 - 1)
  }

  test("importanceWeights: guards on buckets, alpha, reserved columns") {
    intercept[IllegalArgumentException] {
      Curation.importanceWeights(dsirCorpus, dsirCorpus, "id", "text",
        buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Curation.importanceWeights(dsirCorpus, dsirCorpus, "id", "text",
        alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Curation.importanceWeights(
        dsirCorpus.withColumn("n_feats", lit(1)), dsirCorpus, "id", "text")
    }
  }

  test("importanceResample: deterministic, k-bounded, weight-directional") {
    val target = dsirCorpus.filter(col("kind") === "code")
    val w = Curation.importanceWeights(dsirCorpus, target, "id", "text",
      buckets = 512)
    val pick1 = Curation.importanceResample(w, "id", "log_importance", 20)
      .select("id").as[Long].collect().toSet
    val pick2 = Curation.importanceResample(w.orderBy(rand(7)), "id",
      "log_importance", 20).select("id").as[Long].collect().toSet
    assert(pick1 == pick2, "resample must be order-independent")
    assert(pick1.size == 20)
    // softmax sampling toward the code dialect: code docs dominate
    val codeKept = pick1.count(_ <= 40L)
    assert(codeKept >= 15, s"expected mostly code docs, got $codeKept/20")
    // k larger than the corpus keeps everything scoreable
    val all = Curation.importanceResample(w, "id", "log_importance", 1000)
    assert(all.count() == 80)
  }

  // ---- CCNet-style score buckets -----------------------------------

  test("fit/bucketByThresholds: exact quartile cuts, tie-up rule, NULLs") {
    // lang a: scores 1..8 (n-1=7 — interpolated cuts); lang b: constant
    val base = ((1 to 8).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("b", 100L + i, 5.0))).toDF("lang", "id", "score")
    val th = Curation.fitScoreThresholds(base, Seq("lang"), "score",
      exact = true)
    val out = Curation.bucketByThresholds(base, th, Seq("lang"), "score")
      .select("lang", "id", "score_bucket").as[(String, Long, String)]
      .collect().map { case (l, i, b) => ((l, i), b) }.toMap
    // lang a: t1 = 2.75, t2 = 6.25 → 1,2 tail; 3..6 middle; 7,8 head
    assert((1 to 2).forall(i => out(("a", i.toLong)) == "tail"))
    assert((3 to 6).forall(i => out(("a", i.toLong)) == "middle"))
    assert((7 to 8).forall(i => out(("a", i.toLong)) == "head"))
    // lang b: all scores equal both thresholds → ties promote to head
    assert((1 to 4).forall(i => out(("b", 100L + i)) == "head"))
    // group absent from thresholds → NULL bucket
    val stamped = Curation.bucketByThresholds(
      Seq(("zz", 1L, 3.0)).toDF("lang", "id", "score"), th,
      Seq("lang"), "score")
    assert(stamped.select("score_bucket").as[String].head() == null)
    // approx path returns the same frame shape
    val thA = Curation.fitScoreThresholds(base, Seq("lang"), "score")
    assert(thA.columns.toSeq == th.columns.toSeq && thA.count() == 2)
    // guards
    intercept[IllegalArgumentException] {
      Curation.fitScoreThresholds(base, Seq("lang"), "score",
        fractions = Seq(0.75, 0.25))
    }
    intercept[IllegalArgumentException] {
      Curation.fitScoreThresholds(base, Nil, "score")
    }
  }

  test("temperatureSample: alpha=1 matches natural mix; alpha<1 flattens") {
    import spark.implicits._
    // 400 'big' rows, 100 'small' rows
    val df = ((1 to 400).map(i => (i.toLong, "big")) ++
      (401 to 500).map(i => (i.toLong, "small"))).toDF("id", "src")
    val a1 = Curation.temperatureSample(df, "src", "id",
      alpha = 1.0, budget = 100)
    val c1 = a1.groupBy("src").count().as[(String, Long)].collect().toMap
    // natural mix: rates 0.2/0.2 -> expected ~80/~20; hash buckets are
    // approximate, so assert the RATIO ordering, not exact counts
    assert(c1("big") > 2 * c1("small"))
    val a5 = Curation.temperatureSample(df, "src", "id",
      alpha = 0.5, budget = 100)
    val c5 = a5.groupBy("src").count().as[(String, Long)].collect().toMap
    // sqrt weighting: q_big/q_small = 2 -> small keeps a larger share
    // than under the natural mix
    assert(c5("small").toDouble / c5.values.sum >
      c1("small").toDouble / c1.values.sum)
  }

  test("temperatureSample: waterfill — tiny group saturates, rest absorbs") {
    import spark.implicits._
    val df = ((1 to 396).map(i => (i.toLong, "big")) ++
      (397 to 400).map(i => (i.toLong, "tiny"))).toDF("id", "src")
    // alpha=0.5: q_tiny/Q = 2/21.9; raw tiny rate = 180*0.0913/4 > 1
    // -> tiny keeps ALL 4 rows, big absorbs the remaining budget
    val out = Curation.temperatureSample(df, "src", "id",
      alpha = 0.5, budget = 180)
    val c = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(c("tiny") == 4L)
    assert(c("big") > 100L && c("big") < 396L)
  }

  test("temperatureSample: deterministic, null groups dropped, guards") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, null), (4L, "b"))
      .toDF("id", "src")
    val out1 = Curation.temperatureSample(df, "src", "id", 0.5, 2)
      .select("id").as[Long].collect().sorted.toSeq
    val out2 = Curation.temperatureSample(
      df.orderBy(org.apache.spark.sql.functions.rand(7)), "src", "id", 0.5, 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out1 == out2)
    assert(!out1.contains(3L))
    // budget >= N keeps everything non-null
    val all = Curation.temperatureSample(df, "src", "id", 0.5, 100)
    assert(all.count() == 3)
    intercept[IllegalArgumentException] {
      Curation.temperatureSample(df, "src", "id", 0.0, 10)
    }
    intercept[IllegalArgumentException] {
      Curation.temperatureSample(df, "src", "id", 0.5, 0)
    }
  }

  test("packTokenIds: sha-order concat, exact chopping, doc splits") {
    import spark.implicits._
    import graft.ops.VocabTokenizer
    val vocab = Seq("ab", "a", "b", "c") // unk=4, eos=5
    // sha256("1") < sha256("2") -> doc 1 first in the stream
    val df = Seq((1L, "s1", "ab c"), (2L, "s1", "ba"))
      .toDF("doc_id", "shard", "text")
      .withColumn("tids", VocabTokenizer.greedyIds(col("text"), vocab))
    // stream: [0,3,5] ++ [2,1,5] = [0,3,5,2,1,5]
    def run(seqLen: Int) =
      Curation.packTokenIds(df, "shard", "doc_id", "tids", seqLen,
          eosId = Some(5))
        .orderBy("example_id")
        .select("example_id", "ids", "n_ids")
        .as[(Long, Seq[Int], Long)].collect().toSeq
    assert(run(4) == Seq((0L, Seq(0, 3, 5, 2), 4L), (1L, Seq(1, 5), 2L)))
    // padId tops the short final example up; n_ids stays the real count
    val padded = Curation.packTokenIds(df, "shard", "doc_id", "tids", 4,
        eosId = Some(5), padId = Some(7))
      .orderBy("example_id").select("example_id", "ids", "n_ids")
      .as[(Long, Seq[Int], Long)].collect().toSeq
    assert(padded == Seq((0L, Seq(0, 3, 5, 2), 4L),
      (1L, Seq(1, 5, 7, 7), 2L)))
    // seqLen 2: every fragment boundary exercised, doc 1 split
    assert(run(2) == Seq((0L, Seq(0, 3), 2L), (1L, Seq(5, 2), 2L),
      (2L, Seq(1, 5), 2L)))
  }

  test("packTokenIds: zero-token docs only mark boundaries with eos") {
    import spark.implicits._
    import graft.ops.VocabTokenizer
    val df = Seq((3L, "s2", "")).toDF("doc_id", "shard", "text")
      .withColumn("tids",
        VocabTokenizer.greedyIds(col("text"), Seq("a")))
    val withEos = Curation.packTokenIds(df, "shard", "doc_id", "tids", 4,
      eosId = Some(9))
    assert(withEos.select("ids").as[Seq[Int]].head == Seq(9))
    val noEos = Curation.packTokenIds(df, "shard", "doc_id", "tids", 4)
    assert(noEos.count() == 0L)
    intercept[IllegalArgumentException] {
      Curation.packTokenIds(df, "shard", "doc_id", "tids", 0)
    }
    intercept[IllegalArgumentException] {
      Curation.packTokenIds(df.withColumn("example_id",
        org.apache.spark.sql.functions.lit(1L)),
        "shard", "doc_id", "tids", 4)
    }
  }

  test("greedyIds: longest match, unknown id, duplicate pieces, NULL") {
    import spark.implicits._
    import graft.ops.VocabTokenizer
    // duplicate "ab": FIRST index wins
    val vocab = Seq("ab", "a", "ab", "b")
    val out = Seq(("ab c a😀b"), (null: String)).toDF("t")
      .select(VocabTokenizer.greedyIds(col("t"), vocab).as("ids"))
      .as[Seq[Int]].collect().toSeq
    // "ab"->0, "c"->unk(4), "a"->1, emoji->unk, "b"->3
    assert(out(0) == Seq(0, 4, 1, 4, 3))
    assert(out(1) == Seq.empty)
  }

  test("temperatureSample: unkeyable ids don't dilute their group") {
    import spark.implicits._
    val clean = (1 to 40).map(i => (i.toString, "a")).toDF("id", "src")
    val withNulls = clean.union(
      Seq.fill(40)((null: String, "a")).toDF("id", "src"))
    val a = Curation.temperatureSample(clean, "src", "id", 0.5, 10)
      .select("id").as[String].collect().sorted.toSeq
    val b = Curation.temperatureSample(withNulls, "src", "id", 0.5, 10)
      .select("id").as[String].collect().sorted.toSeq
    assert(a == b, "null-id rows changed the kept set")
  }

  test("globalShuffle: a permutation, stable across layout, re-dealt by seed") {
    import spark.implicits._
    val df = (0L until 200L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Curation.globalShuffle(d, "id", nShards = 4, seed = seed)
        .select("id", "shuffle_shard", "shuffle_pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val base = run(df, 7L)
    // input partitioning and row order must not matter
    assert(run(df.repartition(13).orderBy(desc("id")), 7L) == base)
    // per-shard positions are exactly 1..n (a permutation, no gaps)
    base.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
    }
    // every shard non-empty at 200 rows / 4 shards, and sizes hash-balanced
    val sizes = base.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3) && sizes.values.forall(_ > 20))
    // a different seed re-deals: some row changes shard or position
    assert(run(df, 8L) != base)
    // shard assignment is id-stable: dropping rows never moves survivors
    val subset = run(df.filter(col("id") < 100), 7L).map(t => t._1 -> t._2).toMap
    val full = base.map(t => t._1 -> t._2).toMap
    assert(subset.forall { case (id, sh) => full(id) == sh })
  }

  test("contaminatedSentences: ordinal map, clean docs, reserved cols") {
    import spark.implicits._
    val leak = "The secret benchmark answer is forty two exactly here."
    val docs = Seq(
      (1L, s"Clean opening sentence. $leak Clean closing sentence."),
      (2L, "Nothing contaminated in this document at all today."),
      (3L, s"$leak"), // the whole doc IS the leak
      (4L, null: String)).toDF("doc_id", "t")
    val out = Curation.contaminatedSentences(docs, "doc_id", "t",
        Seq(leak).toDF("text"), "text")
      .withColumn("idx", concat_ws(",", col("contaminated_idx")))
      .select("doc_id", "n_sentences", "n_contaminated", "idx")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(out == Seq(
      (1L, 3L, 1L, "1"),
      (2L, 1L, 0L, ""),
      (3L, 1L, 1L, "0")))
    // a doc with no sentences (null text) has no row — same contract
    // as contaminationScore's has-at-least-one-shingle rule
    assert(!out.exists(_._1 == 4L))
    intercept[IllegalArgumentException] {
      Curation.contaminatedSentences(docs.withColumnRenamed("doc_id", "__si"),
        "__si", "t", Seq(leak).toDF("text"), "text")
    }
  }

  test("piiMatches: audit rows in order, masking chain attribution") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.com then c@d.org and ping 10.0.0.1"),
      (2L, "call +1-555-0100-123 twice: +1-555-0100-123"),
      (3L, "clean text, nothing to find"),
      (4L, null: String)).toDF("id", "t")
    val got = Curation.piiMatches(docs, "id", "t")
      .as[(Long, String, String, Int)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, "email", "a@b.com", 0),
      (1L, "email", "c@d.org", 1),
      (1L, "ipv4", "10.0.0.1", 0),
      (2L, "phone", "+1-555-0100-123", 0),
      (2L, "phone", "+1-555-0100-123", 1)))
    // a phone-shaped digit run inside an email is consumed by the
    // email mask first — attributed exactly as redactPii would act
    val tricky = Seq((9L, "x +1-555-0100-123@sub.example.com y"))
      .toDF("id", "t")
    val kinds = Curation.piiMatches(tricky, "id", "t")
      .select("kind").as[String].collect().toSeq
    assert(kinds == Seq("email"))
  }
}
