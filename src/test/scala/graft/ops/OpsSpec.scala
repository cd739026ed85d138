package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and"), //       near dup of 1
    (4L, "completely different content with no overlap whatsoever here"),
    (5L, "ANOTHER totally unrelated document about graph databases ok"))
    .toDF("id", "text")

  test("semanticDedup drops smaller-id cluster-mates above threshold only") {
    // Two well-separated directions; centroids pin the clusters.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),          // cluster A
      (2L, Array(1.0f, 0.0f)),          // exact copy of 1 → dropped
      (3L, Array(0.95f, 0.32f)),        // cluster A, cos(1,3) ≈ 0.948 < 0.99 → kept
      (10L, Array(0.0f, 1.0f)),         // cluster B
      (11L, Array(0.0f, 2.0f)))         // cluster B, cos = 1 with 10 → dropped
      .toDF("id", "vec")
    val cents = Seq(
      (100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cent_id", "cent_emb")
    val kept = Dedup.semanticDedup(vecs, "id", "vec", cents, threshold = 0.99)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 10L))
    assert(Dedup.semanticDedup(vecs, "id", "vec", cents, 0.99)
      .columns.toSeq == vecs.columns.toSeq)
  }

  test("semanticDedup never compares across clusters (SemDeDup contract)") {
    // ids 1 and 2 are near-identical but magnetized to DIFFERENT
    // centroids — SemDeDup deliberately keeps both.
    val vecs = Seq(
      (1L, Array(0.72f, 0.69f)), // nearest to A
      (2L, Array(0.69f, 0.72f))) // nearest to B, cos(1,2) ≈ 0.998
      .toDF("id", "vec")
    val cents = Seq(
      (100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cent_id", "cent_emb")
    val kept = Dedup.semanticDedup(vecs, "id", "vec", cents, threshold = 0.99)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("exact keeps the smallest id deterministically") {
    val out = Dedup.exact(corpus, Seq("text"), "id")
    assert(out.count() == 4)
    assert(out.filter(col("id") === 2).count() == 0) // 1 won over 2
    assert(out.filter(col("id") === 1).count() == 1)
  }

  test("exact plans as a partial aggregate, not a window sort") {
    val out = Dedup.exact(corpus, Seq("text"), "id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"exact must not plan a window:\n$plan")
    assert(plan.toLowerCase.contains("min_by"), s"expected min_by aggregate:\n$plan")
    assert(out.columns.toSeq == corpus.columns.toSeq) // schema preserved
  }

  test("truncate switches to reliable checkpoint when a dir is configured") {
    val df = Seq(1, 2, 3).toDF("x")
    // No checkpoint dir → executor-local blocks (fast local-mode path).
    assert(Checkpoints.truncate(df).queryExecution.analyzed.toString
      .contains("LocalRelation") == false) // checkpointed, not inlined
    val dir = tmpDir("ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val out = Checkpoints.truncate(df)
      assert(out.count() == 3)
      // Reliable checkpoint writes RDD blocks under the configured dir.
      val wrote = java.nio.file.Files.walk(dir).filter(p =>
        java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally sc.setCheckpointDir(null) // restore local-mode behavior
  }

  test("observations fire on truncate's eager checkpoint, both paths") {
    // pageRank / duplicateGroups fold their per-round scalar probes
    // (dangling mass, changed-count) into the checkpoint
    // materialization as observe() metrics instead of dedicated jobs —
    // which is only sound if the CollectMetrics accumulators are
    // harvested by the checkpoint action itself. Prove it on BOTH
    // truncation paths, with a timeout so a silent non-firing listener
    // fails the test instead of hanging the suite.
    import scala.concurrent.duration._
    def metricOf(): Long = {
      val obs = org.apache.spark.sql.Observation()
      val df = Seq(1L, 2L, 3L, 4L).toDF("x")
        .observe(obs, sum(when(col("x") % 2 === 0, 1L).otherwise(0L)).as("even"))
      val out = Checkpoints.truncate(df)
      assert(out.count() == 4)
      scala.concurrent.Await.result(
        scala.concurrent.Future(obs.get("even").asInstanceOf[Long])(
          scala.concurrent.ExecutionContext.global), 30.seconds)
    }
    assert(metricOf() == 2L) // local path
    val dir = tmpDir("ckpt_obs")
    sc.setCheckpointDir(dir.toString)
    try assert(metricOf() == 2L) // reliable path
    finally sc.setCheckpointDir(null)
  }

  test("Rounds bounds reliable-checkpoint storage to one round's files") {
    val dir = tmpDir("ckpt_rounds")
    sc.setCheckpointDir(dir.toString)
    try {
      // An 8-node chain takes ~diameter rounds of label propagation,
      // each reliably checkpointed. The Rounds tracker must delete
      // round N-1's DFS files as round N materializes — without it
      // this leaves one full copy per round (the ADVICE finding).
      val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val labels = Dedup.duplicateGroups(pairs).as[(Long, Long)].collect().toMap
      assert(labels.size == 8 && labels.values.toSet == Set(1L))
      import scala.jdk.CollectionConverters._
      val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("rdd-")).toList
      assert(rddDirs.size == 1,
        s"expected only the final round's checkpoint to survive, found: $rddDirs")
    } finally sc.setCheckpointDir(null)
  }

  test("transitive dropNearDuplicates releases the label frame's final checkpoint") {
    val dir = tmpDir("ckpt_release")
    sc.setCheckpointDir(dir.toString)
    try {
      val kept = Dedup.dropNearDuplicates(corpus, "id", "text",
        threshold = 0.5, transitive = true)
        .select("id").as[Long].collect().toSet
      assert(kept == Set(1L, 4L, 5L))
      import scala.jdk.CollectionConverters._
      val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("rdd-")).toList
      // One checkpoint may survive: the materialized loser set backing
      // the returned frame. duplicateGroups' label rounds (several per
      // propagation) must all be gone — Checkpoints.release reclaims
      // the final one once the losers are materialized.
      assert(rddDirs.size <= 1,
        s"label-frame checkpoints leaked past release: $rddDirs")
    } finally sc.setCheckpointDir(null)
  }

  test("duplicateGroups labels transitive components with the global min id") {
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val groups = Dedup.duplicateGroups(pairs)
    val m = groups.as[(Long, Long)].collect().toMap
    // 1-3 and 2-3 chain into one component labeled 1 even though 1 and
    // 2 share no direct pair; 10-11 is its own component.
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("duplicateGroups converges on a long chain (diameter >> 1)") {
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val groups = Dedup.duplicateGroups(pairs)
    val labels = groups.as[(Long, Long)].collect().toMap
    assert(labels.size == 20 && labels.values.toSet == Set(1L))
  }

  test("dedupAgainst keeps only genuinely-new content") {
    val seen = Seq((1L, Some("alpha")), (2L, Some("beta")),
      (3L, Option.empty[String])).toDF("id", "text")
    val incoming = Seq((10L, Some("alpha")), (11L, Some("gamma")),
      (12L, Option.empty[String]), (13L, Some(""))).toDF("id", "text")
    val kept = Dedup.dedupAgainst(incoming, seen, Seq("text"))
      .select("id").as[Long].collect().toSet
    // alpha is a dup; the NULL matches seen's NULL row; "" is new (NULL
    // and empty digest differently by construction)
    assert(kept == Set(11L, 13L))
  }

  test("dedupAgainstBloom ≡ dedupAgainst, both joins broadcast, seen never shuffles") {
    val seen = (1L to 200L).map(i => (i, s"doc number $i")).toDF("id", "text")
    val incoming = (
      (150L to 250L).map(i => (i + 1000, s"doc number $i")) :+ // 51 dups, 50 new
        ((9999L, "NULL-free novel document"))).toDF("id", "text")
    val bloom = Dedup.digestBloom(seen, Seq("text"), expectedItems = 1000L)
    val viaBloom = Dedup.dedupAgainstBloom(incoming, seen, Seq("text"), bloom)
    val exact = Dedup.dedupAgainst(incoming, seen, Seq("text"))
    assert(viaBloom.select("id").as[Long].collect().toSet ==
      exact.select("id").as[Long].collect().toSet)
    // the verify pair must both be broadcast joins: the corpus side is
    // read in place, never exchanged for a shuffle join
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "expected broadcast verify joins")
    assert(!plan.contains("SortMergeJoin"), "seen side must not shuffle-join")
  }

  test("dedupAgainstBloom auto-falls back to the shuffle shape on a dup-heavy batch") {
    // Mostly-duplicate batch + maxMaybeKeys=1 on the BIG-batch path
    // (smallBatchMaxBytes=0 forces it — small batches never pivot):
    // the maybe-dup set exceeds the broadcast pivot, so the operator
    // must take the prefilter anti-join path instead of broadcasting
    // the maybe set — with the SAME keep verdicts.
    val seen = (1L to 100L).map(i => (i, s"doc number $i")).toDF("id", "text")
    val incoming = (
      (1L to 90L).map(i => (i + 1000, s"doc number $i")) :+ // 90 dups
        ((9999L, "one novel document"))).toDF("id", "text")
    val bloom = Dedup.digestBloom(seen, Seq("text"), expectedItems = 1000L)
    val viaFallback = Dedup.dedupAgainstBloom(incoming, seen, Seq("text"),
      bloom, maxMaybeKeys = 1L, smallBatchMaxBytes = 0L)
    assert(viaFallback.select("id").as[Long].collect().toSet == Set(9999L))
    // Fallback shape: the maybe slice anti-joins the corpus index; the
    // definitely-new slice is unioned around it.
    val plan = viaFallback.queryExecution.executedPlan.toString
    assert(plan.contains("Union"),
      s"expected the prefilter union shape on fallback:\n$plan")
    // And the broadcast shape with a roomy pivot gives the same set.
    val viaBroadcast = Dedup.dedupAgainstBloom(incoming, seen, Seq("text"),
      bloom, maxMaybeKeys = 1000000L)
    assert(viaBroadcast.select("id").as[Long].collect().toSet == Set(9999L))
  }

  test("dedupAgainstBloom: lazy small-batch and counted big-batch paths agree") {
    // smallBatchMaxBytes=0 forces the big-batch branch (digest-only
    // persist + pivot count + source re-scan); the default takes the
    // single-lazy-plan branch — identical keep verdicts either way
    val seen = (1L to 150L).map(i => (i, s"doc number $i")).toDF("id", "text")
    val incoming = (
      (100L to 180L).map(i => (i + 1000, s"doc number $i")) :+
        ((9999L, "novel doc"))).toDF("id", "text")
    val bloom = Dedup.digestBloom(seen, Seq("text"), expectedItems = 1000L)
    val viaLazy = Dedup.dedupAgainstBloom(incoming, seen, Seq("text"), bloom)
      .select("id").as[Long].collect().toSet
    val viaCounted = Dedup.dedupAgainstBloom(incoming, seen, Seq("text"), bloom,
      smallBatchMaxBytes = 0L)
      .select("id").as[Long].collect().toSet
    assert(viaLazy == viaCounted)
    assert(viaLazy == ((151L to 180L).map(_ + 1000).toSet + 9999L))
  }

  test("dedupAgainstBloom under a saturated filter (fpp→1) still exact") {
    // 10 expected items but 200 inserted: nearly every probe reads
    // "maybe" — everything falls through to the exact verify and the
    // result still matches dedupAgainst.
    val seen = (1L to 200L).map(i => (i, s"text $i")).toDF("id", "text")
    val incoming = Seq((300L, "text 5"), (301L, "brand new"),
      (302L, null.asInstanceOf[String])).toDF("id", "text")
    val bloom = Dedup.digestBloom(seen, Seq("text"), expectedItems = 10L, fpp = 0.5)
    val kept = Dedup.dedupAgainstBloom(incoming, seen, Seq("text"), bloom)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(301L, 302L)) // dup dropped; novel + NULL-text kept
  }

  test("dedupAgainst digests are injective across column boundaries") {
    val seen = Seq(("a|b", "c")).toDF("x", "y")
    val incoming = Seq(("a", "b|c"), ("a|b", "c"), ("a", "b"))
      .toDF("x", "y")
    // length-prefixing means ("a","b|c") can NOT collide with ("a|b","c")
    val kept = Dedup.dedupAgainst(incoming, seen, Seq("x", "y"))
      .select("x").as[String].collect().toSet
    assert(kept == Set("a"))
  }

  test("nearDupAgainst drops near-dups of the seen corpus, keeps novel docs") {
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content with no overlap whatsoever here"))
      .toDF("id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and"), // near-dup of 1
      (11L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup
      // shares an id with a SEEN row but is novel content — ids never
      // cross the side boundary, only content does
      (1L, "ANOTHER totally unrelated document about graph databases ok"))
      .toDF("id", "text")
    val kept = Dedup.nearDupAgainst(incoming, seen, "id", "text",
      threshold = 0.5).select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("embeddingNearDupAgainst drops vector copies, keeps novel directions") {
    val seen = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("id", "emb")
    val incoming = Seq(
      (10L, Array(1f, 0f, 0f, 0f)), // exact copy of seen 1 → dropped
      (11L, Array(0f, 0f, 1f, 0f))) // orthogonal → kept
      .toDF("id", "emb")
    val kept = Dedup.embeddingNearDupAgainst(incoming, seen, "id", "emb",
      threshold = 0.99).select("id").as[Long].collect().toSet
    assert(kept == Set(11L))
  }

  test("dropNearDuplicates transitive keeps exactly the component minimum") {
    val kept = Dedup.dropNearDuplicates(corpus, "id", "text",
      threshold = 0.5, transitive = true)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L)) // component {1,2,3} keeps only 1
  }

  test("nearDuplicates finds exact and truncation pairs, nothing else") {
    val pairs = Dedup.nearDuplicates(corpus, "id", "text",
      threshold = 0.5, shingle = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccardNearDuplicates (inverted index) matches the LSH pair set exactly") {
    val lsh = Dedup.nearDuplicates(corpus, "id", "text",
      threshold = 0.5, shingle = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardNearDuplicates(corpus, "id", "text",
      threshold = 0.5, shingle = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == lsh)
    assert(exact.contains((1L, 2L)) && exact.contains((1L, 3L)))
  }

  test("blank documents pair with each other in BOTH jaccard paths (sentinel shingle)") {
    val withBlanks = corpus.unionByName(Seq(
      (10L, ""), (11L, "   ")).toDF("id", "text"))
    val lsh = Dedup.nearDuplicates(withBlanks, "id", "text",
      threshold = 0.99, shingle = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardNearDuplicates(withBlanks, "id", "text",
      threshold = 0.99, shingle = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // two blank docs are identical (jaccard 1) — both mechanisms agree
    assert(lsh.contains((10L, 11L)), s"lsh=$lsh")
    assert(exact.contains((10L, 11L)), s"exact=$exact")
  }

  test("jaccardNearDuplicates maxDocFreq drops ubiquitous-shingle candidates") {
    val many = (1L to 40L).map(i => (i, "same boilerplate text here always"))
      .toDF("id", "text")
    val capped = Dedup.jaccardNearDuplicates(many, "id", "text", maxDocFreq = 10)
    assert(capped.count() == 0) // every shingle appears in 40 docs > cap
    // threshold > 1 would slice() a non-positive prefix mid-job;
    // threshold <= 0 would index every shingle (quadratic candidates).
    for (t <- Seq(0.0, -0.1, 1.2))
      intercept[IllegalArgumentException](
        Dedup.jaccardNearDuplicates(many, "id", "text", threshold = t))
  }

  test("dropNearDuplicates keeps group minima and singletons") {
    val kept = Dedup.dropNearDuplicates(corpus, "id", "text", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L)) // 2,3 dropped as neighbors of 1
  }

  test("simhashPairs: exact dup at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, "id", "text")
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("embeddingNearDuplicates finds copies and near-copies via band equi-join") {
    // ids 1/2 identical, 3 a tiny perturbation of 1 (cos > 0.999),
    // 4/5 orthogonal-ish noise that must NOT pair.
    val vecs = Seq(
      (1L, Array.tabulate(32)(i => math.sin(i * 0.7).toFloat)),
      (2L, Array.tabulate(32)(i => math.sin(i * 0.7).toFloat)),
      (3L, Array.tabulate(32)(i => (math.sin(i * 0.7) + 0.001).toFloat)),
      (4L, Array.tabulate(32)(i => math.cos(i * 1.3).toFloat)),
      (5L, Array.tabulate(32)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("id", "vec")
    val out = Dedup.embeddingNearDuplicates(vecs, "id", "vec", threshold = 0.99)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"embedding near-dup must plan as an equi-join, got:\n$plan")
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a >= 4L || b >= 4L })
  }

  test("signBandKeys: identical vectors share all bands, deterministic across calls") {
    val v = Array.tabulate(16)(i => (i * 0.3 - 1.0).toFloat)
    val k1 = graft.functions.VectorOpsUtil.signBandKeys(v.toSeq, 128, 8)
    val k2 = graft.functions.VectorOpsUtil.signBandKeys(v.toSeq, 128, 8)
    assert(k1.length == 8 && k1.sameElements(k2))
  }

  test("minhash bucket cap drops pathological buckets") {
    val many = (1L to 50L).map(i => (i, "identical text here every time ok"))
      .toDF("id", "text")
    val capped = Dedup.minhashCandidates(many, "id", "text", maxBucket = 10)
    assert(capped.count() == 0) // the 50-doc bucket exceeds the cap
    val uncapped = Dedup.minhashCandidates(many, "id", "text", maxBucket = 1000)
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("dedupSegments drops cross-doc repeated lines, keeps order") {
    val docs = Seq(
      (1L, "unique alpha\nshared footer line\nunique beta"),
      (2L, "unique gamma\nshared footer line"),
      (3L, "only unique content here")).toDF("id", "text")
    val out = Dedup.dedupSegments(docs, "id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("unique alpha\nunique beta", 3L, 2L)))
    assert(out(2L) == (("unique gamma", 2L, 1L)))
    assert(out(3L) == (("only unique content here", 1L, 1L)))
  }

  test("dedupSegments keepFirst retains the (min id, min pos) occurrence") {
    val docs = Seq(
      (2L, "dup line\nown two"),
      (1L, "own one\ndup line\ndup line"), // within-doc repeat counts too
      (3L, "dup line")).toDF("id", "text")
    val out = Dedup.dedupSegments(docs, "id", "text", keepFirst = true)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    // Global first occurrence is (id=1, pos=1): doc 1 keeps ONE copy,
    // docs 2 and 3 lose theirs.
    assert(out(1L) == (("own one\ndup line", 2L)))
    assert(out(2L) == (("own two", 1L)))
    assert(out(3L) == (("", 0L)))
    // Default rule drops every occurrence including the first.
    val all = Dedup.dedupSegments(docs, "id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(all(1L) == "own one")
    // Output and internal names are guarded: an idCol named like them
    // would silently shadow a result column or break a join.
    for (bad <- Seq("n_kept", "text_clean", "__pos"))
      intercept[IllegalArgumentException](
        Dedup.dedupSegments(docs.withColumnRenamed("id", bad), bad, "text"))
  }

  test("dedupSegments: minChars exempts short segments; maxOccurrences; empty docs") {
    val docs = Seq(
      (1L, "aa\n\nlong repeated paragraph"),
      (2L, "aa\n\nlong repeated paragraph"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("id", "text")
    // "aa" (2 chars) and blank lines are exempt below minChars=3.
    val out = Dedup.dedupSegments(docs, "id", "text", minChars = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("aa\n", 3L, 2L)))
    assert(out(2L) == (("aa\n", 3L, 2L)))
    assert(out(3L) == (("", 0L, 0L)))
    assert(out(4L) == (("", 0L, 0L)))
    // maxOccurrences = 2 tolerates the pair.
    val loose = Dedup.dedupSegments(docs, "id", "text", minChars = 3,
      maxOccurrences = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(loose(1L) == "aa\n\nlong repeated paragraph")
  }

  test("dedupSegments plans no window and no cartesian") {
    val docs = Seq((1L, "a\nb"), (2L, "b\nc")).toDF("id", "text")
    val plan = Dedup.dedupSegments(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"unexpected cartesian:\n$plan")
  }

  test("dedupLines: first occurrence wins, order kept, NULL stays NULL") {
    def one(s: String): String = Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.dedupLines(col("t")).as("r")).as[String].head()
    assert(one("a\nb\na\nc\nb") == "a\nb\nc")
    assert(one("a\na\na") == "a")
    assert(one("only") == "only")
    assert(one("") == "")
    // Duplicate EMPTY lines collapse too (they are lines): "a\n\n\nb"
    // has two empty lines, one survives.
    assert(one("a\n\n\nb") == "a\n\nb")
    // Trailing newline = trailing empty line; collapses into the
    // interior empty line's first occurrence.
    assert(one("a\n\nb\n") == "a\n\nb")
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextAnalysis.dedupLines(col("t")).as("r")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("keepRepresentative: best (score, id) per group, others untouched") {
    val df = Seq(
      (1L, "short", 5L), (2L, "longer text", 11L), (3L, "longest text!", 13L),
      (4L, "solo", 4L),                    // ungrouped: keeps itself
      (5L, "tie a", 5L), (6L, "tie b", 5L) // equal scores: max id wins
    ).toDF("doc_id", "text", "s")
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "comp")
    val kept = Dedup.keepRepresentative(df, groups, "doc_id", "s")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 6L))
    // NULL scores rank below every non-NULL score.
    val dfN = Seq((1L, Option(7L)), (2L, Option.empty[Long]))
      .toDF("doc_id", "s")
    val gN = Seq((1L, 1L), (2L, 1L)).toDF("id", "comp")
    assert(Dedup.keepRepresentative(dfN, gN, "doc_id", "s")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // Every internal name fails loudly, not as a deep
    // AMBIGUOUS_REFERENCE inside the winner aggregate.
    for (r <- Seq("__graft_mid", "__graft_comp", "__graft_win"))
      intercept[IllegalArgumentException](Dedup.keepRepresentative(
        dfN.withColumn(r, lit(1)), gN, "doc_id", "s"))
  }

  test("duplicatedSpanStats: cross-doc and self-repeated spans, short docs, blanks") {
    val df = Seq(
      (1L, "a b c d e f"),          // 4 windows, shares "a b c","b c d"
      (2L, "x y a b c d q"),        // 5 windows, 2 shared with doc 1
      (3L, "r s t r s t r s t"),    // pure self-repetition: all 7 dup
      (4L, "short"),                // < window words: whole text, unique
      (5L, ""), (6L, null.asInstanceOf[String])) // token-free: no row
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanStats(df, "doc_id", "text", window = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((1L, 4L, 2L, 0.5)))
    assert(got(2L) == ((2L, 5L, 2L, 0.4)))
    assert(got(3L) == ((3L, 7L, 7L, 1.0))) // self-repeats ARE the signal
    assert(got(4L) == ((4L, 1L, 0L, 0.0)))
    // minCount raises the duplication bar: only the 3× span survives it.
    val strict = Dedup.duplicatedSpanStats(df, "doc_id", "text",
      window = 3, minCount = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(strict(3L) == 3L && strict(1L) == 0L)
    intercept[IllegalArgumentException](
      Dedup.duplicatedSpanStats(df, "doc_id", "text", window = 0))
    intercept[IllegalArgumentException](
      Dedup.duplicatedSpanStats(df, "doc_id", "text", minCount = 1))
    intercept[IllegalArgumentException](
      Dedup.duplicatedSpanStats(df.withColumnRenamed("doc_id", "__wh"),
        "__wh", "text"))
  }

  test("snapshotDiff: four statuses, narrow projection before the join") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "a"), (2L, "B2"), (4L, null.asInstanceOf[String]), (5L, "new"))
      .toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(prev, cur, "doc_id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
    // Bodies must not cross the exchange: the join inputs project to
    // (id, digest) only.
    val plan = Dedup.snapshotDiff(prev, cur, "doc_id", Seq("text"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter") || plan.contains("full_outer"),
      s"expected a full outer join:\n$plan")
  }

  test("lshBandsFor/lshCandidateProbability: textbook S-curve values") {
    // t_mid = (1/b)^(1/r): n=64 -> b=8 gives 0.771, b=16 gives 0.5,
    // b=32 gives 0.177 (MMDS 3.4) — the chooser picks the closest
    assert(Dedup.lshBandsFor(64, 0.8) == 8)
    assert(Dedup.lshBandsFor(64, 0.5) == 16)
    assert(Dedup.lshBandsFor(64, 0.2) == 32)
    assert(Dedup.lshBandsFor(128, 0.9) == 8) // (1/8)^(1/16) = 0.878
    // probability formula: exact endpoints and monotonicity
    assert(Dedup.lshCandidateProbability(0.0, 64, 16) == 0.0)
    assert(Dedup.lshCandidateProbability(1.0, 64, 16) == 1.0)
    val p = (1 to 9).map(i => Dedup.lshCandidateProbability(i / 10.0, 64, 16))
    assert(p == p.sorted)
    // midpoint: s = 0.5 with b=16,r=4 crosses ~0.63 (1-(1-0.0625)^16)
    assert(math.abs(p(4) - 0.6439) < 0.001)
    intercept[IllegalArgumentException](Dedup.lshCandidateProbability(0.5, 64, 7))
    intercept[IllegalArgumentException](Dedup.lshBandsFor(64, 1.0))
  }
}

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  // 2-D unit-ish vectors: ids 1..4 near (1,0), ids 11..14 near (0,1)
  private def vecs = Seq(
    (1L, Array(1.0f, 0.00f)), (2L, Array(1.0f, 0.05f)),
    (3L, Array(1.0f, 0.10f)), (4L, Array(1.0f, 0.15f)),
    (11L, Array(0.00f, 1.0f)), (12L, Array(0.05f, 1.0f)),
    (13L, Array(0.10f, 1.0f)), (14L, Array(0.15f, 1.0f)))
    .toDF("id", "vec")

  test("brute-force top-k returns same-cluster neighbors in rank order") {
    val res = Similarity.bruteForceTopK(vecs, vecs.filter(col("id") === 1),
      "id", "vec", k = 3)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    assert(res.map(_._3).toSeq == Seq(2L, 3L, 4L)) // nearest first
    assert(res.head._4 > 0.99)
  }

  test("IVF with cluster centroids reproduces brute-force for clustered data") {
    val centroids = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cent_id", "cent_emb")
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("id") === 11),
      "id", "vec", k = 2).select("q_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, vecs.filter(col("id") === 11), centroids,
      "id", "vec", k = 2, nprobe = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute) // query's own bucket contains all true neighbors
  }

  test("kmeans: every-Nth init, fixed iterations converge to cluster means") {
    // step=4 picks ids 4 and 12 — one init centroid per true cluster.
    val cents = Similarity.kmeans(vecs, "id", "vec", step = 4, iters = 2)
    val m = cents.as[(Long, Array[Float])].collect().toMap
    assert(m.keySet == Set(4L, 12L))
    assert(m(4L).length == 2)
    // cluster A mean = (1.0, 0.075); cluster B mean = (0.075, 1.0)
    assert(math.abs(m(4L)(0) - 1.0f) < 1e-3 && math.abs(m(4L)(1) - 0.075f) < 1e-3)
    assert(math.abs(m(12L)(0) - 0.075f) < 1e-3 && math.abs(m(12L)(1) - 1.0f) < 1e-3)
    val buckets = Similarity.ivfAssign(vecs, cents, "id", "vec")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(buckets(_) == 4L))
    assert((11L to 14L).forall(buckets(_) == 12L))
  }

  test("IVF assignment buckets by nearest centroid") {
    val centroids = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cent_id", "cent_emb")
    val assigned = Similarity.ivfAssign(vecs, centroids, "id", "vec")
    val byBucket = assigned.groupBy("bucket").count()
      .as[(Long, Long)].collect().toMap
    assert(byBucket == Map(100L -> 4L, 200L -> 4L))
    // The argmax must be an aggregate with a map-side partial (reduces
    // each id's |C| rows before the exchange), never a window sort over
    // the N×|C| cross product.
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ivfAssign must not plan a window:\n$plan")
    assert(plan.contains("partial_max_by") || plan.contains("partial max_by") ||
      plan.toLowerCase.contains("max_by"), s"expected max_by aggregate:\n$plan")
  }

}

class ScriptDetectSpec extends SparkSpec {
  test("scriptCounts/dominantScript: per-block counts, priority ties, unknown") {
    import spark.implicits._
    val rows = Seq(
      (1L, "hello world"),                    // latin
      (2L, "\u041f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"), // cyrillic
      (3L, "\u0645\u0631\u062d\u0628\u0627"),                    // arabic
      (4L, "\uc548\ub155\ud558\uc138\uc694"),                    // hangul syllables
      (5L, "\u3053\u3093\u306b\u3061\u306f"),                    // hiragana
      (6L, "\u4f60\u597d\u4e16\u754c"),                          // han
      (7L, "12345 !!! \ud83d\ude00"),                         // no script at all
      (8L, "ab \u4f60\u597d"),                               // 2 latin vs 2 han: tie
      (9L, null.asInstanceOf[String]),
      (10L, "caf\u00e9 \u00d7 2"))                              // accents count, x sign not
    val df = rows.toDF("id", "t")
    val out = df.select(col("id"),
        graft.ops.TextAnalysis.dominantScript(col("t")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "latin" && out(2L) == "cyrillic" &&
      out(3L) == "arabic" && out(4L) == "hangul" && out(5L) == "kana" &&
      out(6L) == "han")
    assert(out(7L) == "unknown" && out(9L) == "unknown")
    assert(out(8L) == "latin") // tie resolves to priority order
    assert(out(10L) == "latin")
    val counts = df.filter(col("id") === 10L)
      .select(graft.ops.TextAnalysis.scriptCounts(col("t"))
        .map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(counts.getAs[Long]("latin") == 4L) // c a f e-acute; x-sign excluded
    assert(counts.getAs[Long]("han") == 0L)
    // minChars raises the evidence bar
    val strict = df.filter(col("id") === 8L)
      .select(graft.ops.TextAnalysis.dominantScript(col("t"), minChars = 3)
        .as("s")).as[String].collect()(0)
    assert(strict == "unknown")
  }

  test("bm25: idf ordering, length normalization, zero for non-matching") {
    import spark.implicits._
    // "rare" appears in 1 of 4 docs, "common" in 3 of 4
    val df = Seq(
      (1L, "rare common alpha beta"),
      (2L, "common alpha beta gamma"),
      (3L, "common alpha alpha alpha beta gamma delta epsilon"),
      (4L, "zeta eta theta iota")).toDF("id", "text")
    val out = TextAnalysis.bm25(df, "id", "text", Seq("rare", "common"))
      .select("id", "n_tok", "bm25").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 4 matches nothing -> exactly 0
    assert(out(4L)._2 == 0.0)
    // doc 1 (rare + common) outranks doc 2 (common only)
    assert(out(1L)._2 > out(2L)._2)
    // same tf of "common" but doc 3 is longer -> lower score (b>0)
    assert(out(2L)._2 > out(3L)._2)
    assert(out(3L)._1 == 8L)
    // hand-check doc 2: N=4, df_common=3, avgdl=20/4=5, dl=4, tf=1
    val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    val expected = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 4.0 / 5.0))
    assert(math.abs(out(2L)._2 - expected) < 1e-12)
  }

  test("bm25: NULL text scores 0 but counts toward N and avgdl; guards") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, null)).toDF("id", "text")
    val out = TextAnalysis.bm25(df, "id", "text", Seq("x"))
      .select("id", "n_tok", "bm25").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(2L) == ((0L, 0.0)))
    // N=2, df_x=1, avgdl=1: the null doc halves avgdl
    val idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    val expected = idf * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 2.0 / 1.0))
    assert(math.abs(out(1L)._2 - expected) < 1e-12)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(df, "id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(df, "id", "text", Seq("x", "x"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(df.withColumn("bm25",
        org.apache.spark.sql.functions.lit(1)), "id", "text", Seq("x"))
    }
  }

  test("bm25: k1=0, b=1 and all-empty corpora score 0, never NaN") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, "z")).toDF("id", "text")
    val k0 = TextAnalysis.bm25(df, "id", "text", Seq("x"), k1 = 0.0)
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(k0(2L) == 0.0 && !k0(1L).isNaN && k0(1L) > 0.0)
    val b1 = TextAnalysis.bm25(Seq((1L, "x"), (2L, null))
        .toDF("id", "text"), "id", "text", Seq("x"), b = 1.0)
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(b1(2L) == 0.0 && b1(1L) > 0.0)
    val empty = TextAnalysis.bm25(Seq((1L, ""), (2L, null))
        .toDF("id", "text"), "id", "text", Seq("x"))
      .select("bm25").as[Double].collect()
    assert(empty.forall(_ == 0.0))
  }

  test("trainQualityWeights: learns a token signal, round-trips weights") {
    import spark.implicits._
    val docs = (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, s"table scan join w$i x$i", 1.0)
      else (i.toLong, s"alpha$i beta$i gamma delta", 0.0)
    }.toDF("id", "text", "y")
    val m = TextAnalysis.trainQualityWeights(docs, "id", "text", "y",
      dim = 64, iters = 8, lr = 2.0)
    val scored = docs
      .select($"y", m.score($"text").as("s")).as[(Double, Double)]
      .collect()
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.sum / pos.length > neg.sum / neg.length,
      "trained model did not separate labeled classes")
    // save -> load -> identical model drives the same scorer
    val dir = tmpDir("logreg").resolve("weights.parquet").toString
    TextAnalysis.saveWeights(spark, m, dir)
    val loaded = TextAnalysis.loadWeights(spark, dir)
    assert(loaded.weights == m.weights && loaded.bias == m.bias)
    intercept[IllegalArgumentException] {
      TextAnalysis.trainQualityWeights(docs, "id", "text", "y", dim = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainQualityWeights(docs, "id", "text", "y", 64,
        iters = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainQualityWeights(
        docs.filter($"id" > 99), "id", "text", "y", 64)
    }
  }
}
