package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interpolated Kneser–Ney bigram LM ([[LanguageModel]]): hand-derived
  * probabilities, per-context normalization, out-of-model backoff, and
  * the self-score composition.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  // Training corpus: one doc "a b a b c".
  // Bigram counts: (a,b)=2 (b,a)=1 (b,c)=1; c(a,•)=2, c(b,•)=2;
  // N1+(a,•)=1, N1+(b,•)=2; N1+(•,a)=N1+(•,b)=N1+(•,c)=1; B=3 types.
  // With D=0.75: P(b|a)=0.75, P(a|b)=P(c|b)=0.375, P(b|b)=0.25.
  private def train = Seq((1L, "a b a b c")).toDF("doc_id", "text")

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Double, Double)] =
    LanguageModel.kneserNeyScore(train, docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "n_bigrams", "kn_logprob", "kn_ppl")
      .as[(Long, Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-derived doc score: ln P summed over the doc's bigrams") {
    val got = LanguageModel.kneserNeySelfScore(train, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length === 1)
    val (_, n, lp, ppl) = got.head
    val expected = (2 * math.log(0.75) + 2 * math.log(0.375)) / 4
    assert(n === 4L)
    assert(math.abs(lp - expected) < eps)
    assert(math.abs(ppl - math.exp(-expected)) < eps)
  }

  test("per-context probabilities normalize to 1 over the vocabulary") {
    // Context 'b' can continue to a, b, c: 0.375 + 0.25 + 0.375 = 1.
    val got = score(Seq((10L, "b a"), (11L, "b b"), (12L, "b c")))
    val pSum = got.values.map { case (_, lp, _) => math.exp(lp) }.sum
    assert(math.abs(pSum - 1.0) < eps)
    // Context 'a': seen continuation b takes 0.75, the discount mass
    // spreads 0.25/3 over each of a, b, c via Pcont — checks the
    // interpolation term: P(a|a) = (0 + 0.75*1*(1/3))/2 = 0.125.
    val aSide = score(Seq((20L, "a a"), (21L, "a b"), (22L, "a c")))
    assert(math.abs(math.exp(aSide(21L)._2) - 0.75) < eps)
    assert(math.abs(math.exp(aSide(20L)._2) - 0.125) < eps)
    val aSum = aSide.values.map { case (_, lp, _) => math.exp(lp) }.sum
    assert(math.abs(aSum - 1.0) < eps)
  }

  test("unseen context backs off to continuation probability") {
    // 'z' never appeared as a context: P(a|z) = Pcont(a) = 1/3.
    val got = score(Seq((30L, "z a")))
    assert(math.abs(math.exp(got(30L)._2) - 1.0 / 3) < eps)
  }

  test("unseen continuation floors at D/B, never -inf") {
    // 'q' never appeared at all: P(q|z) = D/B = 0.75/3 = 0.25.
    val got = score(Seq((40L, "z q")))
    assert(math.abs(math.exp(got(40L)._2) - 0.25) < eps)
    assert(!got(40L)._2.isNegInfinity)
  }

  test("docs with fewer than two tokens emit no row") {
    val got = score(Seq((50L, "solo"), (51L, ""), (52L, "x y")))
    assert(got.keySet === Set(52L))
  }

  test("multi-doc training counts pool across documents") {
    val t2 = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // c(a,b)=2 c(a,c)=1 c(a,•)=3 N1+(a,•)=2 B=2, Pcont(b)=Pcont(c)=1/2.
    // P(b|a) = (1.25 + 0.75*2*0.5)/3 = 2/3.
    val got = LanguageModel.kneserNeyScore(t2,
        Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "kn_logprob").as[(Long, Double)].collect().toMap
    assert(math.abs(math.exp(got(9L)) - 2.0 / 3) < eps)
  }

  test("reserved output names are rejected on the score frame") {
    val bad = Seq((1L, "a b", 0.0)).toDF("doc_id", "text", "kn_ppl")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.kneserNeyScore(train, bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("kn_ppl"))
  }

  test("discount outside (0,1) is rejected") {
    for (d <- Seq(0.0, 1.0, -0.5, 1.5)) {
      val e = intercept[IllegalArgumentException] {
        LanguageModel.kneserNeyScore(train, train, "doc_id", "text", d)
      }
      assert(e.getMessage.contains("discount"))
    }
  }

  // ------------------------------------------------------------------
  // Trigram KN with recursive backoff. Same train corpus "a b a b c".
  // Trigram counts: (a,b,a)=1 (b,a,b)=1 (a,b,c)=1.
  // c12: (a,b) cw12=2 N1+=2; (b,a) cw12=1 N1+=1.
  // cont2: (b,a)=1 (a,b)=1 (b,c)=1; c2: b cw2cont=2 n2typ=2; a 1/1.
  // Unigram level: B=3, N1+(•,x)=1 ∀x∈{a,b,c} → P1 = 1/3.
  // P2(a|b)=P2(c|b)=(0.25+0.75·2/3)/2=0.375, P2(b|a)=(0.25+0.25)/1=0.5.
  // P3(a|ab)=P3(c|ab)=(0.25+1.5·0.375)/2=0.40625,
  // P3(b|ba)=(0.25+0.75·0.5)/1=0.625.
  // ------------------------------------------------------------------

  private def score3(docs: Seq[(Long, String)]): Map[Long, (Long, Double, Double)] =
    LanguageModel.kneserNey3Score(train, docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "n_trigrams", "kn3_logprob", "kn3_ppl")
      .as[(Long, Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("kn3: hand-derived self-score over the doc's three trigrams") {
    val got = LanguageModel.kneserNey3SelfScore(train, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length === 1)
    val (_, n, lp, ppl) = got.head
    val expected =
      (2 * math.log(0.40625) + math.log(0.625)) / 3
    assert(n === 3L)
    assert(math.abs(lp - expected) < eps)
    assert(math.abs(ppl - math.exp(-expected)) < eps)
  }

  test("kn3: per-context probabilities normalize to 1 over the vocab") {
    // Context (a,b): seen a, c at 0.40625 each; unseen b interpolates
    // through P2(b|b) = (0 + 0.75·2·(1/3))/2 = 0.25 →
    // P3(b|a,b) = (0 + 1.5·0.25)/2 = 0.1875. Sum = 1.
    val got = score3(Seq((10L, "a b a"), (11L, "a b b"), (12L, "a b c")))
    assert(math.abs(math.exp(got(10L)._2) - 0.40625) < eps)
    assert(math.abs(math.exp(got(11L)._2) - 0.1875) < eps)
    val pSum = got.values.map { case (_, lp, _) => math.exp(lp) }.sum
    assert(math.abs(pSum - 1.0) < eps)
  }

  test("kn3: unseen (w1,w2) context backs off to the bigram level") {
    // (z,a) never seen as a trigram context → P = P2(b|a) = 0.5.
    val got = score3(Seq((30L, "z a b")))
    assert(math.abs(math.exp(got(30L)._2) - 0.5) < eps)
  }

  test("kn3: unseen middle context backs off to unigram continuation") {
    // w2 = z never seen: P(b|a,z) = P1(b) = 1/3; unseen w3 floors at
    // D/B = 0.25 — never -inf.
    val got = score3(Seq((40L, "a z b"), (41L, "a z q")))
    assert(math.abs(math.exp(got(40L)._2) - 1.0 / 3) < eps)
    assert(math.abs(math.exp(got(41L)._2) - 0.25) < eps)
    assert(!got(41L)._2.isNegInfinity)
  }

  test("kn3: docs with fewer than three tokens emit no row") {
    val got = score3(Seq((50L, "x y"), (51L, ""), (52L, "x y z")))
    assert(got.keySet === Set(52L))
  }

  test("kn3: reserved output names and bad discounts are rejected") {
    val bad = Seq((1L, "a b c", 0.0)).toDF("doc_id", "text", "kn3_ppl")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.kneserNey3Score(train, bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("kn3_ppl"))
    val e2 = intercept[IllegalArgumentException] {
      LanguageModel.kneserNey3Score(train, train, "doc_id", "text", 1.5)
    }
    assert(e2.getMessage.contains("discount"))
  }

  test("ARPA load + Katz backoff score: every branch hand-derived") {
    import spark.implicits._
    val arpa = Seq(
      "\\data\\", "ngram 1=4", "ngram 2=3", "ngram 3=2", "",
      "\\1-grams:",
      "-0.5\ta\t-0.2", "-0.7\tb\t-0.3", "-1.0\tc", "-2.0\t<unk>", "",
      "\\2-grams:",
      "-0.4\ta b\t-0.1", "-0.6\tb c", "-0.9\tb a", "",
      "\\3-grams:",
      "-0.3\ta b c", "-0.8\tb a b", "",
      "\\end\\").mkString("\n")
    val f = tmpDir("arpa").resolve("m.arpa")
    write(f, arpa)
    val model = LanguageModel.loadArpa(spark, f.toString)
    assert(model.uni.count() == 4 && model.bi.count() == 3 &&
      model.tri.count() == 2)
    // backoff present/absent parsed correctly
    val cBo = model.uni.filter(col("w") === "c").select("bo")
      .collect().head.isNullAt(0)
    assert(cBo, "absent backoff must be NULL")
    val docs = Seq(
      (1L, "a b c"),   // trigram hit → −0.3
      (3L, "a b a"),   // bo(a,b) −0.1 + lp2(b,a) −0.9 → −1.0
      (4L, "b c a"),   // NULL bo → 0; unigram a −0.5
      (5L, "c c z"),   // OOV → <unk> −2.0
      (6L, "a b c a"), // mean(−0.3, −0.5) = −0.4
      (7L, "a b"), (8L, null: String)).toDF("doc_id", "text")
    val got = LanguageModel.arpaScore(model, docs, "doc_id", "text")
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_trigrams"),
        round(col("arpa_logprob"), 4), round(col("arpa_ppl"), 4))
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, -0.3, 1.9953),
      (3L, 1L, -1.0, 10.0),
      (4L, 1L, -0.5, 3.1623),
      (5L, 1L, -2.0, 100.0),
      (6L, 2L, -0.4, 2.5119)))
    intercept[IllegalArgumentException] {
      LanguageModel.arpaScore(model,
        docs.withColumn("arpa_ppl", lit(1.0)), "doc_id", "text")
    }
  }

  test("ARPA export round-trips: saved model scores exactly like in-engine KN3") {
    import spark.implicits._
    val train = Seq(
      (101L, "the cat sat on the mat and the cat ran"),
      (102L, "the dog sat on the rug and the dog slept"),
      (103L, "a cat and a dog sat on the mat together today")).toDF("doc_id", "text")
    // probes exercise every branch: seen trigrams, unseen trigram with
    // seen context, unseen context, unseen middle, full OOV
    val probe = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat slept on the rug"),
      (3L, "dog ran today and slept"),
      (4L, "zebra quokka wombat xylophone"),
      (5L, "a dog ran on a mat and a cat slept")).toDF("doc_id", "text")
    val kn = LanguageModel.kneserNey3Score(train, probe, "doc_id", "text")
      .select("doc_id", "n_trigrams", "kn3_logprob", "kn3_ppl")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val path = tmpDir("arpaexp").resolve("kn3.arpa").toString
    LanguageModel.saveKn3Arpa(train, "doc_id", "text", path)
    val m = LanguageModel.loadArpa(spark, path)
    val ar = LanguageModel.arpaScore(m, probe, "doc_id", "text")
      .select("doc_id", "n_trigrams", "arpa_logprob", "arpa_ppl")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(kn.keySet == ar.keySet && kn.nonEmpty)
    for (id <- kn.keys) {
      assert(kn(id)._2 == ar(id)._2, s"trigram count drift on doc $id")
      // base change: kn3_logprob is ln, arpa_logprob is log10 — the
      // perplexities must agree to float noise
      val (pKn, pAr) = (kn(id)._4, ar(id)._4)
      assert(math.abs(pKn - pAr) / pKn < 1e-9,
        s"doc $id: kn3_ppl=$pKn arpa_ppl=$pAr")
      assert(math.abs(kn(id)._3 - ar(id)._3 * math.log(10.0)) < 1e-9,
        s"doc $id: logprob base mismatch")
    }
    // the file parses as text (headers + 3 sections + end marker)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(txt.startsWith("\\data\\"))
    assert(txt.contains("\\1-grams:") && txt.contains("\\2-grams:") &&
      txt.contains("\\3-grams:") && txt.trim.endsWith("\\end\\"))
    assert(txt.contains("<unk>"))
  }

  /** Section-split an exported ARPA file into (unigram words,
    * bigram/trigram word sets) for closure checks.
    */
  private def arpaSections(path: String): (Set[String], Set[String]) = {
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    val grams = lines.flatMap { l =>
      val f = l.split("\t")
      if (f.length >= 2 && scala.util.Try(f(0).toDouble).isSuccess)
        Some(f(1).split(" ").toSeq)
      else None
    }
    val uni = grams.filter(_.length == 1).map(_.head).toSet
    val higher = grams.filter(_.length >= 2).flatten.toSet
    (uni, higher)
  }

  test("ARPA export: every word in a 2/3-gram entry has a 1-gram entry") {
    import spark.implicits._
    // "zzz" starts doc 2 and never appears in second position anywhere
    // else → it is NOT in the continuation vocabulary, but it IS a
    // trigram context word, so strict consumers need its unigram entry
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zzz cat ran off")).toDF("doc_id", "text")
    val path = tmpDir("arpaclosure").resolve("kn3.arpa").toString
    LanguageModel.saveKn3Arpa(train, "doc_id", "text", path)
    val (uni, higher) = arpaSections(path)
    assert(higher.subsetOf(uni),
      s"words missing a unigram entry: ${(higher -- uni).mkString(", ")}")
    assert(uni.contains("zzz") && uni.contains("<unk>"))
    // the doc-initial-only word carries the D/B floor, same value the
    // in-engine score resolves it to, and the header count matches
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    val zzzLp = lines.collectFirst {
      case l if l.split("\t").length >= 2 && l.split("\t")(1) == "zzz" =>
        l.split("\t")(0).toDouble
    }.get
    val unkLp = lines.collectFirst {
      case l if l.split("\t").length >= 2 && l.split("\t")(1) == "<unk>" =>
        l.split("\t")(0).toDouble
    }.get
    assert(math.abs(zzzLp - unkLp) < 1e-12) // both = log10(D/B)
    val n1Declared = lines.collectFirst {
      case l if l.startsWith("ngram 1=") => l.stripPrefix("ngram 1=").toInt
    }.get
    assert(n1Declared == uni.size)
  }

  test("ARPA export: literal corpus '<unk>' round-trips exactly via the reserved spelling") {
    import spark.implicits._
    // "<unk>" is an ordinary, frequent corpus token here — its real
    // continuation statistics must survive the export, not collapse
    // into the OOV floor
    val train = Seq(
      (1L, "the <unk> sat on the <unk> today"),
      (2L, "a <unk> ran past the <unk> mat"),
      (3L, "the cat sat on the mat")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "the <unk> sat on the mat"),
      (11L, "cat <unk> zebra ran")).toDF("doc_id", "text")
    val kn = LanguageModel.kneserNey3Score(train, probe, "doc_id", "text")
      .select("doc_id", "kn3_ppl").as[(Long, Double)].collect().toMap
    val path = tmpDir("arpaunk").resolve("kn3.arpa").toString
    LanguageModel.saveKn3Arpa(train, "doc_id", "text", path)
    val m = LanguageModel.loadArpa(spark, path)
    val ar = LanguageModel.arpaScore(m, probe, "doc_id", "text",
        escapeLiteralUnk = true)
      .select("doc_id", "arpa_ppl").as[(Long, Double)].collect().toMap
    for (id <- kn.keys)
      assert(math.abs(kn(id) - ar(id)) / kn(id) < 1e-9,
        s"doc $id: kn3_ppl=${kn(id)} arpa_ppl=${ar(id)}")
    // the reserved spelling is in the file with REAL statistics (its
    // lp differs from the floor), and the OOV entry is still present
    val (uni, _) = arpaSections(path)
    assert(uni.contains(LanguageModel.LiteralUnkSpelling))
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    def lpOf(w: String): Double = lines.collectFirst {
      case l if l.split("\t").length >= 2 && l.split("\t")(1) == w =>
        l.split("\t")(0).toDouble
    }.get
    assert(lpOf(LanguageModel.LiteralUnkSpelling) > lpOf("<unk>"))
    // without the matching remap, the literal token hits the OOV entry
    // (external-model semantics) — scores must then DIFFER
    val arNoEsc = LanguageModel.arpaScore(m, probe, "doc_id", "text")
      .select("doc_id", "arpa_ppl").as[(Long, Double)].collect().toMap
    assert(math.abs(kn(10L) - arNoEsc(10L)) / kn(10L) > 1e-9)
  }

  // ---- order-N ARPA (the 5-gram shape CCNet's published KenLM
  // models actually are) -------------------------------------------

  private def write5gramArpa(dir: java.nio.file.Path): String = {
    val arpa = Seq(
      "\\data\\", "ngram 1=6", "ngram 2=4", "ngram 3=3", "ngram 4=2",
      "ngram 5=1", "",
      "\\1-grams:",
      "-0.5\ta\t-0.05", "-0.6\tb\t-0.06", "-0.7\tc\t-0.07",
      "-0.8\td\t-0.08", "-0.9\te", "-3.0\t<unk>", "",
      "\\2-grams:",
      "-0.4\ta b\t-0.02", "-0.45\tb c\t-0.03", "-0.5\tc d\t-0.04",
      "-0.55\td e", "",
      "\\3-grams:",
      "-0.3\ta b c\t-0.01", "-0.35\tb c d\t-0.015", "-0.38\tc d e", "",
      "\\4-grams:",
      "-0.2\ta b c d\t-0.005", "-0.25\tb c d e", "",
      "\\5-grams:",
      "-0.1\ta b c d e", "",
      "\\end\\").mkString("\n")
    val f = dir.resolve("m5.arpa")
    java.nio.file.Files.write(f,
      arpa.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toString
  }

  test("loadArpaN: per-order frames with lp/bo, header lines dropped") {
    val path = write5gramArpa(tmpDir("arpa5"))
    val m = LanguageModel.loadArpaN(spark, path)
    assert(m.maxOrder == 5)
    assert(m.grams.keySet == Set(1, 2, 3, 4, 5))
    assert((1 to 5).map(k => m.grams(k).count()) == Seq(6L, 4L, 3L, 2L, 1L))
    val bcd = m.grams(3).filter(col("w1") === "b" && col("w2") === "c" &&
      col("w3") === "d").head()
    assert(bcd.getAs[Double]("lp") == -0.35 &&
      bcd.getAs[Double]("bo") == -0.015)
    val cde = m.grams(3).filter(col("w3") === "e").head()
    assert(cde.isNullAt(cde.fieldIndex("bo"))) // absent backoff is NULL
  }

  test("5-gram Katz lookup: every backoff depth hand-derived") {
    import spark.implicits._
    val path = write5gramArpa(tmpDir("arpa5s"))
    val m = LanguageModel.loadArpaN(spark, path)
    val docs = Seq(
      (1L, "a b c d e"),   // direct 5-gram: -0.1
      // bo4(a b c d) -0.005 + bo3(b c d) -0.015 + bo2(c d) -0.04 +
      // bo1(d) -0.08 + <unk> -3.0 = -3.14
      (2L, "a b c d x"),
      (3L, "x a b c d"),   // bo4 absent -> 0 + lp4(a b c d) = -0.2
      (4L, "b c d e e"),   // falls through to lp1(e) = -0.9
      (5L, "x b c d e"),   // 0 + lp4(b c d e) = -0.25
      (6L, "x x c d e"),   // 0 + 0 + lp3(c d e) = -0.38
      (7L, "a b c d e f"), // (-0.1 + -3.0) / 2 = -1.55
      (8L, "a b c d"),     // < 5 tokens: no row
      (9L, null: String))
      .toDF("doc_id", "text")
    val got = LanguageModel.arpaScoreN(m, docs, "doc_id", "text")
      .select("doc_id", "n_ngrams", "arpa_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val want = Map(1L -> -0.1, 2L -> -3.14, 3L -> -0.2, 4L -> -0.9,
      5L -> -0.25, 6L -> -0.38, 7L -> -1.55)
    assert(got.keySet == want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id)._3 - w) < 1e-9, s"doc $id: ${got(id)._3} != $w")
    assert(got(7L)._2 == 2L)
  }

  test("order-N scorer on a trigram file agrees with the dedicated trigram path") {
    import spark.implicits._
    val train = Seq(
      (1L, "the cat sat on the mat and ran"),
      (2L, "a dog sat on a rug and slept")).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog ran on the rug and more"),
      (3L, "zebra quokka wombat x y")).toDF("doc_id", "text")
    val path = tmpDir("arpa3n").resolve("m3.arpa").toString
    LanguageModel.saveKn3Arpa(train, "doc_id", "text", path)
    val a3 = LanguageModel.arpaScore(LanguageModel.loadArpa(spark, path),
        probe, "doc_id", "text")
      .select("doc_id", "arpa_logprob").as[(Long, Double)].collect().toMap
    val aN = LanguageModel.arpaScoreN(LanguageModel.loadArpaN(spark, path),
        probe, "doc_id", "text")
      .select("doc_id", "arpa_logprob").as[(Long, Double)].collect().toMap
    assert(a3.keySet == aN.keySet && a3.nonEmpty)
    for (id <- a3.keys)
      assert(math.abs(a3(id) - aN(id)) < 1e-12, s"doc $id")
  }

  // ---- generic order-N KN (knTrain, 2..5) --------------------------

  test("knTrain(3) scores identically to the dedicated trigram path") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat and the cat ran"),
      (2L, "a dog sat on a rug and slept"),
      (3L, "xy zq"),          // 2 tokens: below order, contributes types only
      (4L, "solo"),           // 1 token
      (5L, "the mat ran")).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog ran on a mat and slept more"),
      (3L, "zebra quokka wombat"),
      (4L, "xy zq the")).toDF("doc_id", "text")
    val m = LanguageModel.knTrain(corpus, "doc_id", "text", 3)
    val got = m.score(probe, "doc_id", "text")
      .select("doc_id", "n_ngrams", "kn_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val want = LanguageModel.kneserNey3Score(corpus, probe, "doc_id", "text")
      .select("doc_id", "n_trigrams", "kn3_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    m.unpersist()
    assert(got.keySet == want.keySet && got.nonEmpty)
    for (id <- got.keys) {
      assert(got(id)._2 == want(id)._2, s"gram count drift on doc $id")
      assert(math.abs(got(id)._3 - want(id)._3) < 1e-12, s"doc $id")
    }
  }

  test("order-4 KN: per-context probabilities normalize to 1 over the vocab") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b c a b a")).toDF("doc_id", "text")
    val m = LanguageModel.knTrain(corpus, "doc_id", "text", 4)
    // seen 4-gram context (a, b, a) and an UNSEEN context: both must
    // distribute mass 1 over the vocabulary {a, b, c}
    for (ctx <- Seq("a b a", "c c b")) {
      val probes = Seq("a", "b", "c").zipWithIndex
        .map { case (w, i) => (i.toLong, s"$ctx $w") }
        .toDF("doc_id", "text")
      val ps = m.score(probes, "doc_id", "text")
        .select("kn_logprob").as[Double].collect().map(math.exp)
      assert(math.abs(ps.sum - 1.0) < 1e-9, s"ctx '$ctx': ${ps.sum}")
    }
    m.unpersist()
  }

  test("order-5 export round-trips exactly through loadArpaN + arpaScoreN") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat and the cat ran off today"),
      (2L, "a dog sat on a rug and a dog slept well there"),
      (3L, "the cat ran on the rug and slept near the mat")).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "the cat sat on the mat and ran"),
      (2L, "a dog ran on the mat today"),
      (3L, "zebra quokka wombat xylophone yak")).toDF("doc_id", "text")
    val m = LanguageModel.knTrain(corpus, "doc_id", "text", 5)
    val path = tmpDir("kn5").resolve("m5.arpa").toString
    m.saveArpa(path)
    val direct = m.score(probe, "doc_id", "text")
      .select("doc_id", "n_ngrams", "kn_ppl")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    m.unpersist()
    val viaFile = LanguageModel.arpaScoreN(
        LanguageModel.loadArpaN(spark, path), probe, "doc_id", "text",
        escapeLiteralUnk = true)
      .select("doc_id", "n_ngrams", "arpa_ppl")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(direct.keySet == viaFile.keySet && direct.nonEmpty)
    for (id <- direct.keys) {
      assert(direct(id)._2 == viaFile(id)._2, s"gram count drift doc $id")
      assert(math.abs(direct(id)._3 - viaFile(id)._3) / direct(id)._3 < 1e-9,
        s"doc $id: direct=${direct(id)._3} file=${viaFile(id)._3}")
    }
    // strict-consumer closure at every order: words of each k-gram
    // entry all have (k-1)-gram coverage of their prefixes/suffixes
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    val grams = lines.flatMap { l =>
      val f = l.split("\t")
      if (f.length >= 2 && scala.util.Try(f(0).toDouble).isSuccess)
        Some(f(1).split(" ").toSeq)
      else None
    }
    val byLen = grams.groupBy(_.length)
    assert(byLen.keySet == Set(1, 2, 3, 4, 5))
    val uni = byLen(1).map(_.head).toSet
    for (k <- 2 to 5; g <- byLen(k))
      assert(g.forall(uni.contains), s"uncovered word in ${g.mkString(" ")}")
  }

  test("knTrain(3) export is byte-identical to the dedicated trigram export") {
    import spark.implicits._
    // all docs ≥ 3 tokens: the two paths' entry sets provably coincide
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog sat on a rug today"),
      (3L, "the dog ran off")).toDF("doc_id", "text")
    val d = tmpDir("kn3eq")
    LanguageModel.saveKn3Arpa(corpus, "doc_id", "text",
      d.resolve("ded.arpa").toString)
    val m = LanguageModel.knTrain(corpus, "doc_id", "text", 3)
    m.saveArpa(d.resolve("gen.arpa").toString)
    m.unpersist()
    val a = java.nio.file.Files.readAllBytes(d.resolve("ded.arpa"))
    val b = java.nio.file.Files.readAllBytes(d.resolve("gen.arpa"))
    assert(java.util.Arrays.equals(a, b),
      "generic order-3 export diverged from the dedicated path")
  }

  test("knTrain guards: order and discount ranges") {
    intercept[IllegalArgumentException] {
      LanguageModel.knTrain(train, "doc_id", "text", 1)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.knTrain(train, "doc_id", "text", 6)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.knTrain(train, "doc_id", "text", 3, discount = 1.0)
    }
  }

  test("knTrain(5): words from docs shorter than n-1 tokens reach the vocabulary") {
    import spark.implicits._
    // doc 3 has only 3 tokens — fewer than n-1 = 4. Its tail frame must
    // keep the whole token array (slice(t, -4, 4) on a 3-element array
    // returns EMPTY in Spark), or 'zeph', 'quill', 'vorn' silently
    // vanish from every type set and the exported unigram section.
    val corpus = Seq(
      (1L, "the cat sat on the mat and the cat ran off today"),
      (2L, "a dog sat on a rug and a dog slept well there"),
      (3L, "zeph quill vorn")).toDF("doc_id", "text")
    val m = LanguageModel.knTrain(corpus, "doc_id", "text", 5)
    val path = tmpDir("kn5short").resolve("m.arpa").toString
    m.saveArpa(path)
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    val uni = lines.flatMap { l =>
      val f = l.split("\t")
      if (f.length >= 2 && scala.util.Try(f(0).toDouble).isSuccess &&
          !f(1).contains(" ")) Some(f(1)) else None
    }.toSet
    for (w <- Seq("zeph", "quill", "vorn"))
      assert(uni.contains(w), s"short-doc word '$w' missing from unigrams")
    // the 3-token doc also contributes its bigrams/trigram to the
    // lower-order sections
    val grams = lines.flatMap { l =>
      val f = l.split("\t")
      if (f.length >= 2 && scala.util.Try(f(0).toDouble).isSuccess)
        Some(f(1)) else None
    }.toSet
    assert(grams.contains("zeph quill") && grams.contains("quill vorn"),
      "short-doc bigrams missing")
    assert(grams.contains("zeph quill vorn"), "short-doc trigram missing")
    // and scoring a probe that uses those words must see non-OOV mass
    // (probe needs >= 5 tokens: order-5 scoring emits no row otherwise)
    val probe = Seq((9L, "zeph quill vorn zeph quill")).toDF("doc_id", "text")
    val scored = m.score(probe, "doc_id", "text")
      .select("kn_ppl").as[Double].collect()
    m.unpersist()
    assert(scored.length == 1 && scored.head > 0 && !scored.head.isNaN)
  }
}
