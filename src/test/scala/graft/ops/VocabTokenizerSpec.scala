package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("cust", "omer", "slo", "the", "th", "e",
    "a", "b", "c", "s", "t", "k", "y")

  private def counts(text: String): (Int, Int) = {
    val c = VocabTokenizer.tokenCounts(col("t"), vocab)
    val r = Seq(text).toDF("t").select(c.as("c"))
      .select(col("c.n_tokens"), col("c.n_unk")).collect().head
    (r.getInt(0), r.getInt(1))
  }

  test("greedy longest match wins over shorter prefixes") {
    // "the" beats "th" beats "t": one token
    assert(counts("the") == (1, 0))
    // "customer": cust + omer — 2 tokens, no unknowns
    assert(counts("customer") == (2, 0))
  }

  test("unknown characters count one token each and advance one char") {
    // "slow": slo + w(unk)
    assert(counts("slow") == (2, 1))
    // "www": 3 unknown tokens
    assert(counts("www") == (3, 3))
  }

  test("unknown supplementary character is ONE token, not two code units") {
    // U+1F600 (😀, a surrogate pair in UTF-16) with no vocab match:
    // one unknown token — unit-wise advance would count 2 and probe
    // the vocab with lone surrogates.
    assert(counts("😀") == (1, 1))
    // the + 😀: vocab token then one unknown
    assert(counts("the😀") == (2, 1))
    // 😀😀: two unknown tokens exactly
    assert(counts("😀😀") == (2, 2))
  }

  test("multi-word text sums per-word counts; whitespace runs ignored") {
    // "the  customer\tslow" → 1 + 2 + 2 tokens, 1 unk
    assert(counts("the  customer\tslow") == (5, 1))
    assert(counts("   ") == (0, 0))
    assert(counts("") == (0, 0))
  }

  test("null text counts zero, not null") {
    val c = VocabTokenizer.tokenCounts(col("t"), vocab)
    val r = Seq((1, null: String)).toDF("i", "t").select(c.as("c"))
      .select(col("c.n_tokens")).collect().head
    assert(r.getInt(0) == 0)
  }

  test("segmentation is greedy, not optimal: documented trade") {
    // vocab {ab, bc, a, c}: "abc" → greedy ab+c = 2; optimal a+bc = 2 —
    // equal here, but "abd" with vocab {ab, abd-prefix-free}: greedy
    // takes the longest at EACH position, never backtracks.
    val v2 = Seq("ab", "bc", "a", "c")
    val c = VocabTokenizer.tokenCounts(col("t"), v2)
    val r = Seq("abc").toDF("t").select(c.as("c"))
      .select(col("c.n_tokens"), col("c.n_unk")).collect().head
    assert((r.getInt(0), r.getInt(1)) == (2, 0)) // ab + c
  }

  test("loadVocab parses BPE object form, Unigram array form, added_tokens") {
    val bpe = tmpDir("tok").resolve("bpe.json")
    write(bpe, """{"model": {"vocab": {"aa": 0, "bb": 1}},
                 | "added_tokens": [{"content": "[PAD]"}]}""".stripMargin)
    assert(VocabTokenizer.loadVocab(spark, bpe.toString).toSet ==
      Set("aa", "bb", "[PAD]"))

    val uni = tmpDir("tok").resolve("unigram.json")
    write(uni, """{"model": {"vocab": [["aa", -1.5], ["cc", -2.0]]}}""")
    assert(VocabTokenizer.loadVocab(spark, uni.toString).toSet ==
      Set("aa", "cc"))
  }

  test("loadVocab fails loud on missing file or empty vocab") {
    intercept[IllegalArgumentException](
      VocabTokenizer.loadVocab(spark, "/tmp/does_not_exist_tok.json"))
    val empty = tmpDir("tok").resolve("empty.json")
    write(empty, """{"model": {"type": "BPE"}}""")
    intercept[IllegalArgumentException](
      VocabTokenizer.loadVocab(spark, empty.toString))
  }

  test("empty vocabulary rejected at the Column API") {
    intercept[IllegalArgumentException](
      VocabTokenizer.tokenCounts(col("t"), Seq.empty))
  }

  // ---- merge-rank BPE (true inference, Sennrich et al. 2016) --------

  private val bpeMerges: Seq[(String, String)] = Seq(
    ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("n", "e"),
    ("ne", "w"), ("new", "est"), ("w", "i"), ("wi", "d"),
    ("wid", "est"), ("e", "r"))
  private val bpeVocab: Seq[String] =
    Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w",
      "es", "est", "lo", "low", "ne", "new", "newest", "wi", "wid",
      "widest", "er")
  private def bpe = new VocabTokenizer.BpeEncoder(
    bpeVocab.toArray, bpeMerges.toArray)

  test("bpe: merge rank decides segmentation, not match length") {
    assert(bpe.encodeWord("low").toSeq == Seq("low"))
    assert(bpe.encodeWord("lower").toSeq == Seq("low", "er"))
    assert(bpe.encodeWord("newest").toSeq == Seq("newest"))
    assert(bpe.encodeWord("widest").toSeq == Seq("widest"))
    // (e,s) rank 0 outranks (l,o): est forms before lo would reach it
    assert(bpe.encodeWord("lowest").toSeq == Seq("low", "est"))
    // (e,s) rank 0 outranks (e,r) on the SAME 'e'
    assert(bpe.encodeWord("ester").toSeq == Seq("est", "er"))
    // two words' merge chains interleave by rank without interference
    assert(bpe.encodeWord("widestnewest").toSeq == Seq("widest", "newest"))
  }

  test("bpe: the best pair fuses at ALL occurrences in one step") {
    assert(bpe.encodeWord("eses").toSeq == Seq("es", "es"))
    // overlap guard: after fusing at i the scan continues past the
    // fused pair — "sss" under a (s,s) merge yields ss + s, not s + ss
    val m = new VocabTokenizer.BpeEncoder(
      Array("s", "ss"), Array(("s", "s")))
    assert(m.encodeWord("sss").toSeq == Seq("ss", "s"))
  }

  test("bpe: unknowns are symbols absent from the vocab; emoji is one symbol") {
    assert(bpe.count("xyz") == (3, 3))
    assert(bpe.count("lox") == (2, 1))
    assert(bpe.encodeWord("l😀w").toSeq == Seq("l", "😀", "w"))
    assert(bpe.count("l😀w") == (3, 1))
    assert(bpe.encodeWord("").isEmpty)
    assert(bpe.count("low") == (1, 0))
  }

  test("bpe: duplicate merge pairs keep the FIRST (lowest) rank") {
    val m = new VocabTokenizer.BpeEncoder(
      Array("a", "b", "ab"),
      Array(("a", "b"), ("a", "b"))) // rank 0 wins, no ambiguity
    assert(m.encodeWord("ab").toSeq == Seq("ab"))
  }

  test("bpe: column API sums per-word counts and handles null") {
    val counts = VocabTokenizer.bpeTokenCounts(col("t"), bpeVocab, bpeMerges)
    val toks = VocabTokenizer.bpeTokens(col("t"), bpeVocab, bpeMerges)
    val r = Seq((1, "low lower lowest"), (2, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), counts.as("c"), array_join(toks, " ").as("j"))
      .orderBy("id").collect()
    assert(r(0).getStruct(1).getInt(0) == 5) // low | low er | low est
    assert(r(0).getString(2) == "low low er low est")
    assert(r(1).getStruct(1).getInt(0) == 0)
    assert(r(1).getString(2) == "")
  }

  test("loadMerges parses both published forms and fails loud without merges") {
    val s1 = tmpDir("tok").resolve("merges_str.json")
    write(s1, """{"model": {"merges": ["e s", "es t"]}}""")
    assert(VocabTokenizer.loadMerges(spark, s1.toString) ==
      Seq(("e", "s"), ("es", "t")))

    val s2 = tmpDir("tok").resolve("merges_arr.json")
    write(s2, """{"model": {"merges": [["e", "s"], ["es", "t"]]}}""")
    assert(VocabTokenizer.loadMerges(spark, s2.toString) ==
      Seq(("e", "s"), ("es", "t")))

    val s3 = tmpDir("tok").resolve("no_merges.json")
    write(s3, """{"model": {"vocab": {"a": 0}}}""")
    intercept[IllegalArgumentException](
      VocabTokenizer.loadMerges(spark, s3.toString))
  }

  // ---- BPE training ------------------------------------------------

  test("learnBpe: hand-derived merge order, weighted counts, ties") {
    import spark.implicits._
    // "ab"x3 + "abc"x2: pair (a,b) weight 5 beats (b,c) weight 2;
    // after merging, (ab,c) weight 2 is next
    val df = (Seq.fill(3)("ab") ++ Seq.fill(2)("abc")).toDF("t")
    val m = VocabTokenizer.learnBpe(df, "t", numMerges = 10)
    assert(m.merges == Seq(("a", "b"), ("ab", "c")))
    assert(m.vocab.contains("ab") && m.vocab.contains("abc"))
    assert(m.vocab.count(_ == "ab") == 1) // no duplicates
    // ties break lexicographically: (a,b) before (c,d)
    val tie = Seq("ab", "cd", "ab", "cd").toDF("t")
    val mt = VocabTokenizer.learnBpe(tie, "t", numMerges = 1)
    assert(mt.merges == Seq(("a", "b")))
    // frequency weighting: "zz" appearing once in a 5x-repeated word
    // outweighs "yy" in a 2x word
    val w = (Seq.fill(5)("zz") ++ Seq.fill(2)("yy")).toDF("t")
    assert(VocabTokenizer.learnBpe(w, "t", 1).merges == Seq(("z", "z")))
  }

  test("learnBpe: endOfWord learns suffixes; minWordFreq prunes; guards") {
    import spark.implicits._
    val df = (Seq.fill(4)("est") ++ Seq.fill(1)("hapax")).toDF("t")
    val m = VocabTokenizer.learnBpe(df, "t", numMerges = 3,
      minWordFreq = 2, endOfWord = Some("</w>"))
    // only "est</w>" types survive; first merges fuse within it
    assert(m.merges.take(1) == Seq(("e", "s")))
    assert(m.merges.contains(("t", "</w>")) ||
      m.merges.exists(_._2 == "</w>"))
    assert(!m.vocab.exists(_.contains("h"))) // hapax pruned
    intercept[IllegalArgumentException](
      VocabTokenizer.learnBpe(df, "t", 0))
    intercept[IllegalArgumentException](
      VocabTokenizer.learnBpe(df, "t", 1, maxWordTypes = 1))
  }

  test("learnBpe -> saveTokenizerJson -> load -> bpeTokens round trip") {
    import spark.implicits._
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("t")
    val model = VocabTokenizer.learnBpe(corpus, "t", numMerges = 8)
    val path = tmpDir("bpelearn").resolve("tokenizer.json").toString
    VocabTokenizer.saveTokenizerJson(spark, model, path)
    val vocab = VocabTokenizer.loadVocab(spark, path)
    val merges = VocabTokenizer.loadMerges(spark, path)
    assert(merges == model.merges)
    assert(vocab.toSet == model.vocab.toSet)
    // the learned tokenizer segments its own training words whole
    val toks = Seq("newest", "low").toDF("w")
      .select(array_join(VocabTokenizer.bpeTokens(col("w"), vocab,
        merges), " ").as("s"))
      .as[String].collect()
    assert(toks(0) == "newest" && toks(1) == "low")
  }

  // ---- byte-level (GPT-2) path -------------------------------------

  test("byteToChar is the published bijection") {
    val m = VocabTokenizer.byteToChar
    assert(m.length == 256 && m.toSet.size == 256) // bijective
    // printables map to themselves
    assert(m('A'.toInt) == 'A' && m('!'.toInt) == '!' && m(255) == 255.toChar)
    // the famous anchors: space → Ġ, newline → Ċ, tab → ĉ
    assert(m(32) == 'Ġ' && m(10) == 'Ċ' && m(9) == 'ĉ')
    // first remapped byte is 0 → U+0100; soft hyphen (173) remapped too
    assert(m(0) == 'Ā' && m(173) >= 256.toChar)
  }

  test("byteLevelPretokenize matches the GPT-2 rules") {
    def pt(s: String) = VocabTokenizer.byteLevelPretokenize(s).toList
    assert(pt("hello world") == List("hello", " world"))
    assert(pt("don't stop") == List("don", "'t", " stop"))
    assert(pt("I'll go") == List("I", "'ll", " go"))
    assert(pt("a2b") == List("a", "2", "b"))    // letter/number runs split
    assert(pt("hi!!") == List("hi", "!!"))
    // the \s+(?!\S) rule: the LAST space of a run stays with the word
    assert(pt("a  b") == List("a", " ", " b"))
    assert(pt("a \nb") == List("a", " ", "\n", "b"))
    assert(pt("x\ny") == List("x", "\n", "y"))
    assert(pt("end  ") == List("end", "  "))    // trailing run stands alone
  }

  test("byteLevelMap expands UTF-8 multibyte and remaps whitespace") {
    assert(VocabTokenizer.byteLevelMap("hi") == "hi")
    assert(VocabTokenizer.byteLevelMap(" hi") == "Ġhi")
    // é = C3 A9 — both printable-range bytes, identity-mapped
    assert(VocabTokenizer.byteLevelMap("é") == "Ã©")
    // emoji 😀 = F0 9F 98 80: F0/9F/98/80 → 9F,98,80 are remapped
    assert(VocabTokenizer.byteLevelMap("😀").length == 4)
  }

  test("byteLevelBpeTokens: hand-derived segmentations and counts") {
    val vocab = Seq("h", "e", "l", "o", "w", "r", "d", "n", "'", "s", "t",
      "1", "2", "!", "c", "a", "f", "b", "x", "y", "Ġ", "Ċ",
      "he", "hel", "hell", "hello", "Ġw", "Ġwo", "lo", "ow")
    val merges = Seq(("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o"),
      ("Ġ", "w"), ("Ġw", "o"), ("l", "o"), ("o", "w"))
    val rows = Seq(
      (0L, "hello", "hello", 1, 0),
      (1L, "hello world", "hello Ġwo r l d", 5, 0),
      (2L, "don't", "d o n ' t", 5, 0),
      (3L, "low", "lo w", 2, 0),           // r6 (l,o) beats r7 (o,w)
      (4L, "a  b", "a Ġ Ġ b", 4, 0), // \s+(?!\S) split
      (5L, "café", "c a f Ã ©", 5, 2), // UTF-8 bytes; Ã © unk
      (6L, "12!", "1 2 !", 3, 0),
      (7L, "x\ny", "x Ċ y", 3, 0))
    val df = rows.toDF("id", "text", "exp_toks", "exp_n", "exp_unk")
    val out = df.select(col("id"),
        array_join(VocabTokenizer.byteLevelBpeTokens(col("text"), vocab,
          merges), " ").as("toks"),
        VocabTokenizer.byteLevelBpeTokenCounts(col("text"), vocab, merges)
          .as("c"),
        col("exp_toks"), col("exp_n"), col("exp_unk"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(3),
        s"id=${r.getLong(0)}: got '${r.getString(1)}'")
      val c = r.getStruct(2)
      assert(c.getInt(0) == r.getInt(4) && c.getInt(1) == r.getInt(5),
        s"id=${r.getLong(0)} counts")
    }
    // null text
    val nul = Seq((9L, null.asInstanceOf[String])).toDF("id", "text")
      .select(VocabTokenizer.byteLevelBpeTokenCounts(col("text"), vocab,
        merges).as("c"))
      .collect()(0).getStruct(0)
    assert(nul.getInt(0) == 0 && nul.getInt(1) == 0)
  }

  test("unigram Viterbi: optimal path, ties to longest piece, unk") {
    val enc = new VocabTokenizer.UnigramEncoder(Array(
      "ab" -> -1.0, "b" -> -2.0, "a" -> -3.0, "abc" -> -3.5,
      "c" -> -2.5, "bc" -> -1.5, "de" -> -1.2, "d" -> -4.0,
      "e" -> -4.0), unkScore = -10.0)
    assert(enc.encodeWord("ab").toSeq == Seq("ab"))
    // [abc] -3.5 ties [ab,c] -3.5 -> longest piece wins
    assert(enc.encodeWord("abc").toSeq == Seq("abc"))
    // global optimum beats greedy left-longest
    assert(enc.encodeWord("aab").toSeq == Seq("a", "ab"))
    assert(enc.encodeWord("bcde").toSeq == Seq("bc", "de"))
    // unknown single code points fall back at the penalty
    assert(enc.encodeWord("xb").toSeq == Seq("x", "b"))
    assert(enc.count("xb") == ((2, 1)))
    // emoji is ONE symbol (code points, not UTF-16 units)
    assert(enc.encodeWord("\ud83d\ude00b").toSeq ==
      Seq("\ud83d\ude00", "b"))
    assert(enc.encodeWord("").isEmpty)
  }

  test("unigram tie-break is longest-piece even with equal unit scores") {
    val enc = new VocabTokenizer.UnigramEncoder(
      Array("aa" -> -2.0, "a" -> -1.0), unkScore = -10.0)
    // [aa] -2.0 ties [a,a] -2.0 -> single longest piece
    assert(enc.encodeWord("aa").toSeq == Seq("aa"))
  }

  test("unigram save -> load -> encode round trip via tokenizer.json") {
    val path = tmpDir("unigram").resolve("tokenizer.json").toString
    val pieces = Seq("ab" -> -1.0, "b" -> -2.0, "a" -> -3.0,
      "q\"uo" -> -5.0) // escaping must round-trip
    VocabTokenizer.saveUnigramJson(spark, pieces, path)
    val loaded = VocabTokenizer.loadUnigram(spark, path)
    assert(loaded == pieces)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("ab xb").toDF("t")
      .select(VocabTokenizer.unigramTokens(col("t"), loaded, -10.0))
      .head.getSeq[String](0)
    assert(out == Seq("ab", "x", "b"))
    // counts column: struct(n_tokens, n_unk); NULL text -> zeros
    val c = Seq(("ab xb"), (null: String)).toDF("t")
      .select(VocabTokenizer.unigramTokenCounts(col("t"), loaded, -10.0)
        .as("c"))
      .collect().map(r => r.getStruct(0))
    assert(c(0).getInt(0) == 3 && c(0).getInt(1) == 1)
    assert(c(1).getInt(0) == 0 && c(1).getInt(1) == 0)
  }

  test("unigram guards: empty model rejected") {
    intercept[IllegalArgumentException] {
      new VocabTokenizer.UnigramEncoder(Array.empty, -10.0)
    }
    intercept[IllegalArgumentException] {
      VocabTokenizer.saveUnigramJson(spark, Nil, "/tmp/never.json")
    }
  }

  test("learnUnigram: hand-derived EM fixed point on the paper corpus") {
    import spark.implicits._
    val corpus = (Seq.fill(2)("abab") ++ Seq.fill(3)("ab")).toDF("t")
    val pieces = VocabTokenizer.learnUnigram(corpus, "t",
      vocabSize = 4, maxPieceLen = 2, emIters = 2)
    assert(pieces.map(_._1) == Seq("ab", "a", "b"))
    // ab = ln(7/8), singles = ln(0.5/8) — the documented 0.5 floor
    assert(math.abs(pieces(0)._2 - math.log(7.0 / 8)) < 1e-12)
    assert(math.abs(pieces(1)._2 - math.log(1.0 / 16)) < 1e-12)
    assert(pieces(1)._2 == pieces(2)._2)
  }

  test("learnUnigram: singles never pruned; learned model has coverage") {
    import spark.implicits._
    val corpus = Seq.fill(4)("xyzw xyzw qq").toDF("t")
    val pieces = VocabTokenizer.learnUnigram(corpus, "t",
      vocabSize = 2, maxPieceLen = 3, emIters = 3, shrink = 0.5)
    val set = pieces.map(_._1).toSet
    for (c <- Seq("x", "y", "z", "w", "q"))
      assert(set.contains(c), s"single '$c' was pruned")
    // round trip: learned model segments its own corpus with 0 unknowns
    val path = tmpDir("unilearn").resolve("tokenizer.json").toString
    VocabTokenizer.saveUnigramJson(spark, pieces, path)
    val loaded = VocabTokenizer.loadUnigram(spark, path)
    import org.apache.spark.sql.functions.col
    val c = corpus
      .select(VocabTokenizer.unigramTokenCounts(col("t"), loaded).as("c"))
      .collect().map(_.getStruct(0))
    assert(c.forall(_.getInt(1) == 0), "learned model produced unknowns")
  }

  test("learnUnigram guards: empty corpus, bad params") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      VocabTokenizer.learnUnigram(Seq.empty[String].toDF("t"), "t", 4)
    }
    val one = Seq("ab").toDF("t")
    intercept[IllegalArgumentException] {
      VocabTokenizer.learnUnigram(one, "t", 0)
    }
    intercept[IllegalArgumentException] {
      VocabTokenizer.learnUnigram(one, "t", 4, emIters = 0)
    }
    intercept[IllegalArgumentException] {
      VocabTokenizer.learnUnigram(one, "t", 4, shrink = 0.0)
    }
  }

  test("unigram: known singles price at model cost, never the unk rate") {
    // "q" is IN the vocab below unkScore: [q,r] costs -26, [qr] -24 ->
    // the fallback must not subsidize the spell-out path at -21
    val enc = new VocabTokenizer.UnigramEncoder(
      Array("q" -> -25.0, "qr" -> -24.0, "r" -> -1.0), unkScore = -20.0)
    assert(enc.encodeWord("qr").toSeq == Seq("qr"))
    assert(enc.count("qr") == ((1, 0)))
  }

  test("byte-level decode round-trips hostile text under ANY merge table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hostile = Seq(
      "plain ascii with  double  spaces",
      "tabs\tand\nnewlines\r\nmixed " + 0.toChar + " nul",
      "emoji 😀🇫🇷 and CJK 你好世界 and combining é é",
      "trailing spaces   ",
      "   leading and 'contractions' don't it's we'll",
      "", "𝕊𝕦𝕡𝕡𝕝𝕖𝕞𝕖𝕟𝕥𝕒𝕣𝕪 𝔭𝔩𝔞𝔫𝔢")
    // a tiny, deliberately impoverished merge table: most symbols stay
    // unmerged/unknown — decode must STILL be the exact inverse
    val vocab = Seq("th", "he", "the")
    val merges = Seq(("t", "h"), ("th", "e"))
    val toks = VocabTokenizer.byteLevelBpeTokens(col("t"), vocab, merges)
    val out = hostile.toDF("t")
      .select(VocabTokenizer.byteLevelDecode(toks).as("d"))
      .as[String].collect().toSeq
    assert(out == hostile)
    // null text -> empty tokens -> ""
    val n = Seq[Option[String]](None).toDF("t")
      .select(VocabTokenizer.byteLevelDecode(toks).as("d"))
      .as[String].collect()(0)
    assert(n == "")
  }

  // ----------------------------- WordPiece ---------------------------

  private val wpVocab = Seq("un", "##aff", "##able", "a", "ab", "##c",
    "##bc", "fil", "b")

  private def wp(word: String, vocab: Seq[String] = wpVocab,
                 maxChars: Int = 200): Seq[String] = {
    val enc = new VocabTokenizer.WordPieceEncoder(vocab.toArray, maxChars)
    Option(enc.encodeWord(word)).map(_.toSeq).getOrElse(Seq("[UNK]"))
  }

  test("wordpiece: the canonical un ##aff ##able split") {
    assert(wp("unaffable") == Seq("un", "##aff", "##able"))
  }

  test("wordpiece: longest match first, at start and continuation") {
    // "ab" beats "a" at the start; then "##c" finishes
    assert(wp("abc") == Seq("ab", "##c"))
    // from a 1-char start, "##bc" beats "##b"-less alternatives
    assert(wp("abc", Seq("a", "##b", "##c", "##bc")) ==
      Seq("a", "##bc"))
  }

  test("wordpiece: any unmatchable position makes the WHOLE word [UNK]") {
    // "fil" matches, then nothing matches "ter" → one [UNK], not fil+junk
    assert(wp("filter") == Seq("[UNK]"))
    // nothing matches at position 0
    assert(wp("zzz") == Seq("[UNK]"))
  }

  test("wordpiece: maxInputChars guard and empty word") {
    assert(wp("ab", maxChars = 1) == Seq("[UNK]"))
    assert(wp("") == Seq.empty)
    // supplementary chars count ONE toward the cap (code points)
    assert(wp("😀😀", Seq("😀", "##😀"), maxChars = 2) ==
      Seq("😀", "##😀"))
  }

  test("wordpiece: bare '##' vocab entry fails loud") {
    intercept[IllegalArgumentException] {
      new VocabTokenizer.WordPieceEncoder(Array("##")).encodeWord("x")
    }
  }

  test("wordPieceTokens / wordPieceCounts columns agree; NULL text is zero") {
    val df = Seq(("unaffable ab filter", 0), (null: String, 1))
      .toDF("t", "i")
    val toks = df.select(col("i"),
        VocabTokenizer.wordPieceTokens(col("t"), wpVocab).as("p"))
      .orderBy("i").as[(Int, Seq[String])].collect()
    assert(toks(0)._2 ==
      Seq("un", "##aff", "##able", "ab", "[UNK]"))
    assert(toks(1)._2 == Seq.empty)
    val c = df.select(col("i"),
        VocabTokenizer.wordPieceCounts(col("t"), wpVocab).as("c"))
      .select(col("i"), col("c.n_tokens"), col("c.n_unk"))
      .orderBy("i").as[(Int, Int, Int)].collect()
    assert(c(0) == ((0, 5, 1))) // 4 real pieces + 1 [UNK] word
    assert(c(1) == ((1, 0, 0)))
  }

  test("learnWordPiece: hand-derived merge sequence on hug/pug/pun/bun/hugs") {
    val corpus = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .toDF("t")
    val v = VocabTokenizer.learnWordPiece(corpus, "t", numMerges = 9)
    // derivation in TextQueries.writeT38Fixture — first merge is the
    // likelihood pick (##g,##s) at 1/20 over the 1/36 field, NOT the
    // raw-count pick (##u,##g) BPE would take
    assert(v == Seq("##g", "##n", "##s", "##u", "b", "h", "p",
      "##gs", "##ug", "##ugs", "hugs", "hug", "##un", "bun",
      "pug", "pun"))
  }

  test("learnWordPiece: merges run dry gracefully; learned vocab segments") {
    val corpus = Seq.fill(3)("ab").toDF("t")
    // only one pair exists; asking for 5 merges returns after 1
    val v = VocabTokenizer.learnWordPiece(corpus, "t", numMerges = 5)
    assert(v == Seq("##b", "a", "ab"))
    assert(wp("ab", v) == Seq("ab"))
    // "a" matches at the start but there is no ##a continuation, so
    // the whole word collapses to [UNK]
    assert(wp("aab", v) == Seq("[UNK]"))
  }
}
