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
}
