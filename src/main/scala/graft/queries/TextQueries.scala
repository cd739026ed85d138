package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => F}

/** Text-analysis operators for training-data curation: language-ID
  * (marker-word heuristic), quality scoring (length/punctuation/stopword
  * ratios), token counting (whitespace + BPE-ish subword estimate) and
  * document statistics. All are single-scan, codegen-friendly column
  * expressions — the 100 TB cost is one pass over the text column with
  * map-side partial aggregation.
  */
object TextQueries {
  import graft.ops.TextAnalysis

  private val enMarkers = TextAnalysis.markers("en")
  private val esMarkers = TextAnalysis.markers("es")
  private val deMarkers = TextAnalysis.markers("de")
  private val frMarkers = TextAnalysis.markers("fr")

  /** Deterministic 64-bucket weight vector + bias for the t15 gate —
    * a stand-in for offline-trained logistic-regression weights; the
    * oracle embeds the identical literals.
    */
  private val t15Weights: Seq[Double] =
    Seq.tabulate(64)(i => (i % 7 - 3) / 10.0)
  private val t15Bias = 0.2

  /** The LabelHashBucket kernel (unsigned 64-bit sha-256 prefix, mod
    * buckets) as a DuckDB expression over lambda variable `t` — the
    * p5 oracle's HUGEINT digit sum, flattened to 16 literal terms
    * because lambdas cannot contain subqueries.
    */
  private val t15BucketSql: String = (1 to 16)
    .map(i => s"(strpos('0123456789abcdef', substr(sha256(t), $i, 1)) - 1)" +
      s"::HUGEINT * (1::HUGEINT << ${(16 - i) * 4})")
    .mkString("((", " + ", ") % 64)::INT")

  /** t21 fixture: held-out sentences per language (NOT the profile
    * seeds), plus the adversarial shapes — mixed-language, short
    * strings, emoji/numeric-only, empty, NULL. Expected verdicts are
    * NOT stored: the oracle re-scores every document from the dumped
    * raw (lang, trigram, w) profile rows — the c16 pattern.
    */
  private val t34Dir = "/tmp/graft_gate_t34_blocks"

  /** Fixture pages for block-level extraction, every expected verdict
    * hand-derived from the NumWordsRulesClassifier tree (thresholds
    * 1/3 link density; 0.555556 prev density; 16/15/4 word gates on
    * the sparse branch, 40/17 on the dense branch; terminator phrases
    * only under 15 words).
    */
  private def writeT34Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def words(p: String, n: Int): String =
      (0 until n).map(i => s"$p$i").mkString(" ")
    val a22 = words("a", 22); val b19 = words("b", 19)
    val m20 = words("m", 20); val c18 = words("c", 18)
    val rows: Seq[(Long, String, String)] = Seq(
      // 1: full article page. title(2w: 2<=16, next 2<=15, prev 0<=4 →
      // drop), header nav (ld 1 → drop), h1 (prev ld 1 > .5556 →
      // dense branch, next 22 > 17 → KEEP: headlines stay, by design),
      // paragraphs (22 > 16, 19 > 16 → keep), footer (ld 1 → drop).
      (1L,
        "<html><head><title>Site Name</title></head><body>" +
          "<header><a href=\"/\">Home</a> <a href=\"/a\">About</a></header>" +
          s"<h1>big news this week</h1><article><p>$a22</p><p>$b19</p></article>" +
          "<footer><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></footer>" +
          "</body></html>",
        s"big news this week\n$a22\n$b19"),
      // 2: link-farm page — a 10-word blurb between two nav bars:
      // blurb lands in the dense branch (prev ld 1), 10 <= 40 and
      // next 2 <= 17 → nothing survives.
      (2L,
        "<nav><a href=\"/1\">alpha beta</a> <a href=\"/2\">gamma</a></nav>" +
          s"<p>${words("x", 10)}</p>" +
          "<nav><a href=\"/3\">delta</a> <a href=\"/4\">epsilon</a></nav>",
        ""),
      // 3: terminator lines — short Copyright/Comments blocks would
      // pass via prev.words > 4 but the terminating-blocks rule kills
      // them; the 20-word article stays.
      (3L,
        s"<p>$m20</p><p>Copyright 2026 Example Corp</p><p>Comments</p>",
        m20),
      // 4: script/style/comment stripped, entities decode in output
      // (words counted pre-decode: '&amp;' is one token either way).
      (4L,
        s"<p>$c18 cats &amp; dogs</p>" +
          "<script>var x = '<p>no</p>';</script><style>p{a:b}</style><!-- z -->",
        s"$c18 cats & dogs"),
      // 5: short trailing note after content survives via prev > 4 —
      // the paper's tree keeps it (not a terminator phrase).
      (5L, s"<p>$m20</p><p>read more here</p>", s"$m20\nread more here"),
      // 6: table layout — 18-word cell kept (18 > 16), link cell
      // dropped (ld 1).
      (6L,
        s"<table><tr><td>$c18</td>" +
          "<td><a href=\"/x\">one</a> <a href=\"/y\">two</a></td></tr></table>",
        c18),
      // 7: chrome-only page.
      (7L, "<div><a href=\"/\">Home</a></div><p>tiny</p>", ""),
      // 8: bare text, no tags — one 18-word block, kept.
      (8L, c18, c18))
    s.createDataset(rows).toDF("case_id", "html", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(t34Dir)
  }

  private val t41Dir = "/tmp/graft_gate_t41_mojibake"

  /** t41 fixture: hand-computed mojibake pairs (each mangled form
    * written from the UTF-8 byte sequences and the cp1252/latin-1
    * tables BY HAND — é=C3 A9→"Ã©", ’=E2 80 99→"â€™", …=E2 80 A6→
    * "â€¦", 中=E4 B8 AD→"ä¸&shy;", ā=C4 81 hits the cp1252 0x81 hole
    * so the latin-1 retry must fire), plus the must-NOT-change side:
    * ASCII, genuine legacy-accented text, and CJK-mixed strings.
    */
  private def writeT41Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(java.lang.Long, String, String, java.lang.Boolean)] = Seq(
      (0L, "cafÃ©", "café", true),
      (1L, "itâ€™s fine", "it’s fine", true),
      (2L, "â€œquotedâ€¦",
        "“quoted…", true),
      // double mojibake: two rounds peel cafÃƒÂ© → cafÃ© → café
      (3L, "cafÃƒÂ©", "café", true),
      // CJK through latin-1 glyphs incl. an invisible soft hyphen
      // (中=E4 B8 AD → "ä¸<shy>", 文=E6 96 87 → "æ<endash><ddagger>")
      (4L, "\u00E4\u00B8\u00AD\u00E6\u2013\u2021", "\u4E2D\u6587", true),
      (5L, "plain ASCII stays", "plain ASCII stays", false),
      // genuine legacy text: lone 0xE9 bytes are not valid UTF-8
      (6L, "café naïve légitime",
        "café naïve légitime", false),
      // CJK mixed with mojibake: outside both legacy repertoires
      (7L, "中文 with Ã© mixed",
        "中文 with Ã© mixed", false),
      (8L, null, null, false),
      (9L, "", "", false),
      (10L, "naÃ¯ve rÃ©sumÃ©",
        "naïve résumé", true),
      // Greek through the latin-1 supplement
      (11L, "Î±Î²Î³",
        "αβγ", true),
      // cp1252 hole 0x81: the latin-1 retry path
      (12L, "l\u00C4\u0081tvian", "l\u0101tvian", true))
    s.createDataset(rows)
      .toDF("doc_id", "mangled", "exp_fixed", "exp_changed")
      .coalesce(1).write.mode("overwrite").parquet(t41Dir)
  }

  /** t42 input: corpus text plus an injected trap-rich tail — dotted
    * abbreviations, initials, decimals, quoted terminators, ellipsis,
    * a newline paragraph break, and (every 5th doc) an unterminated
    * trailing fragment. The SAME tail is rebuilt in SQL by
    * [[duckT42Text]] so both engines segment identical strings.
    */
  private val t42Tail = " Dr. Smith met J. Doe at 3.14 after 5 p.m.! " +
    "“Really?” Yes... e.g. twice.\nNew paragraph here. " +
    "Approx. 2.5 units (see fig. 3): done."
  private val t42Frag = " Trailing fragment without terminator"

  private def t42Text: org.apache.spark.sql.Column = concat(
    col("text"), lit(t42Tail),
    when(col("doc_id") % 5 === 0, lit(t42Frag)).otherwise(lit("")))

  private def sqlQuote(s: String): String =
    "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

  private def duckT42Text: String =
    s"text || ${sqlQuote(t42Tail)} || " +
      s"CASE WHEN doc_id % 5 = 0 THEN ${sqlQuote(t42Frag)} ELSE '' END"

  /** DuckDB mirror of [[TextAnalysis.splitSentences]]'s boundary
    * cascade, GENERATED from the shared step table
    * ([[TextAnalysis.sentenceSteps]]) — replacement `$N` refs become
    * RE2 `\N`, the U+0001/U+0002 sentinels become `chr(1)`/`chr(2)` —
    * so the two engines cannot drift: a step edited on the Spark side
    * re-emits here.
    */
  private[queries] def duckSentenceMark(e: String): String = {
    def repSql(rep: String): String = {
      val parts = scala.collection.mutable.Buffer[String]()
      val sb = new StringBuilder
      def flush(): Unit =
        if (sb.nonEmpty) {
          parts += "'" + sb.toString.replace("'", "''") + "'"; sb.clear()
        }
      var i = 0
      while (i < rep.length) {
        val ch = rep(i)
        if (ch == '$' && i + 1 < rep.length && rep(i + 1).isDigit) {
          flush(); parts += s"'\\${rep(i + 1)}'"; i += 2
        } else if (ch == '\u0001') { flush(); parts += "chr(1)"; i += 1 }
        else if (ch == '\u0002') { flush(); parts += "chr(2)"; i += 1 }
        else { sb += ch; i += 1 }
      }
      flush()
      if (parts.isEmpty) "''" else parts.mkString(" || ")
    }
    TextAnalysis.sentenceSteps.foldLeft(s"coalesce($e, '')") {
      case (acc, (true, pat, rep)) =>
        s"regexp_replace($acc, '${pat.replace("'", "''")}', ${repSql(rep)}, 'g')"
      case (acc, (false, from, to)) =>
        val f =
          if (from == "\u0002") "chr(2)"
          else if (from == "\u0001") "chr(1)"
          else sqlQuote(from)
        s"replace($acc, $f, ${sqlQuote(to)})"
    }
  }

  private val t43Dir = "/tmp/graft_gate_t43_nfkc"

  /** t43 fixture: every expected string hand-derived from the
    * published UCD decomposition tables (UnicodeData.txt), never from
    * the function under test — canonical singletons (U+212B ANGSTROM →
    * U+00C5, U+2126 OHM → U+03A9), combining-mark composition (e +
    * U+0301 → U+00E9, conjoining jamo U+1100 U+1161 → U+AC00), and the
    * compatibility folds (<compat>/<circle>/<super>/<square>/<noBreak>
    * /<fraction>/<narrow>): ﬁ/ﬃ ligatures, circled digits,
    * superscripts, full-width forms, ㎞, NBSP, µ → μ, ½ → 1⁄2,
    * half-width katakana + voicing composition ﾊﾟﾝ → パン, Roman
    * numerals. NFC must fold ONLY the canonical axis; NFKC both.
    */
  private def writeT43Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(java.lang.Long, String, String, String)] = Seq(
      // e + COMBINING ACUTE ACCENT composes canonically to U+00E9
      (0L, "e\u0301clair", "\u00E9clair", "\u00E9clair"),
      // LATIN SMALL LIGATURE FI / FFI: compatibility-only folds
      (1L, "\uFB01ne \uFB03x", "\uFB01ne \uFB03x", "fine ffix"),
      // ANGSTROM SIGN: canonical SINGLETON to U+00C5
      (2L, "\u212Bngstr\u00F6m", "\u00C5ngstr\u00F6m", "\u00C5ngstr\u00F6m"),
      // circled digits <circle>, superscript two <super>
      (3L, "\u2460\u2461 \u00B2", "\u2460\u2461 \u00B2", "12 2"),
      // full-width forms <wide>
      (4L, "\uFF21\uFF22\uFF11\uFF12", "\uFF21\uFF22\uFF11\uFF12", "AB12"),
      // SQUARE KM <square>
      (5L, "\u339E to go", "\u339E to go", "km to go"),
      // NO-BREAK SPACE <noBreak>
      (6L, "5\u00A0km", "5\u00A0km", "5 km"),
      // MICRO SIGN <compat> to GREEK SMALL LETTER MU
      (7L, "\u00B5m", "\u00B5m", "\u03BCm"),
      // conjoining jamo L+V compose canonically to the Hangul syllable
      (8L, "\u1100\u1161", "\uAC00", "\uAC00"),
      // OHM SIGN: canonical singleton to GREEK CAPITAL OMEGA
      (9L, "\u2126 resistance", "\u03A9 resistance", "\u03A9 resistance"),
      // half-width katakana <narrow>: HA + semi-voiced mark compose to
      // PA (U+30D1), N becomes U+30F3 -- NFC leaves half-width alone
      (10L, "\uFF8A\uFF9F\uFF9D", "\uFF8A\uFF9F\uFF9D", "\u30D1\u30F3"),
      (11L, "plain ascii 123", "plain ascii 123", "plain ascii 123"),
      (12L, null, null, null),
      // VULGAR FRACTION ONE HALF <fraction>: 1 + FRACTION SLASH + 2
      (13L, "\u00BD cup", "\u00BD cup", "1\u20442 cup"),
      // A + COMBINING RING ABOVE composes canonically to U+00C5
      (14L, "A\u030A", "\u00C5", "\u00C5"),
      // ROMAN NUMERAL THREE / FOUR <compat>
      (15L, "\u2162\u2163", "\u2162\u2163", "IIIIV"))
    s.createDataset(rows)
      .toDF("case_id", "raw", "exp_nfc", "exp_nfkc")
      .coalesce(1).write.mode("overwrite").parquet(t43Dir)
  }

  private val t47Arpa = "/tmp/graft_gate_t47_model.arpa"
  private val t47Docs = "/tmp/graft_gate_t47_docs"

  /** t47 fixture: a hand-authored ARPA trigram model (round log10
    * values) plus documents exercising every backoff branch — direct
    * trigram hit, bo(w1w2)+bigram, bigram-with-NULL-backoff context,
    * unigram fallthrough, and the <unk> floor. The oracle parses the
    * SAME file and replays the Katz lookup.
    */
  private def writeT47Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val arpa = Seq(
      "\\data\\", "ngram 1=4", "ngram 2=3", "ngram 3=2", "",
      "\\1-grams:",
      "-0.5\ta\t-0.2", "-0.7\tb\t-0.3", "-1.0\tc", "-2.0\t<unk>", "",
      "\\2-grams:",
      "-0.4\ta b\t-0.1", "-0.6\tb c", "-0.9\tb a", "",
      "\\3-grams:",
      "-0.3\ta b c", "-0.8\tb a b", "",
      "\\end\\").mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(t47Arpa),
      arpa.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Seq(
      (1L, "a b c"),    // trigram hit: −0.3
      (2L, "b a b"),    // trigram hit: −0.8
      (3L, "a b a"),    // bo(a,b) −0.1 + lp2(b,a) −0.9 = −1.0
      (4L, "b c a"),    // bo(b,c) NULL→0 + [bi(c,a) absent → bo(c)
                        // NULL→0 + lp1(a) −0.5] = −0.5
      (5L, "c c z"),    // all absent, z OOV → <unk> −2.0
      (6L, "a b c a"),  // two trigrams: (−0.3 + −0.5)/2 = −0.4
      (7L, "a b"),      // < 3 tokens → no row
      (8L, null: String))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(t47Docs)
  }

  private val t49Bin = "/tmp/graft_gate_t49_model.bin"
  private val t49InputDir = "/tmp/graft_gate_t49_input"
  private val t49OutputDir = "/tmp/graft_gate_t49_output"
  private val t49RowsDir = "/tmp/graft_gate_t49_rows"

  /** t49 fixture: a deterministic fastText supervised `.bin` (real v12
    * binary layout) over a small fixed vocabulary, its input/output
    * matrices dumped as parquet, and each gate document's input-row
    * multiset derived by an INDEPENDENT reimplementation of the line
    * machinery (own FNV-1a, own word-ngram chain — the t47 pattern).
    * The oracle recomputes mean vector → logits → softmax → top-1
    * entirely from those dumps, so a drift in the loader, the hash,
    * the ngram chain, or the scoring math all diverge.
    */
  private def writeT49Fixture(s: SparkSession, sfDir: String): Unit = {
    import s.implicits._
    val words = Seq("the", "a", "of", "and", "to", "in", "is", "que",
      "de", "la", "el", "und", "der", "die", "</s>")
    val labels = Seq("__label__keep", "__label__drop", "__label__review")
    val dim = 4; val bucket = 32; val wordNgrams = 2
    val nrows = words.size + bucket
    def wgt(i: Long): Float =
      (((i * 2654435761L) % 997L + 997L) % 997L).toFloat / 997f - 0.5f
    val input = Array.tabulate(nrows * dim)(i => wgt(i.toLong))
    val output = Array.tabulate(labels.size * dim)(i => wgt(1000L + i))
    val model = graft.ops.FastText.Model(dim, bucket, wordNgrams, 0, 0,
      graft.ops.FastText.LossSoftmax, words.size,
      words.zipWithIndex.toMap, labels.toArray, Array.empty,
      input, nrows, output)
    graft.ops.FastText.save(model, t49Bin,
      s.sparkContext.hadoopConfiguration)

    // matrix dumps (float widened to double: exact)
    (0 until nrows).flatMap(r => (0 until dim).map(d =>
        (r, d, input(r * dim + d).toDouble)))
      .toDF("row_idx", "d", "w")
      .coalesce(1).write.mode("overwrite").parquet(t49InputDir)
    labels.indices.flatMap(l => (0 until dim).map(d =>
        (labels(l), d, output(l * dim + d).toDouble)))
      .toDF("label", "d", "w")
      .coalesce(1).write.mode("overwrite").parquet(t49OutputDir)

    // independent line machinery: FNV-1a + uint64 ngram chain written
    // here from the published constants, not the ops code
    def fnv(str: String): Int = {
      var h = 0x811c9dc5
      str.getBytes("UTF-8").foreach { b => h ^= b; h *= 16777619 }
      h
    }
    val vocab = words.zipWithIndex.toMap
    def rowsOf(text: String): Seq[Int] = {
      val toksAll = (if (text == null) Array.empty[String]
        else graft.util.Words.iterator(text).toArray) :+ "</s>"
      // the line stops at the FIRST EOS token, like fastText's reader
      val toks = toksAll.take(toksAll.indexOf("</s>") + 1)
      val kept = toks.filterNot(_.startsWith("__label__"))
      val wordRows = kept.flatMap(t => vocab.get(t))
      val hs = kept.map(fnv)
      val ngramRows = hs.indices.flatMap { i =>
        var h = hs(i).toLong
        (i + 1 until math.min(hs.length, i + wordNgrams)).map { j =>
          h = h * 116049371L + hs(j).toLong
          words.size +
            java.lang.Long.remainderUnsigned(h, bucket.toLong).toInt
        }
      }
      wordRows.toSeq ++ ngramRows
    }
    Tables.documents(s, sfDir).filter(col("doc_id") % 13 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        rowsOf(text).groupBy(identity).map { case (r, occ) =>
          (id, r, occ.size.toLong)
        }
      }.toSeq
      .toDF("doc_id", "row_idx", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(t49RowsDir)
  }

  private val t51Arpa = "/tmp/graft_gate_t51_model5.arpa"
  private val t51Docs = "/tmp/graft_gate_t51_docs"

  /** t51 fixture: a hand-authored FIVE-gram ARPA model (the order
    * CCNet's published KenLM models actually are) plus documents
    * walking every backoff depth — direct 5-gram, each intermediate
    * level, accumulated backoff weights, NULL backoffs, the unk
    * floor, and a multi-5-gram doc. The oracle re-parses the SAME
    * file and replays the 5-level Katz lookup with its own joins.
    */
  private def writeT51Fixture(s: SparkSession): Unit = {
    import s.implicits._
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
    java.nio.file.Files.write(java.nio.file.Paths.get(t51Arpa),
      arpa.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Seq(
      (1L, "a b c d e"),   // direct 5-gram
      (2L, "a b c d x"),   // four backoff weights + unk
      (3L, "x a b c d"),   // NULL bo4 → 0, 4-gram hit
      (4L, "b c d e e"),   // falls to the unigram
      (5L, "x b c d e"),   // 4-gram hit through a NULL bo
      (6L, "x x c d e"),   // 3-gram hit
      (7L, "a b c d e f"), // two 5-grams: one hit, one unk chain
      (8L, "a b c d"),     // < 5 tokens → no row
      (9L, null: String))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(t51Docs)
  }

  private val t53Arpa = "/tmp/graft_gate_t53_kn5.arpa"

  private val t50Model = "/tmp/graft_gate_t50.model"
  private val t50Docs = "/tmp/graft_gate_t50_docs"

  /** t50 fixture: hand-authored unigram pieces and documents whose
    * Viterbi segmentations are derived ON PAPER here (the t28
    * pattern); the gate routes the pieces through a REAL SentencePiece
    * `.model` save→load before segmenting, so a byte-level drift in
    * the protobuf writer/parser, a dropped piece, a reordered piece,
    * or a lost unk score all change the traced output.
    *
    * Pieces: ab −1.0, abc −1.5, b −2.0, c −2.5, a −3.0, d −2.2;
    * unk −8.0. Traces (best path by total log-prob):
    *   "abc"  → [abc] (−1.5 beats ab+c −3.5, a+b+c −7.5)
    *   "abd"  → [ab, d] (−3.2)
    *   "abx"  → [ab, x†] (−9.0; † = unk fallback, x not in model)
    *   "ca"   → [c, a] (−5.5)
    *   "abcd" → [abc, d] (−3.7 beats ab+c+d −5.7)
    *   null   → no tokens
    */
  private def writeT50Fixture(s: SparkSession): Unit = {
    import s.implicits._
    Seq(
      (1L, Some("abc")), (2L, Some("abd")), (3L, Some("abx")),
      (4L, Some("ca")), (5L, Option.empty[String]), (6L, Some("abcd")))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(t50Docs + "_in")
    Seq(
      (1L, "abc", 1L, 0L), (2L, "ab d", 2L, 0L), (3L, "ab x", 2L, 1L),
      (4L, "c a", 2L, 0L), (5L, "", 0L, 0L), (6L, "abc d", 2L, 0L))
      .toDF("doc_id", "toks", "n_tokens", "n_unk")
      .coalesce(1).write.mode("overwrite").parquet(t50Docs + "_exp")
  }

  private val t50Pieces = Seq("ab" -> -1.0, "abc" -> -1.5, "b" -> -2.0,
    "c" -> -2.5, "a" -> -3.0, "d" -> -2.2)

  private val t21Dir = "/tmp/graft_gate_t21_langid"

  private def writeT21Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val docs: Seq[(Long, Option[String])] = Seq(
      1L -> Some("she was reading a book about the history of their city"),
      2L -> Some("die geschichte wurde von den alten leuten oft erzählt"),
      3L -> Some("nous avons mangé du pain avec les autres dans le jardin"),
      4L -> Some("los estudiantes estaban leyendo muchos libros interesantes"),
      5L -> Some("as pessoas estavam andando pela cidade durante a manhã"),
      6L -> Some("i ragazzi hanno letto molti libri nella biblioteca della città"),
      7L -> Some("de mensen lazen boeken over de geschiedenis van hun stad"),
      8L -> Some("barnen läste många böcker om sina vänner under sommaren"),
      9L -> Some("nopeat ketut juoksevat metsässä ja lapset katsovat niitä"),
      10L -> Some("dzieci czytały wiele książek o historii swojego miasta"),
      11L -> Some("děti četly mnoho knih o historii svého města každý den"),
      12L -> Some("çocuklar şehirlerinin tarihi hakkında birçok kitap okudu"),
      13L -> Some("anak anak membaca banyak buku tentang sejarah kota mereka"),
      14L -> Some("những đứa trẻ đọc nhiều sách về lịch sử của thành phố"),
      15L -> Some("дети читали много книг об истории своего города каждый день"),
      16L -> Some("діти читали багато книг про історію свого міста щодня"),
      17L -> Some("كان الأطفال يقرؤون العديد من الكتب عن تاريخ مدينتهم"),
      18L -> Some("बच्चे अपने शहर के इतिहास के बारे में बहुत सारी किताबें पढ़ते थे"),
      19L -> Some("孩子们每天都在阅读关于他们城市历史的很多书籍"),
      20L -> Some("こどもたちはまちのれきしについてたくさんのほんをよみました"),
      21L -> Some("아이들은 도시의 역사에 관한 많은 책을 읽었습니다"),
      // adversarial shapes
      22L -> Some("the children et les enfants and the house dans la maison " +
        "avec les amis près du pont"), // mixed en/fr, fr-dominant
      23L -> Some("the"), // single trigram
      24L -> Some("ab"), // below trigram length
      25L -> Some("🎉🎊🎈 123 456 !!!"), // no profile trigram
      26L -> Some(""),
      27L -> None,
      28L -> Some("DIE GESCHICHTE WURDE VON DEN ALTEN LEUTEN ERZÄHLT"),
      29L -> Some("que la de el los en y con por una historia"), // es function words
      30L -> Some("работа дом улица")) // short ru
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$t21Dir/docs")
    graft.ops.LangId.profileRows.toDF("lang", "trigram", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$t21Dir/profiles")
  }

  private val t36Dir = "/tmp/graft_gate_t36_langid_routed"

  /** Mixed-script pages — the shapes the pure trigram argmax gets
    * wrong (Latin chrome outvoting the CJK payload) — plus
    * single-script and no-script fallbacks. The oracle re-derives
    * every verdict from the dumped profile + routing tables.
    */
  private def writeT36Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val docs: Seq[(Long, Option[String])] = Seq(
      // the motivating bug: Han payload under Latin nav chrome
      1L -> Some("nav | nav | nav | login\n孩子们每天都在阅读关于他们城市历史的很多书籍"),
      2L -> Some("Home > Products\n아이들은 도시의 역사에 관한 많은 책을 읽었습니다"),
      3L -> Some("menu | search\nこどもたちはまちのれきしについてたくさんのほんをよみました"),
      4L -> Some("copyright 2020\nдети читали много книг об истории своего города"),
      5L -> Some("nav bar\nτα παιδιά διάβαζαν πολλά βιβλία για την ιστορία της πόλης"),
      // pure single-script docs (each script's direct route)
      6L -> Some("كان الأطفال يقرؤون العديد من الكتب عن تاريخ مدينتهم"),
      7L -> Some("בכל יום הילדים קראו ספרים רבים על ההיסטוריה של העיר"),
      8L -> Some("बच्चे अपने शहर के इतिहास के बारे में बहुत सारी किताबें पढ़ते थे"),
      9L -> Some("เด็กๆอ่านหนังสือมากมายเกี่ยวกับประวัติศาสตร์ของเมือง"),
      // Latin languages still discriminate within the latin set
      10L -> Some("the children were reading many books about their city"),
      11L -> Some("les enfants lisaient beaucoup de livres sur leur ville"),
      12L -> Some("die kinder lasen viele bücher über die geschichte"),
      // han with no profile-trigram overlap → script default (zh)
      13L -> Some("硅砷硼碲碘磷 硅砷硼碲碘磷"),
      // latin gibberish with no profile match → zero score → unknown
      14L -> Some("xqzkv wqjxz zzvkq qqxxj"),
      // no script at all → unrestricted fallback → unknown
      15L -> Some("🎉🎊 123 456 !!!"),
      // Bengali: script outside the block table → unrestricted argmax
      16L -> Some("শিশুরা তাদের শহরের ইতিহাস সম্পর্কে অনেক বই পড়ত প্রতিদিন"),
      17L -> Some(""),
      18L -> None)
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$t36Dir/docs")
    graft.ops.LangId.profileRows.toDF("lang", "trigram", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$t36Dir/profiles")
    graft.ops.LangId.routingRows.toDF("script", "lang", "pri")
      .coalesce(1).write.mode("overwrite").parquet(s"$t36Dir/routing")
    graft.ops.LangId.scriptDefault.toSeq.sortBy(_._1).toDF("script", "dflt")
      .coalesce(1).write.mode("overwrite").parquet(s"$t36Dir/defaults")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- t26: Gopher repetition signals (Rae et al. 2021 A1.1) — the
    //    per-row kernel's 13-signal struct, gated per doc on a subset
    //    of n sizes (the spec pins the rest on hand-derived fixtures).
    //    The raw corpus is single-line, so line/paragraph structure is
    //    synthesized deterministically from substrings — duplicate
    //    lines and a paragraph break both engines construct
    //    identically. The oracle recomputes every signal from scratch
    //    in SQL (own tokenization, own argmax, own position-union). --
    "t26_gopher_repetition" -> { (s, d) =>
      import graft.ops.RepetitionSignals
      val lined = Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), concat(
          substring(col("text"), 1, 80), lit("\n"),
          substring(col("text"), 1, 40), lit("\n\n"),
          substring(col("text"), 41, 40), lit("\n"),
          substring(col("text"), 1, 40)).as("t"))
      RepetitionSignals.withSignals(lined, "t")
        .select(col("doc_id"),
          round(col("dup_line_frac"), 4).as("dup_line_frac"),
          round(col("dup_line_char_frac"), 4).as("dup_line_char_frac"),
          round(col("dup_para_frac"), 4).as("dup_para_frac"),
          round(col("dup_para_char_frac"), 4).as("dup_para_char_frac"),
          round(col("top_2gram_char_frac"), 4).as("top_2gram"),
          round(col("top_3gram_char_frac"), 4).as("top_3gram"),
          round(col("top_4gram_char_frac"), 4).as("top_4gram"),
          round(col("dup_5gram_char_frac"), 4).as("dup_5gram"),
          round(col("dup_8gram_char_frac"), 4).as("dup_8gram"),
          round(col("dup_10gram_char_frac"), 4).as("dup_10gram"))
        .orderBy("doc_id")
    },

    // -- t27: BM25 relevance against a fixed query-term bag — corpus
    //    stats ride the one-row broadcast (waived t8 shape), scoring
    //    is a pure map. The oracle replays idf/tf-normalization with
    //    the identical operation order and literal constants. --------
    "t27_bm25" -> { (s, d) =>
      TextAnalysis.bm25(
          Tables.documents(s, d).select("doc_id", "text"),
          "doc_id", "text", Seq("table", "scan", "hash"))
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("n_tok"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy("doc_id")
    },

    // -- t34: block-level boilerplate extraction — boilerpipe's
    //    NumWordsRulesClassifier (WSDM 2010) + terminating-blocks rule
    //    over DOM-block segmentation. Fixture pages plant nav bars,
    //    sidebars, footers, tables and terminator lines around known
    //    article text; expected main content is hand-derived branch by
    //    branch in writeT34Fixture (stored-expectation pattern, c24/
    //    t22 precedent — the decision tree is not worth re-deriving in
    //    SQL when every verdict is documented at the fixture). --------
    "t34_block_extract" -> { (s, _) =>
      writeT34Fixture(s)
      s.read.parquet(t34Dir)
        .select(col("case_id"),
          TextAnalysis.extractMainContent(col("html")).as("main_text"))
        .orderBy("case_id")
    },

    // -- t41: mojibake repair (the ftfy inversion: re-encode through
    //    cp1252 with a latin-1 retry, strictly re-decode as UTF-8,
    //    accept only shrinking repairs, two rounds for double
    //    mangling). Every fixture pair hand-computed from the UTF-8
    //    byte sequences and legacy code pages (writeT41Fixture), and
    //    cross-checked against an independent reimplementation of the
    //    acceptance rules before landing. --------------------------
    "t41_mojibake" -> { (s, _) =>
      writeT41Fixture(s)
      s.read.parquet(t41Dir)
        .select(col("doc_id"),
          graft.ops.Mojibake.fixMojibake(col("mangled")).as("fixed"),
          graft.ops.Mojibake.mojibakeFlag(col("mangled")).as("changed"))
        .orderBy("doc_id")
    },

    // -- t48: ARPA EXPORT round trip — the in-engine trigram KN model
    //    written as a standard ARPA file (interpolated probs + λ
    //    backoff weights), reloaded, and Katz-scored: per-language
    //    mean perplexity must agree with the direct in-engine score,
    //    and the oracle re-derives that truth from scratch (the t35
    //    formula emitted for BOTH columns). -------------------------
    "t48_arpa_roundtrip" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val path = "/tmp/graft_gate_t48_kn3.arpa"
      // ONE trained model: the export and the direct self-score share
      // the persisted count frames instead of each rebuilding them
      val m3 = graft.ops.LanguageModel.kn3Train(docs, "doc_id", "text")
      m3.saveArpa(path)
      val ar = graft.ops.LanguageModel.arpaScore(
        graft.ops.LanguageModel.loadArpa(s, path), docs, "doc_id", "text",
        escapeLiteralUnk = true)
      m3.score(docs, "doc_id", "text")
        .select(col("doc_id"), col("kn3_ppl"))
        .join(ar.select(col("doc_id"), col("arpa_ppl"),
          col("n_trigrams")), "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_trigrams").as("total_trigrams"),
          round(avg("kn3_ppl"), 4).as("avg_ppl_engine"),
          round(avg("arpa_ppl"), 4).as("avg_ppl_arpa"))
        .orderBy("lang")
    },

    // -- t47: ARPA language-model interop — load a KenLM/SRILM-format
    //    trigram model and score docs with the standard Katz backoff
    //    lookup. The oracle parses the SAME file (order-free: gram
    //    order = word count of the middle tab field) and replays the
    //    lookup CASE-for-CASE. -----------------------------------------
    "t47_arpa_score" -> { (s, _) =>
      writeT47Fixture(s)
      val model = graft.ops.LanguageModel.loadArpa(s, t47Arpa)
      graft.ops.LanguageModel.arpaScore(model,
          s.read.parquet(t47Docs), "doc_id", "text")
        .select(col("doc_id"), col("n_trigrams"),
          round(col("arpa_logprob"), 4).as("arpa_logprob"),
          round(col("arpa_ppl"), 4).as("arpa_ppl"))
        .orderBy("doc_id")
    },

    // -- t49: fastText `.bin` import — load a real v12 supervised
    //    binary and score documents with the standard line machinery
    //    (word rows + hashed word-ngrams + EOS, mean vector, softmax).
    //    The oracle recomputes everything from the dumped matrices and
    //    an independently derived per-doc row multiset. --------------
    "t49_fasttext" -> { (s, d) =>
      writeT49Fixture(s, d)
      val m = graft.ops.FastText.load(s, t49Bin)
      Tables.documents(s, d).filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"),
          graft.ops.FastText.predictCol(s, m, col("text")).as("p"))
        .select(col("doc_id"), col("p.label").as("label"),
          round(col("p.prob"), 4).as("prob"))
        .orderBy("doc_id")
    },

    // -- t53: order-5 KN TRAIN + export round trip — the engine trains
    //    the exact model class CCNet ships (5-gram interpolated KN),
    //    exports it as ARPA, and both faces must agree: the oracle
    //    replays the 5-level Katz lookup from the exported file and
    //    pins BOTH the direct in-engine score and the load-and-score
    //    path to it (absolute correctness of the order-N recursion is
    //    pinned by LanguageModelSpec: n=3 ≡ the hand-derived trigram
    //    path, per-context normalization at n=4). -------------------
    "t53_kn5_roundtrip" -> { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") % 17 === 0)
      val m = graft.ops.LanguageModel.knTrain(docs, "doc_id", "text", 5)
      m.saveArpa(t53Arpa)
      val direct = m.score(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_ngrams"),
          round(col("kn_ppl"), 4).as("ppl_direct"))
      val viaFile = graft.ops.LanguageModel.arpaScoreN(
          graft.ops.LanguageModel.loadArpaN(s, t53Arpa), docs,
          "doc_id", "text", escapeLiteralUnk = true)
        .select(col("doc_id"), round(col("arpa_ppl"), 4).as("ppl_arpa"))
      direct.join(viaFile, "doc_id").orderBy("doc_id")
    },

    // -- t52: persisted BM25 inverted index — build once (term-
    //    clustered postings + lengths + stats), query a term bag
    //    reading ONLY its terms' postings; scores must equal the
    //    direct single-scan BM25 formula recomputed from raw text.
    //    Rows re-sorted by the ROUNDED score so cross-engine float
    //    sort ties cannot reorder the output. ------------------------
    "t52_bm25_index" -> { (s, d) =>
      val dir = "/tmp/graft_gate_t52_bm25_idx"
      graft.ops.Bm25Index.build(Tables.documents(s, d), "doc_id", "text", dir)
      graft.ops.Bm25Index.query(s, dir, Seq("table", "scan", "hash"),
          k = 1000000)
        .select(col("doc").as("doc_id"), round(col("bm25"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
    },

    // -- t51: FIVE-gram ARPA interop — load a KenLM-order model and
    //    Katz-score through every backoff depth; the oracle re-parses
    //    the file and replays the 5-level lookup case-for-case. ------
    "t51_arpa5_score" -> { (s, _) =>
      writeT51Fixture(s)
      val model = graft.ops.LanguageModel.loadArpaN(s, t51Arpa)
      graft.ops.LanguageModel.arpaScoreN(model,
          s.read.parquet(t51Docs), "doc_id", "text")
        .select(col("doc_id"), col("n_ngrams"),
          round(col("arpa_logprob"), 4).as("arpa_logprob"),
          round(col("arpa_ppl"), 4).as("arpa_ppl"))
        .orderBy("doc_id")
    },

    // -- t50: SentencePiece `.model` round trip — the trained-tokenizer
    //    interop: pieces → protobuf ModelProto → parse → Viterbi
    //    segmentation, against the on-paper traces (t28 pattern). ----
    "t50_spm_roundtrip" -> { (s, _) =>
      writeT50Fixture(s)
      graft.ops.SentencePieceModel.save(t50Pieces, -8.0, t50Model,
        s.sparkContext.hadoopConfiguration)
      val spm = graft.ops.SentencePieceModel.load(s, t50Model)
      val toks = graft.ops.VocabTokenizer.unigramTokens(col("text"),
        spm.pieces, spm.unkScore.getOrElse(-8.0))
      val counts = graft.ops.VocabTokenizer.unigramTokenCounts(col("text"),
        spm.pieces, spm.unkScore.getOrElse(-8.0))
      s.read.parquet(t50Docs + "_in")
        .select(col("doc_id"),
          concat_ws(" ", toks).as("toks"),
          counts.getField("n_tokens").cast("long").as("n_tokens"),
          counts.getField("n_unk").cast("long").as("n_unk"))
        .orderBy("doc_id")
    },

    // -- t46: readability (Flesch reading ease + Flesch-Kincaid
    //    grade) — sentences from the t42 cascade, the published
    //    vowel-group syllable heuristic, 4-dp scores. The oracle
    //    recomputes everything from its own cascade + list ops. ------
    "t46_readability" -> { (s, d) =>
      TextAnalysis.readability(
          Tables.documents(s, d)
            .filter(col("doc_id") % 7 === 0)
            .withColumn("t", t42Text),
          "doc_id", "t")
        .orderBy("doc_id")
    },

    // -- t45: Zipf-law corpus card — exact least-squares fit of
    //    ln f ~ ln rank over the full rank-frequency table (ties rank
    //    by term so both engines derive the identical permutation).
    //    The oracle re-ranks with one row_number and refits from its
    //    own sums. ---------------------------------------------------
    "t45_zipf_card" -> { (s, d) =>
      TextAnalysis.zipfCard(Tables.documents(s, d), "text", minCount = 2L)
    },

    // -- t43: Unicode normalization (UAX #15) — NFC folds only the
    //    canonical axis (combining marks, singletons, jamo), NFKC adds
    //    the compatibility folds. Every expectation hand-derived from
    //    the published UCD decomposition tables (writeT43Fixture). ---
    "t43_nfkc" -> { (s, _) =>
      writeT43Fixture(s)
      s.read.parquet(t43Dir)
        .select(col("case_id"),
          graft.ops.UnicodeNorm.nfc(col("raw")).as("nfc"),
          graft.ops.UnicodeNorm.nfkc(col("raw")).as("nfkc"))
        .orderBy("case_id")
    },

    // -- t42: rule-based sentence segmentation (abbreviation/initial/
    //    decimal protection, terminator+closer boundaries, newline
    //    paragraph breaks). The oracle replays the cascade GENERATED
    //    from the same step table, then splits/trims/filters and
    //    re-explodes with ordinality — full sentence text under the
    //    hash. ------------------------------------------------------
    "t42_sentences" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .withColumn("t", t42Text)
        .select(col("doc_id"),
          posexplode(TextAnalysis.splitSentences(col("t")))
            .as(Seq("sent_idx", "sentence")))
        .orderBy("doc_id", "sent_idx")
    },

    // -- t44: sentence-aware chunking — greedy packing of consecutive
    //    sentences into ≤cap-token chunks (over-long sentences become
    //    their own chunk). Chunk text AND token sums under the hash;
    //    the oracle re-derives the greedy walk with a recursive CTE
    //    over the t42 cascade's sentences. -----------------------------
    "t44_sentence_chunks" -> { (s, d) =>
      TextAnalysis.chunkBySentences(
          Tables.documents(s, d)
            .filter(col("doc_id") % 7 === 0)
            .withColumn("t", t42Text),
          "doc_id", "t", maxTokens = 24)
        .orderBy("doc_id", "chunk_idx")
    },

    // -- t21: character-trigram language ID over 24 languages (TextCat
    //    method). Spark classifies through the inverted-index kernel;
    //    the oracle re-derives every verdict from the raw profile rows
    //    with its own trigram extraction + scoring + argmax. ----------
    "t21_langid_ngram" -> { (s, _) =>
      writeT21Fixture(s)
      s.read.parquet(s"$t21Dir/docs")
        .select(col("doc_id"),
          graft.ops.LangId.langIdNgram(col("text")).as("lang"))
        .orderBy("doc_id")
    },

    // -- t36: script-gated trigram langid (the CLD-style router):
    //    dominant Unicode script from character counts, then the
    //    trigram argmax restricted to that script's candidate set —
    //    fixes Latin chrome outvoting a CJK payload. ----------------
    "t36_langid_routed" -> { (s, _) =>
      writeT36Fixture(s)
      s.read.parquet(s"$t36Dir/docs")
        .select(col("doc_id"),
          graft.ops.LangId.langIdRouted(col("text")).as("lang"))
        .orderBy("doc_id")
    },
    // -- t37: WordPiece counts (BERT greedy longest-match-first with
    //    "##" continuations and whole-word [UNK] fallback) over every
    //    document. The vocabulary plants all three behaviors: whole-
    //    word pieces that outrank shorter prefixes ("scan" over "s"),
    //    multi-piece splits ("cus ##tomer"), and a partial-then-fail
    //    word ("filter": "fil" matches, "ter" has no continuation, so
    //    the WHOLE word is one [UNK] — the semantic that separates
    //    WordPiece from the plain greedy rule t14 gates). The oracle
    //    re-derives every segmentation with a recursive CTE. ----------
    "t37_wordpiece" -> { (s, d) =>
      val c = graft.ops.VocabTokenizer.wordPieceCounts(col("text"), t37Vocab)
      // Scan-parallelism repair (guide §2.5, the r17 Par.spread rule):
      // the WordPiece kernel is the heaviest per-row UDF in the text
      // family and rides a single-split scan, and the trailing orderBy
      // runs the kernel TWICE (range-partitioner sampling + final
      // pass) — both single-threaded without the spread. No-op at
      // production scale (byte rule).
      graft.util.Par.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), c.as("__c"))
        .select(col("doc_id"),
          col("__c.n_tokens").cast("long").as("n_pieces"),
          col("__c.n_unk").cast("long").as("n_unk_words"))
        .orderBy("doc_id")
    },

    // -- t38: WordPiece TRAINER (the likelihood merge rule: next merge
    //    maximizes count(a,b)/(count(a)·count(b)), Schuster & Nakajima
    //    2012 / the HuggingFace WordPiece trainer) on the classic
    //    hug/pug/pun/bun/hugs corpus. Expectations hand-derived merge
    //    by merge in writeT38Fixture (exact-rational scores, ties
    //    lexicographic per the documented determinism contract). ------
    "t38_wordpiece_learn" -> { (s, _) =>
      writeT38Fixture(s)
      import s.implicits._
      val corpus = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
        Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
        .toDF("t")
      graft.ops.VocabTokenizer.learnWordPiece(corpus, "t", numMerges = 9)
        .zipWithIndex
        .map { case (p, i) => (i.toLong, p) }
        .toDF("idx", "piece")
        .orderBy("idx")
    },

    // -- t39: PMI collocations (Church & Hanks 1990) — adjacent-pair
    //    log-likelihood ratio vs independence, exact-count inputs,
    //    4-dp rounding, (pmi desc, w1, w2) total order so the top-K
    //    cut is deterministic in both engines. ----------------------
    "t39_collocations" -> { (s, d) =>
      TextAnalysis.collocations(Tables.documents(s, d).select("text"),
        "text", minCount = 5L, topK = 50)
    },

    // -- t40: per-source vocabulary coverage / OOV card — exact
    //    whole-word membership against a fixed vocab; the report a
    //    tokenizer owner reads before retraining. --------------------
    "t40_vocab_coverage" -> { (s, d) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, d),
          "source", "text", t40Vocab)
        .orderBy("source")
    },

    // -- language-ID heuristic: marker-word occurrence scoring with a
    //    deterministic argmax (tie order en > es > de > fr > unknown).
    //    (On this synthetic corpus the content carries no real language
    //    signal — the query pins the RULE's semantics, which is what a
    //    correctness gate can check.) ----------------------------------
    "t1_langid" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("predicted", TextAnalysis.languageId(col("text")))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // -- quality scoring: the LIBRARY's qualityFeatures/qualityScore
    //    (one definition — the gate pins TextAnalysis itself, so a
    //    scoring change cannot silently diverge from this query) -------
    "t2_quality" -> { (s, d) =>
      val withFeats = TextAnalysis.qualityFeatures(col("text"))
        .foldLeft(Tables.documents(s, d)) {
          case (df, (name, expr)) => df.withColumn(name, expr)
        }
      withFeats
        .withColumn("score", TextAnalysis.qualityScore(
          col("punct_ratio"), col("digit_ratio"), col("stop_ratio")))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg("punct_ratio"), 6).as("avg_punct"),
          round(avg("digit_ratio"), 6).as("avg_digit"),
          round(avg("stop_ratio"), 6).as("avg_stop"),
          round(avg("score"), 6).as("avg_score"),
          round(avg("avg_tok_len"), 6).as("avg_tok_len"))
        .orderBy("lang")
    },

    // -- token counting: whitespace tokens + BPE-ish subword estimate --
    "t3_token_counts" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("ws_tokens", F.tokenCount(col("text")))
        .withColumn("subwords", F.subwordCount(col("text")))
        .groupBy("lang")
        .agg(
          sum("ws_tokens").as("total_ws_tokens"),
          sum("subwords").as("total_subwords"),
          max("ws_tokens").cast("long").as("max_ws_tokens"),
          min("ws_tokens").cast("long").as("min_ws_tokens"))
        .orderBy("lang")
    },

    // -- repetition signals (Gopher/RefinedWeb-style rules): token
    //    repeat ratio + duplicate-bigram fraction over a corpus with
    //    KNOWN repetition (every 5th doc's text doubled — its bigram
    //    set gains the seam but every base bigram duplicates) ----------
    "t5_repetition" -> { (s, d) =>
      val base = Tables.documents(s, d).withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")))
      val withFeats = TextAnalysis.repetitionFeatures(col("text"), ngram = 2)
        .foldLeft(base) { case (df, (name, e)) => df.withColumn(name, e) }
      withFeats.groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg("tok_repeat_ratio"), 6).as("avg_tok_repeat"),
          round(avg("dup_ngram_ratio"), 6).as("avg_dup_bigram"),
          sum(when(col("dup_ngram_ratio") >= 0.4, 1).otherwise(0)).as("n_flagged"))
        .orderBy("lang")
    },

    // -- doc-level statistics profile ----------------------------------
    "t4_doc_stats" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          round(avg("n_chars"), 4).as("avg_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          countDistinct("lang").as("n_langs"))
        .orderBy("source")
    },

    // -- corpus-level vocabulary statistics: one token shuffle ---------
    "t6_corpus_vocab" -> { (s, d) =>
      graft.ops.TextAnalysis.corpusVocabStats(Tables.documents(s, d), "text")
    },

    // -- t8: corpus TF-IDF — each language's 3 most characteristic
    //    terms by summed tf·ln(N/df). Ranking runs on the ROUNDED
    //    score (4 dp) on both engines, so a last-ulp ln() difference
    //    can never flip a rank. --------------------------------------
    "t8_tfidf" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val byLang = graft.ops.TextAnalysis.tfidf(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "term")
        .agg(round(sum("tfidf"), 4).as("score"))
      val w = Window.partitionBy("lang")
        .orderBy(col("score").desc, col("term"))
      byLang
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("lang", "rank", "term", "score")
        .orderBy("lang", "rank")
    },

    // -- t11: corpus-trained bigram LM score (CCNet-style quality
    //    proxy) — add-one smoothed ln P(w2|w1), per-language means. ---
    "t11_lm_score" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.bigramLogProb(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bigrams").as("total_bigrams"),
          round(avg("lm_logprob"), 4).as("avg_logprob"),
          round(min("lm_logprob"), 4).as("min_logprob"))
        .orderBy("lang")
    },

    // -- t32: interpolated Kneser–Ney bigram LM, trained and
    //    self-scored on the corpus (the real CCNet perplexity basis;
    //    t11 is the add-one stand-in). Fixed discount 0.75; per-lang
    //    means plus mean perplexity. --------------------------------
    "t32_kneser_ney" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.LanguageModel.kneserNeySelfScore(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bigrams").as("total_bigrams"),
          round(avg("kn_logprob"), 4).as("avg_logprob"),
          round(min("kn_logprob"), 4).as("min_logprob"),
          round(avg("kn_ppl"), 4).as("avg_ppl"))
        .orderBy("lang")
    },

    // -- t35: trigram Kneser–Ney with recursive backoff (the KenLM
    //    5-gram shape, order 3), trained and self-scored on the
    //    corpus; same per-lang summary as t32 one order deeper. -----
    "t35_kn3" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.LanguageModel.kneserNey3SelfScore(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_trigrams").as("total_trigrams"),
          round(avg("kn3_logprob"), 4).as("avg_logprob"),
          round(min("kn3_logprob"), 4).as("min_logprob"),
          round(avg("kn3_ppl"), 4).as("avg_ppl"))
        .orderBy("lang")
    },

    // -- t12: corpus-level boilerplate token removal — tokens in > 50%
    //    of docs carry no per-doc signal; drop every occurrence,
    //    order-preserving reconstruction via the codegen'd
    //    filter/array_join higher-order functions. ------------------
    "t12_boilerplate" -> { (s, d) =>
      graft.ops.TextAnalysis.dropUbiquitousTokens(
        Tables.documents(s, d), "doc_id", "text", maxDocFrac = 0.5)
        .orderBy("doc_id")
    },

    // -- t10: code-point Shannon entropy per doc (every 25th), 4-dp
    //    rounded — the ln n − (Σ c ln c)/n identity on both engines. --
    "t10_entropy" -> { (s, d) =>
      graft.ops.TextAnalysis.charEntropy(
          Tables.documents(s, d).filter(col("doc_id") % 25 === 0),
          "doc_id", "text")
        .select(col("doc_id"), col("n_cp"),
          round(col("entropy"), 4).as("entropy_r"))
        .orderBy("doc_id")
    },

    // -- t9: context-window chunking — 16-token chunks, 4-token
    //    overlap (stride 12), every 10th doc. Chunk text itself is
    //    under the hash, so slicing/joining parity is pinned exactly. -
    "t9_chunking" -> { (s, d) =>
      graft.ops.TextAnalysis.chunkDocuments(
          Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
            .select("doc_id", "text"),
          "text", chunkTokens = 16, overlap = 4)
        .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
        .orderBy("doc_id", "chunk_idx")
    },

    // -- t13: HTML→text extraction + link-density boilerplate rule over
    //    deterministically synthesized markup (style with a '>' inside,
    //    script with operators, comments, entities incl. double-encoded
    //    &amp;lt;, a nav line of anchors, a malformed unclosed tag every
    //    7th doc). Extracted strings are UNDER the hash — the whole
    //    cascade's semantics are pinned exactly. ----------------------
    "t13_html_extract" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .withColumn("html", t13Html)
        .select(col("doc_id"),
          TextAnalysis.htmlToText(col("html")).as("txt"),
          TextAnalysis.stripBoilerplateLines(col("html"), 0.5).as("txt_bp"))
        .orderBy("doc_id")
    },

    // -- t19: markdown → text, the sibling of t13 for the other common
    //    markup class (README/docs/forum corpora). Formatting syntax
    //    strips, prose AND fenced code content stay. ------------------
    "t19_markdown_extract" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .withColumn("md", t19Md)
        .select(col("doc_id"),
          TextAnalysis.markdownToText(col("md")).as("txt"))
        .orderBy("doc_id")
    },

    // -- t14: vocab-driven greedy subword token counting, vocabulary
    //    loaded from a tokenizer.json FIXTURE through the same parse
    //    path as the V15 validator — proving the tokenizer.json →
    //    vocab → counting wiring end to end. "customer" needs the
    //    added_tokens entry ("omer") to segment as cust+omer, so the
    //    gate numbers certify added-token loading too; 'w'/'y' are
    //    deliberately absent from the vocab → known unk counts. -------
    // -- t22: TRUE merge-rank BPE (Sennrich inference: lowest-rank
    //    adjacent pair fuses everywhere, repeat) over the paper's own
    //    example merge table, loaded through the tokenizer.json parse
    //    path (vocab + merges). The full segmentations are UNDER the
    //    hash — merge ORDER is certified, not just counts; greedy
    //    longest-match (t14's rule) would get "lowest"→low+est right
    //    but "widestnewest" and the rank-interleave cases wrong.
    //    Expectations hand-derived and stored (m-gate pattern; merge
    //    semantics are not ANSI-SQL-expressible). --------------------
    // -- t31: robots-meta directives — the page's indexing consent:
    //    both attribute orders, quoted AND unquoted values, the `none`
    //    equivalence, and a data-name decoy that must NOT match. The
    //    oracle interpolates the IDENTICAL pattern strings (quote-
    //    doubled) over identically-built html. -----------------------
    // -- t55: JSON-LD structured data — block extraction + @type per
    //    block; attribute quoting/case variants, array-@type and
    //    malformed blocks drop from types but count as blocks. ------
    // -- t56: end-of-line dehyphenation — the PDF/scanned-text repair:
    //    injected letter-⏎-lowercase breaks restore the original text
    //    exactly (hyphens and newlines are normalized out of the base
    //    first so the round-trip IS the oracle, recomputed by DuckDB
    //    from the source text alone). ----------------------------------
    "t57_dehyphenate" -> { (s, d) =>
      val base = regexp_replace(col("text"), "[-\\n\\r]", " ")
      val wrapped = regexp_replace(base,
        "([a-z]{4})([a-z]{4})", "$1-\n$2")
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.dehyphenate(wrapped).as("roundtrip"))
        .orderBy("doc_id")
    },

    "t55_jsonld" -> { (s, d) =>
      val id = col("doc_id")
      val html = when(id % 4 === 0, concat(
          lit("<html><head><script type=\"application/ld+json\">" +
            "{\"@context\":\"https://schema.org\",\"@type\":\"Article\"," +
            "\"headline\":\"H"), id, lit("\"}</script></head>")))
        .when(id % 4 === 1, concat(
          lit("<head><SCRIPT TYPE='application/ld+json'>" +
            "{\"@type\":\"NewsArticle\"}</SCRIPT>" +
            "<script type=application/ld+json>" +
            "{\"@type\":\"Product\",\"sku\":"), id, lit("}</script></head>")))
        .when(id % 4 === 2, lit("<html><head><script type=\"text/javascript\">" +
          "var x = {\"@type\":\"NotLd\"};</script></head>"))
        .otherwise(lit("<head><script type=\"application/ld+json\">" +
          "{\"@type\":[\"A\",\"B\"]}</script>" +
          "<script type=\"application/ld+json\">not json</script></head>"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextAnalysis.jsonLdBlocks(html)).as("n_blocks"),
          array_join(TextAnalysis.jsonLdTypes(html), ",").as("types"))
        .orderBy("doc_id")
    },

    // -- t54: head metadata — title/description/og/canonical/lang off
    //    the same attr-order × value-syntax pattern family as t31.
    //    The canonical href is the page's OWN dedup declaration (no
    //    entity decode — it is a URL). Oracle replays per doc_id case.
    "t54_html_meta" -> { (s, d) =>
      val id = col("doc_id")
      val html = when(id % 4 === 0, concat(
          lit("<html lang=\"en-US\"><head><title>Doc "), id,
          lit(" &amp; more</title><meta name=\"description\" " +
            "content=\"summary "), id,
          lit("\"><link rel=\"canonical\" href=\"https://example.org/p?id="),
          id, lit("&amp;v=1\"></head><body>x")))
        .when(id % 4 === 1, concat(
          lit("<html><head><meta content='og desc "), id,
          lit("' property='og:description'><meta property=\"og:title\" " +
            "content=\"OG "), id,
          lit("\"><link href=https://ex.org/c/"), id,
          lit(" rel=canonical></head>")))
        .when(id % 4 === 2, lit("<html><head></head><body>plain"))
        .otherwise(concat(
          lit("<html lang=fr><head><title>unclosed" +
            "<meta name=description content=word"), id, lit("></head>")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.htmlTitle(html).as("title"),
          TextAnalysis.metaDescription(html).as("description"),
          TextAnalysis.ogContent(html, "title").as("og_title"),
          TextAnalysis.ogContent(html, "description").as("og_description"),
          TextAnalysis.canonicalHref(html).as("canonical"),
          TextAnalysis.htmlLangDeclared(html).as("lang_decl"))
        .orderBy("doc_id")
    },

    "t31_robots_meta" -> { (s, d) =>
      val html = when(col("doc_id") % 5 === 0, concat(
          lit("<html><head><meta name=\"robots\" " +
            "content=\"noindex, nofollow\"></head><body>"), col("text")))
        .when(col("doc_id") % 5 === 1, concat(
          lit("<html><head><meta content=\"NOFOLLOW\" " +
            "name=\"robots\"></head><body>"), col("text")))
        .when(col("doc_id") % 5 === 2, concat(
          lit("<html><head><meta name=robots content=noindex></head>" +
            "<body>"), col("text")))
        .when(col("doc_id") % 5 === 3, concat(
          lit("<html><head><meta name='robots' content='none'></head>" +
            "<body>"), col("text")))
        .otherwise(concat(
          lit("<html><head><meta data-name=\"robots\" " +
            "content=\"noindex\"></head><body>"), col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.metaRobotsContent(html).as("directives"),
          TextAnalysis.robotsNoindex(html).as("noindex"),
          TextAnalysis.robotsNofollow(html).as("nofollow"))
        .orderBy("doc_id")
    },

    // -- t30: IN-ENGINE classifier training — full-batch logistic GD
    //    over the t15 scorer's own features (mean token-bucket weight
    //    + bias through a sigmoid), 2 iterations, label = "contains
    //    the token 'table'". The oracle unrolls both iterations in
    //    SQL: its own bucketing (the t15 HUGEINT replay), its own
    //    sigmoid residuals, its own gradient sums. ------------------
    "t30_train_classifier" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val rawToks = regexp_extract_all(coalesce(col("text"), lit("")),
        lit("[^ \\t\\n\\f\\r]+"), lit(0))
      val labeled = docs.select(col("doc_id"), col("text"),
        when(array_contains(rawToks, "table"), 1.0).otherwise(0.0)
          .as("y"))
      val m = TextAnalysis.trainQualityWeights(labeled, "doc_id", "text",
        "y", dim = 64, iters = 2, lr = 1.0)
      s.createDataset(
          m.weights.zipWithIndex.map { case (w, i) => (i.toLong, w) } :+
            ((-1L, m.bias)))
        .toDF("idx", "raw")
        .select(col("idx"), round(col("raw"), 4).as("weight"))
        .orderBy("idx")
    },

    // -- t28: unigram-LM (SentencePiece) Viterbi segmentation — the
    //    global-optimum counterpart to t22's merge replay; model
    //    round-trips through tokenizer.json, expectations hand-derived
    //    (see writeT28Fixture). -----------------------------------
    "t28_unigram_tokens" -> { (s, _) =>
      writeT28Fixture(s)
      val pieces = graft.ops.VocabTokenizer.loadUnigram(s, t28TokenizerPath)
      val toks = graft.ops.VocabTokenizer
        .unigramTokens(col("text"), pieces, unkScore = -10.0)
      val counts = graft.ops.VocabTokenizer
        .unigramTokenCounts(col("text"), pieces, unkScore = -10.0)
      s.read.parquet(t28WordsDir)
        .select(col("word_id"),
          array_join(toks, " ").as("tokens"),
          counts.getField("n_tokens").cast("long").as("n_tokens"),
          counts.getField("n_unk").cast("long").as("n_unk"))
        .orderBy("word_id")
    },

    // -- t29: unigram-LM TRAINING — learnUnigram's Viterbi-EM over a
    //    fixed corpus; the learned piece set AND scores are under the
    //    hash, expectations hand-derived (see writeT29Fixture). ------
    "t29_unigram_learn" -> { (s, _) =>
      writeT29Fixture(s)
      import s.implicits._
      val corpus = (Seq.fill(2)("abab") ++ Seq.fill(3)("ab")).toDF("t")
      val pieces = graft.ops.VocabTokenizer.learnUnigram(corpus, "t",
        vocabSize = 4, maxPieceLen = 2, emIters = 2)
      s.createDataset(pieces.zipWithIndex
          .map { case ((p, sc), i) => (i.toLong, p, sc) })
        .toDF("rank", "piece", "raw")
        .select(col("rank"), col("piece"), round(col("raw"), 4).as("score"))
        .orderBy("rank")
    },

    // -- t56: tiktoken vocab format — base64+rank lines, byte-pair
    //    merge by RANK (no merge table); expectations hand-derived by
    //    running the published algorithm on paper: "low"→[7] (lo then
    //    low), " lower"→[3,11] (lo, then low BEATS " lo" on rank,
    //    er, lower), unknown '!' → -1. -------------------------------
    "t56_tiktoken_ids" -> { (s, _) =>
      import s.implicits._
      def b64(x: String) = java.util.Base64.getEncoder
        .encodeToString(x.getBytes("UTF-8"))
      val vocabLines = Seq(
        s"${b64("l")} 0", s"${b64("o")} 1", s"${b64("w")} 2",
        s"${b64(" ")} 3", s"${b64("e")} 4", s"${b64("r")} 5",
        s"${b64("lo")} 6", s"${b64("low")} 7", s"${b64("er")} 8",
        s"${b64(" l")} 9", s"${b64(" lo")} 10", s"${b64("lower")} 11")
      val dir = java.nio.file.Paths.get("/tmp/graft_gate_t56_tiktoken")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("toy.tiktoken"),
        ("# toy vocab\n" + vocabLines.mkString("\n") + "\n")
          .getBytes("UTF-8"))
      val entries = graft.ops.Tiktoken.load(s,
        dir.resolve("toy.tiktoken").toString)
      Seq((1L, "low lower"), (2L, "low"), (3L, "lo!"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.ops.Tiktoken.countCol(col("text"), entries)
            .cast("long").as("n_tokens"),
          concat_ws(",", graft.ops.Tiktoken.idsCol(col("text"), entries))
            .as("ids"))
        .orderBy("doc_id")
    },

    "t22_bpe_tokens" -> { (s, _) =>
      writeT22Fixture(s)
      val vocab = graft.ops.VocabTokenizer.loadVocab(s, t22TokenizerPath)
      val merges = graft.ops.VocabTokenizer.loadMerges(s, t22TokenizerPath)
      val toks = graft.ops.VocabTokenizer.bpeTokens(col("text"), vocab, merges)
      val counts = graft.ops.VocabTokenizer.bpeTokenCounts(col("text"), vocab, merges)
      s.read.parquet(t22WordsDir)
        .select(col("word_id"),
          array_join(toks, " ").as("tokens"),
          counts.getField("n_tokens").cast("long").as("n_tokens"),
          counts.getField("n_unk").cast("long").as("n_unk"))
        .orderBy("word_id")
    },

    // -- t25: BPE TRAINING — learnBpe over a fixed corpus; the merge
    //    SEQUENCE is under the hash, expectations hand-derived by
    //    running Sennrich's algorithm on paper (weighted pair counts,
    //    lexicographic ties — the derivation lives in writeT25Fixture).
    //    The distributed half (word-type count) is one aggregate; the
    //    loop is vocabulary-scale by construction. --------------------
    "t25_bpe_learn" -> { (s, _) =>
      writeT25Fixture(s)
      import s.implicits._
      val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("t")
      val model = graft.ops.VocabTokenizer.learnBpe(corpus, "t",
        numMerges = 8)
      model.merges.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rank", "lhs", "rhs")
        .orderBy("rank")
    },

    // -- t23: BYTE-LEVEL merge-rank BPE (GPT-2 pre-tokenizer + byte
    //    symbol map + merges), vocab/merges through the tokenizer.json
    //    parse path. Full segmentations under the hash; expectations
    //    hand-derived (see writeT23Fixture). -------------------------
    "t23_bytelevel_bpe" -> { (s, _) =>
      writeT23Fixture(s)
      val vocab = graft.ops.VocabTokenizer.loadVocab(s, t23TokenizerPath)
      val merges = graft.ops.VocabTokenizer.loadMerges(s, t23TokenizerPath)
      val toks = graft.ops.VocabTokenizer.byteLevelBpeTokens(
        col("text"), vocab, merges)
      val counts = graft.ops.VocabTokenizer.byteLevelBpeTokenCounts(
        col("text"), vocab, merges)
      s.read.parquet(t23WordsDir)
        .select(col("word_id"),
          array_join(toks, " ").as("tokens"),
          counts.getField("n_tokens").cast("long").as("n_tokens"),
          counts.getField("n_unk").cast("long").as("n_unk"))
        .orderBy("word_id")
    },

    // -- t33: byte-level BPE ROUND-TRIP over the real corpus — decode
    //    (encode(text)) must reproduce the text byte-for-byte on every
    //    document (the GPT-2 byte-level losslessness guarantee: no unk
    //    collapse, no normalization drift). The oracle is simply the
    //    corpus itself — the strongest possible identity pin. ---------
    "t33_bpe_roundtrip" -> { (s, d) =>
      writeT23Fixture(s)
      val vocab = graft.ops.VocabTokenizer.loadVocab(s, t23TokenizerPath)
      val merges = graft.ops.VocabTokenizer.loadMerges(s, t23TokenizerPath)
      val toks = graft.ops.VocabTokenizer.byteLevelBpeTokens(
        col("text"), vocab, merges)
      // Same scan-parallelism repair as t37: the byte-level BPE
      // encode+decode chain is a heavy per-row kernel over a
      // single-split scan, executed twice by the trailing orderBy's
      // range sampling. No-op at production scale (byte rule).
      graft.util.Par.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), col("text"),
          graft.ops.VocabTokenizer.byteLevelDecode(toks).as("decoded"))
        .select(col("doc_id"), col("decoded"),
          (col("decoded") === coalesce(col("text"), lit("")))
            .cast("int").as("roundtrip"))
        .orderBy("doc_id")
    },

    // -- t24: Unicode-script detection — per-script code-point counts
    //    and the first-max dominant script, rolled up per language.
    //    The oracle restates every block range as \x{…} RE2 classes
    //    and replays the same strict-greater fold as a CASE chain. ----
    "t24_script_detect" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val sc = graft.ops.TextAnalysis.scriptCounts(col("text")).toMap
      docs.select(col("lang"),
          graft.ops.TextAnalysis.dominantScript(col("text")).as("script"),
          sc("latin").as("n_latin"), sc("han").as("n_han"))
        .groupBy("lang", "script")
        .agg(count(lit(1)).as("n"), sum("n_latin").as("latin_cp"),
          sum("n_han").as("han_cp"))
        .orderBy("lang", "script")
    },

    "t14_vocab_tokens" -> { (s, d) =>
      writeT14Tokenizer()
      val vocab = graft.ops.VocabTokenizer.loadVocab(s, t14TokenizerPath)
      val c = graft.ops.VocabTokenizer.tokenCounts(col("text"), vocab)
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), c.as("__c"))
        .select(col("doc_id"),
          col("__c.n_tokens").cast("long").as("n_vocab_tokens"),
          col("__c.n_unk").cast("long").as("n_unk"))
        .orderBy("doc_id")
    },

    // -- t15: hashed-feature linear quality classifier (fastText-style
    //    scoring): per-token sha-256 hash bucket → weight lookup → mean
    //    → sigmoid, all column algebra. Per-doc scores UNDER the hash
    //    certify the whole chain: tokenize, bucket kernel, weight
    //    indexing, empty-doc prior. The weights take the FULL external
    //    loop — written in the weight-file contract, loaded back via
    //    loadWeights — so the gate also certifies that offline-trained
    //    vectors plug into the same expression (the oracle embeds the
    //    identical literals; a load/save defect breaks the hash). ------
    "t15_quality_classifier" -> { (s, d) =>
      val path = "/tmp/graft_gate_t15_weights"
      TextAnalysis.saveWeights(s,
        TextAnalysis.LinearModel(t15Weights, t15Bias), path)
      val model = TextAnalysis.loadWeights(s, path)
      Tables.documents(s, d)
        .select(col("doc_id"),
          round(model.score(col("text")), 6).as("q_score"))
        .orderBy("doc_id")
    },

    // -- t16: encoding-damage signals over deterministically injected
    //    corruption — mojibake pairs (Ã©/Ã¯), C0+C1 control bytes,
    //    U+FFFD replacement chars, and a cp1252 smart-quote artifact,
    //    each on a knowable doc_id subset; clean docs must measure
    //    exactly 0.0 on every ratio. ----------------------------------
    "t16_encoding_quality" -> { (s, d) =>
      val dirty = concat(col("text"),
        when(col("doc_id") % 6 === 0, lit(" cafÃ© naÃ¯ve"))
          .when(col("doc_id") % 6 === 1, lit(" bad\u0001\u0002byte"))
          .when(col("doc_id") % 6 === 2, lit(" lost��chars"))
          .when(col("doc_id") % 6 === 3, lit(" smartâ€™quote"))
          .otherwise(lit("")))
      val base = Tables.documents(s, d).withColumn("t", dirty)
      TextAnalysis.encodingQualityFeatures(col("t"))
        .foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("replacement_char_ratio"), 6).as("avg_repl"),
          round(avg("control_char_ratio"), 6).as("avg_ctrl"),
          round(avg("mojibake_ratio"), 6).as("avg_moji"),
          sum(when(col("replacement_char_ratio") > 0 ||
            col("control_char_ratio") > 0 ||
            col("mojibake_ratio") > 0, 1).otherwise(0)).as("n_damaged"))
        .orderBy("lang")
    },

    // -- t17: Unicode normalization fold over deterministically
    //    injected punctuation — curly quotes/em-dash/ellipsis, NBSP +
    //    thin space, zero-width + soft hyphen, and whitespace runs,
    //    each on a knowable doc_id subset. The gate emits the
    //    NORMALIZED STRING itself per doc, so any divergence in any
    //    rule is a value mismatch, not an averaged-away statistic. ----
    // -- t18: corpus data card — the per-(source, lang) summary a
    //    training-data release publishes: doc/empty-doc counts, token
    //    totals under the t3 whitespace rule, and EXACT length
    //    percentiles. `percentile` aggregates a value→count map, so
    //    its memory is ∝ distinct n_chars values per group (a bounded
    //    integer domain), not rows — that is what makes exact (not
    //    approx) quantiles safe at corpus scale here; for genuinely
    //    unbounded domains switch to approx_percentile. One scan,
    //    map-side partial aggregation throughout. --------------------
    // -- t20: INCREMENTAL data card — the t18 card maintained the way a
    //    100 TB corpus must: per-batch mergeable shard cards (counts,
    //    length→count maps, HLL sketches) folded together, exact
    //    percentiles recovered from the MERGED map. The gate proves the
    //    merge invariant: 3-way-split incremental == direct whole-corpus
    //    truth (the oracle computes the direct form; approx_distinct is
    //    the one sketch field and stays out of the gate). -------------
    "t20_incremental_card" -> { (s, d) =>
      import graft.ops.CorpusStats
      val docs = Tables.documents(s, d)
      val cards = (0 until 3).map(b =>
        CorpusStats.shardCard(docs.filter(col("doc_id") % 3 === b),
          Seq("source", "lang"), "text", "n_chars"))
      CorpusStats.finalizeCard(
        CorpusStats.mergeCards(cards.reduce(_ unionByName _),
          Seq("source", "lang")),
        Seq("source", "lang"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_empty"),
          col("total_tokens"), col("avg_tokens"),
          round(col("p50_len"), 4).as("p50_chars"),
          round(col("p95_len"), 4).as("p95_chars"))
        .orderBy("source", "lang")
    },

    "t18_data_card" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tok", F.tokenCount(col("text")).cast("long"))
        .groupBy("source", "lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("text").isNull || trim(col("text")) === "", 1L)
            .otherwise(0L)).as("n_empty"),
          sum("n_tok").as("total_tokens"),
          round(avg("n_tok"), 6).as("avg_tokens"),
          round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
          round(expr("percentile(n_chars, 0.95)"), 4).as("p95_chars"))
        .orderBy("source", "lang")
    },

    "t17_normalize" -> { (s, d) =>
      val inject =
        when(col("doc_id") % 4 === 0,
          lit("it’s “quoted” — fine… "))
          .when(col("doc_id") % 4 === 1,
            lit("non breaking space "))
          .when(col("doc_id") % 4 === 2,
            lit("zero​width­soft "))
          .otherwise(lit("  runs\t of\n whitespace   "))
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .withColumn("t", concat(inject, col("text")))
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("t")).as("norm"),
          (length(col("t")) -
            length(TextAnalysis.normalizeText(col("t"))))
            .cast("long").as("n_folded"))
        .orderBy("doc_id")
    },

    // -- Gopher line-level quality rules over deterministically dirtied
    //    text (every 4th doc gains bullets, 4th+1 a trailing ellipsis,
    //    4th+2 symbol spam — each rule fires on a knowable subset) ----
    "t7_gopher_lines" -> { (s, d) =>
      val dirty = concat(col("text"),
        when(col("doc_id") % 4 === 0, lit("\n- bullet item\n* another..."))
          .when(col("doc_id") % 4 === 1, lit("\ntrailing ellipsis..."))
          .when(col("doc_id") % 4 === 2, lit(" ### tags #"))
          .otherwise(lit("")))
      val base = Tables.documents(s, d).withColumn("t", dirty)
      graft.ops.TextAnalysis.gopherLineFeatures(col("t"))
        .foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
        .groupBy("lang")
        .agg(sum("n_lines").as("total_lines"),
          round(avg("bullet_line_ratio"), 4).as("avg_bullet_ratio"),
          round(avg("ellipsis_line_ratio"), 4).as("avg_ellipsis_ratio"),
          round(avg("mean_word_len"), 4).as("avg_word_len"),
          round(avg("symbol_word_ratio"), 4).as("avg_symbol_ratio"))
        .orderBy("lang")
    })

  /** t14 vocabulary — the single source of truth for BOTH the
    * tokenizer.json fixture (Spark side loads it back through
    * [[graft.ops.VocabTokenizer.loadVocab]]) and the oracle's VALUES
    * list, so the two sides cannot drift. Whole words + subword pieces
    * + all single letters EXCEPT 'w' and 'y' (their occurrences become
    * unknown tokens — the unk path is exercised on every doc that
    * mentions "window"-less w-words like "slow" or "key"). "omer"
    * rides added_tokens, not model.vocab — see the gate comment.
    */
  private val t14ModelVocab: Seq[String] = Seq(
    "the", "table", "value", "spark", "merge", "batch", "window",
    "stream", "join", "order", "group", "line", "part", "row", "hash",
    "agg", "scan", "slo", "cust", "col", "umn", "th", "er", "re",
    "an", "in", "on", "es", "en", "st", "ll",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v")
  private val t14AddedTokens: Seq[String] = Seq("[MASK]", "[PAD]", "omer")
  private val t14TokenizerPath = "/tmp/graft_gate_t14_tokenizer.json"

  private def writeT14Tokenizer(): Unit = {
    val vocabJson = t14ModelVocab.zipWithIndex
      .map { case (t, i) => s""""$t": $i""" }.mkString(", ")
    val addedJson = t14AddedTokens
      .map(t => s"""{"content": "$t"}""").mkString(", ")
    val json =
      s"""{"model": {"type": "BPE", "vocab": {$vocabJson}},
         | "added_tokens": [$addedJson]}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(t14TokenizerPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** t22 fixture: merge-rank BPE over the CLASSIC published example
    * merge table (the low/lower/newest/widest family of Sennrich et
    * al. 2016, §3.2) — expectations HAND-DERIVED from the paper's
    * algorithm, stored next to the words (the m-gate
    * stored-expected-columns pattern; merge-order semantics are not
    * ANSI-SQL-expressible, which is exactly why the engine also keeps
    * the SQL-gateable greedy rule of t14). The tokenizer.json round
    * trip is part of the gate: vocab AND merges load through the same
    * parse path a HuggingFace file takes.
    */
  private val t22Merges: Seq[(String, String)] = Seq(
    ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("n", "e"),
    ("ne", "w"), ("new", "est"), ("w", "i"), ("wi", "d"),
    ("wid", "est"), ("e", "r"))
  private val t22Vocab: Seq[String] =
    Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w",
      "es", "est", "lo", "low", "ne", "new", "newest", "wi", "wid",
      "widest", "er")
  private val t22TokenizerPath = "/tmp/graft_gate_t22_tokenizer.json"
  private val t22WordsDir = "/tmp/graft_gate_t22_words"

  /** t28 fixture: unigram-LM Viterbi segmentation (Kudo 2018). The
    * piece scores are chosen so the fixture words exercise every DP
    * behavior: global-optimum-beats-greedy, score ties broken to the
    * longest piece, unk single-code-point fallback, emoji as one
    * symbol, and multi-word texts. The model round-trips through
    * tokenizer.json (save → load) before encoding, like t22/t23.
    * Every expectation below is hand-derived by tracing the DP:
    *  - "abc": [abc] −3.5 TIES [ab,c] −3.5 → strict-improvement rule
    *    keeps the longest-piece candidate scanned first;
    *  - "aab": best path [a,ab] −4.0 beats [a,a,b] −8.0;
    *  - "bcde": [bc,de] −2.7 beats [b,c,de] −5.7;
    *  - "xb"/"😀b": unknown leading symbol at −10, known tail.
    */
  private val t28Pieces: Seq[(String, Double)] = Seq(
    "ab" -> -1.0, "b" -> -2.0, "a" -> -3.0, "abc" -> -3.5,
    "c" -> -2.5, "bc" -> -1.5, "de" -> -1.2, "d" -> -4.0, "e" -> -4.0)
  private val t28TokenizerPath = "/tmp/graft_gate_t28_tokenizer.json"
  private val t28WordsDir = "/tmp/graft_gate_t28_words"

  private def writeT28Fixture(s: SparkSession): Unit = {
    import s.implicits._
    graft.ops.VocabTokenizer.saveUnigramJson(s, t28Pieces, t28TokenizerPath)
    val rows: Seq[(Long, String, String, Long, Long)] = Seq(
      (0L, "ab", "ab", 1L, 0L),
      (1L, "abc", "abc", 1L, 0L), // tie −3.5 → longest piece wins
      (2L, "abde", "ab de", 2L, 0L),
      (3L, "xb", "x b", 2L, 1L), // unk fallback + known tail
      (4L, "ab abc", "ab abc", 2L, 0L), // words segment independently
      (5L, "😀b", "😀 b", 2L, 1L), // emoji = 1 symbol
      (6L, "bcde", "bc de", 2L, 0L), // optimal split beats char path
      (7L, "aab", "a ab", 2L, 0L)) // DP finds the non-obvious prefix
    s.createDataset(rows)
      .toDF("word_id", "text", "exp_tokens", "exp_n", "exp_unk")
      .coalesce(1).write.mode("overwrite").parquet(t28WordsDir)
  }

  /** t29 fixture: unigram TRAINING (Viterbi-EM) over the corpus
    * {"abab"×2, "ab"×3}, maxPieceLen 2, vocabSize 4, 2 EM rounds —
    * every number traced on paper:
    *
    * Seed counts (freq-weighted substring multiplicity): "abab"
    * contributes a×2, b×2, ab×2, ba×1 each ×2; "ab" contributes a, b,
    * ab each ×3 → a:7, b:7, ab:7, ba:2 (total 23). Initial scores
    * ln(c/23): a=b=ab≈−1.1896, ba≈−2.4423.
    *
    * E1 (Viterbi): "abab" → [ab,ab] (−2.379 beats any path through
    * ba at −2.442-per-piece or singles), "ab" → [ab]. Used counts:
    * ab = 2·2+3 = 7; a, b, ba = 0.
    * Prune: ba (unused multi) dropped; a, b are single code points →
    * kept at 0. |v|=3 ≤ 4 → no shrink.
    * M (floor 0.5): total = 7+0.5+0.5 = 8 → ab = ln(7/8) = −0.1335,
    * a = b = ln(0.5/8) = ln(1/16) = −2.7726.
    *
    * E2: same segmentations (ab dominates harder), same counts → the
    * model is at its fixed point. Final order by (count desc, piece
    * asc): ab(7), a(0), b(0).
    */
  private val t29ModelDir = "/tmp/graft_gate_t29_model"

  private def writeT29Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, String, Double)] = Seq(
      (0L, "ab", -0.1335), // ln(7/8)
      (1L, "a", -2.7726), // ln(1/16)
      (2L, "b", -2.7726))
    s.createDataset(rows).toDF("rank", "exp_piece", "exp_score")
      .coalesce(1).write.mode("overwrite").parquet(t29ModelDir)
  }

  private def writeT22Fixture(s: SparkSession): Unit = {
    import s.implicits._
    // current-form merges: [a, b] pair arrays (the string form is
    // spec-pinned in BpeTokenizerSpec)
    val vocabJson = t22Vocab.zipWithIndex
      .map { case (t, i) => s""""$t": $i""" }.mkString(", ")
    val mergesJson = t22Merges
      .map { case (a, b) => s"""["$a", "$b"]""" }.mkString(", ")
    java.nio.file.Files.write(java.nio.file.Paths.get(t22TokenizerPath),
      s"""{"model": {"type": "BPE", "vocab": {$vocabJson}, "merges": [$mergesJson]}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // (word_id, text, expected tokens space-joined, expected counts) —
    // every expectation traced by hand through the rank table above.
    val rows: Seq[(Long, String, String, Long, Long)] = Seq(
      (0L, "low", "low", 1L, 0L),
      (1L, "lower", "low er", 2L, 0L), // (l,o) r2 before (e,r) r10
      (2L, "newest", "newest", 1L, 0L),
      (3L, "widest", "widest", 1L, 0L),
      (4L, "lowest", "low est", 2L, 0L), // est fuses before lo reaches it
      (5L, "news", "new s", 2L, 0L),
      (6L, "ester", "est er", 2L, 0L), // (e,s) r0 wins over (e,r) r10
      (7L, "eses", "es es", 2L, 0L), // ALL occurrences fuse in one step
      (8L, "xyz", "x y z", 3L, 3L), // no merges, all unknown
      (9L, "lox", "lo x", 2L, 1L), // partial merge + unknown tail
      (10L, "widestnewest", "widest newest", 2L, 0L), // rank interleave
      (11L, "low lower lowest", "low low er low est", 5L, 0L),
      (12L, "l😀w", "l 😀 w", 3L, 1L)) // emoji = ONE code-point symbol
    s.createDataset(rows)
      .toDF("word_id", "text", "exp_tokens", "exp_n", "exp_unk")
      .coalesce(1).write.mode("overwrite").parquet(t22WordsDir)
  }

  /** t23 fixture: BYTE-LEVEL merge-rank BPE (the GPT-2 path —
    * pre-tokenization regex, UTF-8-byte symbol mapping, then the same
    * merge loop as t22). Vocab and merges live in the MAPPED byte
    * space (`Ġ` = space, `Ċ` = newline) and round-trip through
    * tokenizer.json exactly as a HuggingFace byte-level file does.
    * Expectations hand-derived in VocabTokenizerSpec's byte-level
    * suite and re-stated here; each row pins one published rule:
    * contraction split, last-space-attaches (`\s+(?!\S)`), multibyte
    * UTF-8 expansion, newline remap, merge-rank priority.
    */
  private val t23Merges: Seq[(String, String)] = Seq(
    ("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o"),
    ("Ġ", "w"), ("Ġw", "o"), ("l", "o"), ("o", "w"))
  private val t23Vocab: Seq[String] =
    Seq("h", "e", "l", "o", "w", "r", "d", "n", "'", "s", "t",
      "1", "2", "!", "c", "a", "f", "b", "x", "y", "Ġ", "Ċ",
      "he", "hel", "hell", "hello", "Ġw", "Ġwo", "lo", "ow")
  private val t23TokenizerPath = "/tmp/graft_gate_t23_tokenizer.json"
  private val t23WordsDir = "/tmp/graft_gate_t23_words"

  private def writeT23Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val vocabJson = t23Vocab.zipWithIndex
      .map { case (t, i) => s""""$t": $i""" }.mkString(", ")
    val mergesJson = t23Merges
      .map { case (a, b) => s"""["$a", "$b"]""" }.mkString(", ")
    java.nio.file.Files.write(java.nio.file.Paths.get(t23TokenizerPath),
      s"""{"model": {"type": "BPE", "vocab": {$vocabJson}, "merges": [$mergesJson]}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val rows: Seq[(Long, String, String, Long, Long)] = Seq(
      (0L, "hello", "hello", 1L, 0L),
      (1L, "hello world", "hello Ġwo r l d", 5L, 0L),
      (2L, "don't", "d o n ' t", 5L, 0L), // contraction pre-split
      (3L, "low", "lo w", 2L, 0L), // (l,o) r6 beats (o,w) r7
      (4L, "a  b", "a Ġ Ġ b", 4L, 0L), // last space attaches
      (5L, "café", "c a f Ã ©", 5L, 2L), // é = C3 A9, both unk
      (6L, "12!", "1 2 !", 3L, 0L), // number/punct pre-split
      (7L, "x\ny", "x Ċ y", 3L, 0L)) // newline byte remap
    s.createDataset(rows)
      .toDF("word_id", "text", "exp_tokens", "exp_n", "exp_unk")
      .coalesce(1).write.mode("overwrite").parquet(t23WordsDir)
  }

  private val t25ExpectedDir = "/tmp/graft_gate_t25_expected"

  /** t25 expectations, hand-derived by running the published training
    * algorithm on paper over {low×5, lower×2, newest×6, widest×3}:
    * initial pair weights put (e,s) and (s,t) at 9 — the lexicographic
    * tie-break picks (e,s); after it, (es,t)=9; then (l,o)/(o,w) tie
    * at 7 → (l,o), then (lo,w)=7; the 6-weight tier ties
    * (e,w)/(n,e)/(w,est) → (e,w), then (ew,est)=6, (n,ewest)=6;
    * finally the 3-tier ties (d,est)/(i,d)/(w,i) → (d,est).
    */
  /** t37 vocabulary. Coverage plan over the corpus' 31 words:
    * fully-segmenting (e.g. "customer"→cus ##tomer, "stream"→str
    * ##eam — both with a shorter prefix planted so longest-match is
    * what's certified), whole-word entries that outrank their own
    * prefixes ("scan", "sort" vs "s"), unmatchable-from-the-start
    * words (batch/big/hash/join/part → [UNK]), and the
    * partial-then-fail case ("filter": "fil" then no "##ter").
    */
  private[queries] val t37Vocab: Seq[String] = Seq(
    "a", "co", "cus", "da", "du", "f", "fil", "gr", "key", "li", "m",
    "or", "que", "ro", "s", "scan", "sort", "str", "tab", "the", "val",
    "ve", "win",
    "##gg", "##lumn", "##tomer", "##tom", "##er", "##ta", "##p",
    "##ast", "##oup", "##ne", "##ge", "##der", "##ry", "##w", "##low",
    "##mall", "##park", "##eam", "##le", "##ue", "##ctor", "##dow")

  /** t40 vocabulary: 13 of the corpus' 31 words — the rest are OOV, so
    * every source shows a real mixed rate.
    */
  private[queries] val t40Vocab: Seq[String] = Seq(
    "scan", "table", "value", "row", "the", "a", "join", "hash",
    "data", "key", "line", "merge", "sort")

  private val t38ExpectedDir = "/tmp/graft_gate_t38_expected"

  /** Hand-derivation of t38 (score = pair/(symA·symB), exact
    * rationals; ties → lexicographically smallest pair). Initial
    * symbolization: hug→h ##u ##g (×10), pug→p ##u ##g (×5),
    * pun→p ##u ##n (×12), bun→b ##u ##n (×4), hugs→h ##u ##g ##s (×5).
    *  1. (##g,##s) 5/(20·5)=1/20 beats the 1/36 field → ##gs
    *  2. all six pairs tie at 1/36 → smallest pair (##u,##g) → ##ug
    *  3. tie at 1/21: (##u,##gs) < (##u,##n) < (b,##u) → ##ugs
    *  4. (h,##ugs) 5/(15·5)=1/15 → hugs
    *  5. (h,##ug) 10/(10·15)=1/15 → hug
    *  6. tie at 1/16: (##u,##n) < (b,##u) → ##un
    *  7. (b,##un) 4/(4·16)=1/16 → bun
    *  8. tie at 1/17: (p,##ug) < (p,##un) → pug
    *  9. (p,##un) 12/(12·16) → pun
    * Vocab = sorted base symbols ++ merges in order.
    */
  private def writeT38Fixture(s: SparkSession): Unit = {
    import s.implicits._
    (Seq("##g", "##n", "##s", "##u", "b", "h", "p") ++
      Seq("##gs", "##ug", "##ugs", "hugs", "hug", "##un", "bun",
        "pug", "pun"))
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("idx", "piece")
      .coalesce(1).write.mode("overwrite").parquet(t38ExpectedDir)
    ()
  }

  private def writeT25Fixture(s: SparkSession): Unit = {
    import s.implicits._
    Seq(
      (0L, "e", "s"), (1L, "es", "t"), (2L, "l", "o"), (3L, "lo", "w"),
      (4L, "e", "w"), (5L, "ew", "est"), (6L, "n", "ewest"),
      (7L, "d", "est"))
      .toDF("rank", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(t25ExpectedDir)
    ()
  }

  /** t13 fixture markup, synthesized from the documents table with the
    * SAME string algebra on both engines (Spark `concat` ≡ DuckDB `||`,
    * both NULL-propagating). Exercises: style containing '>', script
    * with comparison operators, comments, a double-encoded `&amp;lt;`,
    * a high-link-density nav line, a low-density anchor-in-prose line,
    * and (every 7th doc) an unclosed trailing tag.
    */
  /** t19 markdown synth: one document exercising every cascade rule —
    * ATX header + entity, inline/image/reference links, nested quote,
    * bullet/numbered lists, a pipe table with separator row, an hr, a
    * fenced code block whose CODE must survive, emphasis family,
    * inline HTML (doc_id%7 adds an unclosed tag), a setext underline,
    * and the real document text. Mirrored char-for-char by t19MdSql.
    */
  private def t19Md: org.apache.spark.sql.Column = concat(
    lit("# Title &amp; "), col("lang"), lit("\n"),
    lit("intro [go home](http://h/"), col("doc_id").cast("string"),
    lit(") and ![pic alt](http://img/x.png) here\n"),
    lit("> quoted > nested\n"),
    lit("- item one\n"),
    lit("* item *two* **strong** `code span`\n"),
    lit("12. numbered\n"),
    lit("| a | b |\n"),
    lit("|---|---|\n"),
    lit("| 1 | 2 |\n"),
    lit("---\n"),
    lit("```scala\nval x = 1 < 2 && y > 0\n```\n"),
    col("text"), lit("\n"),
    lit("see [the ref][r1] too\n"),
    lit("[r1]: http://ref/url\n"),
    lit("tail ~~struck~~ __under__ snake_case 5 &lt; 6 &amp; 7\n"),
    when(col("doc_id") % 7 === 0,
      lit("<span>html inline</span> <b>bold\n")).otherwise(lit("")),
    lit("===\n"),
    lit("The End"))

  private val t19MdSql: String =
    "'# Title &amp; ' || lang || chr(10) || " +
      "'intro [go home](http://h/' || doc_id || ') and ![pic alt](http://img/x.png) here' || chr(10) || " +
      "'> quoted > nested' || chr(10) || " +
      "'- item one' || chr(10) || " +
      "'* item *two* **strong** `code span`' || chr(10) || " +
      "'12. numbered' || chr(10) || " +
      "'| a | b |' || chr(10) || " +
      "'|---|---|' || chr(10) || " +
      "'| 1 | 2 |' || chr(10) || " +
      "'---' || chr(10) || " +
      "'```scala' || chr(10) || 'val x = 1 < 2 && y > 0' || chr(10) || '```' || chr(10) || " +
      "text || chr(10) || " +
      "'see [the ref][r1] too' || chr(10) || " +
      "'[r1]: http://ref/url' || chr(10) || " +
      "'tail ~~struck~~ __under__ snake_case 5 &lt; 6 &amp; 7' || chr(10) || " +
      "CASE WHEN doc_id % 7 = 0 THEN '<span>html inline</span> <b>bold' || chr(10) ELSE '' END || " +
      "'===' || chr(10) || " +
      "'The End'"

  /** DuckDB mirror of [[TextAnalysis.markdownToText]] — the same step
    * order generated as SQL so the engines cannot drift silently.
    */
  private def duckMarkdownToText(e: String): String = {
    def rg(inner: String, pat: String, rep: String): String =
      s"regexp_replace($inner, '$pat', $rep, 'g')"
    val noFence = rg(s"coalesce($e, '')",
      "(\\A|\\n)((```|~~~)[^\\n]*(\\n|\\z))+", "'\\1'")
    val noComment = rg(noFence, "(?s)<!--.*?-->", "' '")
    val noTag = rg(noComment, "</?[A-Za-z][^>\\n]*>", "' '")
    val noTableSep = rg(noTag,
      "(\\A|\\n)[ \\t]*(\\|[ \\t:|-]*-[ \\t:|-]*|-[ \\t:|-]*\\|[ \\t:|-]*)(\\n|\\z)",
      "chr(10)")
    val noHr = rg(noTableSep,
      "(\\A|\\n)[ \\t]*[-*_=]{3,}[ \\t]*(\\n[ \\t]*[-*_=]{3,}[ \\t]*)*(\\n|\\z)",
      "chr(10)")
    val noRefDef = rg(noHr,
      "(\\A|\\n)([ \\t]*\\[[^\\]\\n]+\\]:[^\\n]*(\\n|\\z))+", "'\\1'")
    val noImg = rg(noRefDef, "!\\[([^\\]]*)\\]\\(([^)\\n]*)\\)", "'\\1'")
    val noLink = rg(noImg, "\\[([^\\]]*)\\]\\(([^)\\n]*)\\)", "'\\1'")
    val noRefLink = rg(noLink, "\\[([^\\]]*)\\]\\[[^\\]\\n]*\\]", "'\\1'")
    val noHeader = rg(noRefLink, "(\\A|\\n)[ \\t]*#{1,6}[ \\t]+", "chr(10)")
    val noQuote = rg(noHeader, "(\\A|\\n)[ \\t]*(>[ \\t]?)+", "chr(10)")
    val noList = rg(noQuote,
      "(\\A|\\n)[ \\t]*([-*+]|[0-9]{1,3}[.)])[ \\t]+", "chr(10)")
    val noEmph = s"replace(replace(replace(${rg(noList, "\\*{1,3}", "''")}, " +
      "'~~', ''), '__', ''), '`', '')"
    val noPipe = s"replace($noEmph, '|', ' ')"
    duckCleanup(duckDecode(noPipe))
  }

  private def t13Html: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast("string"), lit("</title>"),
    lit("<style>p{margin:0} .x>y{color:red}</style>"),
    lit("<script>if(a<b&&c>d){e();}</script></head><body>"),
    lit("<!-- id "), col("doc_id").cast("string"), lit(" -->"),
    lit("<h1>Title &amp; "), col("lang"), lit("</h1>"),
    lit("<p>"), col("text"), lit("</p>"),
    lit("<p>5 &lt; 6 &amp;&amp; 7 &gt; 4 &quot;q&quot; &#39;s&#39;&nbsp;end &amp;lt;tag&amp;gt;</p>"),
    lit("<div><a href=\"/home\">Home</a> | <a href=\"/about\">About</a> | <a href=\"/contact\">Contact</a></div>"),
    lit("<div><a href=\"/ref\">ref</a> surrounded by a good deal of ordinary prose text</div>"),
    when(col("doc_id") % 7 === 0, lit("<p>trailing <b unclosed")).otherwise(lit("")),
    lit("</body></html>"))

  private val duckHtml: String =
    "'<html><head><title>Doc ' || doc_id || '</title>' || " +
      "'<style>p{margin:0} .x>y{color:red}</style>' || " +
      "'<script>if(a<b&&c>d){e();}</script></head><body>' || " +
      "'<!-- id ' || doc_id || ' -->' || " +
      "'<h1>Title &amp; ' || lang || '</h1>' || " +
      "'<p>' || text || '</p>' || " +
      "'<p>5 &lt; 6 &amp;&amp; 7 &gt; 4 &quot;q&quot; &#39;s&#39;&nbsp;end &amp;lt;tag&amp;gt;</p>' || " +
      "'<div><a href=\"/home\">Home</a> | <a href=\"/about\">About</a> | <a href=\"/contact\">Contact</a></div>' || " +
      "'<div><a href=\"/ref\">ref</a> surrounded by a good deal of ordinary prose text</div>' || " +
      "CASE WHEN doc_id % 7 = 0 THEN '<p>trailing <b unclosed' ELSE '' END || " +
      "'</body></html>'"

  // DuckDB mirrors of the TextAnalysis html cascade — generated as SQL
  // text from the same step order so the two engines cannot drift
  // silently (any divergence fails the t13 hash compare).
  private[queries] def duckBlockLined(e: String): String =
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"coalesce($e, ''), " +
      "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
      "'(?s)<!--.*?-->', ' ', 'g'), " +
      "'(?i)<(br|hr)[^>]*>|</(p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|title|blockquote)[^>]*>', chr(10), 'g')"

  private[queries] def duckDecode(e: String): String =
    s"replace(replace(replace(replace(replace(replace($e, " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&')"

  private[queries] def duckCleanup(e: String): String =
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"$e, " +
      "'[ \\t\\f\\r]+', ' ', 'g'), " +
      "' ?\\n ?', chr(10), 'g'), " +
      "'\\n{3,}', chr(10) || chr(10), 'g'), " +
      "'\\A[\\n ]+|[\\n ]+\\z', '', 'g')"

  private[queries] def duckHtmlToText(e: String): String =
    duckCleanup(duckDecode(
      s"regexp_replace(${duckBlockLined(e)}, '<[^>]*>', ' ', 'g')"))

  private def duckStripBp(e: String, threshold: String = "0.5"): String = {
    val lines = s"string_split(${duckBlockLined(e)}, chr(10))"
    val vis = "trim(regexp_replace(regexp_replace(l, '<[^>]*>', ' ', 'g'), " +
      "'[ \\t\\f\\r]+', ' ', 'g'))"
    val analyzed = s"list_transform($lines, l -> struct_pack(" +
      s"vis := $vis, " +
      s"n := length(replace($vis, ' ', '')), " +
      // coalesce: DuckDB's regexp_extract_all/array_to_string chain
      // yields NULL (not '') when a line has no anchors — Spark's
      // array_join gives '' there
      "a := coalesce(length(regexp_replace(regexp_replace(" +
      "array_to_string(regexp_extract_all(l, '(?is)<a[^>]*>(.*?)</a>', 1), ''), " +
      "'<[^>]*>', '', 'g'), '[ \\t\\f\\r ]+', '', 'g')), 0)))"
    val kept = s"list_filter($analyzed, s -> s.n > 0 AND s.a <= s.n * $threshold)"
    duckCleanup(duckDecode(
      s"array_to_string(list_transform($kept, s -> s.vis), chr(10))"))
  }

  /** Marker-hit count SQL over `colName` — the t1/t2 langid/quality
    * mirror, shared with the pipe1 composed oracle (CurationQueries).
    */
  private[queries] def sqlHits(markers: Seq[String],
                               colName: String = "text") =
    markers.map(m => s"'$m'").mkString(
      s"len(list_filter(string_split($colName,' '), x -> x IN (", ",", ")))")

  def oracle: Map[String, String] = Map(
    // Hand-derived by running the published tiktoken byte-pair-merge
    // on paper (derivation in the gate comment).
    "t56_tiktoken_ids" ->
      """SELECT * FROM (VALUES
        |  (1::BIGINT, 3::BIGINT, '7,3,11'),
        |  (2::BIGINT, 1::BIGINT, '7'),
        |  (3::BIGINT, 2::BIGINT, '6,-1'))
        |  t(doc_id, n_tokens, ids)
        |ORDER BY doc_id""".stripMargin,
    // Full from-scratch replay of every t26 signal: own line/para
    // split + duplicate grouping, own n-gram extraction (chr(1)
    // joins), max-count-then-max-length argmax, position-union
    // coverage. Fragments generated by GopherSql so c21 reuses the
    // identical formulations.
    "t26_gopher_repetition" -> {
      val lined =
        "substr(text, 1, 80) || chr(10) || substr(text, 1, 40) || " +
          "chr(10) || chr(10) || substr(text, 41, 40) || chr(10) || " +
          "substr(text, 1, 40)"
      raw"""WITH base AS (
         |  SELECT doc_id, $lined AS t
         |  FROM documents WHERE doc_id % 7 = 0),
         |toks AS (
         |  SELECT doc_id, regexp_extract_all(t, '[^ \t\n\f\r]+') AS tk
         |  FROM base),
         |tot AS (
         |  SELECT doc_id,
         |    coalesce(list_sum(list_transform(tk, x -> len(x))), 0)::DOUBLE
         |      AS tc
         |  FROM toks),
         |${GopherSql.unitDupCtes("l", "string_split(t, chr(10))")},
         |${GopherSql.unitDupCtes("p", "regexp_split_to_array(t, '\n{2,}')")},
         |${GopherSql.topGramCtes(2)},
         |${GopherSql.topGramCtes(3)},
         |${GopherSql.topGramCtes(4)},
         |${GopherSql.dupGramCtes(5)},
         |${GopherSql.dupGramCtes(8)},
         |${GopherSql.dupGramCtes(10)}
         |SELECT b.doc_id,
         |  round(coalesce(ls.f, 0), 4) AS dup_line_frac,
         |  round(coalesce(ls.cf, 0), 4) AS dup_line_char_frac,
         |  round(coalesce(ps.f, 0), 4) AS dup_para_frac,
         |  round(coalesce(ps.cf, 0), 4) AS dup_para_char_frac,
         |  ${GopherSql.charFrac("coalesce(t2.num, 0)", 4)} AS top_2gram,
         |  ${GopherSql.charFrac("coalesce(t3.num, 0)", 4)} AS top_3gram,
         |  ${GopherSql.charFrac("coalesce(t4.num, 0)", 4)} AS top_4gram,
         |  ${GopherSql.charFrac("coalesce(d5.cc, 0)", 4)} AS dup_5gram,
         |  ${GopherSql.charFrac("coalesce(d8.cc, 0)", 4)} AS dup_8gram,
         |  ${GopherSql.charFrac("coalesce(d10.cc, 0)", 4)} AS dup_10gram
         |FROM base b
         |JOIN tot tt USING (doc_id)
         |LEFT JOIN lstat ls USING (doc_id)
         |LEFT JOIN pstat ps USING (doc_id)
         |LEFT JOIN top2 t2 USING (doc_id)
         |LEFT JOIN top3 t3 USING (doc_id)
         |LEFT JOIN top4 t4 USING (doc_id)
         |LEFT JOIN dup5 d5 USING (doc_id)
         |LEFT JOIN dup8 d8 USING (doc_id)
         |LEFT JOIN dup10 d10 USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin
    },
    // Same operation order and literals as TextAnalysis.bm25:
    // idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf·(k1+1) over the
    // b-mixed length normalizer, terms summed left to right.
    "t27_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL THEN []::VARCHAR[]
        |         ELSE regexp_extract_all(text, '[^ \t\n\f\r]+') END AS tk
        |  FROM documents),
        |st AS (
        |  SELECT count(*)::DOUBLE AS n, sum(len(tk))::DOUBLE AS tt,
        |    sum(CASE WHEN list_contains(tk, 'table') THEN 1 ELSE 0 END)::DOUBLE AS df0,
        |    sum(CASE WHEN list_contains(tk, 'scan') THEN 1 ELSE 0 END)::DOUBLE AS df1,
        |    sum(CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df2
        |  FROM toks),
        |sc AS (
        |  SELECT t.doc_id, len(t.tk)::BIGINT AS n_tok,
        |    ln(1.0 + (st.n - st.df0 + 0.5) / (st.df0 + 0.5)) *
        |      (len(list_filter(t.tk, x -> x = 'table'))::DOUBLE * 2.2) /
        |      (len(list_filter(t.tk, x -> x = 'table'))::DOUBLE +
        |       1.2 * (0.25 + 0.75 * len(t.tk)::DOUBLE / (st.tt / st.n))) +
        |    ln(1.0 + (st.n - st.df1 + 0.5) / (st.df1 + 0.5)) *
        |      (len(list_filter(t.tk, x -> x = 'scan'))::DOUBLE * 2.2) /
        |      (len(list_filter(t.tk, x -> x = 'scan'))::DOUBLE +
        |       1.2 * (0.25 + 0.75 * len(t.tk)::DOUBLE / (st.tt / st.n))) +
        |    ln(1.0 + (st.n - st.df2 + 0.5) / (st.df2 + 0.5)) *
        |      (len(list_filter(t.tk, x -> x = 'hash'))::DOUBLE * 2.2) /
        |      (len(list_filter(t.tk, x -> x = 'hash'))::DOUBLE +
        |       1.2 * (0.25 + 0.75 * len(t.tk)::DOUBLE / (st.tt / st.n)))
        |      AS score
        |  FROM toks t CROSS JOIN st)
        |SELECT doc_id, n_tok, round(score, 4) AS bm25
        |FROM sc WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin,
    // Stored expectation: every verdict hand-derived from the
    // published decision tree at the fixture (writeT34Fixture).
    "t34_block_extract" ->
      s"""SELECT case_id, exp_text AS main_text
         |FROM read_parquet('$t34Dir/*.parquet')
         |ORDER BY case_id""".stripMargin,
    // Stored expectation: every repair hand-computed byte-by-byte at
    // the fixture (writeT41Fixture) — m14/t34 pattern.
    "t41_mojibake" ->
      s"""SELECT doc_id, exp_fixed AS fixed, exp_changed AS changed
         |FROM read_parquet('$t41Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // The t35 from-scratch KN3 derivation, emitted for BOTH ppl
    // columns: if the export→reload→Katz-score loop drifts from the
    // in-engine model on ANY document, the arpa column diverges from
    // the oracle's truth and the gate fails.
    "t48_arpa_roundtrip" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS t
        |  FROM documents
        |), g3 AS (
        |  SELECT doc_id, t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2,
        |         t[i+2]::VARCHAR AS w3
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
        |), dg AS (
        |  SELECT doc_id, w1, w2, w3, count(*) AS k FROM g3 GROUP BY 1, 2, 3, 4
        |), tc AS (
        |  SELECT w1, w2, w3, sum(k) AS ctg FROM dg GROUP BY 1, 2, 3
        |), c12 AS (
        |  SELECT w1, w2, sum(ctg) AS cw12, count(*) AS n1p_after12
        |  FROM tc GROUP BY 1, 2
        |), cont2 AS (
        |  SELECT w2, w3, count(*) AS n1p_mid FROM tc GROUP BY 1, 2
        |), c2 AS (
        |  SELECT w2, sum(n1p_mid) AS cw2cont, count(*) AS n2typ_after
        |  FROM cont2 GROUP BY 1
        |), g2 AS (
        |  SELECT t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2
        |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
        |), bc AS (
        |  SELECT w1, w2 FROM g2 GROUP BY 1, 2
        |), cu AS (
        |  SELECT w2 AS w3, count(*) AS n1p_before FROM bc GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS b FROM bc
        |), scored AS (
        |  SELECT dg.doc_id, sum(k)::BIGINT AS n_trigrams,
        |    sum(k * ln(
        |      (greatest(tc.ctg::DOUBLE - 0.75, 0.0) +
        |       0.75 * c12.n1p_after12 *
        |         ((greatest(cont2.n1p_mid::DOUBLE - 0.75, 0.0) +
        |           0.75 * c2.n2typ_after *
        |             (cu.n1p_before::DOUBLE / tot.b)) / c2.cw2cont))
        |      / c12.cw12)) / sum(k) AS kn3_logprob
        |  FROM dg JOIN tc USING (w1, w2, w3) JOIN c12 USING (w1, w2)
        |    JOIN cont2 USING (w2, w3) JOIN c2 USING (w2)
        |    JOIN cu USING (w3) CROSS JOIN tot
        |  GROUP BY 1
        |)
        |SELECT d.lang, count(*) AS n_docs,
        |  sum(s.n_trigrams)::BIGINT AS total_trigrams,
        |  round(avg(exp(-s.kn3_logprob)), 4) AS avg_ppl_engine,
        |  round(avg(exp(-s.kn3_logprob)), 4) AS avg_ppl_arpa
        |FROM scored s JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The oracle re-parses the ARPA file itself and replays the Katz
    // lookup with its own joins — nothing is taken from the engine.
    "t47_arpa_score" ->
      s"""WITH raw AS (
         |  SELECT * FROM read_csv('$t47Arpa', delim='\\t', header=false,
         |    all_varchar=true, null_padding=true, names=['c0','c1','c2'])
         |), g AS (
         |  SELECT try_cast(c0 AS DOUBLE) AS lp, try_cast(c2 AS DOUBLE) AS bo,
         |         string_split(c1, ' ') AS ws
         |  FROM raw
         |  WHERE try_cast(c0 AS DOUBLE) IS NOT NULL AND c1 IS NOT NULL
         |), uni AS (SELECT ws[1] AS w, lp, bo FROM g WHERE len(ws) = 1),
         |bi AS (SELECT ws[1] AS w1, ws[2] AS w2, lp, bo FROM g WHERE len(ws) = 2),
         |tri AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, lp
         |        FROM g WHERE len(ws) = 3),
         |unk AS (SELECT min(lp) AS lpunk FROM uni WHERE w = '<unk>'),
         |docs AS (
         |  SELECT doc_id, regexp_extract_all(text, '[^ \\t\\n\\f\\r]+') AS toks
         |  FROM read_parquet('$t47Docs/*.parquet') WHERE text IS NOT NULL
         |), tg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
         |         count(*)::BIGINT AS k
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
         |        FROM docs WHERE len(toks) >= 3)
         |  GROUP BY 1, 2, 3, 4
         |), scored AS (
         |  SELECT tg.doc_id, tg.k,
         |    CASE WHEN t.lp IS NOT NULL THEN t.lp
         |         ELSE coalesce(b12.bo, 0.0) +
         |           CASE WHEN b23.lp IS NOT NULL THEN b23.lp
         |                ELSE coalesce(u2.bo, 0.0) +
         |                  CASE WHEN u3.lp IS NOT NULL THEN u3.lp
         |                       ELSE coalesce((SELECT lpunk FROM unk), -99.0)
         |                  END
         |           END
         |    END AS lp
         |  FROM tg
         |  LEFT JOIN tri t  ON tg.w1 = t.w1 AND tg.w2 = t.w2 AND tg.w3 = t.w3
         |  LEFT JOIN bi b23 ON tg.w2 = b23.w1 AND tg.w3 = b23.w2
         |  LEFT JOIN bi b12 ON tg.w1 = b12.w1 AND tg.w2 = b12.w2
         |  LEFT JOIN uni u3 ON tg.w3 = u3.w
         |  LEFT JOIN uni u2 ON tg.w2 = u2.w
         |)
         |SELECT doc_id, sum(k)::BIGINT AS n_trigrams,
         |  round(sum(k * lp) / sum(k), 4) AS arpa_logprob,
         |  round(pow(10.0, -(sum(k * lp) / sum(k))), 4) AS arpa_ppl
         |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // Full re-derivation from the dumps: mean vector from the row
    // multiset, logits from the output matrix, shifted softmax, top-1
    // with the label-ascending tie-break.
    "t49_fasttext" ->
      s"""WITH rows AS (
         |  SELECT * FROM read_parquet('$t49RowsDir/*.parquet')
         |), inp AS (
         |  SELECT * FROM read_parquet('$t49InputDir/*.parquet')
         |), outp AS (
         |  SELECT * FROM read_parquet('$t49OutputDir/*.parquet')
         |), tot AS (
         |  SELECT doc_id, sum(cnt) AS n FROM rows GROUP BY 1
         |), hid AS (
         |  SELECT r.doc_id, i.d, sum(r.cnt * i.w) AS s
         |  FROM rows r JOIN inp i USING (row_idx) GROUP BY 1, 2
         |), logit AS (
         |  SELECT h.doc_id, o.label, sum((h.s / t.n) * o.w) AS z
         |  FROM hid h JOIN tot t USING (doc_id) JOIN outp o USING (d)
         |  GROUP BY 1, 2
         |), sm AS (
         |  SELECT doc_id, label,
         |    exp(z - max(z) OVER (PARTITION BY doc_id)) AS e
         |  FROM logit
         |), pr AS (
         |  SELECT doc_id, label,
         |    e / sum(e) OVER (PARTITION BY doc_id) AS p
         |  FROM sm
         |), top AS (
         |  SELECT doc_id, label, p, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY p DESC, label) AS rn
         |  FROM pr
         |)
         |SELECT doc_id, label, round(p, 4) AS prob
         |FROM top WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // The oracle replays the 5-level Katz lookup FROM THE EXPORTED
    // FILE (t51's parse) and emits it for BOTH columns: either engine
    // face drifting from the artifact fails the gate.
    "t53_kn5_roundtrip" ->
      s"""WITH raw AS (
         |  SELECT * FROM read_csv('$t53Arpa', delim='\\t', header=false,
         |    all_varchar=true, null_padding=true, names=['c0','c1','c2'])
         |), g AS (
         |  SELECT try_cast(c0 AS DOUBLE) AS lp, try_cast(c2 AS DOUBLE) AS bo,
         |         string_split(c1, ' ') AS ws
         |  FROM raw
         |  WHERE try_cast(c0 AS DOUBLE) IS NOT NULL AND c1 IS NOT NULL
         |), g1 AS (SELECT ws[1] AS w1, lp, bo FROM g WHERE len(ws) = 1),
         |g2 AS (SELECT ws[1] AS w1, ws[2] AS w2, lp, bo FROM g WHERE len(ws) = 2),
         |g3 AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, lp, bo
         |       FROM g WHERE len(ws) = 3),
         |g4 AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, ws[4] AS w4,
         |       lp, bo FROM g WHERE len(ws) = 4),
         |g5 AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, ws[4] AS w4,
         |       ws[5] AS w5, lp FROM g WHERE len(ws) = 5),
         |unk AS (SELECT min(lp) AS lpunk FROM g1 WHERE w1 = '<unk>'),
         |docs AS (
         |  SELECT doc_id, regexp_extract_all(text, '[^ \\t\\n\\f\\r]+') AS toks
         |  FROM documents WHERE doc_id % 17 = 0 AND text IS NOT NULL
         |), tg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
         |         toks[i+3] AS w4, toks[i+4] AS w5, count(*)::BIGINT AS k
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
         |        FROM docs WHERE len(toks) >= 5)
         |  GROUP BY 1, 2, 3, 4, 5, 6
         |), scored AS (
         |  SELECT tg.doc_id, tg.k,
         |    CASE WHEN l5.lp IS NOT NULL THEN l5.lp
         |      ELSE coalesce(b4.bo, 0.0) +
         |      CASE WHEN l4.lp IS NOT NULL THEN l4.lp
         |        ELSE coalesce(b3.bo, 0.0) +
         |        CASE WHEN l3.lp IS NOT NULL THEN l3.lp
         |          ELSE coalesce(b2.bo, 0.0) +
         |          CASE WHEN l2.lp IS NOT NULL THEN l2.lp
         |            ELSE coalesce(b1.bo, 0.0) +
         |              coalesce(l1.lp, (SELECT lpunk FROM unk), -99.0)
         |          END
         |        END
         |      END
         |    END AS lp
         |  FROM tg
         |  LEFT JOIN g5 l5 ON tg.w1 = l5.w1 AND tg.w2 = l5.w2
         |    AND tg.w3 = l5.w3 AND tg.w4 = l5.w4 AND tg.w5 = l5.w5
         |  LEFT JOIN g4 l4 ON tg.w2 = l4.w1 AND tg.w3 = l4.w2
         |    AND tg.w4 = l4.w3 AND tg.w5 = l4.w4
         |  LEFT JOIN g4 b4 ON tg.w1 = b4.w1 AND tg.w2 = b4.w2
         |    AND tg.w3 = b4.w3 AND tg.w4 = b4.w4
         |  LEFT JOIN g3 l3 ON tg.w3 = l3.w1 AND tg.w4 = l3.w2
         |    AND tg.w5 = l3.w3
         |  LEFT JOIN g3 b3 ON tg.w2 = b3.w1 AND tg.w3 = b3.w2
         |    AND tg.w4 = b3.w3
         |  LEFT JOIN g2 l2 ON tg.w4 = l2.w1 AND tg.w5 = l2.w2
         |  LEFT JOIN g2 b2 ON tg.w3 = b2.w1 AND tg.w4 = b2.w2
         |  LEFT JOIN g1 l1 ON tg.w5 = l1.w1
         |  LEFT JOIN g1 b1 ON tg.w4 = b1.w1
         |)
         |SELECT doc_id, sum(k)::BIGINT AS n_ngrams,
         |  round(pow(10.0, -(sum(k * lp) / sum(k))), 4) AS ppl_direct,
         |  round(pow(10.0, -(sum(k * lp) / sum(k))), 4) AS ppl_arpa
         |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // The same formula as t27, recomputed from raw text over the docs
    // that contain at least one query term, in the same rounded order.
    "t52_bm25_index" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL THEN []::VARCHAR[]
        |         ELSE regexp_extract_all(text, '[^ \t\n\f\r]+') END AS tk
        |  FROM documents),
        |st AS (
        |  SELECT count(*)::DOUBLE AS n, sum(len(tk))::DOUBLE AS tt,
        |    sum(CASE WHEN list_contains(tk, 'table') THEN 1 ELSE 0 END)::DOUBLE AS df0,
        |    sum(CASE WHEN list_contains(tk, 'scan') THEN 1 ELSE 0 END)::DOUBLE AS df1,
        |    sum(CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df2
        |  FROM toks),
        |sc AS (
        |  SELECT t.doc_id,
        |    ln(1.0 + (st.n - st.df0 + 0.5) / (st.df0 + 0.5)) *
        |      (len(list_filter(t.tk, x -> x = 'table'))::DOUBLE * 2.2) /
        |      (len(list_filter(t.tk, x -> x = 'table'))::DOUBLE +
        |       1.2 * (0.25 + 0.75 * len(t.tk)::DOUBLE / (st.tt / st.n))) +
        |    ln(1.0 + (st.n - st.df1 + 0.5) / (st.df1 + 0.5)) *
        |      (len(list_filter(t.tk, x -> x = 'scan'))::DOUBLE * 2.2) /
        |      (len(list_filter(t.tk, x -> x = 'scan'))::DOUBLE +
        |       1.2 * (0.25 + 0.75 * len(t.tk)::DOUBLE / (st.tt / st.n))) +
        |    ln(1.0 + (st.n - st.df2 + 0.5) / (st.df2 + 0.5)) *
        |      (len(list_filter(t.tk, x -> x = 'hash'))::DOUBLE * 2.2) /
        |      (len(list_filter(t.tk, x -> x = 'hash'))::DOUBLE +
        |       1.2 * (0.25 + 0.75 * len(t.tk)::DOUBLE / (st.tt / st.n)))
        |      AS score
        |  FROM toks t CROSS JOIN st
        |  WHERE list_contains(t.tk, 'table') OR list_contains(t.tk, 'scan')
        |     OR list_contains(t.tk, 'hash'))
        |SELECT doc_id, round(score, 4) AS bm25
        |FROM sc ORDER BY bm25 DESC, doc_id""".stripMargin,

    // The oracle re-parses the 5-gram ARPA file itself (order = word
    // count of the middle tab field) and replays the Katz lookup five
    // levels deep with its own LEFT JOIN chain.
    "t51_arpa5_score" ->
      s"""WITH raw AS (
         |  SELECT * FROM read_csv('$t51Arpa', delim='\\t', header=false,
         |    all_varchar=true, null_padding=true, names=['c0','c1','c2'])
         |), g AS (
         |  SELECT try_cast(c0 AS DOUBLE) AS lp, try_cast(c2 AS DOUBLE) AS bo,
         |         string_split(c1, ' ') AS ws
         |  FROM raw
         |  WHERE try_cast(c0 AS DOUBLE) IS NOT NULL AND c1 IS NOT NULL
         |), g1 AS (SELECT ws[1] AS w1, lp, bo FROM g WHERE len(ws) = 1),
         |g2 AS (SELECT ws[1] AS w1, ws[2] AS w2, lp, bo FROM g WHERE len(ws) = 2),
         |g3 AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, lp, bo
         |       FROM g WHERE len(ws) = 3),
         |g4 AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, ws[4] AS w4,
         |       lp, bo FROM g WHERE len(ws) = 4),
         |g5 AS (SELECT ws[1] AS w1, ws[2] AS w2, ws[3] AS w3, ws[4] AS w4,
         |       ws[5] AS w5, lp FROM g WHERE len(ws) = 5),
         |unk AS (SELECT min(lp) AS lpunk FROM g1 WHERE w1 = '<unk>'),
         |docs AS (
         |  SELECT doc_id, regexp_extract_all(text, '[^ \\t\\n\\f\\r]+') AS toks
         |  FROM read_parquet('$t51Docs/*.parquet') WHERE text IS NOT NULL
         |), tg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
         |         toks[i+3] AS w4, toks[i+4] AS w5, count(*)::BIGINT AS k
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
         |        FROM docs WHERE len(toks) >= 5)
         |  GROUP BY 1, 2, 3, 4, 5, 6
         |), scored AS (
         |  SELECT tg.doc_id, tg.k,
         |    CASE WHEN l5.lp IS NOT NULL THEN l5.lp
         |      ELSE coalesce(b4.bo, 0.0) +
         |      CASE WHEN l4.lp IS NOT NULL THEN l4.lp
         |        ELSE coalesce(b3.bo, 0.0) +
         |        CASE WHEN l3.lp IS NOT NULL THEN l3.lp
         |          ELSE coalesce(b2.bo, 0.0) +
         |          CASE WHEN l2.lp IS NOT NULL THEN l2.lp
         |            ELSE coalesce(b1.bo, 0.0) +
         |              coalesce(l1.lp, (SELECT lpunk FROM unk), -99.0)
         |          END
         |        END
         |      END
         |    END AS lp
         |  FROM tg
         |  LEFT JOIN g5 l5 ON tg.w1 = l5.w1 AND tg.w2 = l5.w2
         |    AND tg.w3 = l5.w3 AND tg.w4 = l5.w4 AND tg.w5 = l5.w5
         |  LEFT JOIN g4 l4 ON tg.w2 = l4.w1 AND tg.w3 = l4.w2
         |    AND tg.w4 = l4.w3 AND tg.w5 = l4.w4
         |  LEFT JOIN g4 b4 ON tg.w1 = b4.w1 AND tg.w2 = b4.w2
         |    AND tg.w3 = b4.w3 AND tg.w4 = b4.w4
         |  LEFT JOIN g3 l3 ON tg.w3 = l3.w1 AND tg.w4 = l3.w2
         |    AND tg.w5 = l3.w3
         |  LEFT JOIN g3 b3 ON tg.w2 = b3.w1 AND tg.w3 = b3.w2
         |    AND tg.w4 = b3.w3
         |  LEFT JOIN g2 l2 ON tg.w4 = l2.w1 AND tg.w5 = l2.w2
         |  LEFT JOIN g2 b2 ON tg.w3 = b2.w1 AND tg.w4 = b2.w2
         |  LEFT JOIN g1 l1 ON tg.w5 = l1.w1
         |  LEFT JOIN g1 b1 ON tg.w4 = b1.w1
         |)
         |SELECT doc_id, sum(k)::BIGINT AS n_ngrams,
         |  round(sum(k * lp) / sum(k), 4) AS arpa_logprob,
         |  round(pow(10.0, -(sum(k * lp) / sum(k))), 4) AS arpa_ppl
         |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Stored expectation: every segmentation traced on paper at the
    // fixture (t28/t34 pattern) — DP over string positions is not
    // ANSI-SQL-expressible.
    "t50_spm_roundtrip" ->
      s"""SELECT doc_id, toks, n_tokens, n_unk
         |FROM read_parquet('${t50Docs}_exp/*.parquet')
         |ORDER BY doc_id""".stripMargin,

    "t46_readability" ->
      s"""WITH src AS (
         |  SELECT doc_id, $duckT42Text AS t
         |  FROM documents WHERE doc_id % 7 = 0
         |), base AS (
         |  SELECT doc_id,
         |    len(list_filter(list_transform(
         |      string_split(${duckSentenceMark("t")}, chr(1)),
         |      x -> trim(x)), x -> x <> ''))::BIGINT AS n_sents,
         |    regexp_extract_all(t, '[^ \\t\\n\\f\\r]+') AS toks
         |  FROM src
         |), syl AS (
         |  SELECT doc_id, n_sents, len(toks)::BIGINT AS n_words,
         |    coalesce(list_sum(list_transform(
         |      list_transform(toks, w -> regexp_replace(w, '[^A-Za-z]', '', 'g')),
         |      w ->
         |      greatest(len(regexp_extract_all(w, '(?i)[aeiouy]+')) -
         |        CASE WHEN regexp_matches(w, '(?i)[bcdfghjkmnpqrstvwxz]e$$')
         |             THEN 1 ELSE 0 END,
         |        1))), 0)::BIGINT AS n_syllables
         |  FROM base
         |)
         |SELECT doc_id, n_sents, n_words, n_syllables,
         |  CASE WHEN n_words > 0 AND n_sents > 0 THEN
         |    round(206.835 - 1.015*(n_words::DOUBLE/n_sents)
         |          - 84.6*(n_syllables::DOUBLE/n_words), 4) END AS reading_ease,
         |  CASE WHEN n_words > 0 AND n_sents > 0 THEN
         |    round(0.39*(n_words::DOUBLE/n_sents)
         |          + 11.8*(n_syllables::DOUBLE/n_words) - 15.59, 4) END AS fk_grade
         |FROM syl ORDER BY doc_id""".stripMargin,
    // Independent re-derivation: one global row_number rank (oracle
    // scale), own regression sums, same 4-dp rounding.
    "t45_zipf_card" ->
      """WITH tc AS (
        |  SELECT tok AS t, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS tok
        |        FROM documents)
        |  GROUP BY 1
        |), ranked AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, t) AS r
        |  FROM tc WHERE n >= 2
        |), fit AS (
        |  SELECT count(*)::BIGINT AS m, sum(ln(r)) AS sx, sum(ln(n)) AS sy,
        |         sum(ln(r)*ln(n)) AS sxy, sum(ln(r)*ln(r)) AS sxx
        |  FROM ranked
        |)
        |SELECT (SELECT count(*) FROM tc)::BIGINT AS n_types,
        |  m AS n_fit_types,
        |  (SELECT sum(n) FROM tc)::BIGINT AS n_tokens,
        |  round((sxy - sx*sy/m)/(sxx - sx*sx/m), 4) AS zipf_slope,
        |  round(sy/m - ((sxy - sx*sy/m)/(sxx - sx*sx/m))*sx/m, 4)
        |    AS zipf_intercept
        |FROM fit""".stripMargin,
    // Stored expectation: every normalization hand-derived from the
    // UCD decomposition tables at the fixture — m14/t34/t41 pattern.
    "t43_nfkc" ->
      s"""SELECT case_id, exp_nfc AS nfc, exp_nfkc AS nfkc
         |FROM read_parquet('$t43Dir/*.parquet')
         |ORDER BY case_id""".stripMargin,
    // Greedy walk re-derived sentence-by-sentence: a recursive CTE
    // carries (chunk_idx, running token count) down each doc's
    // sentence list with the same flush rule as the kernel.
    "t44_sentence_chunks" ->
      s"""WITH RECURSIVE src AS (
         |  SELECT doc_id, $duckT42Text AS t
         |  FROM documents WHERE doc_id % 7 = 0
         |), arr AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(
         |      string_split(${duckSentenceMark("t")}, chr(1)),
         |      x -> trim(x)), x -> x <> '') AS l
         |  FROM src
         |), sentidx AS (
         |  SELECT doc_id, unnest(range(1, len(l) + 1)) AS i, l FROM arr
         |), sent AS (
         |  SELECT doc_id, i, l[i] AS s FROM sentidx
         |), toks AS (
         |  SELECT doc_id, i, s, len(regexp_extract_all(s, '\\S+')) AS n
         |  FROM sent
         |), walk AS (
         |  SELECT doc_id, i, s, n, 0 AS chunk_idx, n AS cur
         |  FROM toks WHERE i = 1
         |  UNION ALL
         |  SELECT t.doc_id, t.i, t.s, t.n,
         |    CASE WHEN w.cur + t.n > 24 THEN w.chunk_idx + 1
         |         ELSE w.chunk_idx END,
         |    CASE WHEN w.cur + t.n > 24 THEN t.n ELSE w.cur + t.n END
         |  FROM toks t JOIN walk w ON t.doc_id = w.doc_id AND t.i = w.i + 1
         |)
         |SELECT doc_id, chunk_idx::INT AS chunk_idx,
         |  string_agg(s, ' ' ORDER BY i) AS chunk_text,
         |  sum(n)::INT AS n_chunk_tokens
         |FROM walk GROUP BY doc_id, chunk_idx
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    // The boundary cascade below is GENERATED from the Spark step
    // table (duckSentenceMark) — same steps, same order, RE2 syntax.
    "t42_sentences" ->
      s"""WITH src AS (
         |  SELECT doc_id, $duckT42Text AS t
         |  FROM documents WHERE doc_id % 7 = 0
         |), arr AS (
         |  SELECT doc_id,
         |    list_filter(list_transform(
         |      string_split(${duckSentenceMark("t")}, chr(1)),
         |      x -> trim(x)), x -> x <> '') AS l
         |  FROM src
         |), ex AS (
         |  SELECT doc_id, unnest(range(1, len(l) + 1)) AS i, l FROM arr
         |)
         |SELECT doc_id, (i - 1)::INT AS sent_idx, l[i] AS sentence
         |FROM ex ORDER BY doc_id, sent_idx""".stripMargin,
    // Independent re-scoring: lowercase, explode codepoint trigram
    // positions, join the raw profile rows, sum weights per (doc,
    // lang), argmax with ties to the smallest code; docs with no
    // scoring trigram (or NULL/short text) fall out to 'unknown'.
    "t21_langid_ngram" ->
      s"""WITH docs AS (
         |  SELECT doc_id, lower(text) AS t
         |  FROM read_parquet('$t21Dir/docs/*.parquet')
         |), pos AS (
         |  SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i
         |  FROM docs WHERE t IS NOT NULL AND length(t) >= 3
         |), g AS (
         |  SELECT doc_id, substr(t, i, 3) AS g3 FROM pos
         |), sc AS (
         |  SELECT g.doc_id, p.lang, sum(p.w) AS score
         |  FROM g JOIN read_parquet('$t21Dir/profiles/*.parquet') p
         |    ON p.trigram = g.g3
         |  GROUP BY 1, 2
         |), best AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, lang) AS rn
         |  FROM sc WHERE score > 0
         |)
         |SELECT d.doc_id, coalesce(b.lang, 'unknown') AS lang
         |FROM read_parquet('$t21Dir/docs/*.parquet') d
         |LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
         |ORDER BY d.doc_id""".stripMargin,
    // Script-gated routing replayed from the dumped tables: dominant
    // script from the t24 character classes (raw text, first-max-wins
    // tie), candidate set from routing.parquet (script='unknown' →
    // every profiled language, the unrestricted fallback), then the
    // t21 trigram argmax restricted to the candidates; zero score →
    // the script's dumped default, else 'unknown'.
    "t36_langid_routed" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM read_parquet('$t36Dir/docs/*.parquet')
         |), c AS (
         |  SELECT doc_id,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^A-Za-z\\x{00C0}-\\x{00D6}\\x{00D8}-\\x{00F6}\\x{00F8}-\\x{024F}]',
         |      '', 'g')) AS latin,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{0400}-\\x{052F}]', '', 'g')) AS cyr,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{0370}-\\x{03FF}]', '', 'g')) AS grk,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{0600}-\\x{06FF}\\x{0750}-\\x{077F}]', '', 'g')) AS ara,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{0590}-\\x{05FF}]', '', 'g')) AS heb,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{0900}-\\x{097F}]', '', 'g')) AS dev,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{0E00}-\\x{0E7F}]', '', 'g')) AS tha,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{AC00}-\\x{D7AF}\\x{1100}-\\x{11FF}\\x{3130}-\\x{318F}]',
         |      '', 'g')) AS han_g,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}]', '', 'g')) AS kan,
         |    length(regexp_replace(coalesce(text, ''),
         |      '[^\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]', '', 'g')) AS han
         |  FROM docs
         |), d AS (
         |  SELECT doc_id,
         |    CASE WHEN greatest(latin, cyr, grk, ara, heb, dev, tha,
         |                       han_g, kan, han) < 1 THEN 'unknown'
         |         WHEN latin = greatest(latin, cyr, grk, ara, heb, dev,
         |                       tha, han_g, kan, han) THEN 'latin'
         |         WHEN cyr   = greatest(cyr, grk, ara, heb, dev, tha,
         |                       han_g, kan, han) THEN 'cyrillic'
         |         WHEN grk   = greatest(grk, ara, heb, dev, tha, han_g,
         |                       kan, han) THEN 'greek'
         |         WHEN ara   = greatest(ara, heb, dev, tha, han_g, kan,
         |                       han) THEN 'arabic'
         |         WHEN heb   = greatest(heb, dev, tha, han_g, kan, han)
         |           THEN 'hebrew'
         |         WHEN dev   = greatest(dev, tha, han_g, kan, han)
         |           THEN 'devanagari'
         |         WHEN tha   = greatest(tha, han_g, kan, han) THEN 'thai'
         |         WHEN han_g = greatest(han_g, kan, han) THEN 'hangul'
         |         WHEN kan   = greatest(kan, han) THEN 'kana'
         |         ELSE 'han' END AS script
         |  FROM c
         |), cands AS (
         |  SELECT d.doc_id, r.lang
         |  FROM d JOIN read_parquet('$t36Dir/routing/*.parquet') r
         |    USING (script)
         |  UNION ALL
         |  SELECT d.doc_id, p.lang
         |  FROM d, (SELECT DISTINCT lang
         |           FROM read_parquet('$t36Dir/profiles/*.parquet')) p
         |  WHERE d.script = 'unknown'
         |), g AS (
         |  SELECT doc_id, substr(t, i, 3) AS g3
         |  FROM (SELECT doc_id, lower(text) AS t,
         |          unnest(generate_series(1, length(lower(text)) - 2)) AS i
         |        FROM docs WHERE text IS NOT NULL AND length(text) >= 3)
         |), sc AS (
         |  SELECT g.doc_id, p.lang, sum(p.w) AS score
         |  FROM g JOIN read_parquet('$t36Dir/profiles/*.parquet') p
         |    ON p.trigram = g.g3
         |  JOIN cands cd ON cd.doc_id = g.doc_id AND cd.lang = p.lang
         |  GROUP BY 1, 2
         |), best AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, lang) AS rn
         |  FROM sc WHERE score > 0
         |)
         |SELECT docs.doc_id, coalesce(b.lang, df.dflt, 'unknown') AS lang
         |FROM docs
         |JOIN d USING (doc_id)
         |LEFT JOIN best b ON b.doc_id = docs.doc_id AND b.rn = 1
         |LEFT JOIN read_parquet('$t36Dir/defaults/*.parquet') df
         |  ON df.script = d.script
         |ORDER BY docs.doc_id""".stripMargin,
    // Injection rebuilt from chr() code points (the Scala literals'
    // exact values); the same regexp_replace fold chain with 'g', the
    // same \x{...} classes, and the same explicit whitespace class.
    // quantile_cont and Spark's exact `percentile` share the same
    // definition (sort, index p·(n−1), linear interpolation); round(4)
    // absorbs last-ulp division differences.
    // t20's truth IS the direct whole-corpus card — the same SQL as
    // t18 minus nothing: if the incremental merge drifts from the
    // direct computation in any field, the hash compare fails.
    "t20_incremental_card" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)::BIGINT AS n_empty,
        |  sum(n_tok)::BIGINT AS total_tokens,
        |  round(avg(n_tok), 6) AS avg_tokens,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
        |  round(quantile_cont(n_chars, 0.95), 4) AS p95_chars
        |FROM (
        |  SELECT source, lang, text, n_chars,
        |    (CASE WHEN text IS NULL THEN 0
        |          ELSE len(regexp_extract_all(text, '[^ \t\n\f\r]+')) END)::BIGINT AS n_tok
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t18_data_card" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)::BIGINT AS n_empty,
        |  sum(n_tok)::BIGINT AS total_tokens,
        |  round(avg(n_tok), 6) AS avg_tokens,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
        |  round(quantile_cont(n_chars, 0.95), 4) AS p95_chars
        |FROM (
        |  SELECT source, lang, text, n_chars,
        |    (CASE WHEN text IS NULL THEN 0
        |          ELSE len(regexp_extract_all(text, '[^ \t\n\f\r]+')) END)::BIGINT AS n_tok
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t17_normalize" ->
      """WITH dirty AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 4 = 0 THEN 'it' || chr(8217) || 's ' ||
        |      chr(8220) || 'quoted' || chr(8221) || ' ' || chr(8212) ||
        |      ' fine' || chr(8230) || ' '
        |    WHEN doc_id % 4 = 1 THEN 'non' || chr(160) || 'breaking' ||
        |      chr(8201) || 'space '
        |    WHEN doc_id % 4 = 2 THEN 'zero' || chr(8203) || 'width' ||
        |      chr(173) || 'soft '
        |    ELSE '  runs' || chr(9) || ' of' || chr(10) || ' whitespace   '
        |    END || text AS t
        |  FROM documents WHERE doc_id % 10 = 0),
        |norm AS (
        |  SELECT doc_id, t, trim(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(t,
        |        '[\x{2018}\x{2019}\x{201A}\x{201B}\x{2032}]', chr(39), 'g'),
        |      '[\x{201C}\x{201D}\x{201E}\x{201F}\x{2033}]', '"', 'g'),
        |      '[\x{2010}-\x{2015}\x{2212}]', '-', 'g'),
        |      '\x{2026}', '...', 'g'),
        |      '[\x{00A0}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g'),
        |      '[\x{200B}-\x{200D}\x{FEFF}\x{00AD}]', '', 'g'),
        |      '[ \t\n\r\f\x{000B}]+', ' ', 'g')) AS norm
        |  FROM dirty)
        |SELECT doc_id, norm,
        |  (length(t) - length(norm))::BIGINT AS n_folded
        |FROM norm ORDER BY doc_id""".stripMargin,
    // Injection rebuilt from chr() code points (the Scala literals'
    // exact values), counts via the same \x{...} RE2 classes.
    "t16_encoding_quality" ->
      """WITH dirty AS (
        |  SELECT lang, text || CASE
        |    WHEN doc_id % 6 = 0 THEN ' caf' || chr(195) || chr(169) ||
        |      ' na' || chr(195) || chr(175) || 've'
        |    WHEN doc_id % 6 = 1 THEN ' bad' || chr(1) || chr(2) ||
        |      chr(159) || 'byte'
        |    WHEN doc_id % 6 = 2 THEN ' lost' || chr(65533) || chr(65533) || 'chars'
        |    WHEN doc_id % 6 = 3 THEN ' smart' || chr(226) || chr(8364) ||
        |      chr(8482) || 'quote'
        |    ELSE '' END AS t
        |  FROM documents),
        |feat AS (
        |  SELECT lang,
        |    CASE WHEN t IS NULL OR length(t) = 0 THEN 0.0 ELSE
        |      len(regexp_extract_all(t, '\x{FFFD}'))::DOUBLE / length(t) END AS r_repl,
        |    CASE WHEN t IS NULL OR length(t) = 0 THEN 0.0 ELSE
        |      len(regexp_extract_all(t,
        |        '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]'))::DOUBLE / length(t) END AS r_ctrl,
        |    CASE WHEN t IS NULL OR length(t) = 0 THEN 0.0 ELSE
        |      len(regexp_extract_all(t,
        |        '[\x{00C2}\x{00C3}][\x{0080}-\x{00FF}]|\x{00E2}\x{20AC}'))::DOUBLE / length(t) END AS r_moji
        |  FROM dirty)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(r_repl), 6) AS avg_repl,
        |  round(avg(r_ctrl), 6) AS avg_ctrl,
        |  round(avg(r_moji), 6) AS avg_moji,
        |  sum(CASE WHEN r_repl > 0 OR r_ctrl > 0 OR r_moji > 0
        |      THEN 1 ELSE 0 END)::BIGINT AS n_damaged
        |FROM feat GROUP BY lang ORDER BY lang""".stripMargin,
    // Identical hash kernel (flattened HUGEINT digit sum), identical
    // weight literals, identical tokenize/filter/mean/sigmoid chain.
    "t15_quality_classifier" ->
      s"""SELECT doc_id,
         |  round(1.0 / (1.0 + exp(-($t15Bias +
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |         ELSE list_sum(list_transform(toks,
         |                t -> wl[$t15BucketSql + 1])) / len(toks)
         |    END))), 6) AS q_score
         |FROM (
         |  SELECT doc_id,
         |    list_filter(
         |      list_transform(regexp_extract_all(coalesce(text, ''),
         |        '[^ \t\n\f\r]+'),
         |        t -> regexp_replace(t,
         |          '^[\\x{0000}-\\x{0020}]+|[\\x{0000}-\\x{0020}]+$$', '', 'g')),
         |      t -> len(t) > 0 AND lower(t) != 'nan') AS toks
         |  FROM documents),
         |  (SELECT [${t15Weights.mkString(", ")}]::DOUBLE[] AS wl)
         |ORDER BY doc_id""".stripMargin,
    // Greedy longest-match replicated as a recursive CTE: each word's
    // cursor advances by the longest vocab entry matching at `pos`
    // (the correlated max-length probe), or by one UNKNOWN character.
    // Distinct words recurse once each; per-doc counts re-expand
    // through the (doc, word) multiplicity join.
    "t22_bpe_tokens" ->
      s"""SELECT word_id, exp_tokens AS tokens, exp_n AS n_tokens,
         |  exp_unk AS n_unk
         |FROM read_parquet('$t22WordsDir/*.parquet')
         |ORDER BY word_id""".stripMargin,
    "t28_unigram_tokens" ->
      s"""SELECT word_id, exp_tokens AS tokens, exp_n AS n_tokens,
         |  exp_unk AS n_unk
         |FROM read_parquet('$t28WordsDir/*.parquet')
         |ORDER BY word_id""".stripMargin,
    "t29_unigram_learn" ->
      s"""SELECT rank, exp_piece AS piece, exp_score AS score
         |FROM read_parquet('$t29ModelDir/*.parquet')
         |ORDER BY rank""".stripMargin,
    // The FOUR extraction patterns and the token probes interpolate
    // from the same Scala vals the engine compiles (single quotes
    // doubled for the SQL literal), so the two sides cannot drift.
    "t57_dehyphenate" ->
      s"""SELECT doc_id,
         |  regexp_replace(text, '[-\n\r]', ' ', 'g') AS roundtrip
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t55_jsonld" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 0
         |    ELSE 2 END AS n_blocks,
         |  CASE doc_id % 4
         |    WHEN 0 THEN 'Article'
         |    WHEN 1 THEN 'NewsArticle,Product'
         |    ELSE '' END AS types
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t54_html_meta" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 4 WHEN 0 THEN 'Doc ' || doc_id || ' & more'
         |    ELSE '' END AS title,
         |  CASE doc_id % 4 WHEN 0 THEN 'summary ' || doc_id
         |    WHEN 3 THEN 'word' || doc_id ELSE '' END AS description,
         |  CASE doc_id % 4 WHEN 1 THEN 'OG ' || doc_id
         |    ELSE '' END AS og_title,
         |  CASE doc_id % 4 WHEN 1 THEN 'og desc ' || doc_id
         |    ELSE '' END AS og_description,
         |  CASE doc_id % 4
         |    WHEN 0 THEN 'https://example.org/p?id=' || doc_id || '&amp;v=1'
         |    WHEN 1 THEN 'https://ex.org/c/' || doc_id
         |    ELSE '' END AS canonical,
         |  CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 3 THEN 'fr'
         |    ELSE '' END AS lang_decl
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t31_robots_meta" -> {
      def q(p: String): String = p.replace("'", "''")
      val ex = TextAnalysis.robotsContentPatterns
        .map(p => s"nullif(regexp_extract(html, '${q(p)}', 1), '')")
        .mkString(",\n      ")
      def probe(d: String): String =
        s"regexp_matches(directives, '${q(TextAnalysis.robotsTokenPattern(d))}')"
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN
         |      '<html><head><meta name="robots" content="noindex, nofollow"></head><body>' || text
         |    WHEN doc_id % 5 = 1 THEN
         |      '<html><head><meta content="NOFOLLOW" name="robots"></head><body>' || text
         |    WHEN doc_id % 5 = 2 THEN
         |      '<html><head><meta name=robots content=noindex></head><body>' || text
         |    WHEN doc_id % 5 = 3 THEN
         |      '<html><head><meta name=''robots'' content=''none''></head><body>' || text
         |    ELSE '<html><head><meta data-name="robots" content="noindex"></head><body>' || text
         |    END AS html
         |  FROM documents),
         |d AS (
         |  SELECT doc_id,
         |    lower(concat_ws(',',
         |      $ex))
         |      AS directives
         |  FROM h)
         |SELECT doc_id, directives,
         |  (${probe("noindex")} OR ${probe("none")}) AS noindex,
         |  (${probe("nofollow")} OR ${probe("none")}) AS nofollow
         |FROM d ORDER BY doc_id""".stripMargin
    },
    // Both GD iterations unrolled: r0 = σ(0)−y = 0.5−y, g0 per bucket,
    // w1 = −g0/N and bias1 = −avg(r0); then z1 through the broadcast
    // weights, r1 = σ(z1)−y, w2/bias2. Feature x = (token multiplicity
    // in bucket)/(scorable tokens); the token filter and HUGEINT
    // bucketing are the t15 replay verbatim.
    "t30_train_classifier" ->
      s"""WITH ftoks AS (
         |  SELECT doc_id,
         |    list_contains(regexp_extract_all(coalesce(text, ''),
         |      '[^ \t\n\f\r]+'), 'table')::INT::DOUBLE AS y,
         |    list_filter(
         |      list_transform(regexp_extract_all(coalesce(text, ''),
         |        '[^ \t\n\f\r]+'),
         |        t -> regexp_replace(t,
         |          '^[\\x{0000}-\\x{0020}]+|[\\x{0000}-\\x{0020}]+$$', '', 'g')),
         |      t -> len(t) > 0 AND lower(t) != 'nan') AS toks
         |  FROM documents),
         |lab AS (SELECT doc_id, y, len(toks) AS n FROM ftoks),
         |fb AS (
         |  SELECT doc_id, $t15BucketSql AS b
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM ftoks)),
         |x AS (
         |  SELECT fb.doc_id, fb.b,
         |    count(*)::DOUBLE / max(lab.n) AS x
         |  FROM fb JOIN lab USING (doc_id) GROUP BY 1, 2),
         |nn AS (SELECT count(*)::DOUBLE AS nd FROM lab),
         |r0 AS (SELECT doc_id, 0.5 - y AS r FROM lab),
         |g0 AS (
         |  SELECT x.b, sum(r0.r * x.x) / nn.nd AS g
         |  FROM r0 JOIN x USING (doc_id) CROSS JOIN nn GROUP BY x.b, nn.nd),
         |w1 AS (
         |  SELECT ri.i::INT AS b, coalesce(0.0 - g0.g, 0.0) AS w
         |  FROM range(0, 64) ri(i) LEFT JOIN g0 ON g0.b = ri.i),
         |b1 AS (SELECT 0.0 - avg(r) AS bias FROM r0),
         |zs AS (
         |  SELECT x.doc_id, sum(x.x * w1.w) AS z
         |  FROM x JOIN w1 USING (b) GROUP BY 1),
         |r1 AS (
         |  SELECT lab.doc_id,
         |    1.0 / (1.0 + exp(-(b1.bias + coalesce(zs.z, 0.0)))) - lab.y AS r
         |  FROM lab LEFT JOIN zs USING (doc_id) CROSS JOIN b1),
         |g1 AS (
         |  SELECT x.b, sum(r1.r * x.x) / nn.nd AS g
         |  FROM r1 JOIN x USING (doc_id) CROSS JOIN nn GROUP BY x.b, nn.nd),
         |w2 AS (
         |  SELECT w1.b, w1.w - coalesce(g1.g, 0.0) AS w
         |  FROM w1 LEFT JOIN g1 ON g1.b = w1.b),
         |b2 AS (SELECT b1.bias - (SELECT avg(r) FROM r1) AS bias FROM b1)
         |SELECT b::BIGINT AS idx, round(w, 4) AS weight FROM w2
         |UNION ALL
         |SELECT -1::BIGINT, round(bias, 4) FROM b2
         |ORDER BY idx""".stripMargin,
    "t23_bytelevel_bpe" ->
      s"""SELECT word_id, exp_tokens AS tokens, exp_n AS n_tokens,
         |  exp_unk AS n_unk
         |FROM read_parquet('$t23WordsDir/*.parquet')
         |ORDER BY word_id""".stripMargin,
    "t25_bpe_learn" ->
      s"""SELECT rank, lhs, rhs
         |FROM read_parquet('$t25ExpectedDir/*.parquet')
         |ORDER BY rank""".stripMargin,
    // WordPiece re-derived from scratch: per distinct word, a
    // recursive greedy walk where pos=1 probes raw vocabulary entries
    // and pos>1 probes '##'-prefixed ones (ml = matched INPUT length,
    // so a '##xyz' entry consumes len-2 characters); longest match
    // wins via max(); a position with NO match sets failed and the
    // word collapses to ONE [UNK] token. Docs join back LEFT so
    // word-free text still yields a zero row.
    "t37_wordpiece" -> {
      val vocabValues = t37Vocab.map(v => s"('$v')").mkString(", ")
      raw"""WITH RECURSIVE vocab(v) AS (VALUES $vocabValues),
         |words AS (
         |  SELECT doc_id, unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS w
         |  FROM documents
         |),
         |dw AS (SELECT DISTINCT w FROM words),
         |seg AS (
         |  SELECT w,
         |    CASE WHEN len(w) > 200 THEN len(w) + 1 ELSE 1 END AS pos,
         |    0 AS n_tok,
         |    CASE WHEN len(w) > 200 THEN 1 ELSE 0 END AS failed
         |  FROM dw
         |  UNION ALL
         |  SELECT w,
         |    CASE WHEN ml IS NULL THEN len(w) + 1 ELSE pos + ml END,
         |    n_tok + 1,
         |    CASE WHEN ml IS NULL THEN 1 ELSE 0 END
         |  FROM (
         |    SELECT w, pos, n_tok,
         |      (SELECT max(CASE WHEN pos = 1 THEN len(v)
         |                       ELSE len(v) - 2 END)
         |       FROM vocab
         |       WHERE CASE WHEN pos = 1
         |             THEN v = substr(w, pos, len(v))
         |             ELSE substr(v, 1, 2) = '##' AND len(v) > 2
         |                  AND substr(v, 3) = substr(w, pos, len(v) - 2)
         |             END) AS ml
         |    FROM seg WHERE pos <= len(w) AND failed = 0)
         |),
         |fin AS (
         |  SELECT w,
         |    CASE WHEN failed = 1 THEN 1 ELSE n_tok END AS n_tok,
         |    failed AS n_unk
         |  FROM seg WHERE pos > len(w)
         |),
         |wc AS (SELECT doc_id, w, count(*) AS k FROM words GROUP BY 1, 2),
         |per_doc AS (
         |  SELECT wc.doc_id,
         |    sum(wc.k * fin.n_tok) AS n_pieces,
         |    sum(wc.k * fin.n_unk) AS n_unk_words
         |  FROM wc JOIN fin USING (w)
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(p.n_pieces, 0)::BIGINT AS n_pieces,
         |  coalesce(p.n_unk_words, 0)::BIGINT AS n_unk_words
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    "t38_wordpiece_learn" ->
      s"""SELECT idx, piece
         |FROM read_parquet('$t38ExpectedDir/*.parquet')
         |ORDER BY idx""".stripMargin,
    // PMI re-derived with the SAME operation order as the Spark side
    // (ln(pair/B) − ln(c1/T) − ln(c2/T), then one 4-dp round) so the
    // doubles agree bit-for-bit; the (pmi, w1, w2) order makes the
    // LIMIT cut identical.
    "t39_collocations" ->
      raw"""WITH toks AS (
         |  SELECT regexp_extract_all(text, '[^ \t\n\f\r]+') AS tk
         |  FROM documents WHERE text IS NOT NULL
         |),
         |words AS (SELECT unnest(tk) AS w FROM toks),
         |uni AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
         |pairs AS (
         |  -- parallel unnests zip pairwise in DuckDB: adjacent pairs
         |  SELECT unnest(tk[1:len(tk) - 1]) AS w1,
         |         unnest(tk[2:len(tk)]) AS w2
         |  FROM toks
         |),
         |bi AS (
         |  SELECT w1, w2, count(*) AS n_pair FROM pairs GROUP BY 1, 2
         |  HAVING count(*) >= 5
         |),
         |tot AS (
         |  SELECT (SELECT sum(c) FROM uni) AS t,
         |         (SELECT count(*) FROM pairs) AS b
         |)
         |SELECT w1, w2, n_pair,
         |  round(ln(n_pair::DOUBLE / b) - ln(u1.c::DOUBLE / t)
         |        - ln(u2.c::DOUBLE / t), 4) AS pmi
         |FROM bi
         |JOIN uni u1 ON u1.w = bi.w1
         |JOIN uni u2 ON u2.w = bi.w2
         |CROSS JOIN tot
         |ORDER BY pmi DESC, w1, w2
         |LIMIT 50""".stripMargin,
    "t40_vocab_coverage" -> {
      val inList = t40Vocab.map(v => s"'$v'").mkString(", ")
      raw"""WITH words AS (
         |  SELECT source,
         |    unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS w
         |  FROM documents
         |),
         |agg AS (
         |  SELECT source, count(*) AS n_tokens,
         |    sum(CASE WHEN w NOT IN ($inList) THEN 1 ELSE 0 END) AS n_oov,
         |    count(DISTINCT CASE WHEN w NOT IN ($inList) THEN w END)
         |      AS n_distinct_oov
         |  FROM words GROUP BY 1)
         |SELECT d.source,
         |  coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
         |  coalesce(a.n_oov, 0)::BIGINT AS n_oov,
         |  CASE WHEN coalesce(a.n_tokens, 0) > 0
         |       THEN round(a.n_oov::DOUBLE / a.n_tokens, 4)
         |       ELSE 0.0 END AS oov_rate,
         |  coalesce(a.n_distinct_oov, 0)::BIGINT AS n_distinct_oov
         |FROM (SELECT DISTINCT source FROM documents) d
         |LEFT JOIN agg a USING (source)
         |ORDER BY d.source""".stripMargin
    },
    // Identity oracle: decode(encode(text)) == text for every doc, so
    // the expected frame IS the corpus (NULL text encodes to [] and
    // decodes to '').
    "t33_bpe_roundtrip" ->
      """SELECT doc_id, coalesce(text, '') AS decoded, 1 AS roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Script ranges restated independently as RE2 \x{…} classes; the
    // dominant-script CASE replays the strict-greater fold: the FIRST
    // script in priority order reaching the maximum wins.
    "t24_script_detect" ->
      """WITH c AS (
        |  SELECT lang,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]',
        |      '', 'g')) AS latin,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{0400}-\x{052F}]', '', 'g')) AS cyr,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{0370}-\x{03FF}]', '', 'g')) AS grk,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{0600}-\x{06FF}\x{0750}-\x{077F}]', '', 'g')) AS ara,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{0590}-\x{05FF}]', '', 'g')) AS heb,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{0900}-\x{097F}]', '', 'g')) AS dev,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{0E00}-\x{0E7F}]', '', 'g')) AS tha,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{AC00}-\x{D7AF}\x{1100}-\x{11FF}\x{3130}-\x{318F}]',
        |      '', 'g')) AS han_g,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{3040}-\x{309F}\x{30A0}-\x{30FF}]', '', 'g')) AS kan,
        |    length(regexp_replace(coalesce(text, ''),
        |      '[^\x{4E00}-\x{9FFF}\x{3400}-\x{4DBF}]', '', 'g')) AS han
        |  FROM documents
        |), m AS (
        |  SELECT lang, latin, han,
        |    greatest(latin, cyr, grk, ara, heb, dev, tha, han_g, kan,
        |             han) AS mx,
        |    cyr, grk, ara, heb, dev, tha, han_g, kan
        |  FROM c
        |), d AS (
        |  -- first script in priority order reaching the max wins —
        |  -- exactly the engine's strict-greater fold
        |  SELECT lang, latin, han,
        |    CASE WHEN mx < 1 THEN 'unknown'
        |         WHEN latin = mx THEN 'latin'
        |         WHEN cyr   = mx THEN 'cyrillic'
        |         WHEN grk   = mx THEN 'greek'
        |         WHEN ara   = mx THEN 'arabic'
        |         WHEN heb   = mx THEN 'hebrew'
        |         WHEN dev   = mx THEN 'devanagari'
        |         WHEN tha   = mx THEN 'thai'
        |         WHEN han_g = mx THEN 'hangul'
        |         WHEN kan   = mx THEN 'kana'
        |         ELSE 'han' END AS script
        |  FROM m
        |)
        |SELECT lang, script, count(*) AS n,
        |  sum(latin)::BIGINT AS latin_cp, sum(han)::BIGINT AS han_cp
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t14_vocab_tokens" -> {
      val vocabValues = (t14ModelVocab ++ t14AddedTokens)
        .map(v => s"('$v')").mkString(", ")
      s"""WITH RECURSIVE vocab(v) AS (VALUES $vocabValues),
         |words AS (
         |  SELECT doc_id, unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS w
         |  FROM documents WHERE doc_id % 10 = 0
         |),
         |dw AS (SELECT DISTINCT w FROM words),
         |seg AS (
         |  SELECT w, 1 AS pos, 0 AS n_tok, 0 AS n_unk FROM dw
         |  UNION ALL
         |  SELECT w, pos + coalesce(ml, 1), n_tok + 1,
         |         n_unk + CASE WHEN ml IS NULL THEN 1 ELSE 0 END
         |  FROM (
         |    SELECT w, pos, n_tok, n_unk,
         |      (SELECT max(len(v)) FROM vocab
         |       WHERE v = substr(w, pos, len(v))) AS ml
         |    FROM seg WHERE pos <= len(w))
         |),
         |fin AS (SELECT w, n_tok, n_unk FROM seg WHERE pos > len(w)),
         |wc AS (SELECT doc_id, w, count(*) AS k FROM words GROUP BY 1, 2)
         |SELECT wc.doc_id,
         |  sum(wc.k * fin.n_tok)::BIGINT AS n_vocab_tokens,
         |  sum(wc.k * fin.n_unk)::BIGINT AS n_unk
         |FROM wc JOIN fin USING (w)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "t19_markdown_extract" ->
      s"""SELECT doc_id, ${duckMarkdownToText("md")} AS txt
         |FROM (SELECT doc_id, $t19MdSql AS md
         |      FROM documents WHERE doc_id % 10 = 0)
         |ORDER BY doc_id""".stripMargin,
    "t13_html_extract" ->
      s"""SELECT doc_id, ${duckHtmlToText("html")} AS txt,
         |  ${duckStripBp("html")} AS txt_bp
         |FROM (SELECT doc_id, $duckHtml AS html
         |      FROM documents WHERE doc_id % 10 = 0)
         |ORDER BY doc_id""".stripMargin,
    "t1_langid" -> {
      val en = sqlHits(enMarkers); val es = sqlHits(esMarkers)
      val de = sqlHits(deMarkers); val fr = sqlHits(frMarkers)
      s"""SELECT lang, predicted, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN en IS NULL OR best = 0 THEN 'unknown'
         |         WHEN en = best THEN 'en'
         |         WHEN es = best THEN 'es'
         |         WHEN de = best THEN 'de'
         |         ELSE 'fr' END AS predicted
         |  FROM (
         |    SELECT lang, en, es, de, fr, greatest(en, es, de, fr) AS best FROM (
         |      SELECT lang, $en AS en, $es AS es, $de AS de, $fr AS fr
         |      FROM documents)))
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "t2_quality" -> {
      val stop = sqlHits(enMarkers)
      s"""SELECT lang, count(*) AS n_docs,
         | round(avg(punct_ratio),6) AS avg_punct,
         | round(avg(digit_ratio),6) AS avg_digit,
         | round(avg(stop_ratio),6) AS avg_stop,
         | round(avg(score),6) AS avg_score,
         | round(avg(avg_tok_len),6) AS avg_tok_len
         |FROM (
         |  SELECT lang, punct_ratio, digit_ratio, stop_ratio, avg_tok_len,
         |    round(1.0 - punct_ratio - digit_ratio + least(stop_ratio, 0.2), 4) AS score
         |  FROM (
         |    SELECT lang,
         |      CASE WHEN length(text) > 0 THEN (length(text) - length(regexp_replace(text,'[.,!?;:]','','g')))::DOUBLE / length(text) ELSE 0.0 END AS punct_ratio,
         |      CASE WHEN length(text) > 0 THEN (length(text) - length(regexp_replace(text,'[0-9]','','g')))::DOUBLE / length(text) ELSE 0.0 END AS digit_ratio,
         |      CASE WHEN tok_n > 0 THEN ($stop)::DOUBLE / tok_n ELSE 0.0 END AS stop_ratio,
         |      CASE WHEN tok_n > 0 THEN (length(text)::DOUBLE - (tok_n - 1)) / tok_n ELSE 0.0 END AS avg_tok_len
         |    FROM (
         |      SELECT lang, text,
         |        CASE WHEN text IS NULL OR trim(text) = '' THEN 0
         |             ELSE len(regexp_extract_all(trim(text), '\\S+')) END AS tok_n
         |      FROM documents)))
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "t3_token_counts" ->
      """SELECT lang,
        | sum(ws_tokens)::BIGINT AS total_ws_tokens,
        | sum(subwords)::BIGINT AS total_subwords,
        | max(ws_tokens) AS max_ws_tokens,
        | min(ws_tokens) AS min_ws_tokens
        |FROM (
        |  SELECT lang,
        |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |         ELSE len(regexp_extract_all(trim(text), '\S+')) END AS ws_tokens,
        |    CASE WHEN text IS NULL THEN 0
        |         ELSE len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) END AS subwords
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t5_repetition" ->
      """SELECT lang, count(*) AS n_docs,
        | round(avg(tok_repeat_ratio), 6) AS avg_tok_repeat,
        | round(avg(dup_ngram_ratio), 6) AS avg_dup_bigram,
        | sum(CASE WHEN dup_ngram_ratio >= 0.4 THEN 1 ELSE 0 END)::BIGINT AS n_flagged
        |FROM (
        |  SELECT lang,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE 1.0 - len(list_distinct(toks))::DOUBLE / len(toks) END AS tok_repeat_ratio,
        |    CASE WHEN len(grams) = 0 THEN 0.0
        |         ELSE 1.0 - len(list_distinct(grams))::DOUBLE / len(grams) END AS dup_ngram_ratio
        |  FROM (
        |    SELECT lang, toks,
        |      CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
        |           ELSE list_transform(range(1, len(toks)),
        |                  i -> toks[i] || ' ' || toks[i+1]) END AS grams
        |    FROM (
        |      SELECT lang,
        |        CASE WHEN text IS NULL THEN []::VARCHAR[]
        |             ELSE regexp_extract_all(
        |               CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text ELSE text END,
        |               '\S+') END AS toks
        |      FROM documents)))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t4_doc_stats" ->
      """SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
        | round(avg(n_chars),4) AS avg_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        | count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "t6_corpus_vocab" ->
      """SELECT sum(n)::BIGINT AS n_tokens, count(*) AS vocab_size,
        | sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        | max(n)::BIGINT AS max_token_freq
        |FROM (SELECT tok, count(*)::BIGINT AS n
        |      FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
        |            FROM documents)
        |      GROUP BY tok)""".stripMargin,
    "t11_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
        |), g AS (
        |  SELECT doc_id, t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
        |), bc AS (
        |  SELECT w1, w2, count(*) AS cbg FROM g GROUP BY 1, 2
        |), cc AS (
        |  SELECT w1, count(*) AS cw1 FROM g GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT w) AS nv FROM (
        |    SELECT w1 AS w FROM g UNION ALL SELECT w2 FROM g)
        |), scored AS (
        |  SELECT g.doc_id, count(*) AS n_bigrams,
        |    sum(ln((bc.cbg + 1)::DOUBLE / (cc.cw1 + v.nv))) / count(*)
        |      AS lm_logprob
        |  FROM g JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
        |  GROUP BY g.doc_id
        |)
        |SELECT d.lang, count(*) AS n_docs,
        |  sum(s.n_bigrams)::BIGINT AS total_bigrams,
        |  round(avg(s.lm_logprob), 4) AS avg_logprob,
        |  round(min(s.lm_logprob), 4) AS min_logprob
        |FROM scored s JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Interpolated Kneser–Ney, bigram case, fixed discount 0.75.
    // Multiplication/association order mirrors the Spark expressions
    // exactly so the 4-dp rounded means agree bit-for-bit.
    "t32_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
        |), dg AS (
        |  SELECT doc_id, w1, w2, count(*) AS k FROM g GROUP BY 1, 2, 3
        |), bc AS (
        |  SELECT w1, w2, sum(k) AS cbg FROM dg GROUP BY 1, 2
        |), cc AS (
        |  SELECT w1, sum(cbg) AS cw1, count(*) AS n1p_after FROM bc GROUP BY 1
        |), ct AS (
        |  SELECT w2, count(*) AS n1p_before FROM bc GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS b FROM bc
        |), scored AS (
        |  SELECT dg.doc_id, sum(k)::BIGINT AS n_bigrams,
        |    sum(k * ln(
        |      (greatest(bc.cbg::DOUBLE - 0.75, 0.0) +
        |       0.75 * cc.n1p_after * (ct.n1p_before::DOUBLE / tot.b))
        |      / cc.cw1)) / sum(k) AS kn_logprob
        |  FROM dg JOIN bc USING (w1, w2) JOIN cc USING (w1)
        |    JOIN ct USING (w2) CROSS JOIN tot
        |  GROUP BY 1
        |)
        |SELECT d.lang, count(*) AS n_docs,
        |  sum(s.n_bigrams)::BIGINT AS total_bigrams,
        |  round(avg(s.kn_logprob), 4) AS avg_logprob,
        |  round(min(s.kn_logprob), 4) AS min_logprob,
        |  round(avg(exp(-s.kn_logprob)), 4) AS avg_ppl
        |FROM scored s JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Trigram KN with recursive backoff, discount 0.75 at every
    // level. Self-score: every gram is in-model, so the backoff
    // branches never fire and the closed form is the three-level
    // interpolation below. Association order mirrors the Spark
    // expressions exactly for bit-for-bit 4-dp agreement.
    "t35_kn3" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS t
        |  FROM documents
        |), g3 AS (
        |  SELECT doc_id, t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2,
        |         t[i+2]::VARCHAR AS w3
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
        |), dg AS (
        |  SELECT doc_id, w1, w2, w3, count(*) AS k FROM g3 GROUP BY 1, 2, 3, 4
        |), tc AS (
        |  SELECT w1, w2, w3, sum(k) AS ctg FROM dg GROUP BY 1, 2, 3
        |), c12 AS (
        |  SELECT w1, w2, sum(ctg) AS cw12, count(*) AS n1p_after12
        |  FROM tc GROUP BY 1, 2
        |), cont2 AS (
        |  SELECT w2, w3, count(*) AS n1p_mid FROM tc GROUP BY 1, 2
        |), c2 AS (
        |  SELECT w2, sum(n1p_mid) AS cw2cont, count(*) AS n2typ_after
        |  FROM cont2 GROUP BY 1
        |), g2 AS (
        |  SELECT t[i]::VARCHAR AS w1, t[i+1]::VARCHAR AS w2
        |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
        |), bc AS (
        |  SELECT w1, w2 FROM g2 GROUP BY 1, 2
        |), cu AS (
        |  SELECT w2 AS w3, count(*) AS n1p_before FROM bc GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS b FROM bc
        |), scored AS (
        |  SELECT dg.doc_id, sum(k)::BIGINT AS n_trigrams,
        |    sum(k * ln(
        |      (greatest(tc.ctg::DOUBLE - 0.75, 0.0) +
        |       0.75 * c12.n1p_after12 *
        |         ((greatest(cont2.n1p_mid::DOUBLE - 0.75, 0.0) +
        |           0.75 * c2.n2typ_after *
        |             (cu.n1p_before::DOUBLE / tot.b)) / c2.cw2cont))
        |      / c12.cw12)) / sum(k) AS kn3_logprob
        |  FROM dg JOIN tc USING (w1, w2, w3) JOIN c12 USING (w1, w2)
        |    JOIN cont2 USING (w2, w3) JOIN c2 USING (w2)
        |    JOIN cu USING (w3) CROSS JOIN tot
        |  GROUP BY 1
        |)
        |SELECT d.lang, count(*) AS n_docs,
        |  sum(s.n_trigrams)::BIGINT AS total_trigrams,
        |  round(avg(s.kn3_logprob), 4) AS avg_logprob,
        |  round(min(s.kn3_logprob), 4) AS min_logprob,
        |  round(avg(exp(-s.kn3_logprob)), 4) AS avg_ppl
        |FROM scored s JOIN documents d USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t10_entropy" ->
      """SELECT doc_id, n_cp, round(entropy, 4) AS entropy_r FROM (
        |  SELECT doc_id, sum(c)::BIGINT AS n_cp,
        |    CASE WHEN sum(c) > 0
        |      THEN ln(sum(c)::DOUBLE) - sum(c * ln(c::DOUBLE)) / sum(c)
        |      ELSE 0.0 END AS entropy
        |  FROM (
        |    SELECT doc_id, ch, count(*) AS c
        |    FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[^\n]')) AS ch
        |          FROM documents WHERE doc_id % 25 = 0)
        |    GROUP BY 1, 2)
        |  GROUP BY doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t12_boilerplate" ->
      """WITH l AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\f\r]+') AS toks
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS t FROM l
        |), dfreq AS (
        |  SELECT t, count(DISTINCT doc_id) AS d FROM tok GROUP BY 1
        |), ds AS (
        |  SELECT coalesce(
        |    list(t) FILTER (WHERE d > 0.5 * (SELECT count(*) FROM documents)),
        |    []) AS drop_list
        |  FROM dfreq
        |)
        |SELECT doc_id,
        | coalesce(array_to_string(
        |   list_filter(toks, x -> NOT list_contains(ds.drop_list, x)), ' '), '')
        |   AS text_clean,
        | coalesce(len(toks), 0)::BIGINT AS n_before,
        | coalesce(len(list_filter(toks, x -> NOT list_contains(ds.drop_list, x))),
        |          0)::BIGINT AS n_after
        |FROM l, ds ORDER BY doc_id""".stripMargin,
    "t9_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents WHERE doc_id % 10 = 0
        |), s0 AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 12)) AS start FROM t
        |), s AS (
        |  -- stop once a chunk reaches the end: a later start would be a
        |  -- strict suffix of the previous chunk (duplicated text)
        |  SELECT * FROM s0 WHERE start = 0 OR start - 12 + 16 < len(toks)
        |)
        |SELECT doc_id, (start // 12)::INT AS chunk_idx,
        |  least(16, len(toks) - start)::BIGINT AS n_chunk_tokens,
        |  array_to_string(toks[start+1 : start+16], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "t8_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*)::BIGINT AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*)::BIGINT AS nd FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT d.lang, tf.term,
        |    round(sum(tf.tf * ln(n.n::DOUBLE / dfreq.nd)), 4) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |  JOIN documents d USING (doc_id)
        |  GROUP BY 1, 2)
        |SELECT lang, rank, term, score FROM (
        |  SELECT lang, term, score,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    "t7_gopher_lines" ->
      """WITH d AS (
        |  SELECT lang, text || CASE
        |    WHEN doc_id % 4 = 0 THEN chr(10)||'- bullet item'||chr(10)||'* another...'
        |    WHEN doc_id % 4 = 1 THEN chr(10)||'trailing ellipsis...'
        |    WHEN doc_id % 4 = 2 THEN ' ### tags #'
        |    ELSE '' END AS t
        |  FROM documents
        |), f AS (
        |  SELECT lang,
        |    len(string_split(t, chr(10))) AS n_lines,
        |    len(regexp_extract_all(t, '(?m)^[ \t]*[-*•]')) AS bullet,
        |    len(regexp_extract_all(t, '(?m)(\.\.\.|…)\r?$')) AS ellipsis,
        |    length(regexp_replace(t, '[ \t\n\f\r]+', '', 'g')) AS nonspace,
        |    len(regexp_extract_all(t, '[^ \t\n\f\r]+')) AS tok_n,
        |    len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\.\.\.')) AS symbols
        |  FROM d
        |)
        |SELECT lang, sum(n_lines)::BIGINT AS total_lines,
        |  round(avg(CASE WHEN n_lines > 0 THEN bullet::DOUBLE / n_lines ELSE 0 END), 4)
        |    AS avg_bullet_ratio,
        |  round(avg(CASE WHEN n_lines > 0 THEN ellipsis::DOUBLE / n_lines ELSE 0 END), 4)
        |    AS avg_ellipsis_ratio,
        |  round(avg(CASE WHEN tok_n > 0 THEN nonspace::DOUBLE / tok_n ELSE 0 END), 4)
        |    AS avg_word_len,
        |  round(avg(CASE WHEN tok_n > 0 THEN symbols::DOUBLE / tok_n ELSE 0 END), 4)
        |    AS avg_symbol_ratio
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin)
}
