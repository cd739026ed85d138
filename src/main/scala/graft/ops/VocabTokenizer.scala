package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocab-driven subword token counting — the budget-accurate counter a
  * training pipeline bills by, replacing the shape-only heuristics of
  * `GraftFunctions.subwordCount` when a real `tokenizer.json` is
  * available.
  *
  * Segmentation rule (the WordPiece/BPE-inference greedy): scan each
  * whitespace word left to right, at every position take the LONGEST
  * vocab entry that matches, count one token and advance by its length;
  * if nothing matches, count one UNKNOWN token and advance one
  * character. Deterministic, local to the word, and exactly
  * replicable in ANSI SQL (a recursive CTE), which is what makes it
  * gateable — a trained BPE's merge-order semantics are not.
  *
  * Implementation note: greedy longest-match is inherently iterative
  * per character, so this is one of the engine's few Scala UDFs (same
  * precedent as the MinHash/SimHash kernels — a Catalyst expression
  * with codegen would buy little here because the loop dominates, not
  * the row bridge). The vocabulary ships to executors inside the UDF
  * closure: real tokenizer vocabularies are ~30k–100k entries (≈1 MB),
  * task-binary scale, NOT data scale — no broadcast plumbing needed.
  */
object VocabTokenizer {

  /** Per-document result: total subword tokens (unknowns included) and
    * how many of them were unknown single characters.
    */
  final case class TokenCounts(n_tokens: Int, n_unk: Int)

  /** Serializable greedy segmenter. The hash set and max-entry-length
    * rebuild lazily per executor after deserialization.
    */
  final class Greedy(vocab: Array[String]) extends Serializable {
    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](math.max(16, vocab.length * 2))
      vocab.foreach(s.add)
      s
    }
    @transient private lazy val maxLen: Int =
      if (vocab.isEmpty) 0 else vocab.map(_.length).max

    /** (tokens, unknowns) for one word under the greedy rule.
      *
      * The unknown branch advances one CODE POINT, not one UTF-16
      * unit: an unmatched supplementary character (emoji, rare CJK) is
      * ONE unknown token — advancing by units would count it twice and
      * probe the vocab with lone surrogates, diverging from both the
      * documented "advance one character" rule and the code-point-based
      * SQL oracle on exactly the emoji-laden web text a budget counter
      * is billed against.
      */
    def count(word: String): (Int, Int) = {
      var pos = 0; var tok = 0; var unk = 0
      while (pos < word.length) {
        var l = math.min(maxLen, word.length - pos)
        var found = 0
        while (l >= 1 && found == 0) {
          if (set.contains(word.substring(pos, pos + l))) found = l
          l -= 1
        }
        if (found > 0) { tok += 1; pos += found }
        else { tok += 1; unk += 1
          pos += Character.charCount(word.codePointAt(pos)) }
      }
      (tok, unk)
    }

    /** The greedy segmentation behind [[count]] — unknown code points
      * are emitted as themselves (they are never vocab members, or the
      * match loop would have found them at length ≥ 1).
      */
    def pieces(word: String): Array[String] = {
      val out = Array.newBuilder[String]
      var pos = 0
      while (pos < word.length) {
        var l = math.min(maxLen, word.length - pos)
        var found = 0
        while (l >= 1 && found == 0) {
          if (set.contains(word.substring(pos, pos + l))) found = l
          l -= 1
        }
        if (found > 0) { out += word.substring(pos, pos + found); pos += found }
        else {
          val n = Character.charCount(word.codePointAt(pos))
          out += word.substring(pos, pos + n); pos += n
        }
      }
      out.result()
    }
  }

  /** Load the vocabulary from a HuggingFace-format `tokenizer.json`:
    * `model.vocab` as an object (BPE/WordPiece — keys are tokens) or an
    * array of `[token, score]` pairs (Unigram), plus `added_tokens`
    * contents — the same extraction the V15 TokenizerValidator performs
    * (`graft.engine.validate.FileValidators`, mirroring the reference's
    * `tokenizer_validator.py:146-179`). Fails loud on unreadable paths
    * or a vocab-free file: silently counting with an empty vocabulary
    * would bill every character as unknown.
    */
  def loadVocab(spark: SparkSession, path: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(fsPath), s"tokenizer.json not found at $path")
    val text = {
      val in = fs.open(fsPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val json = JsonMethods.parse(text)
    val vocab: Seq[String] = (json \ "model" \ "vocab") match {
      case JObject(fields) => fields.map(_._1)
      case JArray(items) => // Unigram form: [[token, score], ...]
        items.collect { case JArray(JString(tok) :: _) => tok }
      case _ => Seq.empty
    }
    val added: Seq[String] = (json \ "added_tokens") match {
      case JArray(items) => items.collect {
        case obj: JObject => (obj \ "content") match {
          case JString(s) => s
          case _ => null
        }
      }.filter(_ != null)
      case _ => Seq.empty
    }
    val all = (vocab ++ added).distinct
    require(all.nonEmpty, s"tokenizer.json at $path has no extractable vocab")
    all
  }

  /** Column of [[TokenCounts]] for whitespace-tokenized text under the
    * greedy rule — words split on the engine-wide `[ \t\n\f\r]+` class,
    * NULL text counts as zero. One scan, no shuffle; the per-word
    * segmentation cost is O(len · maxEntryLen) hash probes.
    */
  def tokenCounts(textCol: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty, "tokenCounts needs a non-empty vocabulary")
    val g = new Greedy(vocab.toArray)
    val f = udf { text: String =>
      if (text == null) TokenCounts(0, 0)
      else {
        var tok = 0; var unk = 0
        graft.util.Words.foreach(text) { w =>
          val (t, u) = g.count(w)
          tok += t; unk += u
        }
        TokenCounts(tok, unk)
      }
    }
    f(textCol)
  }

  /** Greedy longest-match token IDS of whitespace-tokenized text:
    * piece → its index in `vocab` (first occurrence wins on
    * duplicates), unknown single code points → `vocab.length`. The
    * id-emitting form of [[tokenCounts]] — what
    * [[graft.ops.Curation.packTokenIds]] consumes to emit actual
    * training examples. Same segmentation walk, same SQL
    * replayability (the c23 oracle extends t14's recursive CTE with
    * an id accumulator). NULL text yields an empty array.
    */
  def greedyIds(textCol: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty, "greedyIds needs a non-empty vocabulary")
    val g = new Greedy(vocab.toArray)
    // first occurrence wins: later duplicates must not steal the id
    val idOf: Map[String, Int] =
      vocab.zipWithIndex.reverse.toMap
    val unk = vocab.length
    val f = udf { text: String =>
      if (text == null) Array.empty[Int]
      else graft.util.Words.iterator(text)
        .flatMap(w => g.pieces(w).iterator.map(p => idOf.getOrElse(p, unk)))
        .toArray
    }
    f(textCol)
  }

  // ------------------------------------------------------------------
  // TRUE BPE inference — merge-rank application, the published
  // byte-pair-encoding algorithm (Sennrich et al. 2016; the same
  // inference loop HuggingFace `tokenizers` runs for BPE models).
  // Unlike the greedy rule above, segmentation depends on the TRAINED
  // MERGE ORDER, so two tokenizers with identical vocabularies can
  // split the same word differently — this is the counter to use when
  // the budget must match a specific trained tokenizer exactly.
  // Not ANSI-SQL-expressible; gated via stored-expected-columns
  // (t22_bpe_tokens: expectations hand-derived from the paper's
  // algorithm over a published example merge table).
  // ------------------------------------------------------------------

  /** Merge-rank BPE encoder. `merges` is the trained merge table in
    * rank order (index = priority, lower wins). Inference per word:
    * start from code-point symbols; repeatedly find the adjacent
    * symbol pair with the LOWEST merge rank and fuse every
    * left-to-right non-overlapping occurrence of that pair; stop when
    * no adjacent pair is in the table. A final symbol absent from the
    * vocabulary counts as unknown (byte-level BPE models never produce
    * one; character-level models can).
    *
    * Rank map and vocab set rebuild lazily per executor after closure
    * deserialization (same pattern as [[Greedy]]); merge tables are
    * tokenizer-sized (~50k pairs ≈ 1 MB), task-binary scale.
    */
  final class BpeEncoder(vocab: Array[String],
                         merges: Array[(String, String)]) extends Serializable {
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](math.max(16, merges.length * 2))
      var i = 0
      while (i < merges.length) {
        // "\u0000"-joined pair key: tokens never contain NUL
        val k = merges(i)._1 + "\u0000" + merges(i)._2
        if (!m.containsKey(k)) m.put(k, i) // first (lowest) rank wins
        i += 1
      }
      m
    }
    @transient private lazy val vocabSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](math.max(16, vocab.length * 2))
      vocab.foreach(s.add)
      s
    }

    /** Final BPE symbols of one word (code-point start symbols). */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      // split into code points
      var syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < word.length) {
        val n = Character.charCount(word.codePointAt(pos))
        syms += word.substring(pos, pos + n)
        pos += n
      }
      var done = syms.length < 2
      while (!done) {
        // lowest-rank adjacent pair present in the merge table
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + "\u0000" + syms(i + 1))
          if (r != null && r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          val fused = a + b
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              next += fused; j += 2 // non-overlapping, left to right
            } else { next += syms(j); j += 1 }
          }
          syms = next
          done = syms.length < 2
        }
      }
      syms.toArray
    }

    /** (tokens, unknowns) for one word under merge-rank BPE. */
    def count(word: String): (Int, Int) = {
      val syms = encodeWord(word)
      var unk = 0
      var i = 0
      while (i < syms.length) {
        if (!vocabSet.contains(syms(i))) unk += 1
        i += 1
      }
      (syms.length, unk)
    }
  }

  /** Load the merge table from a HuggingFace-format `tokenizer.json`:
    * `model.merges` as an array of `"a b"` strings (classic form) or
    * `["a", "b"]` pair arrays (current form). Order in the file IS the
    * rank order. Fails loud on a merge-free file — running merge-rank
    * BPE with zero merges would silently bill every character as one
    * token.
    */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(fsPath), s"tokenizer.json not found at $path")
    val text = {
      val in = fs.open(fsPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val merges: Seq[(String, String)] = (JsonMethods.parse(text) \ "model" \ "merges") match {
      case JArray(items) => items.collect {
        case JString(s) if s.indexOf(' ') > 0 =>
          val i = s.indexOf(' ')
          (s.substring(0, i), s.substring(i + 1))
        case JArray(JString(a) :: JString(b) :: Nil) => (a, b)
      }
      case _ => Seq.empty
    }
    require(merges.nonEmpty, s"tokenizer.json at $path has no extractable merges")
    merges
  }

  /** Array-of-tokens column for whitespace-tokenized text under
    * merge-rank BPE — the full segmentation, for gates and debugging.
    * NULL text yields an empty array. One scan, no shuffle.
    */
  def bpeTokens(textCol: Column, vocab: Seq[String],
                merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeTokens needs a non-empty merge table")
    val enc = new BpeEncoder(vocab.toArray, merges.toArray)
    val f = udf { text: String =>
      if (text == null) Array.empty[String]
      else graft.util.Words.iterator(text).flatMap(enc.encodeWord).toArray
    }
    f(textCol)
  }

  /** Column of [[TokenCounts]] under merge-rank BPE — the
    * trained-tokenizer-exact analogue of [[tokenCounts]].
    */
  def bpeTokenCounts(textCol: Column, vocab: Seq[String],
                     merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "bpeTokenCounts needs a non-empty merge table")
    val enc = new BpeEncoder(vocab.toArray, merges.toArray)
    val f = udf { text: String =>
      if (text == null) TokenCounts(0, 0)
      else {
        var tok = 0; var unk = 0
        graft.util.Words.foreach(text) { w =>
          val (t, u) = enc.count(w)
          tok += t; unk += u
        }
        TokenCounts(tok, unk)
      }
    }
    f(textCol)
  }

  // ------------------------------------------------------------------
  // BPE TRAINING (Sennrich et al. 2016 §3.2) — learn the merge table
  // from the corpus itself, the tokenizer-fitting half of a training-
  // data pipeline. Spark does what scales (the word-type count — ONE
  // aggregate over the corpus, the only full-data pass); the merge
  // loop runs on the counted word TYPES, which are vocabulary-scale,
  // not corpus-scale (capped by `maxWordTypes`, fail-loud), exactly
  // how the published trainers operate.
  // ------------------------------------------------------------------

  final case class BpeModel(vocab: Seq[String],
                            merges: Seq[(String, String)])

  /** Learn `numMerges` BPE merges from whitespace words of `textCol`.
    *
    * Determinism contract: the next merge is the pair with the highest
    * weighted count, ties broken by LEXICOGRAPHIC pair order — so the
    * result is identical across runs, partitionings and retries
    * (insertion-order tie-breaks, the other published choice, are
    * partition-order-dependent in a distributed count).
    *
    * `endOfWord` (e.g. `"</w>"`) appends the paper's word-boundary
    * symbol so merges can learn suffixes; `minWordFreq` drops hapax
    * noise before the loop. Fewer than `numMerges` merges return when
    * pairs run dry.
    */
  def learnBpe(df: DataFrame, textCol: String, numMerges: Int,
               minWordFreq: Long = 1L, maxWordTypes: Int = 1 << 20,
               endOfWord: Option[String] = None): BpeModel = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(minWordFreq >= 1, s"minWordFreq must be ≥ 1: $minWordFreq")
    endOfWord.foreach(m => require(m.nonEmpty, "endOfWord must be non-empty"))
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val types = df.select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minWordFreq)
      .collect()
    require(types.length <= maxWordTypes,
      s"${types.length} word types exceed maxWordTypes=$maxWordTypes — " +
        "raise the cap or minWordFreq")
    // driver-side loop over word TYPES with an inverted pair→words
    // index, so each merge touches only the words containing its pair
    val words: Array[Array[String]] = types.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val n = Character.charCount(w.codePointAt(pos))
        syms += w.substring(pos, pos + n)
        pos += n
      }
      endOfWord.foreach(syms += _)
      syms.toArray
    }
    val freq: Array[Long] = types.map(_.getLong(1))
    val baseVocab = words.iterator.flatten.toSet

    val pairCount = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freq(i)
        if (c <= 0L) { pairCount.remove(p); pairWords.remove(p) }
        else {
          pairCount(p) = c
          if (sign > 0)
            pairWords.getOrElseUpdate(p,
              scala.collection.mutable.HashSet.empty) += i
        }
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    var round = 0
    while (round < numMerges && pairCount.nonEmpty) {
      // max count, ties lexicographic — a full scan of the pair map
      // (vocabulary-scale) keeps the tie-break exact
      var best: (String, String) = null
      var bestC = 0L
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
          { best = p; bestC = c }
      }
      if (best == null) { round = numMerges }
      else {
        merges += best
        merged += best._1 + best._2
        val touched = pairWords.getOrElse(best, Set.empty[Int]).toArray
        touched.foreach { i =>
          addWord(i, -1L) // retract old pair contributions
          val s = words(i)
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
              next += best._1 + best._2; j += 2
            } else { next += s(j); j += 1 }
          }
          words(i) = next.toArray
          addWord(i, 1L)
        }
        round += 1
      }
    }
    BpeModel((baseVocab.toSeq.sorted ++ merged).distinct,
      merges.toSeq)
  }

  /** Write a [[BpeModel]] as a HuggingFace-shape `tokenizer.json`
    * ([[loadVocab]]/[[loadMerges]] read it back — the learn→save→load→
    * count loop closes). Merges use the current pair-array form.
    */
  def saveTokenizerJson(spark: SparkSession, model: BpeModel,
                        path: String): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json =
      ("model" ->
        ("type" -> "BPE") ~
          ("vocab" -> org.json4s.JObject(
            model.vocab.zipWithIndex.map { case (t, i) =>
              t -> org.json4s.JInt(i)
            }.toList)) ~
          ("merges" -> model.merges.map { case (a, b) => Seq(a, b) }))
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(fsPath, true)
    try out.write(JsonMethods.compact(JsonMethods.render(json))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // ------------------------------------------------------------------
  // Byte-level BPE (the GPT-2 family: Radford et al. 2019 §2.2, and
  // every tokenizer.json whose pre_tokenizer is ByteLevel). Real
  // trained tokenizers operate on UTF-8 BYTES remapped to printable
  // code points, after a regex pre-tokenization — whitespace-splitting
  // (bpeTokens above) approximates; this is the faithful path, so
  // token budgets priced against a GPT-2-class tokenizer are exact.
  // ------------------------------------------------------------------

  /** The published byte↔unicode bijection (`bytes_to_unicode`):
    * printable latin bytes (33–126, 161–172, 174–255) map to
    * themselves; the remaining 68 bytes map to 256+n in ascending
    * order — space (32) → U+0120 'Ġ', newline (10) → U+010A 'Ċ' —
    * every byte one BMP char, reversible.
    */
  private[ops] val byteToChar: Array[Char] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** One pre-token → its byte-level symbol string (UTF-8 bytes through
    * the map). Every symbol is one BMP char, so [[BpeEncoder]]'s
    * code-point splitter sees exactly the byte symbols.
    */
  private[ops] def byteLevelMap(pretoken: String): String = {
    val bytes = pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** GPT-2's pre-tokenization regex, verbatim (contractions, optional
    * leading space glued to letter/number/punct runs, the
    * `\s+(?!\S)` rule that leaves the LAST space of a run attached to
    * the following word). Java regex supports every construct used.
    */
  private[ops] val byteLevelPretokenRe: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  private[ops] def byteLevelPretokenize(text: String): Iterator[String] =
    new Iterator[String] {
      private val m = byteLevelPretokenRe.matcher(text)
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = {
        val s = m.group(); has = m.find(); s
      }
    }

  /** Array-of-tokens column under BYTE-LEVEL merge-rank BPE: GPT-2
    * pre-tokenization → UTF-8-byte symbol mapping → merge loop. The
    * trained-tokenizer-faithful segmentation (merges and vocab must
    * come from a byte-level tokenizer.json — their symbols live in the
    * mapped space, e.g. `Ġthe`). NULL text yields an empty array.
    */
  def byteLevelBpeTokens(textCol: Column, vocab: Seq[String],
                         merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "byteLevelBpeTokens needs a non-empty merge table")
    val enc = new BpeEncoder(vocab.toArray, merges.toArray)
    val f = udf { text: String =>
      if (text == null) Array.empty[String]
      else byteLevelPretokenize(text)
        .flatMap(p => enc.encodeWord(byteLevelMap(p))).toArray
    }
    f(textCol)
  }

  /** Inverse of [[byteToChar]]: BMP symbol char → original byte. Chars
    * outside the bijection map to -1 (callers decide; decode skips —
    * it can only happen on tokens that never came from this encoder).
    */
  private[ops] val charToByte: Array[Int] = {
    val arr = Array.fill(0x200)(-1)
    var b = 0
    while (b < 256) { arr(byteToChar(b).toInt) = b; b += 1 }
    arr
  }

  /** Detokenize byte-level BPE tokens: concatenate the symbol strings,
    * map each symbol char back through the byte↔unicode bijection, and
    * UTF-8-decode. LOSSLESS inverse of [[byteLevelBpeTokens]] for any
    * input text: pre-tokenization partitions the text exactly and the
    * merge loop's output concatenates back to the mapped word, so
    * `decode(encode(t)) == t` — the byte-level guarantee that makes a
    * GPT-2-class tokenizer safe to round-trip training text through
    * (no unk collapse, no normalization drift). Works for ANY merge
    * table, trained or truncated: unknown final symbols are still
    * symbol strings. Empty array (NULL text upstream) decodes to "".
    */
  def byteLevelDecodeString(tokens: Seq[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    tokens.foreach { tok =>
      var i = 0
      while (i < tok.length) {
        val c = tok.charAt(i).toInt
        val b = if (c < 0x200) charToByte(c) else -1
        if (b >= 0) bos.write(b)
        i += 1
      }
    }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Column form of [[byteLevelDecodeString]]. */
  def byteLevelDecode(tokensCol: Column): Column = {
    val f = udf { tokens: Seq[String] =>
      if (tokens == null) "" else byteLevelDecodeString(tokens)
    }
    f(tokensCol)
  }

  /** [[TokenCounts]] column under byte-level merge-rank BPE. Unknowns
    * are final symbols absent from the vocab — rare for a real
    * byte-level vocab (the 256 byte symbols are normally all present),
    * so a nonzero count flags a truncated or mismatched vocab file.
    */
  def byteLevelBpeTokenCounts(textCol: Column, vocab: Seq[String],
                              merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty,
      "byteLevelBpeTokenCounts needs a non-empty merge table")
    val enc = new BpeEncoder(vocab.toArray, merges.toArray)
    val f = udf { text: String =>
      if (text == null) TokenCounts(0, 0)
      else {
        var tok = 0; var unk = 0
        byteLevelPretokenize(text).foreach { p =>
          val (t, u) = enc.count(byteLevelMap(p))
          tok += t; unk += u
        }
        TokenCounts(tok, unk)
      }
    }
    f(textCol)
  }

  // ------------------------------------------------------------------
  // Unigram-LM tokenization (Kudo 2018, arXiv:1804.10959 — the
  // SentencePiece "Unigram" model type). Unlike BPE's merge replay,
  // segmentation is GLOBAL per word: the piece sequence maximizing the
  // sum of trained piece log-probabilities, found by Viterbi DP over
  // code-point positions. Two tokenizers with the same piece set but
  // different scores segment differently — the counterpart caveat to
  // BPE's merge-order sensitivity.
  //
  // Not ANSI-SQL-expressible (a DP over string positions); gated via
  // the stored-expected-columns pattern (t28_unigram_tokens:
  // expectations hand-derived by tracing the DP on paper, derivation
  // in the fixture writer).
  // ------------------------------------------------------------------

  /** Viterbi encoder over a trained `(piece, logProb)` table.
    * Single code points the model does NOT know fall back to a
    * synthetic one-symbol piece scored `unkScore`; known pieces are
    * always priced at their model score, however low — the fallback
    * never subsidizes an in-vocabulary path.
    *
    * Determinism: candidate pieces at each end position are scanned
    * from the LONGEST start backwards and replace the incumbent only
    * on a STRICTLY better score, so ties break to the longest piece
    * ending at that position (then recursively to the longest at its
    * predecessor) — matching SentencePiece's observable preference for
    * fewer pieces on score ties.
    *
    * Scores ride the closure like the BPE tables (~1 MB per 50k
    * pieces, task-binary scale); the hash map rebuilds lazily per
    * executor after deserialization.
    */
  final class UnigramEncoder(pieces: Array[(String, Double)],
                             unkScore: Double) extends Serializable {
    require(pieces.nonEmpty, "unigram model needs at least one piece")
    @transient private lazy val score: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](
        math.max(16, pieces.length * 2))
      pieces.foreach { case (p, s) =>
        if (p.nonEmpty && !m.containsKey(p)) m.put(p, s) // first wins
      }
      m
    }
    @transient private lazy val maxLen: Int =
      pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max

    /** Optimal piece sequence of one word (never empty for a
      * non-empty word: the unk fallback always offers a path).
      */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      // code-point symbol boundaries (one emoji = one symbol)
      val bounds = scala.collection.mutable.ArrayBuffer(0)
      var pos = 0
      while (pos < word.length) {
        pos += Character.charCount(word.codePointAt(pos))
        bounds += pos
      }
      val n = bounds.length - 1 // symbols
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val from = new Array[Int](n + 1)
      val piece = new Array[String](n + 1)
      best(0) = 0.0
      var j = 1
      while (j <= n) {
        // longest candidate first; strict > keeps it on ties
        var i = math.max(0, j - maxLen)
        while (i < j) {
          val cand = word.substring(bounds(i), bounds(j))
          val sc = score.get(cand)
          if (sc != null && best(i) + sc > best(j)) {
            best(j) = best(i) + sc; from(j) = i; piece(j) = cand
          }
          i += 1
        }
        // unk fallback: single code point at fixed penalty — ONLY for
        // code points the model does not know. A known single must be
        // priced at its model score even when that score is below
        // unkScore, or the fallback would quietly subsidize
        // spell-it-out paths and break the global-optimum contract
        // (SentencePiece prices unk only for out-of-vocab symbols).
        val single = word.substring(bounds(j - 1), bounds(j))
        if (!score.containsKey(single) &&
            best(j - 1) + unkScore > best(j)) {
          best(j) = best(j - 1) + unkScore
          from(j) = j - 1
          piece(j) = single
        }
        j += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var k = n
      while (k > 0) { out += piece(k); k = from(k) }
      out.reverseIterator.toArray
    }

    /** (tokens, unknowns) of one word — unknowns are the positions the
      * unk fallback served (piece absent from the score table).
      */
    def count(word: String): (Int, Int) = {
      val toks = encodeWord(word)
      var unk = 0
      var i = 0
      while (i < toks.length) {
        if (!score.containsKey(toks(i))) unk += 1
        i += 1
      }
      (toks.length, unk)
    }
  }

  /** Load a Unigram model from a HuggingFace/SentencePiece-format
    * `tokenizer.json`: `model.vocab` as `[["piece", score], …]` pair
    * arrays. File order is preserved (first entry wins duplicate
    * pieces, like the encoder).
    */
  def loadUnigram(spark: SparkSession, path: String): Seq[(String, Double)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(fsPath), s"tokenizer.json not found at $path")
    val text = {
      val in = fs.open(fsPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val pieces: Seq[(String, Double)] =
      (JsonMethods.parse(text) \ "model" \ "vocab") match {
        case JArray(items) => items.collect {
          case JArray(JString(p) :: JDouble(sc) :: Nil) => (p, sc)
          case JArray(JString(p) :: JInt(sc) :: Nil) => (p, sc.toDouble)
        }
        case _ => Seq.empty
      }
    require(pieces.nonEmpty,
      s"tokenizer.json at $path has no extractable unigram vocab")
    pieces
  }

  /** Write a Unigram model as tokenizer.json (`model.type` =
    * "Unigram", `model.vocab` = [piece, score] pairs in order) — the
    * round-trip partner of [[loadUnigram]].
    */
  def saveUnigramJson(spark: SparkSession, pieces: Seq[(String, Double)],
                      path: String): Unit = {
    require(pieces.nonEmpty, "refusing to write an empty unigram model")
    import org.json4s._
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json =
      ("model" ->
        ("type" -> "Unigram") ~
          ("vocab" -> JArray(pieces.toList.map { case (p, sc) =>
            JArray(List(JString(p), JDouble(sc)))
          })))
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(fsPath, true)
    try out.write(JsonMethods.compact(JsonMethods.render(json))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Array-of-pieces column: whitespace words each Viterbi-segmented.
    * NULL text yields an empty array. One scan, no shuffle.
    */
  def unigramTokens(textCol: Column, pieces: Seq[(String, Double)],
                    unkScore: Double = -20.0): Column = {
    val enc = new UnigramEncoder(pieces.toArray, unkScore)
    val f = udf { text: String =>
      if (text == null) Array.empty[String]
      else graft.util.Words.iterator(text).flatMap(enc.encodeWord).toArray
    }
    f(textCol)
  }

  /** Column of [[TokenCounts]] under the unigram model — the
    * budget-pricing counter for SentencePiece-class tokenizers.
    */
  def unigramTokenCounts(textCol: Column, pieces: Seq[(String, Double)],
                         unkScore: Double = -20.0): Column = {
    val enc = new UnigramEncoder(pieces.toArray, unkScore)
    val f = udf { text: String =>
      if (text == null) TokenCounts(0, 0)
      else {
        var tok = 0; var unk = 0
        graft.util.Words.foreach(text) { w =>
          val (t, u) = enc.count(w)
          tok += t; unk += u
        }
        TokenCounts(tok, unk)
      }
    }
    f(textCol)
  }

  // ------------------------------------------------------------------
  // UNIGRAM TRAINING (Kudo 2018 §3.2) — the Viterbi-EM variant: the
  // E-step uses the 1-best segmentation (hard counts) instead of the
  // full lattice forward-backward. Documented simplification: with a
  // peaked unigram model the 1-best path carries almost all lattice
  // mass, and the hard variant is deterministic and hand-derivable
  // (the t29 gate traces it on paper); the published trainer's
  // soft-EM refines the same fixed point.
  //
  // Spark does what scales — the word-type count is ONE aggregate over
  // the corpus, the only full-data pass (the learnBpe split). Seeding,
  // EM and pruning run over word TYPES (vocabulary-scale, capped
  // fail-loud), exactly where SentencePiece's trainer operates.
  // ------------------------------------------------------------------

  /** Learn a unigram-LM piece vocabulary.
    *
    * Seed: every substring of the word types up to `maxPieceLen` code
    * points, counted with word-frequency weights (occurrence
    * multiplicity included); capped at `maxSeedPieces` by
    * (count desc, piece asc), single code points always kept — they
    * guarantee every word stays encodable. Then `emIters` rounds of:
    *
    *  1. E: Viterbi-segment each word type under the current scores
    *     ([[UnigramEncoder]]), accumulate frequency-weighted piece
    *     counts;
    *  2. prune: drop multi-symbol pieces the E-step never used; if
    *     still above `vocabSize`, keep the top
    *     `max(vocabSize, ⌈|v|·shrink⌉)` by (count desc, piece asc) —
    *     single code points are never pruned;
    *  3. M: re-score `ln(count / Σcount)` with counts floored at 0.5
    *     (unused singles must stay finite or coverage dies).
    *
    * Everything is deterministic: ties break lexicographically, sums
    * run in sorted piece order. Returns pieces as (piece, logProb)
    * sorted by (count desc, piece asc) of the final E-step — ready for
    * [[saveUnigramJson]] / [[unigramTokens]].
    */
  def learnUnigram(df: DataFrame, textCol: String, vocabSize: Int,
                   maxPieceLen: Int = 4, emIters: Int = 4,
                   shrink: Double = 0.75, minWordFreq: Long = 1L,
                   maxWordTypes: Int = 1 << 20,
                   maxSeedPieces: Int = 1 << 22,
                   unkScore: Double = -30.0): Seq[(String, Double)] = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be ≥ 1: $maxPieceLen")
    require(emIters >= 1, s"emIters must be ≥ 1: $emIters")
    require(shrink > 0 && shrink <= 1, s"shrink must be in (0,1]: $shrink")
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val types = df.select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minWordFreq)
      .collect()
    require(types.nonEmpty, "corpus has no words to train on")
    require(types.length <= maxWordTypes,
      s"${types.length} word types exceed maxWordTypes=$maxWordTypes — " +
        "raise the cap or minWordFreq")
    val words: Array[String] = types.map(_.getString(0))
    val freq: Array[Long] = types.map(_.getLong(1))

    // code-point boundaries per word, shared by seeding and the E-step
    val bounds: Array[Array[Int]] = words.map { w =>
      val b = scala.collection.mutable.ArrayBuffer(0)
      var pos = 0
      while (pos < w.length) {
        pos += Character.charCount(w.codePointAt(pos)); b += pos
      }
      b.toArray
    }

    // ---- seed: weighted substring counts up to maxPieceLen ----------
    val seedCount = scala.collection.mutable.HashMap.empty[String, Long]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val b = bounds(wi); val n = b.length - 1
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j <= math.min(n, i + maxPieceLen)) {
          val piece = w.substring(b(i), b(j))
          seedCount(piece) = seedCount.getOrElse(piece, 0L) + freq(wi)
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    val isSingle: String => Boolean =
      p => p.codePointCount(0, p.length) == 1
    val seed: Seq[(String, Long)] = {
      val all = seedCount.toSeq.sortBy { case (p, c) => (-c, p) }
      if (all.length <= maxSeedPieces) all
      else {
        val (singles, multis) = all.partition(e => isSingle(e._1))
        singles ++ multis.take(math.max(0, maxSeedPieces - singles.length))
      }
    }

    // ---- EM ---------------------------------------------------------
    def rescore(counts: Seq[(String, Long)]): Seq[(String, Double)] = {
      val smoothed = counts.map { case (p, c) => (p, math.max(c, 0L)) }
      val total = smoothed.iterator.map { case (_, c) =>
        math.max(c.toDouble, 0.5) }.sum
      smoothed.map { case (p, c) =>
        (p, math.log(math.max(c.toDouble, 0.5) / total)) }
    }
    var model: Seq[(String, Double)] = rescore(seed)
    var finalCounts: Map[String, Long] = seed.toMap
    var iter = 0
    while (iter < emIters) {
      val enc = new UnigramEncoder(model.toArray, unkScore)
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      var k = 0
      while (k < words.length) {
        enc.encodeWord(words(k)).foreach { p =>
          used(p) = used.getOrElse(p, 0L) + freq(k)
        }
        k += 1
      }
      // prune: unused multi-symbol pieces go; singles always stay
      var kept: Seq[(String, Long)] = model.map(_._1)
        .map(p => (p, used.getOrElse(p, 0L)))
        .filter { case (p, c) => c > 0L || isSingle(p) }
        .sortBy { case (p, c) => (-c, p) }
      if (kept.length > vocabSize) {
        val target = math.max(vocabSize, math.ceil(kept.length * shrink).toInt)
        val (singles, multis) = kept.partition(e => isSingle(e._1))
        kept = (singles ++ multis.take(math.max(0, target - singles.length)))
          .sortBy { case (p, c) => (-c, p) }
      }
      finalCounts = kept.toMap
      model = rescore(kept)
      iter += 1
    }
    model.sortBy { case (p, _) => (-finalCounts.getOrElse(p, 0L), p) }
  }

  // ------------------------------------------------------------------
  // WordPiece (the BERT tokenizer family: Wu et al. 2016 §4.1; the
  // greedy longest-match-first inference described in Devlin et al.
  // 2019 and implemented by HuggingFace `tokenizers`' WordPiece
  // model). Differs from the plain greedy rule above in two ways that
  // change budgets materially: continuation pieces carry a "##"
  // prefix (so "able" and "##able" are distinct vocabulary entries),
  // and a word with ANY unmatchable position becomes ONE [UNK] token
  // — partial segmentations are discarded, not patched per-character.
  // ------------------------------------------------------------------

  /** Greedy longest-match-first WordPiece segmenter. Matching is
    * CODE-POINT based (positions, lengths and the `maxInputChars`
    * guard all count code points) so the per-word walk is replayable
    * in character-semantics SQL (`substr`/`len`) and supplementary
    * characters are one unit, not two.
    *
    * `maxInputChars` mirrors BERT's `max_input_chars_per_word`: longer
    * words are [UNK] without probing (a 10k-char DNA string would
    * otherwise cost O(len·maxPiece) hash probes per word).
    */
  final class WordPieceEncoder(vocab: Array[String],
                               maxInputChars: Int = 200)
      extends Serializable {
    require(maxInputChars > 0,
      s"maxInputChars must be positive: $maxInputChars")
    require(!vocab.contains("##"),
      "bare '##' vocab entry matches zero characters (infinite loop)")
    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](math.max(16, vocab.length * 2))
      vocab.foreach(s.add)
      s
    }
    // longest INPUT span any piece can match, in code points
    @transient private lazy val maxPieceCp: Int =
      if (vocab.isEmpty) 0
      else vocab.iterator.map { v =>
        val body = if (v.startsWith("##")) v.substring(2) else v
        body.codePointCount(0, body.length)
      }.max

    /** Pieces of one word, or `null` when the word is [UNK] (no match
      * at some position, or over `maxInputChars`). Empty word → empty
      * array.
      */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      // code-point split (same walk as the BPE symbolizer)
      val cps = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < word.length) {
        val n = Character.charCount(word.codePointAt(pos))
        cps += word.substring(pos, pos + n)
        pos += n
      }
      if (cps.length > maxInputChars) return null
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      while (start < cps.length) {
        var end = math.min(cps.length, start + maxPieceCp)
        var piece: String = null
        while (end > start && piece == null) {
          val body = cps.slice(start, end).mkString
          val cand = if (start > 0) "##" + body else body
          if (set.contains(cand)) piece = cand
          else end -= 1
        }
        if (piece == null) return null
        out += piece
        start = end
      }
      out.toArray
    }
  }

  /** WordPiece piece array of whitespace-tokenized text — `[UNK]` for
    * unmatchable words, NULL text → empty array. The budget/inspection
    * column ([[wordPieceCounts]] is the cheap count-only form).
    */
  def wordPieceTokens(textCol: Column, vocab: Seq[String],
                      unkToken: String = "[UNK]",
                      maxInputChars: Int = 200): Column = {
    require(vocab.nonEmpty, "wordPieceTokens needs a non-empty vocabulary")
    val enc = new WordPieceEncoder(vocab.toArray, maxInputChars)
    val f = udf { text: String =>
      if (text == null) Array.empty[String]
      else graft.util.Words.iterator(text)
        .flatMap { w =>
          val p = enc.encodeWord(w)
          if (p == null) Iterator.single(unkToken) else p.iterator
        }.toArray
    }
    f(textCol)
  }

  /** [[TokenCounts]] under WordPiece: `n_tokens` counts every emitted
    * piece with each [UNK] word as ONE token; `n_unk` counts [UNK]
    * WORDS (the WordPiece unknown unit), not positions.
    */
  def wordPieceCounts(textCol: Column, vocab: Seq[String],
                      maxInputChars: Int = 200): Column = {
    require(vocab.nonEmpty, "wordPieceCounts needs a non-empty vocabulary")
    val enc = new WordPieceEncoder(vocab.toArray, maxInputChars)
    val f = udf { text: String =>
      if (text == null) TokenCounts(0, 0)
      else {
        var tok = 0; var unk = 0
        graft.util.Words.foreach(text) { w =>
          val p = enc.encodeWord(w)
          if (p == null) { tok += 1; unk += 1 } else tok += p.length
        }
        TokenCounts(tok, unk)
      }
    }
    f(textCol)
  }

  /** Learn a WordPiece vocabulary (the HuggingFace `tokenizers`
    * WordPiece trainer: BPE's merge loop, but the next merge maximizes
    * `count(a,b) / (count(a) · count(b))` — the pair whose fusion most
    * raises corpus likelihood under a unigram-over-symbols model, per
    * the original Schuster & Nakajima 2012 formulation). Word types
    * symbolize as first-char + "##"-prefixed continuations; merging
    * `(a, ##b)` yields `a·b` (the "##" interior marker drops), so
    * learned pieces carry word-boundary information the way BERT
    * vocabularies do.
    *
    * Determinism contract (same as [[learnBpe]]): scores compare by
    * EXACT integer cross-multiplication (`BigInt` — no float ties),
    * ties break lexicographically, so the result is stable across
    * runs, partitionings and retries. Returns the vocabulary:
    * base symbols (sorted) then merged pieces in merge order; callers
    * prepend specials ([UNK], [CLS], …) themselves.
    */
  def learnWordPiece(df: DataFrame, textCol: String, numMerges: Int,
                     minWordFreq: Long = 1L,
                     maxWordTypes: Int = 1 << 20): Seq[String] = {
    require(numMerges >= 0, s"numMerges must be non-negative: $numMerges")
    require(minWordFreq >= 1, s"minWordFreq must be ≥ 1: $minWordFreq")
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))
    val types = df.select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minWordFreq)
      .collect()
    require(types.length <= maxWordTypes,
      s"${types.length} word types exceed maxWordTypes=$maxWordTypes — " +
        "raise the cap or minWordFreq")
    val words: Array[Array[String]] = types.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val n = Character.charCount(w.codePointAt(pos))
        val cp = w.substring(pos, pos + n)
        syms += (if (pos == 0) cp else "##" + cp)
        pos += n
      }
      syms.toArray
    }
    val freq: Array[Long] = types.map(_.getLong(1))
    val baseVocab = words.iterator.flatten.toSet

    // pair counts, symbol counts, and the inverted pair→words index —
    // all maintained incrementally, so each merge touches only the
    // word types containing its pair
    val pairCount = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    val symCount = scala.collection.mutable.HashMap.empty[String, Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length) {
        val c = symCount.getOrElse(s(j), 0L) + sign * freq(i)
        if (c <= 0L) symCount.remove(s(j)) else symCount(s(j)) = c
        if (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          val pc = pairCount.getOrElse(p, 0L) + sign * freq(i)
          if (pc <= 0L) { pairCount.remove(p); pairWords.remove(p) }
          else {
            pairCount(p) = pc
            if (sign > 0)
              pairWords.getOrElseUpdate(p,
                scala.collection.mutable.HashSet.empty) += i
          }
        }
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    var round = 0
    while (round < numMerges && pairCount.nonEmpty) {
      // argmax of count(a,b)/(count(a)·count(b)) by exact
      // cross-multiplication; ties lexicographic
      var best: (String, String) = null
      var bestNum = BigInt(0) // c_best
      var bestDen = BigInt(1) // s_a · s_b for best
      pairCount.foreach { case (p, c) =>
        val den = BigInt(symCount(p._1)) * BigInt(symCount(p._2))
        val num = BigInt(c)
        val cmp =
          if (best == null) 1
          else (num * bestDen).compare(bestNum * den)
        if (cmp > 0 || (cmp == 0 && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestNum = num; bestDen = den
        }
      }
      if (best == null) round = numMerges
      else {
        val fused = best._1 + best._2.stripPrefix("##")
        merged += fused
        val touched = pairWords.getOrElse(best, Set.empty[Int]).toArray
        touched.foreach { i =>
          addWord(i, -1L)
          val s = words(i)
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
              next += fused; j += 2
            } else { next += s(j); j += 1 }
          }
          words(i) = next.toArray
          addWord(i, 1L)
        }
        round += 1
      }
    }
    (baseVocab.toSeq.sorted ++ merged).distinct
  }
}
