package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
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
        text.split("[ \\t\\n\\f\\r]+").foreach { w =>
          if (w.nonEmpty) {
            val (t, u) = g.count(w)
            tok += t; unk += u
          }
        }
        TokenCounts(tok, unk)
      }
    }
    f(textCol)
  }
}
