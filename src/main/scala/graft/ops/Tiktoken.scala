package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** tiktoken vocabulary format reader + encoder — the `.tiktoken`
  * files GPT-class models publish: one `base64(token_bytes) rank`
  * line per token, no separate merge table. Encoding is the
  * published byte-pair-merge-by-rank algorithm: a pre-token's UTF-8
  * bytes start as single-byte segments; repeatedly fuse the adjacent
  * pair whose CONCATENATION is in the vocabulary with the lowest
  * rank, until no adjacent pair concatenates to a known token. The
  * token id IS the rank.
  *
  * Pre-tokenization uses the engine's GPT-2 pattern
  * ([[VocabTokenizer.byteLevelPretokenize]] — the public reference
  * pattern; newer models vary it, which changes SEGMENTATION at some
  * boundaries but never the merge algorithm). Unknown single bytes
  * (absent from the vocab — real model files carry all 256) emit
  * id −1 so the damage is visible, never silent.
  *
  * Scale shape: a vocab is model-sized (100k lines, a few MB) — read
  * once driver-side and broadcast inside the UDF closure, the
  * fastText/SentencePiece precedent. Encoding is a per-row kernel.
  */
object Tiktoken {

  /** One vocab entry: token bytes and its rank (= token id). */
  final case class Entry(bytes: Array[Byte], rank: Int)

  /** Read a `.tiktoken` file: `base64 rank` per line, blank lines and
    * `#` comments tolerated. Fails loud on a malformed data line.
    */
  def load(spark: SparkSession, path: String): Seq[Entry] = {
    val lines = spark.read.textFile(path).collect()
    lines.iterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split("\\s+")
        require(sp.length == 2, s"malformed tiktoken line: '$l'")
        Entry(java.util.Base64.getDecoder.decode(sp(0)), sp(1).toInt)
      }.toSeq
  }

  /** The rank map keyed by token bytes (wrapped for hashing); the
    * entry list serializes into the closure, the map rebuilds lazily
    * per executor.
    */
  final class Encoder(entries: Seq[Entry]) extends Serializable {
    @transient private lazy val ranks: java.util.HashMap[java.nio.ByteBuffer, Integer] = {
      val m = new java.util.HashMap[java.nio.ByteBuffer, Integer](
        entries.size * 2)
      entries.foreach(e => m.put(java.nio.ByteBuffer.wrap(e.bytes), e.rank))
      m
    }
    private def rankOf(b: Array[Byte], from: Int, to: Int): Int = {
      val r = ranks.get(java.nio.ByteBuffer.wrap(b, from, to - from))
      if (r == null) -1 else r.intValue()
    }

    /** Byte-pair merge by rank over ONE pre-token's UTF-8 bytes. */
    def encodePiece(piece: String): Array[Int] = {
      val b = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.isEmpty) return Array.emptyIntArray
      // segment boundaries: starts(i) .. starts(i+1)
      val starts = scala.collection.mutable.ArrayBuffer.range(0, b.length)
      starts += b.length
      var merged = true
      while (merged && starts.length > 2) {
        merged = false
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < starts.length - 2) {
          val r = rankOf(b, starts(i), starts(i + 2))
          if (r >= 0 && r < bestRank) { bestRank = r; best = i }
          i += 1
        }
        if (best >= 0) { starts.remove(best + 1); merged = true }
      }
      val out = new Array[Int](starts.length - 1)
      var i = 0
      while (i < out.length) {
        out(i) = rankOf(b, starts(i), starts(i + 1))
        i += 1
      }
      out
    }

    def encode(text: String): Array[Int] =
      if (text == null) Array.emptyIntArray
      else VocabTokenizer.byteLevelPretokenize(text)
        .flatMap(encodePiece).toArray
  }

  /** Token-id array column under the given vocab. */
  def idsCol(textCol: Column, entries: Seq[Entry]): Column = {
    val enc = new Encoder(entries)
    val f = udf { text: String => enc.encode(text) }
    f(textCol)
  }

  /** Token count column — the budget/packing input. */
  def countCol(textCol: Column, entries: Seq[Entry]): Column = {
    val enc = new Encoder(entries)
    val f = udf { text: String => enc.encode(text).length }
    f(textCol)
  }
}
