package graft.ops

import scala.collection.mutable

/** Aho-Corasick multi-pattern substring matcher (Aho & Corasick 1975)
  * — the scale path for term blocklists. [[Curation.blockedTermFlag]]
  * folds each phrase into the expression tree and therefore caps at
  * ~1k terms; real crawl blocklists (UT1-class) run 10⁵–10⁶ entries.
  * The automaton scans the text ONCE regardless of list size: build is
  * O(Σ|term|) on the driver, match is O(|text| + hits) per row, and
  * the frozen automaton ships to executors inside the task closure
  * (Torrent-broadcast once per stage, like the langid profiles).
  *
  * Representation: per-node sorted char/child parallel arrays (binary
  * search transitions — compact and directly serializable, no per-node
  * hash maps in the shipped form), BFS failure links, and output lists
  * pre-merged through the failure chain so matching never walks it.
  *
  * Memory is O(total pattern chars): ~10⁶ nodes for a 10⁵-term list —
  * tens of MB frozen, fine to broadcast. Lists beyond ~10⁶ entries
  * should split: single WORDS through a hashed-token equi-join
  * (the [[Curation.dropBlockedDomains]] shape), only PHRASES through
  * the automaton.
  */
final class AhoCorasick private (
    childChars: Array[Array[Char]],
    childIdx: Array[Array[Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val patterns: Array[String]) extends Serializable {

  /** Number of trie nodes (diagnostics / size guards). */
  def nodes: Int = fail.length

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val i = java.util.Arrays.binarySearch(childChars(s), c)
      if (i >= 0) return childIdx(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Distinct patterns occurring in `text` as substrings, sorted. */
  def matchedPatterns(text: String): Array[String] = {
    if (text == null) return Array.empty
    val hits = new java.util.TreeSet[String]()
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      val o = out(s)
      var j = 0
      while (j < o.length) { hits.add(patterns(o(j))); j += 1 }
      i += 1
    }
    hits.toArray(new Array[String](0))
  }

  /** True iff any pattern occurs — early-exits on the first hit. */
  def anyMatch(text: String): Boolean = {
    if (text == null) return false
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      if (out(s).length > 0) return true
      i += 1
    }
    false
  }

  /** Every (startOffset, pattern) occurrence — the redaction-oriented
    * variant. Ordered by END offset (the scan position); occurrences
    * ending at the same position come out in pattern order.
    */
  def occurrences(text: String): Seq[(Int, String)] = {
    if (text == null) return Nil
    val b = Seq.newBuilder[(Int, String)]
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      val o = out(s)
      var j = 0
      while (j < o.length) {
        val p = patterns(o(j))
        b += ((i - p.length + 1, p))
        j += 1
      }
      i += 1
    }
    b.result()
  }
}

object AhoCorasick {

  /** Build over the given patterns verbatim (no normalization — the
    * term-blocking entry point is [[Curation.blockedTermsMatched]],
    * which normalizes and pads). Empty patterns are rejected,
    * duplicates collapse.
    */
  def build(patterns0: Seq[String]): AhoCorasick = {
    val patterns = patterns0.distinct.toArray
    require(patterns.nonEmpty, "pattern list must be non-empty")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "patterns must be non-empty strings")

    // Mutable trie for the build only; frozen to arrays below.
    val children = mutable.ArrayBuffer(mutable.SortedMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElse(c, {
          children += mutable.SortedMap.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          val nw = children.size - 1
          children(s)(c) = nw
          nw
        })
      }
      outB(s) += pi
    }

    val n = children.size
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, v) => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        // walk u's failure chain for the deepest proper suffix with c
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v)
          children(f)(c) else 0
        outB(v) ++= outB(fail(v)) // pre-merge outputs through the chain
        queue += v
      }
    }

    new AhoCorasick(
      children.map(_.keysIterator.toArray).toArray,
      children.map(_.valuesIterator.toArray).toArray,
      fail,
      outB.map(_.toArray.sorted).toArray,
      patterns)
  }
}
