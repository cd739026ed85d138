package graft.util

/** Zero-regex whitespace word iteration for per-row tokenizer kernels.
  *
  * Every tokenizer UDF splits on the engine-wide separator class
  * `[ \t\n\f\r]+`. `String.split` with a multi-char regex compiles a
  * `java.util.regex.Pattern` and allocates a result array PER CALL —
  * per ROW in a UDF — which made the tokenizer kernels the most
  * allocation-heavy per-row code in the engine (and the first victims
  * of GC pressure at high task concurrency in the r17 driver runs).
  * These helpers walk the chars directly: the only allocation is the
  * one substring per emitted word that the consumer needs anyway.
  *
  * Semantics are EXACTLY `text.split("[ \t\n\f\r]+")` with empty
  * strings dropped (the only empty `split` can produce is a leading
  * one, when the text starts with a separator): same word set, same
  * order, for any input.
  */
object Words {

  @inline def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Apply `f` to each non-empty whitespace-separated word of `text`
    * (which must be non-null), in order.
    */
  def foreach(text: String)(f: String => Unit): Unit = {
    val len = text.length
    var i = 0
    while (i < len) {
      while (i < len && isSep(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isSep(text.charAt(i))) i += 1
      if (i > start) f(text.substring(start, i))
    }
  }

  /** Iterator over the non-empty whitespace-separated words of `text`
    * (which must be non-null), in order.
    */
  def iterator(text: String): Iterator[String] = new Iterator[String] {
    private val len = text.length
    private var i = 0
    private def skipSep(): Unit = {
      while (i < len && isSep(text.charAt(i))) i += 1
    }
    skipSep()
    def hasNext: Boolean = i < len
    def next(): String = {
      if (!hasNext) throw new NoSuchElementException("Words.iterator")
      val start = i
      while (i < len && !isSep(text.charAt(i))) i += 1
      val w = text.substring(start, i)
      skipSep()
      w
    }
  }
}
