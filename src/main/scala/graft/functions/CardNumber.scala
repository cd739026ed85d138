package graft.functions


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-validated payment-card detection.
  *
  * Regex-only card redaction over web text is noise: any 16-digit run —
  * order ids, tracking numbers, timestamps — matches the shape.
  * Real PANs carry a Luhn check digit (ISO/IEC 7812), so validating the
  * checksum before redacting removes ~90% of false positives (a random
  * digit run passes Luhn 1 in 10 times). `regexp_replace` cannot
  * express "replace only if the checksum holds", hence this kernel: a
  * linear digit-zone scan + PAN-length filter + Luhn verify + splice
  * ([[CardNumberUtil.scanCards]]), as a static function shared by the
  * interpreted and generated paths (the [[LabelHashBucketUtil]]
  * pattern — no `this` capture, stays inside whole-stage codegen).
  *
  * [[CardNumberUtil.candidateRegex]] describes the zone shape for the
  * gate query and its DuckDB oracle (valid in both Java regex and RE2
  * — no backreferences or lookarounds, ASCII `\b`); the scanner agrees
  * with it on every word-boundary-clean shape and refines the glued
  * and multi-card cases regex extraction cannot express.
  */
object CardNumberUtil {

  /** The digit-ZONE shape (digits with at most one space or hyphen per
    * gap, word-boundary fenced) as a regex — exported for the gate
    * query and its DuckDB oracle, which count PAN-length zones with
    * the same pattern on both engines. The KERNEL itself does not run
    * this regex: any pattern with a trailing `\b` after a greedy tail
    * can be backtracked into a shorter window on glued inputs (e.g.
    * `"…1111 1111x"` retreats to a Luhn-valid 16-digit slice — the
    * exact mangling the zone rule exists to prevent), so the kernel
    * uses [[scanCards]], a manual linear scanner with no backtracking
    * at all. On word-boundary-clean text (every shape in the gate
    * corpus) the regex and the scanner agree; the scanner additionally
    * rejects glue-tainted zones and partitions multi-card zones —
    * refinements regex extraction cannot express and which the gate
    * fixture deliberately does not exercise.
    */
  val candidateRegex: String = "\\b[0-9](?:[ -]?[0-9])*\\b"

  /** Inclusive PAN digit-count bounds applied to each zone/segment. */
  val minDigits = 13
  val maxDigits = 19

  /** Zones with more digits than this never partition-redact: beyond
    * ~8 concatenated PANs the content is a data dump, not a card list,
    * and the O(groups²) partition search stops being justified.
    */
  private val maxPartitionDigits = 160

  private def isWordChar(ch: Char): Boolean =
    (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'z') ||
      (ch >= 'A' && ch <= 'Z') || ch == '_'

  private def isDigit(ch: Char): Boolean = ch >= '0' && ch <= '9'

  /** Walk every maximal digit zone of `str` and invoke `f(start, end)`
    * for each accepted CARD span. Rules, in order:
    *
    *  1. A zone starts at a digit with no word character before it and
    *     extends through digits and single space/hyphen separators —
    *     consumed maximally, never sliced (no backtracking exists).
    *  2. A zone whose last digit is glued to a word character (serial
    *     tails like `…1111x`) is rejected whole, and the scan resumes
    *     after the glued token.
    *  3. A clean zone with 13–19 digits is a card iff Luhn holds.
    *  4. A clean zone with MORE digits is redacted only when it
    *     partitions completely at separator boundaries into
    *     consecutive 13–19-digit Luhn-valid segments — the
    *     adjacent-cards case (`"<visa> <mastercard>"` emits two
    *     spans); a junk-plus-card zone (`"1234 <visa>"`) has no full
    *     partition and is left alone: indistinguishable from a longer
    *     serial, and mangling non-card data is the worse failure for
    *     a training-data pipeline (the conservative DLP rule). The
    *     partition is deterministic (shortest segments preferred from
    *     the right).
    */
  private def scanCards(str: String)(f: (Int, Int) => Unit): Unit = {
    val len = str.length
    var i = 0
    while (i < len) {
      if (isDigit(str.charAt(i)) &&
          (i == 0 || !isWordChar(str.charAt(i - 1)))) {
        // Walk the zone counting digits and groups in two locals — no
        // allocation. This kernel runs per row over the whole corpus,
        // and ordinary text is dense with small digit zones (years,
        // timestamps, order ids); group BOUNDS are consumed only on
        // the rare partition branch (clean zone longer than a PAN),
        // which re-walks the zone once to collect them.
        var j = i
        var total = 0
        var groups = 1
        var walking = true
        while (walking && j < len) {
          val c = str.charAt(j)
          if (isDigit(c)) { total += 1; j += 1 }
          else if ((c == ' ' || c == '-') && j + 1 < len &&
              isDigit(str.charAt(j + 1))) {
            groups += 1
            j += 1
          } else walking = false
        }
        val zoneEnd = j // sits just past the last digit
        val glued = zoneEnd < len && isWordChar(str.charAt(zoneEnd))
        if (!glued) {
          if (total >= minDigits && total <= maxDigits) {
            if (luhnValid(str, i, zoneEnd)) f(i, zoneEnd)
          } else if (total > maxDigits && total <= maxPartitionDigits &&
              groups > 1) {
            // Re-walk [i, zoneEnd) for group spans: every non-digit
            // char inside a consumed zone is a single separator.
            val starts = scala.collection.mutable.ArrayBuffer[Int]()
            val ends = scala.collection.mutable.ArrayBuffer[Int]()
            var k = i
            var curStart = i
            while (k < zoneEnd) {
              if (isDigit(str.charAt(k))) k += 1
              else { starts += curStart; ends += k; curStart = k + 1; k += 1 }
            }
            starts += curStart; ends += zoneEnd
            partitionZone(str, starts, ends, f)
          }
        }
        i = if (glued) {
          var k = zoneEnd
          while (k < len && isWordChar(str.charAt(k))) k += 1
          k
        } else zoneEnd
      } else i += 1
    }
  }

  /** Rule 4's partition search: groups `g(0)..g(k-1)` must split into
    * consecutive runs, each 13–19 digits and Luhn-valid over its char
    * span. Emits every segment span (in order) iff the WHOLE zone
    * partitions; emits nothing otherwise.
    */
  private def partitionZone(str: String,
                            starts: scala.collection.mutable.ArrayBuffer[Int],
                            ends: scala.collection.mutable.ArrayBuffer[Int],
                            f: (Int, Int) => Unit): Unit = {
    val k = starts.length
    val digitsUpTo = new Array[Int](k + 1) // prefix digit counts
    for (g <- 0 until k)
      digitsUpTo(g + 1) = digitsUpTo(g) + (ends(g) - starts(g))
    val ok = new Array[Boolean](k + 1)
    val parent = new Array[Int](k + 1)
    ok(0) = true
    java.util.Arrays.fill(parent, -1)
    for (j <- 1 to k) {
      var i = j - 1
      while (i >= 0 && !ok(j)) {
        val d = digitsUpTo(j) - digitsUpTo(i)
        if (d > maxDigits) i = -1 // longer segments only get longer: stop
        else {
          if (ok(i) && d >= minDigits &&
              luhnValid(str, starts(i), ends(j - 1))) {
            ok(j) = true
            parent(j) = i
          }
          i -= 1
        }
      }
    }
    if (!ok(k)) return
    // Reconstruct segment bounds back-to-front, emit front-to-back.
    var bounds = List.empty[(Int, Int)]
    var j = k
    while (j > 0) {
      val i = parent(j)
      bounds = (starts(i), ends(j - 1)) :: bounds
      j = i
    }
    bounds.foreach { case (s, e) => f(s, e) }
  }

  /** Luhn checksum over the digits of `s[from, to)`, separators
    * skipped: from the rightmost digit leftward, double every second
    * digit (subtracting 9 past 9) and require the sum ≡ 0 (mod 10).
    */
  def luhnValid(s: String, from: Int, to: Int): Boolean = {
    var sum = 0
    var alt = false
    var i = to - 1
    while (i >= from) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') {
        var d = ch - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** Number of card numbers in `s` under [[scanCards]]' rules (a
    * partitioned multi-card zone counts each segment).
    */
  def countValid(s: UTF8String): Int = {
    val str = s.toString
    var n = 0
    scanCards(str)((_, _) => n += 1)
    n
  }

  /** `s` with every card span from [[scanCards]] replaced by `[CARD]`;
    * everything else passes through untouched. Returns the input
    * object unchanged (no copy) when nothing validates — the
    * overwhelmingly common row.
    */
  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    var sb: java.lang.StringBuilder = null
    var last = 0
    scanCards(str) { (start, end) =>
      if (sb == null) sb = new java.lang.StringBuilder(str.length)
      sb.append(str, last, start).append("[CARD]")
      last = end
    }
    if (sb == null) s
    else UTF8String.fromString(sb.append(str, last, str.length).toString)
  }
}

/** `card_count(text)` — count of Luhn-valid card numbers. NULL in,
  * NULL out (standard null propagation).
  */
case class CardCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"card_count expects a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CardNumberUtil.countValid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CardNumberUtil$$.MODULE$$.countValid($c)")

  override protected def withNewChildInternal(newChild: Expression): CardCount =
    copy(child = newChild)
}

/** `redact_cards(text)` — text with Luhn-valid card numbers replaced by
  * `[CARD]`. NULL in, NULL out.
  */
case class CardRedact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"redact_cards expects a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CardNumberUtil.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CardNumberUtil$$.MODULE$$.redact($c)")

  override protected def withNewChildInternal(newChild: Expression): CardRedact =
    copy(child = newChild)
}

object CardNumber {
  /** Column API: count of Luhn-valid card numbers in `c`. */
  def count(c: Column): Column =
    ExpressionUtils.column(CardCount(ExpressionUtils.expression(c)))

  /** Column API: `c` with Luhn-valid card numbers redacted to `[CARD]`. */
  def redact(c: Column): Column =
    ExpressionUtils.column(CardRedact(ExpressionUtils.expression(c)))
}
