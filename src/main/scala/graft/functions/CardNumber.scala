package graft.functions

import java.util.regex.Pattern

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
  * digit-zone scan (regex) + PAN-length filter + Luhn verify + splice,
  * as a static function shared by the interpreted and generated paths
  * (the [[LabelHashBucketUtil]] pattern — no `this` capture, stays
  * inside whole-stage codegen).
  *
  * The candidate pattern is deliberately valid in BOTH Java regex and
  * RE2 (no backreferences or lookarounds; `\b` is the ASCII word
  * boundary in both), so the DuckDB gate oracle extracts the identical
  * candidate set and replays the Luhn arithmetic in SQL.
  */
object CardNumberUtil {

  /** A maximal digit ZONE: digits with at most one space or hyphen per
    * gap, bounded by word boundaries, UNBOUNDED length. The kernel then
    * accepts a zone only when its digit count is in 13–19 (the ISO/IEC
    * 7812 PAN length range) AND the Luhn checksum holds.
    *
    * Zone-then-length-filter (rather than a `{12,18}` bound in the
    * regex) is what keeps longer runs safe: a bounded quantifier would
    * let the engine backtrack a 20-digit grouped run down to a
    * Luhn-valid 16-digit prefix and mangle a serial number, and would
    * bridge two adjacent numbers into one never-valid window while
    * skipping the real PAN inside it. With the unbounded zone, a
    * grouped 20-digit run is consumed WHOLE and rejected by the length
    * filter — never sliced.
    *
    * Documented consequence (the conservative industry rule — DLP
    * scanners bound PANs with digit-free context the same way): a real
    * PAN separated from an adjacent number by a single space/hyphen is
    * part of a >19-digit zone and is deliberately NOT redacted — it is
    * indistinguishable from a longer serial, and mangling non-card
    * data is the worse failure for a training-data pipeline. Text with
    * two-plus-space gaps, punctuation, or words between numbers (the
    * overwhelming norm) redacts normally.
    */
  val candidateRegex: String = "\\b[0-9](?:[ -]?[0-9])*\\b"

  /** Inclusive PAN digit-count bounds applied to each zone. */
  val minDigits = 13
  val maxDigits = 19

  private val candidate = Pattern.compile(candidateRegex)

  private def digitCount(s: String, from: Int, to: Int): Int = {
    var n = 0
    var i = from
    while (i < to) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') n += 1
      i += 1
    }
    n
  }

  private def isCard(s: String, from: Int, to: Int): Boolean = {
    val d = digitCount(s, from, to)
    d >= minDigits && d <= maxDigits && luhnValid(s, from, to)
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

  /** Number of card numbers in `s`: digit zones whose digit count is
    * 13–19 and whose Luhn checksum holds.
    */
  def countValid(s: UTF8String): Int = {
    val str = s.toString
    val m = candidate.matcher(str)
    var n = 0
    while (m.find()) if (isCard(str, m.start, m.end)) n += 1
    n
  }

  /** `s` with every card number (13–19-digit Luhn-valid zone) replaced
    * by `[CARD]`; length- or checksum-failing zones pass through
    * untouched. Returns the input object unchanged (no copy) when
    * nothing validates — the overwhelmingly common row.
    */
  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    val m = candidate.matcher(str)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      if (isCard(str, m.start, m.end)) {
        if (sb == null) sb = new java.lang.StringBuilder(str.length)
        sb.append(str, last, m.start).append("[CARD]")
        last = m.end
      }
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
