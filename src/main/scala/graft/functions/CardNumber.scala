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
  * candidate scan (regex) + Luhn verify + splice, as a static function
  * shared by the interpreted and generated paths (the
  * [[LabelHashBucketUtil]] pattern — no `this` capture, stays inside
  * whole-stage codegen).
  *
  * The candidate pattern is deliberately valid in BOTH Java regex and
  * RE2 (no backreferences or lookarounds; `\b` is the ASCII word
  * boundary in both), so the DuckDB gate oracle extracts the identical
  * candidate set and replays the Luhn arithmetic in SQL.
  */
object CardNumberUtil {

  /** 13–19 digits (the ISO/IEC 7812 PAN length range), each gap at most
    * one space or hyphen, bounded by word boundaries. The `\b` guards
    * reject candidates embedded in longer digit runs: a 20-digit run
    * has no interior word boundary, so no 19-digit prefix of it is ever
    * matched and Luhn-checked — matching on runs, not prefixes, is what
    * keeps serial numbers out.
    */
  val candidateRegex: String = "\\b[0-9](?:[ -]?[0-9]){12,18}\\b"

  private val candidate = Pattern.compile(candidateRegex)

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

  /** Number of Luhn-valid card candidates in `s`. */
  def countValid(s: UTF8String): Int = {
    val str = s.toString
    val m = candidate.matcher(str)
    var n = 0
    while (m.find()) if (luhnValid(str, m.start, m.end)) n += 1
    n
  }

  /** `s` with every Luhn-valid candidate replaced by `[CARD]`;
    * checksum-failing candidates pass through untouched. Returns the
    * input object unchanged (no copy) when nothing validates — the
    * overwhelmingly common row.
    */
  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    val m = candidate.matcher(str)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      if (luhnValid(str, m.start, m.end)) {
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
