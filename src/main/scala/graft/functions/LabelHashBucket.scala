package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code (a static
  * call keeps the expression inside whole-stage codegen without capturing
  * `this`). Referenced from generated Java as
  * `graft.functions.LabelHashBucketUtil.bucket(...)`.
  */
object LabelHashBucketUtil {
  // One digest per thread (the TextHash.sha256Local pattern): this
  // kernel runs once per corpus row in whole-stage codegen, and
  // getInstance does a Security-provider lookup + allocation per call.
  // digest() resets the instance after each use, so reuse is safe.
  private val sha256Local =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("SHA-256"))

  /** Stable privacy bucket of a label string.
    *
    * Semantics (reference `utils/label_policy.py:79-96`):
    * `int.from_bytes(sha256(str(v).encode())[:8], 'big') % buckets`,
    * with sentinel -1 for null / blank / whitespace-only / NaN-rendered
    * values. The first 8 digest bytes form an UNSIGNED 64-bit integer —
    * values ≥ 2^63 overflow a signed Long, hence
    * `java.lang.Long.remainderUnsigned` (the reason
    * `conv(substring(sha2(...),1,16),16,10) % n` built-ins can't
    * reproduce this exactly).
    */
  def bucket(s: UTF8String, buckets: Int): Int = {
    if (s == null) return -1
    val text = s.toString.trim
    if (text.isEmpty || text.equalsIgnoreCase("nan")) return -1
    val d = sha256Local.get()
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(acc, buckets.toLong).toInt
  }
}

/** `label_hash_bucket(stringCol, nBuckets)` as a codegen-friendly unary
  * Catalyst expression. Never null: missing labels map to the -1 sentinel
  * (outside [0, buckets), so distinguishable from bucket 0).
  */
case class LabelHashBucket(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"label_hash_bucket expects a string child, got ${child.dataType}")

  override def eval(input: InternalRow): Any =
    LabelHashBucketUtil.bucket(child.eval(input).asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val util = "graft.functions.LabelHashBucketUtil$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = $util.bucket(${c.isNull} ? null : ${c.value}, $buckets);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LabelHashBucket =
    copy(child = newChild)
}

object LabelHashBucket {
  /** Column-API entry point: bucket a label column under the privacy
    * policy. Any input type — stringified first (the SQL string cast is
    * the Python `str(v)` analogue).
    */
  def of(c: Column, buckets: Int = 64): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    ExpressionUtils.column(LabelHashBucket(ExpressionUtils.expression(c.cast("string")), buckets))
  }
}
