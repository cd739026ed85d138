package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Static kernel shared by interpreted eval and generated code (static
  * call = stays inside whole-stage codegen, no `this` capture).
  */
object ZOrderUtil {
  /** Spread the 32 bits of `x` over the even bit positions of a long
    * (branch-free magic-mask doubling). */
  def spread(x: Int): Long = {
    var v = x.toLong & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 64-bit Morton code of two SIGNED ints: each input's sign bit is
    * flipped so bit-order equals signed value-order, bits interleave
    * a₃₁b₃₁a₃₀b₃₀…, and the final code's top bit is flipped BACK so
    * the result's SIGNED Long order equals Morton order — Spark sorts
    * (and row-group stats compare) signed, and without the last flip
    * every a ≥ 0 row would order before every a < 0 row, splitting the
    * curve in two at exactly the place mixed-sign data straddles.
    * Monotone in each coordinate with the other fixed under plain
    * `Long` comparison.
    */
  def interleave(a: Int, b: Int): Long =
    ((spread(a ^ Int.MinValue) << 1) | spread(b ^ Int.MinValue)) ^ Long.MinValue
}

/** `zorder2(intColA, intColB)` — the 64-bit Morton (Z-order) code of two
  * int columns as a codegen'd Catalyst expression.
  *
  * This is the multi-dimensional counterpart of [[graft.engine.sink
  * .LakeSink]]'s 1-D `clusterBy`: sorting a partition by the Z-value
  * lays rows out so parquet row-group min/max stats are selective on
  * BOTH columns — a reader filtering on either (or both) skips row
  * groups, where a plain 2-column lexicographic sort only prunes the
  * leading column. Same motivation as lakehouse Z-ordering
  * (e.g. Delta's OPTIMIZE ZORDER BY); here it is just a sort key, no
  * file-format extension. Inputs wider than int (longs, doubles,
  * timestamps) should be rank- or bucket-reduced first — Z-order
  * quality depends on value distribution, not magnitude, so
  * `ntile`/`percent_rank` buckets are the right reduction.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two int children, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.ZOrderUtil$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.interleave($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Column-API entry point. Null if either input is null (standard
    * binary-expression null semantics) — cluster sorts put nulls first,
    * which is fine for layout. */
  def of(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ZOrder2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
