package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count–min sketch surface, completing the mergeable-sketch family
  * ([[HeavyHitters]] = Misra–Gries lower bounds; CMS = upper-biased
  * point estimates over an unbounded item domain).
  *
  * Spark-first split: the PER-SHARD sketch build is Spark's built-in
  * `count_min_sketch(col, eps, confidence, seed)` aggregate (already
  * partial-merged map-side, already codegen-scheduled) — this file adds
  * only what the built-in surface lacks:
  *
  *  - [[CountMinMerge]]: an aggregate that UNIONS serialized sketches,
  *    so 10k per-shard/per-day sketches roll up without touching raw
  *    data again (`CountMinSketch.mergeInPlace`, valid only for equal
  *    (depth, width, seed) — enforced, mirroring the signature-index
  *    parameter-uniformity guard);
  *  - [[CountMinEstimate]]: the point query `estimate(sketch, item)`.
  *
  * 100 TB shape: shard sketches are built where the data lives (one
  * scan, bounded depth×width longs per group), and everything after
  * ships card-sized binaries — the estimate expression only ever runs
  * over sketch frames, never the corpus.
  */
final class CmsBuffer {
  var sketch: CountMinSketch = _
}

/** `count_min_merge(sketchBinary)` — union of serialized count–min
  * sketches (sum of counter arrays; Cormode & Muthukrishnan 2005, the
  * linear-sketch property). Empty input → NULL, like other aggregates
  * over empty groups.
  */
case class CountMinMerge(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression]
    with ExpectsInputTypes {

  override def prettyName: String = "count_min_merge"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer

  private def readSketch(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  private def mergeSketch(buf: CmsBuffer, s: CountMinSketch): Unit =
    if (buf.sketch == null) buf.sketch = s
    else {
      require(buf.sketch.depth == s.depth && buf.sketch.width == s.width,
        s"count_min_merge: incompatible sketches — " +
          s"(depth=${buf.sketch.depth}, width=${buf.sketch.width}) vs " +
          s"(depth=${s.depth}, width=${s.width}); per-shard sketches " +
          "must be built with one (eps, confidence, seed)")
      buf.sketch.mergeInPlace(s)
    }

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) mergeSketch(buf, readSketch(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    if (other.sketch != null) mergeSketch(buf, other.sketch)
    buf
  }

  override def eval(buf: CmsBuffer): Any =
    if (buf.sketch == null) null
    else {
      val bos = new java.io.ByteArrayOutputStream()
      buf.sketch.writeTo(bos)
      bos.toByteArray
    }

  override def serialize(buf: CmsBuffer): Array[Byte] =
    if (buf.sketch == null) Array.emptyByteArray
    else eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val buf = new CmsBuffer
    if (bytes.nonEmpty) buf.sketch = readSketch(bytes)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinMerge =
    copy(child = newChild)
}

/** `count_min_estimate(sketchBinary, item)` — the CMS point query:
  * an UPPER bound on item's frequency, exact when no counter the item
  * hashes to has a collision, never an undercount. Item types follow
  * `CountMinSketch.estimateCount`: string (hashed on UTF-8 bytes,
  * matching what `count_min_sketch(stringCol, …)` inserted) or any
  * integral (hashed as long).
  *
  * Runs over sketch frames only (card-sized), so CodegenFallback costs
  * nothing measurable; the sketch is deserialized per row — fine at
  * card scale, deliberately NOT offered for corpus-sized frames.
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "count_min_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: sketch argument must be BINARY, got ${left.dataType}")
    else if (!Seq(StringType, LongType, IntegerType).contains(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: item argument must be STRING or integral, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val sk = left.eval(input)
    val item = right.eval(input)
    if (sk == null || item == null) null
    else {
      val sketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(sk.asInstanceOf[Array[Byte]]))
      item match {
        case s: UTF8String => sketch.estimateCount(s.toString)
        case l: java.lang.Long => sketch.estimateCount(l)
        case i: java.lang.Integer => sketch.estimateCount(i.longValue())
        case other => sketch.estimateCount(other)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  /** Union of serialized count–min sketches (equal params required). */
  def merge(sketch: Column): Column =
    ExpressionUtils.column(
      CountMinMerge(ExpressionUtils.expression(sketch)).toAggregateExpression())

  /** Point estimate of `item`'s frequency from a serialized sketch. */
  def estimate(sketch: Column, item: Column): Column =
    ExpressionUtils.column(CountMinEstimate(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item)))
}
