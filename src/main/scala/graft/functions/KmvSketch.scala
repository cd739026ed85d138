package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.functions.{when, xxhash64}
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** KMV ("k minimum values") theta sketch over 64-bit hashes — the
  * distinct-count summary that, unlike HLL, supports INTERSECTION and
  * DIFFERENCE estimates (Beyer et al., SIGMOD 2007; the
  * DataSketches theta-sketch model): keep the k smallest distinct
  * hash values; the k-th smallest, mapped to (0,1), estimates the
  * sampling threshold θ, and any predicate over the retained sample
  * scales by 1/θ.
  *
  * Two properties this engine leans on:
  *
  *  - MERGE-ORDER INVARIANCE: "k smallest of a set" does not depend on
  *    arrival or merge order, so estimates are bit-deterministic
  *    across shuffle fetch orders — gateable, unlike sketches with
  *    order-dependent state.
  *  - EXACT REGIME: while a set's distinct count stays ≤ k the sketch
  *    IS the distinct hash set (θ = 1), so counts — and set-op counts
  *    against another unsaturated sketch — are exact. The sk5 gate
  *    pins this regime; saturated-regime error is property-tested.
  *
  * Hashes are stored FLIPPED (`h ^ Long.MinValue`) so natural signed
  * order equals unsigned hash order; the normalized position of a
  * stored value u is `(u − Long.MinValue) / 2^64`.
  */
final class KmvBuffer(val k: Int) {
  val values = new java.util.TreeSet[java.lang.Long]()

  def add(flipped: Long): Unit = {
    if (values.size < k) { values.add(flipped); () }
    else if (flipped < values.last()) {
      if (values.add(flipped)) values.remove(values.last())
    }
  }

  def mergeWith(o: KmvBuffer): Unit = {
    val it = o.values.iterator()
    while (it.hasNext) add(it.next())
  }
}

object KmvBuffer {
  private val Two64 = math.pow(2.0, 64)

  /** Normalized (0,1] position of a stored (flipped) hash. */
  def pos(flipped: Long): Double =
    (flipped.toDouble - Long.MinValue.toDouble + 1.0) / Two64

  def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.values.size)
    val it = buf.values.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.close()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.values.add(in.readLong()); i += 1 }
    buf
  }

  /** Sampling threshold θ: 1 while unsaturated, else the k-th smallest
    * position (every retained hash sits strictly below the last one or
    * at it — we use the inclusive k-th value, the KMV (k−1)/R rule's
    * denominator).
    */
  def theta(buf: KmvBuffer): Double =
    if (buf.values.size < buf.k) 1.0 else pos(buf.values.last())

  /** Distinct estimate: exact count while unsaturated, else (k−1)/R. */
  def estimate(buf: KmvBuffer): Double =
    if (buf.values.size < buf.k) buf.values.size.toDouble
    else (buf.k - 1).toDouble / pos(buf.values.last())

  /** Set-operation estimate between two sketches: restrict both
    * retained sets to hashes strictly below θ = min(θA, θB), apply the
    * set op on the restricted samples, scale by 1/θ. With both sides
    * unsaturated θ = 1 and the result is the exact count.
    */
  def setOpEstimate(a: KmvBuffer, b: KmvBuffer, op: String): Double = {
    val th = math.min(theta(a), theta(b))
    def below(s: KmvBuffer): java.util.TreeSet[java.lang.Long] = {
      val out = new java.util.TreeSet[java.lang.Long]()
      val it = s.values.iterator()
      var done = false
      while (it.hasNext && !done) {
        val v = it.next()
        if (pos(v) <= th) out.add(v) else done = true
      }
      out
    }
    val sa = below(a)
    val sb = below(b)
    val n = op match {
      case "union" =>
        val u = new java.util.TreeSet[java.lang.Long](sa); u.addAll(sb)
        u.size
      case "intersect" =>
        val i = new java.util.TreeSet[java.lang.Long](sa); i.retainAll(sb)
        i.size
      case "diff" =>
        val d = new java.util.TreeSet[java.lang.Long](sa); d.removeAll(sb)
        d.size
      case other =>
        throw new IllegalArgumentException(s"unknown set op: $other")
    }
    n.toDouble / th
  }
}

/** `kmv_sketch(hash64, k)` — build the sketch from 64-bit hashes
  * (LongType; the Column API hashes arbitrary values via `xxhash64`
  * with NULLs skipped). Emitted serialized so sketch frames persist,
  * join and roll up like any other column.
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression]
    with ExpectsInputTypes {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def prettyName: String = "kmv_sketch"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any = KmvBuffer.serialize(buf)
  override def serialize(buf: KmvBuffer): Array[Byte] =
    KmvBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

/** `kmv_merge(sketch)` — union of serialized KMV sketches (keep the k
  * smallest of the concatenation; k may differ across inputs — the
  * result uses the SMALLEST k, the only sound combination).
  */
case class KmvMerge(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression]
    with ExpectsInputTypes {

  override def prettyName: String = "kmv_merge"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KmvBuffer =
    new KmvBuffer(Int.MaxValue)

  private def mergeInto(buf: KmvBuffer, o: KmvBuffer): KmvBuffer =
    if (buf.k > o.k) { // adopt the smaller k
      val shrunk = new KmvBuffer(o.k)
      shrunk.mergeWith(buf)
      shrunk.mergeWith(o)
      shrunk
    } else { buf.mergeWith(o); buf }

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeInto(buf, KmvBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer =
    mergeInto(buf, other)

  override def eval(buf: KmvBuffer): Any =
    if (buf.k == Int.MaxValue) null else KmvBuffer.serialize(buf)
  override def serialize(buf: KmvBuffer): Array[Byte] =
    KmvBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMerge =
    copy(child = newChild)
}

/** `kmv_estimate(sketch)` — distinct-count estimate of one sketch. */
case class KmvEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback with ExpectsInputTypes {
  override def prettyName: String = "kmv_estimate"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    KmvBuffer.estimate(KmvBuffer.deserialize(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** `kmv_union_estimate` / `kmv_intersect_estimate` /
  * `kmv_diff_estimate` — set-operation estimates between two sketches
  * under θ = min(θA, θB).
  */
case class KmvSetEstimate(left: Expression, right: Expression, op: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback with ExpectsInputTypes {
  require(Seq("union", "intersect", "diff").contains(op),
    s"unknown set op: $op")
  override def prettyName: String = s"kmv_${op}_estimate"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvBuffer.setOpEstimate(
      KmvBuffer.deserialize(a.asInstanceOf[Array[Byte]]),
      KmvBuffer.deserialize(b.asInstanceOf[Array[Byte]]), op)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSetEstimate =
    copy(left = newLeft, right = newRight)
}

object Kmv {
  /** Sketch of arbitrary values: `xxhash64` with NULLs skipped (the
    * raw hash maps NULL to the seed, which would count as a phantom
    * distinct value).
    */
  def sketch(value: Column, k: Int): Column =
    ExpressionUtils.column(KmvAgg(ExpressionUtils.expression(
      when(value.isNotNull, xxhash64(value))), k).toAggregateExpression())

  /** Sketch of pre-hashed LONG values (advanced path). */
  def sketchHashed(hash64: Column, k: Int): Column =
    ExpressionUtils.column(KmvAgg(ExpressionUtils.expression(hash64), k)
      .toAggregateExpression())

  def merge(sketch: Column): Column =
    ExpressionUtils.column(KmvMerge(ExpressionUtils.expression(sketch))
      .toAggregateExpression())

  def estimate(sketch: Column): Column =
    ExpressionUtils.column(KmvEstimate(ExpressionUtils.expression(sketch)))

  def unionEstimate(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetEstimate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), "union"))

  def intersectEstimate(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetEstimate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      "intersect"))

  def diffEstimate(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetEstimate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), "diff"))
}
