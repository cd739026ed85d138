package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Aggregation buffer of [[BoundedTopK]]: a size-capped max-heap on the
  * ordering key — the root is the WORST survivor, so an incoming element
  * either displaces it or is discarded in O(log k). The buffer therefore
  * NEVER holds more than k (key, value) pairs, no matter how many rows a
  * group contributes within a partition — the property `collect_list` +
  * `slice` cannot give, because collect_list materializes the whole
  * per-(group, partition) slice before the slice truncates it.
  */
final class TopKHeap(val k: Int, ord: Ordering[Any]) {
  // Pairs as 2-arrays: (0) = ordering key, (1) = opaque payload.
  val q = new java.util.PriorityQueue[Array[Any]](
    math.min(k, 16),
    new java.util.Comparator[Array[Any]] {
      override def compare(a: Array[Any], b: Array[Any]): Int =
        ord.compare(b(0), a(0)) // reversed: max-heap
    })

  def insert(key: Any, value: Any): Unit =
    if (q.size < k) q.add(Array(key, value))
    else if (ord.compare(key, q.peek()(0)) < 0) { q.poll(); q.add(Array(key, value)) }
}

/** `bounded_top_k(key, value, k)` — collect the `value`s of the k rows
  * with the SMALLEST `key`s, emitted as an array sorted by key
  * ascending. A custom `TypedImperativeAggregate` because no Spark
  * built-in bounds its aggregation buffer: `collect_list` +
  * `array_sort` + `slice` buffers every row of a (group × partition)
  * cell before truncating, so one hot group in a partition briefly
  * materializes its whole slice in the ObjectHashAggregate buffer. This
  * buffer holds ≤ k pairs at every stage — partial (map side), shuffle
  * (serialized as length-prefixed UnsafeRows), merge, and final — so a
  * billion-row group costs the same buffer memory as a k-row group.
  *
  * The key must be an orderable type (struct of orderables is fine);
  * the VALUE is opaque cargo — never compared — so payloads may carry
  * maps or any other non-orderable column. NULL keys are skipped (no
  * rank → not collected); NULL values are collected if their key wins.
  * Ties on the full key keep an arbitrary winner — pass a unique
  * tie-breaker (an id) as the key's last field for determinism.
  */
case class BoundedTopK(keyChild: Expression, valueChild: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, s"bounded_top_k needs a positive k, got $k")

  override def left: Expression = keyChild
  override def right: Expression = valueChild
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(keyChild.dataType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(keyChild.dataType)

  override def dataType: DataType =
    ArrayType(valueChild.dataType, containsNull = valueChild.nullable)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, ord)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val key = keyChild.eval(input)
    if (key != null) {
      // Copy BEFORE inserting: eval of unsafe-backed rows returns views
      // into a reused buffer.
      buf.insert(InternalRow.copyValue(key),
        InternalRow.copyValue(valueChild.eval(input)))
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    val it = other.q.iterator()
    while (it.hasNext) { val p = it.next(); buf.insert(p(0), p(1)) }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val arr = buf.q.toArray(new Array[Array[Any]](buf.q.size))
    java.util.Arrays.sort(arr,
      new java.util.Comparator[Array[Any]] {
        override def compare(a: Array[Any], b: Array[Any]): Int =
          ord.compare(a(0), b(0))
      })
    new GenericArrayData(arr.map(_(1)))
  }

  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(keyChild.dataType, valueChild.dataType))

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new GenericInternalRow(2)
    val it = buf.q.iterator()
    while (it.hasNext) {
      val p = it.next()
      scratch.update(0, p(0))
      scratch.update(1, p(1))
      val ur = pairProj.apply(scratch)
      out.writeInt(ur.getSizeInBytes)
      out.write(ur.getBytes)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = createAggregationBuffer()
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    while (in.available() > 0) {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      val row = new UnsafeRow(2)
      row.pointTo(b, n)
      buf.insert(InternalRow.copyValue(row.get(0, keyChild.dataType)),
        InternalRow.copyValue(row.get(1, valueChild.dataType)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(keyChild = newLeft, valueChild = newRight)
}

object BoundedTopK {
  /** Column-API entry point: array of the `value`s of the k smallest
    * `key`s, sorted by key ascending.
    */
  def of(key: Column, value: Column, k: Int): Column =
    ExpressionUtils.column(
      BoundedTopK(ExpressionUtils.expression(key),
        ExpressionUtils.expression(value), k).toAggregateExpression())
}
