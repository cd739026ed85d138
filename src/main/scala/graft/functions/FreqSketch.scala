package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Aggregation buffer of [[HeavyHitters]]: a Misra–Gries frequency
  * summary — at most `cap` (item → counter) entries plus a running
  * tally of decrement rounds (`decs`). The MG invariants this buffer
  * maintains (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *
  *  - every stored counter UNDERCOUNTS its item's true frequency by at
  *    most `decs`, and `decs ≤ N / (cap + 1)` where N is the total
  *    weight this buffer has absorbed;
  *  - any item whose true frequency exceeds N / (cap + 1) is
  *    guaranteed to be present;
  *  - when the whole stream's distinct-item count never exceeds `cap`,
  *    no decrement ever fires (`decs == 0`) and every counter is EXACT
  *    — the regime the correctness gate pins against a plain GROUP BY.
  *
  * Buffer size is bounded by `cap` at every stage — partial, shuffle,
  * merge, final — so one hot group costs the same memory as a small
  * one, the property a `groupBy(item).count()` + filter cannot give
  * when the item domain itself is the thing that does not fit.
  */
final class MGSummary(val cap: Int) {
  val counts = new java.util.HashMap[Any, Long](math.min(cap, 64))
  /** Total decrement applied to (potentially) every counter so far —
    * the per-item error upper bound reported in the output.
    */
  var decs: Long = 0L

  def add(item: Any, weight: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) {
      counts.put(item, cur + weight)
    } else if (counts.size < cap) {
      counts.put(item, weight)
    } else {
      // Classic MG decrement round, generalized to weights: subtract
      // min(weight, smallest counter alive) from everything, drop
      // zeros, and re-offer any remainder. Amortized O(1) per unit of
      // weight — each decrement round removes cap+1 units.
      var remaining = weight
      while (remaining > 0 && !counts.containsKey(item) && counts.size >= cap) {
        var minC = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val v = it0.next(); if (v < minC) minC = v }
        val step = math.min(remaining, minC)
        decs += step
        remaining -= step
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - step
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
      }
      if (remaining > 0) add(item, remaining)
    }
  }

  /** Mergeable-summaries rule: sum counterparts, then if over capacity
    * subtract the (cap+1)-th largest counter from everything and drop
    * the non-positive survivors. Preserves both MG invariants with the
    * combined error bound decsA + decsB + subtracted amount.
    */
  def mergeWith(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    decs += other.decs
    if (counts.size > cap) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (cap+1)-th largest = index size-cap-1 from the ascending sort.
      val cStar = vals(counts.size - cap - 1)
      decs += cStar
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cStar
        if (nv <= 0) ei.remove() else e.setValue(nv)
      }
    }
  }
}

/** `heavy_hitters(item, capacity)` — mergeable Misra–Gries frequency
  * sketch, emitted as an array of `(item, count, max_err)` structs
  * sorted by count descending (ties: item ascending, so the output is
  * deterministic). `count` is a LOWER bound on the item's true
  * frequency and `count + max_err` an upper bound; any item with true
  * frequency > N/(capacity+1) is guaranteed present.
  *
  * This is the scale path for "top domains / hottest tokens / most
  * frequent URLs" over a 100 TB corpus whose item domain (every URL,
  * every token) does not fit in an aggregation hash map: the buffer
  * holds ≤ capacity entries at every stage, shuffles ≤ capacity rows
  * per partial, and merges associatively — the exact property that
  * lets 1000 executors each summarize their shard and ship one small
  * summary to the reducer. When the domain is known to be ≤ capacity
  * the counts are exact (max_err 0) — pinned vs a plain GROUP BY by
  * the sk1 gate; the approximation bounds on over-capacity domains are
  * property-tested in FreqSketchSpec.
  *
  * Reference analogue: the reference engine's per-column value-count
  * reports cap their output at a fixed row budget (see
  * tracebloc_ingestor's per-run summary counters); this gives the same
  * product with a proven error envelope instead of a silent cap.
  */
case class HeavyHitters(child: Expression, capacity: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(capacity > 0, s"heavy_hitters needs a positive capacity, got $capacity")

  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val item = child.eval(input)
    // NULL items are skipped (no identity to count), mirroring count(col).
    if (item != null) buf.add(InternalRow.copyValue(item), 1L)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: MGSummary): Any = {
    val entries = buf.counts.entrySet().toArray(
      new Array[java.util.Map.Entry[Any, Long]](buf.counts.size))
    java.util.Arrays.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[Any, Long]] {
        override def compare(a: java.util.Map.Entry[Any, Long],
                             b: java.util.Map.Entry[Any, Long]): Int = {
          val byCount = java.lang.Long.compare(b.getValue, a.getValue)
          if (byCount != 0) byCount else ord.compare(a.getKey, b.getKey)
        }
      })
    new GenericArrayData(entries.map { e =>
      new GenericInternalRow(Array[Any](e.getKey, e.getValue, buf.decs))
    })
  }

  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(child.dataType, LongType))

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.decs)
    val scratch = new GenericInternalRow(2)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      scratch.update(0, e.getKey)
      scratch.update(1, e.getValue)
      val ur = pairProj.apply(scratch)
      out.writeInt(ur.getSizeInBytes)
      out.write(ur.getBytes)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val buf = createAggregationBuffer()
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    buf.decs = in.readLong()
    while (in.available() > 0) {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      val row = new UnsafeRow(2)
      row.pointTo(b, n)
      buf.counts.put(InternalRow.copyValue(row.get(0, child.dataType)),
        row.getLong(1))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {
  /** Column-API entry point: `(item, count, max_err)` structs sorted by
    * count descending, at most `capacity` of them.
    */
  def of(item: Column, capacity: Int): Column =
    ExpressionUtils.column(
      HeavyHitters(ExpressionUtils.expression(item), capacity)
        .toAggregateExpression())
}
