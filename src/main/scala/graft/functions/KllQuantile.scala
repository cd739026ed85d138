package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** KLL-style mergeable quantile sketch buffer (Karnin, Lang & Liberty,
  * FOCS 2016) over doubles, with DETERMINISTIC alternating compaction
  * instead of coin flips: each level remembers whether its last
  * compaction promoted even- or odd-indexed items and flips for the
  * next one. Determinism costs the adversarial-input guarantee of the
  * randomized sketch (an adversary who knows the parity schedule can
  * bias one level), but keeps the same telescoping error structure on
  * non-adversarial data and — the property this engine needs — makes
  * every single-threaded run reproducible. Note that ACROSS runs the
  * shuffle-fetch merge order still varies, so only two things are
  * stable enough to gate: the no-compaction regime (n within the
  * level-0 capacity → every quantile exact, any merge order) and the
  * error BOUND (holds under every merge order). Both are how the sk4
  * gate and the spec split the checking.
  *
  * Structure: level h holds items of weight 2^h; level capacities
  * shrink geometrically from the top (`k` at the top, factor 2/3 per
  * level down, floor 8 — the published schedule), so total space is
  * O(k) and compacting the SMALLEST over-capacity level first keeps
  * the low-weight noise cheap. Compaction: sort the level, keep one
  * leftover when odd-sized (the largest — deterministic), promote
  * every other item of the even remainder to level h+1.
  */
final class KllBuffer(val k: Int) {
  import scala.collection.mutable.ArrayBuffer

  var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  var parities: ArrayBuffer[Boolean] = ArrayBuffer(false)
  var n: Long = 0L

  private def capOf(h: Int): Int = {
    // top level gets k; each level below shrinks by 2/3
    val fromTop = levels.length - 1 - h
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, fromTop)).toInt)
  }

  private def totalItems: Int = {
    var s = 0; var h = 0
    while (h < levels.length) { s += levels(h).length; h += 1 }
    s
  }

  private def capacityBudget: Int = {
    var s = 0; var h = 0
    while (h < levels.length) { s += capOf(h); h += 1 }
    s
  }

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1L
    if (totalItems > capacityBudget) compress()
  }

  def mergeWith(o: KllBuffer): Unit = {
    while (levels.length < o.levels.length) {
      levels += ArrayBuffer.empty[Double]
      parities += false
    }
    var h = 0
    while (h < o.levels.length) {
      levels(h) ++= o.levels(h)
      h += 1
    }
    n += o.n
    while (totalItems > capacityBudget) compress()
  }

  /** Compact the lowest level over its capacity (or the lowest
    * non-empty level when only the total is over budget).
    */
  private def compress(): Unit = {
    var h = 0
    while (h < levels.length && levels(h).length <= capOf(h)) h += 1
    if (h == levels.length) { // total over budget but no level over cap
      h = 0
      while (h < levels.length && levels(h).isEmpty) h += 1
      if (h == levels.length) return
    }
    if (h == levels.length - 1) {
      levels += ArrayBuffer.empty[Double]
      parities += false
    }
    val buf = levels(h)
    if (buf.length < 2) return
    val sorted = buf.sorted
    val oddLeftover: Option[Double] =
      if (sorted.length % 2 == 1) Some(sorted.last) else None
    val body = if (sorted.length % 2 == 1) sorted.dropRight(1) else sorted
    val offset = if (parities(h)) 1 else 0
    parities(h) = !parities(h)
    val promoted = ArrayBuffer.empty[Double]
    var i = offset
    while (i < body.length) { promoted += body(i); i += 2 }
    levels(h) = ArrayBuffer.empty[Double] ++ oddLeftover
    levels(h + 1) ++= promoted
  }

  /** Discrete quantile estimate: the smallest stored value whose
    * cumulative weight reaches `ceil(phi · n)` (the inverted-CDF /
    * `quantile_disc` definition — exact when no compaction has fired).
    */
  def quantile(phi: Double): Double = {
    require(phi > 0 && phi <= 1, s"phi must be in (0, 1]: $phi")
    require(n > 0, "quantile of an empty sketch")
    val pairs = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => pairs += ((v, w)))
      h += 1
    }
    val sorted = pairs.sortBy(_._1)
    val target = math.max(1L, math.ceil(phi * n).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }
}

/** `kll_quantiles(value, k, phis)` — mergeable quantile sketch emitted
  * as `(phi, quantile)` structs in `phis` order. NULL and NaN inputs
  * are skipped (no rank). Bounded O(k) state at every stage — the
  * scale path for per-group length/score distributions over a corpus
  * whose groups do not fit an exact sort, next to [[HeavyHitters]]
  * (frequencies), HLL (distincts) and [[CountMinSketch]] (point
  * counts). Empty groups yield NaN quantiles (SQL aggregates over
  * zero rows return NULL; a sketch row still materializes per group,
  * so the no-data marker must live in the value).
  */
case class KllQuantiles(child: Expression, k: Int, phis: Seq[Double],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  require(k >= 8, s"kll_quantiles needs k >= 8, got $k")
  require(phis.nonEmpty, "kll_quantiles needs at least one phi")
  phis.foreach(p => require(p > 0 && p <= 1, s"phi must be in (0, 1]: $p"))

  override def prettyName: String = "kll_quantiles"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("phi", DoubleType, nullable = false),
    StructField("quantile", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.add(d)
    }
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: KllBuffer): Any =
    new GenericArrayData(phis.map { p =>
      val q = if (buf.n == 0) Double.NaN else buf.quantile(p)
      new GenericInternalRow(Array[Any](p, q))
    }.toArray)

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.levels.length)
    var h = 0
    while (h < buf.levels.length) {
      out.writeBoolean(buf.parities(h))
      out.writeInt(buf.levels(h).length)
      buf.levels(h).foreach(out.writeDouble)
      h += 1
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val buf = new KllBuffer(k)
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    buf.n = in.readLong()
    val nLevels = in.readInt()
    buf.levels = scala.collection.mutable.ArrayBuffer.empty
    buf.parities = scala.collection.mutable.ArrayBuffer.empty
    var h = 0
    while (h < nLevels) {
      buf.parities += in.readBoolean()
      val len = in.readInt()
      val lvl = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < len) { lvl += in.readDouble(); i += 1 }
      buf.levels += lvl
      h += 1
    }
    buf
  }

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles needs a DOUBLE input, got ${child.dataType.sql} " +
          "(cast explicitly — silent widening would hide precision intent)")

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllQuantiles {
  /** Column-API entry point: array of `(phi, quantile)` structs in
    * `phis` order.
    */
  def of(value: Column, k: Int, phis: Seq[Double]): Column =
    ExpressionUtils.column(
      KllQuantiles(ExpressionUtils.expression(value), k, phis)
        .toAggregateExpression())
}
