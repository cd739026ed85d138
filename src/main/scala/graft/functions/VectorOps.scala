package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Static kernels for dense float-vector math, shared by interpreted eval
  * and generated Java. Loops over `ArrayData` primitive floats — no
  * boxing, no higher-order-function per-element lambda dispatch, which is
  * what makes this beat `aggregate(zip_with(...))` in the ANN hot path.
  */
object VectorOpsUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    // Fail loud on dimension drift: silently dotting the common prefix
    // would produce a plausible-but-wrong similarity that corrupts ANN
    // ranks and dedup decisions with no signal.
    require(a.numElements() == b.numElements(),
      s"embedding dims differ: ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Float-array twins of the `ArrayData` kernels above, for JVM-side
    * consumers ([[graft.ops.Similarity]]'s partition-local heaps) that
    * hold deserialized `Array[Float]`. Kept textually parallel — same
    * sequential accumulation order — and pinned bit-identical to the
    * `ArrayData` path by a property test (FunctionsSpec), so rank order
    * always agrees between the codegen'd SQL kernel and the heap path.
    */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"embedding dims differ: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val v = a(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Random-hyperplane sign-sketch band keys for cosine LSH.
    *
    * `planes` Rademacher (±1) hyperplanes derived deterministically from
    * splitmix64 (stable across JVMs/executors); the sign bits pack into
    * `bands` keys of `planes/bands` bits each. Two vectors at angle θ
    * agree on each bit with probability 1 - θ/π, so identical vectors
    * always share every band and near-duplicates (cos ≥ 0.99, θ ≤ 8.1°)
    * share at least one 16-bit band with p ≈ 0.995 at the default
    * 128 planes × 8 bands. Joining on (band_index, key) replaces the
    * all-pairs cartesian with an equi-join.
    */
  // The ±1 hyperplane weights depend only on (planes, dim) — they are
  // the MODEL, constant across every row — so deriving them per row
  // cost planes×dim mix64 evaluations per vector (16,384 hash chains
  // at the 128×128 default) before a single multiply. Hoisted here
  // into a memoized flat matrix (guide §1.2 step 2: per-task work);
  // values and multiply-accumulate order are unchanged, so the keys
  // are bit-identical. A handful of (planes, dim) shapes exist per
  // job; each entry is planes×dim doubles (128 KB at the default).
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planeWeights(planes: Int, d: Int): Array[Double] =
    planeCache.computeIfAbsent((planes, d), { case (p0, dim) =>
      val w = new Array[Double](p0 * dim)
      var p = 0
      while (p < p0) {
        var j = 0
        while (j < dim) {
          w(p * dim + j) =
            if ((TextHash.mix64(p.toLong * 0x100000001b3L + j) & 1L) == 0L) 1.0
            else -1.0
          j += 1
        }
        p += 1
      }
      w
    })

  def signBandKeys(vec: Seq[Float], planes: Int, bands: Int): Array[Long] = {
    require(bands > 0 && planes > 0 && planes % bands == 0,
      s"planes ($planes) must be a positive multiple of bands ($bands)")
    val rows = planes / bands
    require(rows <= 64, s"planes/bands = $rows bits exceed one 64-bit key")
    val d = vec.length
    val w = planeWeights(planes, d)
    val keys = new Array[Long](bands)
    var p = 0
    var band = 0
    var acc = 0L
    while (p < planes) {
      var dot = 0.0
      var j = 0
      val off = p * d
      while (j < d) {
        dot += w(off + j) * vec(j)
        j += 1
      }
      acc = (acc << 1) | (if (dot >= 0) 1L else 0L)
      if ((p + 1) % rows == 0) { keys(band) = acc; band += 1; acc = 0L }
      p += 1
    }
    keys
  }
}

/** `cosine_sim(array<float>, array<float>) -> double` as a codegen-friendly
  * binary Catalyst expression (the ANN brute-force scan spends essentially
  * all its time here).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.VectorOpsUtil$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $util.cosine($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = "graft.functions.VectorOpsUtil$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $util.dot($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorOps {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
