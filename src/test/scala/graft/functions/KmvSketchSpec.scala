package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Kmv]]: exact regime (≤ k distinct → counts and set ops exact),
  * merge-order invariance of the serialized sketch itself, rollup via
  * [[KmvMerge]], saturated-regime tolerance, and edges.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(xs: Seq[Long], k: Int, parts: Int): Array[Byte] =
    xs.toDF("v").repartition(parts)
      .agg(Kmv.sketch(col("v"), k).as("sk"))
      .select("sk").as[Array[Byte]].head()

  test("exact regime: estimate equals count distinct, any partitioning") {
    val xs = (1L to 500L).map(i => i % 200) // 200 distinct
    for (parts <- Seq(1, 7, 32)) {
      val sk = sketchOf(xs, k = 1024, parts = parts)
      val est = Seq(sk).toDF("sk")
        .select(Kmv.estimate(col("sk"))).as[Double].head()
      assert(est == 200.0, s"parts=$parts")
    }
  }

  test("the serialized sketch is merge-order INVARIANT (bit-equal)") {
    val xs = (1L to 100000L).map(i => (i * 2654435761L) % 50000)
    val a = sketchOf(xs, k = 512, parts = 3)
    val b = sketchOf(xs, k = 512, parts = 61)
    assert(java.util.Arrays.equals(a, b))
  }

  test("saturated estimate within 10% on 50k distinct at k=1024") {
    val xs = (1L to 50000L).map(i => i * 7919L)
    val sk = sketchOf(xs, k = 1024, parts = 16)
    val est = Seq(sk).toDF("sk")
      .select(Kmv.estimate(col("sk"))).as[Double].head()
    assert(math.abs(est - 50000.0) <= 5000.0, s"est=$est")
  }

  test("set ops exact regime: hand-built overlap") {
    // A = 1..100, B = 51..180 → |A|=100 |B|=130 ∪=180 ∩=50 A∖B=50
    val a = sketchOf((1L to 100L), k = 256, parts = 4)
    val b = sketchOf((51L to 180L), k = 256, parts = 4)
    val r = Seq((a, b)).toDF("a", "b")
      .select(
        Kmv.estimate(col("a")).as("na"),
        Kmv.estimate(col("b")).as("nb"),
        Kmv.unionEstimate(col("a"), col("b")).as("nu"),
        Kmv.intersectEstimate(col("a"), col("b")).as("ni"),
        Kmv.diffEstimate(col("a"), col("b")).as("nd"))
      .as[(Double, Double, Double, Double, Double)].head()
    assert(r == ((100.0, 130.0, 180.0, 50.0, 50.0)))
  }

  test("saturated intersection within 15% on a half-overlapping pair") {
    val a = sketchOf((1L to 40000L).map(_ * 31L), k = 4096, parts = 8)
    val b = sketchOf((20000L to 60000L).map(_ * 31L), k = 4096, parts = 8)
    val ni = Seq((a, b)).toDF("a", "b")
      .select(Kmv.intersectEstimate(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(ni - 20001.0) <= 3000.0, s"ni=$ni")
  }

  test("kmv_merge rollup equals the direct whole-set sketch (bit-equal)") {
    val xs = (1L to 30000L).map(i => (i * 48271L) % 9973)
    val direct = sketchOf(xs, k = 256, parts = 5)
    val rolled = xs.zipWithIndex
      .map { case (v, i) => (i % 4, v) }.toDF("shard", "v")
      .groupBy("shard").agg(Kmv.sketch(col("v"), 256).as("sk"))
      .agg(Kmv.merge(col("sk")).as("sk"))
      .select("sk").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(direct, rolled))
  }

  test("mixed-k merge adopts the smaller k") {
    val big = sketchOf((1L to 5000L), k = 512, parts = 2)
    val small = sketchOf((4000L to 9000L), k = 64, parts = 2)
    val merged = Seq(big, small).toDF("sk")
      .agg(Kmv.merge(col("sk")).as("m"))
      .select("m").as[Array[Byte]].head()
    val buf = KmvBuffer.deserialize(merged)
    assert(buf.k == 64)
    assert(buf.values.size == 64)
  }

  test("NULLs are skipped, not hashed to a phantom value") {
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(3L))
      .toDF("v")
      .agg(Kmv.sketch(col("v"), 64).as("sk"))
      .select(Kmv.estimate(col("sk"))).as[Double].head()
    assert(withNulls == 3.0)
  }

  test("guards: k too small; unknown op") {
    intercept[IllegalArgumentException] { Kmv.sketch(col("v"), 1) }
    intercept[IllegalArgumentException] {
      KmvBuffer.setOpEstimate(new KmvBuffer(8), new KmvBuffer(8), "xor")
    }
  }
}
