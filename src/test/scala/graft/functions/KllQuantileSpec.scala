package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[KllQuantiles]]: exact-regime equality with the true discrete
  * quantile, bounded rank error once compaction fires (under multiple
  * partitionings — i.e. multiple merge orders), and the plumbing
  * edges (nulls, NaN, type check, guards).
  */
class KllQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val phis = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** True inverted-CDF quantile: smallest v with rank ≥ ⌈phi·n⌉. */
  private def exactQ(xs: Seq[Double], phi: Double): Double = {
    val s = xs.sorted
    s(math.max(1, math.ceil(phi * s.length).toInt) - 1)
  }

  private def sketchQ(xs: Seq[Double], k: Int, parts: Int)
  : Map[Double, Double] =
    xs.toDF("v").repartition(parts)
      .agg(KllQuantiles.of(col("v"), k, phis).as("qs"))
      .select(explode(col("qs")).as("e"))
      .select(col("e.phi"), col("e.quantile"))
      .as[(Double, Double)].collect().toMap

  test("no-compaction regime: every quantile exact under any partitioning") {
    val xs = (1 to 900).map(i => ((i * 7919) % 1000).toDouble)
    for (parts <- Seq(1, 7, 32)) {
      val got = sketchQ(xs, k = 1024, parts = parts)
      phis.foreach { p =>
        assert(got(p) == exactQ(xs, p), s"phi=$p parts=$parts")
      }
    }
  }

  test("compacted regime: rank error within 2% of n across partitionings") {
    val n = 50000
    val xs = (1 to n).map(i => ((i.toLong * 48271) % 100000).toDouble)
    val sorted = xs.sorted
    for (parts <- Seq(1, 13, 64)) {
      val got = sketchQ(xs, k = 256, parts = parts)
      phis.foreach { p =>
        val est = got(p)
        // rank of the estimate in the true data
        val rank = sorted.count(_ <= est)
        val target = math.ceil(p * n)
        assert(math.abs(rank - target) <= 0.02 * n,
          s"phi=$p parts=$parts est=$est rank=$rank target=$target")
      }
    }
  }

  test("per-group aggregation with a shuffle exercises serde; n survives") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
      .repartition(16)
    val out = df.groupBy("g")
      .agg(KllQuantiles.of(col("v"), 4096, Seq(0.5)).as("qs"))
      .select(col("g"), col("qs")(0).getField("quantile").as("q"))
      .as[(String, Double)].collect().toMap
    // group g0: values 3,6,…,3000 (n=1000) → median = ceil(0.5*1000)=500th → 1500
    assert(out("g0") == 1500.0)
    assert(out("g1") == 1498.0) // 1,4,…,2998 → 500th = 1 + 499*3
    assert(out("g2") == 1499.0)
  }

  test("NULL and NaN inputs are skipped, not ranked") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0), Some(2.0))
      .toDF("v")
    val q = df.agg(KllQuantiles.of(col("v"), 64, Seq(1.0)).as("qs"))
      .select(col("qs")(0).getField("quantile")).as[Double].head()
    assert(q == 3.0) // max of the 3 real values
  }

  test("empty input yields NaN quantiles (the no-data marker)") {
    val q = Seq.empty[Double].toDF("v")
      .agg(KllQuantiles.of(col("v"), 64, Seq(0.5)).as("qs"))
      .select(col("qs")(0).getField("quantile")).as[Double].head()
    assert(q.isNaN)
  }

  test("non-double input is a loud type error, not a silent cast") {
    val ex = intercept[Exception] {
      Seq(1L, 2L).toDF("v")
        .agg(KllQuantiles.of(col("v"), 64, Seq(0.5))).collect()
    }
    assert(ex.getMessage.contains("DOUBLE"))
  }

  test("guards: k and phi ranges") {
    intercept[IllegalArgumentException] {
      KllQuantiles.of(col("v"), 7, Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      KllQuantiles.of(col("v"), 64, Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      KllQuantiles.of(col("v"), 64, Nil)
    }
  }

  test("buffer merge is weight-correct: skewed split equals even split") {
    // one partition holds 90% of the data — compaction promotes items
    // to weight-2^h levels; total weight must still equal n
    val xs = (1 to 20000).map(_.toDouble)
    val skewed = (xs.take(18000) ++ xs.drop(18000)).toDF("v")
      .withColumn("p", when(col("v") <= 18000, 0).otherwise(1))
      .repartition(2, col("p"))
    val got = skewed.agg(KllQuantiles.of(col("v"), 256, Seq(0.5)).as("qs"))
      .select(col("qs")(0).getField("quantile")).as[Double].head()
    assert(math.abs(got - 10000.0) <= 0.02 * 20000)
  }
}
