package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("spread/interleave kernel known values") {
    assert(ZOrderUtil.spread(0) == 0L)
    assert(ZOrderUtil.spread(1) == 1L)
    assert(ZOrderUtil.spread(3) == 5L)                 // 0b11 -> 0b101
    assert(ZOrderUtil.spread(-1) == 0x5555555555555555L)
    // (MinValue, MinValue) is the smallest pair -> the smallest SIGNED
    // code; (MaxValue, MaxValue) the largest. Signed order matters:
    // Spark's sort and parquet row-group stats compare Longs signed.
    assert(ZOrderUtil.interleave(Int.MinValue, Int.MinValue) == Long.MinValue)
    assert(ZOrderUtil.interleave(Int.MinValue, Int.MinValue + 1) == Long.MinValue + 1)
    assert(ZOrderUtil.interleave(Int.MinValue + 1, Int.MinValue) == Long.MinValue + 2)
    assert(ZOrderUtil.interleave(Int.MaxValue, Int.MaxValue) == Long.MaxValue)
  }

  test("monotone in each coordinate under SIGNED Long order (the sort's order)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val a1, a2, b = rnd.nextInt()
      if (a1 != a2) {
        val (lo, hi) = if (a1 < a2) (a1, a2) else (a2, a1)
        assert(ZOrderUtil.interleave(lo, b) < ZOrderUtil.interleave(hi, b))
        assert(ZOrderUtil.interleave(b, lo) < ZOrderUtil.interleave(b, hi))
      }
    }
    // the mixed-sign boundary specifically: negative a sorts before 0
    assert(ZOrderUtil.interleave(-1, 0) < ZOrderUtil.interleave(0, 0))
    assert(ZOrderUtil.interleave(0, -1) < ZOrderUtil.interleave(0, 0))
  }

  test("z-sort groups quadrants: both dims cluster at once") {
    val grid = for (a <- 0 until 4; b <- 0 until 4) yield (a, b)
    val sorted = grid.sortBy { case (a, b) =>
      ZOrderUtil.interleave(a, b) } // non-negative ints: flipped order preserved
    // the first quarter of the curve is exactly the (a<2, b<2) quadrant
    assert(sorted.take(4).forall { case (a, b) => a < 2 && b < 2 })
    assert(sorted.takeRight(4).forall { case (a, b) => a >= 2 && b >= 2 })
  }

  test("expression matches kernel through codegen, null-safe, SQL-registered") {
    val df = Seq((3, 7), (0, 0), (-5, 12), (Int.MaxValue, Int.MinValue))
      .toDF("a", "b")
    val got = df.select(ZOrder2.of($"a", $"b")).as[Long].collect().toSeq
    val want = Seq(ZOrderUtil.interleave(3, 7), ZOrderUtil.interleave(0, 0),
      ZOrderUtil.interleave(-5, 12),
      ZOrderUtil.interleave(Int.MaxValue, Int.MinValue))
    assert(got == want)

    val withNull = Seq((Some(1), None: Option[Int])).toDF("a", "b")
    assert(withNull.select(ZOrder2.of($"a", $"b")).collect().head.isNullAt(0))

    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("zt")
    val sqlGot = spark.sql("SELECT zorder2(a, b) FROM zt").as[Long].collect().toSeq
    assert(sqlGot == want)
  }
}
