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
    // sign flip: MinValue is the smallest value -> code 0
    assert(ZOrderUtil.interleave(Int.MinValue, Int.MinValue) == 0L)
    assert(ZOrderUtil.interleave(Int.MinValue, Int.MinValue + 1) == 1L)
    assert(ZOrderUtil.interleave(Int.MinValue + 1, Int.MinValue) == 2L)
    assert(ZOrderUtil.interleave(Int.MaxValue, Int.MaxValue) == -1L) // all 64 bits set
  }

  test("monotone in each coordinate (unsigned code order)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val a1, a2, b = rnd.nextInt()
      if (a1 != a2) {
        val (lo, hi) = if (a1 < a2) (a1, a2) else (a2, a1)
        assert(java.lang.Long.compareUnsigned(
          ZOrderUtil.interleave(lo, b), ZOrderUtil.interleave(hi, b)) < 0)
        assert(java.lang.Long.compareUnsigned(
          ZOrderUtil.interleave(b, lo), ZOrderUtil.interleave(b, hi)) < 0)
      }
    }
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
