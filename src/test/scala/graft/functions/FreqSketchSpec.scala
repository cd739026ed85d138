package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}

/** Misra–Gries heavy-hitters sketch ([[HeavyHitters]]): exactness in
  * the under-capacity regime, the two MG guarantees in the
  * over-capacity regime, merge correctness across partitions, and the
  * SQL surface.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  /** (item, count, max_err) rows from one whole-frame sketch. */
  private def sketch(items: Seq[String], cap: Int, parts: Int): Seq[(String, Long, Long)] = {
    items.toDF("w").repartition(parts)
      .agg(HeavyHitters.of(col("w"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.item", $"e.count", $"e.max_err")
      .as[(String, Long, Long)].collect().toSeq
  }

  test("under-capacity regime is the exact group-by, in sorted order") {
    val items = new scala.util.Random(7).shuffle(
      Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(25)("c") ++ Seq.fill(10)("d"))
    val got = sketch(items, cap = 8, parts = 5)
    assert(got === Seq(("a", 40L, 0L), ("b", 25L, 0L), ("c", 25L, 0L), ("d", 10L, 0L)))
  }

  test("count-ties sort by item ascending (deterministic output)") {
    val got = sketch(Seq("z", "y", "z", "y", "m"), cap = 8, parts = 2)
    assert(got === Seq(("y", 2L, 0L), ("z", 2L, 0L), ("m", 1L, 0L)))
  }

  test("over-capacity: every frequency > N/(cap+1) survives, bounds hold") {
    val rnd = new scala.util.Random(42)
    // 3 heavy items among a long tail of singletons.
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++ Seq.fill(200)("hot3")
    val tail = (0 until 2000).map(i => s"tail_$i")
    val items = rnd.shuffle(heavy ++ tail)
    val n = items.size.toLong
    val cap = 32
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    for (parts <- Seq(1, 7)) {
      val got = sketch(items, cap, parts)
      assert(got.size <= cap)
      val est = got.map(r => r._1 -> r._2).toMap
      val errs = got.map(_._3).distinct
      assert(errs.size === 1, "max_err is a summary-wide bound")
      val err = errs.head
      assert(err <= n / (cap + 1),
        s"decrement total $err exceeds N/(cap+1) = ${n / (cap + 1)}")
      // Guarantee 1: heavy items present.
      for (h <- Seq("hot1", "hot2", "hot3")) {
        assert(truth(h) > n / (cap + 1))
        assert(est.contains(h), s"$h (true ${truth(h)}) missing at parts=$parts")
      }
      // Guarantee 2: count is a lower bound, within err of truth.
      for ((item, c) <- est) {
        assert(c <= truth(item), s"$item overcounted: $c > ${truth(item)}")
        assert(truth(item) - c <= err, s"$item undercount exceeds max_err")
      }
    }
  }

  test("merge across many partitions equals the guarantees of one pass") {
    // Same stream, 1 vs 16 partitions: both must satisfy the MG
    // bounds; the heavy item's presence must not depend on the split.
    val items = Seq.fill(500)("big") ++ (0 until 3000).map(i => s"t$i")
    val one = sketch(items, cap = 16, parts = 1)
    val many = sketch(items, cap = 16, parts = 16)
    for (got <- Seq(one, many)) {
      val est = got.map(r => r._1 -> r._2).toMap
      assert(est.contains("big"))
      assert(est("big") <= 500L && 500L - est("big") <= got.head._3)
    }
  }

  test("null items are skipped, weights of survivors unaffected") {
    val got = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("w")
      .agg(HeavyHitters.of(col("w"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.item", $"e.count").as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }

  test("grouped sketches: one bounded summary per group") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "w").repartition(3)
    val got = df.groupBy("g")
      .agg(HeavyHitters.of(col("w"), 4).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select($"g", $"e.item", $"e.count")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }

  test("SQL surface heavy_hitters(item, cap) matches the Column API") {
    GraftExtensions.register(spark)
    val df = Seq("a", "b", "a", "c", "a").toDF("w")
    df.createOrReplaceTempView("hh_words")
    val viaSql = spark.sql(
      "SELECT explode(heavy_hitters(w, 8)) AS e FROM hh_words")
      .select($"e.item", $"e.count", $"e.max_err")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaSql === Seq(("a", 3L, 0L), ("b", 1L, 0L), ("c", 1L, 0L)))
  }

  test("SQL surface rejects non-literal or non-positive capacity") {
    GraftExtensions.register(spark)
    Seq("a").toDF("w").createOrReplaceTempView("hh_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT heavy_hitters(w, 0) FROM hh_bad").collect()
    }
    assert(e.getMessage.contains("capacity must be positive"))
  }

  test("non-string items: long domain sketches exactly under capacity") {
    val got = Seq(1L, 2L, 1L, 3L, 1L, 2L).toDF("v").repartition(2)
      .agg(HeavyHitters.of(col("v"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.item", $"e.count").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }
}
