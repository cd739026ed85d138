package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Weighted PageRank + degree cards ([[Graph]]): hand-iterated tiny
  * graphs, rank-mass conservation, weighted spreading, dangling
  * redistribution, early convergence, and degree-card exactness.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  private def ranksOf(edges: Seq[(String, String)], iters: Int,
                      tol: Double = 0.0): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iterations = iters, tol = tol)
      .as[(String, Double)].collect().toMap

  /** Reference implementation: dense in-memory PageRank, same
    * semantics, hand-auditable.
    */
  private def dense(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val w = edges.groupBy(identity).map { case (e, v) => e -> v.size.toLong }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outW = w.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outW.contains).map(r).sum
      r = nodes.map { v =>
        val in = w.collect { case ((s, d), wt) if d == v =>
          r(s) * wt / outW(s) }.sum
        v -> (0.15 / n + 0.85 * (in + dang / n))
      }.toMap
    }
    r
  }

  test("two-node cycle converges to the uniform distribution") {
    val got = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 8)
    assert(math.abs(got("a") - 0.5) < eps)
    assert(math.abs(got("b") - 0.5) < eps)
  }

  test("hand-iterated star: hub drains into dangling spokes") {
    // h -> x, h -> y; x, y dangling. One round from uniform (1/3 each):
    // dang = r(x)+r(y) = 2/3; r'(h) = 0.05 + 0.85*(2/9) = 0.238888...
    // r'(x) = r'(y) = 0.05 + 0.85*(1/6 + 2/9).
    val got = ranksOf(Seq(("h", "x"), ("h", "y")), iters = 1)
    assert(math.abs(got("h") - (0.15 / 3 + 0.85 * (2.0 / 3 / 3))) < eps)
    val spoke = 0.15 / 3 + 0.85 * (1.0 / 3 / 2 + 2.0 / 3 / 3)
    assert(math.abs(got("x") - spoke) < eps)
    assert(math.abs(got("y") - spoke) < eps)
  }

  test("rank mass sums to 1 after every iteration count") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a"), ("e", "d"), ("e", "e"))
    for (i <- Seq(1, 3, 7)) {
      val got = ranksOf(edges, iters = i)
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass drifted at $i iters")
    }
  }

  test("matches the dense reference on an irregular weighted graph") {
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
      ("c", "d"), ("d", "a"), ("e", "c"), ("e", "c"), ("e", "f"))
    val got = ranksOf(edges, iters = 6)
    val want = dense(edges, iters = 6)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
  }

  test("parallel edges weight the split: 2x edge gets 2x contribution") {
    // a -> b (twice), a -> c (once): b receives 2/3 of a's spread.
    val got = ranksOf(Seq(("a", "b"), ("a", "b"), ("a", "c")), iters = 1)
    val aSpread = 0.85 * (1.0 / 3)
    val dangPart = 0.85 * (2.0 / 3 / 3) // b and c are dangling
    assert(math.abs(got("b") - (0.05 + aSpread * 2 / 3 + dangPart)) < eps)
    assert(math.abs(got("c") - (0.05 + aSpread * 1 / 3 + dangPart)) < eps)
  }

  test("tol > 0 stops early on a converged cycle, same answer") {
    val exact = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 50)
    val early = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 50, tol = 1e-12)
    for ((k, v) <- exact) assert(math.abs(early(k) - v) < 1e-9)
  }

  test("null endpoints are dropped, not counted as nodes") {
    val edges = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 2)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === Set("a", "b"))
  }

  test("degreeStats: exact in/out degrees and weights, zero-filled") {
    val got = Graph.degreeStats(
        Seq(("a", "b"), ("a", "b"), ("a", "c"), ("c", "a")).toDF("src", "dst"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") === ((2L, 1L, 3L, 1L))) // out: b(w2), c(w1); in: c->a
    assert(got("b") === ((0L, 1L, 0L, 2L)))
    assert(got("c") === ((1L, 1L, 1L, 1L)))
  }

  test("guards: empty edges, bad damping, bad iterations") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(empty) }
    val e = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(e, damping = 1.0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, iterations = 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, tol = -1) }
  }
}
