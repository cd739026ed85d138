package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl curation. Common Crawl-scale
  * pipelines rank hosts by their position in the web link graph —
  * harmonic centrality / PageRank over host→host edges — and feed the
  * score into crawl prioritization and quality weighting (the signal
  * behind "seed quality" in CCNet-family pipelines). This is the
  * weighted-PageRank operator over an arbitrary `(src, dst)` edge
  * frame; pair it with [[UrlOps.registrableDomain]] to build the host
  * graph from extracted links.
  *
  * Semantics (Page et al. 1999, weighted variant):
  *  - parallel edges aggregate to an integer weight w(s,d); a node's
  *    contribution spreads proportionally, rank(s) · w(s,d) / W(s);
  *  - dangling nodes (no out-edges) redistribute their whole rank
  *    uniformly, so Σ rank = 1 after every iteration;
  *  - rank'(v) = (1−d)/N + d · (Σ_in contribs + danglingMass/N).
  *
  * Scale shape: per iteration ONE shuffle — the contribution
  * aggregate keyed by dst — plus a left join back onto the node
  * frame; edge weights and out-totals are computed once and persisted;
  * the dangling mass and the convergence probe ride the round's
  * checkpoint materialization as observe() accumulators (no dedicated
  * per-round jobs); every round's plan is checkpoint-truncated
  * ([[Checkpoints.Rounds]]) so iteration N never embeds N−1 plans.
  * Nothing but per-round scalars (node count, dangling mass, max
  * movement) ever reaches the driver.
  */
object Graph {

  /** Weighted PageRank of `edges` (`srcCol`, `dstCol`; parallel edges
    * count as weight). Returns `(node, rank)`, Σ rank = 1.
    *
    * Runs exactly `iterations` rounds when `tol` is 0 (the
    * deterministic gate configuration); with `tol > 0` stops early
    * once no node's rank moved by more than `tol` (an existence probe
    * per round — same pattern as [[Dedup.duplicateGroups]]).
    *
    * `ckptEvery` > 1 (fixed-iteration mode only) materializes the rank
    * frame every K-th round and carries the dangling mass through the
    * lazy span as a folded one-row aggregate. MEASURED WORSE at every
    * tried K (r18, 5-iter cold A/Bs at sf0.1/local[32]: K=1 9.2 s
    * median, K=2 12.4, K=5 25.9): inside a lazy span the previous
    * round's contribution shuffle is re-executed under the dangling
    * aggregate branch (the two consumers prune differently, so neither
    * static nor AQE runtime exchange reuse collapses them) — the
    * re-execution costs more than the skipped checkpoint at ANY scale,
    * and more so at larger ones. Default stays 1 (checkpoint every
    * round); the knob records the experiment.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 10,
               damping: Double = 0.85, tol: Double = 0.0,
               ckptEvery: Int = 1): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(damping > 0 && damping < 1,
      s"damping must be in (0, 1), got $damping")
    require(tol >= 0, s"tol must be non-negative, got $tol")
    require(ckptEvery >= 1, s"ckptEvery must be positive, got $ckptEvery")

    // Loop-invariant frames, computed once and persisted (guide §2.4:
    // a shuffle repeated every round for the same result is the first
    // exchange to delete). `wj` pre-attaches each edge's out-weight
    // total so the per-round contribution join touches ONE invariant
    // frame (already hash-partitioned by __src from its own join) and
    // only the small rank frame shuffles; `dangNodes` is the invariant
    // no-out-edge node set, so the per-round dangling mass is a
    // broadcast semi-join instead of a ranks×outW anti-join shuffle.
    val w = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .groupBy("__src", "__dst").agg(count(lit(1)).as("__w"))
    val outW = w.groupBy("__src").agg(sum("__w").as("__wout"))
    val wj = w.join(outW, "__src").persist()
    // Node frame with the dangling flag attached ONCE (no out-edges):
    // the flag rides the rank frame through every round, so the
    // per-round dangling mass is a filter+aggregate over the already-
    // checkpointed ranks — no per-round anti/semi-join, no broadcast.
    // Derived from the cached wj (same rows as w), so the raw edge
    // aggregation runs once and only ONE invariant frame is cached.
    val nodes = wj.select(col("__src").as("node"))
      .unionByName(wj.select(col("__dst").as("node")))
      .distinct()
      .join(wj.select(col("__src").as("node"), lit(true).as("__hasout"))
          .distinct(),
        Seq("node"), "left")
      .select(col("node"), col("__hasout").isNull.as("__dang"))
      .persist()
    try {
      val n = nodes.count()
      require(n > 0, "pageRank needs at least one edge")
      val base = lit((1.0 - damping) / n)

      // The per-round scalars — dangling mass, and (tol > 0) the max
      // rank movement — RIDE the round's checkpoint materialization as
      // observe() accumulators instead of running as dedicated
      // aggregate jobs over the checkpointed blocks: the rows are
      // already streaming through the checkpoint action, so both
      // scalars cost zero extra jobs and zero extra exchanges
      // (guide §1.5/§2.4; firing-on-truncate proven in OpsSpec).
      def dangMetric = coalesce(
        sum(when(col("__dang"), col("rank"))), lit(0.0)).as("__dangmass")

      val rounds = new Checkpoints.Rounds
      val initObs = org.apache.spark.sql.Observation()
      var ranks = rounds.truncate(
        nodes.withColumn("rank", lit(1.0 / n)).observe(initObs, dangMetric))
      // The dangling mass enters each round either as a LITERAL (the
      // previous round was checkpoint-materialized and observed) or,
      // inside a lazy span (`ckptEvery` > 1, fixed-iteration mode), as
      // a one-row aggregate over the previous LAZY rank frame folded
      // onto every row (ScalarFold) — the exact same double either
      // way (one partial-sum aggregate of the same rows).
      var dangLit: Option[Double] =
        Some(initObs.get("__dangmass").asInstanceOf[Double])
      var iter = 0
      var converged = false
      while (!converged && iter < iterations) {
        val contribs = wj
          .join(ranks.select(col("node").as("__src"), col("rank")), "__src")
          .groupBy(col("__dst").as("node"))
          .agg(sum(col("rank") * col("__w") / col("__wout")).as("__contrib"))
        // With tol = 0 (fixed-iteration mode) the previous round's rank
        // is never read back, so the new rank frame hangs off the
        // STATIC node set — node-partitioned from its own distinct(),
        // exchange-reused round over round — instead of re-shuffling
        // the rank frame a second time per round.
        val prevJoined =
          if (tol > 0)
            ranks.select(col("node"), col("__dang"), col("rank").as("__prev"))
          else nodes.withColumn("__prev", lit(null).cast("double"))
        val joined = prevJoined.join(contribs, Seq("node"), "left")
        // Rank parked on nodes with no out-edges redistributes evenly.
        val withMass = dangLit match {
          case Some(m) => joined.withColumn("__dangmass", lit(m))
          case None => ScalarFold.withScalars(joined,
            ranks.filter(col("__dang"))
              .agg(coalesce(sum("rank"), lit(0.0)).as("__dangmass")))
        }
        val nextPlan = withMass
          .select(col("node"), col("__dang"), col("__prev"),
            (base + lit(damping) *
              (coalesce(col("__contrib"), lit(0.0)) +
                col("__dangmass") / n)).as("rank"))
        // Checkpoint boundaries: every round under tol > 0 (the max-
        // movement probe needs a per-round materialization anyway),
        // else every `ckptEvery`-th round and the last. Inside a lazy
        // span the round's rank frame is consumed twice (next round's
        // contribution join + its dangling aggregate) — the two
        // references share one canonical exchange subtree, so runtime
        // exchange reuse executes the contribution shuffle once.
        val boundary = tol > 0 ||
          (iter + 1) % ckptEvery == 0 || iter + 1 == iterations
        if (boundary) {
          val roundObs = org.apache.spark.sql.Observation()
          val metrics =
            if (tol > 0) Seq(dangMetric,
              max(abs(col("rank") - col("__prev"))).as("__maxdiff"))
            else Seq(dangMetric)
          val next = rounds.truncate(
            nextPlan.observe(roundObs, metrics.head, metrics.tail: _*))
          dangLit = Some(roundObs.get("__dangmass").asInstanceOf[Double])
          converged = tol > 0 &&
            roundObs.get("__maxdiff").asInstanceOf[Double] <= tol
          ranks = next.select("node", "__dang", "rank")
        } else {
          dangLit = None
          ranks = nextPlan.select("node", "__dang", "rank")
        }
        iter += 1
      }
      ranks.select("node", "rank")
    } finally {
      wj.unpersist(); nodes.unpersist()
    }
  }

  /** In/out degree and weight totals per node — the cheap graph card
    * next to [[pageRank]]: `(node, out_deg, in_deg, out_weight,
    * in_weight)` with zeros for missing sides.
    */
  def degreeStats(edges: DataFrame, srcCol: String = "src",
                  dstCol: String = "dst"): DataFrame = {
    val w = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .groupBy("__src", "__dst").agg(count(lit(1)).as("__w"))
    // ONE pass over the weighted edge frame: each edge explodes into
    // its (src, out) and (dst, in) contributions and one aggregate
    // keyed by node folds both sides. The former per-side groupBy +
    // full-outer join computed the edge aggregation TWICE (no exchange
    // reuse across the join's two aggregation branches — plan audited)
    // and paid two extra exchanges plus the join's sorts; this shape
    // is two exchanges total at any scale. Same result by definition:
    // out_deg(n) = |w rows with __src = n|, weights are exact integer
    // sums, and a node appears iff it has at least one edge end —
    // the full-outer-join row set.
    w.select(explode(array(
        struct(col("__src").as("node"), lit(true).as("__out"), col("__w")),
        struct(col("__dst").as("node"), lit(false).as("__out"), col("__w"))))
        .as("__e"))
      .select(col("__e.node").as("node"), col("__e.__out").as("__out"),
        col("__e.__w").as("__w"))
      .groupBy("node")
      .agg(
        sum(when(col("__out"), 1L).otherwise(0L)).as("out_deg"),
        sum(when(!col("__out"), 1L).otherwise(0L)).as("in_deg"),
        sum(when(col("__out"), col("__w")).otherwise(0L)).as("out_weight"),
        sum(when(!col("__out"), col("__w")).otherwise(0L)).as("in_weight"))
  }
}
