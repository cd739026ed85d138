package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CountMin, HeavyHitters}

/** Mergeable-sketch gate queries: the summaries a 1000-executor
  * cluster ships to the reducer instead of raw domains — Misra–Gries
  * heavy hitters ([[graft.functions.HeavyHitters]]) and DataSketches
  * HLL distinct cards (Spark's built-in `hll_sketch_agg` family).
  *
  * Gate strategy: a sketch is only DuckDB-checkable in its EXACT
  * regime, so each gate is constructed inside it — sk1's item domain
  * (97–100 lang:source pairs) sits under its 128-entry capacity, so
  * every count is exact and max_err is 0; the approximation bounds on
  * over-capacity domains are property-tested in FreqSketchSpec /
  * SketchesSpec instead (the driver's hash compare cannot express
  * "within ±N/k").
  */
object SketchQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- sk1: Misra–Gries heavy hitters over the (lang, source) domain.
    //    Capacity 128 > the ~100 distinct pairs → zero decrements at
    //    every stage, so the sketch IS the exact group-by, shipped as
    //    one ≤128-entry summary per partial instead of a full shuffle
    //    of the domain. --------------------------------------------
    "sk1_heavy_hitters" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      docs
        .agg(HeavyHitters.of(
          concat_ws(":", col("lang"), col("source")), 128).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(
          col("e.item").as("item"),
          col("e.count").as("cnt"),
          col("e.max_err").as("max_err"))
        .orderBy(desc("cnt"), asc("item"))
    },

    // -- sk2: per-shard HLL distinct cards, merged. Each source's
    //    shard builds one HLL sketch of its user domain; the union of
    //    the sketches estimates the global distinct count — the
    //    mergeable-summaries shape for "distinct users per day across
    //    10k shards" where count(DISTINCT) would shuffle every value.
    //    lgK 14 keeps the sketch in its exact (coupon) regime for this
    //    corpus, pinned by the oracle's true count(DISTINCT); the
    //    estimate-vs-exact tolerance on big domains is spec-tested. --
    "sk2_hll_union" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val shardSketches = ev
        .groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
          count_distinct(col("user_id")).as("n_users"))
      graft.ops.ScalarFold.withScalars(
        shardSketches.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long")
            .as("est_total_users"),
          sum("n_users").as("sum_per_type")),
        ev.agg(count_distinct(col("user_id")).as("true_total_users")))
        .select("est_total_users", "true_total_users", "sum_per_type")
    },

    // -- sk3: count–min — per-event-type shard sketches of the user_id
    //    stream (Spark's built-in count_min_sketch), UNIONED by
    //    count_min_merge without re-touching the data, then point-
    //    queried for the 10 smallest user ids. Gate regime: width
    //    2/eps = 20k ≫ the sf0.01 user domain, so the probability
    //    every one of the 7 depth rows collides is ~(D/20k)^7 ≈ 0 and
    //    each estimate equals the exact count the oracle computes; the
    //    over-width upper-bound property is spec-tested instead. ------
    // -- sk4: KLL quantile sketch per event type. Gate regime: k=4096
    //    exceeds every group's row count (~2000 at sf0.01), so no
    //    compaction fires at any stage and each reported quantile IS
    //    the exact discrete quantile (smallest value with cumulative
    //    rank ≥ ⌈phi·n⌉) regardless of partial merge order — the same
    //    exact-regime strategy as sk1/sk3. Error bounds on
    //    over-capacity streams are property-tested in KllQuantileSpec.
    "sk4_kll_quantiles" -> { (s, d) =>
      val ev = Tables.events(s, d)
      ev.groupBy("event_type")
        .agg(graft.functions.KllQuantiles.of(col("value"), 4096,
          Seq(0.25, 0.5, 0.75, 0.9, 0.99)).as("qs"))
        .select(col("event_type"), explode(col("qs")).as("e"))
        .select(col("event_type"), col("e.phi").as("phi"),
          col("e.quantile").as("q"))
        .orderBy("event_type", "phi")
    },

    // -- sk5: KMV theta sketch set operations — the distinct summary
    //    HLL cannot give: intersection and difference estimates
    //    between separately-built sketches ("users both corpora
    //    touched" without shuffling either domain). Gate regime:
    //    k=1024 > both ~150-user domains → θ=1, the sketches ARE the
    //    distinct hash sets, every estimate exact; and "k smallest of
    //    a set" is merge-order invariant, so the estimates are
    //    bit-stable across shuffle fetch orders. Saturated-regime
    //    error is property-tested in KmvSketchSpec. ------------------
    "sk5_theta_set_ops" -> { (s, d) =>
      import graft.functions.Kmv
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_type") === "click" && col("value") < 100)
      val b = ev.filter(col("event_type") === "view" && col("value") < 150)
      val ska = a.agg(Kmv.sketch(col("user_id"), 1024).as("ska"))
      val skb = b.agg(Kmv.sketch(col("user_id"), 1024).as("skb"))
      graft.ops.ScalarFold.withScalars(ska, skb)
        .select(
          Kmv.estimate(col("ska")).cast("long").as("n_a"),
          Kmv.estimate(col("skb")).cast("long").as("n_b"),
          Kmv.unionEstimate(col("ska"), col("skb")).cast("long")
            .as("n_union"),
          Kmv.intersectEstimate(col("ska"), col("skb")).cast("long")
            .as("n_intersect"),
          Kmv.diffEstimate(col("ska"), col("skb")).cast("long")
            .as("n_diff"))
    },

    "sk3_countmin" -> { (s, d) =>
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      val shardSketches = ev
        .groupBy("event_type")
        .agg(count_min_sketch(col("user_id"),
          lit(0.0001), lit(0.999), lit(42)).as("sk"))
      val merged = shardSketches.agg(CountMin.merge(col("sk")).as("sk"))
      val probes = ev.select("user_id").distinct()
        .orderBy("user_id").limit(10)
      graft.ops.ScalarFold.withScalars(probes, merged)
        .select(col("user_id"),
          CountMin.estimate(col("sk"), col("user_id")).as("est"))
        .orderBy("user_id")
    })

  def oracle: Map[String, String] = Map(
    "sk1_heavy_hitters" ->
      """SELECT lang || ':' || source AS item,
        |  count(*) AS cnt, CAST(0 AS BIGINT) AS max_err
        |FROM documents
        |GROUP BY 1
        |ORDER BY cnt DESC, item""".stripMargin,
    // the inverted-CDF definition replayed in SQL: smallest value
    // whose within-group rank reaches ceil(phi·n) — Spark and DuckDB
    // compute ceil over the SAME double product, so the cut agrees
    "sk4_kll_quantiles" ->
      """WITH p(phi) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)),
        |r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, phi, min(value) AS q
        |FROM r CROSS JOIN p
        |WHERE rn >= ceil(phi * n)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "sk5_theta_set_ops" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'click' AND value < 100
        |    AND user_id IS NOT NULL),
        |b AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'view' AND value < 150
        |    AND user_id IS NOT NULL)
        |SELECT
        |  (SELECT count(*) FROM a) AS n_a,
        |  (SELECT count(*) FROM b) AS n_b,
        |  (SELECT count(*) FROM
        |    (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS n_union,
        |  (SELECT count(*) FROM
        |    (SELECT user_id FROM a INTERSECT SELECT user_id FROM b))
        |    AS n_intersect,
        |  (SELECT count(*) FROM
        |    (SELECT user_id FROM a EXCEPT SELECT user_id FROM b))
        |    AS n_diff""".stripMargin,
    "sk3_countmin" ->
      """SELECT user_id, count(*) AS est
        |FROM events
        |WHERE user_id IN (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE user_id IS NOT NULL ORDER BY user_id LIMIT 10)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sk2_hll_union" ->
      """SELECT count(DISTINCT user_id) AS est_total_users,
        |  count(DISTINCT user_id) AS true_total_users,
        |  (SELECT CAST(sum(n_users) AS BIGINT) FROM (
        |     SELECT event_type, count(DISTINCT user_id) AS n_users
        |     FROM events GROUP BY 1)) AS sum_per_type
        |FROM events""".stripMargin)
}
