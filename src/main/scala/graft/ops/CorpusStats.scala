package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Incremental corpus statistics: MERGEABLE per-batch data cards.
  *
  * At 100 TB the corpus data card (doc counts, token totals, length
  * percentiles, distinct-content cardinality per (source, lang))
  * cannot be recomputed by rescanning the corpus after every ingest
  * batch — the stats must be maintained like the dedup indexes are:
  * compute a small mergeable summary per batch, fold it into the
  * running card, never touch old rows again. Every statistic here is
  * chosen for exact or sketch mergeability:
  *
  *  - counts / sums: add.
  *  - length percentiles: a value→count map (memory ∝ distinct
  *    lengths, the t18 data-card trick) — maps merge by key-wise sum,
  *    and EXACT linear-interpolation percentiles (quantile_cont
  *    semantics) come out of the merged map at finalize time.
  *  - distinct content: a Datasketches HLL sketch column
  *    (`hll_sketch_agg` built-in) — sketches union losslessly, the
  *    estimate is finalize-only. The one approximate field, clearly
  *    named `approx_distinct`.
  *
  * Invariant (the t20 gate): shardCard per batch → mergeCards →
  * finalizeCard equals the direct whole-corpus computation, exactly,
  * for every non-sketch field — regardless of how rows were split
  * into batches.
  */
object CorpusStats {

  private def reserved(keys: Seq[String]): Unit = {
    val clash = keys.intersect(Seq("n_docs", "n_empty", "total_tokens",
      "len_counts", "digest_hll", "avg_tokens", "p50_len", "p95_len",
      "approx_distinct", "__len", "__cnt", "__text", "__digest"))
    require(clash.isEmpty, s"key columns collide with card outputs: $clash")
    require(!keys.exists(_.startsWith("__")),
      s"key columns may not use the reserved __ prefix: $keys")
  }

  /** Left join whose key match is NULL-safe (`<=>` per key). The
    * `using`-column joins this replaces match with plain equality, so a
    * group keyed by NULL (lang=NULL is routine in crawl data) would
    * silently lose its length map / percentiles even though groupBy
    * kept the group. Right-side keys are re-aliased (fresh exprIds) so
    * the self-derived join resolves unambiguously.
    */
  private def nullSafeLeft(left: DataFrame, right: DataFrame,
                           keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"__k_$c"))
    val cond = keys.map(c => left(c) <=> renamed(s"__k_$c")).reduce(_ && _)
    left.join(renamed, cond, "left").drop(keys.map(c => s"__k_$c"): _*)
  }

  /** One batch → one card row per key group. `lenCol` must be numeric
    * (document length in whatever unit the card tracks); NULL lengths
    * are excluded from the percentile map (quantile_cont null-skip
    * semantics) but still counted in `n_docs`.
    *
    * ONE batch scan: every scalar is partial-aggregated through the
    * per-(keys, len) level (long sums are exact at any grouping; the
    * HLL registers union losslessly, so the level-2 `hll_union_agg`
    * equals the direct sketch), the NULL-length group rides the same
    * aggregate and is dropped only from the length map. The former
    * shape aggregated scalars and the length map as two branches off
    * the batch and joined them back — TWO scans (and a join) per
    * batch, the dominant cost of the per-batch card pass at corpus
    * scale.
    */
  def shardCard(df: DataFrame, keys: Seq[String], textCol: String,
                lenCol: String): DataFrame = {
    require(keys.nonEmpty, "shardCard needs at least one key column")
    reserved(keys)
    val k = keys.map(col)
    // two-level: per-(keys, len) counts first, so the map aggregation
    // is memory ∝ distinct lengths — never rows
    val base = df.select(k ++ Seq(
      col(textCol).as("__text"), col(lenCol).cast("long").as("__len"),
      sha2(coalesce(col(textCol), lit("")), 256).as("__digest")): _*)
    base.groupBy(k :+ col("__len"): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sum(when(col("__text").isNull ||
          trim(col("__text")) === "", 1L).otherwise(0L)).as("__emp"),
        sum(F.tokenCount(col("__text")).cast("long")).as("__tok"),
        hll_sketch_agg(col("__digest")).as("__hll"))
      .groupBy(k: _*)
      .agg(
        sum("__cnt").as("n_docs"),
        sum("__emp").as("n_empty"),
        sum("__tok").as("total_tokens"),
        hll_union_agg(col("__hll")).as("digest_hll"),
        // collect_list skips NULLs: the NULL-length group contributes
        // its scalars above but no map entry — quantile null-skip
        map_from_entries(sort_array(collect_list(
          when(col("__len").isNotNull, struct(col("__len"), col("__cnt"))))))
          .as("len_counts"))
  }

  /** Any number of card frames (one per batch, or a running card plus
    * a new batch's) → one merged card: sums add, length maps merge by
    * key-wise sum, HLL sketches union. Two small aggregates over CARD
    * rows — corpus data is never touched. The input is materialized
    * once ([[Checkpoints.truncate]] — card-scale rows) so a LAZY card
    * frame (an in-flight [[shardCard]] whose batch was never written)
    * is not re-aggregated by the second branch: without the snapshot
    * each branch re-ran every input card's batch scan.
    */
  def mergeCards(cards: DataFrame, keys: Seq[String]): DataFrame = {
    reserved(keys)
    val k = keys.map(col)
    val snap = Checkpoints.truncate(cards)
    val scalars = snap.groupBy(k: _*)
      .agg(
        sum("n_docs").as("n_docs"),
        sum("n_empty").as("n_empty"),
        sum("total_tokens").as("total_tokens"),
        hll_union_agg(col("digest_hll")).as("digest_hll"))
    val lens = snap
      .select(k :+ explode(col("len_counts")).as(Seq("__len", "__cnt")): _*)
      .groupBy(k :+ col("__len"): _*)
      .agg(sum("__cnt").as("__cnt"))
      .groupBy(k: _*)
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("__len"), col("__cnt"))))).as("len_counts"))
    nullSafeLeft(scalars, lens, keys)
      .withColumn("len_counts",
        coalesce(col("len_counts"), map_from_entries(array().cast(
          "array<struct<__len:long,__cnt:long>>"))))
  }

  /** Merged card → the readable corpus card: exact `quantile_cont`-
    * semantics percentiles out of the length map (sorted lens +
    * cumulative counts, linear interpolation at p·(n−1)), token
    * average, HLL distinct estimate. The explode is over (keys ×
    * distinct lengths) — card-sized, not corpus-sized.
    */
  def finalizeCard(merged: DataFrame, keys: Seq[String],
                   percentiles: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1]: $percentiles")
    reserved(keys)
    val pNames = percentiles.map(p => s"p${(p * 100).round}_len")
    require(pNames.distinct.size == pNames.size,
      s"percentiles round to colliding column names: " +
        percentiles.zip(pNames).mkString(", ") +
        " — use percentiles that differ by at least 0.01")
    val k = keys.map(col)
    // card-scale snapshot: the quantile branch and the final join both
    // read `merged`; lazy input (a direct shardCard) would otherwise
    // pay its batch scan twice more here
    val snap = Checkpoints.truncate(merged)
    val w = Window.partitionBy(k: _*).orderBy(col("__len"))
    val exploded = snap
      .select(k :+ explode(col("len_counts")).as(Seq("__len", "__cnt")): _*)
      .withColumn("__cum", sum("__cnt").over(w))
      .withColumn("__prev", col("__cum") - col("__cnt"))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(k: _*)))
    // rank r (0-based) lives in the len whose [prev, cum) covers it
    def valueAt(r: Column): Column =
      min(when(col("__prev") <= r && r < col("__cum"), col("__len")))
    val pCols = percentiles.zip(pNames).map { case (p, name) =>
      val pos = (col("__n") - 1) * lit(p)
      val i0 = floor(pos)
      val frac = pos - i0
      val v0 = valueAt(i0)
      val v1 = valueAt(least(i0 + 1, col("__n") - 1))
      (v0 + (v1 - v0) * max(frac)).as(name)
    }
    val quants = exploded.groupBy(k: _*).agg(pCols.head, pCols.tail: _*)
    nullSafeLeft(snap, quants, keys)
      .withColumn("avg_tokens",
        when(col("n_docs") > 0,
          round(col("total_tokens") / col("n_docs"), 6)))
      .withColumn("approx_distinct",
        hll_sketch_estimate(col("digest_hll")).cast("long"))
      .drop("len_counts", "digest_hll")
  }
}
