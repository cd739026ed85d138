package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators over the testdata star schema: scans with
  * pushdown, aggregations, broadcast/shuffle joins, anti/semi joins,
  * window ordering checks, top-k and set operations.
  *
  * Maps to SURVEY.md §2.1 (S1/S6 scans), §2.4 (J1–J4 joins), §2.5
  * (A1–A6 aggregations), §2.6 (W1 ordering), §2.7 (top-k), §2.8 (set
  * ops). Every query carries a DuckDB oracle with IDENTICAL output
  * column names and explicit rounding on float aggregates (double sums
  * are order-dependent in the last ulps; rounding makes both engines
  * land on the same decimal).
  *
  * Scale notes (100 TB design): small dims (region/nation/customer/
  * supplier/part) are broadcast; fact-fact joins shuffle on their join
  * key only; no global windows except where the semantic IS file-order
  * (W1), which partitions by user_id instead of a single global sort.
  */
object CoreQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- S1/A-family: full-scan grouped aggregate (pricing summary) ----
    "q1_pricing_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // -- S1: filter + projection; predicate and column pruning reach the
    //    parquet scan (PushedFilters in .explain).
    "q2_filter_project" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 47 && col("l_discount") < 0.02)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // -- S6: record counts (count-scan prunes all columns) -------------
    "s6_counts" -> { (s, d) =>
      Seq("lineitem", "orders", "customer", "events", "documents")
        .map(t => Tables.load(s, d, t).agg(count(lit(1)).as("n")).withColumn("tbl", lit(t)))
        .reduce(_.unionByName(_))
        .orderBy("tbl")
    },

    // -- J: fact⋈fact⋈broadcast-dim join with grouped revenue ----------
    "q3_segment_revenue" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          countDistinct("o_orderkey").as("n_orders"))
        .orderBy("c_mktsegment")
    },

    // -- J3: chained broadcast joins up the dim hierarchy --------------
    "j3_region_revenue" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name")
    },

    // -- J1/V12: two-sided anti-join (the file-pairing set difference,
    //    reference file_pairing_validator.py:82-109) -------------------
    "j1_anti_pairing" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val partSide = Tables.part(s, d)
        .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .agg(count(lit(1)).as("n_unmatched"),
          min("p_partkey").as("min_key"), max("p_partkey").as("max_key"))
        .withColumn("side", lit("part_without_lineitem"))
      val suppSide = Tables.supplier(s, d)
        .join(li, col("s_suppkey") === col("l_suppkey"), "left_anti")
        .agg(count(lit(1)).as("n_unmatched"),
          min("s_suppkey").as("min_key"), max("s_suppkey").as("max_key"))
        .withColumn("side", lit("supplier_without_lineitem"))
      partSide.unionByName(suppSide).orderBy("side")
    },

    // -- J2: left join with missing-side diagnosis (bio_label join) ----
    "j2_left_join_missing" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
          sum(when(col("n_orders").isNull, 1).otherwise(0)).as("n_without_orders"),
          count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // -- J4: semi-join existence counts --------------------------------
    "j4_semi_exists" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val partSide = Tables.part(s, d)
        .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("n_matched")).withColumn("side", lit("part_with_lineitem"))
      val custSide = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_matched")).withColumn("side", lit("customer_with_orders"))
      partSide.unionByName(custSide).orderBy("side")
    },

    // -- W1/V4: monotonic-timestamp check via lag window (reference
    //    time_ordered_validator.py:53-58). Partitioned by user — a
    //    single global sort would serialize at 100 TB; the per-key
    //    variant scales and the global count is its sum. --------------
    "w1_monotonic" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("ts") < col("prev_ts"), 1).otherwise(0)).as("n_out_of_order"))
        .orderBy("user_id")
    },

    // -- beyond-reference: hierarchical aggregation (rollup) -----------
    // (the reference has no grouping sets — SURVEY §2.5 — but a
    // training-data engine reports per-region/per-segment/total volumes
    // in one pass; rollup is one shuffle, not three queries.)
    "q9_rollup_revenue" -> { (s, d) =>
      // spark.sql face of the engine: the DataFrame rollup API re-exposes
      // join-side attributes through Expand and trips Spark's
      // ambiguous-self-join check, so this query exercises the SQL
      // surface instead (same Catalyst plan underneath).
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      Tables.region(s, d).createOrReplaceTempView("g_region")
      s.sql(
        """SELECT coalesce(r_name, 'ALL') AS region,
          | coalesce(c_mktsegment, 'ALL') AS segment,
          | round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
          |FROM g_orders JOIN g_customer ON o_custkey = c_custkey
          |JOIN g_nation ON c_nationkey = n_nationkey
          |JOIN g_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, c_mktsegment)
          |ORDER BY region, segment""".stripMargin)
    },

    // -- beyond-reference: sessionization — gap-based session ids via
    //    cascaded windows (lag → gap flag → running sum), the canonical
    //    event-stream shape a training-data pipeline needs -------------
    "w2_sessionize" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id")
        .agg(
          max("session_idx").as("n_sessions"),
          count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("user_id")
    },

    // -- beyond-reference: exact percentiles (distribution profiling) --
    "a7_percentiles" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // -- beyond-reference: pivot cross-tab (day × event type) ----------
    "q10_pivot_daily" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy("day")
    },

    // -- beyond-reference: statistical aggregates (corr/stddev/skew) ---
    "q11_stats" -> { (s, d) =>
      Tables.lineitem(s, d).agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(stddev_samp("l_discount"), 6).as("sd_disc"),
        round(var_samp("l_tax"), 6).as("var_tax"),
        round(covar_samp("l_quantity", "l_discount"), 6).as("cov_qty_disc"))
    },

    // -- §2.7: top-k by sort + limit -----------------------------------
    "q8_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
    },

    // -- §2.8: set operations over key sets ----------------------------
    "set_ops_users" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def users(t: String) = ev.filter(col("event_type") === t).select("user_id").distinct()
      val click = users("click")
      val view = users("view")
      Seq(
        click.except(view).agg(count(lit(1)).as("n")).withColumn("op", lit("click_minus_view")),
        click.intersect(view).agg(count(lit(1)).as("n")).withColumn("op", lit("click_intersect_view")),
        click.union(view).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("click_union_view")))
        .reduce(_.unionByName(_))
        .orderBy("op")
    },

    // -- A3: distinct-set aggregates (extensions/resolutions found) ----
    "a3_distinct_sets" -> { (s, d) =>
      Tables.events(s, d).agg(
        countDistinct("event_type").as("n_types"),
        countDistinct("user_id").as("n_users"),
        concat_ws(",", sort_array(collect_set("event_type"))).as("types"))
    },

    // -- A2: bounded offending-sample lists (≤5 ids, deterministic) ----
    "a2_error_samples" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("n_chars") > 300)
        .agg(
          count(lit(1)).as("n_offending"),
          concat_ws(",",
            transform(slice(sort_array(collect_set("doc_id")), 1, 5),
              x => x.cast("string"))).as("sample_ids"))
    },

    // -- scalar date/time functions over event time --------------------
    "f_datetime_daily" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("day")
    },

    // -- scalar string functions + regex (§2.9) ------------------------
    "f_string_funcs" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(lower(trim(col("lang"))).as("lang_norm"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("text").rlike("spark"), 1).otherwise(0)).as("n_spark"),
          sum(length(col("text"))).as("total_len"),
          max(length(regexp_replace(col("text"), "[aeiou]", ""))).cast("long").as("max_novowel_len"))
        .orderBy("lang_norm")
    },

    // -- sha2 parity with the oracle (hash function family, §2.9) ------
    "f_sha2_hex" -> { (s, d) =>
      Tables.documents(s, d)
        .select("lang").distinct()
        .select(col("lang"), sha2(col("lang"), 256).as("lang_sha256"))
        .orderBy("lang")
    },

    // -- beyond-reference: running/moving window FRAMES (ROWS + RANGE) -
    // Feature engineering over event history: cumulative counters, a
    // short-horizon moving max, and a numeric-range lookback. ROWS
    // frames are O(1) per row; the RANGE frame is keyed on event_id so
    // both engines resolve the identical numeric peer window. All
    // arithmetic is on longs (exact) — max() is selection, so the one
    // double column can't drift by accumulation order.
    "w5_running_frames" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last3 = byUser.rowsBetween(-2, 0)
      val range100 = byUser.rangeBetween(-100, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(cum).as("run_cnt"),
          sum("event_id").over(cum).as("run_sum_id"),
          max("value").over(last3).as("mov_max3"),
          count(lit(1)).over(range100).as("range_cnt"))
        .orderBy("user_id", "event_id")
    },

    // -- beyond-reference: quantile bucketing (ntile / percent_rank) ---
    // The curation shape behind "keep the top quality decile":
    // per-language deciles with a deterministic total order (tie-broken
    // on doc_id so ntile assignment is identical on both engines),
    // reduced to per-bucket stats.
    "w6_ntile_buckets" -> { (s, d) =>
      val byLang = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          ntile(10).over(byLang).cast("long").as("decile"),
          round(percent_rank().over(byLang), 6).as("pr"))
        .groupBy("lang", "decile")
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
          max("pr").as("max_pr"))
        .orderBy("lang", "decile")
    },

    // -- §2.9: higher-order array functions (transform / filter /
    //    aggregate / distinct / slice) — the array algebra embedding
    //    columns and packed sequences lean on. Quantities are
    //    integral-valued doubles → long cast keeps every sum exact;
    //    collect_list order is nondeterministic → array_sort pins it.
    "f_array_hof" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(col("l_quantity").cast("long"))).as("qtys"))
        .select(col("l_orderkey"),
          size(col("qtys")).cast("long").as("n_items"),
          size(filter(col("qtys"), x => x > 25)).cast("long").as("n_large"),
          aggregate(col("qtys"), lit(0L), (acc, x) => acc + x).as("sum_qty"),
          size(array_distinct(col("qtys"))).cast("long").as("n_distinct"),
          concat_ws(",", transform(slice(col("qtys"), 1, 3), _.cast("string"))).as("first3"))
        .orderBy("l_orderkey")
    },

    // -- §2.9: bitwise scalar + aggregate functions (flag-mask algebra)
    "f_bitwise" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          bit_and(col("event_id")).as("band"),
          bit_or(col("event_id")).as("bor"),
          bit_xor(col("event_id")).as("bxor"),
          sum(shiftleft(col("event_id") % 8, 2)).as("shifted_sum"))
        .orderBy("event_type")
    },

    // -- §2.9: map functions (map_from_entries / element_at / map_keys)
    //    — per-user event-type histogram as a MAP column, then keyed
    //    extraction. Entries built from a SORTED list so key order is
    //    deterministic on both engines (Spark map_from_entries and
    //    DuckDB map() both preserve build order).
    "f_map_funcs" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
          concat_ws(",", map_keys(col("m"))).as("types"))
        .orderBy("user_id")
    },

    // -- beyond-reference: unpivot/melt (wide measures → long form) ----
    // The inverse of q10's pivot: per-flag measure columns melted to
    // (measure, val) rows — the reshape feeding per-metric dashboards.
    "q13_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum("l_discount"), 2).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "val")
        .orderBy("l_returnflag", "measure")
    })

  def oracle: Map[String, String] = Map(
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS price
        |FROM lineitem WHERE l_quantity > 47 AND l_discount < 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s6_counts" ->
      """SELECT n, tbl FROM (
        | SELECT count(*) AS n, 'lineitem' AS tbl FROM lineitem
        | UNION ALL SELECT count(*), 'orders' FROM orders
        | UNION ALL SELECT count(*), 'customer' FROM customer
        | UNION ALL SELECT count(*), 'events' FROM events
        | UNION ALL SELECT count(*), 'documents' FROM documents
        |) ORDER BY tbl""".stripMargin,
    "q3_segment_revenue" ->
      """SELECT c_mktsegment,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j3_region_revenue" ->
      """SELECT r_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j1_anti_pairing" ->
      """SELECT * FROM (
        | SELECT count(*) AS n_unmatched, min(p_partkey) AS min_key, max(p_partkey) AS max_key,
        |        'part_without_lineitem' AS side
        | FROM part WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        | UNION ALL
        | SELECT count(*), min(s_suppkey), max(s_suppkey), 'supplier_without_lineitem'
        | FROM supplier WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |) ORDER BY side""".stripMargin,
    "j2_left_join_missing" ->
      """SELECT c_mktsegment,
        | sum(CASE WHEN o.n_orders IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_without_orders,
        | count(*) AS n_customers
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
        |) o ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j4_semi_exists" ->
      """SELECT * FROM (
        | SELECT count(*) AS n_matched, 'part_with_lineitem' AS side
        | FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        | UNION ALL
        | SELECT count(*), 'customer_with_orders'
        | FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |) ORDER BY side""".stripMargin,
    "w1_monotonic" ->
      """SELECT user_id, count(*) AS n_events,
        | sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END)::BIGINT AS n_out_of_order
        |FROM (
        |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
        |  FROM events
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_pivot_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)::BIGINT AS click,
        | sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)::BIGINT AS view,
        | sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        | sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        | sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)::BIGINT AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_stats" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(stddev_samp(l_discount), 6) AS sd_disc,
        | round(var_samp(l_tax), 6) AS var_tax,
        | round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
        |FROM lineitem""".stripMargin,
    "w2_sessionize" ->
      """SELECT user_id, max(session_idx)::BIGINT AS n_sessions, count(*) AS n_events,
        | round(sum(value),2) AS sum_value
        |FROM (
        |  SELECT user_id, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM (
        |    SELECT user_id, event_id, value,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(ts) - epoch_us(prev_ts) > 30*60*1000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, event_id, ts, value,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
        |      FROM events)))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a7_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(quantile_cont(value, 0.99), 4) AS p99,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        | coalesce(c_mktsegment, 'ALL') AS segment,
        | round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, c_mktsegment)
        |ORDER BY region, segment""".stripMargin,
    "q8_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price,
        | strftime(o_orderdate, '%Y-%m-%d') AS odate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "set_ops_users" ->
      """SELECT * FROM (
        | SELECT count(*) AS n, 'click_minus_view' AS op FROM (
        |   SELECT DISTINCT user_id FROM events WHERE event_type='click'
        |   EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type='view')
        | UNION ALL
        | SELECT count(*), 'click_intersect_view' FROM (
        |   SELECT DISTINCT user_id FROM events WHERE event_type='click'
        |   INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type='view')
        | UNION ALL
        | SELECT count(*), 'click_union_view' FROM (
        |   SELECT DISTINCT user_id FROM events WHERE event_type='click'
        |   UNION SELECT DISTINCT user_id FROM events WHERE event_type='view')
        |) ORDER BY op""".stripMargin,
    "a3_distinct_sets" ->
      """SELECT count(DISTINCT event_type) AS n_types,
        | count(DISTINCT user_id) AS n_users,
        | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        |FROM events""".stripMargin,
    "a2_error_samples" ->
      """SELECT count(*) AS n_offending,
        | coalesce(array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 5), ','),
        |          '') AS sample_ids
        |FROM documents WHERE n_chars > 300""".stripMargin,
    "f_datetime_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        | round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "f_string_funcs" ->
      """SELECT lower(trim(lang)) AS lang_norm, count(*) AS n_docs,
        | sum(CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END)::BIGINT AS n_spark,
        | sum(length(text))::BIGINT AS total_len,
        | max(length(regexp_replace(text, '[aeiou]', '', 'g'))) AS max_novowel_len
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "f_sha2_hex" ->
      """SELECT lang, sha256(lang) AS lang_sha256
        |FROM (SELECT DISTINCT lang FROM documents) ORDER BY lang""".stripMargin,
    "w5_running_frames" ->
      """SELECT user_id, event_id,
        | count(*) OVER cum AS run_cnt,
        | (sum(event_id) OVER cum)::BIGINT AS run_sum_id,
        | max(value) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_max3,
        | count(*) OVER (PARTITION BY user_id ORDER BY event_id
        |   RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS range_cnt
        |FROM events
        |WINDOW cum AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "w6_ntile_buckets" ->
      """SELECT lang, decile, count(*) AS n_docs,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        | max(pr) AS max_pr
        |FROM (
        |  SELECT lang, n_chars,
        |    ntile(10) OVER w AS decile,
        |    round(percent_rank() OVER w, 6) AS pr
        |  FROM documents
        |  WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "f_array_hof" ->
      """WITH a AS (
        |  SELECT l_orderkey, list_sort(list(l_quantity::BIGINT)) AS qtys
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        | len(qtys) AS n_items,
        | len(list_filter(qtys, x -> x > 25)) AS n_large,
        | list_aggregate(qtys, 'sum')::BIGINT AS sum_qty,
        | len(list_distinct(qtys)) AS n_distinct,
        | array_to_string(list_transform(qtys[1:3], x -> x::VARCHAR), ',') AS first3
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "f_bitwise" ->
      """SELECT event_type,
        | bit_and(event_id) AS band,
        | bit_or(event_id) AS bor,
        | bit_xor(event_id) AS bxor,
        | sum((event_id % 8) << 2)::BIGINT AS shifted_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "f_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT user_id,
        |    map(list(event_type ORDER BY event_type),
        |        list(n ORDER BY event_type)) AS m
        |  FROM c GROUP BY 1
        |)
        |SELECT user_id,
        | cardinality(m)::BIGINT AS n_types,
        | coalesce(m['click'][1], 0)::BIGINT AS n_click,
        | coalesce(m['purchase'][1], 0)::BIGINT AS n_purchase,
        | array_to_string(map_keys(m), ',') AS types
        |FROM m ORDER BY user_id""".stripMargin,
    "q13_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity),2) AS sum_qty,
        |    round(sum(l_extendedprice),2) AS sum_price,
        |    round(sum(l_discount),2) AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
        |ORDER BY l_returnflag, measure""".stripMargin)
}
