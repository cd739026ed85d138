package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Joins

/** Temporal-join gate queries over the events stream table: as-of join
  * (latest prior click per purchase) and binned interval join (events
  * falling in the hour after each purchase). Timestamp comparisons run
  * at MICROSECOND precision on both engines — Spark reads the parquet
  * nanos column truncated to micros ([[graft.Tables]]), so the DuckDB
  * oracle compares `epoch_us` values, never raw nanos.
  */
object JoinQueries {

  /** 24 h as-of tolerance, in microseconds. */
  private val TolMicros = 24L * 3600 * 1000000

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- w3: as-of join — each purchase picks the user's latest click
    //    at or before it, within 24 h; older or absent clicks → NULLs.
    //    One shuffle on user_id, running last() — no theta-join. ------
    "w3_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"))
      Joins.asofJoin(purchases, clicks, Seq("user_id"),
          leftTsCol = "ts", rightTsCol = "ts",
          carryCols = Seq("click_id"), rightTieCol = "click_id",
          toleranceMicros = TolMicros)
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          col("asof_gap_micros").as("gap_us"))
        .orderBy("event_id")
    },

    // -- w3b: nearest-direction as-of — each purchase picks the click
    //    with the smallest |gap| within 2 h, either side; exact ties
    //    go backward. ------------------------------------------------
    "w3b_asof_nearest" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"))
      Joins.asofJoin(purchases, clicks, Seq("user_id"),
          leftTsCol = "ts", rightTsCol = "ts",
          carryCols = Seq("click_id"), rightTieCol = "click_id",
          toleranceMicros = 2L * 3600 * 1000000, direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          col("asof_gap_micros").as("gap_us"))
        .orderBy("event_id")
    },

    // -- w4: interval join — events landing within [purchase, +1 h],
    //    same user. Hour-binned equi-join, never a nested loop. -------
    "w4_range_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val points = ev.select("event_id", "user_id", "ts", "event_type")
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          col("event_id").as("purchase_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      Joins.rangeJoin(points, intervals, Seq("user_id"),
          tsCol = "ts", startCol = "w_start", endCol = "w_end",
          binMicros = 3600L * 1000000)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct("purchase_id").as("n_purchases"),
          countDistinct("event_id").as("n_events"))
        .orderBy("event_type")
    })

  def oracle: Map[String, String] = Map(
    // No two clicks of a user tie on ts in this corpus, so arg_max on
    // the click timestamp is the engine's (ts, click_id) tie order.
    "w3_asof_join" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS cus, event_id AS click_id
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id,
        |  arg_max(c.click_id, c.cus) AS click_id,
        |  p.pus - max(c.cus) AS gap_us
        |FROM p LEFT JOIN c
        |  ON c.user_id = p.user_id
        |  AND c.cus <= p.pus AND c.cus >= p.pus - 86400000000
        |GROUP BY p.event_id, p.user_id, p.pus
        |ORDER BY p.event_id""".stripMargin,
    // Candidates within tolerance on either side; rank by (|gap|,
    //  backward-first). No (user, ts) click ties exist, so the rank is
    //  total. LEFT join keeps unmatched purchases with NULLs.
    "w3b_asof_nearest" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS cus, event_id AS click_id
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'
        |), best AS (
        |  SELECT event_id, click_id, gap_us FROM (
        |    SELECT p.event_id, c.click_id, abs(p.pus - c.cus) AS gap_us,
        |      row_number() OVER (PARTITION BY p.event_id
        |        ORDER BY abs(p.pus - c.cus),
        |                 CASE WHEN c.cus <= p.pus THEN 0 ELSE 1 END) AS r
        |    FROM p JOIN c ON c.user_id = p.user_id
        |      AND abs(p.pus - c.cus) <= 7200000000
        |  ) WHERE r = 1
        |)
        |SELECT p.event_id, p.user_id, best.click_id, best.gap_us
        |FROM p LEFT JOIN best USING (event_id)
        |ORDER BY p.event_id""".stripMargin,
    "w4_range_join" ->
      """SELECT e.event_type, count(*) AS n_pairs,
        |  count(DISTINCT p.event_id) AS n_purchases,
        |  count(DISTINCT e.event_id) AS n_events
        |FROM events e JOIN events p
        |  ON p.event_type = 'purchase'
        |  AND e.user_id = p.user_id
        |  AND epoch_us(e.ts) >= epoch_us(p.ts)
        |  AND epoch_us(e.ts) <= epoch_us(p.ts) + 3600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
