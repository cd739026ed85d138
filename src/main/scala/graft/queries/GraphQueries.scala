package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Graph

/** Link-graph gate queries ([[graft.ops.Graph]]): weighted PageRank
  * and degree cards over a deterministic 3-layer purchase graph
  * derived from the TPC-H-ish tables — customer→supplier edges (one
  * per order line, via orders ⋈ lineitem) and supplier→part edges
  * (one per line). Parts have no out-edges, so the dangling-mass
  * redistribution path is exercised on every iteration; parallel
  * edges aggregate to weights.
  *
  * The PageRank oracle unrolls the SAME per-iteration algebra into a
  * CTE chain (one contrib/dangling/rank trio per round), with every
  * float literal cast to DOUBLE so DuckDB's decimal literals don't
  * change the arithmetic; the node id is the row sort key, so float
  * rank values never decide row order.
  */
object GraphQueries {

  private val Iters = 5

  private def purchaseEdges(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val cs = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val sp = lineitem.select(
      concat(lit("s"), col("l_suppkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst"))
    cs.unionByName(sp)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- g1: weighted PageRank, 5 fixed rounds, damping 0.85. -------
    "g1_pagerank" -> { (s, d) =>
      Graph.pageRank(purchaseEdges(s, d), iterations = Iters)
        .orderBy("node")
    },

    // -- g2: per-node degree/weight card over the same graph. -------
    "g2_degree_stats" -> { (s, d) =>
      Graph.degreeStats(purchaseEdges(s, d)).orderBy("node")
    })

  private val edgeSql =
    """SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT 's' || l_suppkey, 'p' || l_partkey FROM lineitem""".stripMargin

  /** One CTE trio per PageRank round; r0 is the uniform start. */
  private def pagerankSql: String = {
    val head =
      s"""WITH ed AS (
         |  $edgeSql
         |), w AS (
         |  SELECT src, dst, count(*) AS w FROM ed GROUP BY 1, 2
         |), ow AS (
         |  SELECT src, sum(w) AS wout FROM w GROUP BY 1
         |), nodes AS (
         |  SELECT src AS node FROM w UNION SELECT dst FROM w
         |), nn AS (
         |  SELECT count(*)::DOUBLE AS cnt FROM nodes
         |), r0 AS (
         |  SELECT node, 1.0::DOUBLE / nn.cnt AS rank FROM nodes, nn
         |)""".stripMargin
    val rounds = (1 to Iters).map { i =>
      val p = s"r${i - 1}"
      s""", c$i AS (
         |  SELECT w.dst AS node, sum(r.rank * w.w / ow.wout) AS contrib
         |  FROM w JOIN ow USING (src) JOIN $p r ON r.node = w.src
         |  GROUP BY 1
         |), d$i AS (
         |  SELECT coalesce(sum(rank), 0.0::DOUBLE) AS dang FROM $p
         |  WHERE node NOT IN (SELECT src FROM ow)
         |), r$i AS (
         |  SELECT n.node,
         |    (1.0::DOUBLE - 0.85::DOUBLE) / nn.cnt +
         |    0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE) +
         |                    d.dang / nn.cnt) AS rank
         |  FROM nodes n LEFT JOIN c$i c USING (node), d$i d, nn
         |)""".stripMargin
    }.mkString
    s"$head$rounds\nSELECT node, rank FROM r$Iters ORDER BY node"
  }

  def oracle: Map[String, String] = Map(
    "g1_pagerank" -> pagerankSql,
    "g2_degree_stats" ->
      s"""WITH ed AS (
         |  $edgeSql
         |), w AS (
         |  SELECT src, dst, count(*) AS w FROM ed GROUP BY 1, 2
         |), o AS (
         |  SELECT src AS node, count(*) AS out_deg, sum(w) AS out_weight
         |  FROM w GROUP BY 1
         |), i AS (
         |  SELECT dst AS node, count(*) AS in_deg, sum(w) AS in_weight
         |  FROM w GROUP BY 1
         |)
         |SELECT node,
         |  coalesce(out_deg, 0)::BIGINT AS out_deg,
         |  coalesce(in_deg, 0)::BIGINT AS in_deg,
         |  coalesce(out_weight, 0)::BIGINT AS out_weight,
         |  coalesce(in_weight, 0)::BIGINT AS in_weight
         |FROM o FULL OUTER JOIN i USING (node)
         |ORDER BY node""".stripMargin)
}
