package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => F}

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two paths:
  *  - `ann_brute_topk`: exact brute-force — broadcast the (small) query
  *    set against one scan of the corpus, rank per query. At 100 TB
  *    this is the baseline: cost = one pass × |Q|, no index.
  *  - `ann_ivf_topk`: IVF (inverted-file) — assign every vector to its
  *    nearest centroid once (scan × |C|, broadcast centroids), then
  *    probe only the nprobe closest buckets per query. The scan shrinks
  *    by ~|C|/nprobe; bucket assignment is the shuffle key, so probing
  *    is a partition-pruned equi-join, not a scan.
  *
  * Centroids here are a deterministic subset of the corpus (every 50th
  * vector) instead of k-means — the INDEX mechanics (assignment, probe,
  * pruned search) are identical and the choice keeps the oracle exact.
  */
object AnnQueries {

  private def cosine(a: Column, b: Column): Column = F.cosineSim(a, b)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine(col("embedding"), col("q_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy("q_id", "rank")
    },

    "ann_ivf_topk" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      // One-scan bucket assignment: nearest centroid per vector
      // (tie-break on cent_id for determinism).
      val aw = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
      val assigned = emb.crossJoin(broadcast(centroids))
        .withColumn("ccos", cosine(col("embedding"), col("cent_emb")))
        .withColumn("arank", row_number().over(aw))
        .filter(col("arank") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("bucket"))
      // Per-query probe list: the nprobe=2 nearest centroids.
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val pw = Window.partitionBy("q_id").orderBy(col("pcos").desc, col("cent_id"))
      val probes = q.crossJoin(broadcast(centroids))
        .withColumn("pcos", cosine(col("q_emb"), col("cent_emb")))
        .withColumn("prank", row_number().over(pw))
        .filter(col("prank") <= 2)
        .select(col("q_id"), col("q_emb"), col("cent_id").as("bucket"))
      // Pruned search: only vectors in probed buckets.
      val fw = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      assigned.join(broadcast(probes), "bucket")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine(col("embedding"), col("q_emb")))
        .withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
        .orderBy("q_id", "rank")
    })

  def oracle: Map[String, String] = Map(
    "ann_brute_topk" ->
      """SELECT q_id, rank, neighbor_id, round(cos, 6) AS cos_r FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
        |               c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND c.vec_id != q.vec_id
        |) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "ann_ivf_topk" ->
      """WITH cent AS (
        |  SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings WHERE vec_id % 50 = 0
        |), assigned AS (
        |  SELECT vec_id, embedding, cent_id AS bucket FROM (
        |    SELECT e.vec_id, e.embedding, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cent_emb::DOUBLE[]) DESC,
        |                 c.cent_id) AS arank
        |    FROM embeddings e CROSS JOIN cent c
        |  ) WHERE arank = 1
        |), probes AS (
        |  SELECT q_id, q_emb, cent_id AS bucket FROM (
        |    SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cent_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cent_emb::DOUBLE[]) DESC,
        |                 c.cent_id) AS prank
        |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8
        |  ) WHERE prank <= 2
        |)
        |SELECT q_id, rank, neighbor_id FROM (
        |  SELECT p.q_id, a.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY p.q_id
        |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], p.q_emb::DOUBLE[]) DESC,
        |               a.vec_id) AS rank
        |  FROM assigned a JOIN probes p ON a.bucket = p.bucket AND a.vec_id != p.q_id
        |) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)
}
