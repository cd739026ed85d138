package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Shapes:
  *  - brute-force: broadcast the query set against ONE scan of the
  *    corpus; exact, cost = scan × |Q|. The per-query rank is a window
  *    partitioned by query id — with few queries and huge N, prefer
  *    more shuffle partitions or the IVF path.
  *  - IVF: assign every vector to its nearest centroid once (scan ×
  *    |C| with centroids broadcast), then probe only the `nprobe`
  *    nearest buckets per query. The probed fraction ≈ nprobe/|C|.
  *
  * Centroid choice is pluggable — pass any small DataFrame of
  * `(cent_id, cent_emb)`; k-means, a sample, or a stratified subset
  * all work. Everything downstream is exact given the assignment.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector:
    * `(q_id, rank, neighbor_id, cos)`.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("__q"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col(idCol))
    corpus.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", F.cosineSim(col(vecCol), col("__q")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol).as("neighbor_id"), col("cos"))
  }

  /** Bucket assignment: each corpus vector's nearest centroid
    * (tie-break on centroid id). One scan, centroids broadcast.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("__ccos").desc, col("cent_id"))
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__ccos", F.cosineSim(col(vecCol), col("cent_emb")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col(vecCol), col("cent_id").as("bucket"))
  }

  /** IVF top-k: search only the `nprobe` buckets nearest each query.
    * `(q_id, rank, neighbor_id)` — approximate (recall < 1 when a true
    * neighbor lives in an unprobed bucket).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("__q"))
    val pw = Window.partitionBy("q_id").orderBy(col("__pcos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__pcos", F.cosineSim(col("__q"), col("cent_emb")))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nprobe)
      .select(col("q_id"), col("__q"), col("cent_id").as("bucket"))
    val fw = Window.partitionBy("q_id").orderBy(col("cos").desc, col(idCol))
    assigned.join(broadcast(probes), "bucket")
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", F.cosineSim(col(vecCol), col("__q")))
      .withColumn("rank", row_number().over(fw))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol).as("neighbor_id"))
  }
}
