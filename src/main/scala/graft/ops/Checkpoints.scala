package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-truncating materialization for iterative DataFrame algorithms
  * ([[Dedup.duplicateGroups]], [[Similarity.kmeans]]): without a
  * checkpoint each round's plan embeds the previous round's and grows
  * exponentially.
  *
  * `localCheckpoint` stores the blocks on executors — fast (no DFS
  * write) but UNRECOVERABLE: on a real multi-executor cluster losing
  * one executor mid-iteration fails the whole job. Fine on local[n];
  * at the 100 TB design point a multi-hour job should survive executor
  * churn. So: when the session has a reliable checkpoint directory
  * configured (`spark.sparkContext.setCheckpointDir(...)` — an HDFS/
  * object-store path), iterations use reliable `checkpoint()` instead,
  * trading a DFS write per round for fault tolerance. Cluster
  * deployments opt in by setting the directory; nothing else changes.
  */
object Checkpoints {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Chainable alias: `df.truncated` ≡ `Checkpoints.truncate(df)`. */
  implicit final class Truncatable(private val df: DataFrame) extends AnyVal {
    def truncated: DataFrame = Checkpoints.truncate(df)
  }
}
