package graft.ops

import org.apache.spark.graft.CheckpointShim
import org.apache.spark.rdd.RDD
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
  *
  * Reliable checkpoint files are NOT reclaimed by Spark as iterations
  * advance (the ContextCleaner only deletes them under
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, and then
  * only on RDD GC — far too late for a multi-round job writing a full
  * materialized copy per round). Iterative callers therefore route
  * every round through one [[Rounds]] tracker, which deletes round
  * N-1's files as soon as round N is materialized, keeping DFS usage
  * at one round's footprint. The FINAL round's files intentionally
  * survive — they back the returned DataFrame.
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

  /** Delete the reliable-checkpoint files backing `df` (no-op on the
    * local path or for a non-checkpointed frame). For callers that
    * consume an iterative result into something smaller and then drop
    * it — e.g. [[Dedup.dropNearDuplicates]] reducing `duplicateGroups`'
    * final label frame to a loser-id set — so the final round's files
    * don't outlive the frame on the cluster DFS. Only call once every
    * derived frame has been materialized: the checkpoint files ARE the
    * frame's storage.
    */
  def release(df: DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined)
      checkpointedRddId(df).foreach(CheckpointShim.cleanCheckpoint(sc, _))
  }

  /** The id of the checkpointed RDD backing a frame: the checkpoint
    * surfaces as a `LogicalRDD` LEAF somewhere in the analyzed plan
    * (the frame may be a projection/filter over it — `duplicateGroups`
    * returns `select("id","comp")` of its checkpoint). Found
    * structurally (RDD-bearing leaves of the plan tree) rather than by
    * naming the `private[sql]` class. Returns None when the plan holds
    * ZERO or MULTIPLE checkpoint leaves — with several (e.g. a join of
    * two checkpointed frames) "the frame's backing checkpoint" is
    * ambiguous and deleting any of them could corrupt a sibling, so
    * release degrades to a no-op instead.
    */
  private def checkpointedRddId(df: DataFrame): Option[Int] = {
    val ids = df.queryExecution.analyzed.collect {
      case leaf: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
        leaf.productIterator.collectFirst { case r: RDD[_] => r.id }
    }.flatten
    if (ids.size == 1) ids.headOption else None
  }

  /** Per-iteration checkpoint lifecycle for ONE iterative algorithm:
    * `truncate` like the object-level method, plus deterministic
    * deletion of the previous round's reliable checkpoint files once
    * the new round is materialized (safe: eager checkpointing means
    * the new frame's data lives entirely in its own files; nothing
    * recomputes through the old lineage). On the `localCheckpoint`
    * path this degrades to plain truncation — executor block cleanup
    * already rides the ContextCleaner.
    *
    * Not thread-safe; scope one instance per algorithm invocation.
    */
  final class Rounds {
    private var prev: Option[Int] = None

    def truncate(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      val out = Checkpoints.truncate(df)
      if (sc.getCheckpointDir.isDefined) {
        prev.foreach(CheckpointShim.cleanCheckpoint(sc, _))
        prev = checkpointedRddId(out)
      }
      out
    }
  }
}
