package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.rdd.ReliableRDDCheckpointData

/** `private[spark]` escape hatch (same pattern as
  * `org.apache.spark.sql.graft.shim`): reliable checkpoint files are
  * NOT deleted by Spark when an iteration moves on — only the
  * ContextCleaner does that, only when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, and only
  * when the RDD happens to be GC'd. An iterative job on a cluster
  * checkpoint dir would otherwise leave one full materialized copy per
  * round on the DFS. [[graft.ops.Checkpoints.Rounds]] deletes the
  * previous round's files deterministically through this shim instead.
  */
object CheckpointShim {
  /** Delete the checkpoint files of `rddId` (no-op if none exist). */
  def cleanCheckpoint(sc: SparkContext, rddId: Int): Unit =
    ReliableRDDCheckpointData.cleanCheckpoint(sc, rddId)

  /** Storage memory in use across all block managers, in bytes
    * (`SparkEnv`/`BlockManagerMaster` are `private[spark]`). Diagnostic
    * only — graft.Bench logs it per gate to make block accumulation
    * across a many-query JVM visible.
    */
  def storageUsedBytes(sc: SparkContext): Long =
    sc.env.blockManager.master.getMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum
}
