package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scan-parallelism repair for compute-bound narrow inputs (guide
  * §2.5 "input skew — one huge unsplittable file … repartition
  * immediately after the read", generalized from the r16 m72/m80
  * lesson).
  *
  * Spark's scan parallelism is bounded by file splits, and a parquet
  * file splits only at row-group boundaries — a small single-row-group
  * file scans as ONE task no matter what `maxPartitionBytes` says. Any
  * expensive per-row kernel that rides the scan stage (shingle
  * hashing, MinHash signatures, sign sketches, n-gram explodes, HTML
  * extraction, centroid assignment) then runs on one core while the
  * rest of the cluster idles, until the first exchange.
  *
  * [[spread]] inserts a hash repartition to `defaultParallelism` ONLY
  * when the plan-estimated input size is too small for the scan to
  * have reached that parallelism by splitting (estimated bytes <
  * cores × maxPartitionBytes). The decision is byte-based and
  * plan-side (no job, no action):
  *  - at production scale the inputs are many splittable files, the
  *    estimate exceeds the threshold, and spread is a no-op — the
  *    corpus is never shuffled for parallelism's sake;
  *  - plan shapes whose size estimate is unknown or inflated (joins
  *    without CBO, checkpointed RDDs) conservatively no-op;
  *  - `defaultParallelism` scales with the cluster — no constant tuned
  *    to the local core count.
  *
  * Hash-partitioning by the caller's id column (the r16 precedent)
  * keeps the assignment deterministic under task retry — never derive
  * a shuffle key from rand() (SPARK-38388).
  */
object Par {

  /** Estimated plan output bytes below which a scan cannot have
    * produced `par` splits: cores × maxPartitionBytes.
    */
  private def threshold(df: DataFrame): BigInt = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism.max(1)
    val split = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    BigInt(split) * par
  }

  /** Below this estimated size the input is degenerate-small (a
    * handful of fixture rows): one task finishes it faster than the
    * exchange round-trip costs, at any cluster size.
    */
  private val Floor: BigInt = BigInt(64) << 10

  /** `df` hash-repartitioned on `byCol` to `defaultParallelism` when
    * its estimated size says the scan under it cannot have split that
    * wide (and it is not degenerate-small); `df` unchanged otherwise.
    */
  def spread(df: DataFrame, byCol: String): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est >= Floor && est < threshold(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(byCol))
    else df
  }
}
