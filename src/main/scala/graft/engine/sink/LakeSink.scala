package graft.engine.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned columnar (parquet) sink — the lake-layout counterpart of
  * the JDBC upsert for pipelines whose downstream is Spark/DuckDB/
  * warehouse readers rather than a serving database. The reference has
  * no columnar sink (its sinks are MySQL + sidecar file copy,
  * SURVEY.md §2.10); at the 100 TB design point a training-data engine
  * needs one, and its failure modes are all LAYOUT failures:
  *
  *  - **Small-files explosion.** Naive `df.write.partitionBy(p)` makes
  *    every task open a writer for every partition value it sees —
  *    `tasks × |p|` files. The sink repartitions by the partition
  *    columns first (plus an optional within-partition split salt for
  *    skewed partition values), so each output partition is written by
  *    few tasks: file count is `|p| × filesPerPartition`, independent
  *    of input parallelism.
  *  - **Unprunable files.** `sortWithinPartitions(clusterBy)` lays rows
  *    out so parquet row-group min/max stats carry selective ranges —
  *    readers filtering on the cluster column skip whole row groups.
  *    (Same motivation as lakehouse clustering/Z-order; a plain column
  *    sort is the 1-D case and free here since the shuffle already
  *    happened.)
  *  - **Oversized row groups.** `maxRecordsPerFile` bounds file size
  *    where a partition value is huge, without another shuffle.
  *  - **Non-idempotent re-runs.** Dynamic partition overwrite replaces
  *    ONLY the partitions present in this batch — a re-run of one day's
  *    ingest cannot truncate the rest of the table. (Spark's default
  *    static overwrite drops every existing partition first.)
  *
  * No custom file management: the write itself is Spark's parquet
  * committer (rename-based atomic task commit, job-level _SUCCESS), so
  * the sink inherits exactly-once output for batch jobs.
  */
object LakeSink {

  /** @param partitionBy      low-cardinality layout columns (dirs)
    * @param clusterBy        within-file sort for row-group pruning
    * @param zorderBy         two INT columns to cluster by their Morton
    *                         code ([[graft.functions.ZOrder2]]) instead
    *                         of lexicographically — row-group stats
    *                         become selective on BOTH columns; wider
    *                         types should be rank/bucket-reduced to int
    *                         first. Mutually exclusive with clusterBy.
    * @param filesPerPartition target files per partition value (split
    *                         salt width); 1 = one writer per value
    * @param maxRecordsPerFile hard per-file row cap (0 = unlimited)
    * @param dynamicOverwrite  overwrite only the partitions in this
    *                         batch (idempotent incremental re-runs)
    */
  final case class Config(path: String,
                          partitionBy: Seq[String] = Nil,
                          clusterBy: Seq[String] = Nil,
                          zorderBy: Option[(String, String)] = None,
                          filesPerPartition: Int = 1,
                          maxRecordsPerFile: Long = 0L,
                          compression: String = "zstd",
                          dynamicOverwrite: Boolean = true,
                          format: String = "parquet") {
    require(Set("parquet", "orc").contains(format),
      s"lake format must be parquet or orc, got '$format'")
  }

  /** Bucketed table layout — the storage-side complement of the
    * incremental-dedup joins: a corpus that is JOINED ON THE SAME KEY
    * every ingest batch (content digest, host, doc id) should be
    * bucketed on that key ONCE at write time, so every subsequent
    * join/dedup reads it in place — Spark's bucketed scan matches the
    * join's required partitioning and plans NO Exchange on the corpus
    * side, batch after batch. At 100 TB the corpus-side shuffle is the
    * single largest recurring cost an ingest pipeline pays; bucketing
    * pays it once.
    *
    * `sortCols` (defaults to the bucket key) additionally sorts rows
    * within each bucket file, so sort-merge joins skip their sort when
    * each bucket holds one file.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable` —
    * plain path-writes cannot carry it); pass `path` to keep the data
    * external at a lake location with only metadata in the catalog.
    * BucketedLayoutSpec pins the no-Exchange plan shape.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val sort = if (sortCols.nonEmpty) sortCols else bucketCols
    var w = df.write.format("parquet").mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  def write(df: DataFrame, cfg: Config, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(cfg.filesPerPartition >= 1, "filesPerPartition must be >= 1")
    require(cfg.clusterBy.isEmpty || cfg.zorderBy.isEmpty,
      "clusterBy and zorderBy are mutually exclusive")
    cfg.zorderBy.foreach { case (a, b) =>
      for (c <- Seq(a, b))
        require(df.schema(c).dataType ==
          org.apache.spark.sql.types.IntegerType,
          s"zorderBy column '$c' must be INT (rank/bucket-reduce wider " +
            s"types first), got ${df.schema(c).dataType}")
    }
    // The cluster sort key: plain columns, or the Morton code of the
    // zorder pair (an expression — nothing materializes into the files).
    val sortKeys: Seq[org.apache.spark.sql.Column] =
      cfg.zorderBy match {
        case Some((a, b)) => Seq(graft.functions.ZOrder2.of(col(a), col(b)))
        case None => cfg.clusterBy.map(col)
      }

    // Route all rows of one partition value to few tasks. The salt
    // splits a skewed partition value across filesPerPartition writers
    // while keeping unrelated values from sharing (and bloating) files.
    val arranged =
      if (cfg.partitionBy.isEmpty) df
      else {
        val partCols = cfg.partitionBy.map(col)
        val salted =
          if (cfg.filesPerPartition == 1) df.repartition(partCols: _*)
          else {
            // EXPLICIT partition count: a column-only repartition is
            // AQE-coalescible, and coalescing merges the salted splits
            // right back into one writer — the explicit count pins the
            // reducer layout so a hot value really fans out.
            val n = df.sparkSession.sessionState.conf.numShufflePartitions
            df.repartition(n,
              (partCols :+ (spark_partition_id() % cfg.filesPerPartition)): _*)
          }
        if (sortKeys.nonEmpty) salted.sortWithinPartitions(sortKeys: _*)
        else salted
      }
    val clustered =
      if (cfg.partitionBy.isEmpty && sortKeys.nonEmpty)
        arranged.sortWithinPartitions(sortKeys: _*)
      else arranged

    // Per-write option, NOT the session conf: mutating the session-
    // global partitionOverwriteMode and restoring it in a finally races
    // with concurrent writes on the same SparkSession (another writer's
    // command could read our transient value, silently flipping ITS
    // overwrite semantics).
    var w = clustered.write
      .mode(mode)
      .option("compression", cfg.compression)
      .option("partitionOverwriteMode",
        if (cfg.dynamicOverwrite) "dynamic" else "static")
    if (cfg.maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", cfg.maxRecordsPerFile)
    if (cfg.partitionBy.nonEmpty)
      w = w.partitionBy(cfg.partitionBy: _*)
    // parquet or ORC — both columnar with row-group/stripe min-max
    // stats, so the clusterBy/zorder layout prunes identically; ORC is
    // the interop choice for Hive/Trino-first lakes.
    w.format(cfg.format).save(cfg.path)
  }
}
