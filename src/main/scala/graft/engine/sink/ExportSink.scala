package graft.engine.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export sink — the terminus of a curation pipeline:
  * sharded JSONL or parquet with DETERMINISTIC shard assignment and a
  * verifiable manifest, so a training job (or a later integrity sweep)
  * can prove it received every record of the export.
  *
  *  - **Deterministic sharding.** `shard = unsigned sha256(id) %
  *    numShards` (the engine-wide [[graft.ops.Curation.splitBucket]]
  *    rule): re-running the export re-produces the same record → shard
  *    mapping regardless of input partitioning or cluster size, and
  *    within each shard rows are sorted by id — the same corpus exports
  *    to the same bytes, which is what makes re-runs diffable.
  *  - **Shard = unit of parallel consumption.** One explicit
  *    repartition to `numShards` reducers, `partitionBy(shard)` dirs:
  *    a trainer maps one shard to one data-loader worker, and file
  *    count is O(numShards), never O(tasks × shards) (same small-files
  *    discipline as [[LakeSink]]).
  *  - **Manifest from READ-BACK.** After the write, the manifest's
  *    per-shard row count and content fingerprint (bit-XOR of
  *    xxhash64 over each row's canonical JSON — order-independent, so
  *    file-internal ordering never matters) are computed by reading
  *    the landed files: the manifest certifies what is ON DISK, not
  *    what was intended. [[verifyExport]] re-runs the same aggregation
  *    any time later and diffs against the manifest — detecting
  *    partial delivery, truncation or bit-rot with one pruned scan.
  *
  * 100-TB shape: the export is one shuffle (repartition to shards) +
  * one write + one read-back aggregation; the manifest itself is
  * O(numShards) driver rows. NULL ids deterministically land in shard
  * 0 (the splitBucket NULL convention) rather than a hive default
  * partition.
  */
object ExportSink {

  final case class ShardStat(shard: Int, count: Long, fingerprint: Long)

  /** `schemaJson` pins the data schema (JSONL carries no types);
    * `shards` covers every shard id in [0, numShards), zero-count
    * entries included.
    */
  final case class Manifest(format: String, numShards: Int,
                            totalCount: Long, schemaJson: String,
                            shards: Seq[ShardStat])

  val ManifestFile = "_export_manifest.json"
  private val formats = Set("jsonl", "parquet")

  /** Export `df` as `numShards` deterministic shards under `path`
    * (`path/shard=N/…`), overwrite semantics, and write + return the
    * read-back manifest. `idCol` must be stable across runs for the
    * determinism contract (content ids, not monotonically_increasing_id).
    */
  def export(df: DataFrame, path: String, idCol: String, numShards: Int,
             format: String = "jsonl"): Manifest = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(formats.contains(format),
      s"format must be one of ${formats.mkString("/")}, got '$format'")
    require(df.columns.contains(idCol), s"missing id column '$idCol'")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column (reserved for the shard key)")
    val spark = df.sparkSession
    val dataCols = df.columns.toSeq

    // splitBucket's unkeyable sentinel is -1 (null/blank/"nan" ids) —
    // route those to shard 0 deterministically instead of a -1 dir.
    val bucket = graft.ops.Curation.splitBucket(col(idCol), numShards)
    val sharded = df
      .withColumn("shard", when(bucket < 0, lit(0)).otherwise(bucket))
      // one reducer per shard (explicit count — AQE must not coalesce
      // shards together), deterministic within-file order by id
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))

    val writer = sharded.write.mode("overwrite").partitionBy("shard")
    format match {
      case "jsonl" => writer.json(path)
      case "parquet" => writer.parquet(path)
    }

    val manifest = computeManifest(spark, path, format, numShards,
      df.schema.json, dataCols)
    writeManifest(spark, path, manifest)
    manifest
  }

  /** Re-read the landed files and diff counts + fingerprints against
    * the stored manifest: `Right(manifest)` when every shard matches,
    * `Left(problems)` otherwise. The integrity sweep a consumer runs
    * before training on a delivered export.
    */
  def verifyExport(spark: SparkSession, path: String): Either[List[String], Manifest] = {
    val stored = readManifest(spark, path)
    val schema = org.apache.spark.sql.types.DataType.fromJson(stored.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val current = computeManifest(spark, path, stored.format,
      stored.numShards, stored.schemaJson, schema.fieldNames.toSeq)
    val problems = scala.collection.mutable.ListBuffer.empty[String]
    if (current.totalCount != stored.totalCount)
      problems += s"total count ${current.totalCount} != manifest ${stored.totalCount}"
    val curByShard = current.shards.map(s => s.shard -> s).toMap
    stored.shards.foreach { s =>
      val c = curByShard(s.shard)
      if (c.count != s.count)
        problems += s"shard ${s.shard}: count ${c.count} != manifest ${s.count}"
      else if (c.fingerprint != s.fingerprint)
        problems += s"shard ${s.shard}: fingerprint mismatch (content changed)"
    }
    if (problems.isEmpty) Right(stored) else Left(problems.toList)
  }

  def readManifest(spark: SparkSession, path: String): Manifest = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    val p = new Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no $ManifestFile under $path")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    Serialization.read[Manifest](text)
  }

  /** One pruned read-back aggregation: per shard, row count + bit-XOR
    * of xxhash64 over the canonical row JSON (columns in schema order;
    * XOR makes the fingerprint independent of row order so the check
    * never depends on how a reader splits files).
    */
  private def computeManifest(spark: SparkSession, path: String,
                              format: String, numShards: Int,
                              schemaJson: String,
                              dataCols: Seq[String]): Manifest = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // data schema only — partition discovery appends the shard column
    val back = format match {
      case "jsonl" => spark.read.schema(schema).json(path)
      case "parquet" => spark.read.schema(schema).parquet(path)
    }
    // an all-filtered batch writes ZERO files: partition discovery then
    // finds no shard= dirs and the read-back has no shard column — a
    // legitimate empty export, not an error
    val stats =
      if (!back.columns.contains("shard")) Map.empty[Int, ShardStat]
      else back
        .withColumn("__h", xxhash64(to_json(struct(dataCols.map(col): _*))))
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("fp"))
        .collect()
        .map(r => r.getInt(0) -> ShardStat(r.getInt(0), r.getLong(1), r.getLong(2)))
        .toMap
    val all = (0 until numShards).map(i =>
      stats.getOrElse(i, ShardStat(i, 0L, 0L)))
    Manifest(format, numShards, all.map(_.count).sum, schemaJson, all)
  }

  private def writeManifest(spark: SparkSession, path: String,
                            manifest: Manifest): Unit = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    val p = new Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(Serialization.write(manifest)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
