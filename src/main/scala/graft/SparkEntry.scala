package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (SURVEY.md §2), one
  * entry per operator family; `oracleSql` holds the DuckDB-equivalent
  * SQL for every query whose semantics ANSI SQL can express (the
  * driver hash-compares both results at sf0.01). Column names are kept
  * identical on both sides — the compare sorts columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("j3_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Lazy: the
    * merge + collision check runs once, not on every lookup (Explain
    * resolves every query name through this map).
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val modules = Seq(
      CoreQueries.queries, ValidatorQueries.queries,
      PipelineQueries.queries, DedupQueries.queries,
      TextQueries.queries, AnnQueries.queries,
      MultimodalQueries.queries, MediaGateQueries.queries,
      SinkQueries.queries,
      CurationQueries.queries, IngestGateQueries.queries,
      JoinQueries.queries, SketchQueries.queries,
      GraphQueries.queries, CodeQueries.queries)
    val merged = modules.reduce(_ ++ _)
    // A name collision across modules would make ++ silently DROP the
    // earlier gate query from Verify/Bench/Explain — fail loud instead.
    require(merged.size == modules.map(_.size).sum,
      s"duplicate query names across modules: " +
        modules.flatMap(_.keys).groupBy(identity)
          .collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used only for ops SQL genuinely can't express).
    */
  lazy val oracleSql: Map[String, String] =
    CoreQueries.oracle ++
      ValidatorQueries.oracle ++
      PipelineQueries.oracle ++
      DedupQueries.oracle ++
      TextQueries.oracle ++
      AnnQueries.oracle ++
      MultimodalQueries.oracle ++
      MediaGateQueries.oracle ++
      SinkQueries.oracle ++
      CurationQueries.oracle ++
      IngestGateQueries.oracle ++
      JoinQueries.oracle ++
      SketchQueries.oracle ++
      GraphQueries.oracle ++
      CodeQueries.oracle
}
