package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the repeated-query face of
  * [[TextAnalysis.bm25]] (which scores one fixed term bag in a single
  * scan). A retrieval workload asks MANY queries against the SAME
  * corpus; re-scanning 100 TB of text per query is the wrong shape.
  * The index is built once — term-clustered postings plus the corpus
  * statistics — and each query reads ONLY its terms' postings:
  *
  *  - `postings/` parquet `(term, doc, tf, dl)`, repartitioned AND
  *    sorted by term, so row-group min/max stats make the per-query
  *    `term IN (…)` filter prune at the scan (pushdown verified in
  *    the spec) — a query touches O(matching postings), not O(corpus).
  *    The document length `dl` is DENORMALIZED into each posting
  *    (8 bytes/row) precisely so a query never joins an O(corpus)
  *    doc-length table: everything it reads is term-pruned;
  *  - `stats/` one row `(n_docs, avgdl)`.
  *
  * Document frequency is derived per query from the matched postings
  * themselves (`count per term` — exact, no extra table), and scoring
  * follows [[TextAnalysis.bm25]]'s operation order exactly
  * (`idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, the Robertson/
  * Sparck Jones form with the +1 floor), so the two faces rank
  * identically and the DuckDB oracle can replay either.
  */
object Bm25Index {

  /** On-disk format version, stamped into `stats/`. Version 2 = `dl`
    * denormalized into the postings (no `lens/` table). A version-1
    * index (separate `lens/`, no `dl` column) would otherwise fail
    * [[query]] with an opaque unresolved-column error on `dl`; the
    * stamp turns that into a "rebuild the index" message at open.
    */
  val FormatVersion = 2L

  private def toks(textCol: String) =
    when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(regexp_extract_all(col(textCol),
        lit("[^ \\t\\n\\f\\r]+"), lit(0)))

  /** Build the index at `dir`. One corpus pass: tokenize → explode →
    * per-(doc, term) counts; lengths and corpus stats ride the same
    * aggregates.
    */
  def build(df: DataFrame, idCol: String, textCol: String,
            dir: String): Unit = {
    val spark = df.sparkSession
    // Scan-parallelism repair (guide §2.5, the Par.spread rule): the
    // tokenize pass that fills the `base` cache otherwise rides a
    // single-split scan as ONE task (t52 profiled as 21 single-task
    // stages). No-op at production scale (byte rule).
    val base = graft.util.Par
      .spread(df.select(col(idCol).as("doc"), col(textCol)), "doc")
      .select(col("doc"), toks(textCol).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      base.select(col("doc"), size(col("__t")).cast("long").as("dl"),
          explode(col("__t")).as("term"))
        .groupBy("term", "doc", "dl").agg(count(lit(1)).as("tf"))
        .select("term", "doc", "tf", "dl")
        .repartition(col("term"))
        .sortWithinPartitions("term", "doc")
        .write.mode("overwrite").parquet(s"$dir/postings")
      base.select(size(col("__t")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"),
          (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
        .withColumn("format", lit(FormatVersion))
        .write.mode("overwrite").parquet(s"$dir/stats")
    } finally { base.unpersist(); () }
  }

  /** Top-`k` documents for a term bag, by BM25 over the index at
    * `dir` — deterministic order `(score desc, doc)`. Duplicate query
    * terms count once (a BAG query weights by repetition in classic
    * BM25 only via qtf, which [[TextAnalysis.bm25]] also omits).
    * Returns `(doc, bm25)`.
    */
  def query(spark: SparkSession, dir: String, terms: Seq[String],
            k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    require(k >= 1, s"k must be >= 1: $k")
    require(k1 >= 0, s"k1 must be >= 0: $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1]: $b")
    val distinctTerms = terms.distinct
    // format gate BEFORE touching postings: a stale index fails with
    // instructions, not an unresolved-column error three joins deep
    val stats = spark.read.parquet(s"$dir/stats")
    val statedVersion =
      if (stats.columns.contains("format"))
        stats.select("format").head().getLong(0)
      else 1L
    require(statedVersion == FormatVersion,
      s"BM25 index at $dir is format version $statedVersion; this " +
        s"reader needs version $FormatVersion — rebuild it with " +
        "Bm25Index.build")
    // the IN filter reaches the parquet scan; term-sorted row groups
    // prune everything else
    val matched = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(distinctTerms: _*))
    val withDf = matched.join(
      matched.groupBy("term").agg(count(lit(1)).as("__df")), Seq("term"))
    // dl rides the posting row — NO O(corpus) doc-length join here
    val joined = ScalarFold.withScalars(
      withDf, stats.drop("format"))
    val dfT = col("__df").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
    val tf = col("tf").cast("double")
    val dl = col("dl").cast("double")
    val score = idf * (tf * lit(k1 + 1)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    joined
      .groupBy("doc").agg(sum(score).as("bm25"))
      .orderBy(col("bm25").desc, col("doc"))
      .limit(k)
  }
}
