package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints the formatted physical plan of selected gate
  * queries (all of them with no args) plus a one-line red-flag scan —
  * cartesians, nested-loop joins, unexpected global sorts — so plan
  * regressions are visible without reading every plan by eye.
  *
  * Usage: runMain graft.tools.Explain [queryName ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
  */
object Explain {

  private val redFlags = Seq(
    "CartesianProduct", "BroadcastNestedLoopJoin")

  /** Queries whose plan legitimately contains SPECIFIC flagged
    * operators, with the justification printed alongside the waiver.
    * Keyed (query, operator) so a waived query that regresses into a
    * DIFFERENT flagged operator still fails the audit. Keep this list
    * SHORT — every entry is a documented design decision, not an
    * exemption of convenience.
    */
  private val waived: Map[String, Map[String, String]] = Map(
    "ann_ivf_topk" -> Map("BroadcastNestedLoopJoin" ->
      ("crossJoin(broadcast(centroids)) IS the IVF assignment: every " +
        "vector scores against the small broadcast centroid set — " +
        "compute-bound, zero shuffle, |C| bounded")),
    "ann_kmeans_ivf" -> Map("BroadcastNestedLoopJoin" ->
      ("same IVF-assignment crossJoin(broadcast) as ann_ivf_topk, over " +
        "the k-means-trained centroid set (training iterations are " +
        "checkpoint-materialized and not part of this plan)")),
    "ann_ivfpq_topk" -> Map("BroadcastNestedLoopJoin" ->
      ("the COARSE stage only: the same IVF-assignment " +
        "crossJoin(broadcast(centroids)) as ann_ivf_topk (encode side) " +
        "plus the query-probe selection; the PQ stage itself is a " +
        "broadcast equi-join on sub and a bucket equi-join — never a " +
        "cross product")),
    "d12_semantic_dedup" -> Map("BroadcastNestedLoopJoin" ->
      ("the SemDeDup cluster assignment is the same " +
        "crossJoin(broadcast(centroids)) as ann_kmeans_ivf; the " +
        "within-cluster compare itself is a bucket equi-join")),
    "t8_tfidf" -> Map("BroadcastNestedLoopJoin" ->
      ("crossJoin(broadcast(N)) where N is the ONE-ROW corpus-count " +
        "frame: each task loops over exactly one broadcast row — free " +
        "at any scale, and lazier than a driver-side count() action")),
    "t11_lm_score" -> Map("BroadcastNestedLoopJoin" ->
      ("same one-row crossJoin(broadcast) as t8_tfidf, carrying the " +
        "scalar vocabulary size into the smoothing denominator")),
    "t12_boilerplate" -> Map("BroadcastNestedLoopJoin" ->
      ("two one-row crossJoin(broadcast)s: the corpus count feeding the " +
        "df threshold, and the vocabulary-bounded drop SET carried onto " +
        "one scan — each task loops over exactly one broadcast row")),
    "c17_dsir_weights" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(totals)) carrying the two scalar " +
        "feature counts into the bucket-bounded ratio frame — the " +
        "t8/t11 shape; the frame it lands on is ≤ `buckets` rows")),
    "c18_ppl_buckets" -> Map("BroadcastNestedLoopJoin" ->
      ("inherited from bigramLogProb's one-row vocabulary-size " +
        "crossJoin(broadcast) — the same scalar-smoothing shape " +
        "waived for t11_lm_score")),
    "sk5_theta_set_ops" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast) of two single-sketch frames — " +
        "the set-op expressions run over exactly one pair of " +
        "card-sized binaries; the corpus is touched only by the two " +
        "sketch aggregates (sk2 shape)")),
    "t45_zipf_card" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(regression sums)) carrying the " +
        "five fit scalars onto the one-row totals frame — the t8 " +
        "shape; the vocabulary is touched only by the two keyed " +
        "aggregates and the count-of-counts rollup")),
    "t39_collocations" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(T, B totals)) carrying the two " +
        "scalar instance counts into the PMI expression; the " +
        "unigram-count joins are true equi-joins (t8 shape)")),
    "t27_bm25" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(corpus stats)) — N, total tokens " +
        "and |terms| document frequencies collapse to a single " +
        "broadcast row; scoring itself is a pure map stage (t8 shape)")),
    "sk2_hll_union" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(true count)) — the GATE's " +
        "exact-count pin rides next to the sketch estimate; the " +
        "sketch path itself is two bounded aggregates (t8 shape)")),
    "t32_kneser_ney" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(bigram-type total B)) carrying " +
        "the continuation-probability denominator — the same " +
        "scalar-smoothing shape waived for t11_lm_score")),
    "t35_kn3" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(bigram-type total B)) at the " +
        "unigram-continuation level of the recursive trigram KN — " +
        "identical scalar shape to t32_kneser_ney")),
    "sk3_countmin" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(merged sketch)) — the point-query " +
        "stage runs over the 10-row probe frame against exactly one " +
        "broadcast sketch row; the corpus is touched only by the " +
        "shard-sketch aggregate (sk2 shape)")),
    "m13_image_phash" -> Map("BroadcastNestedLoopJoin" ->
      ("one-row crossJoin(broadcast(base-image hash)) — the GATE's " +
        "relation pin rides the 6-row fixture against exactly one " +
        "broadcast reference row; production near-dup goes through " +
        "the banded equi-join (m11)")))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wanted =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    wanted.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NO SUCH QUERY ==")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.executedPlan.toString
            val hits = redFlags.filter(plan.contains)
            if (args.nonEmpty) {
              println(s"==== $name ====")
              df.explain("formatted")
            }
            val waivers = waived.getOrElse(name, Map.empty)
            val (known, novel) = hits.partition(waivers.contains)
            known.foreach(op => println(s"WAIVE $name: $op — ${waivers(op)}"))
            if (novel.nonEmpty) {
              flagged += 1
              println(s"FLAG  $name: ${novel.mkString(", ")}")
            } else if (hits.isEmpty && args.isEmpty) println(s"OK    $name")
          } catch {
            case e: Throwable => println(s"ERR   $name: ${e.getMessage}")
          }
      }
    }
    println(s"\n${wanted.size} plans checked, $flagged flagged")
    spark.stop()
  }
}
