package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.sink.LakeSink

/** The bucketed-layout contract: a corpus bucketed on its join key is
  * read IN PLACE by every subsequent join on that key — zero Exchange
  * on the corpus side, batch after batch. These are plan-shape
  * assertions (the same class as the BNLJ audit): if a Spark upgrade
  * or a conf change silently re-enables the corpus shuffle, this spec
  * is what fails.
  */
class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 500L)
    .map(i => (i, s"digest_${i % 97}", s"content $i"))
    .toDF("id", "digest", "body")

  /** Fresh external table: catalog metadata only, data under tmpDir —
    * re-runs can't collide with a stale managed-table location.
    */
  private def writeTable(df: DataFrame, name: String, buckets: Int,
                         sortCols: Seq[String] = Nil): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    LakeSink.writeBucketed(df, name, Seq("digest"), buckets,
      sortCols = sortCols, path = Some(tmpDir(name).toString + "/t"))
  }

  /** Count ShuffleExchange nodes in the EXECUTED plan. AQE re-plans at
    * runtime AND hides materialized subtrees inside QueryStageExec
    * LEAVES (Result/Shuffle/BroadcastQueryStage — their inner plan is
    * not a traversed child), so a plain `collect` under-reports; this
    * recurses through every wrapper.
    */
  private def shuffles(p: SparkPlan): Int = {
    val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
    val below = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case _ => p.children.map(shuffles).sum
    }
    self + below
  }

  private def shuffleCount(df: DataFrame): Int = {
    df.collect()
    shuffles(df.queryExecution.executedPlan)
  }

  test("bucketed-to-bucketed equi-join plans zero shuffles") {
    writeTable(corpus, "bl_corpus_a", 8)
    writeTable(corpus.withColumn("body", lit("other")), "bl_corpus_b", 8)
    val joined = spark.table("bl_corpus_a").join(
      spark.table("bl_corpus_b").select(col("digest")).distinct()
        .withColumnRenamed("digest", "d2"),
      col("digest") === col("d2"))
    // distinct() on the right shuffles within that side; the JOIN
    // itself must add none for the bucketed left. Simplest strong
    // assertion: join the two bucketed tables directly.
    val direct = spark.table("bl_corpus_a").as("a")
      .join(spark.table("bl_corpus_b").as("b"), "digest")
    assert(shuffleCount(direct) == 0,
      "bucketed-bucketed equi-join must not exchange either side")
    assert(joined.count() == 500L)
  }

  test("incremental dedup against a bucketed corpus shuffles ONLY the batch") {
    writeTable(corpus, "bl_corpus_c", 8)
    val batch = (80L to 120L)
      .map(i => (i + 1000, s"digest_${i % 97}", s"new $i"))
      .toDF("id", "digest", "body")
    // At production corpus sizes this join is a sort-merge anti-join;
    // disable broadcast so the test plans that shape (a broadcast of
    // the 97-row digest set would hide the property under test).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // left-anti join: keep batch rows whose digest is NOT in the corpus
      val kept = batch.join(spark.table("bl_corpus_c").select("digest"),
        Seq("digest"), "left_anti")
      // exactly one exchange: the batch side aligning to the corpus's
      // bucketing; the 500-row corpus scan stays in place
      assert(shuffleCount(kept) == 1,
        "bucketed corpus must be read in place; only the batch aligns")
      // semantics: every batch digest collides (i%97 covers the corpus keys)
      assert(kept.count() == 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("writeBucketed validates inputs and supports sorted buckets") {
    intercept[IllegalArgumentException] {
      LakeSink.writeBucketed(corpus, "bl_bad", Seq.empty, 8)
    }
    intercept[IllegalArgumentException] {
      LakeSink.writeBucketed(corpus, "bl_bad", Seq("digest"), 0)
    }
    writeTable(corpus, "bl_sorted", 4, sortCols = Seq("digest", "id"))
    val t = spark.table("bl_sorted")
    assert(t.count() == 500L)
    // catalog carries the bucket spec
    val desc = spark.sql("DESCRIBE EXTENDED bl_sorted").collect()
      .map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("Bucket Columns"))
  }
}
