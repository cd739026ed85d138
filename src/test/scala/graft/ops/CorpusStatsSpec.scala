package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The mergeable-card contract: however rows are split into batches,
  * shardCard → mergeCards → finalizeCard equals the direct whole-corpus
  * computation on every exact field; the HLL field is approximate and
  * tested for tolerance only.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 300L).map { i =>
    val lang = if (i % 3 == 0) "en" else "de"
    val text = if (i % 50 == 0) "" else s"doc number $i " + ("word " * (i % 7).toInt)
    (i, lang, text, text.length.toLong)
  }.toDF("id", "lang", "text", "n_chars")

  private def directCard(df: DataFrame): DataFrame =
    CorpusStats.finalizeCard(
      CorpusStats.shardCard(df, Seq("lang"), "text", "n_chars"), Seq("lang"))

  private def exactFields(df: DataFrame): Map[String, (Long, Long, Long, Double, Double, Double)] =
    df.select(col("lang"), col("n_docs"), col("n_empty"), col("total_tokens"),
      col("avg_tokens"), col("p50_len"), col("p95_len"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap

  test("merged incremental card equals the direct whole-corpus card") {
    val direct = exactFields(directCard(docs))
    for (nBatches <- Seq(2, 3, 7)) {
      val cards = (0 until nBatches).map(b =>
        CorpusStats.shardCard(docs.filter(col("id") % nBatches === b),
          Seq("lang"), "text", "n_chars"))
      val merged = CorpusStats.finalizeCard(
        CorpusStats.mergeCards(cards.reduce(_ unionByName _), Seq("lang")),
        Seq("lang"))
      assert(exactFields(merged) == direct, s"diverged at $nBatches batches")
    }
  }

  test("percentiles match Spark's exact percentile (quantile_cont semantics)") {
    val truth = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val card = directCard(docs)
      .select(col("lang"), col("p50_len"), col("p95_len"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    for ((lang, (p50, p95)) <- truth) {
      assert(math.abs(card(lang)._1 - p50) < 1e-9, s"$lang p50")
      assert(math.abs(card(lang)._2 - p95) < 1e-9, s"$lang p95")
    }
  }

  test("HLL distinct estimate lands within tolerance of exact") {
    val many = (1L to 20000L).map(i => (i, "en", s"unique text $i", 10L))
      .toDF("id", "lang", "text", "n_chars")
    val card = directCard(many).select("approx_distinct").as[Long].head()
    assert(math.abs(card - 20000L) < 20000L * 0.05,
      s"HLL estimate $card off by more than 5% of 20000")
  }

  test("sketches union across batches (not just counts)") {
    // same 1000 digests in every batch: merged distinct must stay ~1000,
    // while n_docs triples — the field that would catch a sum-not-union bug
    val batch = (1L to 1000L).map(i => (i, "en", s"text $i", 6L))
      .toDF("id", "lang", "text", "n_chars")
    val cards = Seq(batch, batch, batch)
      .map(CorpusStats.shardCard(_, Seq("lang"), "text", "n_chars"))
    val m = CorpusStats.finalizeCard(
      CorpusStats.mergeCards(cards.reduce(_ unionByName _), Seq("lang")), Seq("lang"))
      .select("n_docs", "approx_distinct").as[(Long, Long)].head()
    assert(m._1 == 3000L)
    assert(math.abs(m._2 - 1000L) < 100L, s"union estimate ${m._2}")
  }

  test("edges: empty batch, single-batch group, null text and lengths") {
    val a = Seq((1L, "en", Option("alpha beta"), Option(10L)),
      (2L, "en", None: Option[String], None: Option[Long]))
      .toDF("id", "lang", "text", "n_chars")
    val b = Seq((3L, "fr", Option("gamma"), Option(5L)))
      .toDF("id", "lang", "text", "n_chars")
    val empty = a.filter(lit(false))
    val merged = CorpusStats.finalizeCard(
      CorpusStats.mergeCards(
        Seq(a, b, empty).map(CorpusStats.shardCard(_, Seq("lang"), "text", "n_chars"))
          .reduce(_ unionByName _), Seq("lang")), Seq("lang"))
    assert(merged.count() == 2)
    val en = merged.filter(col("lang") === "en")
      .select("n_docs", "n_empty").as[(Long, Long)].head()
    assert(en == ((2L, 1L)))
  }

  test("key columns colliding with card outputs are rejected") {
    val bad = Seq((1L, "x", "t", 1L)).toDF("n_docs", "lang", "text", "n_chars")
    intercept[IllegalArgumentException] {
      CorpusStats.shardCard(bad, Seq("n_docs"), "text", "n_chars")
    }
    val alsoBad = Seq((1L, "x", "t", 1L)).toDF("__text", "lang", "text", "n_chars")
    intercept[IllegalArgumentException] {
      CorpusStats.shardCard(alsoBad, Seq("__text"), "text", "n_chars")
    }
  }

  test("NULL-keyed groups keep their length stats (null-safe card joins)") {
    // lang=NULL is routine in crawl data; the scalars⋈lens join must
    // match the NULL group or p50/p95 silently vanish for it
    val d = Seq(
      (1L, Option("en"), Option("hello world"), Option(11L)),
      (2L, None: Option[String], Option("no lang a"), Option(9L)),
      (3L, None: Option[String], Option("no lang bb"), Option(10L)),
      (4L, None: Option[String], Option("no lang ccc"), Option(11L)))
      .toDF("id", "lang", "text", "n_chars")
    def check(card: DataFrame): Unit = {
      val row = card.filter(col("lang").isNull)
        .select("n_docs", "p50_len", "p95_len").collect()
      assert(row.length == 1, "NULL group missing from card")
      assert(row(0).getLong(0) == 3L)
      assert(!row(0).isNullAt(1) && row(0).getDouble(1) == 10.0,
        s"NULL group lost its percentiles: ${row(0)}")
    }
    check(directCard(d))
    // and through the merge path, split so the NULL group spans batches
    val cards = Seq(d.filter(col("id") <= 2), d.filter(col("id") > 2))
      .map(CorpusStats.shardCard(_, Seq("lang"), "text", "n_chars"))
    check(CorpusStats.finalizeCard(
      CorpusStats.mergeCards(cards.reduce(_ unionByName _), Seq("lang")),
      Seq("lang")))
  }

  test("percentiles that round to the same column name are rejected") {
    val card = CorpusStats.shardCard(docs, Seq("lang"), "text", "n_chars")
    intercept[IllegalArgumentException] {
      CorpusStats.finalizeCard(card, Seq("lang"), Seq(0.5, 0.504))
    }
  }
}
