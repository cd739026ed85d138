package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CountMinMerge]] / [[CountMinEstimate]] — the properties the sk3
  * gate's exact regime can't see: shard-merge ≡ one global sketch,
  * the never-undercount guarantee on an over-width domain, parameter
  * mismatch rejection, null/empty behavior, and the SQL registration.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def skOf(df: org.apache.spark.sql.DataFrame, eps: Double = 0.01,
                   conf: Double = 0.99, seed: Int = 7) =
    df.agg(count_min_sketch(col("v"), lit(eps), lit(conf), lit(seed)).as("sk"))

  test("merge of per-shard sketches estimates like one global sketch") {
    val data = (0 until 2000).map(i => (i % 4, (i % 37).toLong))
    val df = data.toDF("shard", "v")
    val shards = df.groupBy("shard")
      .agg(count_min_sketch(col("v"), lit(0.001), lit(0.99), lit(7)).as("sk"))
    val merged = shards.agg(CountMin.merge(col("sk")).as("sk"))
    val global = skOf(df, eps = 0.001)
    val probes = (0L until 37L)
    def estimates(sk: org.apache.spark.sql.DataFrame): Seq[Long] =
      probes.toDF("v").crossJoin(broadcast(sk))
        .select(CountMin.estimate(col("sk"), col("v")))
        .collect().map(_.getLong(0)).toSeq
    assert(estimates(merged) == estimates(global))
    // exact regime: width 2000 >> 37 distinct values
    val exact = data.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(estimates(merged) == probes.map(exact))
  }

  test("estimates never undercount on an over-width domain") {
    // eps 0.5 -> width 4: collisions guaranteed over 1000 items
    val df = (0L until 1000L).map(i => i % 100).toDF("v")
    val sk = skOf(df, eps = 0.5)
    val ests = (0L until 100L).toDF("v").crossJoin(broadcast(sk))
      .select(CountMin.estimate(col("sk"), col("v")))
      .collect().map(_.getLong(0))
    assert(ests.forall(_ >= 10L), "CMS must never undercount")
    assert(ests.exists(_ > 10L), "width 4 over 100 items must collide")
  }

  test("string items round-trip through build and estimate") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("v")
    val sk = skOf(df)
    val ests = Seq("a", "b", "c", "zzz").toDF("v")
      .crossJoin(broadcast(sk))
      .select(CountMin.estimate(col("sk"), col("v")))
      .collect().map(_.getLong(0)).toSeq
    assert(ests == Seq(2L, 1L, 3L, 0L))
  }

  test("parameter mismatch between sketches fails loud") {
    val a = skOf(Seq(1L).toDF("v"), eps = 0.01)
    val b = skOf(Seq(2L).toDF("v"), eps = 0.001)
    val ex = intercept[Exception] {
      a.union(b).agg(CountMin.merge(col("sk"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("null sketches are skipped; all-null merge yields null") {
    val some = skOf(Seq(5L, 5L).toDF("v"))
      .union(Seq.empty[Array[Byte]].toDF("sk"))
    val merged = some.agg(CountMin.merge(col("sk")).as("sk"))
    val est = Seq(5L).toDF("v").crossJoin(broadcast(merged))
      .select(CountMin.estimate(col("sk"), col("v")))
      .collect()(0).getLong(0)
    assert(est == 2L)
    val allNull = Seq[Option[Array[Byte]]](None, None).toDF("sk")
      .agg(CountMin.merge(col("sk"))).collect()(0)
    assert(allNull.isNullAt(0))
  }

  test("SQL surface: count_min_merge / count_min_estimate registered") {
    graft.GraftExtensions.register(spark)
    Seq((1L, 10L), (1L, 10L), (2L, 10L), (2L, 20L)).toDF("shard", "v")
      .createOrReplaceTempView("cms_in")
    val est = spark.sql(
      """SELECT count_min_estimate(
        |  (SELECT count_min_merge(sk) FROM (
        |     SELECT count_min_sketch(v, 0.01d, 0.99d, 7) AS sk
        |     FROM cms_in GROUP BY shard)),
        |  CAST(10 AS BIGINT)) AS est""".stripMargin)
      .collect()(0).getLong(0)
    assert(est == 3L)
  }
}
