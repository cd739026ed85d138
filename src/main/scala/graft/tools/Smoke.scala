package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off toolchain smoke: can Spark 4.1.2 read every testdata table,
  * including events.parquet whose `ts` is parquet timestamp[ns]?
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[4]", 4)
    val dir = "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try {
        val df = graft.Tables.load(spark, dir, t)
        println(s"OK $t count=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"FAIL $t: ${e.toString.take(300)}")
      }
    }
    // Drive the custom expressions through a real (codegen) Spark job.
    import org.apache.spark.sql.functions._
    import graft.functions.{GraftFunctions => F}
    val docs = graft.Tables.load(spark, dir, "documents")
    val hashed = docs
      .withColumn("bucket", F.labelBucket(col("lang")))
      .withColumn("nullb", F.labelBucket(lit(null).cast("string")))
      .withColumn("blankb", F.labelBucket(lit("  ")))
      .groupBy("lang", "nullb", "blankb").agg(min("bucket").as("mn"), max("bucket").as("mx"))
      .orderBy("lang")
    hashed.collect().foreach(r => println(s"BUCKET ${r.mkString(",")}"))
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val self = emb.select(col("vec_id"),
      F.cosineSim(col("embedding"), col("embedding")).as("selfcos"),
      F.cosineSim(col("embedding"), expr("transform(embedding, x -> 0.0f)")).as("zerocos"))
      .agg(min("selfcos"), max("selfcos"), max("zerocos"))
    self.collect().foreach(r => println(s"COSINE ${r.mkString(",")}"))
    // Dedup kernels through the DataFrame surface: self-similarity must be
    // exact (jaccard 1.0, simhash hamming 0, identical band keys).
    val dd = docs.limit(50)
      .withColumn("sh", F.simhash(col("text")))
      .withColumn("fp", F.fingerprint(col("text")))
      .withColumn("sig", F.minhashSig(col("text"), 64, 3))
      .withColumn("bands", F.minhashBands(col("sig"), 8))
      .withColumn("jac_self", F.jaccardSim(col("text"), col("text"), 3))
      .withColumn("ham_self", F.hamming(col("sh"), col("sh")))
      .agg(min("jac_self"), max("ham_self"), countDistinct("sh"),
        countDistinct("fp"), max(size(col("sig"))), max(size(col("bands"))))
    dd.collect().foreach(r => println(s"DEDUP ${r.mkString(",")}"))
    spark.stop()
  }
}
