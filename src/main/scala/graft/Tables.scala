package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata tables.
  *
  * Spark rejects parquet INT64 TIMESTAMP(NANOS) columns
  * (PARQUET_TYPE_ILLEGAL), which `events.ts` uses. We read nanos as a
  * plain long (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
  * [[GraftSession]]) and convert to a microsecond TimestampType column
  * here, so every query sees a regular timestamp.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    name match {
      case "events" =>
        // Defensive: any session (driver-built Verify/Bench included) must
        // read the nanos column; the conf is a runtime SQL conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        // ts arrives as nanos-since-epoch long; truncate to micros.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}

/** Session factory with the engine's canonical config. Kept in one place
  * so Bench / Verify / tests all execute under identical settings.
  */
object GraftSession {
  def builder(master: String = "local[32]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
