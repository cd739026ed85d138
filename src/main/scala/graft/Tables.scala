package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata tables.
  *
  * `events.ts` has shipped in TWO physical layouts across testdata
  * generations: INT64 TIMESTAMP(NANOS) — which Spark rejects outright
  * (PARQUET_TYPE_ILLEGAL) unless read as a plain long via
  * `spark.sql.legacy.parquet.nanosAsLong=true` — and plain
  * TIMESTAMP(MICROS) without a UTC flag, which Spark reads as
  * TIMESTAMP_NTZ. The loader sniffs the schema and normalizes BOTH to
  * the same microsecond TimestampType column (session tz is UTC
  * everywhere — [[GraftSession]], Verify, Bench — so the NTZ cast is
  * instant-preserving), and every query downstream sees one stable
  * type regardless of which generator wrote the file.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    name match {
      case "events" =>
        // Defensive: any session (driver-built Verify/Bench included)
        // must survive the nanos layout; the conf is a runtime SQL conf
        // and harmless when the column is already micros.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // nanos-since-epoch long; truncate to micros.
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast("timestamp"))
          case _ => df // already TimestampType
        }
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
      // Byte-adaptive partitioning for cached-plan output — see the
      // matching setting in Bench: persisted frames re-scanned by many
      // consumers should hold advisory-sized partitions, not a static
      // cores-many count.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
