package graft.engine.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** The 7-counter run accounting (SURVEY.md §2.5 A1,
  * `ingestors/base.py:82-121`, `:938-1004`): three mutually-exclusive
  * failure channels (transfer / DB / API) + totals, populated from
  * executor-side accumulators, reported as the run banner
  * (`base.py:1063-1177`).
  */
final class RunSummary(spark: SparkSession) extends Serializable {
  val totalRecords: LongAccumulator = spark.sparkContext.longAccumulator("total_records")
  val processed: LongAccumulator = spark.sparkContext.longAccumulator("processed")
  val inserted: LongAccumulator = spark.sparkContext.longAccumulator("inserted")
  val apiSent: LongAccumulator = spark.sparkContext.longAccumulator("api_sent")
  val failedDb: LongAccumulator = spark.sparkContext.longAccumulator("failed_db")
  val skipped: LongAccumulator = spark.sparkContext.longAccumulator("skipped")
  val fileTransferFailures: LongAccumulator =
    spark.sparkContext.longAccumulator("file_transfer_failures")

  def hasFailures: Boolean =
    failedDb.value > 0 || fileTransferFailures.value > 0

  def successRate: Double =
    if (totalRecords.value == 0) 100.0
    else 100.0 * inserted.value / totalRecords.value

  def banner: String = {
    val bar = "=" * 60
    f"""$bar
       |Ingestion summary
       |$bar
       |  total records        : ${totalRecords.value}%10d
       |  processed            : ${processed.value}%10d
       |  inserted/upserted    : ${inserted.value}%10d
       |  sent to API          : ${apiSent.value}%10d
       |  skipped              : ${skipped.value}%10d
       |  failed (database)    : ${failedDb.value}%10d
       |  failed (file copy)   : ${fileTransferFailures.value}%10d
       |  success rate         : ${successRate}%9.1f%%
       |$bar""".stripMargin
  }
}
