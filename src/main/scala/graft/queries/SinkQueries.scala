package graft.queries

import java.sql.DriverManager
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.SqlType
import graft.engine.sink.JdbcUpsert

/** K1 gate: drives the REAL JDBC upsert sink end-to-end against an
  * embedded in-memory Derby database and reports the post-upsert table
  * state as a query result the DuckDB oracle reproduces from the
  * parquet tables alone (reference `database.py:421-467` — keyed
  * upsert: insert, on key conflict update).
  *
  * NOTE: the two upsert passes run EAGERLY at DataFrame-construction
  * time (a sink has no lazy form), so any construction-only path — the
  * Explain plan audit included — executes the real Derby side effects
  * and then sees only the 1-row LocalTableScan of the result. That is
  * acceptable for a local gate: the DB is in-memory, unique per
  * invocation, and dropped in the finally below.
  *
  * Two passes over overlapping keys: pass 1 inserts every customer with
  * key ≤ 200; pass 2 re-upserts the even keys with balance + 10. The
  * end state must hold ONE row per key (no duplicates) carrying the
  * second pass's values — exactly what the oracle computes straight
  * from the parquet `customer` table.
  */
object SinkQueries {

  /** Unique in-memory DB per invocation so repeated runs in one JVM
    * (Verify then Bench, or retries) never see stale state.
    */
  private val runCounter = new AtomicInteger(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k1_upsert_state" -> { (s, d) =>
      import s.implicits._
      val url = s"jdbc:derby:memory:k1gate${runCounter.incrementAndGet()};create=true"
      val cfg = JdbcUpsert.Config(url, "k1_state", JdbcUpsert.GenericDialect,
        batchSize = 100)
      JdbcUpsert.ensureTable(cfg, Seq("bal" -> SqlType.DoubleT)) match {
        case Left(errs) => throw new IllegalStateException(errs.mkString("; "))
        case Right(())  => ()
      }
      val base = Tables.customer(s, d).filter(col("c_custkey") <= 200)
        .select(col("c_custkey").cast("string").as("data_id"),
          col("c_acctbal").as("bal"))
      val up1 = s.sparkContext.longAccumulator
      val f1 = s.sparkContext.longAccumulator
      JdbcUpsert.write(base, cfg, up1, f1)
      // Second pass: even keys, new balances — must UPDATE, not duplicate.
      val pass2 = base.filter(col("data_id").cast("long") % 2 === 0)
        .withColumn("bal", col("bal") + 10)
      val up2 = s.sparkContext.longAccumulator
      val f2 = s.sparkContext.longAccumulator
      JdbcUpsert.write(pass2, cfg, up2, f2)
      // Read the end state back from Derby: a 1-row aggregate (metadata-
      // sized — the data itself never moves through the driver).
      val conn = DriverManager.getConnection(url)
      val (nRows, sumBal) =
        try {
          val rs = conn.createStatement().executeQuery(
            """SELECT COUNT(*), SUM("bal") FROM "k1_state"""")
          rs.next()
          (rs.getLong(1), rs.getDouble(2))
        } finally {
          conn.close()
          // Drop the in-memory DB — without this each invocation strands
          // a full Derby instance for the JVM lifetime. Derby signals a
          // successful drop WITH an SQLException (state 08006).
          try DriverManager.getConnection(url.replace(";create=true", ";drop=true"))
          catch { case _: java.sql.SQLException => () }
        }
      Seq((nRows, sumBal, up2.value + f2.value))
        .toDF("n_rows", "bal_raw", "n_pass2")
        .select(col("n_rows"), round(col("bal_raw"), 2).as("sum_bal"),
          col("n_pass2"))
    },

    // -- K5: ORC lake round trip — the same partitioned/clustered
    //    layout as the parquet LakeSink, through Spark's built-in ORC
    //    source (stripe min-max stats serve the same pruning role).
    //    The oracle recomputes the aggregate from the original parquet
    //    table, so a row lost/duplicated/mistyped in the ORC round
    //    trip diverges. ---------------------------------------------
    "k5_orc_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_gate_k5_orc_${runCounter.incrementAndGet()}"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      graft.engine.sink.LakeSink.write(docs,
        graft.engine.sink.LakeSink.Config(dir,
          partitionBy = Seq("lang"), clusterBy = Seq("n_chars"),
          format = "orc"))
      val back = s.read.orc(dir).filter(col("n_chars") >= 500)
      back.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("doc_id").as("n_distinct"))
        .orderBy("lang")
    })

  def oracle: Map[String, String] = Map(
    "k1_upsert_state" ->
      """SELECT count(*) AS n_rows,
        | round(sum(CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 10
        |                ELSE c_acctbal END), 2) AS sum_bal,
        | sum(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_pass2
        |FROM customer WHERE c_custkey <= 200""".stripMargin,
    "k5_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        | count(DISTINCT doc_id) AS n_distinct
        |FROM documents WHERE n_chars >= 500
        |GROUP BY lang ORDER BY lang""".stripMargin)
}
