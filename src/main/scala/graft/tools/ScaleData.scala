package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Builds a scaled-up replica of a testdata directory for scale-sanity
  * benchmarking: `runMain graft.tools.ScaleData [src] [dst] [reps]`
  * (defaults `/root/testdata/sf0.1 /tmp/graft_sf1 10`).
  *
  * Each table is replicated `reps` times with every surrogate key
  * shifted into a disjoint range per replica (offset `rep << 32`), so
  * foreign-key joins stay consistent within a replica and never match
  * across replicas — "the same data, `reps` times more of it".
  *
  * Content columns that drive NEAR-DUPLICATE detection are perturbed
  * per replica, because verbatim copies would give every document
  * `reps-1` extra near-duplicates and grow pair counts quadratically
  * in `reps` — the bench would then read super-linear through no fault
  * of the plans. Documents get a per-replica letter rotation
  * (`translate` over the full a-z/A-Z: changes every lettered shingle,
  * preserves length, case positions and whitespace structure);
  * embeddings get a per-replica array rotation
  * (preserves the norm, decorrelates the direction). Within a replica
  * the duplicate/neighbor structure of the source is preserved
  * exactly, so totals should scale ≈ linearly in `reps`.
  *
  * Output is written as multi-file parquet (32 files per table), so
  * scans split across cores — removing the single-row-group artifact
  * the driver-generated small-SF files have.
  */
object ScaleData {
  private val Offset = 1L << 32
  // Full alphabet, both cases: a rotation confined to a subset (e.g.
  // a-j) leaves text dominated by other characters near-verbatim across
  // replicas, and near-dup pair counts then grow super-linearly in reps
  // — the artifact the perturbation exists to remove.
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private val Alpha = Lower + Upper
  private def rotated(i: Int): String = {
    val k = i % Lower.length
    Lower.drop(k) + Lower.take(k) + Upper.drop(k) + Upper.take(k)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    require(reps >= 1 && reps <= Lower.length,
      s"reps must be 1..${Lower.length}: each replica needs a distinct text rotation")

    val spark = GraftSession.get("local[32]", 32)

    // Dimension tables are shared reference data — copy through
    // unchanged (every replica's nation/region keys resolve against
    // the same rows, as a real warehouse's conformed dimensions would).
    val passthrough = Seq("region", "nation")
    val keyShifts: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    def replicate(df: DataFrame, shifts: Seq[String]): DataFrame = {
      val repDf = spark.range(reps).select(col("id").cast("int").as("__rep"))
      val crossed = df.crossJoin(broadcast(repDf))
      shifts.foldLeft(crossed)((d, k) =>
        d.withColumn(k, col(k) + col("__rep").cast("long") * Offset))
    }

    def perRep(base: Column)(f: Int => Column): Column =
      (1 until reps).foldLeft(when(col("__rep") === 0, base)) {
        (acc, i) => acc.when(col("__rep") === i, f(i))
      }.otherwise(base)

    def write(name: String, df: DataFrame): Unit = {
      df.drop("__rep").repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"scaled $name -> $dst/$name.parquet")
    }

    passthrough.foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    }
    keyShifts.foreach { case (t, shifts) =>
      // Raw read (no Tables conversions): events.ts stays a nanos long
      // and round-trips bit-identically through the replica.
      val df = replicate(spark.read.parquet(s"$src/$t.parquet"), shifts)
      val out = t match {
        case "documents" =>
          df.withColumn("text", perRep(col("text")) { i =>
            translate(col("text"), Alpha, rotated(i))
          })
        case "embeddings" =>
          val dim = df.select(size(col("embedding"))).head().getInt(0)
          df.withColumn("embedding", perRep(col("embedding")) { i =>
            val k = i % dim
            concat(slice(col("embedding"), k + 1, dim - k),
              slice(col("embedding"), 1, k))
          })
        case _ => df
      }
      write(t, out)
    }
    spark.stop()
  }
}
