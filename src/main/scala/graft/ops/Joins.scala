package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's relational algebra lacks as
  * primitives: the as-of join (each left row picks the latest right row
  * at or before its timestamp) and the interval/range join (points
  * matched into [start, end] windows). Both are built as single-shuffle
  * equi-join shapes — never an inequality theta-join, which Catalyst
  * can only execute as a broadcast-nested-loop at any scale.
  */
object Joins {

  private val Reserved =
    Seq("__ts", "__side", "__tie", "__r", "__m", "__mb", "__mf", "__bin", "__salt")

  private def requireFree(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach(c => require(!df.columns.contains(c),
      s"input already has a reserved '$c' column"))

  /** As-of join: for every left row, the single right row with the same
    * key and the greatest `rightTsCol` <= `leftTsCol` (within
    * `toleranceMicros`, if given). Carried right columns surface as
    * `asof_<name>`, plus `asof_gap_micros` = left ts − matched right ts;
    * all are NULL when no right row qualifies.
    *
    * Physical shape — the distributed as-of idiom: UNION the two sides
    * with a side tag, ONE shuffle on the key, sort each partition by
    * (ts, side, tie), and carry the last non-null right payload forward
    * with a running `last(ignoreNulls)` window. No join node at all:
    * cost is one exchange + one in-partition sort, the same as any
    * keyed window, regardless of how many right rows precede each left
    * row (a theta-join `r.ts <= l.ts` would expand those pairs
    * physically). Rows-frame running `last` is O(1) per row. At 100 TB
    * the shuffle is keyed on the join key, so skew mitigations (AQE,
    * salting by time-bucket with per-bucket seeding) apply as for any
    * windowed aggregate.
    *
    * Determinism: right rows tying on (key, ts) are ordered by
    * `rightTieCol` ascending, so the LARGEST tie value wins. Pass a
    * unique column (an id) — row-order ties would otherwise pick a
    * partition-order-dependent winner.
    *
    * Right rows at ts EQUAL to a left row's ts always qualify
    * (inclusive on every direction).
    *
    * NULL keys never match (SQL equi-join semantics, matching the
    * DuckDB `=` oracle and pandas merge_asof): right rows with a NULL
    * in any key column are dropped before the union, and left rows
    * with a NULL key therefore surface with NULL asof_* columns. A
    * window partitionBy would otherwise group NULLs together and
    * silently match them.
    *
    * `direction` (the pandas merge_asof trio):
    *  - `"backward"` (default): greatest right ts <= left ts — one
    *    running `last(ignoreNulls)` window;
    *  - `"forward"`: smallest right ts >= left ts — the mirrored
    *    `first(ignoreNulls)` over the following frame;
    *  - `"nearest"`: whichever of the two has the smaller |gap|
    *    within tolerance; exact ties go backward. Costs a second
    *    in-partition sort (opposite order), still ONE exchange.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTsCol: String, rightTsCol: String,
               carryCols: Seq[String], rightTieCol: String,
               toleranceMicros: Long = Long.MaxValue,
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(toleranceMicros >= 0, s"negative tolerance: $toleranceMicros")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest: $direction")
    requireFree(left, Reserved)
    carryCols.foreach(c => require(right.columns.contains(c),
      s"carry column '$c' not in right side"))
    require(!carryCols.contains(rightTsCol),
      s"'$rightTsCol' is carried implicitly as asof_$rightTsCol")
    val outNames =
      (rightTsCol +: carryCols).map("asof_" + _) :+ "asof_gap_micros"
    outNames.foreach(c => require(!left.columns.contains(c),
      s"left already has a column named output '$c' — withColumn would " +
        "silently overwrite it"))

    // Drop NULL-keyed right rows: partitionBy groups NULLs together, so
    // without this a NULL-keyed left row would match a NULL-keyed right
    // row — diverging from equi-join semantics.
    val rightKeyed = right.filter(keys.map(col(_).isNotNull).reduce(_ && _))

    val rTagged = rightKeyed.select(
      keys.map(col) ++ Seq(
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        col(rightTieCol).as("__tie"),
        struct(col(rightTsCol).as(rightTsCol) +: carryCols.map(col): _*)
          .as("__r")): _*)
    val lTagged = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
    // unionByName fills the columns each side lacks (__tie/__r on the
    // left, the left payload on the right) with NULLs.
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // Backward: right rows at equal ts sort BEFORE the left row
    // (side 0 < 1) so the preceding frame includes them; among tied
    // right rows the LARGEST tie value is last, so it wins.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward mirror: left first at equal ts (side desc) so the
    // following frame includes equal-ts right rows; tie desc keeps the
    // same largest-tie-wins convention under first().
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val lts = unix_micros(col("__ts"))
    def gapOf(m: Column): Column =
      abs(lts - unix_micros(m.getField(rightTsCol)))
    def valid(m: Column): Column =
      m.isNotNull && gapOf(m) <= toleranceMicros

    val withM = direction match {
      case "backward" =>
        unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wB))
      case "forward" =>
        unioned.withColumn("__m", first(col("__r"), ignoreNulls = true).over(wF))
      case "nearest" =>
        unioned
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wB))
          .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wF))
          .withColumn("__m",
            when(valid(col("__mb")) &&
              (!valid(col("__mf")) || gapOf(col("__mb")) <= gapOf(col("__mf"))),
              col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }

    val gap = gapOf(col("__m"))
    val inTol = valid(col("__m"))
    val matched = withM.filter(col("__side") === 1)
    val out = carryCols.foldLeft(
      matched
        .withColumn(s"asof_$rightTsCol",
          when(inTol, col("__m").getField(rightTsCol)))
        .withColumn("asof_gap_micros", when(inTol, gap))) {
      (df, c) => df.withColumn(s"asof_$c", when(inTol, col("__m").getField(c)))
    }
    out.drop("__ts", "__side", "__tie", "__r", "__m")
  }

  /** Interval/range join: every (point, interval) pair with equal keys
    * and `startCol <= tsCol <= endCol` (microsecond precision, both ends
    * inclusive). Returns all point columns plus all non-key interval
    * columns — the two sides must not share non-key names.
    *
    * Physical shape — the binned range-join idiom: time is cut into
    * fixed `binMicros` buckets; each interval explodes into the buckets
    * it covers, each point lands in exactly one, and the pair space
    * reduces to an EQUI-join on (keys, bucket) + an exact residual
    * filter. A pair is emitted at most once (the point's single bucket
    * is covered once per interval), so no distinct pass. The naive
    * `BETWEEN` theta-join has no equi-key and Catalyst plans it as a
    * broadcast-nested-loop — O(|points| × |intervals|) compares; this
    * shape shuffle-partitions on (keys, bucket) like any join. Pick
    * `binMicros` near the typical interval length: replication per
    * interval is length/binMicros + 1, while too-large bins put
    * unrelated points in the same bucket for the residual filter to
    * discard. Intervals with end < start are dropped (empty by
    * definition, and `sequence()` would otherwise count backwards).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                tsCol: String, startCol: String, endCol: String,
                binMicros: Long): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(binMicros > 0, s"binMicros must be positive: $binMicros")
    requireFree(points, Reserved)
    requireFree(intervals, Reserved)
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns shared by both sides: ${overlap.mkString(", ")}")

    def bin(c: Column): Column = floor(unix_micros(c) / binMicros)
    val pts = points.withColumn("__bin", bin(col(tsCol)))
    val ivs = intervals
      .filter(unix_micros(col(startCol)) <= unix_micros(col(endCol)))
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    pts.join(ivs, keys :+ "__bin")
      .filter(
        unix_micros(col(tsCol)) >= unix_micros(col(startCol)) &&
          unix_micros(col(tsCol)) <= unix_micros(col(endCol)))
      .drop("__bin")
  }

  /** Salted equi-join for a LEFT side with heavy-hitter keys and a
    * RIGHT side too large to broadcast. A plain shuffle join sends every
    * row of a hot key to ONE reducer — the one straggler task that holds
    * a 100 TB job hostage. Salting splits each left key's rows across
    * `salt` sub-keys (deterministically, from a hash of the whole row —
    * retry-stable, unlike `rand()`), replicates the right side `salt`×
    * via `explode`, and joins on (keys, salt): each hot key now runs on
    * `salt` reducers.
    *
    * Cost: the right side shuffles `salt`× its size — worth it exactly
    * when the left skew dominates. AQE's skew-join handles the
    * sort-merge case adaptively; this explicit form also covers
    * stream-static joins and deterministic plans where AQE is off.
    *
    * Join types where right-replication is semantics-preserving for the
    * LEFT side's rows: inner, left_outer (each left row sees exactly its
    * own salt's replica, so no duplicate matches and no lost
    * nulls-extension), left_semi, left_anti. Right-preserving types
    * would see the replicated right — rejected.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val jt = joinType.toLowerCase.replace("outer", "").filter(_ != '_')
    require(Seq("inner", "left", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType'")
    requireFree(left, Seq("__salt"))
    requireFree(right, Seq("__salt"))
    // Mix the input partition id into the salt: a whole-row hash alone
    // collapses EXACT-DUPLICATE left rows onto one salt — and a
    // dup-heavy hot key (crawler re-emitting one page, pre-dedup) is
    // precisely the skew case. Partition id is deterministic per input
    // split (retry-stable), unlike rand().
    val salted = left.withColumn("__salt",
      pmod(hash((left.columns.map(col) :+ spark_partition_id()): _*), lit(salt)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
