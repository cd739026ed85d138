package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the classic Column→Expression plumbing behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`). Libraries
  * that ship custom Catalyst expressions expose them through a small shim in
  * the `org.apache.spark.sql` namespace — the same approach used by public
  * Spark extension libraries. This is the only file outside the `graft`
  * package.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
