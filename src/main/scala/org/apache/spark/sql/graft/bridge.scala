package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 wraps Column around ColumnNode and
  * keeps the converters `private[sql]`; extension libraries shipping
  * native Catalyst expressions need this two-method shim inside the
  * `org.apache.spark.sql` package (the same pattern community libraries
  * use to expose custom expressions on the public Column API).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  // the KnownNotNull assertion (misuse = silent undefined behavior)
  // lives in graft.plans.Nullability, scoped private[graft] — the
  // UB-capable surface stays off this public bridge by design
}
