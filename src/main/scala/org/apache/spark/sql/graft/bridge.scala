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

  /** Assert a column (or lambda-variable field) non-null at the TYPE
    * level — Catalyst's `KnownNotNull`, which the Column API doesn't
    * expose. Used where a build guarantees non-nullness the analyzer
    * can't see (e.g. `transform` over `arrays_zip` of equal-length
    * arrays), so downstream codegen that specializes on static
    * nullability (containsNull) compiles without null branches.
    * CONTRACT: a runtime null under this assertion is undefined
    * behavior (reads garbage, never raises) — only wrap values that
    * are provably non-null by construction.
    */
  def knownNotNull(c: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.KnownNotNull(expression(c)))
}
