package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 split `Column` off its Catalyst backing (`Column.expr` is gone
  * from the public API; the classic implementation lives behind
  * `private[sql]` seams). Extension libraries that ship native Catalyst
  * expressions — our [[graft.plans.TopKByScore]] — need exactly two
  * conversions, so this object lives under `org.apache.spark.sql` to reach
  * the `private[sql]` utilities. No Spark internals are modified.
  */
object ColumnBridge {

  /** Wrap a Catalyst expression as a public Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a public Column to its Catalyst expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Eagerly convert a COMPOSED Column (built with `functions.*`) into a
    * self-contained Catalyst expression tree. [[expression]] wraps the
    * column's node lazily (fine inside DataFrame context, where the
    * session's converter visits it during analysis); a FunctionRegistry
    * builder's result leaves that context, so the lazy wrapper would
    * surface as an unconvertible `columnnodeexpression()` of VOID type.
    * This walks the node tree through the canonical converter instead. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
