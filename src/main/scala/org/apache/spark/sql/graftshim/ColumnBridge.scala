package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr` / `new Column(expr)` from the public API
  * (Connect-compatible Column); the classic conversions live in
  * `private[sql]` ExpressionUtils. This shim, placed inside the sql package
  * hierarchy like other Spark extension libraries do, re-exposes the two
  * conversions custom Catalyst expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
