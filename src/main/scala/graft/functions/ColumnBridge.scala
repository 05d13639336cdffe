package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst Expression bridge. Spark 4 made the converters
  * `private[sql]` (`classic.ExpressionUtils`); custom native expressions
  * still need them, so this object lives under the org.apache.spark.sql
  * package to reach the accessor — the standard pattern for third-party
  * Catalyst expressions on Spark 4.
  */
object ColumnBridge {
  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
