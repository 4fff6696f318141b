package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. In Spark 4 the Column API no longer
  * exposes its Expression publicly (Connect compatibility); the
  * supported conversion lives in the private[sql] ExpressionUtils, so
  * this one-file shim inside the sql namespace is the standard way
  * for an extension library to lift a custom Catalyst Expression into
  * a Column.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
