package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction: Spark 4 wraps Columns
  * around `ColumnNode`s, and the Expression→Column conversion lives in the
  * classic module as `private[sql]`. This one-liner (in an `org.apache.
  * spark.sql` subpackage on purpose) is the supported-by-convention way for
  * libraries to expose custom Catalyst `Expression`s as `Column`s without
  * forcing every caller through `SparkSessionExtensions` function
  * registration. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
