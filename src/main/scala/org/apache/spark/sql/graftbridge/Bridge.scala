package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so third-party native
  * expressions need a shim inside the `org.apache.spark.sql` namespace — the
  * standard pattern for Spark extension libraries. This is the ONLY file in
  * the repo that reaches into Spark's namespace; everything else goes through
  * it.
  */
object Bridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
