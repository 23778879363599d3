package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 made the classic
  * `Column(expr)` constructor `private[sql]` (`ExpressionUtils` in
  * columnNodeSupport.scala); graft expressions that carry driver-side
  * state (e.g. a trained PQ codebook) cannot ride the SQL function
  * registry, so this is the one sanctioned hop into the sql package. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
