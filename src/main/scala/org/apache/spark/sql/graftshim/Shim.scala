package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor (the sql
  * module split moved it behind `classic.ExpressionUtils`, which is
  * `private[sql]`). Custom Catalyst expressions (graft.functions
  * .RollingMinHash) still need a Column wrapper, so this one-file
  * subpackage of org.apache.spark.sql re-exports the two converters.
  * Nothing else may go in this package.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
