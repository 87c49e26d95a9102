package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ⇄ Column bridge for graft's broadcast-model kernels.
  *
  * Spark 4 made `Column` a column-node wrapper and the converter
  * (`classic.ExpressionUtils`) `private[sql]`, so a library can no longer
  * construct a Column from a custom Catalyst Expression directly. The
  * function-registry route (how graft's other native kernels are exposed)
  * can't carry a non-Column argument like a
  * [[org.apache.spark.broadcast.Broadcast]] model handle — hence this
  * one-object bridge in the `org.apache.spark.sql` package, the same
  * pattern other Spark-extension libraries use for the classic converter.
  * Nothing else in graft reaches into Spark internals; keep it that way.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
