package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` classic Column plumbing so the
  * graft engine can wrap its native Catalyst expressions as user-facing
  * Columns (Spark 4 removed the public `Column(expr)` constructor).
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** `AbstractDataType` is private[sql]; re-exported for `inputTypes`
    * declarations on graft's native expressions.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
