package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column ↔ Expression conversions
  * (Spark 4 split Column from Catalyst; first-party connectors use the
  * same classic.ExpressionUtils internally).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager recursive ColumnNode→Expression conversion. `expression`
    * returns a LAZY `ColumnNodeExpression` leaf for composite columns
    * built through the public functions API — its catalyst `children`
    * is empty, so tree traversals (e.g. collecting unresolved
    * attribute references) silently see nothing. This converter walks
    * the whole node tree up front.
    */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Release the storage behind a `localCheckpoint()`ed DataFrame —
    * its plan is a LogicalRDD leaf whose RDD was persisted by the
    * checkpoint; `unpersist` on the DataFrame itself would look for a
    * cache-manager entry and find none.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => val _ = lr.rdd.unpersist(false)
      case _ =>
    }
}
