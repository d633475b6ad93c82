package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Column ⇄ catalyst Expression bridge for custom expressions.
  *
  * Spark 4's public `Column` is a ColumnNode facade and the classic
  * converter lives behind `private[sql]`, so extension libraries host
  * this two-liner inside the org.apache.spark.sql package — the same
  * technique Spark's own connectors use. Nothing else in graft reaches
  * into Spark internals.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = Column(ExpressionColumnNode(e))
}
