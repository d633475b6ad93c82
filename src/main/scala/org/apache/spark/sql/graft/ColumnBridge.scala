package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Column ⇄ catalyst Expression bridge for custom expressions.
  *
  * Spark 4's public `Column` is a ColumnNode facade and the classic
  * converter lives behind `private[sql]`, so extension libraries host
  * this two-liner inside the org.apache.spark.sql package — the same
  * technique Spark's own connectors use. The only other internal reach
  * is [[ListenerBridge]] below; nothing else in graft touches Spark
  * internals.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = Column(ExpressionColumnNode(e))
}

/** QueryExecutionListener events are delivered asynchronously on the
  * shared listener bus; a metrics reader that wants
  * read-your-own-action consistency must drain the bus first. The
  * drain call is `private[spark]`, hence this one-liner lives here.
  */
object ListenerBridge {
  def flushListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
