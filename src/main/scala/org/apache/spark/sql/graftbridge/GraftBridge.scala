package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Expression ⇄ Column bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the `new Column(Expression)` constructor behind the
  * sql-api/classic split and scoped the converters `private[sql]`, so an
  * extension library needs one object inside the `org.apache.spark.sql`
  * namespace to lift its own expressions into the public Column API —
  * the same technique Spark-native connectors use. No Spark internals are
  * modified; this only re-exports two conversions.
  */
object GraftBridge {
  /** Wrap a custom Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))

  /** Resolve a Column back to its Catalyst expression tree. */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
