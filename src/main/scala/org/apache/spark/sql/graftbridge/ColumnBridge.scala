package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 made the Column <-> Catalyst Expression conversion `private[sql]`
 * (columns are backed by ColumnNode). This tiny bridge — placed inside the
 * org.apache.spark.sql package precisely like third-party Spark extensions
 * (e.g. connectors) do — re-exposes the two conversions the engine's custom
 * Catalyst expressions need. No other internals are touched.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
