package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * this one-file shim lives under the sql package tree to re-export
  * them — the standard pattern for out-of-tree Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion: resolves the whole ColumnNode
    * tree (function lookups included) to catalyst expressions now.
    * `expression` above wraps lazily — fine inside the Dataset API,
    * which converts at plan-construction time, but a lazy wrapper handed
    * to the SQL function registry reaches codegen unconverted. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * private[sql] in Spark 4). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a temp SQL function on an existing session
    * (`sessionState` is private[sql] too). */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Register a temp TABLE function (`SELECT * FROM fn(...)`) on an
    * existing session — the live-session twin of
    * `SparkSessionExtensions.injectTableFunction`. */
  def registerTempTableFunction(
      spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
