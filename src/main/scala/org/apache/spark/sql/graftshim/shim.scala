package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface, the same technique public
  * Spark extensions (Sedona, frameless, spark-daria) use: a shim compiled
  * inside an `org.apache.spark.sql` subpackage so that custom Catalyst
  * `Expression`s can be exposed as public `Column`s and registered for SQL.
  * Nothing else in the codebase touches Spark internals directly.
  */
object Shim {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back into its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder under `name` for SQL usage. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)
  }

  /** The (identifier, info, builder) triple `SparkSessionExtensions
    * .injectFunction` expects — lets graft ship as a standard
    * `spark.sql.extensions` entry.
    */
  def functionDescription(
      name: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
}
