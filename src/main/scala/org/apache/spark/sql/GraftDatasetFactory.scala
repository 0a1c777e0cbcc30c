package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Public accessor for building a DataFrame from a LogicalPlan — the
  * standard extension-library pattern (a package-object shim in
  * org.apache.spark.sql) for exposing the package-private
  * `Dataset.ofRows` to custom operators.
  */
object GraftDatasetFactory {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column over a raw catalyst Expression — needed for expressions that
    * carry non-Expression state (e.g. a Broadcast handle) and so cannot
    * be built through the registered-function path.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse of [[column]] (e.g. to use a Column as the child of such
    * an expression).
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
