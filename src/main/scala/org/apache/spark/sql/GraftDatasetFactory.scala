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
}
