package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase (salted) aggregation for hot keys.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * task. With a salt the first aggregation fans each key across
  * `saltBuckets` tasks (map-side combine still applies), and the second
  * pass merges the per-salt partials — the hot key's final merge handles
  * `saltBuckets` rows instead of billions. Complements AQE's skew-join
  * splitting (which covers joins, not aggregations).
  *
  * Only algebraic aggregates decompose this way (sum/count/min/max —
  * not countDistinct); the API takes partial and merge expression
  * builders to keep that explicit.
  */
object Skew {

  /** Two-phase aggregate.
    * @param partials per-salt aggregates, e.g. `Seq(sum(col("v")).as("s"))`
    * @param merges   final merge of the partial columns, e.g.
    *                 `Seq(sum(col("s")).as("total"))`
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }
}
