package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-drift monitoring — the data-quality check that catches
  * what [[Quality]]'s row-level expectations cannot: every row valid,
  * but the MIX shifted (a priority class doubling its share month over
  * month signals an upstream change even when each row passes its
  * constraints). The report compares the category distribution of a
  * baseline era against the current era of the same table.
  *
  * Statistic: per-category (p_b − p_c)²/(p_b + p_c) — the triangular
  * discrimination term (bounded symmetric chi-square). PSI, the usual
  * industry pick, needs ln(p_c/p_b); ln drifts by 1 ulp across engines
  * (Math.log vs libm), so the gate would flake — the surrogate ranks
  * drifts identically for monitoring purposes and uses only +−×÷,
  * which are IEEE-exact cross-engine on exact-count ratios. Terms are
  * reported PER CATEGORY (the actionable grain; also: no float
  * summation whose order could differ between engines).
  *
  * Era split: the month at the midpoint of the table's own sorted
  * distinct months (derived, like [[graft.sources.PartitionEvolution]]'s
  * cut, so the gate row stays deterministic as testdata drifts). Both
  * era counts come from ONE conditional-aggregation scan — no
  * self-join, no second pass.
  */
object Drift {

  /** Midpoint month: 1-based index `n div 2 + 1` of sorted distinct
    * months — one tiny distinct + window, one driver scalar. None when
    * the table has fewer than two distinct months: with n = 0 there is
    * no cut at all, and with n = 1 the baseline era would be empty and
    * every share_base a 0/0 NaN — drift is undefined without two eras.
    */
  private def cutMonth(orders: DataFrame): Option[String] = {
    val months = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct()
    months
      .withColumn("rn", row_number().over(Window.orderBy(col("m"))))
      .withColumn("n", count(lit(1)).over())
      .filter(col("n") >= 2 && col("rn") === expr("n div 2 + 1"))
      .collect().headOption.map(_.getString(0))
  }

  /** (category, n_base, n_cur, share_base, share_cur, drift_term) over
    * o_orderpriority, baseline = months before the midpoint. A table
    * with fewer than two distinct months yields the EMPTY report (same
    * schema): no eras, no drift — documented rather than NaN.
    */
  def distributionDrift(orders: DataFrame): DataFrame = {
    val cut = cutMonth(orders) match {
      case Some(c) => c
      case None =>
        return orders.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "category STRING, n_base BIGINT, n_cur BIGINT, " +
              "share_base DOUBLE, share_cur DOUBLE, drift_term DOUBLE"))
    }
    val counts = orders
      .withColumn("m", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("o_orderpriority").as("category"))
      .agg(count(when(col("m") < cut, 1)).as("n_base"),
        count(when(col("m") >= cut, 1)).as("n_cur"))
    val w = Window.partitionBy() // |categories| rows — tiny-table window
    counts
      .withColumn("t_base", sum(col("n_base")).over(w))
      .withColumn("t_cur", sum(col("n_cur")).over(w))
      .withColumn("share_base",
        col("n_base").cast("double") / col("t_base").cast("double"))
      .withColumn("share_cur",
        col("n_cur").cast("double") / col("t_cur").cast("double"))
      .withColumn("drift_term",
        (col("share_base") - col("share_cur")) *
          (col("share_base") - col("share_cur")) /
          (col("share_base") + col("share_cur")))
      .select(col("category"), col("n_base"), col("n_cur"),
        col("share_base"), col("share_cur"), col("drift_term"))
  }

  val distributionDriftSql: String =
    """WITH months AS (
         SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders),
       ranked AS (
         SELECT m, row_number() OVER (ORDER BY m) AS rn,
           COUNT(*) OVER () AS n
         FROM months),
       cut AS (SELECT m AS cut_m FROM ranked WHERE rn = n // 2 + 1),
       counts AS (
         SELECT o_orderpriority AS category,
           COUNT(CASE WHEN strftime(o_orderdate, '%Y-%m') < cut_m
             THEN 1 END) AS n_base,
           COUNT(CASE WHEN strftime(o_orderdate, '%Y-%m') >= cut_m
             THEN 1 END) AS n_cur
         FROM orders, cut
         GROUP BY 1),
       shared AS (
         SELECT category, n_base, n_cur,
           CAST(n_base AS DOUBLE) / CAST(SUM(n_base) OVER () AS DOUBLE)
             AS share_base,
           CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE)
             AS share_cur
         FROM counts)
       SELECT category, n_base, n_cur, share_base, share_cur,
         (share_base - share_cur) * (share_base - share_cur)
           / (share_base + share_cur) AS drift_term
       FROM shared
       ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_distribution_drift" -> ((s, d) =>
      distributionDrift(Tables.orders(s, d)).orderBy(col("category"))))

  def oracles: Map[String, String] = Map(
    "dq_distribution_drift" -> distributionDriftSql)
}
