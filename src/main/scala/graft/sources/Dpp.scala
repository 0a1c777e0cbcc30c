package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dynamic partition pruning: the fact side is laid out
  * partitioned-by-month, the dim side's filter is only known at run
  * time, and the optimizer injects the dim's qualifying month set into
  * the fact SCAN as a runtime partition filter — at 100 TB the scan
  * reads 3 months, not 80, without any static predicate on the fact.
  * The DPP subquery's presence is asserted plan-level in BucketingSpec;
  * the gate verifies the result values.
  */
object Dpp {

  /** Revenue by ship month, where qualifying months come from a
    * runtime dim: months containing an urgent order in 1997H1. The
    * fact carries NO static month predicate — only DPP narrows its
    * scan.
    */
  def dppPrunedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Scratch.dir("dpp_lake")
    graft.Tables.lineitem(spark, sfDir)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.partitionBy("ship_month").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val months = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .distinct()
    fact.join(months, col("ship_month") === col("m"))
      .groupBy(col("ship_month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4)))
          .cast("double").as("revenue"))
  }

  val dppPrunedRevenueSql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE strftime(l_shipdate, '%Y-%m') IN (
         SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
         FROM orders
         WHERE o_orderpriority = '1-URGENT'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01')
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("lake_dpp_join" -> ((s, d) =>
      dppPrunedRevenue(s, d).orderBy(col("ship_month"))))

  def oracles: Map[String, String] =
    Map("lake_dpp_join" -> dppPrunedRevenueSql)
}
