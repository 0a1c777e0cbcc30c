package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed (pre-partitioned) tables: the exchange-free co-located
  * join path. At 100 TB the lineitem⋈orders join is the dominant
  * shuffle; bucketing both tables on the join key at write time makes
  * every subsequent join local (each bucket pair joins on its own
  * executor, no exchange) — the Spark analogue of the reference's
  * clustered managed tables. The exchange-free property is asserted
  * plan-level in BucketingSpec; the registered query proves the result
  * is identical to the unbucketed join via the DuckDB oracle.
  */
object Bucketed {

  /** Write both fact tables bucketed on the order key (fresh paths and
    * table names per invocation — see [[Scratch]]), then run the
    * revenue-by-status join over the bucketed tables — exchange-free
    * on both sides.
    */
  def bucketedJoinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = Scratch.dir("buckets")
    val run = wh.substring(wh.lastIndexOf('_') + 1)
    val (liT, oT) = (s"graft_li_b_$run", s"graft_o_b_$run")
    graft.Tables.lineitem(spark, sfDir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/$liT").mode("overwrite").saveAsTable(liT)
    graft.Tables.orders(spark, sfDir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/$oT").mode("overwrite").saveAsTable(oT)
    spark.table(liT)
      .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus").as("order_status"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4)))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val bucketedJoinRevenueSql: String =
    """SELECT o_orderstatus AS order_status,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderstatus
       ORDER BY order_status"""

  /** Exchange-free AGGREGATION on a bucketed table: the scan already
    * satisfies the hash distribution the groupBy needs, so the plan is
    * scan → final aggregate, no shuffle at all (asserted plan-level in
    * BucketingSpec). At 100 TB this is the difference between a
    * per-key rollup that moves the whole fact and one that moves
    * nothing — the write-once bucket layout amortizes across every
    * subsequent keyed aggregation and join.
    */
  def bucketedAggOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = Scratch.dir("buckets_agg")
    val run = wh.substring(wh.lastIndexOf('_') + 1)
    val oT = s"graft_o_ba_$run"
    graft.Tables.orders(spark, sfDir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/$oT").mode("overwrite").saveAsTable(oT)
    spark.table(oT)
      .groupBy(col("o_custkey").as("customer_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .cast("double").as("total_spend"))
  }

  val bucketedAggOrdersSql: String =
    """SELECT o_custkey AS customer_id, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
       FROM orders
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("bucketed_join_revenue" -> ((s, d) =>
      bucketedJoinRevenue(s, d).orderBy(col("order_status"))),
      "bucketed_agg_orders" -> ((s, d) =>
        bucketedAggOrders(s, d).orderBy(col("customer_id"))))

  def oracles: Map[String, String] =
    Map("bucketed_join_revenue" -> bucketedJoinRevenueSql,
      "bucketed_agg_orders" -> bucketedAggOrdersSql)
}
