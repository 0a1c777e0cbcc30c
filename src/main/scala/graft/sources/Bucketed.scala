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

  private def tag(sfDir: String, name: String): String =
    s"graft_${name}_" + java.lang.Integer.toHexString(sfDir.hashCode)

  /** Write both fact tables bucketed on the order key (idempotent per
    * sf dir), then run the revenue-by-status join over the bucketed
    * tables — exchange-free on both sides.
    */
  def bucketedJoinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_buckets_" +
      java.lang.Integer.toHexString(sfDir.hashCode)
    val (liT, oT) = (tag(sfDir, "li_b"), tag(sfDir, "o_b"))
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

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("bucketed_join_revenue" -> ((s, d) =>
      bucketedJoinRevenue(s, d).orderBy(col("order_status"))))

  def oracles: Map[String, String] =
    Map("bucketed_join_revenue" -> bucketedJoinRevenueSql)
}
