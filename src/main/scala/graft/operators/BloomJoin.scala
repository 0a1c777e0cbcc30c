package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Medallion.dsum

/** Bloom-pruned fact join: a selective dim-side predicate is turned
  * into a bloom filter over the surviving join keys, and the fact scan
  * is pre-filtered with `bloom_contains` BEFORE its shuffle join — the
  * explicit form of Spark's runtime row-level filtering, built on
  * graft's native [[graft.functions.BloomBuildAgg]] /
  * [[graft.functions.BloomMightContain]] expressions.
  *
  * Why not just broadcast the filtered keys? At 100 TB a 4% cut of the
  * orders table is still ~100M keys (GBs as a hash relation); the bloom
  * is ~10 bits/key — broadcastable — and the fact rows it rejects never
  * enter the exchange. False positives (<1% at these sizings) survive
  * the prune but are dropped by the join itself, so the result is
  * exact, which is what lets the DuckDB oracle be a plain join.
  *
  * The one `.head()` collects the bloom's byte array — model state
  * (128 KB here), same contract as Ivf's centroid collect, not data
  * movement.
  */
object BloomJoin {

  val PriceCutoff = 480000.0
  val NumBits = 1 << 20 // 128 KB; ~17 bits/key at sf1's ~60k hot orders

  /** Revenue by order priority over lineitems of high-value orders,
    * with the lineitem side bloom-pruned before the join.
    */
  def bloomPrunedRevenue(orders: DataFrame, li: DataFrame): DataFrame = {
    val hot = orders.filter(col("o_totalprice") > PriceCutoff)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bloom = hot.agg(
      call_function("bloom_build", col("o_orderkey"), lit(NumBits))).head()
      .getAs[Array[Byte]](0)
    // broadcast, not lit(bloom): a Literal serializes the bit array into
    // every task binary — fine at 128 KB, plan-bloat at the ~120 MB a
    // 100M-key filter needs. The broadcast handle ships bytes once per
    // executor via the block manager.
    val bc = li.sparkSession.sparkContext.broadcast(bloom)
    val pruned = li.filter(org.apache.spark.sql.GraftDatasetFactory.column(
      graft.functions.BloomContainsBcast(bc,
        org.apache.spark.sql.GraftDatasetFactory.expression(col("l_orderkey")))))
    pruned.join(hot, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("order_priority"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("line_count"),
        countDistinct(col("o_orderkey")).as("order_count"))
  }

  val bloomPrunedRevenueSql: String =
    s"""SELECT o_orderpriority AS order_priority,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count,
       COUNT(DISTINCT o_orderkey) AS order_count
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       WHERE o_totalprice > $PriceCutoff
       GROUP BY 1
       ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_join_prune" -> ((s, d) =>
      bloomPrunedRevenue(Tables.orders(s, d), Tables.lineitem(s, d))
        .orderBy(col("order_priority"))))

  def oracles: Map[String, String] = Map(
    "bloom_join_prune" -> bloomPrunedRevenueSql)
}
