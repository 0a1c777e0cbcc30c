package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Third decision-support tranche. */
object TpchShapes3 {

  val NameFilter = "bolt" // p_name substring filter (Q9's %green%)

  /** TPC-H Q9 shape (product-type profit by nation and year): a
    * 5-table join where three dimension chains (part-filtered,
    * supplier→nation, orders for the year) hang off one lineitem scan,
    * profit aggregated per (nation, year). The schema has no partsupp,
    * so unit cost is `p_retailprice` — the join/aggregation SHAPE is
    * Q9's: the part filter prunes the broadcast build (and with it the
    * fact rows that survive the join), the supplier→nation chain is a
    * broadcast, orders joins on the fact's order key, and the only big
    * shuffle is the final (nation, year) aggregate, map-side
    * combinable.
    *
    * Exactness: revenue is the established DECIMAL(18,4) cast of
    * `extprice·(1−disc)`; cost multiplies DECIMAL copies of retail
    * price (12,2) and the integral quantity (8,0) so the product is
    * exact — no double product is ever decimal-cast (§3.8's tie
    * hazard).
    */
  def q9Profit(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, orders: DataFrame): DataFrame = {
    val p = part.filter(col("p_name").contains(NameFilter))
      .select(col("p_partkey"),
        col("p_retailprice").cast(DecimalType(12, 2)).as("unit_cost"))
    val s = supplier.join(broadcast(nation),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = orders.select(col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"))
    lineitem
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("rev",
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4)))
      .withColumn("cost",
        col("unit_cost") * col("l_quantity").cast(DecimalType(8, 0)))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("rev") - col("cost")).cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
  }

  val q9ProfitSql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
         - CAST(p_retailprice AS DECIMAL(12,2))
           * CAST(l_quantity AS DECIMAL(8,0))) AS DOUBLE) AS profit,
       COUNT(*) AS n_lines
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN orders ON l_orderkey = o_orderkey
       WHERE p_name LIKE '%$NameFilter%'
       GROUP BY 1, 2
       ORDER BY 1, 2 DESC"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q9_profit" -> ((s, d) =>
      q9Profit(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.orders(s, d))
        .orderBy(col("nation"), col("o_year").desc)))

  def oracles: Map[String, String] = Map(
    "q9_profit" -> q9ProfitSql)
}
