package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket association rules over order contents (the A-priori
  * frequent-pair pass; Agrawal & Srikant, VLDB'94): which part brands
  * co-occur in the same order more often than independence predicts.
  * The retail-analytics staple on exactly the reference's domain —
  * olist order-item affinity (reference silver order_items grain,
  * docs/ARCHITECTURE.md) — expressed at the brand grain the driver
  * schema supports.
  *
  * Distinct from [[Analytics.eventsTypeAffinity]] (a dense 5×5
  * type-affinity matrix) by the discipline that makes this shape
  * survive 100 TB with millions of SKUs: **downward-closure pruning**.
  * A pair can only reach min-support if BOTH its items do, so items
  * are support-filtered BEFORE the pair join — the candidate space
  * collapses from |catalog|² to |frequent items|², which is the entire
  * point of A-priori's first pass. The pair generator then self-joins
  * the (order, item) relation on the order key: one shuffle per side,
  * per-order fan-out bounded by C(items-per-order, 2), never a global
  * cross product. Pairs are support-filtered again (closure gives
  * candidates, not certainty) and scored with confidence in both
  * directions plus lift.
  *
  * All ratios are single IEEE divisions of exact integer counts
  * (÷ is cross-engine bit-exact; the operands are exact), so the
  * oracle compares doubles safely.
  */
object Basket {

  /** Min support as an exact rational: ceil(orders/100), i.e. a pair
    * must appear in ≥1% of orders.
    */
  private val SupNum = 1L
  private val SupDen = 100L

  def basketBrandRules(li: DataFrame, part: DataFrame): DataFrame = {
    val ob = li.select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct() // presence, not quantity: one vote per (order, brand)
    graft.Caching.withCached(ob) {
      val nOrders = ob.select(col("okey")).distinct().count()
      val minSup = (SupNum * nOrders + SupDen - 1) / SupDen // exact ceil
      val freq = ob.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_item"))
        .filter(col("n_item") >= lit(minSup))
      // downward closure: only frequent items can form a frequent pair
      val obF = ob.join(broadcast(freq.select(col("brand"))), Seq("brand"))
      val pairs = obF.as("a").join(obF.as("b"),
          col("a.okey") === col("b.okey") &&
            col("a.brand") < col("b.brand"))
        .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
        .agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= lit(minSup))
      pairs
        .join(broadcast(freq.select(col("brand").as("brand_a"),
          col("n_item").as("n_a"))), Seq("brand_a"))
        .join(broadcast(freq.select(col("brand").as("brand_b"),
          col("n_item").as("n_b"))), Seq("brand_b"))
        .select(col("brand_a"), col("brand_b"), col("n_both"),
          col("n_a"), col("n_b"),
          (col("n_both").cast("double") / lit(nOrders.toDouble))
            .as("support"),
          (col("n_both").cast("double") / col("n_a").cast("double"))
            .as("conf_a_to_b"),
          (col("n_both").cast("double") / col("n_b").cast("double"))
            .as("conf_b_to_a"),
          ((col("n_both").cast("double") * lit(nOrders.toDouble)) /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .as("lift"))
    }
  }

  val basketBrandRulesSql: String =
    """WITH ob AS (
         SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
         FROM lineitem JOIN part ON l_partkey = p_partkey),
       n AS (SELECT COUNT(DISTINCT okey) AS n_orders,
               (COUNT(DISTINCT okey) + 99) // 100 AS min_sup
             FROM ob),
       freq AS (
         SELECT brand, COUNT(*) AS n_item
         FROM ob GROUP BY 1
         HAVING COUNT(*) >= (SELECT min_sup FROM n)),
       pairs AS (
         SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_both
         FROM ob a
         JOIN freq fa ON a.brand = fa.brand
         JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
         JOIN freq fb ON b.brand = fb.brand
         GROUP BY 1, 2
         HAVING COUNT(*) >= (SELECT min_sup FROM n))
       SELECT brand_a, brand_b, n_both, fa.n_item AS n_a, fb.n_item AS n_b,
         CAST(n_both AS DOUBLE) / (SELECT CAST(n_orders AS DOUBLE) FROM n)
           AS support,
         CAST(n_both AS DOUBLE) / CAST(fa.n_item AS DOUBLE) AS conf_a_to_b,
         CAST(n_both AS DOUBLE) / CAST(fb.n_item AS DOUBLE) AS conf_b_to_a,
         CAST(n_both AS DOUBLE) * (SELECT CAST(n_orders AS DOUBLE) FROM n) /
           (CAST(fa.n_item AS DOUBLE) * CAST(fb.n_item AS DOUBLE)) AS lift
       FROM pairs
       JOIN freq fa ON brand_a = fa.brand
       JOIN freq fb ON brand_b = fb.brand
       ORDER BY 1, 2"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basket_brand_rules" -> ((s, d) =>
      basketBrandRules(Tables.lineitem(s, d), Tables.part(s, d))
        .orderBy(col("brand_a"), col("brand_b"))))

  def oracles: Map[String, String] = Map(
    "basket_brand_rules" -> basketBrandRulesSql)
}
