package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchShapes2

/** Semantics checks for the second decision-support tranche, each
  * cross-validated against an independent formulation.
  */
class TpchShapes2Spec extends AnyFunSuite {
  import TestSpark._

  private lazy val li = Tables.lineitem(spark, sf)
  private lazy val orders = Tables.orders(spark, sf)
  private lazy val customer = Tables.customer(spark, sf)
  private lazy val supplier = Tables.supplier(spark, sf)
  private lazy val nation = Tables.nation(spark, sf)
  private lazy val region = Tables.region(spark, sf)
  private lazy val part = Tables.part(spark, sf)

  test("q7 covers both directions and never the diagonal") {
    val rows = TpchShapes2.q7RegionVolume(li, orders, customer,
      supplier, nation, region).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_region") != r.getAs[String]("cust_region"))
      assert(Set(1996, 1997).contains(r.getAs[Int]("ship_year")))
    }
    val dirs = rows.map(r =>
      (r.getAs[String]("supp_region"), r.getAs[String]("cust_region"))).toSet
    assert(dirs == Set(("AMERICA", "EUROPE"), ("EUROPE", "AMERICA")))
  }

  test("q8 share is nation/total and within [0,1]") {
    val rows = TpchShapes2.q8MarketShare(li, orders, customer, supplier,
      nation, region, part).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Double]("nation_revenue")
      val t = r.getAs[Double]("total_revenue")
      val s = r.getAs[Double]("market_share")
      assert(s == n / t && s >= 0 && s <= 1 && t > 0)
    }
  }

  test("q8 total matches the unconditioned rollup") {
    val viaOp = TpchShapes2.q8MarketShare(li, orders, customer, supplier,
      nation, region, part)
      .agg(sum(col("total_revenue"))).head().getDouble(0)
    // independent: drop the supplier leg entirely (it cannot change totals)
    val asia = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val viaIndep = li
      .join(part.filter(col("p_type") === "PROMO").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(orders
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(asia, col("o_custkey") === col("c_custkey"))
      .agg(operators.Medallion.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(viaOp - viaIndep) < 1e-6)
  }

  test("q10 returns at most 20, sorted by revenue desc then id") {
    val rows = TpchShapes2.q10ReturnedCustomers(li, orders, customer, nation)
      .orderBy(col("returned_revenue").desc, col("customer_id")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("returned_revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q12 line counts sum to the full join cardinality") {
    val rows = TpchShapes2.q12DelayPriority(li, orders).collect()
    val total = rows.map(r => r.getAs[Long]("high_priority_lines") +
      r.getAs[Long]("low_priority_lines")).sum
    assert(total == li.count()) // every line has exactly one order parent
  }

  test("q15 keeps exactly the argmax suppliers") {
    val perSupp = li
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(operators.Medallion.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val maxRev = perSupp.agg(max("rev")).head().getDouble(0)
    val expected = perSupp.filter(col("rev") === maxRev).count()
    val got = TpchShapes2.q15TopSupplier(li, supplier)
    assert(got.count() == expected)
    got.collect().foreach(r =>
      assert(r.getAs[Double]("total_revenue") == maxRev))
  }
}
