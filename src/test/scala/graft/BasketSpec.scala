package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Basket

class BasketSpec extends AnyFunSuite {
  import TestSpark._

  test("a-priori item pruning is lossless for frequent pairs") {
    val li = Tables.lineitem(spark, sf)
    val part = Tables.part(spark, sf)
    val got = Basket.basketBrandRules(li, part)
      .select("brand_a", "brand_b", "n_both")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // the unpruned reference: pair counts over ALL items, support
    // filter applied only at the end — downward closure says the
    // pruned path must lose nothing
    val ob = li.select(col("l_orderkey"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nOrders = ob.select(col("okey")).distinct().count()
    val minSup = (nOrders + 99) / 100
    val unpruned = ob.as("a").join(ob.as("b"),
        col("a.okey") === col("b.okey") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= lit(minSup))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == unpruned)
    assert(got.nonEmpty)
  }

  test("confidence and lift are consistent with the counts") {
    val rules = Basket.basketBrandRules(
      Tables.lineitem(spark, sf), Tables.part(spark, sf)).collect()
    rules.foreach { r =>
      val (nBoth, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nBoth <= nA && nBoth <= nB)
      assert(r.getDouble(6) == nBoth.toDouble / nA.toDouble) // conf a->b
      assert(r.getDouble(7) == nBoth.toDouble / nB.toDouble) // conf b->a
      assert(r.getDouble(8) > 0.0) // lift
    }
  }
}
