package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
}

class CoreSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all registered queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("silver_lineitem derives charge correctly") {
    import org.apache.spark.sql.functions._
    val sl = operators.Medallion.silverLineitem(Tables.lineitem(spark, sf))
    val bad = sl.filter(
      abs(col("charge") - col("price") * (lit(1.0) - col("discount")) *
        (lit(1.0) + col("tax"))) > 1e-9).count()
    assert(bad == 0)
  }

  test("q1 aggregates are exact decimals cast to double") {
    val q1 = operators.Analytics.q1PricingSummary(Tables.lineitem(spark, sf))
    val row = q1.orderBy("return_flag", "line_status").head()
    assert(row.getAs[Long]("count_order") > 0)
    assert(row.getAs[Double]("sum_base_price") > 0)
  }
}
