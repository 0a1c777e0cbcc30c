package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticsExt

class AnalyticsExtSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = Tables.events(spark, sf)
  private lazy val orders = Tables.orders(spark, sf)
  private lazy val li = Tables.lineitem(spark, sf)

  test("json breakdown partitions every event exactly once") {
    val out = AnalyticsExt.eventsJsonBreakdown(events)
    assert(out.agg(sum("n_events")).head().getLong(0) == events.count())
    out.select("k_decile").distinct().collect().foreach { r =>
      if (!r.isNullAt(0)) assert((0 to 9).contains(r.getInt(0)))
    }
  }

  test("trailing spend matches a brute-force window recomputation") {
    val out = AnalyticsExt.customerTrailingSpend(orders)
    val rows = out.filter(col("customer_id") === 7).collect()
    assert(rows.nonEmpty)
    val all = orders.filter(col("o_custkey") === 7)
      .select(to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    rows.foreach { r =>
      val day = r.getDate(2).toLocalDate
      val expect = all.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(89)) }
      assert(r.getLong(4) == expect.length)
      assert(math.abs(r.getDouble(3) -
        BigDecimal(expect.map(e => BigDecimal(e._2)).sum.toDouble).toDouble)
        < 1e-6)
    }
  }

  test("pearson r agrees with Spark's corr to float tolerance") {
    val out = AnalyticsExt.lineitemPriceQtyCorr(li).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pearson_r")).toMap
    val ref = li.groupBy("l_returnflag")
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == ref.keySet && out.nonEmpty)
    out.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) < 1e-9, s"flag $k: $v vs ${ref(k)}")
      assert(v >= -1.0 && v <= 1.0)
    }
  }
}
