package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Insights

class SeasonalitySpec extends AnyFunSuite {
  import TestSpark._

  test("weekday decomposition covers all full-window days exactly once") {
    val orders = Tables.orders(spark, sf)
    val df = Insights.dailySeasonality(orders).collect()
    assert(df.length == 7, s"expected 7 weekday rows, got ${df.length}")
    assert(df.map(_.getAs[Int]("wday")).sorted.toSeq == (0 to 6))
    val days = orders
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")))
      .distinct().count()
    // first six days have no full trailing window
    assert(df.map(_.getAs[Long]("n_days")).sum == days - 6)
    // the deviation-from-trend is centered: weekday indices cannot all
    // share a sign (the trailing sum contains every weekday once on a
    // dense calendar)
    val idx = df.map(_.getAs[Double]("seasonal_x7"))
    assert(idx.exists(_ > 0) && idx.exists(_ < 0), idx.mkString(","))
  }

  test("OLS fit is a valid regression: r in [-1,1], forecast on the line") {
    val r = Insights.revenueTrendOls(Tables.orders(spark, sf)).head()
    val n = r.getAs[Long]("n_months")
    val slope = r.getAs[Double]("slope")
    val intercept = r.getAs[Double]("intercept")
    val forecast = r.getAs[Double]("forecast_next_month")
    val corr = r.getAs[Double]("corr_r")
    assert(n > 12, s"too few months: $n")
    assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
    // the forecast is exactly the fitted line evaluated at x = n
    assert(forecast == intercept + slope * n.toDouble)
    assert(!slope.isNaN && !intercept.isNaN)
  }
}
