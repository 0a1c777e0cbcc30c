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

  test("variant and from_json extract identical payload keys") {
    val viaVariant = AnalyticsExt.eventsVariantStats(events)
      .agg(sum("sum_k"), sum("n_with_k")).head()
    val viaStruct = events
      .withColumn("k", from_json(col("props"),
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.IntegerType))
        .getField("k"))
      .agg(sum(col("k").cast("long")), count(col("k"))).head()
    assert(viaVariant.getLong(0) == viaStruct.getLong(0))
    assert(viaVariant.getLong(1) == viaStruct.getLong(1))
  }

  test("cms estimates honor both sketch contracts on every probe") {
    val rows = AnalyticsExt.eventsCmsTopk(events).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("never_under"))
      assert(r.getAs[Boolean]("within_eps_n"))
    }
  }

  test("grouping sets equal the union of the separate aggregations") {
    val out = AnalyticsExt.ordersGroupingSets(orders).collect()
    val byStatus = orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byPrio = orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = orders.count()
    assert(out.length == byStatus.size + byPrio.size + 1)
    out.foreach { r =>
      val (s, p, gid, n) = (r.getString(0), r.getString(1),
        r.getAs[Long]("gid"), r.getAs[Long]("n_orders"))
      gid match {
        case 1L => assert(n == byStatus(s) && p == null) // (status) set
        case 2L => assert(n == byPrio(p) && s == null)   // (priority) set
        case 3L => assert(n == total && s == null && p == null)
        case g  => fail(s"unexpected grouping_id $g")
      }
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
