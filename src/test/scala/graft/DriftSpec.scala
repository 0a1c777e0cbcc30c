package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  import TestSpark._

  test("drift terms are bounded, zero iff shares equal, and detect a shift") {
    import spark.implicits._
    def order(id: Long, month: String, prio: String) =
      (id, 0L, "O", 100.0, Timestamp.valueOf(s"$month-15 00:00:00"), prio)
    // baseline months (01-02): 10 A, 10 B; current (03-04): 10 A, 30 B
    val rows =
      (1L to 10L).map(i => order(i, "2024-01", "A")) ++
      (11L to 20L).map(i => order(i, "2024-02", "B")) ++
      (21L to 30L).map(i => order(i, "2024-03", "A")) ++
      (31L to 60L).map(i => order(i, "2024-04", "B"))
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val got = Drift.distributionDrift(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // cut = month index 4 div 2 + 1 = 3rd month (2024-03): baseline =
    // 01-02 (10 A, 10 B), current = 03-04 (10 A, 30 B)
    assert(got("A")._1 == 10 && got("A")._2 == 10)
    assert(got("B")._1 == 10 && got("B")._2 == 30)
    assert(got("A")._3 == 0.5 && got("A")._4 == 0.25)
    // A: (0.5-0.25)^2/(0.5+0.25); B: (0.5-0.75)^2/(0.5+0.75)
    assert(math.abs(got("A")._5 - 0.0625 / 0.75) < 1e-15)
    assert(math.abs(got("B")._5 - 0.0625 / 1.25) < 1e-15)
    got.values.foreach { case (_, _, _, _, term) =>
      assert(term >= 0.0 && term <= 2.0) // triangular discrimination bound
    }
  }

  test("identical eras drift to exactly zero") {
    import spark.implicits._
    def order(id: Long, month: String, prio: String) =
      (id, 0L, "O", 100.0, Timestamp.valueOf(s"$month-15 00:00:00"), prio)
    val rows =
      (1L to 5L).map(i => order(i, "2024-01", "A")) ++
      (6L to 10L).map(i => order(i, "2024-02", "A"))
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val got = Drift.distributionDrift(orders).collect()
    assert(got.length == 1 && got.head.getDouble(5) == 0.0)
  }

  test("fewer than two months yields the empty report, not NaN") {
    import spark.implicits._
    def order(id: Long, month: String, prio: String) =
      (id, 0L, "O", 100.0, Timestamp.valueOf(s"$month-15 00:00:00"), prio)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val oneMonth = (1L to 5L).map(i => order(i, "2024-01", "A")).toDF(cols: _*)
    val one = Drift.distributionDrift(oneMonth)
    assert(one.count() == 0)
    assert(one.columns.toSeq == Seq("category", "n_base", "n_cur",
      "share_base", "share_cur", "drift_term"))
    val empty = Drift.distributionDrift(
      oneMonth.filter(lit(false)))
    assert(empty.count() == 0) // zero months: no head() crash either
  }
}
