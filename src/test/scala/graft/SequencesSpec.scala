package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sequences

class SequencesSpec extends AnyFunSuite {
  import TestSpark._

  test("transition matrix rows are stochastic and consistent") {
    val m = Sequences.transitionMatrix(Tables.events(spark, sf)).collect()
    assert(m.nonEmpty)
    m.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val nFrom = rows.head.getLong(3)
      assert(rows.forall(_.getLong(3) == nFrom))
      assert(rows.map(_.getLong(2)).sum == nFrom)
      val pSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"row not stochastic: $pSum")
    }
  }

  test("U-shape attribution credits a hand-built journey exactly") {
    import spark.implicits._
    val t0 = 1700000000000000L // micros
    def ev(id: Long, dtUs: Long, user: Long, tpe: String) =
      (id, new Timestamp((t0 + dtUs) / 1000), user, tpe, 0.0, "{}")
    // user 1: 4 touches then purchase → 40/10/10/40 (k=4, middles
    // split 200000 div 2); user 2: 1 touch → full credit; user 3:
    // touch OUTSIDE the 7-day lookback → no journey
    val events = Seq(
      ev(10, 0, 1, "click"), ev(11, 1000000, 1, "view"),
      ev(12, 2000000, 1, "view"), ev(13, 3000000, 1, "click"),
      ev(14, 4000000, 1, "purchase"),
      ev(20, 0, 2, "view"), ev(21, 1000000, 2, "purchase"),
      ev(30, 0, 3, "click"),
      ev(31, Sequences.LookbackUs + 1000000, 3, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts_us", expr("event_id")) // placeholder, replaced below
    val withTs = events.drop("ts_us")
      .withColumn("ts_us", unix_micros(col("ts")))
    val got = Sequences.attribution(withTs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // clicks: user1 pos1 (400000) + pos4 (400000) = 800000
    assert(got("click") == (2L, 800000L))
    // views: user1 middles 100000+100000, user2 solo 1000000 = 1200000
    assert(got("view") == (3L, 1200000L))
  }

  test("journey credit never exceeds the unit and loses at most k-2") {
    val events = Tables.events(spark, sf)
    val purchases = events
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    val touches = events
      .filter(col("event_type").isin("click", "view") &&
        col("user_id").isNotNull)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts_us").as("t_ts"))
    val k = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - lit(Sequences.LookbackUs))
      .groupBy(col("purchase_id")).agg(count(lit(1)).as("k"))
    val total = Sequences.attribution(events)
      .agg(sum(col("credit_units"))).head.getLong(0)
    val bounds = k.agg(
      sum(lit(Sequences.CreditUnits)).cast("long").as("upper"),
      sum(lit(Sequences.CreditUnits) -
        greatest(col("k") - 2, lit(0L))).cast("long").as("lower"))
      .head
    assert(total <= bounds.getLong(0) && total >= bounds.getLong(1))
  }
}
