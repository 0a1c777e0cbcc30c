package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FeatureStore

class FeatureStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("point-in-time features match a driver replay — zero leakage") {
    val events = Tables.events(spark, sf)
    val out = FeatureStore.trainingSet(events)
      .orderBy(col("event_id")).collect()
    assert(out.nonEmpty)
    // driver replay from raw rows: features over STRICTLY prior
    // (ts_us, event_id) history, exact BigDecimal spend
    val raw = events.select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val byUser = raw.groupBy(_._2).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._3, r._1))
    }
    out.foreach { r =>
      val (id, u) = (r.getLong(0), r.getLong(1))
      val timeline = byUser(u)
      val idx = timeline.indexWhere(_._1 == id)
      val prior = timeline.take(idx)
      assert(r.getLong(3) == prior.length.toLong, s"f_n_prior on $id")
      val spend = prior
        .map(p => BigDecimal(p._5).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(r.getDouble(4) == spend, s"f_spend_prior on $id")
      if (prior.isEmpty) {
        assert(r.isNullAt(5) && r.isNullAt(6))
        assert(r.getDouble(4) == 0.0)
      } else {
        assert(r.getString(5) == prior.last._4, s"f_last_type on $id")
        assert(r.getLong(6) == timeline(idx)._3 - prior.last._3)
        assert(r.getLong(6) >= 0L)
      }
      // leakage guard: the label's own value never reaches its features
      // (spend including the label row would differ whenever value != 0)
      val leaky = spend + timeline(idx)._5
      assert(timeline(idx)._5 == 0.0 || r.getDouble(4) != leaky)
    }
  }
}
