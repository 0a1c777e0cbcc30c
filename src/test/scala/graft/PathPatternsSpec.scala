package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PathPatterns

class PathPatternsSpec extends AnyFunSuite {
  import TestSpark._

  test("pattern counts are non-overlapping leftmost matches in order") {
    import spark.implicits._
    // one user; path by (ts_us, event_id): c c p v c p e p  → "ccpvcpep"
    val ev = Seq(
      (1L, 10L, 7L, "click", 1.0),
      (2L, 20L, 7L, "click", 1.0),
      (3L, 30L, 7L, "purchase", 1.0),
      (4L, 40L, 7L, "view", 1.0),
      (5L, 50L, 7L, "click", 1.0),
      (6L, 60L, 7L, "purchase", 1.0),
      (7L, 70L, 7L, "error", 1.0),
      (8L, 80L, 7L, "purchase", 1.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val row = PathPatterns.pathPatterns(ev).head()
    assert(row.getLong(1) == 8L) // n_events
    // "ccpvcpep": cp x2 (pos 2-3, 5-6), c+p x2 (ccp, cp), vc*p x1, ep x1
    assert(row.getLong(3) == 2L, "click_buy")
    assert(row.getLong(4) == 2L, "clicks_to_buy")
    assert(row.getLong(5) == 1L, "browse_buy")
    assert(row.getLong(6) == 1L, "error_retry_buy")
  }

  test("ties and order: path is sorted by (ts_us, event_id)") {
    import spark.implicits._
    val ev = Seq(
      (2L, 10L, 1L, "purchase", 1.0), // same ts, higher id → second
      (1L, 10L, 1L, "click", 1.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val row = PathPatterns.pathPatterns(ev).head()
    assert(row.getLong(3) == 1L) // "cp", not "pc"
  }

  test("per-user state is bounded: cap keeps only the FIRST N events") {
    import spark.implicits._
    // 10 events; with cap=4 only "ccpv" survives — the trailing
    // purchase burst must not be seen
    val ev = (1L to 10L).map { i =>
      val t = Seq("click", "click", "purchase", "view", "click",
        "purchase", "error", "purchase", "click", "purchase")(i.toInt - 1)
      (i, i * 10L, 7L, t, 1.0)
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val row = PathPatterns.pathPatterns(ev, cap = 4).head()
    assert(row.getLong(1) == 4L, "n_events counts capped events only")
    assert(row.getLong(3) == 1L, "click_buy: one cp inside the cap")
    assert(row.getLong(6) == 0L, "error_retry_buy: ep is beyond the cap")
    // default cap is far above any real per-user volume: identical
    // output to uncapped at data-model scale
    val full = PathPatterns.pathPatterns(ev).head()
    assert(full.getLong(1) == 10L)
  }
}
