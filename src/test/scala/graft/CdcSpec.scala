package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

class CdcSpec extends AnyFunSuite {
  import TestSpark._

  test("scd1 keeps exactly the latest non-deleted state per key") {
    val events = Tables.events(spark, sf)
    val scd1 = Cdc.scd1Current(events).cache()
    // one row per key
    assert(scd1.groupBy("key_id").count().filter(col("count") > 1).count() == 0)
    // every kept row's sequence is the key's max sequence
    val maxSeq = Cdc.stage(events).groupBy(col("key_id"))
      .agg(max(col("sequence_number")).as("max_seq"))
    val mismatched = scd1.join(maxSeq, "key_id")
      .filter(col("last_sequence") =!= col("max_seq")).count()
    assert(mismatched == 0)
    // keys whose last op is DELETE are absent
    val lastOps = Cdc.stage(events)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("key_id"))
          .orderBy(col("sequence_number").desc)))
      .filter(col("rn") === 1)
    val deletedKeys = lastOps.filter(col("operation") === "DELETE")
      .select("key_id")
    assert(scd1.join(deletedKeys, "key_id").count() == 0)
  }

  test("scd2 versions tile the sequence line per key without overlap") {
    val hist = Cdc.scd2History(Tables.events(spark, sf)).cache()
    // exactly one current version per surviving key
    val multiCurrent = hist.filter(col("__is_current"))
      .groupBy("key_id").count().filter(col("count") > 1).count()
    assert(multiCurrent == 0)
    // __end_at of version i == __start_at of the next change: no overlap,
    // verified as: within a key, ranges sorted by start have end <= next start
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key_id")).orderBy(col("__start_at"))
    val bad = hist
      .withColumn("next_start", lead(col("__start_at"), 1).over(w))
      .filter(col("next_start").isNotNull &&
        (col("__end_at").isNull || col("__end_at") > col("next_start")))
      .count()
    assert(bad == 0)
  }

  test("gold plans partially aggregate and never cartesian-join") {
    Seq("gold_daily_orders", "gold_seller_performance", "q5_region_revenue")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$q has a cartesian join")
        assert(plan.contains("HashAggregate"), s"$q lost hash aggregation")
      }
  }
}
