package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Medallion
import graft.sources.CsvIngest

/** The reference's silver layer runs as STREAMING TABLEs over the CSV
  * feed (silver/orders.sql:10 `FROM STREAM(bronze_orders)`). The same
  * Medallion builders here are stateless column programs, so they apply
  * unchanged to a streaming DataFrame — this spec drives CSV →
  * streaming silver → memory sink end-to-end and checks parity with
  * the batch result.
  */
class StreamingSilverSpec extends AnyFunSuite {
  import TestSpark._

  test("silver orders transform runs on a CSV stream and matches batch") {
    // stage orders as CSV (the bronze landing-zone format)
    val dir = Files.createTempDirectory("graft_csv_orders").toString
    val orders = Tables.orders(spark, sf)
    orders.withColumn("o_orderdate", date_format(col("o_orderdate"),
        "yyyy-MM-dd HH:mm:ss"))
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(dir)

    val schema = new StructType()
      .add("o_orderkey", LongType).add("o_custkey", LongType)
      .add("o_orderstatus", StringType).add("o_totalprice", DoubleType)
      .add("o_orderdate", TimestampType).add("o_orderpriority", StringType)

    val stream = CsvIngest.streamCsv(spark, dir, schema)
      .drop(CsvIngest.RescuedColumn, "_source_file")
    val silver = Medallion.silverOrders(stream)

    val q = silver.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("silver_orders_stream").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("silver_orders_stream")
    val batch = Medallion.silverOrders(orders)
    assert(streamed.count() == batch.count())
    val s = streamed.orderBy("order_id").collect()
    val b = batch.orderBy("order_id").collect()
    s.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("fully-late rows are dropped, and the drops are observed in metrics") {
    val (gold, dropped, oddCount) =
      graft.streaming.EventStreams.lateDropWithMetrics(spark, sf)
    assert(oddCount > 0)
    // every odd (late) row was dropped by the watermark — per the
    // engine's own metric. The metric counts what reaches the state
    // operator: PARTIAL-aggregated rows, i.e. one per distinct late
    // (window, type) group, not per input row.
    val oddGroups = Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(2)) === 1)
      .select(date_trunc("hour", col("ts_utc")), col("event_type"))
      .distinct().count()
    // one partial per group per MAP PARTITION reaches the state op, so
    // [groups, rows] brackets the metric at any file-split granularity
    assert(dropped >= oddGroups && dropped <= oddCount,
      s"dropped=$dropped outside [$oddGroups, $oddCount]")
    // and the sink equals the even-half batch aggregate exactly
    val evenTruth = Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(2)) === 0)
      .groupBy(date_trunc("hour", col("ts_utc")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val joined = gold.select(col("window_start"), col("event_type"),
        col("n_events"))
      .join(evenTruth.withColumnRenamed("n_events", "expected"),
        Seq("window_start", "event_type"), "full_outer")
    assert(joined.filter(col("n_events").isNull || col("expected").isNull ||
      col("n_events") =!= col("expected")).count() == 0,
      "sink diverges from the even-half batch aggregate")
  }
}
