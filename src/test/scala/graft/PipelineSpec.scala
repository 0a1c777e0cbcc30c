package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Pipeline

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("topoSort orders dependencies before dependents and detects cycles") {
    val defs = Pipeline.medallion(sf)
    val order = Pipeline.topoSort(defs).map(_.name)
    assert(order.indexOf("silver_orders_enriched") <
      order.indexOf("gold_daily_orders"))
    assert(order.indexOf("silver_orders") <
      order.indexOf("silver_orders_enriched"))
    val cyclic = Seq(
      Pipeline.TableDef("a", "x", Seq("b"), (_, _) => null),
      Pipeline.TableDef("b", "x", Seq("a"), (_, _) => null))
    intercept[Pipeline.CycleException](Pipeline.topoSort(cyclic))
  }

  test("medallion pipeline materializes all layers to the lake dir") {
    val lake = Files.createTempDirectory("graft_pipeline").toString
    val out = Pipeline.run(spark, Pipeline.medallion(sf), Some(lake))
    assert(out.size == 8)
    val daily = spark.read.parquet(s"$lake/gold/gold_daily_orders")
    assert(daily.count() > 0)
    // landed gold equals the directly-built query
    val direct = SparkEntry.queries("gold_daily_orders")(spark, sf).count()
    assert(daily.count() == direct)
  }
}
