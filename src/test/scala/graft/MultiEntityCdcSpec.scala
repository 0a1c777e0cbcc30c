package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MultiEntityCdc

class MultiEntityCdcSpec extends AnyFunSuite {
  import TestSpark._

  test("concurrent entity applies: each equals its SOLO batch resolution") {
    val out = MultiEntityCdc.multiEntityDag(spark, sf).localCheckpoint(true)
    // structural isolation: entities partition the key space
    val cust = out.filter(col("entity") === "customers")
    val supp = out.filter(col("entity") === "suppliers")
    assert(cust.count() > 0 && supp.count() > 0)
    assert(cust.filter(pmod(col("key_id"), lit(2)) =!= 0).isEmpty)
    assert(supp.filter(pmod(col("key_id"), lit(2)) =!= 1).isEmpty)
    // semantic isolation: the CONCURRENT result of each entity equals
    // the entity's batch SCD2 resolution computed alone — any state
    // bleed between the two live applies (shared checkpoint, shared
    // bucket table, misrouted batch) breaks this equality
    Seq(("customers", 0L), ("suppliers", 1L)).foreach { case (name, rem) =>
      val solo = graft.operators.Cdc
        .scd2FromStaged(MultiEntityCdc.entityFeed(spark, sf, rem))
        .filter(col("operation") =!= "DELETE")
        .select(col("key_id"), col("value"), col("props"),
          col("operation"), col("__start_at"), col("__end_at"),
          col("__is_current"))
      val got = out.filter(col("entity") === name).drop("entity")
      assert(got.exceptAll(solo).isEmpty && solo.exceptAll(got).isEmpty,
        s"entity $name diverged from its solo batch resolution")
    }
  }
}
