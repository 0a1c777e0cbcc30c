package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MultiEntityCdc

class MultiEntityCdcSpec extends AnyFunSuite {
  import TestSpark._

  test("concurrent entity applies: each equals its SOLO batch resolution") {
    val out = MultiEntityCdc.multiEntityDag(spark, sf).localCheckpoint(true)
    // structural isolation: entities partition the key space
    MultiEntityCdc.Entities.foreach { case (name, rem) =>
      val slice = out.filter(col("entity") === name)
      assert(slice.count() > 0, s"entity $name is empty")
      assert(slice.filter(pmod(col("key_id"), lit(3)) =!= rem).isEmpty,
        s"entity $name carries foreign keys")
    }
    // semantic isolation: the CONCURRENT result of each entity equals
    // the entity's batch SCD2 resolution computed alone — any state
    // bleed between the three live applies (shared checkpoint, shared
    // bucket table, misrouted batch) breaks this equality
    MultiEntityCdc.Entities.foreach { case (name, rem) =>
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
