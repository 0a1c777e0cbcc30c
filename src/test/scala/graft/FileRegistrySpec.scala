package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileRegistry

class FileRegistrySpec extends AnyFunSuite {
  import TestSpark._

  private def reader(paths: Seq[String]) = spark.read.parquet(paths: _*)

  test("incremental discovery ingests each file exactly once across restarts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_alreg").toString
    val (src, reg, sink) = (s"$root/src", s"$root/reg", s"$root/sink")

    (1L to 50L).toDF("id").write.parquet(s"$src/p1")
    val r1 = FileRegistry.ingestNew(spark, src, reg, sink, reader)
    assert(r1.runId == 1 && r1.rows == 50)
    assert(r1.files.forall(_.contains("/p1/")))

    // "restart": nothing carried in memory — state is re-read from disk
    (51L to 80L).toDF("id").write.parquet(s"$src/p2")
    val r2 = FileRegistry.ingestNew(spark, src, reg, sink, reader)
    assert(r2.runId == 2 && r2.rows == 30)
    assert(r2.files.nonEmpty && r2.files.forall(_.contains("/p2/")),
      s"run 2 must read ONLY new files, got ${r2.files}")

    // no new files → no-op: no sink write, no manifest
    val r3 = FileRegistry.ingestNew(spark, src, reg, sink, reader)
    assert(r3.files.isEmpty && r3.rows == 0)
    assert(FileRegistry.registered(reg).size == r1.files.size + r2.files.size)

    val all = spark.read.parquet(sink)
    assert(all.count() == 80)
    assert(all.filter(col("run") === 1).count() == 50)
    assert(all.filter(col("run") === 2).count() == 30)
  }

  test("crash before manifest commit replays the run idempotently") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_alcrash").toString
    val (src, reg, sink) = (s"$root/src", s"$root/reg", s"$root/sink")

    (1L to 20L).toDF("id").write.parquet(s"$src/p1")
    FileRegistry.ingestNew(spark, src, reg, sink, reader)
    (21L to 35L).toDF("id").write.parquet(s"$src/p2")
    val r2 = FileRegistry.ingestNew(spark, src, reg, sink, reader)

    // simulate a crash BETWEEN sink write and manifest commit: the sink
    // partition exists but the manifest does not
    Files.delete(Paths.get(reg, "run-00002.txt"))
    val replay = FileRegistry.ingestNew(spark, src, reg, sink, reader)
    assert(replay.runId == 2 && replay.files == r2.files)

    // the replayed run overwrote its own partition — each row once
    val all = spark.read.parquet(sink)
    assert(all.count() == 35)
    assert(all.select(col("id")).distinct().count() == 35)
  }

  test("schema evolution: new columns append, old rows backfill null") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_alse").toString
    val (src, reg, sink) = (s"$root/src", s"$root/reg", s"$root/sink")
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .repartition(1).write.option("header", "true").csv(s"$src/p1")
    FileRegistry.ingestEvolving(spark, src, reg, sink)
    assert(FileRegistry.storedSchema(reg).get.fieldNames.toSeq ==
      Seq("id", "x"))
    // a later file carries a NEW column
    Seq((3L, "c", 9.5)).toDF("id", "x", "score")
      .repartition(1).write.option("header", "true").csv(s"$src/p2")
    FileRegistry.ingestEvolving(spark, src, reg, sink)
    assert(FileRegistry.storedSchema(reg).get.fieldNames.toSeq ==
      Seq("id", "x", "score"), "schema must evolve by appending")
    val all = spark.read.option("mergeSchema", "true").parquet(sink)
    assert(all.count() == 3)
    // NULL backfill for pre-evolution rows, value for the new row
    assert(all.filter(col("score").isNull).count() == 2)
    assert(all.filter(col("score") === 9.5).count() == 1)
    // an identical-schema third run commits NO new schema version
    val before = new java.io.File(reg).listFiles()
      .count(_.getName.startsWith("schema-"))
    Seq((4L, "d", 1.0)).toDF("id", "x", "score")
      .repartition(1).write.option("header", "true").csv(s"$src/p3")
    FileRegistry.ingestEvolving(spark, src, reg, sink)
    assert(new java.io.File(reg).listFiles()
      .count(_.getName.startsWith("schema-")) == before,
      "unchanged schema must not commit a new schema file")
  }
}
