package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Scratch, VersionedLake}
import graft.streaming.Continuous

/** Continuous-mode pipeline (the reference's `continuous: true` flag):
  * the gate itself is heavily self-asserting — this spec gives the
  * Runner a direct, named harness (r11 shipped the whole module
  * unwired; a spec referencing it makes that impossible to repeat).
  */
class ContinuousSpec extends AnyFunSuite {
  import TestSpark._

  test("pipeline_continuous gate: pinned 14-row event story") {
    val rows = Continuous.queries("pipeline_continuous")(spark, sf)
      .collect()
    assert(rows.length == 14)
    assert(rows.map(_.getAs[Long]("seq")).toSeq == (0L until 14L))
    val types = rows.map(_.getAs[String]("event_type")).toSeq
    assert(types.head == "run_started" && types.count(_ == "run_started") == 2)
    assert(types.count(_ == "flow_started") == 4) // 2 flows x 2 runs
    assert(types.count(_ == "flow_progress") == 6) // 3 drains x 2 flows
    assert(types.last == "run_completed")
    assert(rows.last.getAs[String]("message") ==
      "flows_ok=2 exactly_once=true")
  }

  test("runner: flows concurrently active; resume processes only new data") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val feed = Scratch.dir("contspec_feed")
    val target = Scratch.dir("contspec_tgt")
    val ckpt = Files.createTempDirectory("graft_contspec_ckpt").toString
    import s.implicits._
    val schema = Seq((1L, 1L, 10.0)).toDF("key_id", "seq", "v").schema
    def land(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("key_id", "seq", "v").repartition(1)
        .write.mode("append").parquet(feed)
    land(Seq((1L, 1L, 10.0), (2L, 2L, 20.0)))
    val flows = Seq(Continuous.FlowDef("f", "bronze",
      sp => sp.readStream.schema(schema).parquet(feed),
      target, Seq("key_id"), "seq"))
    val p = "contspec_run"
    graft.plans.EventLog.clear(p)
    val run1 = new Continuous.Runner(s, p, flows, ckpt, resume = false)
      .start()
    assert(run1.allActive, "flow should be active while running")
    run1.drain()
    assert(run1.rowsThisRun("f") == 2L)
    run1.stop("run_stopped", "spec")
    // arrives while DOWN: the resumed runner must see exactly this row
    land(Seq((3L, 3L, 30.0), (1L, 4L, 11.0)))
    val run2 = new Continuous.Runner(s, p, flows, ckpt, resume = true)
      .start()
    run2.drain()
    assert(run2.rowsThisRun("f") == 2L,
      s"resume replayed sealed data: ${run2.rowsThisRun("f")}")
    run2.stop("run_completed", "spec")
    // SCD1 convergence on the target: key 1 upserted to seq 4
    val live = VersionedLake.read(s, target)
      .select(col("key_id"), col("seq"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(live == Set((1L, 4L, 11.0), (2L, 2L, 20.0), (3L, 3L, 30.0)))
    graft.plans.EventLog.clear(p)
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(ckpt))
  }
}
