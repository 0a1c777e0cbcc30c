package graft

import java.time.{Duration, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Pipeline, Schedule}

class ScheduleSpec extends AnyFunSuite {
  import TestSpark._

  private val jan1 = LocalDateTime.of(2024, 1, 1, 0, 0) // a Monday
  private val feb1 = LocalDateTime.of(2024, 2, 1, 0, 0)

  test("cron derivation: fields, steps, ranges, leap day, vixie day rule") {
    val daily = Schedule.parse("30 6 * * *")
    assert(Schedule.firesBetween(daily, jan1, feb1).size == 31)
    assert(Schedule.nextFire(daily, jan1) ==
      LocalDateTime.of(2024, 1, 1, 6, 30))
    assert(Schedule.nextFire(daily, LocalDateTime.of(2024, 1, 1, 6, 30)) ==
      LocalDateTime.of(2024, 1, 2, 6, 30)) // strictly after
    // Mondays in Jan 2024: 1, 8, 15, 22, 29
    val weekly = Schedule.parse("0 3 * * 1")
    assert(Schedule.firesBetween(weekly, jan1, feb1).map(_.getDayOfMonth) ==
      Seq(1, 8, 15, 22, 29))
    // leap day exists in 2024
    val leap = Schedule.parse("0 12 29 2 *")
    assert(Schedule.nextFire(leap, jan1) ==
      LocalDateTime.of(2024, 2, 29, 12, 0))
    // steps within a range, bounded hours, weekdays only
    val qh = Schedule.parse("*/15 9-17 * * 1-5")
    val jan2 = Schedule.firesBetween(qh,
      LocalDateTime.of(2024, 1, 2, 0, 0), LocalDateTime.of(2024, 1, 3, 0, 0))
    assert(jan2.size == 9 * 4) // Tuesday: 9 hours x 4 quarter-hours
    assert(Schedule.firesBetween(qh,
      LocalDateTime.of(2024, 1, 6, 0, 0),
      LocalDateTime.of(2024, 1, 7, 0, 0)).isEmpty) // Saturday
    // vixie rule: dom AND dow both restricted -> EITHER matches
    val vixie = Schedule.parse("0 0 13 * 5") // 13th OR Friday
    val fires = Schedule.firesBetween(vixie, jan1, feb1).map(_.getDayOfMonth)
    assert(fires == Seq(5, 12, 13, 19, 26)) // Fridays + the 13th (a Sat)
  }

  test("max_concurrent_runs=1: overlapping fires are skipped, not queued") {
    val job = Schedule.JobSpec("tenly", "*/10 * * * *")
    val led = Schedule.ledger(job, jan1,
      LocalDateTime.of(2024, 1, 1, 1, 0), Duration.ofMinutes(15))
    assert(led.map(_.scheduledAt.getMinute) == Seq(0, 10, 20, 30, 40, 50))
    assert(led.map(_.action) ==
      Seq("run", "skip_overlap", "run", "skip_overlap", "run", "skip_overlap"))
    // a run ending exactly at the next fire does NOT block it
    val tight = Schedule.ledger(job, jan1,
      LocalDateTime.of(2024, 1, 1, 0, 30), Duration.ofMinutes(10))
    assert(tight.map(_.action) == Seq("run", "run", "run"))
    // paused jobs keep the calendar but never run (the reference ships
    // its weekly full-refresh job paused)
    val paused = Schedule.ledger(job.copy(paused = true), jan1,
      LocalDateTime.of(2024, 1, 1, 1, 0), Duration.ofMinutes(15))
    assert(paused.nonEmpty && paused.forall(_.action == "paused"))
  }

  test("runScheduled drives the DAG once per executed fire with the job's mode") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_sched").toString
    val src = s"$work/src"
    Seq(1L, 2L).toDF("id").write.parquet(src)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val defs = Seq(Pipeline.TableDef("t", "x", Nil,
      (s, _) => { builds.incrementAndGet(); s.read.parquet(src) },
      sources = Seq(src)))
    // 3 executed fires (of 6 scheduled) on an INCREMENTAL job: first
    // run builds, later runs find inputs unchanged -> fresh
    val runs = Schedule.runScheduled(spark, defs,
      Schedule.JobSpec("incr", "*/10 * * * *", mode = Pipeline.Incremental),
      jan1, LocalDateTime.of(2024, 1, 1, 1, 0), Duration.ofMinutes(15),
      lakeDir = Some(s"$work/lake"))
    assert(runs.size == 3)
    assert(builds.get() == 1, "incremental reruns must not rebuild")
    assert(runs.head._2.map(_.status) == Seq("ok"))
    assert(runs.tail.flatMap(_._2.map(_.status)) == Seq("fresh", "fresh"))
  }
}
