package graft.plans

import java.time.{Duration, LocalDateTime}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic run-calendar — the engine analogue of the reference's
  * job schedule blocks (ref /root/reference/resources/olist_jobs.yml:
  * quartz cron schedule on the daily job, a PAUSED weekly full-refresh
  * job, `max_concurrent_runs: 1`). Nothing here reads the wall clock:
  * fire times derive from a cron expression and a SUPPLIED window, and
  * overlap semantics from a supplied run duration — so schedule
  * behavior is testable and oracle-verifiable like any other operator.
  *
  * One cron parse feeds both execution paths: the per-field allowed
  * sets become Spark `Column` predicates (the declarative calendar the
  * gate verifies against DuckDB's generate_series) AND the driver-side
  * matcher the run ledger uses. The two cannot drift.
  *
  * Cron dialect: 5 fields (minute hour day-of-month month day-of-week),
  * each `*`, `a`, `a-b`, `* / n`, `a-b/n`, or comma lists; dow 0-6 with
  * Sunday = 0 (7 accepted as Sunday). The vixie-cron day rule applies:
  * when BOTH dom and dow are restricted, a day matches if EITHER does.
  */
object Schedule {

  /** One parsed field: the allowed values, and whether the field was
    * restricted at all (`*` is unrestricted — relevant for the
    * dom/dow either-rule).
    */
  final case class Field(allowed: Set[Int], restricted: Boolean)

  final case class Cron(minute: Field, hour: Field, dom: Field,
      month: Field, dow: Field)

  private def fmt(t: LocalDateTime): String =
    t.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss"))

  private def parseField(spec: String, lo: Int, hi: Int,
      wrap: Int => Int = identity): Field = {
    if (spec == "*") return Field((lo to hi).toSet, restricted = false)
    val vals = spec.split(",").flatMap { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron part: $part")
      }
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
        case r => val v = r.toInt; if (step == 1) (v, v) else (v, hi)
      }
      (a to b by step).map(wrap)
    }.toSet
    require(vals.nonEmpty && vals.forall(v => v >= lo && v <= hi),
      s"cron field '$spec' out of range [$lo,$hi]")
    Field(vals, restricted = true)
  }

  def parse(expr: String): Cron = expr.trim.split("\\s+") match {
    case Array(min, hr, dom, mon, dow) => Cron(
      parseField(min, 0, 59),
      parseField(hr, 0, 23),
      parseField(dom, 1, 31),
      parseField(mon, 1, 12),
      parseField(dow, 0, 6, wrap = v => if (v == 7) 0 else v))
    case _ => throw new IllegalArgumentException(
      s"cron '$expr' must have 5 fields")
  }

  /** The vixie day rule as a boolean over (dom matches, dow matches). */
  private def dayOk(c: Cron, domHit: Boolean, dowHit: Boolean): Boolean =
    if (c.dom.restricted && c.dow.restricted) domHit || dowHit
    else domHit && dowHit

  /** Driver-side matcher (the ledger's clock test). */
  def matches(c: Cron, t: LocalDateTime): Boolean =
    c.minute.allowed(t.getMinute) && c.hour.allowed(t.getHour) &&
      c.month.allowed(t.getMonthValue) &&
      dayOk(c, c.dom.allowed(t.getDayOfMonth),
        c.dow.allowed(t.getDayOfWeek.getValue % 7)) // java Mon=1..Sun=7

  /** All fire times in [from, until), minute grain. */
  def firesBetween(c: Cron, from: LocalDateTime,
      until: LocalDateTime): Seq[LocalDateTime] = {
    val start = from.withSecond(0).withNano(0)
    Iterator.iterate(start)(_.plusMinutes(1))
      .takeWhile(_.isBefore(until))
      .filter(matches(c, _))
      .toSeq
  }

  /** Next fire strictly after `t` (bounded search: 5 years covers any
    * satisfiable 5-field cron, leap-day included).
    */
  def nextFire(c: Cron, t: LocalDateTime): LocalDateTime = {
    val limit = t.plusYears(5)
    Iterator.iterate(t.withSecond(0).withNano(0).plusMinutes(1))(
        _.plusMinutes(1))
      .takeWhile(_.isBefore(limit))
      .find(matches(c, _))
      .getOrElse(throw new IllegalArgumentException(
        "cron never fires within 5 years"))
  }

  /** The same calendar as a DECLARATIVE Spark plan: explode the
    * window's minutes, filter by the cron's field sets as Column
    * predicates — the form the DuckDB oracle mirrors. A calendar is
    * O(window minutes) rows; the sequence generates distributed.
    */
  def calendarDF(spark: SparkSession, jobs: Seq[(String, String)],
      from: LocalDateTime, until: LocalDateTime): DataFrame = {
    val minutes = spark.range(1).select(explode(sequence(
        to_timestamp(lit(fmt(from))),
        to_timestamp(lit(fmt(until.minusMinutes(1)))),
        expr("interval 1 minute"))).as("fire_ts"))
    jobs.map { case (name, expr0) =>
      val c = parse(expr0)
      def inSet(col0: Column, f: Field): Column =
        if (!f.restricted) lit(true) else col0.isin(f.allowed.toSeq: _*)
      val domHit = inSet(dayofmonth(col("fire_ts")), c.dom)
      val dowHit = inSet(dayofweek(col("fire_ts")) - 1, c.dow) // Spark Sun=1
      val dayPred =
        if (c.dom.restricted && c.dow.restricted) domHit || dowHit
        else domHit && dowHit
      minutes.filter(
          inSet(minute(col("fire_ts")), c.minute) &&
          inSet(hour(col("fire_ts")), c.hour) &&
          inSet(month(col("fire_ts")), c.month) && dayPred)
        .select(lit(name).as("job_name"), col("fire_ts"))
    }.reduce(_ unionAll _)
  }

  /** DuckDB mirror of [[calendarDF]] for the same jobs and window. */
  def calendarSql(jobs: Seq[(String, String)],
      from: LocalDateTime, until: LocalDateTime): String = {
    def setSql(f: Field, expr0: String): String =
      if (!f.restricted) "true"
      else s"$expr0 IN (${f.allowed.toSeq.sorted.mkString(",")})"
    val branches = jobs.map { case (name, expr0) =>
      val c = parse(expr0)
      val domHit = setSql(c.dom, "dayofmonth(fire_ts)")
      val dowHit = setSql(c.dow, "dayofweek(fire_ts)") // DuckDB Sun=0
      val dayPred =
        if (c.dom.restricted && c.dow.restricted) s"(($domHit) OR ($dowHit))"
        else s"(($domHit) AND ($dowHit))"
      s"""SELECT '$name' AS job_name, fire_ts FROM mins
          WHERE ${setSql(c.minute, "minute(fire_ts)")}
            AND ${setSql(c.hour, "hour(fire_ts)")}
            AND ${setSql(c.month, "month(fire_ts)")}
            AND $dayPred"""
    }.mkString("\n       UNION ALL\n       ")
    s"""WITH mins AS (
         SELECT unnest(generate_series(
           TIMESTAMP '${fmt(from)}', TIMESTAMP '${fmt(until.minusMinutes(1))}',
           INTERVAL 1 MINUTE)) AS fire_ts)
       SELECT job_name, fire_ts FROM (
       $branches)
       ORDER BY job_name, fire_ts"""
  }

  // ---- run ledger: max_concurrent_runs = 1 ---------------------------------
  /** A job as the reference's jobs config declares it. */
  final case class JobSpec(name: String, cron: String,
      mode: Pipeline.RunMode = Pipeline.Incremental, paused: Boolean = false)

  /** Per-fire outcome: run | skip_overlap | paused. */
  final case class LedgerEntry(job: String, scheduledAt: LocalDateTime,
      action: String)

  /** The `max_concurrent_runs: 1` semantics over a window, with a
    * SUPPLIED run duration (no wall clock): a fire while the previous
    * run is still executing is SKIPPED — not queued — exactly the
    * scheduler behavior the reference's jobs config selects. Paused
    * jobs keep their calendar but never run (the shipped weekly
    * full-refresh job is paused).
    */
  def ledger(job: JobSpec, from: LocalDateTime, until: LocalDateTime,
      runDuration: Duration): Seq[LedgerEntry] = {
    val c = parse(job.cron)
    var busyUntil: Option[LocalDateTime] = None
    firesBetween(c, from, until).map { t =>
      if (job.paused) LedgerEntry(job.name, t, "paused")
      else if (busyUntil.exists(t.isBefore)) // still executing: skip
        LedgerEntry(job.name, t, "skip_overlap")
      else {
        busyUntil = Some(t.plus(runDuration))
        LedgerEntry(job.name, t, "run")
      }
    }
  }

  /** Drive the DAG once per non-skipped fire — the jobs-runner analog.
    * Returns (fire time, per-table reports) per executed run; the run
    * duration fed back into the overlap rule is supplied (simulated),
    * keeping the whole path wall-clock-free.
    */
  def runScheduled(spark: SparkSession, defs: Seq[Pipeline.TableDef],
      job: JobSpec, from: LocalDateTime, until: LocalDateTime,
      runDuration: Duration, lakeDir: Option[String] = None,
      policy: Pipeline.RunPolicy = Pipeline.RunPolicy())
      : Seq[(LocalDateTime, Seq[Pipeline.NodeReport])] =
    ledger(job, from, until, runDuration)
      .filter(_.action == "run")
      .map { e =>
        val (_, reports) = Pipeline.runWithReport(spark, defs, lakeDir,
          policy.copy(mode = job.mode))
        (e.scheduledAt, reports)
      }

  // ---- registry ------------------------------------------------------------
  /** The gate calendar: the reference's two job cadences (daily 06:30
    * incremental, Monday 03:00 full refresh) plus a workday
    * quarter-hourly and a month-boundary shape, over Q1 2024 (a leap
    * February) — schedule derivation verified row-for-row against
    * DuckDB's generate_series.
    */
  private val GateJobs = Seq(
    "daily_incremental" -> "30 6 * * *",
    "weekly_full_refresh" -> "0 3 * * 1",
    "workday_quarter_hourly" -> "*/15 9-17 * * 1-5",
    "month_end_close" -> "59 23 28-31 * *")
  private val GateFrom = LocalDateTime.of(2024, 1, 1, 0, 0)
  private val GateUntil = LocalDateTime.of(2024, 4, 1, 0, 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schedule_calendar" -> ((s, _) =>
      calendarDF(s, GateJobs, GateFrom, GateUntil)
        .orderBy(col("job_name"), col("fire_ts"))))

  def oracles: Map[String, String] = Map(
    "schedule_calendar" -> calendarSql(GateJobs, GateFrom, GateUntil))
}
