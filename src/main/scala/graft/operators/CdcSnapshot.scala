package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{Scratch, VersionedLake}

/** AUTO CDC **FROM SNAPSHOT** — the snapshot-diff twin of the feed-based
  * CDC family (ref docs/CDC_GUIDE.md; Databricks
  * `create_auto_cdc_from_snapshot_flow`, formerly
  * `apply_changes_from_snapshot`): the source system cannot emit a
  * change feed, only periodic FULL snapshots, and the engine must
  * synthesize the inserts/updates/deletes by diffing each arriving
  * snapshot against the previous one, then apply them to the target
  * with SCD semantics whose validity bounds are SNAPSHOT versions.
  *
  * Spark-first shape, three stages each declarative:
  *
  *  1. **Land**: every full snapshot becomes one REPLACE commit on a
  *     [[VersionedLake]] table (initial CREATE upsert, then
  *     `replaceSnapshot` per arrival — Delta's RTAS discipline), so
  *     "previous snapshot" is a time-travel read, not caller-managed
  *     state, and a crashed ingest retries idempotently;
  *  2. **Diff**: consecutive versions full-outer join on the key —
  *     present-only-new = INSERT, present-only-old = DELETE, value
  *     changed = UPDATE, value unchanged = NO event (the defining
  *     difference from feed CDC: an unchanged row in the next snapshot
  *     must not touch the target). Both snapshot reads are
  *     bucket-partitioned on the same key hash by the lake writer, so
  *     the join co-locates without an extra shuffle at scale;
  *  3. **Apply**: the synthesized feed goes through the EXISTING
  *     [[Cdc.applyChangesOrdered]] contract (SCD2 here) with the
  *     snapshot version as the sequence — one window pass, validity
  *     ranges `__start_at`/`__end_at` in snapshot-version units,
  *     absence-closed keys re-opening when they reappear.
  *
  * Gate fixture: 4 deterministic snapshots = SCD1 states of the staged
  * event feed at sequence cutoffs k·max/4 (k = 1..4) — re-derivable by
  * the DuckDB oracle from raw events, which re-builds the snapshots,
  * re-diffs them, and re-applies SCD2 independently.
  *
  * At 100 TB: snapshot ingestion costs one table write per arrival
  * (unavoidable — the source sends everything), the diff reads exactly
  * two snapshots with a co-partitioned join, and the apply shuffles the
  * change feed only — O(changes), not O(table).
  */
object CdcSnapshot {

  private val SnapCount = 4

  def cdcFromSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_snapcdc")
    val staged = Cdc.stage(Tables.events(spark, sfDir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    // land: each full snapshot is ONE commit (CREATE, then REPLACEs)
    (1 to SnapCount).foreach { k =>
      val snap = Cdc.applyChangesOrdered(
        staged.filter(col("sequence_number") <= lit(maxSeq * k / SnapCount)),
        Seq("key_id"), Seq(col("sequence_number")), "operation",
        Cdc.ScdType1)
        .select(col("key_id"), col("value"),
          lit(k.toLong).as("snap_seq"))
      if (k == 1)
        VersionedLake.upsert(spark, path, snap, Seq("key_id"), "snap_seq")
      else
        VersionedLake.replaceSnapshot(spark, path, snap,
          Seq("key_id"), "snap_seq")
    }
    // diff: consecutive stored versions → synthesized change feed
    // (the first snapshot is all INSERTs — nothing precedes it)
    def at(v: Int): DataFrame = VersionedLake.read(spark, path, Some(v))
    val feed = (1 to SnapCount).map { k =>
      if (k == 1) at(1).select(lit(1L).as("snap_v"), col("key_id"),
        col("value"), lit("INSERT").as("operation"))
      else {
        val prev = at(k - 1)
          .select(col("key_id"), col("value").as("old_value"))
        at(k).select(col("key_id"), col("value"))
          .join(prev, Seq("key_id"), "full_outer")
          .filter(col("old_value").isNull || col("value").isNull ||
            col("old_value") =!= col("value"))
          .select(lit(k.toLong).as("snap_v"), col("key_id"), col("value"),
            when(col("old_value").isNull, "INSERT")
              .when(col("value").isNull, "DELETE")
              .otherwise("UPDATE").as("operation"))
      }
    }.reduce(_ unionByName _)
    // apply: the ordinary feed contract, sequenced by snapshot version
    Cdc.applyChangesOrdered(feed, Seq("key_id"), Seq(col("snap_v")),
        "operation", Cdc.ScdType2)
      .select(col("key_id"), col("value"),
        col("__start_at"), col("__end_at"), col("__is_current"))
  }

  /** Oracle: snapshots, diff, and SCD2 apply re-derived from raw events
    * in pure SQL. `feed` keeps DELETE rows through the lead() window
    * (they close the prior version) and filters them at the end —
    * exactly [[Cdc.applyChangesOrdered]]'s SCD2 contract.
    */
  val cdcFromSnapshotSql: String =
    s"""WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       cut AS (SELECT MAX(sequence_number) AS m FROM stg),
       ks AS (SELECT * FROM (VALUES (1), (2), (3), (4)) AS t(k)),
       snaps AS (
         SELECT k AS snap_v, key_id, value FROM (
           SELECT s.key_id, s.value, k.k,
             row_number() OVER (PARTITION BY k.k, s.key_id
               ORDER BY s.sequence_number DESC) AS rn,
             s.operation
           FROM stg s JOIN ks k
             ON s.sequence_number <= (SELECT m FROM cut) * k.k // $SnapCount)
         WHERE rn = 1 AND operation <> 'DELETE'),
       prevs AS (
         SELECT snap_v + 1 AS k, key_id, value FROM snaps
         WHERE snap_v < $SnapCount),
       curs AS (
         SELECT snap_v AS k, key_id, value FROM snaps WHERE snap_v > 1),
       feed AS (
         SELECT CAST(1 AS BIGINT) AS snap_v, key_id, value,
           'INSERT' AS operation
         FROM snaps WHERE snap_v = 1
         UNION ALL
         SELECT CAST(COALESCE(c.k, p.k) AS BIGINT),
           COALESCE(c.key_id, p.key_id),
           c.value,
           CASE WHEN p.key_id IS NULL THEN 'INSERT'
                WHEN c.key_id IS NULL THEN 'DELETE'
                ELSE 'UPDATE' END
         FROM prevs p
         FULL JOIN curs c ON p.k = c.k AND p.key_id = c.key_id
         WHERE p.key_id IS NULL OR c.key_id IS NULL
            OR p.value <> c.value),
       scd AS (
         SELECT key_id, value, operation,
           snap_v AS __start_at,
           lead(snap_v) OVER (PARTITION BY key_id ORDER BY snap_v)
             AS __end_at
         FROM feed)
       SELECT key_id, value, __start_at, __end_at,
         __end_at IS NULL AS __is_current
       FROM scd WHERE operation <> 'DELETE'
       ORDER BY key_id, __start_at"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_from_snapshot" -> ((s, d) =>
      cdcFromSnapshot(s, d).orderBy(col("key_id"), col("__start_at"))))

  def oracles: Map[String, String] = Map(
    "cdc_from_snapshot" -> cdcFromSnapshotSql)
}
