package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic adversarial CDC feed generator — the engine analogue of
  * the reference's synthetic CDC batch utility
  * (ref /root/reference/src/utils/data_generator.py:286-380: batched
  * INSERT/UPDATE/DELETE events with per-batch monotone sequence_numbers;
  * its unit tests are half the reference's test surface). The reference
  * draws from `random`; this generator derives every row from pure
  * integer formulas of (key, batch) so the identical feed is
  * re-derivable in DuckDB from `generate_series` — the full
  * generate → stage → SCD resolution pipeline gets an exact oracle.
  *
  * Adversarial structure built in:
  *  - DELETE-before-INSERT arrival: keys ≡ 0 (mod 11) lead with a
  *    DELETE in batch 0 (resolution must survive a delete with no
  *    prior state);
  *  - keys that END deleted: keys ≡ 0 (mod 5) close with a DELETE in
  *    the last batch (must drop out of SCD1);
  *  - same-key same-sequence ties: keys ≡ 0 (mod 7) carry a second
  *    row at their last batch's exact sequence_number — including keys
  *    ≡ 0 (mod 35) where the tie row's UPDATE contends with that
  *    batch's DELETE. Ties are resolved by the documented composite
  *    order (sequence, operation, value) via
  *    [[Cdc.applyChangesOrdered]]: operation DESC makes UPDATE beat
  *    INSERT beat DELETE at equal sequence, value DESC settles
  *    UPDATE-vs-UPDATE.
  *  - re-inserts after deletes: the op cycle reopens deleted keys in
  *    later batches (SCD2 opens a fresh version).
  *
  * Scale: the feed is a `spark.range` projection (no shuffle to
  * generate); resolution is [[Cdc.applyChangesOrdered]]'s one window
  * pass per SCD type — the same linear machinery as the real feed.
  */
object CdcGen {

  val Keys = 200
  val Batches = 8 // batch b contributes sequence b*100 + per-key jitter

  /** The change feed: (key_id, batch_id, sequence_number, operation,
    * value). Sequence is strictly increasing per key across batches
    * (jitter < 100 ≤ batch stride); the tie rows duplicate one exact
    * (key, sequence) pair by construction.
    */
  def feed(spark: SparkSession): DataFrame = {
    val base = spark.range(Keys.toLong * Batches).select(
      (col("id") / Batches).cast("long").as("k"),
      (col("id") % Batches).cast("long").as("b"))
    val rows = base.select(
      col("k").as("key_id"),
      col("b").as("batch_id"),
      (col("b") * 100 + (col("k") * 13) % 97).as("sequence_number"),
      when(col("b") === 0 && col("k") % 11 === 0, "DELETE")
        .when(col("b") === 0, "INSERT")
        .when(col("b") === (Batches - 1) && col("k") % 5 === 0, "DELETE")
        .when((col("k") * 7 + col("b") * 3) % 6 === 0, "DELETE")
        .when((col("k") * 7 + col("b") * 3) % 6 === 1, "INSERT")
        .otherwise("UPDATE").as("operation"),
      ((col("k") * 31 + col("b") * 17) % 1000).as("value"))
    val lastB = Batches - 1
    val ties = spark.range(Keys).filter(col("id") % 7 === 0).select(
      col("id").as("key_id"),
      lit(lastB.toLong).as("batch_id"),
      (lit(lastB * 100L) + (col("id") * 13) % 97).as("sequence_number"),
      lit("UPDATE").as("operation"),
      ((col("id") * 31 + lastB * 17) % 1000 + 5000).as("value"))
    rows.union(ties)
  }

  /** Gate query `cdc_generated_convergence`: the generated feed resolved
    * through the REAL operators ([[Cdc.applyChangesOrdered]] SCD1 +
    * SCD2) and summarized per key — change count, surviving version
    * count, liveness, current value under the tie-break contract, last
    * sequence. The oracle re-derives feed AND resolution in SQL.
    */
  def convergence(spark: SparkSession): DataFrame = {
    val f = feed(spark)
    val order = Seq(col("sequence_number"), col("operation"), col("value"))
    graft.Caching.withCached(f) {
      val scd1 = Cdc.applyChangesOrdered(f, Seq("key_id"), order,
        "operation", Cdc.ScdType1)
        .select(col("key_id"), col("value").as("current_value"))
      val scd2 = Cdc.applyChangesOrdered(f, Seq("key_id"), order,
        "operation", Cdc.ScdType2)
        .groupBy(col("key_id")).agg(count(lit(1)).as("n_versions"))
      val grouped = f.groupBy(col("key_id")).agg(
        count(lit(1)).as("n_changes"),
        max(col("sequence_number")).as("last_sequence"))
      grouped
        .join(scd2, Seq("key_id"), "left")
        .join(scd1, Seq("key_id"), "left")
        .select(col("key_id"), col("n_changes"),
          coalesce(col("n_versions"), lit(0L)).as("n_versions"),
          col("current_value").isNotNull.as("is_live"),
          col("current_value"), col("last_sequence"))
    }
  }

  val convergenceSql: String = {
    val lastB = Batches - 1
    s"""WITH raw AS (
         SELECT i // $Batches AS k, i % $Batches AS b
         FROM UNNEST(generate_series(0, ${Keys * Batches - 1})) t(i)),
       rows_base AS (
         SELECT k AS key_id,
           b * 100 + (k * 13) % 97 AS sequence_number,
           CASE WHEN b = 0 AND k % 11 = 0 THEN 'DELETE'
                WHEN b = 0 THEN 'INSERT'
                WHEN b = $lastB AND k % 5 = 0 THEN 'DELETE'
                WHEN (k * 7 + b * 3) % 6 = 0 THEN 'DELETE'
                WHEN (k * 7 + b * 3) % 6 = 1 THEN 'INSERT'
                ELSE 'UPDATE' END AS operation,
           (k * 31 + b * 17) % 1000 AS value
         FROM raw),
       ties AS (
         SELECT k AS key_id,
           ${lastB * 100} + (k * 13) % 97 AS sequence_number,
           'UPDATE' AS operation,
           (k * 31 + ${lastB * 17}) % 1000 + 5000 AS value
         FROM (SELECT DISTINCT k FROM raw) dk WHERE k % 7 = 0),
       feed AS (
         SELECT * FROM rows_base UNION ALL SELECT * FROM ties),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC, operation DESC, value DESC) AS rn
         FROM feed),
       grouped AS (
         SELECT key_id,
           CAST(COUNT(*) AS BIGINT) AS n_changes,
           CAST(SUM(CASE WHEN operation <> 'DELETE' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_versions,
           MAX(sequence_number) AS last_sequence
         FROM feed GROUP BY key_id)
       SELECT g.key_id, g.n_changes, g.n_versions,
         r.operation <> 'DELETE' AS is_live,
         CASE WHEN r.operation <> 'DELETE' THEN r.value END AS current_value,
         g.last_sequence
       FROM grouped g
       JOIN ranked r ON r.key_id = g.key_id AND r.rn = 1
       ORDER BY g.key_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_generated_convergence" -> ((s, _) =>
      convergence(s).orderBy(col("key_id"))))

  def oracles: Map[String, String] = Map(
    "cdc_generated_convergence" -> convergenceSql)
}
