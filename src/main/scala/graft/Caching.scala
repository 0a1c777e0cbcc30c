package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Scoped caching for operators whose plans read an expensive
  * intermediate from several places (self-joins, probe+corpus fan-outs).
  *
  * `Dataset.cache()` registers the plan in the session's CacheManager,
  * which holds a strong reference until an explicit `unpersist`/
  * `clearCache()` — a long-lived session composing many operators would
  * accumulate cached plans without bound. [[withCached]] instead:
  *
  *  1. persists the inputs (MEMORY_AND_DISK) only while the operator
  *     body builds AND materializes its result,
  *  2. materializes the result via `localCheckpoint(eager = true)` —
  *     result partitions live in executor block storage and are released
  *     automatically by the ContextCleaner once the returned frame
  *     becomes unreachable (RDD-level storage is GC-managed; CacheManager
  *     entries are not),
  *  3. unpersists the inputs before returning.
  *
  * Trade-off: the checkpointed result has no lineage, so losing an
  * executor loses its partitions (acceptable: operator outputs here are
  * pair/top-k sets, orders of magnitude smaller than their inputs, and
  * the driver re-runs the query on failure).
  */
object Caching {

  /** Persist `inputs` for the duration of `f`, eagerly materialize `f`'s
    * result, then release the inputs. See object doc for the lifecycle.
    */
  /** `-Dgraft.caching.disable=true` turns [[withCached]] into a pure
    * passthrough (no persist, no checkpoint): plan-inspection tools
    * ([[graft.PlanAudit]]) set it so they audit the operator's FULL
    * plan rather than a post-checkpoint stub. Never set it for real
    * runs — self-join inputs would recompute once per reference.
    */
  private def disabled: Boolean =
    java.lang.Boolean.getBoolean("graft.caching.disable")

  /** Eagerly materialize one intermediate frame (iterative operators'
    * per-round cut against plan-doubling self-references — see
    * GraphAnn.beamSearch). Honors the same disable flag as
    * [[withCached]] so plan-inspection tools see the full lineage.
    */
  def materialize(df: DataFrame): DataFrame =
    if (disabled) df else df.localCheckpoint(eager = true)

  def withCached(inputs: Dataset[_]*)(f: => DataFrame): DataFrame = {
    if (disabled) f
    else {
      inputs.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
      try f.localCheckpoint(eager = true)
      finally inputs.foreach(_.unpersist(blocking = false))
    }
  }

  /** Deterministically release every persisted RDD in the session —
    * including localCheckpoint block storage, which neither
    * `clearCache()` nor anything short of a driver GC touches
    * (ContextCleaner frees checkpoint blocks only after the RDD
    * reference is collected; the periodic fallback GC defaults to
    * 30 min). Batch harnesses (Bench/Verify) call this between queries
    * so materialized outputs never accumulate across the run. Only safe
    * once the prior query's output is fully consumed: a localCheckpoint
    * has no lineage, so unpersisting one that is still needed loses the
    * data.
    *
    * `blocking = true` waits for block removal before returning — timed
    * harnesses (Bench) use it so asynchronous block-manager cleanup from
    * one query cannot bleed into the next query's measured region.
    */
  def releaseAll(spark: org.apache.spark.sql.SparkSession,
      blocking: Boolean = false): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))
}
