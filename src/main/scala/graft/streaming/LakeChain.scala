package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{Scratch, VersionedLake}

/** The STREAMING MEDALLION CHAIN — both lake connectors composed into
  * the pipeline shape the reference actually runs: a bronze table
  * receives CDC commits, its commit change log streams through a
  * silver transform, and an exactly-once sink merges each microbatch
  * into the silver lake table (ref src/pipelines/silver SQL — DLT
  * STREAMING TABLEs reading `STREAM(bronze)`; this is that edge built
  * from [[VersionedLake.streamSource]] + [[VersionedLake.upsertTxn]]).
  *
  * End-to-end exactly-once holds because each stage owns one half of
  * the contract: the change-log file stream delivers every committed
  * bronze version at most once per checkpoint, and the silver merge is
  * idempotent on the (appId, batchId) transaction watermark — so a
  * crash/replay ANYWHERE in the chain (re-listed files, re-delivered
  * microbatch) cannot double-apply a change. Silver converges to the
  * transform of bronze's SCD1 state: the change rows are each commit's
  * accepted per-key winners, and the silver merge re-resolves them by
  * the same sequence, so the chain commutes with batch recomputation —
  * the property that lets a 100 TB pipeline switch between streaming
  * and backfill without reconciliation.
  *
  * The gate proves, in one scripted pass: bronze v1+v2 flow through in
  * one run; a bronze commit landed BETWEEN runs arrives alone on
  * resume (`resumed_incrementally` — one new silver version, not a
  * re-merge of everything); a third run with nothing new commits
  * nothing (`chain_replay_noop`); and the silver table — transform
  * column included — hash-matches the full-feed oracle.
  */
object LakeChain {

  val AppId = "graft_lake_chain"

  def medallionChain(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val bronze = Scratch.dir("lake_chain_bronze")
    val silver = Scratch.dir("lake_chain_silver")
    val ckpt = Files.createTempDirectory("graft_lchain_ckpt").toString
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, dir))
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 3
    val t2 = maxSeq * 2 / 3
    def asChanges(df: DataFrame): DataFrame =
      df.withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation")
    VersionedLake.upsert(spark, bronze,
      asChanges(staged.filter(col("sequence_number") <= t1)),
      Seq("key_id"), "sequence_number")
    VersionedLake.dvUpsert(spark, bronze,
      asChanges(staged.filter(col("sequence_number") > t1 &&
        col("sequence_number") <= t2)),
      Seq("key_id"), "sequence_number")
    // the change-log schema is the change-row shape itself
    val schema = asChanges(staged).schema
    def runChain(): Unit = {
      val q = VersionedLake.streamSource(spark, bronze, schema)
        // the silver transform, applied INSIDE the stream (floor is
        // IEEE-exact, so the oracle mirrors it bit-for-bit)
        .withColumn("value_band", floor(col("value")))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          VersionedLake.upsertTxn(spark, silver, batch,
            Seq("key_id"), "sequence_number", AppId, id)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runChain()
    val silverAfter1 = VersionedLake.versions(spark, silver).size
    VersionedLake.dvUpsert(spark, bronze, // lands BETWEEN chain runs
      asChanges(staged.filter(col("sequence_number") > t2)),
      Seq("key_id"), "sequence_number")
    runChain()
    val silverAfter2 = VersionedLake.versions(spark, silver).size
    runChain() // nothing new committed upstream
    val replayNoop = VersionedLake.versions(spark, silver).size == silverAfter2
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    VersionedLake.read(spark, silver)
      .select(col("key_id"), col("value"), col("value_band"),
        col("props"), col("sequence_number").as("last_sequence"))
      .withColumn("n_bronze_commits",
        lit(VersionedLake.versions(spark, bronze).size))
      .withColumn("resumed_incrementally", lit(silverAfter2 == silverAfter1 + 1))
      .withColumn("chain_replay_noop", lit(replayNoop))
  }

  val medallionChainSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, CAST(FLOOR(value) AS BIGINT) AS value_band, props,
         sequence_number AS last_sequence,
         3 AS n_bronze_commits, true AS resumed_incrementally,
         true AS chain_replay_noop
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_table_chain" -> ((s, d) =>
      medallionChain(s, d).orderBy(col("key_id"))))

  def oracles: Map[String, String] = Map(
    "stream_table_chain" -> medallionChainSql)
}
