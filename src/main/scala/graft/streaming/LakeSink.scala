package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Scratch, VersionedLake}

/** Structured Streaming INTO the ACID lake — the missing edge between
  * the streaming tier and [[VersionedLake]]: a `foreachBatch` sink that
  * merges each microbatch with [[VersionedLake.upsertTxn]], using the
  * BATCH ID as the transaction version. foreachBatch alone is
  * at-least-once (a crash after the merge but before the checkpoint
  * commit re-delivers the batch); the manifest's per-app transaction
  * watermark turns the re-delivery into a no-op, which is exactly
  * Delta's `txnAppId`/`txnVersion` idempotent-writer recipe — the
  * streaming-CDC-into-lakehouse shape the reference's AUTO CDC
  * pipelines run in production (ref docs/CDC_GUIDE.md).
  *
  * The gate drives the staged change feed through a three-microbatch
  * stream (sequence mod 3 — out-of-order arrival, same discipline as
  * the MOR gate), then REPLAYS a committed batch verbatim with its
  * original transaction version: the replay must be skipped (no new
  * version, no data change), and the converged table hash-matches the
  * full-feed SCD1 oracle.
  */
object LakeSink {

  val AppId = "graft_lake_sink"

  def streamingExactlyOnce(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = Scratch.dir("lake_sink_tbl")
    val feed = Scratch.dir("lake_sink_feed")
    val checkpoint = Files.createTempDirectory("graft_lsink_ckpt").toString
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, dir))
      .withColumn("_deleted", col("operation") === "DELETE")
      .drop("operation")
    staged.withColumn("b", pmod(col("sequence_number"), lit(3)))
      .repartition(1).write.partitionBy("b").parquet(feed)
    val feedSchema = spark.read.parquet(s"$feed/b=0").schema
    // batch id → the files that fed it, so the replay below re-applies
    // a COMMITTED batch verbatim (not a guess about file order)
    val batchFiles =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[String]]()
    val q = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/b=*")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batchFiles.put(id, batch.inputFiles)
        VersionedLake.upsertTxn(spark, path, batch,
          Seq("key_id"), "sequence_number", AppId, id)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val committedVersions = VersionedLake.versions(spark, path)
    // the at-least-once failure mode, reproduced exactly: re-deliver a
    // committed microbatch with its original transaction version
    val replayId = 1L
    val replayed = spark.read.schema(feedSchema)
      .parquet(batchFiles.get(replayId): _*)
    val replayResult = VersionedLake.upsertTxn(spark, path, replayed,
      Seq("key_id"), "sequence_number", AppId, replayId)
    val replayNoop = replayResult.isEmpty &&
      VersionedLake.versions(spark, path) == committedVersions
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    VersionedLake.read(spark, path)
      .select(col("key_id"), col("value"), col("props"),
        col("sequence_number").as("last_sequence"))
      .withColumn("n_commits", lit(committedVersions.size))
      .withColumn("replay_was_noop", lit(replayNoop))
  }

  val streamingExactlyOnceSql: String =
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
       SELECT key_id, value, props, sequence_number AS last_sequence,
         3 AS n_commits, true AS replay_was_noop
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_lake_sink" -> ((s, d) =>
      streamingExactlyOnce(s, d).orderBy(col("key_id"))))

  def oracles: Map[String, String] = Map(
    "stream_lake_sink" -> streamingExactlyOnceSql)
}
