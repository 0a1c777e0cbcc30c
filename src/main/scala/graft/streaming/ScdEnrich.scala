package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming fact enrichment against a STATIC SCD2 dimension — the DLT
  * pattern where a streaming table joins the history version that was
  * valid AT THE FACT'S OWN TIME: `stream JOIN dim ON key AND point ∈
  * [start, end)`. Spark's stream-static join broadcasts the dimension
  * into every microbatch with an arbitrary residual predicate, so the
  * interval containment needs no state, no watermark, and each batch
  * is enriched exactly-once through the checkpointed file source. The
  * static side is version-pinned once at query start (localCheckpoint),
  * which is precisely the semantic a reproducible enrichment run wants
  * — a mid-stream dimension update cannot split a batch.
  *
  * The output and oracle are IDENTICAL to the batch point-in-time
  * join's ([[graft.operators.Cdc.pointInTime]] /
  * cdc_point_in_time): the streaming plan must reproduce the batch
  * semantics row-for-row, which is the whole point of the gate.
  */
object ScdEnrich {

  def streamScd2Enrich(spark: SparkSession, dir: String): DataFrame = {
    val checkpoint = Files.createTempDirectory("graft_scd2e_ckpt").toString
    val out = graft.sources.Scratch.dir("scd2_enrich_out")
    val ev = graft.Tables.events(spark, dir)
    val dim = graft.operators.Cdc.scd2History(ev)
      .select(col("key_id"), col("value").as("version_value"),
        col("__start_at"), col("__end_at"))
      .localCheckpoint(true) // pin the dimension version for the run
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val src = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      // the same staging filters the SCD2 builder applied
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("event_type").isNotNull && col("value").isNotNull)
      .select(col("user_id").as("p_key"),
        col("event_id").as("sequence_number"))
    val enriched = src.join(broadcast(dim),
      col("p_key") === col("key_id") &&
        col("sequence_number") >= col("__start_at") &&
        (col("__end_at").isNull ||
          col("sequence_number") < col("__end_at")))
      .select(col("p_key").as("out_key"), col("sequence_number"),
        col("__start_at").as("version_start"), col("version_value"))
    val q = enriched.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    spark.read.parquet(out)
      .select(col("out_key").as("key_id"), col("sequence_number"),
        col("version_start"), col("version_value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_scd2_enrich" -> ((s, d) =>
      streamScd2Enrich(s, d)
        .orderBy(col("key_id"), col("sequence_number"))))

  // same semantics, same oracle as the batch point-in-time join
  def oracles: Map[String, String] = Map(
    "stream_scd2_enrich" -> graft.operators.Cdc.pointInTimeSql)
}
