package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Streaming corpus ingest — the continuous twin of the batch cleaning
  * path (the [[graft.operators.Dedup]] exact gate behind a quality
  * filter), the way a 100 TB crawl actually lands: documents arrive as
  * files, each micro-batch is quality-gated at scan speed, and the
  * running canonical-per-content-key state (first-seen keeper, copy
  * count) updates incrementally — a streaming aggregation keyed on the
  * content hash, state O(distinct contents), never a corpus rescan.
  *
  * Complete output mode over the finite fixture flushes the full state
  * so the result equals the batch canonicalization and the SAME DuckDB
  * oracle applies (the family discipline: stream_gold_daily ↔
  * gold_daily_orders). In production this runs in update mode with the
  * sink applying keyed upserts (the stream_cdc_apply contract).
  */
object CorpusStream {

  /** Quality gate: token-count bounds (the [[graft.operators
    * .TextAnalysis]] length rule — too short is boilerplate, too long
    * is concatenation junk).
    */
  val MinToks = 5
  val MaxToks = 1000

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def corpusIngest(spark: SparkSession, dir: String): DataFrame = {
    val checkpoint = Files.createTempDirectory("graft_corpus_ckpt").toString
    val queryName = s"stream_corpus_ingest_${System.identityHashCode(spark)}"
    val norm = regexp_replace(lower(trim(col("text"))), " +", " ")
    val src = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val canon = src
      .withColumn("n_toks", size(split(norm, " ")).cast("long"))
      .filter(col("n_toks") >= MinToks && col("n_toks") <= MaxToks)
      .withColumn("content_key", md5(norm))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        min(col("n_toks")).as("n_toks"))
    val q = canon.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(queryName).localCheckpoint(eager = true)
    spark.catalog.dropTempView(queryName)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(checkpoint))
    out
  }

  val corpusIngestSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""WITH gated AS (
         SELECT doc_id, md5($norm) AS content_key,
           CAST(len(string_split($norm, ' ')) AS BIGINT) AS n_toks
         FROM documents),
       kept AS (
         SELECT * FROM gated WHERE n_toks BETWEEN $MinToks AND $MaxToks)
       SELECT content_key, MIN(doc_id) AS keeper_id,
         CAST(COUNT(*) AS BIGINT) AS n_copies,
         MIN(n_toks) AS n_toks
       FROM kept
       GROUP BY content_key
       ORDER BY content_key"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_corpus_ingest" -> ((s, d) =>
      corpusIngest(s, d).orderBy(col("content_key"))))

  def oracles: Map[String, String] = Map(
    "stream_corpus_ingest" -> corpusIngestSql)
}
