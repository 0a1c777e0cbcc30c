package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic global shuffle into training shards — the last step
  * of a pretraining data pipeline: after filtering/dedup/mixing, the
  * corpus must be written as S shards whose CONCATENATION is a
  * reproducible pseudo-random document order (so any two runs, and any
  * re-run after a lost shard, produce byte-identical training data).
  *
  * Design (the scalable shape, not a global sort):
  *  - shuffle key  = fnv1a64("shuf:" + doc_id) — a pure function of
  *    the stable id, so the order is reproducible from the ids alone;
  *  - shard id     = pmod(key, S) — hash partitioning, NO global
  *    sort/row_number barrier across the corpus;
  *  - within-shard training order = (key, doc_id) — one sort PER
  *    shard, parallel across shards; S is chosen so a shard fits one
  *    writer task at the target scale (100 TB / S ≈ executor-sized).
  *
  * The gate emits per-shard manifest rows rather than the shards
  * themselves: doc/token counts (balance is observable) and an
  * order fingerprint Σ (position·(doc_id+1)) mod P that pins the exact
  * position→document assignment — any permutation of the within-shard
  * order changes it. All integer arithmetic (§3-safe).
  */
object Shards {

  val NumShards = 8
  val FpPrime = 1000003L

  def shuffleShards(docs: DataFrame, shards: Int = NumShards): DataFrame = {
    val keyed = docs.select(col("doc_id"),
        size(split(Dedup.normText(col("text")), " ")).cast("long")
          .as("n_toks"))
      .withColumn("skey", call_function("fnv1a64",
        concat(lit("shuf:"), col("doc_id").cast("string"))))
      .withColumn("shard_id", pmod(col("skey"), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("skey"), col("doc_id"))
    keyed.withColumn("position", row_number().over(w).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        pmod(sum(pmod(col("position") * (col("doc_id") + 1),
          lit(FpPrime))), lit(FpPrime)).as("order_fp"))
      .select(col("shard_id"), col("n_docs"), col("n_tokens"),
        col("order_fp"))
  }

  val shuffleShardsSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    val fnv = OracleFnv.ofText("'shuf:' || CAST(doc_id AS VARCHAR)")
    s"""WITH keyed AS (
         SELECT doc_id,
           CAST(len(string_split($norm, ' ')) AS BIGINT) AS n_toks,
           $fnv AS skey
         FROM documents),
       sharded AS (
         SELECT doc_id, n_toks, skey,
           ((skey % $NumShards) + $NumShards) % $NumShards AS shard_id
         FROM keyed),
       positioned AS (
         SELECT shard_id, doc_id, n_toks,
           CAST(row_number() OVER (PARTITION BY shard_id
             ORDER BY skey, doc_id) AS BIGINT) AS position
         FROM sharded)
       SELECT shard_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         CAST(SUM((position * (doc_id + 1)) % ${FpPrime}) AS BIGINT)
           % ${FpPrime} AS order_fp
       FROM positioned
       GROUP BY shard_id
       ORDER BY shard_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String)
      => DataFrame] = Map(
    "corpus_shuffle_shards" -> ((s, d) =>
      shuffleShards(Tables.documents(s, d)).orderBy(col("shard_id"))))

  def oracles: Map[String, String] = Map(
    "corpus_shuffle_shards" -> shuffleShardsSql)
}
