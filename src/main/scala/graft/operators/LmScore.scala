package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-trained bigram-LM predictability scoring — the perplexity
  * -style quality signal of a training-data pipeline (filter the docs a
  * reference LM finds surprising), expressed so the gate can verify it
  * bit-exactly. A real pipeline scores with KenLM log-probs; `ln` is
  * not cross-engine exact (SURVEY §3.7), so graft scores with the
  * AVERAGE CONDITIONAL PROBABILITY instead: the per-bigram maximum
  * -likelihood estimate p(w2|w1) = c(w1,w2)/c(w1,·), scaled to integer
  * parts-per-million by the rarity-score discipline (N·10^6 div d —
  * pure BIGINT, no float reduction anywhere). Low pred_avg_ppm = the
  * corpus LM finds the doc surprising — same ranking role as high
  * perplexity, monotone in the same per-bigram quantities.
  *
  * Shape: one generator pass to per-doc bigram occurrences (aggregated
  * immediately to (doc, w1, w2, tf) — the cache point, far smaller than
  * the raw stream); the model is two further aggregates over it
  * (bigram counts, then predecessor totals — the second is vocab-sized
  * and folds out of the first, so the corpus is never re-read); scoring
  * joins occurrences back to the model on bigram key. The corpus text
  * itself never shuffles — only count tables do.
  */
object LmScore {

  def lmPredictability(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("ts"))
      .filter(size(col("ts")) >= 2)
    val big = base.select(col("doc_id"),
      explode(expr("transform(sequence(1, size(ts) - 1), " +
        "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val occ = big.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    graft.Caching.withCached(occ) {
      val c2 = occ.groupBy(col("w1"), col("w2"))
        .agg(sum(col("tf")).as("c2"))
      val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      occ.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .withColumn("p_ppm", expr("c2 * 1000000L div c1"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          sum(col("tf") * col("p_ppm")).as("pred_sum_ppm"))
        .withColumn("pred_avg_ppm", expr("pred_sum_ppm div n_bigrams"))
        .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
          col("pred_sum_ppm").cast("long").as("pred_sum_ppm"),
          col("pred_avg_ppm").cast("long").as("pred_avg_ppm"))
    }
  }

  val lmPredictabilitySql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""WITH ts AS (
         SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         FROM ts WHERE len(t) >= 2),
       big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM pos),
       occ AS (
         SELECT doc_id, w1, w2, COUNT(*) AS tf FROM big GROUP BY 1, 2, 3),
       c2 AS (
         SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM occ GROUP BY 1, 2),
       c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1)
       SELECT occ.doc_id,
         CAST(SUM(occ.tf) AS BIGINT) AS n_bigrams,
         CAST(SUM(occ.tf * ((c2.c2 * 1000000) // c1.c1)) AS BIGINT)
           AS pred_sum_ppm,
         CAST(SUM(occ.tf * ((c2.c2 * 1000000) // c1.c1)) // SUM(occ.tf)
           AS BIGINT) AS pred_avg_ppm
       FROM occ
       JOIN c2 ON occ.w1 = c2.w1 AND occ.w2 = c2.w2
       JOIN c1 ON occ.w1 = c1.w1
       GROUP BY occ.doc_id
       ORDER BY occ.doc_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_lm_predictability" -> ((s, d) =>
      lmPredictability(Tables.documents(s, d)).orderBy(col("doc_id"))))

  def oracles: Map[String, String] = Map(
    "text_lm_predictability" -> lmPredictabilitySql)
}
