package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temperature-flattened corpus mixing — the data-mixing knob LLM
  * training pipelines actually turn (sample source i with probability
  * ∝ n_i^α, α < 1, so dominant sources shrink relatively and small
  * sources survive). [[TextAnalysis.mixSample]] applies FIXED
  * per-source weights; this DERIVES them from the observed source
  * histogram at α = 1/2: per-doc keep rate √(n_min/n_i), so the kept
  * mass per source is ≈ √(n_min·n_i) ∝ √n_i — the flattened mixture —
  * and the smallest source is kept whole.
  *
  * Determinism contract (shared with mixSample): a doc's fate is a
  * pure hash threshold — fnv1a64("temp:"+doc_id) mod 10⁶ under an
  * integer parts-per-million rate — no RNG, nested under rate
  * increases, reproducible across runs and engines. The rate itself is
  * exact cross-engine: n_min/n_i is ONE IEEE division of exact counts,
  * √ is IEEE-exact, floor to ppm integer — no transcendental, no
  * float summation.
  *
  * Scale: the source histogram is a tiny aggregate (|sources| rows);
  * rates broadcast back onto the scan, so sampling is one filter pass
  * — the same cost class as a static-weight sample.
  */
object TempSample {

  private val Ppm = 1000000L

  /** Per-source mixing report: (source, n_docs, rate_ppm, n_kept). */
  def temperatureSample(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    graft.functions.Fingerprint.register(s)
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .withColumn("n_min", min(col("n_docs")).over(
        Window.partitionBy())) // |sources| rows — the tiny-table window
      .withColumn("rate_ppm",
        floor(lit(Ppm.toDouble) *
          sqrt(col("n_min").cast("double") / col("n_docs").cast("double")))
          .cast("long"))
      .select(col("source"), col("n_docs"), col("rate_ppm"))
    val kept = docs
      .join(broadcast(rates), Seq("source"))
      .filter(pmod(graft.functions.Fingerprint.fnv1a64(s,
          concat(lit("temp:"), col("doc_id").cast("string"))),
        lit(Ppm)) < col("rate_ppm"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("rate_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  val temperatureSampleSql: String =
    s"""WITH counts AS (
         SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       rates AS (
         SELECT source, n_docs,
           CAST(floor(${Ppm}.0 * sqrt(
             CAST((SELECT MIN(n_docs) FROM counts) AS DOUBLE)
               / CAST(n_docs AS DOUBLE))) AS BIGINT) AS rate_ppm
         FROM counts),
       kept AS (
         SELECT d.source, COUNT(*) AS n_kept
         FROM documents d JOIN rates r ON d.source = r.source
         WHERE ((${OracleFnv.ofText("'temp:' || CAST(doc_id AS VARCHAR)")}
                  % $Ppm) + $Ppm) % $Ppm < r.rate_ppm
         GROUP BY 1)
       SELECT r.source, r.n_docs, r.rate_ppm,
         COALESCE(k.n_kept, 0) AS n_kept
       FROM rates r LEFT JOIN kept k ON r.source = k.source
       ORDER BY 1"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_temperature_sample" -> ((s, d) =>
      temperatureSample(Tables.documents(s, d)).orderBy(col("source"))))

  def oracles: Map[String, String] = Map(
    "corpus_temperature_sample" -> temperatureSampleSql)
}
