package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-document duplicated-span detection — the exact-substring half
  * of the dedup story (the near-dup half is [[Dedup]]'s minhash/simhash
  * families). Published pretraining pipelines pair document-level
  * near-dup removal with span-level exact-substring removal ("a 50-token
  * span appearing verbatim in two crawls is boilerplate"); the suffix
  * -array formulation doesn't distribute, but its fixed-width k-gram
  * approximation does: a duplicated span of length ≥ K contains a
  * duplicated K-gram, so K-gram collisions across documents are exactly
  * the span-duplication witnesses.
  *
  * Shape: one generator pass turns each doc into its K-word rolling
  * grams, hashed to md5 INSIDE the generator (the shuffle carries
  * 32-byte digests, never the span text); one count-distinct-docs
  * aggregate finds grams seen in ≥ 2 documents; one join marks each
  * doc's duplicated grams. Nothing is quadratic: cost is O(total
  * tokens) rows through two shuffles, and the gram table is cached once
  * because both the witness aggregate and the per-doc join read it.
  *
  * Output is per-doc accounting (gram count, duplicated-gram count,
  * parts-per-million coverage as an integer-exact scaled ratio, per the
  * rarity-score discipline — float SUM across groups is banned by
  * SURVEY §3). A removal pass would filter on dup_ppm; the accounting
  * form is what the gate can verify bit-exactly.
  */
object SubstringDedup {

  /** Span width in words. 15 ≈ the testdata's sentence scale; the
    * production analog (50 BPE tokens) is the same plan with K changed.
    */
  val K = 15

  def substringDupStats(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("ts"))
      .filter(size(col("ts")) >= K)
    // hash inside the generator: the exploded rows are (doc_id, digest),
    // never the span text
    val grams = base.select(col("doc_id"),
      explode(expr(
        s"transform(sequence(1, size(ts) - ${K - 1}), " +
          s"i -> md5(array_join(slice(ts, i, $K), ' ')))")).as("h"))
    graft.Caching.withCached(grams) {
      val dup = grams.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"), lit(1).as("is_dup"))
      grams.join(dup, Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          coalesce(sum(col("is_dup")), lit(0L)).cast("long").as("n_dup_grams"))
        .withColumn("dup_ppm",
          expr("n_dup_grams * 1000000L div n_grams"))
    }
  }

  val substringDupStatsSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""WITH ts AS (
         SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(generate_series(1, len(t) - ${K - 1})) AS i
         FROM ts WHERE len(t) >= $K),
       g AS (
         SELECT doc_id, md5(array_to_string(t[i:i+${K - 1}], ' ')) AS h
         FROM pos),
       d AS (
         SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
       SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(d.h) AS BIGINT) AS n_dup_grams,
         (COUNT(d.h) * 1000000) // COUNT(*) AS dup_ppm
       FROM g LEFT JOIN d ON g.h = d.h
       GROUP BY g.doc_id
       ORDER BY g.doc_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_substring" -> ((s, d) =>
      substringDupStats(Tables.documents(s, d)).orderBy(col("doc_id"))))

  def oracles: Map[String, String] = Map(
    "dedup_substring" -> substringDupStatsSql)
}
