package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-by-stage retention accounting for the cleaning funnel — the
  * lineage report every published pretraining pipeline ships ("we
  * started with X docs / Y tokens; language ID kept A%, length gates
  * kept B%, dedup kept C%"). Without it a 100 TB run cannot tell an
  * aggressive filter from a broken one.
  *
  * Stages are CUMULATIVE (each applies on top of the previous) and
  * their predicates are deliberately integer-exact — column compares
  * and count compares, no float thresholds — so the gate can verify
  * the funnel bit-for-bit:
  *   1 `all`              every document
  *   2 `lang_en`          lang = 'en'
  *   3 `len_ok`           100 ≤ n_chars ≤ 4000 (the textQuality gate)
  *   4 `low_repetition`   distinct tokens × 2 > total tokens
  *   5 `exact_canonical`  first doc_id per normalized-content digest,
  *                        chosen AMONG STAGE-4 SURVIVORS (a kept doc is
  *                        never represented by a filtered-out twin)
  *
  * Shape: one scan computes every flag plus the token count; the only
  * shuffle is the content-digest window for stage 5 (survivor-first
  * ordering inside each digest group makes "canonical among survivors"
  * a single row_number, not a second pass); the five stage rows unpivot
  * from one aggregated row via stack. O(docs) end to end.
  */
object CorpusFunnel {

  def funnel(docs: DataFrame): DataFrame = {
    val ts = split(Dedup.normText(col("text")), " ")
    val flagged = docs.select(
      col("doc_id"),
      col("lang"),
      col("n_chars"),
      size(ts).cast("long").as("n_toks"),
      size(array_distinct(ts)).cast("long").as("n_distinct"),
      md5(Dedup.normText(col("text"))).as("h"))
      .withColumn("f2", col("lang") === "en")
      .withColumn("f3", col("n_chars").between(100L, 4000L))
      .withColumn("f4", col("n_distinct") * 2 > col("n_toks"))
      .withColumn("sur4", col("f2") && col("f3") && col("f4"))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("sur4").desc, col("doc_id"))
    val staged = flagged
      .withColumn("f5", col("sur4") && row_number().over(w) === 1)
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    def tok(c: org.apache.spark.sql.Column) =
      sum(when(c, col("n_toks")).otherwise(0L))
    val agg = staged.agg(
      cnt(lit(true)).as("d1"), tok(lit(true)).as("t1"),
      cnt(col("f2")).as("d2"), tok(col("f2")).as("t2"),
      cnt(col("f2") && col("f3")).as("d3"),
      tok(col("f2") && col("f3")).as("t3"),
      cnt(col("sur4")).as("d4"), tok(col("sur4")).as("t4"),
      cnt(col("f5")).as("d5"), tok(col("f5")).as("t5"))
    val names = Seq("all", "lang_en", "len_ok", "low_repetition",
      "exact_canonical")
    val stackArgs = names.zipWithIndex.map { case (n, i) =>
      s"${i + 1}, '$n', d${i + 1}, t${i + 1}"
    }.mkString(", ")
    agg.selectExpr(
      s"stack(${names.size}, $stackArgs) AS (stage_id, stage, docs, tokens)")
      .select(col("stage_id").cast("int").as("stage_id"), col("stage"),
        col("docs").cast("long").as("docs"),
        col("tokens").cast("long").as("tokens"))
  }

  val funnelSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""WITH f AS (
         SELECT doc_id,
           len(string_split($norm, ' ')) AS n_toks,
           (lang = 'en') AS f2,
           (n_chars BETWEEN 100 AND 4000) AS f3,
           (len(list_distinct(string_split($norm, ' '))) * 2
             > len(string_split($norm, ' '))) AS f4,
           md5($norm) AS h
         FROM documents),
       s AS (
         SELECT *, (f2 AND f3 AND f4) AS sur4 FROM f),
       st AS (
         SELECT *,
           (sur4 AND row_number() OVER (PARTITION BY h
              ORDER BY sur4 DESC, doc_id) = 1) AS f5
         FROM s),
       a AS (
         SELECT
           COUNT(*) AS d1, SUM(n_toks) AS t1,
           SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS d2,
           SUM(CASE WHEN f2 THEN n_toks ELSE 0 END) AS t2,
           SUM(CASE WHEN f2 AND f3 THEN 1 ELSE 0 END) AS d3,
           SUM(CASE WHEN f2 AND f3 THEN n_toks ELSE 0 END) AS t3,
           SUM(CASE WHEN sur4 THEN 1 ELSE 0 END) AS d4,
           SUM(CASE WHEN sur4 THEN n_toks ELSE 0 END) AS t4,
           SUM(CASE WHEN f5 THEN 1 ELSE 0 END) AS d5,
           SUM(CASE WHEN f5 THEN n_toks ELSE 0 END) AS t5
         FROM st)
       SELECT CAST(1 AS INT) AS stage_id, 'all' AS stage,
         CAST(d1 AS BIGINT) AS docs, CAST(t1 AS BIGINT) AS tokens FROM a
       UNION ALL SELECT 2, 'lang_en', CAST(d2 AS BIGINT), CAST(t2 AS BIGINT) FROM a
       UNION ALL SELECT 3, 'len_ok', CAST(d3 AS BIGINT), CAST(t3 AS BIGINT) FROM a
       UNION ALL SELECT 4, 'low_repetition', CAST(d4 AS BIGINT), CAST(t4 AS BIGINT) FROM a
       UNION ALL SELECT 5, 'exact_canonical', CAST(d5 AS BIGINT), CAST(t5 AS BIGINT) FROM a
       ORDER BY stage_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_funnel" -> ((s, d) =>
      funnel(Tables.documents(s, d)).orderBy(col("stage_id"))))

  def oracles: Map[String, String] = Map(
    "corpus_funnel" -> funnelSql)
}
