package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A TRAINED document-quality classifier — the fasttext-style "model
  * scores the corpus" stage of a pretraining data pipeline, where the
  * heuristic filters ([[TextAnalysis.textQuality]]) only bootstrap the
  * labels. Weak supervision: integer-exact predicates over the same
  * cheap features label each document high/low quality; a diagonal
  * linear discriminant (Gaussian classes, pooled per-feature variance,
  * equal priors) is FIT from sufficient statistics and then scores
  * every document. No iterative optimizer, no collect of data rows:
  *
  *  1. featurize   — one scan; five integer features per doc
  *                   (tokens, distinct tokens, stopword hits,
  *                   punctuation chars, chars).
  *  2. fit         — ONE aggregate row of class-conditional counts,
  *                   sums, and sums-of-squares (exact BIGINT sums, so
  *                   the model is independent of partitioning and
  *                   summation order — at larger scale these widen to
  *                   DECIMAL(38), same discipline as the OLS/RFM
  *                   gates).
  *  3. score       — the 1-row model broadcasts; scoring is a
  *                   scan-speed projection (w·x + b), codegen'd, no
  *                   shuffle on the corpus path.
  *
  * Determinism: means/variances/weights are doubles DERIVED from exact
  * integers with a fixed expression tree (only +, -, *, / — each
  * IEEE-correctly-rounded), so DuckDB reproduces the model and the
  * per-document scores bit-for-bit; the prior term is dropped (equal
  * priors) because ln() is not correctly-rounded across runtimes.
  *
  * At 100 TB: stage 2 is a map-side-combined aggregate to one row;
  * stage 3 is embarrassingly parallel. Training-set selection (here:
  * the whole corpus, weakly labeled) would subsample per source with
  * [[graft.functions.HashSample]] — the model stays one row either way.
  *
  * Reference analog: the quality-expectation filters in
  * /root/reference/src/pipelines/silver/order_items.sql gate rows on
  * hand predicates; this operator LEARNS the gate from those
  * predicates' labels, the standard LLM-corpus upgrade path.
  */
object QualityClassifier {

  private val stopwords = Seq("the", "and", "of", "is", "to")

  /** Per-doc integer features + the weak label (all integer-exact). */
  def featurize(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.select(
      col("doc_id"), col("source"),
      size(toks).cast("long").as("x1"),
      size(array_distinct(toks)).cast("long").as("x2"),
      TextAnalysis.langScore(toks, stopwords).as("x3"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("x4"),
      length(col("text")).cast("long").as("x5"))
      .withColumn("label",
        (col("x5") >= 100 && col("x5") <= 4000).cast("int"))
  }

  private val J = 1 to 5

  /** The fitted model as ONE row of weight/bias columns (w1..w5, b),
    * derived from exact class-conditional sufficient statistics.
    */
  def fit(feats: DataFrame): DataFrame = {
    def csum(lbl: Int, expr: Column): Column =
      sum(when(col("label") === lbl, expr).otherwise(lit(0L)))
    val aggs =
      Seq(sum(when(col("label") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("n0")) ++
      J.map(j => csum(1, col(s"x$j")).as(s"s1_$j")) ++
      J.map(j => csum(0, col(s"x$j")).as(s"s0_$j")) ++
      J.map(j => csum(1, col(s"x$j") * col(s"x$j")).as(s"q1_$j")) ++
      J.map(j => csum(0, col(s"x$j") * col(s"x$j")).as(s"q0_$j"))
    val s = feats.agg(aggs.head, aggs.tail: _*)
    val n1d = col("n1").cast("double")
    val n0d = col("n0").cast("double")
    val nd = n0d + n1d
    def mu(c: Int, j: Int): Column =
      col(s"s${c}_$j").cast("double") / (if (c == 1) n1d else n0d)
    // pooled diagonal variance, +0.5 smoothing so a constant feature
    // cannot produce an infinite weight — EXACT integer Q-sums first,
    // one cast, then the fixed double tree (mirrored in the oracle)
    def varj(j: Int): Column =
      ((col(s"q0_$j") + col(s"q1_$j")).cast("double")
        - n0d * mu(0, j) * mu(0, j) - n1d * mu(1, j) * mu(1, j)) / nd + lit(0.5)
    val withW = J.foldLeft(s) { (df, j) =>
      df.withColumn(s"w$j", (mu(1, j) - mu(0, j)) / varj(j))
    }
    val bTerms = J.map(j =>
      (mu(1, j) * mu(1, j) - mu(0, j) * mu(0, j)) / varj(j))
    withW.withColumn("b", lit(-0.5) * bTerms.reduce(_ + _))
      .select(Seq(col("b")) ++ J.map(j => col(s"w$j")): _*)
  }

  /** Every document scored by the broadcast 1-row model (source kept
    * so downstream aggregation needs no rejoin — one corpus scan).
    */
  def score(feats: DataFrame, model: DataFrame): DataFrame = {
    val dot = J.map(j => col(s"w$j") * col(s"x$j").cast("double"))
      .foldLeft(col("b"))(_ + _)
    feats.crossJoin(broadcast(model))
      .withColumn("lda_score", dot)
      .select(col("doc_id"), col("source"), col("label"),
        col("lda_score"), (col("lda_score") > 0.0).cast("int").as("predicted"))
  }

  def classify(docs: DataFrame): DataFrame = {
    val feats = featurize(docs)
    score(feats, fit(feats)).drop("source")
  }

  /** Corpus filtering by the trained model: per-source survival. */
  def filterStats(docs: DataFrame): DataFrame = {
    val feats = featurize(docs)
    score(feats, fit(feats))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("predicted").cast("long")).as("n_kept"))
      .withColumn("keep_rate",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
  }

  // ---- oracle --------------------------------------------------------------

  /** Shared CTEs: features+label → one sufficient-statistics row →
    * model → scores; the double expression trees match the Spark side
    * operation-for-operation (see determinism note above).
    */
  private val oracleCtes: String = {
    val csums = J.map(j =>
      s"""CAST(SUM(CASE WHEN label=1 THEN x$j ELSE 0 END) AS BIGINT) AS s1_$j,
          CAST(SUM(CASE WHEN label=0 THEN x$j ELSE 0 END) AS BIGINT) AS s0_$j,
          CAST(SUM(CASE WHEN label=1 THEN x$j*x$j ELSE 0 END) AS BIGINT) AS q1_$j,
          CAST(SUM(CASE WHEN label=0 THEN x$j*x$j ELSE 0 END) AS BIGINT) AS q0_$j""")
      .mkString(",\n          ")
    def mu(c: Int, j: Int) = s"CAST(s${c}_$j AS DOUBLE) / n${c}d"
    def varj(j: Int) =
      s"""(CAST(q0_$j + q1_$j AS DOUBLE)
          - n0d * (${mu(0, j)}) * (${mu(0, j)})
          - n1d * (${mu(1, j)}) * (${mu(1, j)})) / (n0d + n1d) + 0.5"""
    val ws = J.map(j =>
      s"((${mu(1, j)}) - (${mu(0, j)})) / (${varj(j)}) AS w$j").mkString(",\n          ")
    val bTerms = J.map(j =>
      s"((${mu(1, j)}) * (${mu(1, j)}) - (${mu(0, j)}) * (${mu(0, j)})) / (${varj(j)})")
      .mkString(" + ")
    s"""f AS (
         SELECT doc_id, source,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS x1,
           CAST(len(list_distinct(string_split_regex(trim(text), ' +'))) AS BIGINT) AS x2,
           CAST(len(list_intersect(string_split_regex(trim(text), ' +'),
             ['the','and','of','is','to'])) AS BIGINT) AS x3,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS x4,
           CAST(length(text) AS BIGINT) AS x5
         FROM documents),
       l AS (
         SELECT *, CAST(x5 >= 100 AND x5 <= 4000 AS INT) AS label
         FROM f),
       st AS (
         SELECT
           CAST(SUM(CASE WHEN label=1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN label=0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           $csums
         FROM l),
       sd AS (
         SELECT *, CAST(n1 AS DOUBLE) AS n1d, CAST(n0 AS DOUBLE) AS n0d
         FROM st),
       model AS (
         SELECT
           $ws,
           -0.5 * ($bTerms) AS b
         FROM sd),
       scored AS (
         SELECT doc_id, source, label,
           b + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE)
             + w3 * CAST(x3 AS DOUBLE) + w4 * CAST(x4 AS DOUBLE)
             + w5 * CAST(x5 AS DOUBLE) AS lda_score
         FROM l CROSS JOIN model)"""
  }

  val classifySql: String =
    s"""WITH $oracleCtes
       SELECT doc_id, label, lda_score,
         CAST(lda_score > 0.0 AS INT) AS predicted
       FROM scored
       ORDER BY doc_id"""

  val filterStatsSql: String =
    s"""WITH $oracleCtes
       SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(lda_score > 0.0 AS INT)) AS BIGINT) AS n_kept,
         CAST(CAST(SUM(CAST(lda_score > 0.0 AS INT)) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS keep_rate
       FROM scored
       GROUP BY 1 ORDER BY 1"""

  // ---- registry ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality_classifier" -> ((s, d) =>
      classify(Tables.documents(s, d))),
    "corpus_classifier_filter" -> ((s, d) =>
      filterStats(Tables.documents(s, d))))

  def oracles: Map[String, String] = Map(
    "text_quality_classifier" -> classifySql,
    "corpus_classifier_filter" -> filterStatsSql)
}
