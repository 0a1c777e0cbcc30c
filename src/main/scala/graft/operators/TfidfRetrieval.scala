package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse TF-IDF retrieval over an inverted index — term-at-a-time
  * scoring, the lexical complement of the dense-vector ANN family
  * ([[Similarity]]/[[Ivf]]/[[Pq]]) and the multi-probe generalization
  * of [[Bm25]]'s fixed 3-term query: every probe document retrieves
  * its top-k most similar corpus documents by tf·idf cosine, without
  * ever materializing a doc × doc relation.
  *
  * Plan shape (the classic IR pipeline, all linear in postings):
  *  1. postings: (doc, token, tf) + token df — two aggs over the
  *     exploded token stream;
  *  2. weights w = tf · idf with the RATIONAL integer idf
  *     `(N·10³) div df` ([[TextAnalysis.rarityScore]]'s discipline —
  *     no transcendental log, exact BIGINT);
  *  3. probe postings ⋈ corpus postings on TOKEN (the inverted-index
  *     join: cost Σ_t df_probe(t)·df(t), never |probes|·|corpus|),
  *     partial products summed per (probe, doc) in DECIMAL(38,0) —
  *     exact, order-independent;
  *  4. cosine from exact integer dot and norms via the IEEE-safe ops
  *     only (÷, ×, sqrt — §3.7), rank window per probe.
  *
  * At 100 TB the probe set is the small side by construction (here 1
  * in [[ProbeMod]] documents); stopword-dominated postings are the
  * known hazard of exact term-at-a-time scoring — the production
  * escape (impact-ordered WAND / df-capped candidate generation, then
  * exact re-score) changes candidate generation only, the scoring
  * contract stays this one.
  *
  * Reference behavior anchor: the reference's search surface is
  * Databricks vector search over Delta (docs/ARCHITECTURE.md); this is
  * the engine-side lexical twin.
  */
object TfidfRetrieval {

  val K = 3
  val ProbeMod = 50
  val IdfScale = 1000L

  def tfidfTopk(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(Dedup.normText(col("text")), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val total = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    // exact integer weights; decimal copies feed the overflow-safe
    // products (BIGINT·BIGINT could wrap at adversarial tf·idf)
    val weights = tf.join(dfreq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("w", col("tf") * expr(s"n_docs * ${IdfScale}L div df"))
      .select(col("doc_id"), col("tok"), col("w"),
        col("w").cast(DecimalType(19, 0)).as("wd"))
    graft.Caching.withCached(weights) {
      val norms = weights.groupBy(col("doc_id"))
        .agg(sum(col("wd") * col("wd")).as("norm2")) // DECIMAL(38,0)
      val probes = weights.filter(pmod(col("doc_id"), lit(ProbeMod)) === 0)
        .select(col("doc_id").as("probe_id"), col("tok"),
          col("wd").as("wp"))
      // the inverted-index join: shuffle keyed by TOKEN
      val dots = probes
        .join(weights.select(col("doc_id"), col("tok"), col("wd")), "tok")
        .filter(col("doc_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("doc_id"))
        .agg(sum(col("wp") * col("wd")).as("dot"))
      val cos = dots
        .join(norms.select(col("doc_id").as("probe_id"),
          col("norm2").as("np")), Seq("probe_id"))
        .join(norms.select(col("doc_id"), col("norm2").as("nd")),
          Seq("doc_id"))
        .withColumn("cosine",
          col("dot").cast("double") /
            (sqrt(col("np").cast("double")) *
              sqrt(col("nd").cast("double"))))
      cos.withColumn("rank", row_number().over(
          Window.partitionBy(col("probe_id"))
            .orderBy(col("cosine").desc, col("doc_id"))))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("rank"), col("doc_id"), col("cosine"))
    }
  }

  /** Oracle: the same exact-integer pipeline; HUGEINT partial sums,
    * int→double conversions routed through VARCHAR (DuckDB's direct
    * wide-decimal→double cast double-rounds — §3.7).
    */
  val tfidfTopkSql: String = {
    def dbl(x: String) = s"CAST(CAST($x AS VARCHAR) AS DOUBLE)"
    s"""WITH toks AS (
         SELECT doc_id,
           unnest(string_split(
             regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
         FROM documents),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df
                 FROM toks GROUP BY 1),
       total AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
       weights AS (
         SELECT tf.doc_id, tf.tok,
           CAST(tf.tf * ((t.n_docs * $IdfScale) // dfreq.df) AS HUGEINT)
             AS w
         FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN total t),
       norms AS (
         SELECT doc_id, SUM(w * w) AS norm2 FROM weights GROUP BY 1),
       dots AS (
         SELECT p.doc_id AS probe_id, c.doc_id, SUM(p.w * c.w) AS dot
         FROM weights p JOIN weights c ON p.tok = c.tok
         WHERE p.doc_id % $ProbeMod = 0 AND c.doc_id <> p.doc_id
         GROUP BY 1, 2),
       cos AS (
         SELECT d.probe_id, d.doc_id,
           ${dbl("d.dot")} /
             (sqrt(${dbl("np.norm2")}) * sqrt(${dbl("nd.norm2")}))
             AS cosine
         FROM dots d
         JOIN norms np ON np.doc_id = d.probe_id
         JOIN norms nd ON nd.doc_id = d.doc_id)
       SELECT probe_id, rank, doc_id, cosine FROM (
         SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, doc_id) AS INT) AS rank
         FROM cos)
       WHERE rank <= $K
       ORDER BY probe_id, rank"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "docs_tfidf_topk" -> ((s, d) =>
      tfidfTopk(graft.Tables.documents(s, d))
        .orderBy(col("probe_id"), col("rank"))))

  def oracles: Map[String, String] = Map(
    "docs_tfidf_topk" -> tfidfTopkSql)
}
