package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benchmark decontamination for LLM training corpora: detect eval-set
  * text leaking into the training set via shared word n-grams — the
  * standard check run before training (cf. GPT-2/GPT-3 appendix-style
  * 8-gram overlap, here 3-grams against the synthetic corpus).
  *
  * The eval set is the deterministic `test` slice of
  * [[TextAnalysis.corpusSplit]], so the whole pipeline is reproducible
  * end-to-end and DuckDB-oracle-verified.
  *
  * Scale posture (100 TB): the eval side is a few thousand docs — its
  * exploded n-gram set broadcasts; the train side streams through the
  * join at scan speed with no shuffle of the corpus itself (the
  * gram-key shuffle moves only (gram, id) pairs, and a
  * document-frequency pre-filter caps hot-gram fan-out; here df ≤
  * `maxGramDf` train docs). Nothing is O(n²): candidate pairs exist
  * only where an n-gram actually collides.
  */
object Decontaminate {

  /** (test_id, train_id, overlap, containment) for eval docs whose
    * distinct n-grams appear in a train doc with containment ≥
    * `minContainment` (containment = |shared| / |test grams| — the
    * right asymmetry: a short eval doc fully inside a long train doc
    * is contamination even though Jaccard is low).
    *
    * `maxGramDf` drops n-grams present in more than that many train
    * docs before pairing — boilerplate grams (headers, licenses)
    * otherwise create quadratic candidate blowup; dropped grams can
    * only lower containment, so this trades bounded recall for a
    * linear candidate set, the same knob production decontamination
    * uses.
    */
  def contamination(docs: DataFrame, n: Int = 3,
      minContainment: Double = 0.5, maxGramDf: Int = 1000): DataFrame = {
    val split = TextAnalysis.corpusSplit(docs).select(col("doc_id"), col("split"))
    // hashed n-grams: the overlap join keys on a long, not a ~20-char
    // string — cheaper shuffle and probe; the oracle re-derives the
    // identical hash so counts stay exact (collisions merge identically
    // in both engines)
    val grams = docs.join(split, "doc_id").select(
      col("doc_id"), col("split"),
      Dedup.hashedNgrams(docs.sparkSession,
        Dedup.normText(col("text")), n).as("grams"))
    graft.Caching.withCached(grams) {
      val te = grams.filter(col("split") === "test").select(
        col("doc_id").as("test_id"), explode(col("grams")).as("gram"),
        size(col("grams")).as("n_test"))
      val tr = grams.filter(col("split") === "train").select(
        col("doc_id").as("train_id"), explode(col("grams")).as("gram"))
      val rare = tr.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxGramDf).select("gram")
      // eval sets are tiny relative to the corpus: broadcast the
      // exploded test grams so the train side never shuffles its grams
      broadcast(te.join(rare, "gram"))
        .join(tr, "gram")
        .groupBy(col("test_id"), col("train_id"))
        .agg(count(lit(1)).as("overlap"), first(col("n_test")).as("n_test"))
        .withColumn("containment",
          col("overlap").cast("double") / col("n_test").cast("double"))
        .filter(col("containment") >= minContainment)
        .select(col("test_id"), col("train_id"), col("overlap"),
          col("containment"))
    }
  }

  /** Oracle with the registered defaults (n=3, containment ≥ 0.5,
    * maxGramDf=1000); the split comes from [[TextAnalysis.splitCtesSql]]
    * — the same definition the `corpus_split` oracle uses, so the two
    * cannot drift.
    */
  val contaminationSql: String = {
    s"""WITH ${TextAnalysis.splitCtesSql},
       g AS (
         SELECT doc_id, split,
           list_distinct(list_transform(
             list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(toks[i:i+2], ' '))),
             s -> ${OracleFnv.ofText("s")})) AS grams
         FROM split_docs),
       te AS (
         SELECT doc_id AS test_id, unnest(grams) AS gram,
           len(grams) AS n_test
         FROM g WHERE split = 'test'),
       tr AS (
         SELECT doc_id AS train_id, unnest(grams) AS gram
         FROM g WHERE split = 'train'),
       rare AS (
         SELECT gram FROM tr GROUP BY gram HAVING COUNT(*) <= 1000),
       ov AS (
         SELECT test_id, train_id,
           CAST(COUNT(*) AS BIGINT) AS overlap,
           ANY_VALUE(n_test) AS n_test
         FROM te JOIN rare USING (gram) JOIN tr USING (gram)
         GROUP BY test_id, train_id)
       SELECT test_id, train_id, overlap,
         CAST(overlap AS DOUBLE) / CAST(n_test AS DOUBLE) AS containment
       FROM ov
       WHERE CAST(overlap AS DOUBLE) / CAST(n_test AS DOUBLE) >= 0.5
       ORDER BY test_id, train_id"""
  }

  // =========================================================================
  // Embedding-level (semantic) decontamination
  // =========================================================================
  /** The n-gram check's semantic complement: eval-set items whose
    * MEANING leaks into training (paraphrases, translations, light
    * rewrites) share no n-grams but sit close in embedding space. For
    * each eval vector (vec_id % 20 == 0): how many train vectors land
    * within `threshold` cosine, and the closest such match.
    *
    * Scale posture: candidates come from shared sign-LSH buckets (the
    * [[Dedup.embeddingLshPairs]] family — key-equality joins, linear in
    * corpus × bucket occupancy, never eval × train), verified by exact
    * fold-deterministic cosine. Bucket recall for this family is
    * floored in-gate by `dedup_recall_bounds`.
    */
  def embeddingContamination(emb: DataFrame, threshold: Double = 0.35,
      planes: Int = 3, tables: Int = 8): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // repartition: the bucket self-join's output blow-up must not land
    // on the scan's partition count (single-file corpus = one task)
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .repartition(col("vec_id"))
    val bucketed = base.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          Similarity.lshBucket(col("v"), planes, t, dim).as("bucket"))): _*))
        .as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    graft.Caching.withCached(base, bucketed) {
      val evalB = bucketed.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("eval_id"), col("tbl"), col("bucket"))
      val trainB = bucketed.filter(col("vec_id") % 20 =!= 0)
        .select(col("vec_id").as("train_id"), col("tbl"), col("bucket"))
      val cands = trainB.join(evalB, Seq("tbl", "bucket"))
        .select(col("eval_id"), col("train_id")).distinct()
      val scored = cands
        .join(base.select(col("vec_id").as("eval_id"), col("v").as("ev"),
          col("nrm").as("en")), Seq("eval_id"))
        .join(base.select(col("vec_id").as("train_id"), col("v").as("tv"),
          col("nrm").as("tn")), Seq("train_id"))
        .select(col("eval_id"),
          Similarity.cosinePre(Similarity.dot(col("ev"), col("tv")),
            col("en"), col("tn")).as("cosine"))
        .filter(col("cosine") >= threshold)
      val agg = scored.groupBy(col("eval_id")).agg(
        count(lit(1)).as("n_matches"), max(col("cosine")).as("max_cosine"))
      base.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("eval_id"))
        .join(agg, Seq("eval_id"), "left")
        .select(col("eval_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          col("max_cosine"),
          col("max_cosine").isNotNull.as("is_contaminated"))
    }
  }

  /** Oracle for `decontaminate_embedding` (threshold=0.35, the 3×8
    * sign-LSH family) — bucket CTEs shared with the other LSH oracles.
    */
  val embeddingContaminationSql: String =
    s"""WITH ${Similarity.signBucketCtesSql(3, 8)},
       cands AS (
         SELECT DISTINCT e.vec_id AS eval_id, t.vec_id AS train_id
         FROM buckets e
         JOIN buckets t ON e.tbl = t.tbl AND e.bucket = t.bucket
         WHERE e.vec_id % 20 = 0 AND t.vec_id % 20 <> 0),
       scored AS (
         SELECT c.eval_id,
           list_dot_product(ev.v, tv.v)
             / (sqrt(list_dot_product(ev.v, ev.v)) * sqrt(list_dot_product(tv.v, tv.v)))
             AS cosine
         FROM cands c
         JOIN vec ev ON ev.vec_id = c.eval_id
         JOIN vec tv ON tv.vec_id = c.train_id),
       agg AS (
         SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
           MAX(cosine) AS max_cosine
         FROM scored WHERE cosine >= 0.35 GROUP BY eval_id)
       SELECT e.vec_id AS eval_id,
         COALESCE(a.n_matches, 0) AS n_matches,
         a.max_cosine,
         a.max_cosine IS NOT NULL AS is_contaminated
       FROM vec e
       LEFT JOIN agg a ON a.eval_id = e.vec_id
       WHERE e.vec_id % 20 = 0
       ORDER BY eval_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate_ngram" -> ((s, d) =>
      contamination(Tables.documents(s, d))
        .orderBy(col("test_id"), col("train_id"))),
    "decontaminate_embedding" -> ((s, d) =>
      embeddingContamination(Tables.embeddings(s, d))
        .orderBy(col("eval_id"))))

  def oracles: Map[String, String] = Map(
    "decontaminate_ngram" -> contaminationSql,
    "decontaminate_embedding" -> embeddingContaminationSql)
}
