package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval compositions a production RAG / training-data stack runs
  * on top of the index primitives the board already has: hybrid
  * lexical+vector fusion, metadata-filtered vector search, and
  * Matryoshka (truncated-dimension) retrieval with measured recall.
  *
  * These are deliberate COMPOSITIONS — each reuses the existing
  * machinery ([[Similarity.bruteForceTopK]] for the exact vector
  * ranks, [[Dedup.normText]] for the shared tokenizer) so the hybrid
  * semantics are pinned against the same primitives the solo gates
  * verify. Reference analogue: the lakehouse serves retrieval from its
  * gold layer (ref README.md "analytics-ready"); hybrid/filtered/MRL
  * search is what that surface needs at LLM-corpus scale.
  */
object Retrieval {

  /** Candidate depth per modality feeding the fusion. */
  val FuseDepth = 50

  /** Fused results kept per probe. */
  val FuseK = 10

  /** RRF damping constant (Cormack et al. 2009's k=60). */
  val RrfK = 60.0

  private def asDouble(emb: Column): Column =
    transform(emb, x => x.cast("double"))

  /** Word n-gram order for the lexical shingles. Whole-word Jaccard
    * degenerates on this corpus (31-token vocabulary, median df 78% of
    * docs — the df cap would empty it); 3-gram shingles give a 16k+
    * vocabulary with max df ≪ N/4, the same unit the near-dup family
    * blocks on.
    */
  val ShingleN = 3

  /** Lexical ranking half of the hybrid: per-probe shingle-set Jaccard
    * ([[ShingleN]]-gram FNV hashes — [[Dedup.hashedNgrams]], the
    * near-dup family's unit: set math over longs, not strings) over
    * the df-capped shingle vocabulary (df·4 ≤ N — [[Bm25]]'s stopword
    * cap; on shingles it is the guard against pathological hot
    * shingles, and it is what bounds the inverted-index fan-out:
    * candidate generation scans only the probes' posting lists, never
    * the corpus×corpus pair space). Jaccard is integer ∩ and ∪ counts
    * with ONE IEEE division (§3.7-safe), ties broken by doc_id.
    */
  private[graft] def lexicalRanks(docs: DataFrame, depth: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(Dedup.hashedNgrams(docs.sparkSession,
        Dedup.normText(col("text")), ShingleN)).as("tok"))
    graft.Caching.withCached(toks) {
      val nDocs = docs.count()
      val keptVocab = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") * 4 <= lit(nDocs))
        .select(col("tok"))
      val kept = toks.join(keptVocab, Seq("tok"))
      val sizes = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("sz"))
      val probeToks = kept.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("probe_id"), col("tok"))
      val inter = probeToks
        .join(kept.select(col("doc_id").as("cand_id"), col("tok")),
          Seq("tok"))
        .filter(col("cand_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("cand_id"))
        .agg(count(lit(1)).as("inter"))
      val jac = inter
        .join(sizes.select(col("doc_id").as("probe_id"),
          col("sz").as("psz")), Seq("probe_id"))
        .join(sizes.select(col("doc_id").as("cand_id"),
          col("sz").as("csz")), Seq("cand_id"))
        .withColumn("jac", col("inter").cast("double") /
          (col("psz") + col("csz") - col("inter")).cast("double"))
      val lw = Window.partitionBy(col("probe_id"))
        .orderBy(col("jac").desc, col("cand_id"))
      jac.withColumn("lex_rank", row_number().over(lw).cast("int"))
        .filter(col("lex_rank") <= depth)
        .select(col("probe_id"), col("cand_id"), col("lex_rank"))
    }
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion: each probe document
    * is ranked lexically (token-set Jaccard over the df-capped
    * vocabulary) and semantically (exact cosine over its embedding —
    * [[Similarity.bruteForceTopK]], the same ranks the ANN family
    * approximates), depth-C lists fused as
    * `Σ 1/(60 + rank)` with an absent rank contributing 0.
    *
    * Determinism: ranks are ints; each reciprocal is ONE IEEE division
    * and the fusion is a fixed two-slot add (lex then vec — never a
    * float SUM across a group, §3.1). Ties broken by doc_id.
    *
    * Scale posture: lexical candidates come from posting-list joins
    * bounded by the df cap; vector candidates from the ANN ladder
    * (exact here so the oracle can mirror it — swap
    * [[Ivf.ivfTopK]] in production for routed cost); the fusion
    * itself is a key-equality full-outer join on (probe, cand) + a
    * per-probe window over ≤ 2·C rows. Nothing corpus×corpus.
    */
  /** The RRF fusion itself, shared by the exact and routed gates so
    * the fusion rule has one definition: depth-C rank lists fused as
    * `Σ 1/(60 + rank)`, absent rank contributing 0, ties to doc_id.
    */
  private def fuseRrf(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val fused = lex.join(vec, Seq("probe_id", "cand_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank").cast("double")),
          lit(0.0)))
    val fw = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf_score").desc, col("cand_id"))
    fused.withColumn("rank", row_number().over(fw).cast("int"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id").as("doc_id"),
        col("rrf_score"), col("lex_rank"), col("vec_rank"))
  }

  def hybridRrf(docs: DataFrame, emb: DataFrame,
      depth: Int = FuseDepth, k: Int = FuseK): DataFrame = {
    val lex = lexicalRanks(docs, depth)
    val vec = Similarity.bruteForceTopK(emb, depth)
      .select(col("probe_id"), col("neighbor_id").as("cand_id"),
        col("rank").as("vec_rank"))
    fuseRrf(lex, vec, k)
  }

  /** Agreement floor of the routed fusion vs the exact fusion,
    * [[hybridRrfRoutedGate]]'s in-gate honesty check (the
    * `emb_knn_classifier_ann` discipline). Pinned under the min
    * measured across sf0.001/0.01/0.1 with margin (r14 measured
    * 0.700/0.640/0.906); measured values print in-gate.
    */
  val RoutedAgreementFloor = 0.55

  /** THE PRODUCTION COMPOSITION of hybrid retrieval (r13 verdict task
    * 5): [[hybridRrf]]'s vector leg is exact-by-license so its oracle
    * can re-derive it; this gate swaps the leg for the ROUTED
    * candidates — [[Ivf.ivfTopK]] at fusion depth, each probe scoring
    * only its nprobe inverted lists, never the corpus — and fuses with
    * the identical [[fuseRrf]] rule. The lexical leg (df-capped
    * posting lists) is shared, computed ONCE for both fusions.
    *
    * Honesty: the gate computes the exact fusion in the same run and
    * asserts top-[[FuseK]] (probe, doc) agreement ≥
    * [[RoutedAgreementFloor]] — a routed candidate collapse cannot
    * ship as a plausible-but-degraded ranking. The emitted rows are
    * the routed fusion itself, deterministic end to end (fold-exact
    * k-means, id-tiebroken ranks, one IEEE division per reciprocal),
    * so the DuckDB oracle mirrors the routed rule exactly —
    * hash-equality, not just the floor.
    */
  def hybridRrfRouted(docs: DataFrame, emb: DataFrame,
      depth: Int = FuseDepth, k: Int = FuseK): DataFrame = {
    val lex = lexicalRanks(docs, depth)
    val vec = Ivf.ivfTopK(emb, depth)
      .select(col("probe_id"), col("neighbor_id").as("cand_id"),
        col("rank").as("vec_rank"))
    fuseRrf(lex, vec, k)
  }

  /** [[hybridRrfRouted]] plus the in-gate agreement assertion; the
    * shared lexical leg runs once.
    */
  def hybridRrfRoutedGate(docs: DataFrame, emb: DataFrame): DataFrame = {
    val lex = lexicalRanks(docs, FuseDepth)
    graft.Caching.withCached(lex) {
      val routed = fuseRrf(lex,
        Ivf.ivfTopK(emb, FuseDepth)
          .select(col("probe_id"), col("neighbor_id").as("cand_id"),
            col("rank").as("vec_rank")), FuseK)
      val exact = fuseRrf(lex,
        Similarity.bruteForceTopK(emb, FuseDepth)
          .select(col("probe_id"), col("neighbor_id").as("cand_id"),
            col("rank").as("vec_rank")), FuseK)
      val a = routed.select(col("probe_id"), col("doc_id"))
      val b = exact.select(col("probe_id"), col("doc_id"))
      val total = b.count()
      val hits = a.intersect(b).count()
      val agreement = if (total == 0) 1.0 else hits.toDouble / total
      System.err.println(f"[ann_hybrid_rrf_routed] top-$FuseK agreement " +
        f"vs exact fusion: $agreement%.3f ($hits/$total) " +
        f"floor=$RoutedAgreementFloor")
      require(agreement >= RoutedAgreementFloor,
        f"routed fusion agreement $agreement%.3f under floor " +
          f"$RoutedAgreementFloor")
      routed
    }
  }

  /** Lexical-leg oracle CTEs (`ts` → `lex`), shared by the exact and
    * routed fusion oracles so the lexical rule has one definition.
    */
  private val lexCtesSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    // trigram mirror of Dedup.hashedNgrams: 1-based ts[i]..ts[i+2]
    // windows (range upper bound len-1 exclusive == Spark's
    // sequence(1, size-2) inclusive), FNV-hashed, DISTINCT over hashes
    s"""ts AS (
         SELECT doc_id, string_split($norm, ' ') AS ts FROM documents),
       toks AS (
         SELECT DISTINCT doc_id,
           ${OracleFnv.ofText("gs")} AS tok
         FROM (
           SELECT doc_id,
             unnest(list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gs
           FROM ts)),
       n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       kept AS (
         SELECT t.doc_id, t.tok FROM toks t
         JOIN (SELECT tok FROM toks GROUP BY tok
               HAVING COUNT(*) * 4 <= (SELECT n FROM n)) v USING (tok)),
       sizes AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
         FROM kept GROUP BY doc_id),
       inter AS (
         SELECT p.doc_id AS probe_id, c.doc_id AS cand_id,
           CAST(COUNT(*) AS BIGINT) AS inter
         FROM kept p JOIN kept c USING (tok)
         WHERE p.doc_id % 50 = 0 AND c.doc_id <> p.doc_id
         GROUP BY 1, 2),
       lex AS (
         SELECT probe_id, cand_id,
           CAST(row_number() OVER (PARTITION BY probe_id
             ORDER BY jac DESC, cand_id) AS INT) AS lex_rank
         FROM (
           SELECT i.probe_id, i.cand_id,
             CAST(i.inter AS DOUBLE)
               / CAST(ps.sz + cs.sz - i.inter AS DOUBLE) AS jac
           FROM inter i
           JOIN sizes ps ON ps.doc_id = i.probe_id
           JOIN sizes cs ON cs.doc_id = i.cand_id)
         QUALIFY lex_rank <= $FuseDepth)"""
  }

  /** Fusion-tail oracle (the `fused` CTE + final ranking), shared by
    * both hybrid oracles; expects `lex` and `vecranked` CTEs.
    */
  private val rrfFusionTailSql: String =
    s"""fused AS (
         SELECT COALESCE(l.probe_id, v.probe_id) AS probe_id,
           COALESCE(l.cand_id, v.cand_id) AS cand_id,
           l.lex_rank, v.vec_rank,
           COALESCE(1.0 / ($RrfK + CAST(l.lex_rank AS DOUBLE)), 0.0)
             + COALESCE(1.0 / ($RrfK + CAST(v.vec_rank AS DOUBLE)), 0.0)
             AS rrf_score
         FROM lex l FULL OUTER JOIN vecranked v
           ON l.probe_id = v.probe_id AND l.cand_id = v.cand_id)
       SELECT probe_id,
         CAST(row_number() OVER (PARTITION BY probe_id
           ORDER BY rrf_score DESC, cand_id) AS INT) AS rank,
         cand_id AS doc_id, rrf_score, lex_rank, vec_rank
       FROM fused
       QUALIFY rank <= $FuseK
       ORDER BY probe_id, rank"""

  val hybridRrfSql: String =
    s"""WITH $lexCtesSql,
       base AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       probes AS (
         SELECT vec_id AS probe_id, v AS pv FROM base WHERE vec_id % 50 = 0),
       vecranked AS (
         SELECT probe_id, cand_id,
           CAST(row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine DESC, cand_id) AS INT) AS vec_rank
         FROM (
           SELECT p.probe_id, b.vec_id AS cand_id,
             list_dot_product(p.pv, b.v)
               / (sqrt(list_dot_product(p.pv, p.pv))
                  * sqrt(list_dot_product(b.v, b.v))) AS cosine
           FROM base b JOIN probes p ON b.vec_id <> p.probe_id)
         QUALIFY vec_rank <= $FuseDepth),
       $rrfFusionTailSql"""

  /** Routed-fusion oracle: the IVF candidate stage ([[Ivf]]'s k-means
    * + inverted-list CTEs with the registered defaults, shared via
    * [[Ivf.kmeansCtesSql]] so the training rule cannot drift) ranked
    * to fusion depth, then the identical fusion tail.
    */
  val hybridRrfRoutedSql: String = {
    val nlist = 16; val nprobe = 4; val iters = 5
    s"""WITH $lexCtesSql,
       vec AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       ${Ivf.kmeansCtesSql("km", "vec", nlist, iters)},
       assignf AS (
         SELECT vec_id, cluster FROM (
           SELECT v.vec_id, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY ${Ivf.sqdistSql("v.v", "c.c")}, c.cluster) AS rn
           FROM vec v CROSS JOIN km_cent$iters c)
         WHERE rn = 1),
       probe_lists AS (
         SELECT probe_id, cluster FROM (
           SELECT p.vec_id AS probe_id, c.cluster,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ${Ivf.sqdistSql("p.v", "c.c")}, c.cluster) AS rn
           FROM vec p CROSS JOIN km_cent$iters c
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $nprobe),
       scoredivf AS (
         SELECT pl.probe_id, a.vec_id AS cand_id,
           list_dot_product(pv.v, nv.v)
             / (sqrt(list_dot_product(pv.v, pv.v))
                * sqrt(list_dot_product(nv.v, nv.v))) AS cosine
         FROM probe_lists pl
         JOIN assignf a USING (cluster)
         JOIN vec pv ON pv.vec_id = pl.probe_id
         JOIN vec nv ON nv.vec_id = a.vec_id
         WHERE a.vec_id != pl.probe_id),
       vecranked AS (
         SELECT probe_id, cand_id,
           CAST(row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine DESC, cand_id) AS INT) AS vec_rank
         FROM scoredivf
         QUALIFY vec_rank <= $FuseDepth),
       $rrfFusionTailSql"""
  }

  /** Metadata-filtered vector search: exact cosine top-k restricted to
    * candidates whose document metadata passes a predicate (here
    * lang = 'en'). The PRE-FILTER strategy: the predicate is pushed
    * into the metadata scan (PushedFilters on `lang`, ReadSchema
    * doc_id+lang only) and the surviving id set key-joins the vector
    * table BEFORE any distance is computed — at this selectivity
    * (~1/5 of the corpus) that is the right side of the crossover
    * (post-filtering an ANN result at 1/5 selectivity would need
    * 5k·overfetch to fill k). Co-partitioned on the id key, the
    * join is shuffle-free when metadata and vectors are bucketed
    * together (the Bucketed layout this repo's lake writes).
    */
  def filteredTopK(docs: DataFrame, emb: DataFrame,
      lang: String = "en", k: Int = 5): DataFrame = {
    val allowed = docs.filter(col("lang") === lang)
      .select(col("doc_id").as("vec_id"))
    val base = emb.select(col("vec_id"),
        asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .repartition(col("vec_id"))
    val probes = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pnrm"))
    val cands = base.join(allowed, Seq("vec_id"))
    val scored = cands.join(broadcast(probes),
        col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
          col("pnrm"), col("nrm")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        col("cosine"))
  }

  val filteredTopKSql: String =
    """WITH allowed AS (
         SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
       base AS (
         SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
         FROM embeddings e),
       probes AS (
         SELECT vec_id AS probe_id, v AS pv FROM base WHERE vec_id % 50 = 0),
       scored AS (
         SELECT p.probe_id, b.vec_id AS neighbor_id,
           list_dot_product(p.pv, b.v)
             / (sqrt(list_dot_product(p.pv, p.pv))
                * sqrt(list_dot_product(b.v, b.v))) AS cosine
         FROM base b
         JOIN allowed a ON a.vec_id = b.vec_id
         JOIN probes p ON b.vec_id <> p.probe_id),
       ranked AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
         FROM scored)
       SELECT probe_id, rank, neighbor_id, cosine
       FROM ranked WHERE rank <= 5
       ORDER BY probe_id, rank"""

  /** Matryoshka retrieval: rank by cosine over only the FIRST
    * `dPrime` dimensions (an MRL-style truncation — prefix dims carry
    * the coarse structure, so a d/4 prefix buys a 4× smaller scan and
    * index), then measure recall@k per probe against the full-dim
    * exact ranks. Unlike the LSH/IVF recall gates (whose candidate
    * sets aren't SQL-expressible, so only the FLOOR is oracled), the
    * truncated ranking is plain arithmetic — the oracle re-derives
    * both lists and the per-probe recall EXACTLY.
    *
    * Determinism: overlap is an integer join count; recall is one
    * IEEE division by the constant k.
    */
  def matryoshkaRecall(emb: DataFrame, dPrime: Int = 16, k: Int = 5)
      : DataFrame = {
    val base = emb.select(col("vec_id"),
        asDouble(col("embedding")).as("v"))
      .withColumn("t", slice(col("v"), 1, dPrime))
      .repartition(col("vec_id"))
    def topK(vcol: String): DataFrame = {
      val probes = base.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("probe_id"), col(vcol).as("pv"))
      val scored = base.join(broadcast(probes),
          col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          Similarity.cosine(col("pv"), col(vcol)).as("cosine"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("probe_id"), col("neighbor_id"))
    }
    val full = topK("v")
    val trunc = topK("t").withColumn("hit", lit(1L))
    full.join(trunc, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_match"))
      .withColumn("recall",
        col("n_match").cast("double") / lit(k.toDouble))
      .select(col("probe_id"), col("n_match"), col("recall"))
  }

  val matryoshkaRecallSql: String =
    """WITH base AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           CAST(embedding AS DOUBLE[])[1:16] AS t
         FROM embeddings),
       probes AS (
         SELECT vec_id AS probe_id, v AS pv, t AS pt
         FROM base WHERE vec_id % 50 = 0),
       fullranked AS (
         SELECT probe_id, neighbor_id FROM (
           SELECT p.probe_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY p.probe_id ORDER BY
               list_dot_product(p.pv, b.v)
                 / (sqrt(list_dot_product(p.pv, p.pv))
                    * sqrt(list_dot_product(b.v, b.v))) DESC,
               b.vec_id) AS rank
           FROM base b JOIN probes p ON b.vec_id <> p.probe_id)
         WHERE rank <= 5),
       truncranked AS (
         SELECT probe_id, neighbor_id FROM (
           SELECT p.probe_id, b.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY p.probe_id ORDER BY
               list_dot_product(p.pt, b.t)
                 / (sqrt(list_dot_product(p.pt, p.pt))
                    * sqrt(list_dot_product(b.t, b.t))) DESC,
               b.vec_id) AS rank
           FROM base b JOIN probes p ON b.vec_id <> p.probe_id)
         WHERE rank <= 5)
       SELECT f.probe_id,
         CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_match,
         CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           AS DOUBLE) / 5.0 AS recall
       FROM fullranked f
       LEFT JOIN truncranked t
         ON t.probe_id = f.probe_id AND t.neighbor_id = f.neighbor_id
       GROUP BY f.probe_id
       ORDER BY f.probe_id"""

  /** Ranked candidates considered for context assembly. */
  val PackCandidates = 20

  /** Token budget one assembled context may spend. */
  val PackBudget = 128

  /** RAG context assembly under a token budget — the serving step
    * between retrieval and the model: the top-[[PackCandidates]]
    * retrieved documents per probe are packed IN RANK ORDER while the
    * running token total stays within [[PackBudget]] (prefix rule:
    * stop at the first overflow — skipping past it would reorder what
    * the model sees vs what the ranker chose). Emits the packed
    * manifest (probe_id, position, doc_id, n_toks, cum_toks) — all
    * integer arithmetic over the exact ranks, one running-sum window
    * per probe.
    *
    * Scale: candidates are probe-bounded (|probes|·C rows) before the
    * token join, so the pack itself is metadata-scale at any corpus
    * size; the ranker is the exact baseline here (swap the IVF/graph
    * path in production).
    */
  def contextPack(docs: DataFrame, emb: DataFrame,
      c: Int = PackCandidates, budget: Int = PackBudget): DataFrame = {
    val ranked = Similarity.bruteForceTopK(emb, c)
      .select(col("probe_id"), col("rank"), col("neighbor_id").as("doc_id"))
    val toks = docs.select(col("doc_id"),
      size(split(Dedup.normText(col("text")), " ")).cast("long")
        .as("n_toks"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(toks, Seq("doc_id"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .filter(col("cum_toks") <= budget)
      .select(col("probe_id"), col("rank").as("position"), col("doc_id"),
        col("n_toks"), col("cum_toks"))
  }

  val contextPackSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""WITH base AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       probes AS (
         SELECT vec_id AS probe_id, v AS pv FROM base WHERE vec_id % 50 = 0),
       ranked AS (
         SELECT probe_id, neighbor_id AS doc_id, rank FROM (
           SELECT p.probe_id, b.vec_id AS neighbor_id,
             CAST(row_number() OVER (PARTITION BY p.probe_id ORDER BY
               list_dot_product(p.pv, b.v)
                 / (sqrt(list_dot_product(p.pv, p.pv))
                    * sqrt(list_dot_product(b.v, b.v))) DESC,
               b.vec_id) AS INT) AS rank
           FROM base b JOIN probes p ON b.vec_id <> p.probe_id)
         WHERE rank <= $PackCandidates),
       toks AS (
         SELECT doc_id,
           CAST(len(string_split($norm, ' ')) AS BIGINT) AS n_toks
         FROM documents),
       packed AS (
         SELECT r.probe_id, r.rank AS position, r.doc_id, t.n_toks,
           CAST(SUM(t.n_toks) OVER (PARTITION BY r.probe_id
             ORDER BY r.rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_toks
         FROM ranked r JOIN toks t USING (doc_id))
       SELECT probe_id, position, doc_id, n_toks, cum_toks
       FROM packed
       WHERE cum_toks <= $PackBudget
       ORDER BY probe_id, position"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String)
      => DataFrame] = Map(
    "ann_hybrid_rrf" -> ((s, d) =>
      hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))),
    "ann_hybrid_rrf_routed" -> ((s, d) =>
      hybridRrfRoutedGate(Tables.documents(s, d), Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))),
    "ann_filtered_topk" -> ((s, d) =>
      filteredTopK(Tables.documents(s, d), Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))),
    "emb_matryoshka_recall" -> ((s, d) =>
      matryoshkaRecall(Tables.embeddings(s, d))
        .orderBy(col("probe_id"))),
    "docs_context_pack" -> ((s, d) =>
      contextPack(Tables.documents(s, d), Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("position"))))

  def oracles: Map[String, String] = Map(
    "ann_hybrid_rrf" -> hybridRrfSql,
    "ann_hybrid_rrf_routed" -> hybridRrfRoutedSql,
    "ann_filtered_topk" -> filteredTopKSql,
    "emb_matryoshka_recall" -> matryoshkaRecallSql,
    "docs_context_pack" -> contextPackSql)
}
