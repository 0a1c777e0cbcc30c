package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtering set-similarity join (the AllPairs/PPJoin candidate
  * rule; Bayardo et al., "Scaling Up All Pairs Similarity Search",
  * WWW'07): order every document's token set by one GLOBAL token order
  * (rarest first), keep only the first `|d| − ⌈t·|d|⌉ + 1` tokens as
  * the document's prefix, and generate candidates by equi-joining on
  * prefix tokens. Two sets with Jaccard ≥ t MUST share a prefix token
  * under any common total order, so — unlike minhash/simhash banding —
  * candidate generation is COMPLETE: the exact-verify stage loses
  * nothing, and the oracle can be the brute-force all-pairs join. This
  * gives the dedup family a third blocking discipline (exact-complete)
  * beside probabilistic LSH (recall-floored) and length-bucket
  * blocking (within-block exact).
  *
  * Scale: the join key is a RARE token by construction — prefix tokens
  * are each document's globally rarest, so bucket sizes are bounded by
  * document frequency of the rarest tail, not by stopword mass. Cost
  * is Σ_token df_prefix(token)², the AllPairs bound. Everything
  * shuffles by token or by doc_id; nothing is ever all-pairs. The
  * prefix length uses integer arithmetic (⌈(4/5)·s⌉ = (4s+4) div 5),
  * so no float rounding can shorten a prefix and silently lose a pair.
  *
  * Reference behavior anchor: same dedup surface as
  * /root/reference (docs/ARCHITECTURE.md silver dedup stage); the
  * prefix-filter discipline itself is from the public literature, not
  * the reference.
  */
object PrefixJoin {

  /** Jaccard threshold as an exact rational (4/5 = 0.8), matching
    * [[Dedup.ngramJaccard]]'s default so the two generators are
    * comparable.
    */
  val ThreshNum = 4L
  val ThreshDen = 5L

  /** Exact Jaccard from a zero-allocation sorted-merge intersection
    * count ([[graft.functions.SortedIntersectCount]]); both inputs must
    * be sorted gram sets. The count is an exact integer either way, so
    * the resulting double is bit-identical to the `array_intersect`
    * formulation it replaced — only cheaper (no per-row hash set +
    * intersection array, and the verify stage stays in whole-stage
    * codegen across millions of candidate pairs).
    */
  private def jaccardOf(a: Column, b: Column): Column = {
    val inter = call_function("sorted_intersect_count", a, b).cast("double")
    inter / ((size(a) + size(b)).cast("double") - inter)
  }

  /** All pairs of a (doc_id, grams) frame with Jaccard ≥ num/den, via
    * prefix filtering + exact verify — COMPLETE (provably equal to the
    * brute-force all-pairs join). Also the truth-set generator for
    * [[Dedup.dedupRecallBounds]]: the complete truth at 0.95 that
    * length-bucket blocking cannot produce (buckets split true pairs —
    * at sf0.01 the blocked generator sees 172 of 1887 true 0.95
    * pairs). The caller is expected to have `base` cached.
    */
  /** The prefix index: per doc, the first p = s − ⌈(num/den)·s⌉ + 1
    * tokens under the global document-frequency order — the stored
    * artifact a production deployment keeps between ingests (the
    * set-similarity analog of the incremental band table).
    */
  private def prefixTable(base: DataFrame, num: Long, den: Long): DataFrame = {
    val tok = base.select(col("doc_id"), col("grams"),
      size(col("grams")).as("set_size"))
      .select(col("doc_id"), col("set_size"),
        explode(col("grams")).as("token"))
    // global document frequency → the one total order all prefixes share
    val df = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val ranked = tok.join(df, Seq("token")) // shuffle on token
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("token"))))
    // p = s − ⌈(num/den)·s⌉ + 1, integer `div` so the bound is exact by
    // construction (Column./ would be IEEE double division — exact only
    // because num·s+den−1 ≪ 2^53, an argument `div` doesn't need)
    val ceilTs = expr(s"($num * set_size + ${den - 1}) div $den")
    ranked
      .filter(col("pos") <= col("set_size") - ceilTs + lit(1L))
      .select(col("doc_id"), col("token"), col("set_size"))
  }

  /** Exact verify on candidate pairs only — gram sets sorted once per
    * side so the scorer is a merge walk, not a per-pair hash set.
    */
  private def verifyPairs(cand: DataFrame, base: DataFrame, num: Long,
      den: Long): DataFrame = {
    graft.functions.IntersectCount.register(base.sparkSession)
    cand
      .join(base.select(col("doc_id").as("doc_a"),
        sort_array(col("grams")).as("grams_a")), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"),
        sort_array(col("grams")).as("grams_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccardOf(col("grams_a"), col("grams_b")))
      .filter(col("jaccard") * lit(den.toDouble) >= lit(num.toDouble))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def pairsFromBase(base: DataFrame, num: Long, den: Long): DataFrame = {
    val prefix = prefixTable(base, num, den)
    // length pruning (PPJoin): J(A,B) ≥ t ⇒ t·|A| ≤ |B| (and
    // symmetrically), checked with cross-multiplied integers at join
    // time — a necessary condition, so completeness is untouched
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.set_size") * lit(den) >= col("a.set_size") * lit(num) &&
          col("a.set_size") * lit(den) >= col("b.set_size") * lit(num))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(cand, base, num, den)
  }

  /** BATCH-INCIDENT subset of the pair relation by PROBING: only the
    * batch docs' prefix entries join the full prefix index, so the
    * cost is O(batch prefixes × token collisions) — never a corpus
    * self-join — while exactness is untouched (same global token
    * order on both sides, same integer length bounds, same exact
    * verify; the prefix-filter completeness argument applies to each
    * pair with ≥1 batch endpoint verbatim). This is the incremental-
    * ingest shape: the prefix index is the STORED artifact
    * (`dedup_incremental`'s band-table discipline, but with zero
    * recall loss — which is what lets `dedup_clusters_incremental`
    * keep its full-recompute transitive-closure oracle), the batch
    * probes it. Emits canonical doc_a < doc_b pairs.
    */
  def incidentPairsFromBase(base: DataFrame, isBatch: Column => Column,
      num: Long, den: Long): DataFrame = {
    val prefix = prefixTable(base, num, den)
    val probe = prefix.filter(isBatch(col("doc_id")))
    val cand = probe.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          col("b.set_size") * lit(den) >= col("a.set_size") * lit(num) &&
          col("a.set_size") * lit(den) >= col("b.set_size") * lit(num))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    verifyPairs(cand, base, num, den)
  }

  /** All document pairs with unigram Jaccard ≥ 4/5 over the raw corpus. */
  def prefixFilterPairs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val base = docs.select(col("doc_id"),
      Dedup.hashedNgrams(s, Dedup.normText(col("text")), 1).as("grams"))
      .repartition(col("doc_id"))
    graft.Caching.withCached(base) {
      pairsFromBase(base, ThreshNum, ThreshDen)
    }
  }

  /** Shared oracle CTEs `base`→`pairs`: the BRUTE-FORCE all-pairs
    * unigram-Jaccard relation at 4/5 — the ground truth the prefix
    * filter's completeness claim is proven against. Reused by
    * [[prefixPairsSql]], [[knnGraphSql]], [[Clusters.dupClustersSql]],
    * [[Clusters.canonicalDocsSql]] and [[Pagerank.docsPagerankSql]],
    * so every consumer of the near-dup graph verifies against the ONE
    * definition of the complete relation (no drift, no blocking).
    * The threshold test is the same cross-multiplied form as the Spark
    * side (j·5 ≥ 4), dodging any 0.8-literal rounding asymmetry.
    */
  val brutePairCtesSql: String =
    s"""base AS (
         SELECT doc_id,
           list_distinct(list_transform(
             list_distinct(string_split(
               regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')),
             g -> ${OracleFnv.ofText("g")})) AS grams
         FROM documents),
       pairs AS (
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / (CAST(len(a.grams) + len(b.grams) AS DOUBLE)
                  - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE))
               AS jaccard
           FROM base a JOIN base b ON a.doc_id < b.doc_id)
         WHERE jaccard * 5.0 >= 4.0)"""

  /** Oracle: brute-force all-pairs Jaccard at the same threshold. The
    * algorithm's whole claim is completeness — matching this proves it.
    */
  val prefixPairsSql: String =
    s"""WITH $brutePairCtesSql
       SELECT doc_a, doc_b, jaccard FROM pairs
       ORDER BY doc_a, doc_b"""

  /** k-NN graph over the near-dup relation: each document's top-3
    * strongest neighbors among its ≥4/5-Jaccard pairs — the graph
    * semantic-dedup clusters over (neighbors beyond the candidate
    * threshold are by definition not near-dups, so "top-k among
    * candidates" IS the complete thresholded k-NN graph, and the
    * prefix filter's completeness proof carries over). Ties break
    * (jaccard DESC, neighbor ASC) for a deterministic graph.
    */
  def knnGraph(docs: DataFrame, k: Int = 3): DataFrame = {
    val pairs = prefixFilterPairs(docs)
    val directed = pairs.select(col("doc_a").as("doc_id"),
        col("doc_b").as("neighbor"), col("jaccard"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"),
        col("doc_a").as("neighbor"), col("jaccard")))
    directed
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("jaccard").desc, col("neighbor"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("neighbor"), col("jaccard"))
  }

  val knnGraphSql: String =
    s"""WITH $brutePairCtesSql,
       directed AS (
         SELECT doc_a AS doc_id, doc_b AS neighbor, jaccard FROM pairs
         UNION ALL
         SELECT doc_b AS doc_id, doc_a AS neighbor, jaccard FROM pairs)
       SELECT doc_id, rank, neighbor, jaccard FROM (
         SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
           ORDER BY jaccard DESC, neighbor) AS INT) AS rank
         FROM directed)
       WHERE rank <= 3
       ORDER BY doc_id, rank"""

  /** Containment threshold 17/20 (0.85). Chosen so the relation is
    * provably non-empty wherever the Jaccard-4/5 relation is: J ≥ 4/5
    * with |A| ≤ |B| forces C(A→B) = i/|A| ≥ (4/5)·2/(9/5) = 8/9 >
    * 17/20, so every Jaccard pair contributes at least its
    * smaller-side direction.
    */
  val ContainNum = 17L
  val ContainDen = 20L
  val ContainTopK = 3

  /** CONTAINMENT join — directed near-dup detection Jaccard blocking
    * provably misses: C(A→B) = |A∩B|/|A| ≥ t finds A nearly INSIDE B
    * even when B is much larger (a doc embedded in a compilation has
    * tiny Jaccard but containment ≈ 1). Prefix rule, contained side
    * only: if B misses ALL of A's first `|A| − ⌈t·|A|⌉ + 1` globally
    * rarest tokens, then |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A| — so indexing
    * just that prefix of A against ALL of B's tokens is a COMPLETE
    * candidate rule (the asymmetric analog of [[pairsFromBase]]'s,
    * from the same literature), verified here against the brute-force
    * directed oracle. No symmetric length pruning exists (B may be
    * arbitrarily large); the necessary `|B|·den ≥ |A|·num` is applied
    * cross-multiplied.
    *
    * Scale: the join key is one of A's rarest tokens, so candidate
    * buckets are bounded by rare-token document frequency — frequent
    * tokens appear only on the container side and never key a join.
    * Verify is the codegen'd sorted-merge intersection; all threshold
    * tests are integer cross-multiplications.
    */
  def containmentPairs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val base = docs.select(col("doc_id"),
      Dedup.hashedNgrams(s, Dedup.normText(col("text")), 1).as("grams"))
      .repartition(col("doc_id"))
    graft.Caching.withCached(base) {
      val tok = base.select(col("doc_id"),
        size(col("grams")).cast("long").as("set_size"),
        explode(col("grams")).as("token"))
      val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val ranked = tok.join(dfreq, Seq("token"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("token"))))
      val ceilTs =
        expr(s"($ContainNum * set_size + ${ContainDen - 1}) div $ContainDen")
      val prefixA = ranked
        .filter(col("pos") <= col("set_size") - ceilTs + lit(1L))
        .select(col("doc_id").as("contained_id"), col("token"),
          col("set_size").as("len_a"))
      val allB = tok.select(col("doc_id").as("container_id"),
        col("token").as("btoken"), col("set_size").as("len_b"))
      val cand = prefixA.join(allB,
          col("token") === col("btoken") &&
            col("contained_id") =!= col("container_id") &&
            col("len_b") * lit(ContainDen) >=
              col("len_a") * lit(ContainNum))
        .select(col("contained_id"), col("container_id"), col("len_a"))
        .distinct()
      graft.functions.IntersectCount.register(s)
      val scored = cand
        .join(base.select(col("doc_id").as("contained_id"),
          sort_array(col("grams")).as("ga")), Seq("contained_id"))
        .join(base.select(col("doc_id").as("container_id"),
          sort_array(col("grams")).as("gb")), Seq("container_id"))
        .withColumn("inter",
          call_function("sorted_intersect_count", col("ga"), col("gb"))
            .cast("long"))
        .filter(col("inter") * lit(ContainDen) >=
          col("len_a") * lit(ContainNum))
        .select(col("contained_id"), col("container_id"), col("inter"),
          (col("inter").cast("double") / col("len_a").cast("double"))
            .as("containment"))
      // TOP-K containers per contained doc: on a clique-heavy corpus
      // the full directed relation is quadratic in clique size (11.6M
      // rows at sf0.1 for 5k docs) — unbounded output is not a sane
      // operator shape at 100 TB. The candidate rule stays COMPLETE;
      // only the emitted ranking is bounded, exactly the knn-graph
      // discipline. Ties break (containment DESC, container ASC).
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("contained_id"))
            .orderBy(col("containment").desc, col("container_id")))
          .cast("int"))
        .filter(col("rank") <= ContainTopK)
        .select(col("contained_id"), col("rank"), col("container_id"),
          col("inter"), col("containment"))
    }
  }

  /** Oracle: the brute-force DIRECTED containment relation — the
    * completeness proof for the asymmetric prefix rule.
    */
  val containmentPairsSql: String =
    s"""WITH $brutePairCtesSql,
       cont AS (
         SELECT contained_id, container_id, inter, containment FROM (
           SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
             CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS inter,
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / CAST(len(a.grams) AS DOUBLE) AS containment,
             len(a.grams) AS len_a
           FROM base a JOIN base b ON a.doc_id <> b.doc_id)
         WHERE inter * $ContainDen >= $ContainNum * len_a)
       SELECT contained_id, rank, container_id, inter, containment FROM (
         SELECT *, CAST(row_number() OVER (PARTITION BY contained_id
           ORDER BY containment DESC, container_id) AS INT) AS rank
         FROM cont)
       WHERE rank <= $ContainTopK
       ORDER BY contained_id, rank"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_containment" -> ((s, d) =>
      containmentPairs(graft.Tables.documents(s, d))
        .orderBy(col("contained_id"), col("container_id"))),
    "dedup_prefix_filter" -> ((s, d) =>
      prefixFilterPairs(graft.Tables.documents(s, d))
        .orderBy(col("doc_a"), col("doc_b"))),
    "docs_knn_graph" -> ((s, d) =>
      knnGraph(graft.Tables.documents(s, d))
        .orderBy(col("doc_id"), col("rank"))))

  def oracles: Map[String, String] = Map(
    "dedup_containment" -> containmentPairsSql,
    "dedup_prefix_filter" -> prefixPairsSql,
    "docs_knn_graph" -> knnGraphSql)
}
