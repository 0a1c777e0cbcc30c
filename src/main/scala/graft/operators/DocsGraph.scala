package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the COMPLETE near-dup relation
  * ([[PrefixJoin.prefixFilterPairs]]) — the structural signals a
  * corpus-curation pipeline reads off its duplicate graph beside the
  * cluster labels ([[Clusters]]) and centrality ([[Pagerank]]):
  *
  *  - `docs_triangle_count`: per-document triangle membership on the
  *    SPARSIFIED similarity graph ([[PrefixJoin.knnGraph]]'s top-k
  *    edges, undirected support) — the triadic-closure signal (a doc
  *    in many triangles sits inside a coherent near-dup family; a
  *    bridge doc with neighbors but no triangles links
  *    otherwise-unrelated groups). The k-NN graph, not the raw pair
  *    relation, is the only scalable substrate: duplicate FAMILIES are
  *    near-cliques, so raw-pair triangles grow as family³ (this
  *    corpus's one 342-doc family at sf0.01 already holds ~2M; at
  *    100 TB the count is astronomically meaningless), while the k-NN
  *    support graph has ≤ k·n edges and answers the question the
  *    signal actually asks. Counting uses DEGREE ORIENTATION (Suri &
  *    Vassilvitskii, "Counting Triangles and the Curse of the Last
  *    Reducer", WWW'11): each undirected edge points low-(degree,id)
  *    → high-(degree,id), wedges are built only from a vertex's
  *    higher-ranked out-neighborhood, so a hub of degree d
  *    contributes O(outdeg²) ≪ O(d²) wedge candidates — the
  *    skew-robust MapReduce form. Every triangle is generated exactly
  *    once (its minimum-rank vertex owns it).
  *  - `docs_cc_stats`: the component-size histogram — the
  *    dedup-pressure report (how many pair/triple/k-sized duplicate
  *    families exist; the tail of big components is what melts wall
  *    clock if left unsplit).
  *
  * Both recompute their edges from the corpus; the oracle re-derives
  * everything from the brute-force all-pairs relation, so the graph
  * the stats describe is proven complete, not just self-consistent.
  */
object DocsGraph {

  /** (deg, id) lexicographic rank comparison as a join predicate. */
  private def rankLess(degA: Column, a: Column, degB: Column,
      b: Column): Column =
    degA < degB || (degA === degB && a < b)

  /** Per-doc triangle membership counts over the undirected support of
    * the top-k near-dup graph.
    */
  def triangleCounts(docs: DataFrame): DataFrame = {
    val knn = PrefixJoin.knnGraph(docs)
    // EAGERLY materialize the support edge set (≤ k·n rows — tiny)
    // before the plan fans out: und/deg/directed reference it from
    // five branches, and a lazy persist lets the first concurrent job
    // evaluate the k-NN window (itself a pass over the multi-million-
    // row pair relation) once per branch before the cache fills —
    // bench (sf0.1, min-of-2): 14.1s → 8.2s from this line alone.
    val pairs = knn.select(
        least(col("doc_id"), col("neighbor")).as("doc_a"),
        greatest(col("doc_id"), col("neighbor")).as("doc_b"))
      .distinct().localCheckpoint(eager = true)
    graft.Caching.withCached(pairs) {
      val und = pairs
        .unionAll(pairs.select(col("doc_b").as("doc_a"),
          col("doc_a").as("doc_b")))
        .toDF("u", "v")
      val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      // one directed edge per undirected edge: low rank → high rank
      val directed = und
        .join(deg, Seq("u"))
        .join(deg.select(col("u").as("v"), col("deg").as("deg_v")),
          Seq("v"))
        .filter(rankLess(col("deg"), col("u"), col("deg_v"), col("v")))
        .select(col("u"), col("v"), col("deg_v"))
      // wedges from each vertex's out-neighborhood, ordered v < w by
      // rank so each candidate triangle is generated once
      val wedges = directed.as("e1")
        .join(directed.as("e2"), col("e1.u") === col("e2.u") &&
          rankLess(col("e1.deg_v"), col("e1.v"),
            col("e2.deg_v"), col("e2.v")))
        .select(col("e1.u").as("x"), col("e1.v").as("y"),
          col("e2.v").as("z"))
      // close the wedge: the (y, z) edge must exist (directed y → z,
      // consistent with the rank order above)
      val tri = wedges.join(
        directed.select(col("u").as("y"), col("v").as("z")),
        Seq("y", "z"))
      val verts = tri.select(col("x").as("doc_id"))
        .unionAll(tri.select(col("y").as("doc_id")))
        .unionAll(tri.select(col("z").as("doc_id")))
      verts.groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
    }
  }

  val triangleCountsSql: String =
    s"""WITH ${PrefixJoin.brutePairCtesSql},
       directed AS (
         SELECT doc_a AS doc_id, doc_b AS neighbor, jaccard FROM pairs
         UNION ALL
         SELECT doc_b AS doc_id, doc_a AS neighbor, jaccard FROM pairs),
       knn AS (
         SELECT doc_id, neighbor FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY jaccard DESC, neighbor) AS rank
           FROM directed)
         WHERE rank <= 3),
       support AS (
         SELECT DISTINCT least(doc_id, neighbor) AS doc_a,
           greatest(doc_id, neighbor) AS doc_b
         FROM knn),
       tri AS (
         SELECT p1.doc_a AS x, p1.doc_b AS y, p2.doc_b AS z
         FROM support p1
         JOIN support p2 ON p2.doc_a = p1.doc_b
         JOIN support p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b),
       verts AS (
         SELECT x AS doc_id FROM tri
         UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri)
       SELECT doc_id, COUNT(*) AS n_triangles
       FROM verts GROUP BY doc_id
       ORDER BY doc_id"""

  /** Component-size histogram: (cluster_size, n_clusters, n_docs).
    * Goes straight from the CC labels to per-cluster counts — skipping
    * [[Clusters.dupClusters]]'s per-doc size window, which this
    * aggregate would immediately re-collapse.
    */
  def ccStats(docs: DataFrame): DataFrame = {
    val pairs = PrefixJoin.prefixFilterPairs(docs)
      .select(col("doc_a"), col("doc_b"))
    Clusters.connectedComponents(pairs, "doc_a", "doc_b",
        docs.select(col("doc_id")), "doc_id")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
  }

  val ccStatsSql: String =
    s"""WITH RECURSIVE ${PrefixJoin.brutePairCtesSql},
       ${Clusters.componentCtesSql},
       per_cluster AS (
         SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         FROM comp GROUP BY cluster_id)
       SELECT cluster_size, COUNT(*) AS n_clusters,
         CAST(SUM(cluster_size) AS BIGINT) AS n_docs
       FROM per_cluster
       GROUP BY cluster_size
       ORDER BY cluster_size"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "docs_triangle_count" -> ((s, d) =>
      triangleCounts(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "docs_cc_stats" -> ((s, d) =>
      ccStats(Tables.documents(s, d)).orderBy(col("cluster_size"))))

  def oracles: Map[String, String] = Map(
    "docs_triangle_count" -> triangleCountsSql,
    "docs_cc_stats" -> ccStatsSql)
}
