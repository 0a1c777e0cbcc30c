package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Integer-exact PageRank over the document near-duplicate graph —
  * graph centrality as a corpus-quality signal (a high-rank node sits
  * in a dense template cluster; rank feeds canonical selection and
  * sampling weights the way [[Clusters.canonical]] uses quality).
  *
  * Arithmetic contract: ranks are BIGINT fixed-point (SCALE = 10¹²).
  * Every step is integer division/multiplication/summation — no
  * floats anywhere — so the result is bit-identical on any engine and
  * any partitioning, and the DuckDB oracle can unroll the same
  * iterations as CTEs (the [[Ivf]] k-means discipline). Mass lost to
  * integer-floor and to isolated nodes is NOT redistributed (leaky
  * formulation) — deterministic and documented, as in the common
  * MapReduce formulations.
  *
  * Scale: per iteration one shuffle (contributions grouped by dst) +
  * one broadcast-able node join; edges are cached once. Iterations are
  * a fixed small count (3) — the plateau for near-dup clusters, whose
  * components are tiny in diameter.
  */
object Pagerank {

  val Scale = 1000000000000L // 10^12
  val Iters = 3

  /** Ranks after [[Iters]] iterations on the undirected Jaccard-4/5
    * near-dup graph — the COMPLETE relation from
    * [[PrefixJoin.prefixFilterPairs]] (the blocked ngramJaccard
    * relation covers ~9% of true pairs at this threshold, so
    * centrality over it ran on a sparse subgraph; see the
    * dedup_recall_bounds ngram_blocked row). Returns
    * (doc_id, degree, rank_scaled).
    */
  def docsPagerank(docs: DataFrame): DataFrame = {
    val pairs = PrefixJoin.prefixFilterPairs(docs)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .repartition(col("u"))
    val nodes = docs.select(col("doc_id"))
    graft.Caching.withCached(edges, nodes) {
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("outdeg"))
      val n = nodes.count() // one long of model state
      val init = Scale / n
      val base = (15L * init) / 100L
      var ranks = nodes.withColumn("r", lit(init))
      for (_ <- 1 to Iters) {
        val contrib = edges
          .join(ranks.withColumnRenamed("doc_id", "u"), Seq("u"))
          .join(deg, Seq("u"))
          .select(col("v").as("doc_id"), expr("r div outdeg").as("share"))
          .groupBy(col("doc_id")).agg(sum(col("share")).as("m"))
        ranks = nodes
          .join(contrib, Seq("doc_id"), "left")
          .select(col("doc_id"),
            (lit(base) + expr(s"85 * coalesce(m, 0L) div 100")).as("r"))
      }
      ranks
        .join(deg.withColumnRenamed("u", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("outdeg"), lit(0L)).as("degree"),
          col("r").as("rank_scaled"))
    }
  }

  /** Oracle: the same three iterations unrolled as CTEs over the
    * BRUTE-FORCE all-pairs relation ([[PrefixJoin.brutePairCtesSql]]) —
    * proving the ranks are those of the complete near-dup graph.
    */
  val docsPagerankSql: String = {
    def iter(prev: String, out: String): String =
      s"""s_$out AS (
           SELECT e.v AS doc_id, SUM($prev.r // d.outdeg) AS m
           FROM edges e
           JOIN $prev ON e.u = $prev.doc_id
           JOIN deg d ON e.u = d.u
           GROUP BY 1),
         $out AS (
           SELECT n.doc_id,
             CAST((SELECT b FROM basis) + (85 * COALESCE(s.m, 0)) // 100
               AS BIGINT) AS r
           FROM nodes n LEFT JOIN s_$out s ON n.doc_id = s.doc_id)"""
    s"""WITH ${PrefixJoin.brutePairCtesSql},
       edges AS (
         SELECT doc_a AS u, doc_b AS v FROM pairs
         UNION ALL
         SELECT doc_b AS u, doc_a AS v FROM pairs),
       deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY 1),
       nodes AS (SELECT doc_id FROM documents),
       basis AS (
         SELECT (15 * (${Scale} // (SELECT COUNT(*) FROM nodes))) // 100 AS b),
       r_0 AS (
         SELECT doc_id,
           CAST(${Scale} // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS r
         FROM nodes),
       ${iter("r_0", "r_1")},
       ${iter("r_1", "r_2")},
       ${iter("r_2", "r_3")}
       SELECT n.doc_id,
         COALESCE(d.outdeg, 0) AS degree,
         r_3.r AS rank_scaled
       FROM nodes n
       LEFT JOIN deg d ON n.doc_id = d.u
       JOIN r_3 ON n.doc_id = r_3.doc_id
       ORDER BY n.doc_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "docs_pagerank" -> ((s, d) =>
      docsPagerank(Tables.documents(s, d)).orderBy(col("doc_id"))))

  def oracles: Map[String, String] = Map(
    "docs_pagerank" -> docsPagerankSql)
}
