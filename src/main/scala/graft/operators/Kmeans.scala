package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Lloyd's k-means over the embedding corpus — the clustering operator
  * a curation pipeline uses for diversity sampling, topic bucketing,
  * and IVF-style routing ([[Ivf]] trains centroids as an internal step;
  * this exposes clustering itself, with the full assignment as the
  * result). Implementation follows the MLlib/production shape: points
  * stay distributed, centroids are driver-held model state (k·dim
  * values) broadcast into the assignment expression each round, and the
  * update is one shuffle keyed by (cluster, dimension).
  *
  * **Integer-exact by construction** so the DuckDB oracle can unroll
  * the same rounds and hash-match: embeddings are quantized once to
  * q = floor((x+1)·10⁶) (the +1 shift keeps every value non-negative,
  * so Spark's truncating `div`, DuckDB's flooring `//`, and Scala's
  * `/` on the driver all agree), centroids live at scale 10¹² as
  * floor((Σq)·10⁶ / n), and squared distances are exact DECIMAL(38,0)
  * sums of (q·10⁶ − c)² — no float is ever summed, compared, or
  * divided, so argmin ties break identically (distance, then cluster
  * id) on both engines. Quantization at 10⁻⁶ is far below embedding
  * noise; the clustering is the one Lloyd's produces on the quantized
  * points, deterministically.
  *
  * Scale: assignment is a narrow map over points (k·dim literal
  * comparisons inside codegen — no join, no shuffle); the update
  * shuffles (cluster, dim, partial-sum) with map-side combine, k·dim
  * rows total to the driver per round. At 100 TB the same plan holds:
  * rounds are O(points/executors) with k·dim driver state, exactly
  * MLlib's cost model.
  */
object Kmeans {

  val K = 8
  val Iters = 3
  val Q = 1000000L

  /** floor((x+1)·10⁶) as BIGINT — non-negative, so every division
    * downstream is floor division on every engine. The x ≥ −1
    * precondition is ENFORCED in the same expression (raise_error on
    * violation, no extra job): a value below −1 would quantize
    * negative and silently break the truncating-vs-flooring division
    * equivalence the oracle parity rests on.
    */
  private val qCol: Column =
    expr("transform(embedding, x -> " +
      "if(cast(x as double) < -1.0d, " +
      "cast(raise_error(concat('Kmeans precondition: embedding value ', " +
      "cast(x as string), ' < -1.0 quantizes negative')) as bigint), " +
      s"cast(floor((cast(x as double) + 1.0d) * ${Q}.0d) as bigint)))")

  /** Exact squared distance (scale 10¹²·10¹²) between a point's q
    * vector and one centroid literal: Σ (q_i·10⁶ − c_i)² in
    * DECIMAL(38,0) — values peak ~10²⁶, comfortably inside 38 digits.
    */
  private def distCol(cent: Array[Long]): Column =
    aggregate(
      zip_with(col("q"), typedLit(cent.toSeq), (x, s) => {
        val d = (x * lit(Q) - s).cast(DecimalType(38, 0))
        d * d
      }),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0)),
      (acc, v) => acc + v)

  /** One assignment pass: cluster = argmin over the k centroid
    * literals, ties to the smaller cluster id (struct ordering of
    * array_min compares distance first, then id).
    */
  private def assign(pts: DataFrame,
      cents: Array[(Long, Array[Long])]): DataFrame =
    pts.withColumn("best",
        array_min(array(cents.map { case (cid, c) =>
          struct(distCol(c).as("dist"), lit(cid).as("cid"))
        }: _*)))
      .select(col("vec_id"), col("q"),
        col("best.cid").as("cid"), col("best.dist").as("dist"))

  /** One update pass: per-(cluster, dim) exact sums and counts shuffle
    * once (map-side combined); the k·dim result rows are driver model
    * state. Clusters that lost every point keep their previous
    * centroid (deterministic carry-over, mirrored by the oracle's
    * LEFT JOIN + COALESCE).
    */
  private def update(assigned: DataFrame,
      prev: Array[(Long, Array[Long])]): Array[(Long, Array[Long])] = {
    val rows = assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("cid"), col("i"))
      .agg(sum(col("qi")).as("s"), count(lit(1)).as("n"))
      .collect()
    val byCid = rows.groupBy(_.getLong(0))
    prev.map { case (cid, old) =>
      byCid.get(cid) match {
        case None => (cid, old)
        case Some(dims) =>
          val c = old.clone()
          dims.foreach { r =>
            // s·10⁶ ≤ 4·10¹⁵ — fits a Long; operands non-negative so
            // Scala `/` is the same floor division as DuckDB `//`
            c(r.getInt(1)) = r.getLong(2) * Q / r.getLong(3)
          }
          (cid, c)
      }
    }
  }

  /** Full clustering: init = the k smallest vec_ids' vectors, `Iters`
    * assignment rounds with `Iters − 1` updates between them (the last
    * assignment IS the result), plus final cluster sizes.
    */
  def embKmeans(emb: DataFrame): DataFrame = run(emb, None)

  /** [[embKmeans]] plus the exact inertia (Σ chosen squared distances,
    * in quantized units) after each assignment round — exposed so the
    * spec can pin Lloyd's monotone-improvement guarantee. The gate and
    * bench path ([[embKmeans]]) skips these aggregations: one extra
    * Spark job per round bought nothing there.
    */
  private[graft] def embKmeansWithInertia(
      emb: DataFrame): (DataFrame, Seq[BigInt]) = {
    val inertias = Seq.newBuilder[BigInt]
    val out = run(emb, Some(inertias))
    (out, inertias.result())
  }

  private def run(emb: DataFrame,
      inertias: Option[scala.collection.mutable.Builder[BigInt, Seq[BigInt]]])
      : DataFrame = {
    val pts = emb.select(col("vec_id"), qCol.as("q"))
    graft.Caching.withCached(pts) {
      var cents: Array[(Long, Array[Long])] = pts
        .orderBy(col("vec_id")).limit(K).collect()
        .zipWithIndex.map { case (r, idx) =>
          (idx.toLong, r.getSeq[Long](1).map(_ * Q).toArray)
        }
      var assigned: DataFrame = null
      for (t <- 1 to Iters) {
        assigned = assign(pts, cents)
        inertias.foreach(_ += BigInt(assigned
          .agg(sum(col("dist")).cast(DecimalType(38, 0))).head()
          .getDecimal(0).toBigInteger))
        if (t < Iters) cents = update(assigned, cents)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
      assigned.select(col("vec_id"), col("cid").as("cluster_id"))
        .withColumn("cluster_size", count(lit(1)).over(w))
    }
  }

  /** The oracle unrolls the identical rounds in long form (vec, dim,
    * q) — every quantity BIGINT/HUGEINT, so the hash match is exact.
    * [[kmeansCtes]] ends at `a`[[Iters]] (the final assignment) so
    * downstream oracles ([[embKmeansSql]], Purity's) share ONE
    * definition of the clustering.
    */
  val kmeansCtes: String = {
    def iterCtes(t: Int): String = {
      val prev = s"c${t - 1}"
      s"""d$t AS (
         SELECT q.vec_id, c.cid,
           SUM(CAST(q.qi * $Q - c.ci AS HUGEINT) *
               CAST(q.qi * $Q - c.ci AS HUGEINT)) AS dist
         FROM q JOIN $prev c USING (i)
         GROUP BY 1, 2),
       a$t AS (
         SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           FROM d$t) WHERE rn = 1),
       n$t AS (SELECT cid, COUNT(*) AS n FROM a$t GROUP BY 1),
       craw$t AS (
         SELECT a.cid, q.i, (SUM(q.qi) * $Q) // MAX(n.n) AS ci
         FROM a$t a JOIN q USING (vec_id) JOIN n$t n ON a.cid = n.cid
         GROUP BY a.cid, q.i),
       c$t AS (
         SELECT p.cid, p.i, COALESCE(cr.ci, p.ci) AS ci
         FROM $prev p LEFT JOIN craw$t cr ON p.cid = cr.cid AND p.i = cr.i)"""
    }
    s"""q AS (
         SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           CAST(floor((CAST(unnest(embedding) AS DOUBLE) + 1.0) * ${Q}.0)
             AS BIGINT) AS qi
         FROM embeddings),
       init AS (
         SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $K)),
       c0 AS (
         SELECT init.cid, q.i, q.qi * $Q AS ci
         FROM init JOIN q USING (vec_id)),
       ${iterCtes(1)},
       ${iterCtes(2)},
       d$Iters AS (
         SELECT q.vec_id, c.cid,
           SUM(CAST(q.qi * $Q - c.ci AS HUGEINT) *
               CAST(q.qi * $Q - c.ci AS HUGEINT)) AS dist
         FROM q JOIN c${Iters - 1} c USING (i)
         GROUP BY 1, 2),
       a$Iters AS (
         SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           FROM d$Iters) WHERE rn = 1)"""
  }

  val embKmeansSql: String =
    s"""WITH $kmeansCtes
       SELECT vec_id, cid AS cluster_id,
         CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_size
       FROM a$Iters ORDER BY vec_id"""

  /** Cluster purity against the ground-truth `label` column — the
    * standard external clustering evaluation: per cluster, the share
    * its majority label holds (ties to the smaller label). Composes
    * the verified clustering with one count aggregate and a rank-1
    * window; purity is one exact-count division.
    */
  def clusterPurity(emb: DataFrame): DataFrame = {
    val assign = embKmeans(emb).select(col("vec_id"), col("cluster_id"))
    val counts = assign
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("cluster_id"), col("label"))
      .agg(count(lit(1)).as("n"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    val ranked = counts
      .withColumn("cluster_size", sum(col("n")).over(wc))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        wc.orderBy(col("n").desc, col("label"))))
    ranked.filter(col("rn") === 1)
      .select(col("cluster_id"), col("cluster_size"),
        col("label").as("majority_label"), col("n").as("n_majority"),
        (col("n").cast("double") / col("cluster_size").cast("double"))
          .as("purity"))
  }

  val clusterPuritySql: String =
    s"""WITH $kmeansCtes,
       counts AS (
         SELECT a.cid AS cluster_id, e.label, COUNT(*) AS n
         FROM a$Iters a JOIN embeddings e USING (vec_id)
         GROUP BY 1, 2),
       ranked AS (
         SELECT cluster_id, label, n,
           CAST(SUM(n) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY n DESC, label) AS rn
         FROM counts)
       SELECT cluster_id, cluster_size, label AS majority_label,
         n AS n_majority,
         CAST(n AS DOUBLE) / CAST(cluster_size AS DOUBLE) AS purity
       FROM ranked WHERE rn = 1
       ORDER BY cluster_id"""

  // ---- registry ------------------------------------------------------------
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — CLUSTER-BLOCKED
    * semantic deduplication, the published method this module's
    * clustering exists to serve: the k-means partition IS the blocking
    * (pairwise cosines are computed only WITHIN clusters, so the
    * quadratic cost is per-cluster and k scales with the corpus), and
    * the keep rule is the paper's upper-triangular greedy — a point is
    * DROPPED when its max cosine to any LOWER-id point of its cluster
    * reaches τ. Composes two verified substrates with zero new
    * nondeterminism: the integer-exact clustering (shared
    * [[kmeansCtes]] oracle — one definition of the partition on both
    * engines) and the fold-exact cosine
    * ([[Similarity.dot]]/`list_dot_product` parity); MAX over exact
    * doubles is order-independent, ids break nothing (no ties to
    * break).
    */
  val SemDedupTau = 0.35

  def semDedup(emb: DataFrame, tau: Double = SemDedupTau): DataFrame = {
    import graft.operators.Similarity.{cosinePre, dot}
    val assign = embKmeans(emb).select(col("vec_id"), col("cluster_id"))
    val vecs = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val base = assign.join(vecs, Seq("vec_id"))
      .localCheckpoint(true) // read twice by the self-join below
    val l = base.select(col("cluster_id"), col("vec_id").as("a"),
      col("v").as("va"), col("nrm").as("na"))
    val r = base.select(col("cluster_id"), col("vec_id").as("b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val prior = l.join(r, Seq("cluster_id")).filter(col("a") < col("b"))
      .select(col("b"),
        cosinePre(dot(col("va"), col("vb")), col("na"), col("nb"))
          .as("cosine"))
      .groupBy(col("b")).agg(max(col("cosine")).as("max_prior_sim"))
      .withColumnRenamed("b", "vec_id")
    base.select(col("vec_id"), col("cluster_id"))
      .join(prior, Seq("vec_id"), "left")
      .withColumn("kept",
        col("max_prior_sim").isNull || col("max_prior_sim") < tau)
  }

  val semDedupSql: String =
    s"""WITH $kmeansCtes,
       bv AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       ba AS (
         SELECT a.vec_id, a.cid, bv.v
         FROM a$Iters a JOIN bv USING (vec_id)),
       pr AS (
         SELECT y.vec_id AS b,
           MAX(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v))
                * sqrt(list_dot_product(y.v, y.v)))) AS max_prior_sim
         FROM ba x JOIN ba y ON x.cid = y.cid AND x.vec_id < y.vec_id
         GROUP BY 1)
       SELECT a.vec_id, a.cid AS cluster_id, pr.max_prior_sim,
         pr.max_prior_sim IS NULL OR pr.max_prior_sim < $SemDedupTau AS kept
       FROM a$Iters a LEFT JOIN pr ON a.vec_id = pr.b
       ORDER BY a.vec_id"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_kmeans" -> ((s, d) =>
      embKmeans(Tables.embeddings(s, d)).orderBy(col("vec_id"))),
    "emb_cluster_purity" -> ((s, d) =>
      clusterPurity(Tables.embeddings(s, d)).orderBy(col("cluster_id"))),
    "emb_semdedup" -> ((s, d) =>
      semDedup(Tables.embeddings(s, d)).orderBy(col("vec_id"))))

  def oracles: Map[String, String] = Map(
    "emb_kmeans" -> embKmeansSql,
    "emb_cluster_purity" -> clusterPuritySql,
    "emb_semdedup" -> semDedupSql)
}
