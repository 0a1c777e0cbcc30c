package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbor — the memory architecture that
  * makes billion-vector ANN affordable: the [[Ivf]] coarse quantizer
  * routes probes to inverted lists, and PRODUCT QUANTIZATION replaces
  * each stored vector with M sub-space codebook codes (here 4 × 16
  * dims, 8 codes each → 4 bytes per vector instead of 512). Scoring is
  * asymmetric distance computation: each probe precomputes a lookup
  * table of its sub-vector dot products against every codebook entry,
  * so a candidate's approximate dot is M table lookups — no float math
  * per dimension at query time (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011).
  *
  * Everything is deterministic ([[Ivf.kmeansVectors]] per subspace,
  * fixed-order float sums), so the FULL pipeline — coarse k-means, 4
  * codebook k-means, encoding, LUT scoring, top-k — has an exact
  * DuckDB oracle. Scale posture mirrors Ivf: codebooks/centroids are
  * broadcast model state (kilobytes); encoded vectors carry 4 small
  * ints + 1 double; the probe join is key-equality on the coarse
  * cluster.
  */
object Pq {

  // NOTE: the row shape is specialized to M = 4 — the encode tuple
  // (c0..c3), the probe LUT columns (lut0..lut3), and the element_at
  // scoring sum are written out per subspace to stay inside whole-stage
  // codegen (a seq-typed column would box). Changing M compiles but
  // breaks encoding/scoring at runtime, so it is pinned here; widen by
  // generating those columns from M if a different shape is ever needed.
  val M = 4          // subspaces (pinned — see note above)
  val Ksub = 8       // codes per subspace codebook
  val SubIters = 3   // Lloyd rounds per codebook
  val CoarseNlist = 16
  val CoarseIters = 5
  val Nprobe = 4
  val K = 5

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** IVF-PQ top-k for the standard probe set (vec_id % 50 == 0). */
  def ivfPqTopK(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = Ivf.toVec(emb).as[(Long, Array[Double])]
    graft.Caching.withCached(base) {
      val scored = pqScored(spark, base)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine_pq").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("rank"), col("neighbor_id"),
          col("cosine_pq"))
    }
  }

  val RerankC = 20 // PQ candidates per probe fed to the exact stage

  /** TWO-STAGE serving: the PQ stage nominates [[RerankC]] candidates
    * per probe by approximate (ADC) cosine — cheap, 4 bytes/vector —
    * and the exact stage recomputes TRUE cosine for only those
    * probe×candidate pairs and re-ranks to top-[[K]]. This is the
    * standard production ANN shape (quantized recall stage + exact
    * precision stage): the full-precision vectors are touched for
    * C·|probes| rows instead of |corpus|·|probes|, and the final
    * ordering is free of quantization error within the candidate set.
    * The exact stage reuses [[Similarity]]'s fold-exact dot, so the
    * emitted cosines are bit-identical to the brute-force oracle's.
    */
  def ivfPqRerank(emb: DataFrame, c: Int = RerankC): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = Ivf.toVec(emb).as[(Long, Array[Double])]
    graft.Caching.withCached(base) {
      val scored = pqScored(spark, base)
      val wPq = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine_pq").desc, col("neighbor_id"))
      val cands = scored.withColumn("rn", row_number().over(wPq))
        .filter(col("rn") <= c)
        .select(col("probe_id"), col("neighbor_id"))
      val vecs = base.toDF("vec_id", "v")
        .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      val exact = cands
        .join(vecs.select(col("vec_id").as("neighbor_id"),
          col("v").as("nv"), col("nrm").as("nnrm")), Seq("neighbor_id"))
        .join(broadcast(vecs
          .join(cands.select("probe_id").distinct(),
            col("vec_id") === col("probe_id"), "left_semi")
          .select(col("vec_id").as("probe_id"), col("v").as("pv"),
            col("nrm").as("pnrm"))), Seq("probe_id"))
        .select(col("probe_id"), col("neighbor_id"),
          Similarity.cosinePre(Similarity.dot(col("pv"), col("nv")),
            col("pnrm"), col("nnrm")).as("cosine"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      exact.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("rank"), col("neighbor_id"),
          col("cosine"))
    }
  }

  /** The PQ/ADC-scored candidate relation (probe_id, neighbor_id,
    * cosine_pq) — trains the coarse quantizer and the M codebooks,
    * encodes the corpus, and scores every probed list.
    */
  private def pqScored(spark: SparkSession,
      base: org.apache.spark.sql.Dataset[(Long, Array[Double])])
      : DataFrame = {
    import spark.implicits._
    {
      val dim = base.head()._2.length
      require(M == 4, s"row shape is specialized to M=4 (see pin note), got $M")
      require(dim % M == 0, s"dim $dim not divisible by $M subspaces")
      val sub = dim / M
      val coarse = Ivf.kmeansVectors(base, CoarseNlist, CoarseIters)
      val books: Array[Array[Array[Double]]] = (0 until M).map { m =>
        Ivf.kmeansVectors(
          base.map { case (id, v) => (id, v.slice(m * sub, (m + 1) * sub)) },
          Ksub, SubIters)
      }.toArray
      val bcCoarse = spark.sparkContext.broadcast(coarse)
      val bcBooks = spark.sparkContext.broadcast(books)
      // squared norm of each codebook entry — the reconstruction-norm
      // pieces; fixed m-order sum mirrors the oracle exactly
      val bookNorm2 = books.map(_.map(c => dot(c, c)))
      val bcNorm2 = spark.sparkContext.broadcast(bookNorm2)

      val encoded = base.mapPartitions(_.map { case (id, v) =>
        val cluster = Ivf.argminCentroid(v, bcCoarse.value)
        val codes = Array.tabulate(M) { m =>
          Ivf.argminCentroid(v.slice(m * sub, (m + 1) * sub), bcBooks.value(m))
        }
        var n2 = 0.0
        var m = 0
        while (m < M) { n2 += bcNorm2.value(m)(codes(m)); m += 1 }
        (id, cluster, codes(0), codes(1), codes(2), codes(3), math.sqrt(n2))
      }).toDF("vec_id", "cluster", "c0", "c1", "c2", "c3", "approx_nrm")

      // probes: nprobe nearest coarse lists + the per-subspace LUTs of
      // dots against every codebook entry (M × Ksub doubles per probe)
      val probeRows = base.filter(_._1 % 50 == 0).mapPartitions(_.flatMap {
        case (id, v) =>
          val luts = Array.tabulate(M) { m =>
            val qm = v.slice(m * sub, (m + 1) * sub)
            Array.tabulate(Ksub)(kk => dot(qm, bcBooks.value(m)(kk)))
          }
          val pnrm = math.sqrt(dot(v, v))
          bcCoarse.value.indices
            .map(c => (c, Ivf.sqDist(v, bcCoarse.value(c))))
            .sortBy { case (c, d) => (d, c) }
            .take(Nprobe)
            .map { case (c, _) =>
              (id, c, luts(0), luts(1), luts(2), luts(3), pnrm) }
      }).toDF("probe_id", "cluster", "lut0", "lut1", "lut2", "lut3", "pnrm")

      val approxDot =
        element_at(col("lut0"), col("c0") + 1) +
          element_at(col("lut1"), col("c1") + 1) +
          element_at(col("lut2"), col("c2") + 1) +
          element_at(col("lut3"), col("c3") + 1)
      encoded.join(broadcast(probeRows), Seq("cluster"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          (approxDot / (col("pnrm") * col("approx_nrm"))).as("cosine_pq"))
    }
  }

  /** Full DuckDB oracle: coarse k-means + the four per-subspace
    * codebook k-means (all via [[Ivf.kmeansCtesSql]] — one training
    * rule), encode by per-subspace argmin, LUT-free scoring that
    * computes the SAME quantities (dot of the probe sub-vector with
    * the assigned codebook entry, fixed m-order sums, reconstruction
    * norm √Σ|c_m|²).
    */
  /** Shared oracle prefix: everything through the ADC-scored candidate
    * relation `scored` (training, encoding, probe lists, LUT-free
    * scoring).
    */
  private lazy val pqScoredCtesSql: String = {
    def subSlice(m: Int) =
      s"list_slice(v, ${m} * (len(v) // $M) + 1, ${m + 1} * (len(v) // $M))"
    val subVecs = (0 until M).map { m =>
      s"sv$m AS (SELECT vec_id, ${subSlice(m)} AS v FROM vec)"
    }
    val books = (0 until M).map(m =>
      Ivf.kmeansCtesSql(s"bk$m", s"sv$m", Ksub, SubIters))
    val codeCtes = (0 until M).map { m =>
      s"""code$m AS (
         SELECT vec_id, cluster AS code FROM (
           SELECT s.vec_id, c.cluster,
             row_number() OVER (PARTITION BY s.vec_id
               ORDER BY ${Ivf.sqdistSql("s.v", "c.c")}, c.cluster) AS rn
           FROM sv$m s CROSS JOIN bk${m}_cent$SubIters c)
         WHERE rn = 1)"""
    }
    val dotTerms = (0 until M).map(m =>
      s"list_dot_product(p$m.v, e$m.c)").mkString("\n           + ")
    val norm2Terms = (0 until M).map(m =>
      s"list_dot_product(e$m.c, e$m.c)").mkString(" + ")
    val codeJoins = (0 until M).map(m =>
      s"""JOIN code$m k$m ON k$m.vec_id = a.vec_id
         JOIN bk${m}_cent$SubIters e$m ON e$m.cluster = k$m.code
         JOIN sv$m p$m ON p$m.vec_id = pl.probe_id""").mkString("\n         ")
    s"""WITH vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       ${Ivf.kmeansCtesSql("km", "vec", CoarseNlist, CoarseIters)},
       assignf AS (
         SELECT vec_id, cluster FROM (
           SELECT v.vec_id, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY ${Ivf.sqdistSql("v.v", "c.c")}, c.cluster) AS rn
           FROM vec v CROSS JOIN km_cent$CoarseIters c)
         WHERE rn = 1),
       probe_lists AS (
         SELECT probe_id, cluster FROM (
           SELECT p.vec_id AS probe_id, c.cluster,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ${Ivf.sqdistSql("p.v", "c.c")}, c.cluster) AS rn
           FROM vec p CROSS JOIN km_cent$CoarseIters c
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $Nprobe),
       ${subVecs.mkString(",\n       ")},
       ${books.mkString(",\n       ")},
       ${codeCtes.mkString(",\n       ")},
       pn AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS pnrm FROM vec),
       scored AS (
         SELECT pl.probe_id, a.vec_id AS neighbor_id,
           ($dotTerms)
             / (pn.pnrm * sqrt($norm2Terms)) AS cosine_pq
         FROM probe_lists pl
         JOIN assignf a USING (cluster)
         $codeJoins
         JOIN pn ON pn.vec_id = pl.probe_id
         WHERE a.vec_id != pl.probe_id)"""
  }

  val ivfPqTopKSql: String =
    s"""$pqScoredCtesSql
       SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, cosine_pq FROM (
         SELECT probe_id, neighbor_id, cosine_pq,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine_pq DESC, neighbor_id) AS rank
         FROM scored)
       WHERE rank <= $K
       ORDER BY probe_id, rank"""

  /** Oracle for the two-stage path: the SAME scored CTE chain, the PQ
    * top-[[RerankC]] as the candidate set, then exact cosine from the
    * full vectors and a fresh rank — mirrors the engine's exact stage
    * term for term.
    */
  val ivfPqRerankSql: String =
    s"""$pqScoredCtesSql,
       cands AS (
         SELECT probe_id, neighbor_id FROM (
           SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY cosine_pq DESC, neighbor_id) AS rn
           FROM scored)
         WHERE rn <= $RerankC),
       rer AS (
         SELECT c.probe_id, c.neighbor_id,
           list_dot_product(pv.v, nv.v)
             / (sqrt(list_dot_product(pv.v, pv.v))
               * sqrt(list_dot_product(nv.v, nv.v))) AS cosine
         FROM cands c
         JOIN vec pv ON pv.vec_id = c.probe_id
         JOIN vec nv ON nv.vec_id = c.neighbor_id)
       SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
         SELECT probe_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine DESC, neighbor_id) AS rank
         FROM rer)
       WHERE rank <= $K
       ORDER BY probe_id, rank"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq_topk" -> ((s, d) =>
      ivfPqTopK(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))),
    "ann_ivfpq_rerank" -> ((s, d) =>
      ivfPqRerank(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))))

  def oracles: Map[String, String] = Map(
    "ann_ivfpq_topk" -> ivfPqTopKSql,
    "ann_ivfpq_rerank" -> ivfPqRerankSql)
}
