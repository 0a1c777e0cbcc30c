package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BINARY QUANTIZATION approximate nearest neighbor — the 1-bit
  * vector-memory format modern engines put UNDER their graph/IVF
  * indexes (Lucene/Elasticsearch BBQ, RaBitQ): each vector is encoded
  * as the SIGN BITS of [[Bits]] deterministic ±1 hyperplane projections
  * ([[Similarity.planeSigns]] — the parity-mixed FNV family), packed
  * into `Bits/64` BIGINT words — for this corpus 4 words = 32 bytes vs
  * 256 bytes of float32, an 8× shrink — and the scan-stage distance is
  * `hamming_words(sig_a, sig_b)`: one XOR + POPCNT per word inside
  * whole-stage codegen ([[graft.functions.HammingWords]], native for
  * the same interpreted-lambda reason as VecDot).
  *
  * Two stages, the BQ contract:
  *  1. COMPRESSED SCAN — probes broadcast against the packed
  *     signatures; top-C candidates per probe by (hamming, id). At
  *     100 TB this stage reads 32 bytes/vector instead of 256 — the
  *     encode (256 dot folds per vector, the rotation-projection cost
  *     every BQ system pays) runs ONCE at write time.
  *  2. EXACT RERANK — only the C survivors join back to their float
  *     vectors (key-equality joins) for true cosine top-K.
  *
  * Projecting to 256 bits rather than sign-of-raw-dims matters: with
  * 64 raw dims the hamming estimator has 64 samples of the angle and
  * recall@5 measured 0.33 at sf0.1; 256 projections quadruple the
  * sample count (σ ∝ 1/√bits) — measured recall@5 0.86 at C=100.
  *
  * Determinism: hamming is integer-exact and mirrored in the oracle
  * through the sign-vector identity `(Bits − dot(±1, ±1)) / 2`; the
  * rerank cosine is the strict left-fold dot shared with the
  * brute-force gate (bit-exact vs DuckDB). The gate also measures
  * recall@K against the exact brute-force truth on the same probes and
  * asserts a floor — the honesty check every ANN gate here carries.
  *
  * Reference analog: the reference delegates vector search to its
  * serving layer; this is the quantized-scan half a 100 TB training
  * pipeline needs for semantic dedup / retrieval passes.
  */
object Bq {

  val Bits = 256
  val C = 100 // compressed-scan survivors per probe
  val K = 5
  /** Floor for recall@K of the rerank output vs exact truth, asserted
    * in-gate (measured 0.86 at sf0.1 — where C=100 is 5% of the corpus
    * — and higher at smaller scale factors).
    */
  val RecallFloor = 0.60

  private def asDouble(e: Column): Column =
    transform(e, x => x.cast("double"))

  /** One packed signature word: sign bits of planes
    * `[word·64, word·64+64)`. Plane ids are global (shared family with
    * the LSH gates), so the oracle re-derives them from the same
    * `"<planeId>,<i>"` strings.
    */
  private def sigWord(v: Column, word: Int, dim: Int): Column =
    (0 until 64).map { p =>
      val plane = typedlit(Similarity.planeSigns(word * 64 + p, dim))
      when(Similarity.dot(v, plane) > 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }.reduce(_ + _) // distinct bits: + ≡ |

  /** (vec_id, v, nrm, sig) — the encoded corpus; exposed for the spec's
    * engine-vs-reference signature check.
    */
  def signatures(emb: DataFrame): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .withColumn("sig",
        array((0 until Bits / 64).map(w => sigWord(col("v"), w, dim)): _*))
  }

  /** Driver-side reference encoding, for the spec. */
  def referenceSignature(v: Array[Double]): Array[Long] =
    Array.tabulate(Bits / 64) { w =>
      (0 until 64).foldLeft(0L) { (acc, p) =>
        val plane = Similarity.planeSigns(w * 64 + p, v.length)
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * plane(i); i += 1 }
        if (s > 0) acc | (1L << p) else acc
      }
    }

  def bqRerank(emb: DataFrame): DataFrame = {
    // repartition: same reason as the brute-force gate — the scan must
    // not inherit a single-file corpus's one-partition layout
    val b = signatures(emb).repartition(col("vec_id"))
    graft.Caching.withCached(b) {
      val probeSigs = b.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("probe_id"), col("sig").as("psig"))
      // stage 1: quantized scan — 32 bytes/vector, XOR + POPCNT/word
      val cand = b.select(col("vec_id"), col("sig"))
        .join(broadcast(probeSigs), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          call_function("hamming_words", col("sig"), col("psig"))
            .as("hamming"))
      val wc = Window.partitionBy(col("probe_id"))
        .orderBy(col("hamming"), col("neighbor_id"))
      val survivors = cand.withColumn("rn", row_number().over(wc))
        .filter(col("rn") <= C).drop("rn")
      // stage 2: exact rerank of the C survivors only — key-equality
      // joins (corpus side on vec_id, probe side broadcast)
      val rer = survivors
        .join(b.select(col("vec_id").as("neighbor_id"), col("v"),
          col("nrm")), Seq("neighbor_id"))
        .join(broadcast(b.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("probe_id"), col("v").as("pv"),
            col("nrm").as("pnrm"))), Seq("probe_id"))
        .select(col("probe_id"), col("neighbor_id"), col("hamming"),
          when(col("pnrm") * col("nrm") > 0,
            Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
              col("pnrm"), col("nrm"))).otherwise(lit(0.0)).as("cosine"))
      val wr = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      rer.withColumn("rank", row_number().over(wr).cast("int"))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("rank"), col("neighbor_id"),
          col("hamming"), col("cosine"))
    }
  }

  /** [[bqRerank]] plus the in-gate recall honesty check vs the exact
    * brute-force truth on the same probes.
    */
  def bqRerankGate(emb: DataFrame): DataFrame = {
    val out = bqRerank(emb)
    val truth = Similarity.bruteForceTopK(emb, K)
      .select(col("probe_id"), col("neighbor_id"))
    // one job instead of two executions of the brute-force truth (r17)
    val (hits, total) = graft.Dist.hitsAndTotal(
      out.select(col("probe_id"), col("neighbor_id")), truth)
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(
      f"[ann_bq_rerank] recall@$K=$recall%.4f ($hits/$total) floor=$RecallFloor")
    require(recall >= RecallFloor,
      f"BQ recall@$K $recall%.3f below floor $RecallFloor " +
        s"($hits/$total exact neighbors recovered)")
    out
  }

  /** Oracle: plane signs re-derived from the same `"<planeId>,<i>"`
    * strings (OracleFnv parity fold — the [[Similarity]] generator's
    * SQL twin), hamming via the sign-vector identity
    * `(Bits − dot(s_a, s_b)) / 2` over ±1 projection-sign vectors
    * (integer-exact in doubles), candidate cut and rerank mirrored
    * exactly.
    */
  val bqRerankSql: String = {
    val planeStr = "CAST(pl.p AS VARCHAR) || ',' || CAST(j - 1 AS VARCHAR)"
    s"""WITH vec AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       dimn AS (SELECT max(len(v)) AS n FROM vec),
       pl AS (SELECT p FROM UNNEST(generate_series(0, ${Bits - 1})) t(p)),
       signs AS (
         SELECT pl.p,
           list_transform(
             list_transform(generate_series(1, (SELECT n FROM dimn)),
               j -> ${OracleFnv.fold(s"hex(encode($planeStr))")}),
             h -> CASE WHEN
                 (bit_count(CAST(h // CAST(4294967296 AS HUGEINT) AS BIGINT))
                  + bit_count(CAST(h % CAST(4294967296 AS HUGEINT) AS BIGINT)))
                 % 2 = 1
               THEN 1.0 ELSE -1.0 END) AS sv
         FROM pl),
       sbits AS (
         SELECT v.vec_id,
           list(CASE WHEN list_dot_product(v.v, s.sv) > 0
                THEN 1.0 ELSE -1.0 END ORDER BY s.p) AS bs
         FROM vec v CROSS JOIN signs s
         GROUP BY v.vec_id),
       cand AS (
         SELECT probe_id, neighbor_id, hamming FROM (
           SELECT p.vec_id AS probe_id, a.vec_id AS neighbor_id,
             CAST(($Bits - list_dot_product(p.bs, a.bs)) / 2 AS INT)
               AS hamming,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ($Bits - list_dot_product(p.bs, a.bs)) / 2,
                 a.vec_id) AS rn
           FROM sbits p JOIN sbits a ON a.vec_id <> p.vec_id
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $C),
       rer AS (
         SELECT c.probe_id, c.neighbor_id, c.hamming,
           CASE WHEN sqrt(list_dot_product(pv.v, pv.v))
               * sqrt(list_dot_product(av.v, av.v)) > 0
             THEN list_dot_product(pv.v, av.v)
               / (sqrt(list_dot_product(pv.v, pv.v))
                 * sqrt(list_dot_product(av.v, av.v)))
             ELSE 0.0 END AS cosine
         FROM cand c
         JOIN vec pv ON pv.vec_id = c.probe_id
         JOIN vec av ON av.vec_id = c.neighbor_id)
       SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, hamming,
         cosine
       FROM (
         SELECT *, row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, neighbor_id) AS rank
         FROM rer)
       WHERE rank <= $K
       ORDER BY probe_id, rank"""
  }

  // ---- IVF-routed BQ — the production composition ---------------------------

  val IvfNlist = 16
  val IvfIters = 5
  val Nprobe = 4
  val IvfC = 50 // hamming survivors per probe within the probed lists
  /** Floor for the ROUTED path: recall is bounded by IVF routing
    * (ann_ivf's own floor is 0.3 at Nprobe=4/16) intersected with the
    * binary-code cut.
    */
  val IvfRecallFloor = 0.25

  /** Coarse quantizer OVER binary codes — how production systems
    * actually deploy BQ (Lucene joins it to HNSW, Milvus/Faiss to IVF):
    * the [[Ivf]] k-means router prunes the corpus to `Nprobe/Nlist`,
    * the 32-byte signatures make the within-list scan two instructions
    * per pair, and only `IvfC` survivors per probe touch float data.
    * At 100 TB the scan stage reads `Nprobe/Nlist × 32 bytes` per
    * corpus vector — routing and compression multiply. Candidates come
    * from key-equality joins on the probed cluster; the only broadcast
    * is the probe set. Same determinism story as [[bqRerank]] +
    * [[Ivf]] (integer-exact hamming, decimal-exact centroids,
    * left-fold cosines).
    */
  def bqIvfTopK(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = Ivf.toVec(emb).as[(Long, Array[Double])]
    graft.Caching.withCached(base) {
      val coarse = Ivf.kmeansVectors(base, IvfNlist, IvfIters)
      val bc = spark.sparkContext.broadcast(coarse)
      val dim = coarse(0).length
      val enc = base.mapPartitions(_.map { case (id, v) =>
        (id, Ivf.argminCentroid(v, bc.value), v)
      }).toDF("vec_id", "cluster", "v")
        .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
        .withColumn("sig",
          array((0 until Bits / 64).map(w => sigWord(col("v"), w, dim)): _*))
      val probeRoutes = base.filter(_._1 % 50 == 0)
        .mapPartitions(_.flatMap { case (id, v) =>
          bc.value.indices
            .map(c => (c, Ivf.sqDist(v, bc.value(c))))
            .sortBy { case (c, d) => (d, c) }
            .take(Nprobe)
            .map { case (c, _) => (id, c) }
        }).toDF("probe_id", "cluster")
      val probeData = enc.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("probe_id"), col("sig").as("psig"),
          col("v").as("pv"), col("nrm").as("pnrm"))
      // stage 1: within the probed lists only — cluster-key join, then
      // the two-instruction hamming scan over packed codes
      val cand = enc.select(col("vec_id"), col("cluster"), col("sig"))
        .join(broadcast(probeRoutes
          .join(probeData.select(col("probe_id"), col("psig")), "probe_id")),
          Seq("cluster"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          call_function("hamming_words", col("sig"), col("psig"))
            .as("hamming"))
      val wc = Window.partitionBy(col("probe_id"))
        .orderBy(col("hamming"), col("neighbor_id"))
      val survivors = cand.withColumn("rn", row_number().over(wc))
        .filter(col("rn") <= IvfC).drop("rn")
      // stage 2: exact rerank of the survivors only
      val rer = survivors
        .join(enc.select(col("vec_id").as("neighbor_id"), col("v"),
          col("nrm")), Seq("neighbor_id"))
        .join(broadcast(probeData.select(col("probe_id"), col("pv"),
          col("pnrm"))), Seq("probe_id"))
        .select(col("probe_id"), col("neighbor_id"), col("hamming"),
          when(col("pnrm") * col("nrm") > 0,
            Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
              col("pnrm"), col("nrm"))).otherwise(lit(0.0)).as("cosine"))
      val wr = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      rer.withColumn("rank", row_number().over(wr).cast("int"))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("rank"), col("neighbor_id"),
          col("hamming"), col("cosine"))
    }
  }

  /** [[bqIvfTopK]] plus the in-gate recall honesty check. */
  def bqIvfGate(emb: DataFrame): DataFrame = {
    val out = bqIvfTopK(emb)
    val truth = Similarity.bruteForceTopK(emb, K)
      .select(col("probe_id"), col("neighbor_id"))
    // one job instead of two executions of the brute-force truth (r17)
    val (hits, total) = graft.Dist.hitsAndTotal(
      out.select(col("probe_id"), col("neighbor_id")), truth)
    val recall = if (total == 0) 1.0 else hits.toDouble / total
    System.err.println(
      f"[ann_bq_ivf] recall@$K=$recall%.4f ($hits/$total) floor=$IvfRecallFloor")
    require(recall >= IvfRecallFloor,
      f"IVF-BQ recall@$K $recall%.3f below floor $IvfRecallFloor " +
        s"($hits/$total exact neighbors recovered)")
    out
  }

  /** Oracle: the [[Ivf]] k-means + routing CTEs (shared with the
    * PQ/SQ family) composed with the BQ sign CTEs; hamming within the
    * probed lists via the sign-vector identity, rerank exact.
    */
  val bqIvfTopKSql: String = {
    val planeStr = "CAST(pl.p AS VARCHAR) || ',' || CAST(j - 1 AS VARCHAR)"
    s"""WITH vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       ${Ivf.kmeansCtesSql("km", "vec", IvfNlist, IvfIters)},
       assignf AS (
         SELECT vec_id, cluster FROM (
           SELECT v.vec_id, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY ${Ivf.sqdistSql("v.v", "c.c")}, c.cluster) AS rn
           FROM vec v CROSS JOIN km_cent$IvfIters c)
         WHERE rn = 1),
       probe_lists AS (
         SELECT probe_id, cluster FROM (
           SELECT p.vec_id AS probe_id, c.cluster,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ${Ivf.sqdistSql("p.v", "c.c")}, c.cluster) AS rn
           FROM vec p CROSS JOIN km_cent$IvfIters c
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $Nprobe),
       dimn AS (SELECT max(len(v)) AS n FROM vec),
       pl AS (SELECT p FROM UNNEST(generate_series(0, ${Bits - 1})) t(p)),
       signs AS (
         SELECT pl.p,
           list_transform(
             list_transform(generate_series(1, (SELECT n FROM dimn)),
               j -> ${OracleFnv.fold(s"hex(encode($planeStr))")}),
             h -> CASE WHEN
                 (bit_count(CAST(h // CAST(4294967296 AS HUGEINT) AS BIGINT))
                  + bit_count(CAST(h % CAST(4294967296 AS HUGEINT) AS BIGINT)))
                 % 2 = 1
               THEN 1.0 ELSE -1.0 END) AS sv
         FROM pl),
       sbits AS (
         SELECT v.vec_id,
           list(CASE WHEN list_dot_product(v.v, s.sv) > 0
                THEN 1.0 ELSE -1.0 END ORDER BY s.p) AS bs
         FROM vec v CROSS JOIN signs s
         GROUP BY v.vec_id),
       cand AS (
         SELECT probe_id, neighbor_id, hamming FROM (
           SELECT pls.probe_id, a.vec_id AS neighbor_id,
             CAST(($Bits - list_dot_product(pb.bs, ab.bs)) / 2 AS INT)
               AS hamming,
             row_number() OVER (PARTITION BY pls.probe_id
               ORDER BY ($Bits - list_dot_product(pb.bs, ab.bs)) / 2,
                 a.vec_id) AS rn
           FROM probe_lists pls
           JOIN assignf a USING (cluster)
           JOIN sbits ab ON ab.vec_id = a.vec_id
           JOIN sbits pb ON pb.vec_id = pls.probe_id
           WHERE a.vec_id <> pls.probe_id)
         WHERE rn <= $IvfC),
       rer AS (
         SELECT c.probe_id, c.neighbor_id, c.hamming,
           CASE WHEN sqrt(list_dot_product(pv.v, pv.v))
               * sqrt(list_dot_product(av.v, av.v)) > 0
             THEN list_dot_product(pv.v, av.v)
               / (sqrt(list_dot_product(pv.v, pv.v))
                 * sqrt(list_dot_product(av.v, av.v)))
             ELSE 0.0 END AS cosine
         FROM cand c
         JOIN vec pv ON pv.vec_id = c.probe_id
         JOIN vec av ON av.vec_id = c.neighbor_id)
       SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, hamming,
         cosine
       FROM (
         SELECT *, row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, neighbor_id) AS rank
         FROM rer)
       WHERE rank <= $K
       ORDER BY probe_id, rank"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bq_rerank" -> ((s, d) =>
      bqRerankGate(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))),
    "ann_bq_ivf" -> ((s, d) =>
      bqIvfGate(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))))

  def oracles: Map[String, String] = Map(
    "ann_bq_rerank" -> bqRerankSql,
    "ann_bq_ivf" -> bqIvfTopKSql)
}
