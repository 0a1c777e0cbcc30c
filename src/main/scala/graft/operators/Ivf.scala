package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a deterministic
  * distributed k-means builds `nlist` coarse centroids; each vector
  * lands in one inverted list; a probe searches only its `nprobe`
  * nearest lists.
  *
  * Scale posture: centroids are model state (nlist × dim doubles —
  * kilobytes), legitimately broadcast; every data-sized step is a
  * DataFrame op. Assignment is a per-partition argmin against the
  * broadcast centroids (genuine imperative per-row math — the
  * documented mapPartitions exception); centroid recomputation
  * aggregates per (cluster, dim) with exact decimal sums, so the
  * trained centroids are bit-identical at any partitioning.
  */
object Ivf {

  // NOTE on partitioning: toVec keeps the scan's layout. kmeans runs
  // many small jobs (iters × subspaces) over the cached base, so a
  // repartition here multiplies per-task overhead across every
  // iteration — measured a 1.5× slowdown at sf0.1 — while the argmin
  // sweeps are trivially cheap at any realistic per-partition size. At
  // 100 TB the corpus arrives as many files (the one-partition case is
  // a single-file testdata artifact), so assignment parallelism comes
  // from the source layout.
  private[operators] def toVec(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))

  private[operators] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private[operators] def argminCentroid(v: Array[Double],
      cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      val d = sqDist(v, cs(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic Lloyd iterations: init = the `nlist` lowest vec_ids;
    * per-dim means via exact decimal sums (order-independent).
    */
  def kmeans(emb: DataFrame, nlist: Int, iters: Int = 5): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = toVec(emb).as[(Long, Array[Double])].cache()
    try kmeansVectors(base, nlist, iters)
    finally base.unpersist()
  }

  /** [[kmeans]] over an arbitrary (id, vector) dataset — also serves
    * [[Pq]]'s per-subspace codebook training. The caller owns caching.
    */
  def kmeansVectors(base: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      nlist: Int, iters: Int): Array[Array[Double]] = {
    val spark = base.sparkSession
    import spark.implicits._
    // Domain contract for the exact-decimal reduction below: DECIMAL(36,33)
    // keeps only 3 integer digits, so a coordinate with |x| >= 1000 casts
    // to NULL in Spark (silently dropped from the centroid sum, skewing
    // the means) while DuckDB's mirrored cast raises an error — a
    // silent-wrong vs hard-fail divergence. Fail loudly on both engines:
    // one cheap pass over the (caller-cached) input before training.
    val outOfRange = base.filter(r =>
      r._2.exists(x => x.isNaN || math.abs(x) >= 1000.0)).take(1)
    require(outOfRange.isEmpty,
      s"kmeans input vector id=${outOfRange.headOption.map(_._1).getOrElse(-1L)} " +
        "has a NaN or |coordinate| >= 1000; the DECIMAL(36,33) exact-sum " +
        "reduction is only lossless for |x| < 1000")
    // first column is the id by construction (works for both named
    // (vec_id, v) frames and tuple-encoded (_1, _2) datasets)
    var centroids = base.orderBy(col(base.columns.head)).take(nlist).map(_._2)
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = base.mapPartitions(_.map { case (_, v) =>
        (argminCentroid(v, bc.value), v)
      }).toDF("cluster", "v")
      // decimal(36,33): Spark's double→decimal cast quantizes the
      // SHORTEST string repr (Double.toString, ≤17 significant digits),
      // which scale 33 holds exactly — no rounding, so no HALF_UP (here)
      // vs HALF_EVEN (DuckDB) tie-breaking can bite. A rounding scale
      // like 12 diverges two ways on real data: exact ties on values
      // whose expansion terminates at digit 13 (0.1983642578125-style
      // quantized floats), and shortest-repr vs exact-binary-expansion
      // disagreements in the rounded digits. The oracle mirrors by
      // casting ITS shortest repr (double→VARCHAR→DECIMAL(36,33)); the
      // sums are then identical decimals and the mean below is the
      // correctly rounded double on both sides
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("x").cast("decimal(36,33)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val c = r.getAs[Int]("cluster")
        val d = r.getAs[Int]("dim")
        next(c)(d) = (r.getAs[java.math.BigDecimal]("s").doubleValue()
          / r.getAs[Long]("n"))
      }
      centroids = next
    }
    centroids
  }

  /** ANN top-k through the inverted lists. Probes = vec_id % 50 == 0
    * (same probe set as the brute-force baseline for recall checks).
    */
  def ivfTopK(emb: DataFrame, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = kmeans(emb, nlist)
    val bc = spark.sparkContext.broadcast(centroids)

    // persist: assignment and probe fan-out both scan this (kmeans
    // manages its own persisted copy); released once the top-k result
    // materializes inside withCached
    val base = toVec(emb).as[(Long, Array[Double])]
    graft.Caching.withCached(base) {
      val assigned = base.mapPartitions(_.map { case (id, v) =>
        (id, v, argminCentroid(v, bc.value))
      }).toDF("vec_id", "v", "cluster")
        .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))

      // each probe fans out to its nprobe nearest lists
      val probeLists = base.filter(_._1 % 50 == 0).mapPartitions(_.flatMap {
        case (id, v) =>
          bc.value.indices
            .map(c => (c, sqDist(v, bc.value(c))))
            .sortBy { case (c, d) => (d, c) }
            .take(nprobe)
            .map { case (c, _) => (id, v, c) }
      }).toDF("probe_id", "pv", "cluster")
        .withColumn("pnrm", sqrt(Similarity.dot(col("pv"), col("pv"))))

      val scored = assigned.join(broadcast(probeLists), Seq("cluster"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
            col("pnrm"), col("nrm")).as("cosine"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= k)
        .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
    }
  }

  /** Full DuckDB oracle for `ann_ivf_topk` with the registered defaults
    * (k=5, nlist=16, nprobe=4, 5 Lloyd iterations): the deterministic
    * k-means is unrolled as one CTE block per iteration. Exact-parity
    * mechanics: squared distances fold sequentially via
    * `list_dot_product` of the element-wise difference (bit-equal to
    * [[sqDist]]'s running loop — double addition order matches);
    * centroid means use the same DECIMAL(30,12) exact sums; all argmin
    * ties break on the lower cluster index, mirroring the strict `<` in
    * [[argminCentroid]] via `ORDER BY dist, cluster`; empty clusters
    * keep their previous centroid via the COALESCE in `cent_i`.
    */
  /** Sequential-fold squared distance in DuckDB — bit-equal to
    * [[sqDist]]'s running loop.
    */
  private[operators] def sqdistSql(v: String, c: String): String = {
    val d = s"list_transform(generate_series(1, len($v)), j -> $v[j] - $c[j])"
    s"list_dot_product($d, $d)"
  }

  /** Shared k-means oracle CTE block over a vectors CTE `src`
    * (vec_id, v): init from the `nlist` lowest vec_ids, `iters` Lloyd
    * rounds with DECIMAL(36,33) exact sums (exact: see kmeansVectors), lower-cluster tie-breaks,
    * empty clusters carrying the previous centroid. All CTE names are
    * prefixed `nm`; the trained centroids land in `${nm}_cent$iters`
    * (cluster, c). Reused by [[ivfTopKSql]] and [[Pq.ivfPqTopKSql]]'s
    * per-subspace codebooks so the training rule has one definition.
    */
  private[operators] def kmeansCtesSql(nm: String, src: String,
      nlist: Int, iters: Int): String = {
    val head = Seq(
      s"""${nm}_dims AS (SELECT vec_id, u.j - 1 AS dim, v[u.j] AS x
         FROM $src, UNNEST(generate_series(1, len(v))) AS u(j))""",
      s"""${nm}_cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
         FROM (SELECT vec_id, v FROM $src ORDER BY vec_id LIMIT $nlist))""")
    val iterCtes = (1 to iters).flatMap { i =>
      Seq(
        s"""${nm}_a$i AS (
           SELECT vec_id, cluster FROM (
             SELECT v.vec_id, c.cluster,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY ${sqdistSql("v.v", "c.c")}, c.cluster) AS rn
             FROM $src v CROSS JOIN ${nm}_cent${i - 1} c)
           WHERE rn = 1)""",
        s"""${nm}_m$i AS (
           SELECT a.cluster, d.dim,
             CAST(CAST(SUM(CAST(CAST(d.x AS VARCHAR) AS DECIMAL(36,33))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS x
           FROM ${nm}_a$i a JOIN ${nm}_dims d USING (vec_id)
           GROUP BY a.cluster, d.dim)""",
        s"""${nm}_n$i AS (
           SELECT cluster, list(x ORDER BY dim) AS c FROM ${nm}_m$i GROUP BY cluster)""",
        s"""${nm}_cent$i AS (
           SELECT p.cluster, COALESCE(n.c, p.c) AS c
           FROM ${nm}_cent${i - 1} p LEFT JOIN ${nm}_n$i n USING (cluster))""")
    }
    (head ++ iterCtes).mkString(",\n       ")
  }

  val ivfTopKSql: String = {
    val nlist = 16; val nprobe = 4; val k = 5; val iters = 5
    def sqdist(v: String, c: String): String = sqdistSql(v, c)
    val head = Seq(
      "vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)",
      kmeansCtesSql("km", "vec", nlist, iters))
    val tail = Seq(
      s"""assignf AS (
         SELECT vec_id, cluster FROM (
           SELECT v.vec_id, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY ${sqdist("v.v", "c.c")}, c.cluster) AS rn
           FROM vec v CROSS JOIN km_cent$iters c)
         WHERE rn = 1)""",
      s"""probe_lists AS (
         SELECT probe_id, cluster FROM (
           SELECT p.vec_id AS probe_id, c.cluster,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ${sqdist("p.v", "c.c")}, c.cluster) AS rn
           FROM vec p CROSS JOIN km_cent$iters c
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $nprobe)""",
      """scored AS (
         SELECT pl.probe_id, a.vec_id AS neighbor_id,
           list_dot_product(pv.v, nv.v)
             / (sqrt(list_dot_product(pv.v, pv.v)) * sqrt(list_dot_product(nv.v, nv.v)))
             AS cosine
         FROM probe_lists pl
         JOIN assignf a USING (cluster)
         JOIN vec pv ON pv.vec_id = pl.probe_id
         JOIN vec nv ON nv.vec_id = a.vec_id
         WHERE a.vec_id != pl.probe_id)""")
    (head ++ tail).mkString("WITH ", ",\n       ", "") +
      s"""
       SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, cosine FROM (
         SELECT probe_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
         FROM scored)
       WHERE rank <= $k
       ORDER BY probe_id, rank"""
  }

  /** k-NN CLASSIFICATION through the IVF candidate stage — the
    * PRODUCTION composition of the ANN family with the majority vote:
    * [[Similarity.knnClassifier]] registers the brute-force sweep as
    * the baseline discipline; this registers the scalable path (each
    * probe scores only its `nprobe` inverted lists' TRAIN vectors,
    * never the corpus) with the vote unchanged (k exact-cosine-ranked
    * candidates, majority label, ties to the smaller label).
    *
    * Honesty discipline (the `ann_recall_bounds` pattern): the gate
    * computes the EXACT-vote classifier in the same run and asserts
    * the ANN predictions agree on at least `agreementFloor` of the
    * probes — a silent candidate-quality collapse fails the gate, it
    * does not ship quietly. The emitted rows are the ANN predictions
    * themselves, deterministic end to end (fold-exact k-means,
    * id-tiebroken ranks, integer votes), so the DuckDB oracle mirrors
    * the IVF vote exactly — hash-equality, not just the floor.
    *
    * SCALE NOTE — the agreement check is GATE discipline, not part of
    * the production classifier: the exact vote is a probe × train
    * sweep, affordable at gate scale (per-round, small SF) precisely
    * because it is the thing the IVF path exists to avoid at corpus
    * scale. A production deployment keeps the floor but computes it
    * over a hash-sampled probe subset (e.g.
    * `pmod(hash(probe_id), 100) = 0` — deterministic, unbiased, and
    * O(|probes|/100 × train) instead of O(probes × train)), or runs
    * it as a scheduled audit job, never inline on the serving path.
    * Set `agreementCheck = false` to skip the sweep and emit the ANN
    * predictions alone — the production serving configuration.
    */
  def ivfKnnClassifier(emb: DataFrame, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 12, agreementFloor: Double = 0.8,
      agreementCheck: Boolean = true): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = kmeans(emb, nlist)
    val bc = spark.sparkContext.broadcast(centroids)
    val labels = emb.select(col("vec_id"), col("label"))
    val base = toVec(emb).as[(Long, Array[Double])]
    val ann = graft.Caching.withCached(base) {
      val train = base.mapPartitions(_.map { case (id, v) =>
        (id, v, argminCentroid(v, bc.value))
      }).toDF("vec_id", "v", "cluster")
        .filter(col("vec_id") % 50 =!= 0) // neighbors come from TRAIN
        .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
        .join(labels.withColumnRenamed("label", "n_label"), Seq("vec_id"))
      val probeLists = base.filter(_._1 % 50 == 0).mapPartitions(_.flatMap {
        case (id, v) =>
          bc.value.indices
            .map(c => (c, sqDist(v, bc.value(c))))
            .sortBy { case (c, d) => (d, c) }
            .take(nprobe)
            .map { case (c, _) => (id, v, c) }
      }).toDF("probe_id", "pv", "cluster")
        .withColumn("pnrm", sqrt(Similarity.dot(col("pv"), col("pv"))))
      val scored = train.join(broadcast(probeLists), Seq("cluster"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("n_label"),
          Similarity.cosinePre(Similarity.dot(col("pv"), col("v")),
            col("pnrm"), col("nrm")).as("cosine"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      val votes = scored
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .groupBy(col("probe_id"), col("n_label"))
        .agg(count(lit(1)).as("votes"))
      val vw = Window.partitionBy(col("probe_id"))
        .orderBy(col("votes").desc, col("n_label"))
      votes.withColumn("vr", row_number().over(vw)).filter(col("vr") === 1)
        .join(labels.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("probe_id"),
            col("label").as("true_label")), Seq("probe_id"))
        .select(col("probe_id"), col("true_label"),
          col("n_label").as("predicted_label"), col("votes"),
          (col("n_label") === col("true_label")).as("correct"))
        .localCheckpoint(true) // reused: agreement check + output
    }
    // the honesty floor: ANN vote vs the exact brute-force vote.
    // GATE-ONLY sweep — see the scale note in the scaladoc; production
    // serving passes agreementCheck = false (or samples the probes).
    if (agreementCheck) {
      val exact = Similarity.knnClassifier(emb, k)
        .select(col("probe_id"), col("predicted_label").as("exact_label"))
      val agreement = ann.join(exact, Seq("probe_id"))
        .agg(avg((col("predicted_label") === col("exact_label"))
          .cast("double")).as("a")).head().getDouble(0)
      require(agreement >= agreementFloor,
        f"IVF k-NN classifier agrees with the exact vote on only " +
          f"$agreement%.3f of probes (floor $agreementFloor%.2f) — " +
          "candidate stage recall collapsed")
    }
    ann.withColumn("agreement_floor_met", lit(agreementCheck))
  }

  /** Full DuckDB oracle for `emb_knn_classifier_ann` (k=5, nlist=16,
    * nprobe=12): the IVF candidate CTEs of [[ivfTopKSql]] restricted to
    * the train side, then the exact vote of
    * [[Similarity.knnClassifierSql]]. nprobe is high for an IVF
    * because the synthetic embeddings are iid-random — recall per
    * scanned fraction is worst-case by construction (no cluster
    * structure for the coarse quantizer to exploit); real embedding
    * corpora cluster, and the SAME composition holds its floor at far
    * smaller nprobe. The gate pins the DISCIPLINE (candidate stage +
    * unchanged vote + asserted agreement floor), not a tuned number.
    */
  val ivfKnnClassifierSql: String = {
    val nlist = 16; val nprobe = 12; val k = 5; val iters = 5
    def sqdist(v: String, c: String): String = sqdistSql(v, c)
    val head = Seq(
      "vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)",
      kmeansCtesSql("km", "vec", nlist, iters))
    val tail = Seq(
      s"""assignf AS (
         SELECT vec_id, cluster FROM (
           SELECT v.vec_id, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY ${sqdist("v.v", "c.c")}, c.cluster) AS rn
           FROM vec v CROSS JOIN km_cent$iters c)
         WHERE rn = 1)""",
      s"""probe_lists AS (
         SELECT probe_id, cluster FROM (
           SELECT p.vec_id AS probe_id, c.cluster,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ${sqdist("p.v", "c.c")}, c.cluster) AS rn
           FROM vec p CROSS JOIN km_cent$iters c
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $nprobe)""",
      """scored AS (
         SELECT pl.probe_id, a.vec_id AS neighbor_id, e.label AS n_label,
           list_dot_product(pv.v, nv.v)
             / (sqrt(list_dot_product(pv.v, pv.v)) * sqrt(list_dot_product(nv.v, nv.v)))
             AS cosine
         FROM probe_lists pl
         JOIN assignf a USING (cluster)
         JOIN vec pv ON pv.vec_id = pl.probe_id
         JOIN vec nv ON nv.vec_id = a.vec_id
         JOIN embeddings e ON e.vec_id = a.vec_id
         WHERE a.vec_id % 50 <> 0)""",
      s"""ranked AS (
         SELECT *, row_number() OVER (PARTITION BY probe_id
           ORDER BY cosine DESC, neighbor_id) AS rank
         FROM scored)""",
      s"""votes AS (
         SELECT probe_id, n_label, COUNT(*) AS votes
         FROM ranked WHERE rank <= $k
         GROUP BY 1, 2)""",
      """winner AS (
         SELECT *, row_number() OVER (PARTITION BY probe_id
           ORDER BY votes DESC, n_label) AS vr
         FROM votes)""")
    (head ++ tail).mkString("WITH ", ",\n       ", "") +
      """
       SELECT w.probe_id, e.label AS true_label,
         w.n_label AS predicted_label, w.votes,
         w.n_label = e.label AS correct, true AS agreement_floor_met
       FROM winner w
       JOIN embeddings e ON e.vec_id = w.probe_id
       WHERE w.vr = 1
       ORDER BY w.probe_id"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_topk" -> ((s, d) =>
      ivfTopK(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))),
    "emb_knn_classifier_ann" -> ((s, d) =>
      ivfKnnClassifier(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"))))

  def oracles: Map[String, String] = Map(
    "ann_ivf_topk" -> ivfTopKSql,
    "emb_knn_classifier_ann" -> ivfKnnClassifierSql)
}
