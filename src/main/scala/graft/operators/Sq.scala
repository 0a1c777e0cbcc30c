package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF + INT8 SCALAR QUANTIZATION approximate nearest neighbor — the
  * most widely deployed vector-memory format: each stored vector keeps
  * one byte per dimension (`q_i = trunc(x_i·127 / max|x|)`), an 8×
  * shrink that, unlike PQ, needs no codebook training and decodes by
  * multiplication alone. The [[Ivf]] coarse quantizer routes probes to
  * inverted lists; within a probed list the approximate cosine is
  * computed ENTIRELY in the integer domain —
  * `Σ qa·qb / (√Σqa² · √Σqb²)` — because cosine is scale-invariant the
  * per-vector scales cancel and never need storing.
  *
  * Determinism is stronger than the float paths': every dot term is a
  * product of integers ≤127², partial sums stay far below 2⁵³, so ANY
  * summation order yields the identical double — the oracle and the
  * engine cannot disagree regardless of partitioning. The only
  * rounding sites are the encode (`(x·127.0)/mx` — IEEE × ÷, then
  * exact trunc) and the final ÷/√ on exact integer sums, all
  * exact-parity ops per §3. Scale posture mirrors [[Ivf]]: centroids
  * are broadcast model state, candidates come from key-equality joins
  * on the probed cluster — never all-pairs.
  */
object Sq {

  val Nlist = 16
  val Iters = 5
  val Nprobe = 4
  val K = 5

  def sqTopK(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = Ivf.toVec(emb).as[(Long, Array[Double])]
    graft.Caching.withCached(base) {
      val coarse = Ivf.kmeansVectors(base, Nlist, Iters)
      val bc = spark.sparkContext.broadcast(coarse)
      def quantize(v: Array[Double]): Array[Double] = {
        var mx = 0.0
        var i = 0
        while (i < v.length) {
          val a = math.abs(v(i)); if (a > mx) mx = a; i += 1
        }
        if (mx == 0.0) new Array[Double](v.length)
        else v.map(x => ((x * 127.0) / mx).toLong.toDouble)
      }
      val encoded = base.mapPartitions(_.map { case (id, v) =>
        (id, Ivf.argminCentroid(v, bc.value), quantize(v))
      }).toDF("vec_id", "cluster", "q")
      val probeRows = base.filter(_._1 % 50 == 0).mapPartitions(_.flatMap {
        case (id, v) =>
          val q = quantize(v)
          bc.value.indices
            .map(c => (c, Ivf.sqDist(v, bc.value(c))))
            .sortBy { case (c, d) => (d, c) }
            .take(Nprobe)
            .map { case (c, _) => (id, c, q) }
      }).toDF("probe_id", "cluster", "pq")
      val dotPq = Similarity.dot(col("pq"), col("q"))
      val nrmP = sqrt(Similarity.dot(col("pq"), col("pq")))
      val nrmA = sqrt(Similarity.dot(col("q"), col("q")))
      val scored = encoded.join(broadcast(probeRows), Seq("cluster"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          when(nrmP * nrmA > 0, dotPq / (nrmP * nrmA))
            .otherwise(lit(0.0)).as("cosine_sq"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine_sq").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("rank"), col("neighbor_id"),
          col("cosine_sq"))
    }
  }

  /** Oracle: the same IVF routing CTEs as the PQ family, with encode
    * mirrored as `trunc((x·127.0)/mx)` per element and scoring as
    * integer-domain dot/norms.
    */
  val sqTopKSql: String =
    s"""WITH vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       ${Ivf.kmeansCtesSql("km", "vec", Nlist, Iters)},
       assignf AS (
         SELECT vec_id, cluster FROM (
           SELECT v.vec_id, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY ${Ivf.sqdistSql("v.v", "c.c")}, c.cluster) AS rn
           FROM vec v CROSS JOIN km_cent$Iters c)
         WHERE rn = 1),
       probe_lists AS (
         SELECT probe_id, cluster FROM (
           SELECT p.vec_id AS probe_id, c.cluster,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY ${Ivf.sqdistSql("p.v", "c.c")}, c.cluster) AS rn
           FROM vec p CROSS JOIN km_cent$Iters c
           WHERE p.vec_id % 50 = 0)
         WHERE rn <= $Nprobe),
       qv AS (
         SELECT vec_id,
           CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
             ELSE list_transform(v,
               x -> CAST(CAST(trunc((x * 127.0) / mx) AS BIGINT) AS DOUBLE))
           END AS q
         FROM (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS mx
           FROM vec)),
       scored AS (
         SELECT pl.probe_id, a.vec_id AS neighbor_id,
           CASE WHEN sqrt(list_dot_product(qp.q, qp.q))
               * sqrt(list_dot_product(qa.q, qa.q)) > 0
             THEN list_dot_product(qp.q, qa.q)
               / (sqrt(list_dot_product(qp.q, qp.q))
                 * sqrt(list_dot_product(qa.q, qa.q)))
             ELSE 0.0 END AS cosine_sq
         FROM probe_lists pl
         JOIN assignf a USING (cluster)
         JOIN qv qa ON qa.vec_id = a.vec_id
         JOIN qv qp ON qp.vec_id = pl.probe_id
         WHERE a.vec_id != pl.probe_id)
       SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, cosine_sq FROM (
         SELECT probe_id, neighbor_id, cosine_sq,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine_sq DESC, neighbor_id) AS rank
         FROM scored)
       WHERE rank <= $K
       ORDER BY probe_id, rank"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_sq_topk" -> ((s, d) =>
      sqTopK(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))))

  def oracles: Map[String, String] = Map("ann_sq_topk" -> sqTopKSql)
}
