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

  private def toVec(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def argminCentroid(v: Array[Double],
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
    var centroids = base.orderBy(col("vec_id")).take(nlist).map(_._2)
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = base.mapPartitions(_.map { case (_, v) =>
        (argminCentroid(v, bc.value), v)
      }).toDF("cluster", "v")
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("x").cast("decimal(30,12)")).as("s"),
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
    base.unpersist()
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivf_topk" -> ((s, d) =>
      ivfTopK(graft.Tables.embeddings(s, d))
        .orderBy(col("probe_id"), col("rank"))))

  def oracles: Map[String, String] = Map.empty
}
