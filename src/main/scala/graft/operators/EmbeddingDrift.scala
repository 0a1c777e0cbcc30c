package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-distribution drift monitor — the vector-space twin of
  * [[Drift]]'s events gate, and the check an embedding pipeline runs
  * when the encoder, the corpus mix, or an upstream filter changes:
  * per label, how far did the class centroid move between two corpus
  * slices (vec_id parity plays old vs new — the deterministic split
  * convention)?
  *
  * Determinism (§3.1 — never sum raw doubles): every coordinate is
  * quantized to the integer grid q = floor((x+1)·10⁶) (the
  * [[Kmeans]] discipline), per-(label, slice, dim) sums and counts
  * are exact BIGINTs, each mean is ONE IEEE division of exact
  * integers, and the squared displacement Σ(meanNew−meanOld)² folds
  * sequentially in dim order through the same fold-exact
  * [[Similarity.dot]] / list_dot_product pair the ANN family verifies
  * everywhere. Emitted drift values are bit-identical across engines
  * and partitionings.
  *
  * Scale: one (label, slice, dim) shuffle over the exploded
  * coordinates — labels·2·dim aggregate rows (kilobytes) regardless
  * of corpus size; the fold runs on label-grain arrays.
  */
object EmbeddingDrift {

  /** Quantization grid — matches [[Kmeans]]'s integer-exact Lloyd's. */
  val Grid = 1000000L

  def centroidDrift(emb: DataFrame): DataFrame = {
    val dims = emb.select(col("label"),
        pmod(col("vec_id"), lit(2L)).as("slice"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("slice"), col("dim"),
        floor((col("x").cast("double") + 1) * Grid).cast("long").as("q"))
    val stats = dims.groupBy(col("label"), col("slice"), col("dim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
      .withColumn("mean", col("sq").cast("double") / col("cnt"))
    val old = stats.filter(col("slice") === 0)
      .select(col("label"), col("dim"), col("mean").as("m_old"),
        col("cnt").as("cnt_old"))
    val nw = stats.filter(col("slice") === 1)
      .select(col("label"), col("dim"), col("mean").as("m_new"),
        col("cnt").as("cnt_new"))
    old.join(nw, Seq("label", "dim"))
      .withColumn("md", col("m_new") - col("m_old"))
      .groupBy(col("label"))
      .agg(max(col("cnt_old")).as("n_old"),
        max(col("cnt_new")).as("n_new"),
        transform(
          array_sort(collect_list(struct(col("dim"), col("md")))),
          s => s.getField("md")).as("d"))
      .select(col("label"), col("n_old"), col("n_new"),
        Similarity.dot(col("d"), col("d")).as("drift"))
  }

  val centroidDriftSql: String =
    s"""WITH dims AS (
         SELECT label, vec_id % 2 AS slice, u.j - 1 AS dim,
           CAST(floor((CAST(embedding[u.j] AS DOUBLE) + 1) * $Grid)
             AS BIGINT) AS q
         FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS u(j)),
       stats AS (
         SELECT label, slice, dim, CAST(SUM(q) AS BIGINT) AS sq,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM dims GROUP BY 1, 2, 3),
       means AS (
         SELECT label, slice, dim, CAST(sq AS DOUBLE) / cnt AS mean, cnt
         FROM stats),
       j AS (
         SELECT o.label, o.dim, n.mean - o.mean AS md,
           o.cnt AS cnt_old, n.cnt AS cnt_new
         FROM means o JOIN means n
           ON n.label = o.label AND n.dim = o.dim
         WHERE o.slice = 0 AND n.slice = 1),
       agg AS (
         SELECT label, MAX(cnt_old) AS n_old, MAX(cnt_new) AS n_new,
           list(md ORDER BY dim) AS d
         FROM j GROUP BY label)
       SELECT label, n_old, n_new, list_dot_product(d, d) AS drift
       FROM agg
       ORDER BY label"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String)
      => DataFrame] = Map(
    "emb_centroid_drift" -> ((s, d) =>
      centroidDrift(Tables.embeddings(s, d)).orderBy(col("label"))))

  def oracles: Map[String, String] = Map(
    "emb_centroid_drift" -> centroidDriftSql)
}
