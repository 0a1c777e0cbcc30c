package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Write-Audit-Publish — the production landing discipline (Iceberg
  * WAP / staging-branch publish): a batch becomes visible ONLY if its
  * audit passes. Landing writes go to a staging area no reader sees;
  * the audit runs against staged data; publish is [[VersionedLake]]'s
  * atomic manifest commit, so readers switch from the old snapshot to
  * the new one in one rename — there is no moment where a reader can
  * observe a half-landed or dirty batch. A failed audit leaves the
  * production table BIT-IDENTICAL (spec-proven: same version list,
  * same snapshot) and routes the violation count to the run report.
  *
  * The gate drives three batches through the flow — clean (publishes),
  * dirty with deterministic hash-injected violations (audit rejects,
  * prod untouched), the same slice re-landed clean (publishes) — and
  * returns the per-batch audit report with the post-batch production
  * row count. The oracle re-derives everything (era cuts, dirt, audit
  * arithmetic) from the raw table, with `published` computed as
  * `violations = 0` rather than assumed, so the row stays correct at
  * any SF including dirt-free ones.
  *
  * Audit rules (the [[graft.operators.Quality]] style, inlined):
  * non-null key, positive total, no duplicate keys within the batch.
  */
object Wap {

  /** Sorted distinct months' 1-based third points: batches 1 / 2-3
    * split at `n div 3 + 1` and `(2n) div 3 + 1`.
    */
  private def cuts(withMonth: DataFrame): (String, String) = {
    val m = withMonth.select(col("m")).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("m"))))
      .withColumn("n", count(lit(1)).over())
    val a = m.filter(col("rn") === expr("n div 3 + 1")).head().getString(0)
    val b = m.filter(col("rn") === expr("(2 * n) div 3 + 1")).head()
      .getString(0)
    (a, b)
  }

  private[graft] def violations(batch: DataFrame): Long = {
    val rowViolations = batch.filter(
      col("o_orderkey").isNull || col("o_totalprice") <= 0.0).count()
    val rows = batch.count()
    val keys = batch.filter(col("o_orderkey").isNotNull)
      .select(col("o_orderkey")).distinct().count()
    val nullKeys = batch.filter(col("o_orderkey").isNull).count()
    rowViolations + ((rows - nullKeys) - keys) // dup keys count once each
  }

  /** Run the three-batch WAP flow; returns the audit report
    * (batch_id, n_rows, n_violations, published, prod_rows_after).
    */
  def wapPublish(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.Fingerprint.register(spark)
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("m"))
    val (cutA, cutB) = cuts(orders)
    val path = Scratch.dir("wap_prod")
    val b1 = orders.filter(col("m") < cutA)
    val mid = orders.filter(col("m") >= cutA && col("m") < cutB)
    // deterministic dirt: ~1 in 10 totals flipped negative
    val dirty = mid.withColumn("o_totalprice",
      when(pmod(graft.functions.Fingerprint.fnv1a64(spark,
          concat(lit("wap:"), col("o_orderkey").cast("string"))),
        lit(10L)) === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")))
    val report = Seq((1, b1), (2, dirty), (3, mid)).map {
      case (id, batch) =>
        val staged = batch.localCheckpoint(eager = true) // "write" stage
        val n = staged.count()
        val v = violations(staged)
        val publish = v == 0
        if (publish)
          VersionedLake.upsert(spark, path, staged.drop("m"),
            Seq("o_orderkey"), "o_orderkey")
        val prodRows = if (VersionedLake.versions(spark, path).nonEmpty)
          VersionedLake.read(spark, path).count() else 0L
        (id, n, v, publish, prodRows)
    }
    report.toDF("batch_id", "n_rows", "n_violations", "published",
      "prod_rows_after")
  }

  val wapPublishSql: String =
    s"""WITH months AS (
         SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders),
       ranked AS (
         SELECT m, row_number() OVER (ORDER BY m) AS rn,
           COUNT(*) OVER () AS n
         FROM months),
       cuts AS (
         SELECT
           (SELECT m FROM ranked WHERE rn = n // 3 + 1) AS cut_a,
           (SELECT m FROM ranked WHERE rn = (2 * n) // 3 + 1) AS cut_b),
       o AS (
         SELECT o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m') AS m
         FROM orders),
       b1 AS (SELECT o.* FROM o, cuts WHERE m < cut_a),
       mid AS (SELECT o.* FROM o, cuts WHERE m >= cut_a AND m < cut_b),
       dirty AS (
         SELECT o_orderkey,
           CASE WHEN ((${graft.operators.OracleFnv.ofText(
             "'wap:' || CAST(o_orderkey AS VARCHAR)")} % 10) + 10) % 10 = 0
             THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
         FROM mid),
       -- the SAME audit arithmetic the engine runs, applied to every
       -- batch: row violations + duplicate non-null keys
       sizes AS (
         SELECT (SELECT COUNT(*) FROM b1) AS n1,
           (SELECT COUNT(*) FROM mid) AS n23,
           (SELECT COUNT(*) FROM b1
              WHERE o_orderkey IS NULL OR o_totalprice <= 0)
             + (SELECT COUNT(*) FROM b1 WHERE o_orderkey IS NOT NULL)
             - (SELECT COUNT(DISTINCT o_orderkey) FROM b1) AS v1,
           (SELECT COUNT(*) FROM dirty
              WHERE o_orderkey IS NULL OR o_totalprice <= 0)
             + (SELECT COUNT(*) FROM dirty WHERE o_orderkey IS NOT NULL)
             - (SELECT COUNT(DISTINCT o_orderkey) FROM dirty) AS v2,
           (SELECT COUNT(*) FROM mid
              WHERE o_orderkey IS NULL OR o_totalprice <= 0)
             + (SELECT COUNT(*) FROM mid WHERE o_orderkey IS NOT NULL)
             - (SELECT COUNT(DISTINCT o_orderkey) FROM mid) AS v3)
       SELECT * FROM (
         SELECT 1 AS batch_id, n1 AS n_rows, v1 AS n_violations,
           v1 = 0 AS published,
           CASE WHEN v1 = 0 THEN n1 ELSE 0 END AS prod_rows_after
         FROM sizes
         UNION ALL
         SELECT 2, n23, v2, v2 = 0,
           CASE WHEN v1 = 0 THEN n1 ELSE 0 END
             + CASE WHEN v2 = 0 THEN n23 ELSE 0 END
         FROM sizes
         UNION ALL
         SELECT 3, n23, v3, v3 = 0,
           CASE WHEN v1 = 0 THEN n1 ELSE 0 END
             + CASE WHEN v2 = 0 OR v3 = 0 THEN n23 ELSE 0 END
         FROM sizes)
       ORDER BY batch_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_wap_publish" -> ((s, d) =>
      wapPublish(s, d).orderBy(col("batch_id"))))

  def oracles: Map[String, String] = Map(
    "lake_wap_publish" -> wapPublishSql)
}
