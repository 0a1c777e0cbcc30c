package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase (salted) aggregation for hot keys.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * task. With a salt the first aggregation fans each key across
  * `saltBuckets` tasks (map-side combine still applies), and the second
  * pass merges the per-salt partials — the hot key's final merge handles
  * `saltBuckets` rows instead of billions. Complements AQE's skew-join
  * splitting (which covers joins, not aggregations).
  *
  * Only algebraic aggregates decompose this way (sum/count/min/max —
  * not countDistinct); the API takes partial and merge expression
  * builders to keep that explicit.
  */
object Skew {

  /** Two-phase aggregate.
    * @param partials per-salt aggregates, e.g. `Seq(sum(col("v")).as("s"))`
    * @param merges   final merge of the partial columns, e.g.
    *                 `Seq(sum(col("s")).as("total"))`
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Registered demonstration: revenue per return flag (3 hot keys over
    * the whole fact table — the textbook skewed aggregation) via the
    * salted two-phase plan. Decimal partials keep the two-level sum
    * exactly equal to the single-level oracle aggregate.
    */
  def lineitemSaltedAgg(li: DataFrame): DataFrame = saltedAgg(
    li,
    keys = Seq(col("l_returnflag")),
    saltBuckets = 32,
    partials = Seq(
      sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("s"),
      count(lit(1)).as("c")),
    merges = Seq(
      sum(col("s")).cast("double").as("total_price"),
      sum(col("c")).as("cnt")))
    .select(col("l_returnflag").as("return_flag"), col("total_price"),
      col("cnt"))

  val lineitemSaltedAggSql: String =
    """SELECT l_returnflag AS return_flag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price,
       COUNT(*) AS cnt
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY return_flag"""

  /** Salted JOIN — the aggregation's sibling for skewed JOIN keys when
    * neither side broadcasts: the big side gets a salt in
    * [0, saltBuckets), the small side is replicated once per salt
    * value, and the join key becomes (key, salt) — a hot key's rows
    * spread over `saltBuckets` tasks instead of hammering one. Cost is
    * deliberate: small side × saltBuckets rows shuffled. Prefer AQE's
    * skew-join splitting when it fires; salting is the explicit fallback
    * for stable production plans and for engines/stages AQE can't
    * rewrite (e.g. under a required child distribution).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, saltBuckets: Int): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val smallS = small.withColumn("_salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    // hint forces the shuffle join this operator exists for; without it
    // a small dim would broadcast and the salt would be dead weight
    bigS.join(smallS.hint("merge"),
      bigKey === smallKey && bigS("_salt") === smallS("_salt"))
      .drop("_salt")
  }

  /** Registered demonstration: lineitem ⋈ supplier on the (skew-prone)
    * supplier key via the salted shuffle join, then revenue per nation.
    * The oracle is the plain join — salting must be invisible in the
    * result.
    */
  def lineitemSaltedJoin(li: DataFrame, supplier: DataFrame): DataFrame =
    saltedJoin(
      li.select(col("l_suppkey"), col("l_extendedprice"), col("l_discount")),
      supplier.select(col("s_suppkey"), col("s_nationkey")),
      col("l_suppkey"), col("s_suppkey"), saltBuckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(Medallion.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))

  val lineitemSaltedJoinSql: String =
    """SELECT s_nationkey,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
         AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY s_nationkey
       ORDER BY s_nationkey"""

  /** Skew DIAGNOSIS — the report that tells you whether the two salted
    * paths above are needed at all: the per-key row-count distribution
    * of a prospective shuffle key, plus the top hot keys. One
    * key-hashed aggregation produces the counts; the stats reduce
    * O(keys) rows (exact interpolated percentiles like
    * `order_price_quantiles`), and the hot-key list is a rank-window
    * top-5 — bounded output no matter how many keys exist. skew_ratio =
    * max/mean is the number to alarm on (a uniform key space sits near
    * 1; hot keys push it to the salt-or-AQE regime).
    */
  def keySkewStats(events: DataFrame): DataFrame = {
    val counts = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("user_id"))
    counts
      .withColumn("rank", row_number().over(w))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_per_key"),
        percentile(col("cnt"), lit(0.5)).as("p50_per_key"),
        percentile(col("cnt"), lit(0.99)).as("p99_per_key"),
        (max(col("cnt")).cast("double") * count(lit(1)).cast("double") /
          sum(col("cnt")).cast("double")).as("skew_ratio"),
        array_join(transform(sort_array(collect_list(
          when(col("rank") <= 5, struct(col("rank"), col("user_id"))))),
          s => s.getField("user_id").cast("string")), ",").as("top_keys"))
  }

  val keySkewStatsSql: String =
    """WITH counts AS (
         SELECT user_id, COUNT(*) AS cnt
         FROM events
         WHERE user_id IS NOT NULL
         GROUP BY user_id),
       ranked AS (
         SELECT *, row_number() OVER (ORDER BY cnt DESC, user_id) AS rank
         FROM counts)
       SELECT COUNT(*) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         MAX(cnt) AS max_per_key,
         quantile_cont(cnt, 0.5) AS p50_per_key,
         quantile_cont(cnt, 0.99) AS p99_per_key,
         CAST(MAX(cnt) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
           / CAST(SUM(cnt) AS DOUBLE) AS skew_ratio,
         array_to_string(list_transform(
           list_sort(list([rank, user_id]) FILTER (rank <= 5)),
           x -> CAST(x[2] AS VARCHAR)), ',') AS top_keys
       FROM ranked"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map(
      "lineitem_salted_agg" -> ((s, d) =>
        lineitemSaltedAgg(graft.Tables.lineitem(s, d))
          .orderBy(col("return_flag"))),
      "lineitem_salted_join" -> ((s, d) =>
        lineitemSaltedJoin(graft.Tables.lineitem(s, d),
          graft.Tables.supplier(s, d))
          .orderBy(col("s_nationkey"))),
      "events_key_skew" -> ((s, d) =>
        keySkewStats(graft.Tables.events(s, d))))

  def oracles: Map[String, String] =
    Map(
      "lineitem_salted_agg" -> lineitemSaltedAggSql,
      "lineitem_salted_join" -> lineitemSaltedJoinSql,
      "events_key_skew" -> keySkewStatsSql)
}
