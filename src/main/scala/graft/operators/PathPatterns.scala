package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sequence-pattern matching over per-key event paths — the
  * MATCH_RECOGNIZE analog (row-pattern recognition is SQL:2016; Spark
  * has no native operator). Each user's events collapse to one ordered
  * type-initial string ("cvvcp…"), and patterns become regular
  * expressions counted non-overlapping, leftmost-first — the same
  * semantics Java's `Matcher.find` loop and DuckDB's RE2
  * `regexp_extract_all` both implement for the anchored-free simple
  * patterns used here (alternation-free literals + greedy `+`/`*`,
  * where backtracking and RE2 agree by construction).
  *
  * Shape: ONE shuffle on user_id; a rank pre-filter keeps the FIRST
  * [[MaxEventsPerUser]] events per user (row_number over the same
  * deterministic (ts, id) order — the window and the groupBy share one
  * hash partitioning, so the cap costs no extra shuffle), then the
  * path string is built inside the aggregation (sort_array over
  * (ts, id, chr) structs), and every pattern is a scan-speed regexp
  * over the built paths. The cap makes the per-user state bound
  * EXPLICIT: without it one pathological 10⁸-event key is a 100 MB
  * aggregation value; with it the worst key is a 64 KiB string. The
  * oracle applies the identical cap, and the path fingerprint
  * (fnv1a64) proves both engines built byte-identical sequences, so
  * the pattern counts sit on a verified foundation.
  *
  * Reference behavior anchor: funnel/journey analysis the reference
  * leaves to BI over its gold tables (docs/ARCHITECTURE.md).
  */
object PathPatterns {

  /** (name, regex) — initials: c=click e=error p=purchase s=signup
    * v=view.
    */
  val Patterns: Seq[(String, String)] = Seq(
    ("click_buy", "cp"), // click immediately followed by purchase
    ("clicks_to_buy", "c+p"), // a click burst ending in purchase
    ("browse_buy", "vc*p"), // view, optional clicks, purchase
    ("error_retry_buy", "ep")) // purchase immediately after an error

  /** Hard bound on the per-user path length (64 Ki events ⇒ ≤ 64 KiB
    * path string — comfortably inside any aggregation-value budget).
    * Far above the events-per-user distribution of the data model;
    * exists to bound the adversarial tail, not to sample.
    */
  val MaxEventsPerUser = 65536

  def pathPatterns(events: DataFrame,
      cap: Int = MaxEventsPerUser): DataFrame = {
    val spark = events.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val paths = events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("ts_us"), col("event_id"),
              substring(col("event_type"), 1, 1).as("chr")))),
            s => s.getField("chr")),
          "").as("path"))
    val withCounts = Patterns.foldLeft(paths) { case (df, (name, re)) =>
      df.withColumn(s"n_$name", regexp_count(col("path"), lit(re))
        .cast("long"))
    }
    withCounts.select(
      col("user_id") +: col("n_events") +:
        graft.functions.Fingerprint.fnv1a64(spark, col("path"))
          .as("path_fp") +:
        Patterns.map { case (name, _) => col(s"n_$name") }: _*)
  }

  val pathPatternsSql: String = {
    val patternCols = Patterns.map { case (name, re) =>
      s"CAST(len(regexp_extract_all(path, '$re')) AS BIGINT) AS n_$name"
    }.mkString(",\n         ")
    s"""WITH capped AS (
         SELECT user_id, ts, event_id, event_type
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) <= $MaxEventsPerUser),
       paths AS (
         SELECT user_id, COUNT(*) AS n_events,
           string_agg(substr(event_type, 1, 1), ''
             ORDER BY epoch_us(ts), event_id) AS path
         FROM capped GROUP BY user_id)
       SELECT user_id, n_events,
         ${OracleFnv.ofText("path")} AS path_fp,
         $patternCols
       FROM paths
       ORDER BY user_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_path_patterns" -> ((s, d) =>
      pathPatterns(Tables.events(s, d)).orderBy(col("user_id"))))

  def oracles: Map[String, String] = Map(
    "events_path_patterns" -> pathPatternsSql)
}
