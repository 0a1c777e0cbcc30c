package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * Scale posture: these settings are the local[32] analogues of what a
  * 1000-executor deployment would set — AQE on (runtime re-plan, skew
  * join splitting, partition coalescing), a broadcast threshold large
  * enough to cover every dimension table, and shuffle parallelism
  * matched to the core count rather than Spark's default 200.
  */
object GraftSession {

  /** Apply graft defaults onto a builder (callers may override after). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // canChangeCachedPlanOutputPartitioning stays at the Spark default
    // (false) — a MEASURED r17 rejection, not an oversight: letting AQE
    // re-partition cached plans by bytes coalesces every persisted
    // frame of the iterative families to ~1 partition, which cuts tiny-
    // task counts (ann_graph_topk 7.2s → 5.8s solo) but SERIALIZES the
    // compute-heavy cached legs (same-conditions solo A/B:
    // dedup_recall_bounds 7.4s → 22.8s, docs_pagerank 4.2s → 17.9s).
    // Cached-frame parallelism is load-bearing for exact-truth legs.
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // full-registry sessions (Verify/Bench: 272 queries) generate
    // thousands of codegen'd classes; the default 100-entry class cache
    // measured 8069 compiles per session and forces every late query to
    // recompile its whole plan (BimodalProbe A/B, r12: 4096 entries →
    // 4377 compiles, post-churn family runs at +0 compiles and the
    // first-execution penalty gone). Static conf — must be set before
    // session creation, which this builder hook guarantees.
    .config("spark.sql.codegen.cache.maxEntries", "4096")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .withExtensions(new GraftExtensions)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
