package graft

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

/** Plan-evidence dump: per registered query, count the physical-plan
  * features that matter at scale (broadcast vs sort-merge joins,
  * cartesian products, whole-stage-codegen spans) and print the scan
  * schemas. `main` args: [sfDir] [queryCsv|ALL]. With a single query
  * name, also prints the full final plan (formatted explain) so
  * PushedFilters/ReadSchema can be inspected.
  *
  * The per-query walk is also a REGRESSION LINT (r15 verdict task 4):
  * [[PlanAuditSpec]] asserts [[Invariants]] over every registered
  * query — zero cartesian products, zero shuffled-hash joins, and
  * sort-merge joins only at the adjudicated sites in [[SmjAllowed]] —
  * so a plan regression (a new SMJ from a dropped broadcast hint, a
  * cartesian from a lost join key) goes red in the pre-commit smoke
  * instead of surfacing as a round-over-round artifact diff.
  */
object PlanAudit {

  /** One audited query's final-plan feature counts. */
  final case class Audit(name: String, bhj: Int, smj: Int, shj: Int,
      cartesian: Int, codegenSpans: Int, scans: Int, existingRdd: Int,
      error: Option[String], planLines: Seq[String]) {
    def summary: String =
      error match {
        case Some(e) => f"$name%-28s FAILED: $e"
        case None =>
          f"$name%-28s bhj=$bhj%2d smj=$smj%2d shj=$shj%2d " +
            f"cartesian=$cartesian%d codegen_spans=$codegenSpans%2d " +
            f"scans=$scans%2d (checkpointed inputs=$existingRdd%d)"
      }
  }

  /** The adjudicated sort-merge-join sites (name → max SMJ count):
    * fact-fact joins where SMJ is the correct strategy, plus the one
    * gate that FORCES SMJ by contract. Anything else with an SMJ in
    * its final plan is a regression (a broadcast that stopped
    * applying) and turns [[PlanAuditSpec]] red.
    */
  val SmjAllowed: Map[String, Int] = Map(
    "ann_hybrid_rrf" -> 1, // full-outer exact⋈ann fusion (no bcast side)
    "ann_hybrid_rrf_routed" -> 1, // same fusion over the routed arm
    "cdc_from_snapshot" -> 3, // full-outer diffs of co-bucketed snapshots
    "dedup_clusters_incremental" -> 1, // stored-labels ⋈ affected comps
    "docs_triangle_count" -> 2, // edge-edge self-joins (fact-fact)
    "lake_incremental_cdf" -> 1, // commit-range diff (fact-fact)
    "lake_version_diff" -> 1, // full-outer version diff (fact-fact)
    "lineitem_salted_join" -> 1) // forces SMJ by gate contract

  /** Build + execute ONE registered query's plan and count features.
    * Caller must have `graft.caching.disable=true` set (see
    * [[withCachingDisabled]]) or upstream plans hide behind
    * checkpoint ExistingRDD stubs.
    */
  def auditQuery(spark: SparkSession, sfDir: String,
      name: String): Audit =
    Try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // drive THIS plan instance to completion (count()/write build a
      // separate QueryExecution), so AQE settles on its final stages
      val plan = df.queryExecution.executedPlan
      plan.execute().foreachPartition((_: Iterator[_]) => ())
      val lines = plan.toString.linesIterator.toSeq
        .takeWhile(!_.contains("== Initial Plan ==")) // final stages only
      def n(tag: String) = lines.count(_.contains(tag))
      // one whole-stage span = one distinct "*(id)" prefix
      val spanIds = lines.flatMap { l =>
        val t = l.dropWhile(c => !c.isLetterOrDigit && c != '*')
        if (t.startsWith("*(")) Some(t.drop(2).takeWhile(_.isDigit))
        else None
      }.toSet
      Audit(name, n("BroadcastHashJoin"), n("SortMergeJoin"),
        n("ShuffledHashJoin"), n("Cartesian"), spanIds.size,
        n("Scan parquet"), n("ExistingRDD"), None, lines)
    } match {
      case Success(a) => a
      case Failure(e) =>
        Audit(name, 0, 0, 0, 0, 0, 0, 0,
          Some(Option(e.getMessage).getOrElse(e.toString)), Nil)
    }

  /** Run `body` with checkpoint-hiding disabled, restoring the prior
    * value after — the spec shares its JVM with suites that rely on
    * [[Caching.withCached]] (iterative gates re-execute 2^rounds
    * without it).
    */
  def withCachingDisabled[A](body: => A): A = {
    val prev = System.getProperty("graft.caching.disable")
    System.setProperty("graft.caching.disable", "true")
    try body
    finally {
      if (prev == null) System.clearProperty("graft.caching.disable")
      else System.setProperty("graft.caching.disable", prev)
    }
  }

  /** The board invariants, as violation strings (empty = clean). */
  def violations(a: Audit): Seq[String] = {
    val smjMax = SmjAllowed.getOrElse(a.name, 0)
    Seq(
      (a.error.isDefined) ->
        s"${a.name}: audit failed: ${a.error.getOrElse("")}",
      (a.cartesian > 0) ->
        s"${a.name}: ${a.cartesian} CartesianProduct in the final plan",
      (a.shj > 0) ->
        s"${a.name}: ${a.shj} ShuffledHashJoin in the final plan",
      (a.smj > smjMax) ->
        (s"${a.name}: ${a.smj} SortMergeJoin (allowlist max $smjMax) — " +
          "a broadcast stopped applying or a new fact-fact join " +
          "needs adjudication in PlanAudit.SmjAllowed"))
      .collect { case (bad, msg) if bad => msg }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val which = if (args.length > 1 && args(1) != "ALL")
      args(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    else SparkEntry.queries.keys.toSeq.sorted
    val unknown = which.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}; " +
        s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    // audit the FULL operator plans: withCached normally checkpoints,
    // which would hide everything upstream behind an ExistingRDD stub
    System.setProperty("graft.caching.disable", "true")
    val spark = GraftSession.local(8)
    // simple-mode FileScan metadata truncates at 100 chars by default,
    // which cuts off PushedFilters/ReadSchema — the point of the dump
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    which.foreach { q =>
      val a = auditQuery(spark, sfDir, q)
      println(a.summary)
      if (which.size == 1) println(a.planLines.mkString("\n"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
