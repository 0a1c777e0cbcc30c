package graft

import scala.util.{Failure, Success, Try}

/** Plan-evidence dump: per registered query, count the physical-plan
  * features that matter at scale (broadcast vs sort-merge joins,
  * cartesian products, whole-stage-codegen spans) and print the scan
  * schemas. `main` args: [sfDir] [queryCsv|ALL]. With a single query
  * name, also prints the full final plan (formatted explain) so
  * PushedFilters/ReadSchema can be inspected.
  */
object PlanAudit {
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
      Try {
        val df = SparkEntry.queries(q)(spark, sfDir)
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
          if (t.startsWith("*(")) Some(t.drop(2).takeWhile(_.isDigit)) else None
        }.toSet
        println(f"$q%-28s bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d " +
          f"shj=${n("ShuffledHashJoin")}%2d cartesian=${n("Cartesian")}%d " +
          f"codegen_spans=${spanIds.size}%2d scans=${n("Scan parquet")}%2d " +
          f"(checkpointed inputs=${n("ExistingRDD")}%d)")
        if (which.size == 1) println(lines.mkString("\n"))
      } match {
        case Success(_) => ()
        case Failure(e) => println(f"$q%-28s FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
