package graft

/** Plan-evidence dump: per registered query, count the physical-plan
  * features that matter at scale (broadcast vs sort-merge joins,
  * cartesian products, whole-stage-codegen spans) and print the scan
  * schemas. `main` args: [sfDir] [queryCsv|ALL].
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val which = if (args.length > 1 && args(1) != "ALL")
      args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8)
    which.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      // drive THIS plan instance to completion (count()/write build a
      // separate QueryExecution), so AQE settles on its final stages
      val plan = df.queryExecution.executedPlan
      plan.execute().foreachPartition((_: Iterator[_]) => ())
      val lines = plan.toString.linesIterator.toSeq
        .takeWhile(!_.contains("== Initial Plan ==")) // final stages only
      def n(tag: String) = lines.count(_.contains(tag))
      // codegen'd operators print with a "*(id)" stage prefix
      val codegen = lines.count(_.dropWhile(c => c == ' ' || c == ':' || c == '+' || c == '-').startsWith("*("))
      println(f"$q%-28s bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d " +
        f"shj=${n("ShuffledHashJoin")}%2d cartesian=${n("Cartesian")}%d " +
        f"codegen=$codegen%3d scans=${n("Scan parquet")}%2d " +
        f"(checkpointed inputs=${n("ExistingRDD")}%d)")
      if (which.size == 1) println(lines.mkString("\n"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
