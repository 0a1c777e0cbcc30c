package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .withExtensions(new GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen paths once so timings reflect steady state —
    // against the benchmark's own data dir, and loudly if it fails
    // (a silently-skipped warm-up skews the first timed query). Two
    // warm-ups: scan/agg paths (q1) and the set-similarity paths
    // (fnv + long-array intersect codegen shared by the dedup family,
    // which otherwise pay JIT inside their timed run).
    Seq("q1_pricing_summary", "dedup_ngram_jaccard").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $w failed (timings may be skewed): $e") }
    }
    spark.catalog.clearCache()
    Caching.releaseAll(spark)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must NOT be reported as a (fast) success: -1 marks it
      val elapsed =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      spark.catalog.clearCache() // per-query isolation: no cache carryover
      Caching.releaseAll(spark) // incl. localCheckpoint block storage
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
