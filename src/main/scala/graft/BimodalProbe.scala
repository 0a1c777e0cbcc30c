package graft

import org.apache.spark.sql.SparkSession

/** Reproduction harness for the bimodal dedup token-join family
  * (SURVEY §6 variance note: dedup_ngram_jaccard 0.55/2.3/14.2s and
  * dedup_minhash_lsh 1.7/2.6/15.6s across same-day 219-query runs,
  * stable solo). Hypotheses to falsify (r6 verdict item 5):
  *
  *  1. codegen class-cache eviction — `spark.sql.codegen.cache
  *     .maxEntries` defaults to 100 compiled classes; a 219-query
  *     session generates thousands, so by the time the dedup family
  *     runs, every plan recompiles. Falsifiable by comparing the
  *     family's post-churn timings under the default cache vs
  *     `-Dspark.sql.codegen.cache.maxEntries=5000`, with the janino
  *     compile counter (CodegenMetrics) separating compile time from
  *     run time.
  *  2. GC / heap pressure — falsifiable from the GC-time delta around
  *     the timed region.
  *  3. broadcast/block-manager cleanup backlog — bounded here by the
  *     same blocking release Bench uses, so any residual effect shows
  *     as run-to-run spread within one config.
  *
  * Protocol: warm up, run a CHURN phase (the full registry minus the
  * streaming/lake long-pole gates at sf0.001 — enough distinct plans
  * to overflow any 100-entry cache), then time the dedup family N
  * times, printing per-run wall, GC delta, and codegen
  * compilations/compile-ms delta. Run twice via run_verify.sh with
  * different -D values to compare.
  */
object BimodalProbe {
  def main(args: Array[String]): Unit = {
    val sfBig = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfSmall = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .withExtensions(new GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Scratch.sweep()
    println(s"[probe] codegen.cache.maxEntries=" +
      spark.conf.getOption("spark.sql.codegen.cache.maxEntries")
        .getOrElse("default(100)"))

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // count only: the Codahale histogram's snapshot is a bounded
    // RESERVOIR SAMPLE, so summing its values would under-report total
    // compile time exactly when churn is highest — the compilation
    // COUNT is the unbiased eviction signal
    def compiles(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def release(): Unit = {
      spark.catalog.clearCache()
      Caching.releaseAll(spark, blocking = true)
    }

    val family = Seq("dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_prefix_filter")
    def timeFamily(tag: String): Unit = family.foreach { name =>
      val gc0 = gcMs(); val c0 = compiles()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfBig).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val gcd = gcMs() - gc0; val c1 = compiles()
      println(f"[probe] $tag%-10s $name%-22s wall=$wall%7.2fs " +
        f"gc=+${gcd}ms codegenCompiles=+${c1 - c0}")
      release()
    }

    // solo reference (fresh JVM, minimal churn)
    timeFamily("solo")
    timeFamily("solo2")

    // churn: every registered query once at sf0.001, skipping the
    // wall-clock long poles whose cost is orchestration, not codegen
    val skip = Set("stream_state_ttl", "stream_table_chain",
      "stream_checkpoint_resume", "pipeline_manifest")
    val churn = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip)
    val t0 = System.nanoTime()
    churn.foreach { name =>
      try SparkEntry.queries(name)(spark, sfSmall).count()
      catch { case e: Throwable =>
        println(s"[probe] churn $name failed: ${e.getClass.getSimpleName}") }
    }
    release()
    val cN = compiles()
    println(f"[probe] churn of ${churn.size} queries took " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs; total codegen " +
      f"compiles=$cN")

    // the measurement that matters: family timings deep in the session
    timeFamily("postchurn")
    timeFamily("postchurn2")
    timeFamily("postchurn3")
    spark.stop()
  }
}
