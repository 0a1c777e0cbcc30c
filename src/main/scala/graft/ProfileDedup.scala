package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing for the expensive dedup queries — evidence for
  * which sub-stage (signature agg, banding, candidate join, verify)
  * dominates, so perf work targets the real cost. Run via
  * `tools/run_verify.sh <sfDir> x graft.ProfileDedup`.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .withExtensions(new GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($n rows)")
      spark.catalog.clearCache()
      Caching.releaseAll(spark, blocking = true)
    }

    val docs = graft.Tables.documents(spark, sfDir)
    println("== minhash stages ==")
    time("docs scan")(docs.count())
    time("tokens explode+fnv") {
      docs.select(col("doc_id"),
        explode(operators.Dedup.ngrams(operators.Dedup.normText(col("text")), 1)).as("sh"))
        .withColumn("h", graft.functions.Fingerprint.fnv1a64(spark, col("sh")))
        .count()
    }
    time("signatures (32 min-aggs)")(
      operators.Dedup.minhashSignatures(docs, 1, 32).count())
    time("grams (hashed sets)")(
      docs.select(col("doc_id"),
        operators.Dedup.hashedNgrams(spark, operators.Dedup.normText(col("text")), 1)
          .as("grams")).count())
    time("full minhash_lsh")(operators.Dedup.minhashLsh(docs).count())
    time("full minhash_lsh (2nd)")(operators.Dedup.minhashLsh(docs).count())
    println("== simhash stages ==")
    time("simhash (64 sums)")(operators.Dedup.simhash(docs).count())
    time("full simhash_pairs")(operators.Dedup.simhashPairs(docs).count())
    time("full simhash_pairs (2nd)")(operators.Dedup.simhashPairs(docs).count())
    println("== vector paths (native vec_dot) ==")
    val emb = graft.Tables.embeddings(spark, sfDir)
    time("ann_bruteforce_topk")(operators.Similarity.bruteForceTopK(emb).count())
    time("ann_lsh_topk")(operators.Similarity.lshTopK(emb).count())
    time("dedup_embedding_lsh")(operators.Dedup.embeddingLshPairs(emb).count())
    time("dedup_embedding_lsh (2nd)")(operators.Dedup.embeddingLshPairs(emb).count())
    spark.stop()
  }
}
