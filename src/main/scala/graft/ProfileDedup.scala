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
    time("signatures (64 min-aggs)")(
      operators.Dedup.minhashSignatures(docs, 1, 64).count())
    time("grams (hashed sets)")(
      docs.select(col("doc_id"),
        operators.Dedup.hashedNgrams(spark, operators.Dedup.normText(col("text")), 1)
          .as("grams")).count())
    // A/B: banding via the single-pass MinhashBands kernel vs the
    // explode → 64-min-aggregation formulation it replaced
    val gramsDf = docs.select(col("doc_id"),
      operators.Dedup.hashedNgrams(spark, operators.Dedup.normText(col("text")), 1)
        .as("grams"))
    time("bands via kernel")(
      operators.Dedup.bandedSignaturesFromGrams(spark, gramsDf, 64, 8).count())
    time("bands via kernel (2nd)")(
      operators.Dedup.bandedSignaturesFromGrams(spark, gramsDf, 64, 8).count())
    time("bands via explode+agg") {
      import org.apache.spark.sql.functions._
      val p = 2147483647L
      val sh = gramsDf.select(col("doc_id"), explode(col("grams")).as("g"))
        .withColumn("h", pmod(col("g"), lit(p)))
      val aggs = (0 until 64).map { i =>
        val a = math.abs(i * 0x9e3779b97f4a7c15L + 0x85ebca6bL) % (p - 1) + 1
        val b = math.abs(i * -0x4d4d3a7a2d82b4b1L + 0x27d4eb2fL) % p
        min(pmod(col("h") * lit(a) + lit(b), lit(p))).as(s"sig_$i")
      }
      val sigs = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      val banded = sigs.select(col("doc_id") +: (0 until 8).map { bIdx =>
        graft.functions.Fingerprint.fnv1a64(spark,
          concat_ws(",", (bIdx * 8 until (bIdx + 1) * 8)
            .map(i => col(s"sig_$i")): _*)).as(s"band_$bIdx")
      }: _*)
      banded.select(col("doc_id"),
        explode(array((0 until 8).map(bIdx =>
          struct(lit(bIdx).as("band_idx"), col(s"band_$bIdx").as("band_hash"))): _*))
          .as("band")).count()
    }
    // candidate-stage A/B: self-join+distinct over each banding shape
    def candCount(banded: org.apache.spark.sql.DataFrame): Long = {
      val b = banded.localCheckpoint()
      val n = b.as("x").join(b.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().count()
      n
    }
    time("cands via kernel bands")(candCount(
      operators.Dedup.bandedSignaturesFromGrams(spark, gramsDf, 64, 8)))
    def withAggBanding[A](f: => A): A = {
      System.setProperty("graft.minhash.aggBanding", "true")
      try f finally System.clearProperty("graft.minhash.aggBanding")
    }
    time("full minhash_lsh [agg]")(withAggBanding(
      operators.Dedup.minhashLsh(docs).count()))
    time("full minhash_lsh [kernel]")(operators.Dedup.minhashLsh(docs).count())
    time("full minhash_lsh [agg 2nd]")(withAggBanding(
      operators.Dedup.minhashLsh(docs).count()))
    time("full minhash_lsh [kernel 2nd]")(operators.Dedup.minhashLsh(docs).count())
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
