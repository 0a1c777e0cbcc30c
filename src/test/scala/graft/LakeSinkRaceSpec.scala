package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

/** The streaming sink racing a concurrent batch OCC writer — the edge
  * `stream_lake_sink` and `lake_concurrent_writers` each prove half of:
  * a REAL Structured Streaming query committing via upsertTxn while a
  * REAL thread lands disjoint-bucket batch upserts, plus a forced
  * deterministic rebase that re-points the manifest PAST a disjoint
  * winner. The transaction watermark must survive all of it: a
  * replayed committed microbatch is STILL a skipped no-op afterwards,
  * and neither side loses an update.
  */
class LakeSinkRaceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("txn watermark survives a live writer race and a rebase re-point") {
    val path = graft.sources.Scratch.dir("lakesink_race")
    val feed = graft.sources.Scratch.dir("lakesink_race_feed")
    val ckpt = Files.createTempDirectory("lakesink_race_ckpt").toString
    val nb = 4
    // derive each key's bucket with the engine's own hash
    val bucketOfKey = spark.range(1, 101)
      .select(col("id"), pmod(hash(col("id")), lit(nb)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamKeys = (1L to 100L).filter(bucketOfKey(_) == 0).take(8)
    val writerKeys = (1L to 100L).filter(bucketOfKey(_) == 1).take(8)
    val thirdKeys = (1L to 100L).filter(bucketOfKey(_) == 2).take(8)
    assert(streamKeys.nonEmpty && writerKeys.nonEmpty && thirdKeys.nonEmpty)
    def rows(ks: Seq[Long], tag: String, seq: Long): DataFrame =
      ks.map(k => (k, tag, seq)).toDF("k", "x", "seq")
    // seed every bucket at seq 0
    VersionedLake.upsert(spark, path,
      rows(streamKeys ++ writerKeys ++ thirdKeys, "seed", 0L),
      Seq("k"), "seq", numBuckets = nb)

    // the stream's three microbatches as three feed files
    (0 to 2).foreach { b =>
      rows(streamKeys, s"s$b", 10L + b).withColumn("b", lit(b))
        .coalesce(1).write.partitionBy("b").mode("append").parquet(feed)
    }
    val feedSchema = spark.read.parquet(s"$feed/b=0").schema
    val batchFiles =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[String]]()

    // a REAL thread hammering disjoint-bucket upserts while the REAL
    // stream runs — CAS contention resolves via rebase on both sides
    // (buckets are disjoint), never via conflict
    @volatile var writerError: Option[Throwable] = None
    val writer = new Thread(() => {
      try (1 to 12).foreach { i =>
        VersionedLake.upsert(spark, path, rows(writerKeys, s"w$i", 100L + i),
          Seq("k"), "seq", numBuckets = nb)
      } catch { case t: Throwable => writerError = Some(t) }
    })
    writer.start()
    val q = spark.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/b=*")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batchFiles.put(id, batch.inputFiles)
        VersionedLake.upsertTxn(spark, path, batch.drop("b"),
          Seq("k"), "seq", "race_app", id, numBuckets = nb)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    writer.join()
    assert(writerError.isEmpty, s"batch writer failed: $writerError")

    // FORCED deterministic rebase: prepare a bucket-1 write against the
    // current tip, land a disjoint bucket-2 winner, then commit — the
    // pending write MUST lose the CAS and rebase past the winner,
    // re-assembling the manifest (txn lines included) from it
    val p = VersionedLake.prepare(spark, path,
      rows(writerKeys, "final", 1000L), Seq("k"), "seq", numBuckets = nb)
    VersionedLake.upsert(spark, path, rows(thirdKeys, "third", 1000L),
      Seq("k"), "seq", numBuckets = nb)
    val cr = VersionedLake.commitPending(spark, path, p)
    assert(cr.rebaseRounds >= 1, "the forced rebase did not happen")

    // the watermark survived every rebase and re-point: replaying ANY
    // committed microbatch with its original txn version is a skipped
    // no-op, with the version chain unchanged
    val before = VersionedLake.versions(spark, path)
    (0L to 2L).foreach { id =>
      val replayed = spark.read.schema(feedSchema)
        .parquet(batchFiles.get(id): _*)
      assert(VersionedLake.upsertTxn(spark, path, replayed.drop("b"),
        Seq("k"), "seq", "race_app", id, numBuckets = nb).isEmpty,
        s"replayed microbatch $id was applied twice")
    }
    assert(VersionedLake.versions(spark, path) == before,
      "a replay committed a version")

    // nobody lost an update: stream keys hold the last microbatch,
    // writer keys the final post-rebase write, third keys the winner
    val state = VersionedLake.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("x")).toMap
    streamKeys.foreach(k => assert(state(k) == "s2", s"$k -> ${state(k)}"))
    writerKeys.foreach(k => assert(state(k) == "final", s"$k -> ${state(k)}"))
    thirdKeys.foreach(k => assert(state(k) == "third", s"$k -> ${state(k)}"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }
}
