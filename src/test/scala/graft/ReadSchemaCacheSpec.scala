package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedLake

/** r16 optimization: lake reads hand the scan an explicit schema from
  * the (immutable-file) footer cache instead of launching a
  * footer-merge Spark job per read. These pin that the fast path is
  * OBSERVATIONALLY IDENTICAL to the mergeSchema path it replaced —
  * same schema (names, types, nullability, field order), same rows —
  * and that heterogeneous filesets still take the merge path.
  */
class ReadSchemaCacheSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("homogeneous fileset: explicit-schema read == mergeSchema read") {
    val path = graft.sources.Scratch.dir("schemacache_homog")
    VersionedLake.upsert(spark, path,
      Seq((1L, 10.0, "a", 1L), (2L, 20.0, "b", 1L))
        .toDF("k", "v", "tag", "seq"),
      Seq("k"), "seq", numBuckets = 4)
    VersionedLake.upsert(spark, path,
      Seq((3L, 30.0, "c", 2L), (2L, 21.0, "b2", 2L))
        .toDF("k", "v", "tag", "seq"),
      Seq("k"), "seq")
    val m = VersionedLake.resolvedManifest(spark, path,
      VersionedLake.versions(spark, path).last)
    val files = m.filter(_.startsWith("gbucket="))
    assert(files.nonEmpty)
    // what the production read path (loadWithDv fast path) produces
    val fast = VersionedLake.read(spark, path)
    // the pre-change behavior, reconstructed verbatim
    val merged = spark.read.option("basePath", path)
      .option("mergeSchema", "true")
      .parquet(files.map(r => s"$path/$r"): _*)
      .filter(!coalesce(col("_deleted"), lit(false)))
      .drop("_deleted").drop("gbucket")
    assert(fast.schema == merged.schema,
      s"schema drift:\n fast=${fast.schema}\n merged=${merged.schema}")
    val a = fast.orderBy("k").collect().toSeq
    val b = merged.orderBy("k").collect().toSeq
    assert(a == b, s"row drift:\n fast=$a\n merged=$b")
    assert(a.size == 3)
  }

  test("heterogeneous fileset (schema evolution) still unions columns") {
    val path = graft.sources.Scratch.dir("schemacache_evo")
    VersionedLake.upsert(spark, path,
      Seq((1L, 10.0, 1L)).toDF("k", "v", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    // second commit carries an extra column: old and new files now
    // disagree, which must route the read through mergeSchema
    VersionedLake.upsert(spark, path,
      Seq((2L, 20.0, "x", 2L)).toDF("k", "v", "extra", "seq"),
      Seq("k"), "seq")
    val out = VersionedLake.read(spark, path)
    assert(out.columns.contains("extra"))
    val rows = out.orderBy("k")
      .select("k", "extra").as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some("x"))), rows.toString)
  }

  test("footer cache serves repeat reads of the same immutable files") {
    val path = graft.sources.Scratch.dir("schemacache_repeat")
    VersionedLake.upsert(spark, path,
      Seq((1L, 1.0, 1L)).toDF("k", "v", "seq"), Seq("k"), "seq",
      numBuckets = 2)
    val r1 = VersionedLake.read(spark, path).collect().toSeq
    val r2 = VersionedLake.read(spark, path).collect().toSeq
    assert(r1 == r2)
  }
}
