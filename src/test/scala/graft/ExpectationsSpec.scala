package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** EXPECT … ON VIOLATION DROP ROW end to end: DDL parse + property
  * commit, drop-and-quarantine on every write path, per-rule metrics,
  * tombstone exemption, and DROP EXPECTATION.
  */
class ExpectationsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  SqlCatalog.install(spark)

  private def mkTable(prefix: String): (String, String) = {
    val path = graft.sources.Scratch.dir(prefix)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    val name = s"${SqlCatalog.CatalogName}.t.$prefix"
    VersionedLake.upsert(spark, path,
      Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("k", "v", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, v DOUBLE, seq BIGINT) " +
      "USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq') " +
      s"LOCATION '$path'")
    (path, name)
  }

  test("DROP ROW: violators quarantined with metrics, clean rows land") {
    val (path, name) = mkTable("exp_drop")
    spark.sql(s"ALTER TABLE $name ADD CONSTRAINT pos EXPECT (v > 0) " +
      "ON VIOLATION DROP ROW")
    // dirty batch through the ENGINE API (prepare path)
    VersionedLake.upsert(spark, path,
      Seq((1L, -5.0, 10L), (3L, 30.0, 10L)).toDF("k", "v", "seq"),
      Seq("k"), "seq")
    val v = VersionedLake.versions(spark, path).last
    val state = spark.sql(s"SELECT k, v FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(state == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)),
      s"violator dropped, clean landed, old row kept: $state")
    val q = VersionedLake.quarantined(spark, path, v)
      .select("k", "v", "_expect_failed").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(q == Seq((1L, -5.0, "pos")), s"quarantine content: $q")
    val m = VersionedLake.expectationMetrics(spark, path)
      .filter(col("version") === v).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq(("pos", 1L)), s"metrics: $m")
    // a clean batch still stamps a zero metric (observability, no dir)
    VersionedLake.dvUpsert(spark, path,
      Seq((4L, 40.0, 20L)).toDF("k", "v", "seq"), Seq("k"), "seq")
    val v2 = VersionedLake.versions(spark, path).last
    val m2 = VersionedLake.expectationMetrics(spark, path)
      .filter(col("version") === v2).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(m2 == Seq(("pos", 0L)), s"clean-batch metrics: $m2")
    assert(intercept[Exception](
      VersionedLake.quarantined(spark, path, v2))
      .getMessage.contains("dropped no rows"))
  }

  test("tombstones are exempt; MOR path enforces too") {
    val (path, name) = mkTable("exp_tomb")
    spark.sql(s"ALTER TABLE $name ADD CONSTRAINT pos EXPECT (v > 0) " +
      "ON VIOLATION DROP ROW")
    // a delete for k=1 whose carried v violates: must STILL delete
    VersionedLake.dvUpsert(spark, path,
      Seq((1L, -99.0, 10L, true), (2L, -1.0, 10L, false))
        .toDF("k", "v", "seq", "_deleted"),
      Seq("k"), "seq")
    val v = VersionedLake.versions(spark, path).last
    val state = spark.sql(s"SELECT k, v FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(state == Seq((2L, 20.0)),
      s"k=1 tombstone applied, k=2 dirty update dropped: $state")
    val q = VersionedLake.quarantined(spark, path, v)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(q == Seq(2L), "only the live violator is quarantined")
  }

  test("DROP EXPECTATION removes enforcement; unknown statements delegate") {
    val (path, name) = mkTable("exp_dropddl")
    spark.sql(s"ALTER TABLE $name ADD CONSTRAINT pos EXPECT (v > 0) " +
      "ON VIOLATION DROP ROW")
    spark.sql(s"ALTER TABLE $name DROP EXPECTATION pos")
    VersionedLake.upsert(spark, path,
      Seq((5L, -5.0, 10L)).toDF("k", "v", "seq"), Seq("k"), "seq")
    assert(spark.sql(s"SELECT v FROM $name WHERE k = 5").head()
      .getDouble(0) == -5.0, "dropped expectation no longer enforces")
    // the wrapped parser must pass everything else through untouched
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $name DROP EXPECTATION nosuch"))
    assert(e.getMessage.contains("no expectation named"), e.getMessage)
  }

  test("FAIL UPDATE via EXPECT DDL maps onto CHECK constraints") {
    val (path, name) = mkTable("exp_fail")
    spark.sql(s"ALTER TABLE $name ADD CONSTRAINT pos EXPECT (v > 0) " +
      "ON VIOLATION FAIL UPDATE")
    val before = VersionedLake.versions(spark, path)
    val e = intercept[Exception] {
      VersionedLake.upsert(spark, path,
        Seq((1L, -5.0, 10L), (3L, 30.0, 10L)).toDF("k", "v", "seq"),
        Seq("k"), "seq")
    }
    assert(e.getMessage.contains("constraint"), e.getMessage)
    assert(VersionedLake.versions(spark, path) == before,
      "FAIL UPDATE rejects wholesale and atomically")
  }
}
