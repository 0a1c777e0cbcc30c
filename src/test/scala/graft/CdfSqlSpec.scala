package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** The CDF-by-name surface: `table_changes` TVF contracts the gate
  * doesn't reach (argument validation, version validation, default
  * toVersion) and the PLAIN-named streaming read
  * (`readStream.table("graft_lake.ns.t")`) — the gate covers the
  * `.changes` form.
  */
class CdfSqlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkTable(prefix: String): (String, String) = {
    val path = graft.sources.Scratch.dir(prefix)
    SqlCatalog.install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    val name = s"${SqlCatalog.CatalogName}.t.$prefix"
    VersionedLake.upsert(spark, path,
      Seq((1L, "a1", 1L), (2L, "a2", 1L)).toDF("k", "x", "seq")
        .withColumn("_deleted", lit(false)),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.dvUpsert(spark, path,
      Seq((2L, "b2", 10L, false), (3L, "b3", 11L, false),
        (1L, "a1", 12L, true)).toDF("k", "x", "seq", "_deleted"),
      Seq("k"), "seq", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) " +
      "USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq') " +
      s"LOCATION '$path'")
    (path, name)
  }

  test("table_changes: default toVersion, all four event types") {
    val (_, name) = mkTable("cdft_basic")
    val bare = name.stripPrefix(SqlCatalog.CatalogName + ".")
    val rows = spark.sql(
      s"SELECT k, _change_type, x FROM table_changes('$bare', 1)")
      .orderBy("k", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, "delete", "a1"),        // tombstoned at v2
      (2L, "update_postimage", "b2"),
      (2L, "update_preimage", "a2"),
      (3L, "insert", "b3")))
  }

  test("table_changes argument and version validation") {
    val (_, name) = mkTable("cdft_err")
    val bare = name.stripPrefix(SqlCatalog.CatalogName + ".")
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$bare', 1, 99)").collect()
    }
    assert(e1.getMessage.contains("versions must be committed"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('t.nosuch', 1)").collect()
    }
    assert(e2.getMessage.contains("no registered lake table"),
      e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$bare', 1, 2, 3)").collect()
    }
    assert(e3.getMessage.contains("2 or 3"), e3.getMessage)
  }

  test("plain readStream.table delivers live change rows, no tombstones") {
    import org.apache.spark.sql.streaming.Trigger
    val (_, name) = mkTable("cdft_stream")
    val acc = graft.sources.Scratch.dir("cdft_stream_acc")
    val ckpt = graft.sources.Scratch.dir("cdft_stream_ckpt")
    val q = spark.readStream.table(name)
      .writeStream.format("parquet")
      .option("path", acc).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(acc)
    // table-schema columns only — no bookkeeping leaks
    assert(got.columns.sorted.toSeq == Seq("k", "seq", "x"))
    // v1 rows (k=1,2) + v2 accepted non-delete rows (k=2,3); the k=1
    // tombstone row is filtered from the plain-named stream
    val rows = got.select("k", "x", "seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((1L, "a1", 1L), (2L, "a2", 1L),
      (2L, "b2", 10L), (3L, "b3", 11L)), s"got $rows")
  }

  test(".changes carries _deleted and _commit_version") {
    import org.apache.spark.sql.streaming.Trigger
    val (_, name) = mkTable("cdft_changes")
    val acc = graft.sources.Scratch.dir("cdft_changes_acc")
    val ckpt = graft.sources.Scratch.dir("cdft_changes_ckpt")
    val q = spark.readStream.table(s"$name.changes")
      .writeStream.format("parquet")
      .option("path", acc).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(acc)
    assert(got.columns.contains("_deleted") &&
      got.columns.contains("_commit_version"))
    val tomb = got.filter(col("_deleted")).select("k", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(tomb == Seq((1L, 2)), s"tombstone row with provenance: $tomb")
    assert(got.count() == 5, "v1: 2 rows; v2: 3 change rows")
  }
}
