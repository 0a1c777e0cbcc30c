package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** Atomic CTAS / RTAS on the lake catalog: one statement registers the
  * name and lands version 1; REPLACE swaps content in one commit with
  * history preserved; a failed CTAS leaves neither a name nor a file.
  */
class CtasSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  SqlCatalog.install(spark)

  private def fresh(prefix: String): (String, String) = {
    val path = graft.sources.Scratch.dir(prefix)
    // Scratch.dir creates the directory; CTAS needs a version-free
    // location, which an existing EMPTY dir satisfies
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    (path, s"${SqlCatalog.CatalogName}.t.$prefix")
  }

  test("CTAS lands v1 and registers the name in one statement") {
    val (path, name) = fresh("ctas_basic")
    Seq((1L, "a", 1L), (2L, "b", 2L), (2L, "b2", 3L))
      .toDF("k", "x", "seq").createOrReplaceTempView("ctas_src")
    spark.sql(s"""CREATE TABLE $name
      USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq')
      LOCATION '$path' AS SELECT * FROM ctas_src""")
    assert(VersionedLake.versions(spark, path) == Seq(1),
      "CTAS must land exactly version 1")
    val rows = spark.sql(s"SELECT k, x, seq FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a", 1L), (2L, "b2", 3L)),
      "CTAS content resolves winner-per-key like every lake write")
    // and the merge contract registered: INSERT upserts
    Seq((1L, "a9", 9L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("ctas_more")
    spark.sql(s"INSERT INTO $name SELECT * FROM ctas_more")
    assert(spark.sql(s"SELECT x FROM $name WHERE k = 1").head()
      .getString(0) == "a9")
  }

  test("CTAS without a merge contract or onto a live location is refused") {
    val (path, name) = fresh("ctas_refuse")
    Seq((1L, "a", 1L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("ctas_r_src")
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $name USING graft LOCATION '$path' " +
        "AS SELECT * FROM ctas_r_src")
    }
    assert(e1.getMessage.contains("mergeKeys"), e1.getMessage)
    // failure must not have registered the name
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $name")).getMessage.nonEmpty)
    // a location with committed versions refuses CTAS
    VersionedLake.upsert(spark, path,
      Seq((1L, "a", 1L)).toDF("k", "x", "seq"), Seq("k"), "seq")
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $name USING graft " +
        "OPTIONS (mergeKeys 'k', mergeSeq 'seq') " +
        s"LOCATION '$path' AS SELECT * FROM ctas_r_src")
    }
    assert(e2.getMessage.contains("already holds committed"),
      e2.getMessage)
  }

  test("failed CTAS leaves no table and no files (no-orphan)") {
    val (path, name) = fresh("ctas_fail")
    // the location must not pre-exist for the no-orphan check to be
    // observable as "directory gone"
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    Seq((1L, "a", 1L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("ctas_f_src")
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $name
        USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq')
        LOCATION '$path'
        AS SELECT k, raise_error('boom') AS x, seq FROM ctas_f_src""")
    }
    assert(e.getMessage != null)
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $name")).getMessage.nonEmpty,
      "failed CTAS must not register the name")
    assert(!f.exists(new org.apache.hadoop.fs.Path(path)),
      "failed CTAS must leave no files at the location")
  }

  test("RTAS replaces content in one commit, history preserved") {
    val (path, name) = fresh("rtas_basic")
    Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("rtas_v1")
    spark.sql(s"""CREATE TABLE $name
      USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq')
      LOCATION '$path' AS SELECT * FROM rtas_v1""")
    Seq((2L, "B", 10L), (3L, "C", 11L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("rtas_v2")
    spark.sql(s"""REPLACE TABLE $name
      USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq')
      AS SELECT * FROM rtas_v2""")
    assert(VersionedLake.versions(spark, path) == Seq(1, 2),
      "RTAS must land as exactly one more commit")
    val now = spark.sql(s"SELECT k, x FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(now == Seq((2L, "B"), (3L, "C")), s"replaced content: $now")
    val was = spark.sql(s"SELECT k, x FROM $name VERSION AS OF 1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(was == Seq((1L, "a"), (2L, "b")),
      s"pre-replace snapshot must stay time-travelable: $was")
    val ops = VersionedLake.history(spark, path)
      .orderBy("version").collect().map(_.getString(1)).toSeq
    assert(ops.last == "REPLACE", s"history records the REPLACE: $ops")
  }

  test("REPLACE of an unregistered table is refused; OR REPLACE creates") {
    val (path, name) = fresh("rtas_missing")
    Seq((1L, "a", 1L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("rtas_m_src")
    val e = intercept[Exception] {
      spark.sql(s"REPLACE TABLE $name USING graft " +
        "OPTIONS (mergeKeys 'k', mergeSeq 'seq') " +
        s"LOCATION '$path' AS SELECT * FROM rtas_m_src")
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    spark.sql(s"""CREATE OR REPLACE TABLE $name
      USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq')
      LOCATION '$path' AS SELECT * FROM rtas_m_src""")
    assert(spark.sql(s"SELECT COUNT(*) FROM $name").head().getLong(0) == 1)
  }

  test("CTAS without LOCATION lands under the managed warehouse") {
    val name = s"${SqlCatalog.CatalogName}.t.ctas_managed"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$wh/t/ctas_managed"), true)
    Seq((1L, "a", 1L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("ctas_w_src")
    spark.sql(s"""CREATE TABLE $name
      USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq')
      AS SELECT * FROM ctas_w_src""")
    assert(VersionedLake.versions(spark, s"$wh/t/ctas_managed") == Seq(1),
      "managed CTAS derives its location from the warehouse conf")
    assert(spark.sql(s"SELECT COUNT(*) FROM $name").head().getLong(0) == 1)
  }
}
