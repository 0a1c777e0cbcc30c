package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** Branches as SQL citizens: the `ns.t.branch_<name>` identifier
  * (read + keyed DML on the branch chain), `VERSION AS OF '<branch>'`
  * ref-name resolution, the `ns.t.refs` metadata table, and the error
  * surfaces. The gate row covers the full WAP lifecycle; these pin the
  * contracts it doesn't reach.
  */
class BranchSqlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkTable(prefix: String): (String, String) = {
    val path = graft.sources.Scratch.dir(prefix)
    SqlCatalog.install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    val name = s"${SqlCatalog.CatalogName}.t.$prefix"
    VersionedLake.upsert(spark, path,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) USING graft " +
        s"OPTIONS (mergeKeys 'k', mergeSeq 'seq') LOCATION '$path'")
    (path, name)
  }

  test("branch identifier serves keyed DML isolated from main") {
    val (path, name) = mkTable("bsql_dml")
    VersionedLake.createBranch(spark, path, "wip")
    val mainVs = VersionedLake.versions(spark, path)
    Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("bsql_src")
    spark.sql(s"""MERGE INTO $name.branch_wip t USING bsql_src s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET x = s.x, seq = s.seq
      WHEN NOT MATCHED THEN INSERT (k, x, seq) VALUES (s.k, s.x, s.seq)""")
    // main chain untouched; branch sees the merge through every read
    assert(VersionedLake.versions(spark, path) == mainVs)
    val viaIdent = spark.sql(
      s"SELECT k, x FROM $name.branch_wip ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaIdent == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    val viaAsOf = spark.sql(
      s"SELECT k, x FROM $name VERSION AS OF 'wip' ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaAsOf == viaIdent)
    assert(spark.sql(s"SELECT k FROM $name ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("refs lists main, branches with fork points, and tags") {
    val (path, name) = mkTable("bsql_refs")
    VersionedLake.createTag(spark, path, "pinned", 1)
    VersionedLake.createBranch(spark, path, "dev")
    val refs = spark.sql(
      s"SELECT name, type, version, base_version FROM $name.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    val mainTip = VersionedLake.versions(spark, path).last
    val devTip = VersionedLake.versions(
      spark, VersionedLake.branchPath(path, "dev")).last
    assert(refs == Set(
      ("main", "BRANCH", mainTip, -1),
      ("dev", "BRANCH", devTip, mainTip),
      ("pinned", "TAG", 1, -1)), refs.toString)
  }

  test("unknown refs fail loudly on both surfaces") {
    val (_, name) = mkTable("bsql_err")
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM $name.branch_nope").collect())
    assert(e1.getMessage.toLowerCase.contains("branch_nope"),
      e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM $name VERSION AS OF 'nope'").collect())
    assert(e2.getMessage.contains("neither a version number"),
      e2.getMessage)
  }
}
