package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** The lake's SQL surface: catalog-name resolution, VERSION AS OF /
  * TIMESTAMP AS OF time travel, filter pushdown with residuals, column
  * pruning, and inheritance of lake semantics (DVs, tombstones, column
  * mapping) through `spark.sql`.
  */
class SqlCatalogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshTable(prefix: String): (String, String) = {
    val path = graft.sources.Scratch.dir(prefix)
    SqlCatalog.install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    val name = s"${SqlCatalog.CatalogName}.t.$prefix"
    (path, name)
  }

  test("catalog name resolves snapshot, versions and timestamps") {
    val (path, name) = freshTable("sqlcat_tt")
    VersionedLake.setClockOverride(path, Some(() => 1000L))
    try {
      VersionedLake.upsert(spark, path,
        (1L to 4L).map(i => (i, s"a$i", i)).toDF("k", "x", "seq"),
        Seq("k"), "seq", numBuckets = 2)
      VersionedLake.setClockOverride(path, Some(() => 2000L))
      VersionedLake.dvUpsert(spark, path,
        Seq((2L, "b2", 10L, false), (3L, "dead", 11L, true))
          .toDF("k", "x", "seq", "_deleted"), Seq("k"), "seq")
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(
        s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) USING graft " +
          s"LOCATION '$path'")
      // snapshot: DVs + tombstones honored through SQL
      val cur = spark.sql(s"SELECT k, x FROM $name ORDER BY k").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq
      assert(cur == Seq(1L -> "a1", 2L -> "b2", 4L -> "a4"), cur.toString)
      // VERSION AS OF
      val v1 = spark.sql(s"SELECT k, x FROM $name VERSION AS OF 1 ORDER BY k")
        .collect().map(_.getString(1)).toSeq
      assert(v1 == Seq("a1", "a2", "a3", "a4"), v1.toString)
      // TIMESTAMP AS OF resolves last-at-or-before through the catalog
      val ts = spark.sql(s"SELECT COUNT(*) FROM $name " +
        "TIMESTAMP AS OF '1970-01-01 00:00:01.5'").head().getLong(0)
      assert(ts == 4L, s"timestamp travel resolved wrong version: $ts rows")
      // VERSION AS OF a TAG NAME — the Iceberg ref form through SQL
      VersionedLake.createTag(spark, path, "pre_mor", 1)
      val byTag = spark.sql(
        s"SELECT x FROM $name VERSION AS OF 'pre_mor' ORDER BY x")
        .collect().map(_.getString(0)).toSeq
      assert(byTag == Seq("a1", "a2", "a3", "a4"), byTag.toString)
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $name VERSION AS OF 'nope'").collect()
      }
    } finally VersionedLake.setClockOverride(path, None)
  }

  test("filter pushdown with residuals; pruning; count(*)") {
    val (path, name) = freshTable("sqlcat_push")
    VersionedLake.upsert(spark, path,
      (1L to 100L).map(i => (i, s"s$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 4)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) USING graft " +
        s"LOCATION '$path'")
    // numeric conjunct pushes; string predicate stays residual — both
    // must still produce the exact answer
    val q = spark.sql(
      s"SELECT k FROM $name WHERE k >= 90 AND x LIKE 's9%' ORDER BY k")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(k,90)"), plan)
    assert(q.collect().map(_.getLong(0)).toSeq ==
      (90L to 99L), "pushdown changed results")
    // column pruning reaches the relation (x never materializes)
    val pruned = spark.sql(s"SELECT k FROM $name WHERE k <= 3 ORDER BY k")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // COUNT(*) survives the empty-projection path
    assert(spark.sql(s"SELECT COUNT(*) FROM $name").head().getLong(0) == 100L)
  }

  test("INSERT INTO merges by key through the lake, not appends") {
    val (path, name) = freshTable("sqlcat_ins")
    VersionedLake.upsert(spark, path,
      (1L to 4L).map(i => (i, s"a$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft OPTIONS (mergeKeys 'k', mergeSeq 'seq') " +
      s"LOCATION '$path'")
    // an update (k=2, higher seq), a stale change (k=3, lower... equal
    // rule: seq ties go to the update) and an insert (k=9)
    spark.sql(s"INSERT INTO $name BY NAME " +
      "SELECT * FROM VALUES (2L, 'b2', 10L), (9L, 'b9', 1L) AS t(k, x, seq)")
    val got = spark.sql(s"SELECT k, x FROM $name ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "a1", 2L -> "b2", 3L -> "a3", 4L -> "a4",
      9L -> "b9"), got.toString)
    // a registration WITHOUT the merge contract refuses INSERT
    val ro = s"${SqlCatalog.CatalogName}.t.sqlcat_ins_ro"
    spark.sql(s"DROP TABLE IF EXISTS $ro")
    spark.sql(s"CREATE TABLE $ro (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft LOCATION '$path'")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $ro BY NAME " +
        "SELECT * FROM VALUES (7L, 'z', 1L) AS t(k, x, seq)")
    }
  }

  test("column mapping flows through SQL: renamed names resolve") {
    val (path, name) = freshTable("sqlcat_ren")
    VersionedLake.upsert(spark, path,
      (1L to 3L).map(i => (i, i * 1.0, i)).toDF("k", "v", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    VersionedLake.renameColumn(spark, path, "v", "amount")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, amount DOUBLE, seq BIGINT) " +
      s"USING graft LOCATION '$path'")
    val got = spark.sql(s"SELECT amount FROM $name WHERE k = 2").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(2.0))
    // pre-rename version still speaks the old schema
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 1").columns
      .contains("v"))
  }

  test("COMMENT metadata: set, update, rename-carry, drop, describe") {
    val (path, name) = freshTable("sqlcat_cmt")
    VersionedLake.upsert(spark, path,
      (1L to 3L).map(i => (i, s"a$i", i)).toDF("k", "x", "seq"),
      Seq("k"), "seq", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft LOCATION '$path'")
    // unset comment reads back NULL through the describe relation
    assert(spark.sql(s"SELECT prop_value FROM $name.describe " +
      "WHERE prop_key = 'comment'").head().isNullAt(0))
    spark.sql(s"COMMENT ON TABLE $name IS 'first'")
    spark.sql(s"COMMENT ON TABLE $name IS 'second'") // last writer wins
    def comment(t: String): String =
      spark.sql(s"SELECT prop_value FROM $t.describe " +
        "WHERE prop_key = 'comment'").head().getString(0)
    assert(comment(name) == "second")
    // the comment travels with RENAME
    val renamed = name + "_r"
    spark.sql(s"DROP TABLE IF EXISTS $renamed")
    spark.sql(s"ALTER TABLE $name RENAME TO t.sqlcat_cmt_r")
    assert(comment(renamed) == "second")
    // DROP forgets it: a re-registration starts comment-less
    spark.sql(s"DROP TABLE $renamed")
    spark.sql(s"CREATE TABLE $renamed (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft LOCATION '$path'")
    assert(spark.sql(s"SELECT prop_value FROM $renamed.describe " +
      "WHERE prop_key = 'comment'").head().isNullAt(0))
    // namespace comments: CREATE ... COMMENT and COMMENT ON NAMESPACE
    val ns = s"${SqlCatalog.CatalogName}.cmt_ns"
    spark.sql(s"DROP NAMESPACE IF EXISTS $ns")
    spark.sql(s"CREATE NAMESPACE $ns COMMENT 'born documented'")
    def nsComment(): String = spark
      .sql(s"DESCRIBE NAMESPACE EXTENDED $ns")
      .filter(lower(col("info_name")) === "comment")
      .head().getString(1)
    assert(nsComment() == "born documented")
    spark.sql(s"COMMENT ON NAMESPACE $ns IS 'updated'")
    assert(nsComment() == "updated")
    // DROP NAMESPACE forgets comments too — both the namespace's own
    // and its member tables' (the r14 advice leak): re-creating either
    // at the same identifier must start comment-less
    val nsTable = s"$ns.member"
    spark.sql(s"CREATE TABLE $nsTable (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft LOCATION '$path'")
    spark.sql(s"COMMENT ON TABLE $nsTable IS 'member note'")
    assert(comment(nsTable) == "member note")
    spark.sql(s"DROP NAMESPACE $ns CASCADE")
    spark.sql(s"CREATE NAMESPACE $ns")
    assert(spark.sql(s"DESCRIBE NAMESPACE EXTENDED $ns")
      .filter(lower(col("info_name")) === "comment").isEmpty,
      "re-created namespace inherited the dropped namespace's comment")
    spark.sql(s"CREATE TABLE $nsTable (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft LOCATION '$path'")
    assert(spark.sql(s"SELECT prop_value FROM $nsTable.describe " +
      "WHERE prop_key = 'comment'").head().isNullAt(0),
      "re-created member table inherited the dropped table's comment")
  }
}
