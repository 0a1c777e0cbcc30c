package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SqlCatalog, VersionedLake}

/** SQL DML beyond INSERT: `MERGE INTO` (lowered by GraftMergeRule onto
  * one VersionedLake.upsert commit) and `DELETE FROM … WHERE` (DSv2
  * SupportsDelete onto a MOR position-delete commit). The gate rows
  * cover oracle convergence; these specs pin the contracts the gate
  * doesn't reach: NOT MATCHED BY SOURCE clauses, first-match-wins
  * action order, the error surfaces, and the truncate form.
  */
class SqlDmlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshTable(prefix: String): (String, String) = {
    val path = graft.sources.Scratch.dir(prefix)
    SqlCatalog.install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS ${SqlCatalog.CatalogName}.t")
    val name = s"${SqlCatalog.CatalogName}.t.$prefix"
    (path, name)
  }

  private def mkTable(prefix: String,
      rows: Seq[(Long, String, Long)]): (String, String) = {
    val (path, name) = freshTable(prefix)
    VersionedLake.upsert(spark, path,
      rows.toDF("k", "x", "seq"), Seq("k"), "seq", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name (k BIGINT, x STRING, seq BIGINT) USING graft " +
        s"OPTIONS (mergeKeys 'k', mergeSeq 'seq') LOCATION '$path'")
    (path, name)
  }

  private def state(name: String): Seq[(Long, String, Long)] =
    spark.sql(s"SELECT k, x, seq FROM $name ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("MERGE: matched update/delete, not-matched insert, one commit") {
    val (path, name) = mkTable("sqlm_basic",
      Seq((1L, "a1", 1L), (2L, "a2", 1L), (3L, "a3", 1L)))
    Seq((2L, "b2", 10L, "U"), (3L, "gone", 11L, "D"), (4L, "b4", 12L, "I"))
      .toDF("k", "x", "seq", "op").createOrReplaceTempView("m_src")
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"""MERGE INTO $name t USING m_src s ON t.k = s.k
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET x = s.x, seq = s.seq
      WHEN NOT MATCHED AND s.op <> 'D' THEN
        INSERT (k, x, seq) VALUES (s.k, s.x, s.seq)""")
    assert(VersionedLake.versions(spark, path).last == before + 1,
      "MERGE must land as exactly one commit")
    assert(state(name) ==
      Seq((1L, "a1", 1L), (2L, "b2", 10L), (4L, "b4", 12L)))
  }

  test("MERGE: NOT MATCHED BY SOURCE update and delete") {
    val (_, name) = mkTable("sqlm_nmbs",
      Seq((1L, "a1", 1L), (2L, "a2", 2L), (3L, "a3", 3L), (4L, "a4", 4L)))
    Seq((2L, "b2", 10L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("m_nmbs_src")
    spark.sql(s"""MERGE INTO $name t USING m_nmbs_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET x = s.x, seq = s.seq
      WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN
        UPDATE SET x = 'orphan', seq = t.seq + 100""")
    // k=1 matches neither NMBS condition: carried over untouched
    assert(state(name) ==
      Seq((1L, "a1", 1L), (2L, "b2", 10L), (4L, "orphan", 104L)))
  }

  test("MERGE: first matching WHEN clause wins, later ones ignored") {
    val (_, name) = mkTable("sqlm_order", Seq((1L, "a1", 1L)))
    Seq((1L, "s1", 10L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("m_ord_src")
    spark.sql(s"""MERGE INTO $name t USING m_ord_src s ON t.k = s.k
      WHEN MATCHED AND s.seq >= 10 THEN UPDATE SET x = 'first', seq = s.seq
      WHEN MATCHED THEN DELETE""")
    assert(state(name) == Seq((1L, "first", 10L)),
      "the second (DELETE) clause must not fire once the first matched")
  }

  test("MERGE errors: cardinality, missing contract, unassigned keeps") {
    val (_, name) = mkTable("sqlm_err", Seq((1L, "a1", 1L), (2L, "a2", 2L)))
    // two source rows for one matched target row must error, not pick one
    Seq((1L, "s1", 10L), (1L, "s2", 11L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("m_dup_src")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name t USING m_dup_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET x = s.x""")
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"), e.getMessage)
    // a partial UPDATE SET keeps unassigned columns (seq unchanged)
    Seq((2L, "patched")).toDF("k", "x").createOrReplaceTempView("m_patch")
    spark.sql(s"""MERGE INTO $name t USING m_patch s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET x = s.x""")
    assert(state(name) == Seq((1L, "a1", 1L), (2L, "patched", 2L)))
    // MERGE needs the mergeKeys/mergeSeq registration
    val (path2, name2) = freshTable("sqlm_nocontract")
    VersionedLake.upsert(spark, path2,
      Seq((1L, "a", 1L)).toDF("k", "x", "seq"), Seq("k"), "seq")
    spark.sql(s"DROP TABLE IF EXISTS $name2")
    spark.sql(s"CREATE TABLE $name2 (k BIGINT, x STRING, seq BIGINT) " +
      s"USING graft LOCATION '$path2'")
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name2 t USING m_patch s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET x = s.x""")
    }
    assert(e2.getMessage.contains("merge contract"), e2.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source's new column") {
    val (path, name) = mkTable("sqlm_evo", Seq((1L, "a1", 1L), (2L, "a2", 2L)))
    Seq((2L, "b2", 10L, "extra2"), (3L, "b3", 11L, "extra3"))
      .toDF("k", "x", "seq", "note").createOrReplaceTempView("m_evo_src")
    // without the clause, the unknown column must refuse to resolve
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name t USING m_evo_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET x = s.x, seq = s.seq, note = s.note
        WHEN NOT MATCHED THEN INSERT (k, x, seq, note)
          VALUES (s.k, s.x, s.seq, s.note)""")
    }
    assert(e.getMessage != null)
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $name t
      USING m_evo_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET x = s.x, seq = s.seq, note = s.note
      WHEN NOT MATCHED THEN INSERT (k, x, seq, note)
        VALUES (s.k, s.x, s.seq, s.note)""")
    // version chain +2: ADD_COLUMN then the MERGE commit
    assert(VersionedLake.versions(spark, path).last == before + 2,
      "schema evolution is ADD_COLUMN + MERGE, two commits")
    val ops = VersionedLake.history(spark, path).orderBy("version")
      .collect().map(_.getString(1)).toSeq.takeRight(2)
    assert(ops == Seq("ADD_COLUMN", "MERGE"), s"op chain: $ops")
    val rows = spark.sql(s"SELECT k, x, note FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(rows == Seq(
      (1L, "a1", None),           // untouched row reads NULL
      (2L, "b2", Some("extra2")),
      (3L, "b3", Some("extra3"))), s"evolved state: $rows")
    // pre-evolution time travel does NOT show the column
    assert(!spark.sql(s"SELECT * FROM $name VERSION AS OF $before")
      .columns.contains("note"))
  }

  test("MERGE cardinality counts FIRED pairs, not raw matches") {
    // Two source rows match k=1 but only one passes the WHEN MATCHED
    // AND condition — Delta/SQL accept this (one modification per
    // target row); counting raw matched pairs would falsely reject it.
    val (_, name) = mkTable("sqlm_fired", Seq((1L, "a1", 1L)))
    Seq((1L, "keep", 10L, true), (1L, "skip", 11L, false))
      .toDF("k", "x", "seq", "apply").createOrReplaceTempView("m_fired_src")
    spark.sql(s"""MERGE INTO $name t USING m_fired_src s ON t.k = s.k
      WHEN MATCHED AND s.apply THEN UPDATE SET x = s.x, seq = s.seq""")
    assert(state(name) == Seq((1L, "keep", 10L)),
      "condition-filtered duplicate match must merge, not error")
    // …but two FIRED updates on one target row still error
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name t USING m_fired_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET x = s.x, seq = s.seq""")
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"), e.getMessage)
  }

  test("MERGE: sole unconditional DELETE is idempotent across dup matches") {
    // Deleting the same target row via two matching source rows is
    // deterministic (both say delete) — exempt from the cardinality
    // error, lands as one tombstone.
    val (path, name) = mkTable("sqlm_dupdel",
      Seq((1L, "a1", 1L), (2L, "a2", 2L)))
    Seq((1L, "x", 10L), (1L, "y", 11L)).toDF("k", "x", "seq")
      .createOrReplaceTempView("m_dupdel_src")
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"""MERGE INTO $name t USING m_dupdel_src s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(VersionedLake.versions(spark, path).last == before + 1,
      "idempotent duplicate DELETE must land as one commit")
    assert(state(name) == Seq((2L, "a2", 2L)),
      "k=1 deleted once; k=2 untouched")
  }

  test("DELETE FROM: pushed predicate, MOR commit, truncate form") {
    val (path, name) = mkTable("sqld_where",
      (1L to 10L).map(i => (i, s"a$i", i)))
    val before = VersionedLake.versions(spark, path).last
    def dataFiles(v: Int): Set[String] =
      VersionedLake.resolvedManifest(spark, path, v)
        .filter(l => l.contains(".parquet") && !l.contains("_dv/")).toSet
    val dataBefore = dataFiles(before)
    spark.sql(s"DELETE FROM $name WHERE k >= 8")
    val after = VersionedLake.versions(spark, path).last
    assert(after == before + 1)
    // the DELETE moved DV mappings; the data-file lines it carries must
    // reference the SAME physical files (manifest lines for DV'd files
    // change their dv pointer, so compare the file paths, not lines)
    def pathsOf(lines: Set[String]): Set[String] =
      lines.flatMap(_.split('\t').find(_.endsWith(".parquet")))
    assert(pathsOf(dataFiles(after)) == pathsOf(dataBefore),
      "position delete must rewrite zero data files")
    assert(state(name).map(_._1) == (1L to 7L))
    // DELETE FROM t (no WHERE) = truncate through the same MOR path
    spark.sql(s"DELETE FROM $name")
    assert(state(name).isEmpty, "truncate form must delete every row")
  }

  test("DELETE FROM: untranslatable predicate is refused, not wrong") {
    val (_, name) = mkTable("sqld_resid",
      (1L to 6L).map(i => (i, s"a$i", i)))
    // modulo is not in the pushable filter algebra -> canDeleteWhere
    // false -> Spark must error instead of deleting a superset/subset
    intercept[Exception] {
      spark.sql(s"DELETE FROM $name WHERE k % 2 = 0")
    }
    assert(state(name).size == 6, "refused DELETE must not change rows")
  }

  test("UPDATE: assignments apply, unassigned kept, key assignment refused") {
    val (path, name) = mkTable("sqlu_basic",
      Seq((1L, "a1", 1L), (2L, "a2", 2L), (3L, "a3", 3L)))
    val before = VersionedLake.versions(spark, path).last
    spark.sql(s"UPDATE $name SET x = concat(x, '!') WHERE k >= 2")
    assert(VersionedLake.versions(spark, path).last == before + 1,
      "UPDATE must land as exactly one commit")
    assert(state(name) ==
      Seq((1L, "a1", 1L), (2L, "a2!", 2L), (3L, "a3!", 3L)))
    // a merge-key assignment is an identity change: refused
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $name SET k = k + 10")
    }
    assert(e.getMessage.contains("merge key"), e.getMessage)
    // UPDATE with no WHERE touches every row
    spark.sql(s"UPDATE $name SET seq = seq + 100")
    assert(state(name).map(_._3) == Seq(101L, 102L, 103L))
  }

  test("ALTER TABLE: rename, widen, drop through the catalog") {
    val (path, name) = freshTable("sqla_ddl")
    VersionedLake.upsert(spark, path,
      Seq((1L, 7, "x1"), (2L, 8, "x2")).toDF("k", "n", "x"),
      Seq("k"), "k", numBuckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, n INT, x STRING) " +
      s"USING graft LOCATION '$path'")
    spark.sql(s"ALTER TABLE $name RENAME COLUMN x TO y")
    spark.sql(s"ALTER TABLE $name ALTER COLUMN n TYPE BIGINT")
    val served = spark.table(name)
    assert(served.schema.fieldNames.toSeq == Seq("k", "n", "y"))
    assert(served.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    spark.sql(s"ALTER TABLE $name DROP COLUMN y")
    assert(spark.table(name).schema.fieldNames.toSeq == Seq("k", "n"))
    assert(spark.sql(s"SELECT sum(n) FROM $name").head().getLong(0) == 15L)
    // a narrowing type change must be refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $name ALTER COLUMN n TYPE INT")
    }
  }
}
