package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileRegistry, Scratch, SqlCatalog, Volumes}

class VolumesSpec extends AnyFunSuite {
  import TestSpark._

  test("volume lifecycle: create, resolve, list, drop, re-create") {
    SqlCatalog.install(spark)
    val cat = SqlCatalog.CatalogName
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.volspec")
    val loc = Scratch.dir("volspec_loc")
    spark.sql(s"CALL $cat.system.drop_volume('volspec.v1')").collect()
    val created = spark
      .sql(s"CALL $cat.system.create_volume('volspec.v1', '$loc')").head()
    assert(created.getString(0) == "volspec.v1" && created.getBoolean(1))
    // the volume:// scheme resolves name → location (+ subpath)
    assert(FileRegistry.resolveDir(spark, "volume://volspec.v1") == loc)
    assert(FileRegistry.resolveDir(spark, "volume://volspec.v1/a/b")
      == s"$loc/a/b")
    // non-volume paths pass through untouched
    assert(FileRegistry.resolveDir(spark, "/tmp/plain") == "/tmp/plain")
    // the inventory relation lists it under its namespace only
    val rows = spark.sql(s"SELECT * FROM $cat.volspec.volumes").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(("volspec", "v1", loc)))
    // duplicate CREATE refuses (the Unity CREATE VOLUME contract)
    val dup = intercept[Exception] {
      spark.sql(s"CALL $cat.system.create_volume('volspec.v1', '/x')")
        .collect()
    }
    assert(dup.getMessage.contains("already exists"))
    // DROP forgets it: resolution fails loudly, inventory is empty
    val dropped = spark
      .sql(s"CALL $cat.system.drop_volume('volspec.v1')").head()
    assert(dropped.getBoolean(1))
    val unknown = intercept[IllegalArgumentException] {
      FileRegistry.resolveDir(spark, "volume://volspec.v1")
    }
    assert(unknown.getMessage.contains("unknown volume"))
    assert(spark.sql(s"SELECT * FROM $cat.volspec.volumes").isEmpty)
    // a second drop reports nothing-to-drop instead of failing
    assert(!spark.sql(s"CALL $cat.system.drop_volume('volspec.v1')")
      .head().getBoolean(1))
  }

  test("nested-namespace volume does not list in the parent inventory") {
    SqlCatalog.install(spark)
    val cat = SqlCatalog.CatalogName
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.volnest")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.volnest.sub")
    spark.sql(s"CALL $cat.system.drop_volume('volnest.direct')").collect()
    spark.sql(s"CALL $cat.system.drop_volume('volnest.sub.deep')").collect()
    spark.sql(s"CALL $cat.system.create_volume('volnest.direct', '/tmp/d')")
      .collect()
    spark.sql(s"CALL $cat.system.create_volume('volnest.sub.deep', '/tmp/e')")
      .collect()
    // the parent's inventory carries ONLY its single-segment member;
    // 'sub.deep' belongs to volnest.sub and must not alias into it
    val parent = spark.sql(s"SELECT * FROM $cat.volnest.volumes").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(parent == Seq(("direct", "/tmp/d")), s"parent rows: $parent")
    val sub = spark.sql(s"SELECT * FROM $cat.volnest.sub.volumes")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(sub == Seq(("deep", "/tmp/e")), s"sub rows: $sub")
  }

  test("DROP NAMESPACE CASCADE forgets member volumes") {
    SqlCatalog.install(spark)
    val cat = SqlCatalog.CatalogName
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.volspec2")
    spark.sql(s"CALL $cat.system.create_volume('volspec2.v', '/tmp/v')")
      .collect()
    spark.sql(s"DROP NAMESPACE $cat.volspec2 CASCADE")
    spark.sql(s"CREATE NAMESPACE $cat.volspec2")
    assert(spark.sql(s"SELECT * FROM $cat.volspec2.volumes").isEmpty,
      "re-created namespace inherited the dropped namespace's volumes")
  }

  test("gate: two-phase ingest through the volume name matches oracle shape") {
    val out = Volumes.queries("catalog_volumes")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(2) == "raw_landing"))
    val runs = out.map(_.getLong(1)).toSet
    assert(runs == Set(1L, 2L), s"expected two ingest runs, got $runs")
  }
}
