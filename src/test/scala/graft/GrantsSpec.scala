package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Grants
import graft.sources.CatalogSetup

/** The GRANT surface: registry semantics, fold-away plans for granted
  * principals, loud refusal naming the missing privilege for the rest.
  */
class GrantsSpec extends AnyFunSuite {
  import TestSpark._

  test("registry: fail-closed, group match, admin bypass, revoke") {
    Grants.clear("spec_db")
    assert(!Grants.check("spec_db.t", "SELECT", "analysts"))
    Grants.grant("spec_db.t", "SELECT", "analysts")
    assert(Grants.check("spec_db.t", "SELECT", "analysts"))
    assert(Grants.check("spec_db.t", "select", " analysts , other"))
    assert(!Grants.check("spec_db.t", "SELECT", "interns"))
    assert(!Grants.check("spec_db.t", "USE", "analysts")) // per-privilege
    assert(Grants.check("spec_db.other", "SELECT", "admin")) // bypass
    Grants.revoke("spec_db.t", "SELECT", "analysts")
    assert(!Grants.check("spec_db.t", "SELECT", "analysts"))
    Grants.clear("spec_db")
  }

  test("granted principal's plan folds the guard away (no raise_error)") {
    val name = CatalogSetup.bindAclCustomers(spark, sf)
    val silver = CatalogSetup.Prod.db("silver")
    Grants.clear(silver)
    Grants.grant(silver, "USE", "analysts")
    Grants.grant(name, "SELECT", "analysts")
    spark.conf.set("spark.graft.caller.groups", "analysts")
    try {
      val plan = spark.table(name).queryExecution.optimizedPlan
      assert(!plan.toString.toLowerCase.contains("raise_error"),
        s"guard survived in a granted plan:\n$plan")
      assert(!plan.toString.toLowerCase.contains("has_privilege"),
        s"has_privilege did not fold:\n$plan")
      assert(spark.table(name).count() > 0)
    } finally spark.conf.unset("spark.graft.caller.groups")
    Grants.clear(silver)
  }

  test("refused principal errors with the missing privilege named") {
    val name = CatalogSetup.bindAclCustomers(spark, sf)
    val silver = CatalogSetup.Prod.db("silver")
    Grants.clear(silver)
    Grants.grant(silver, "USE", "contractors") // USE without SELECT
    def readAs(groups: String): Throwable = {
      spark.conf.set("spark.graft.caller.groups", groups)
      try intercept[Throwable] {
        spark.table(name).localCheckpoint(true)
      } finally spark.conf.unset("spark.graft.caller.groups")
    }
    def chain(t: Throwable): Seq[String] = {
      var x = t; val b = Seq.newBuilder[String]
      while (x != null) { b += Option(x.getMessage).getOrElse(""); x = x.getCause }
      b.result()
    }
    assert(chain(readAs("contractors")).exists(_.contains(s"SELECT on $name")))
    assert(chain(readAs("interns")).exists(_.contains(s"USE on $silver")))
    Grants.clear(silver)
  }

  test("SQL face: CALL system.grant/revoke/show_grants round-trip") {
    graft.sources.SqlCatalog.install(spark)
    val cat = graft.sources.SqlCatalog.CatalogName
    Grants.clear("spec_sql_db")
    val g = spark.sql(
      s"CALL $cat.system.grant('Spec_SQL_db.T', 'select', 'readers')")
      .head()
    assert(g.getString(0) == "spec_sql_db.t" && g.getString(1) == "SELECT"
      && g.getString(2) == "readers" && g.getBoolean(3))
    assert(Grants.check("spec_sql_db.t", "SELECT", "readers"))
    val shown = spark.sql(
      s"CALL $cat.system.show_grants('spec_sql_db')").collect()
    assert(shown.length == 1 && shown.head.getString(2) == "readers")
    spark.sql(
      s"CALL $cat.system.revoke('spec_sql_db.t', 'SELECT', 'readers')")
    assert(!Grants.check("spec_sql_db.t", "SELECT", "readers"))
    assert(spark.sql(
      s"CALL $cat.system.show_grants('spec_sql_db')").isEmpty)
    Grants.clear("spec_sql_db")
  }

  test("catalog_grants gate output: two granted principals, flags pinned") {
    val out = CatalogSetup.queries("catalog_grants")(spark, sf).collect()
    val principals = out.map(_.getAs[String]("principal")).distinct.sorted
    assert(principals.toSeq == Seq("admin", "analyst"))
    assert(out.forall(_.getAs[Boolean]("select_refused_without_grant")))
    assert(out.forall(_.getAs[Boolean]("use_refused_without_grant")))
  }
}
