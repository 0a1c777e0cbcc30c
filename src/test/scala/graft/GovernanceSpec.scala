package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CatalogSetup

/** Multi-principal governance through ONE stored view: per-principal
  * resolution, plan-time constant folding of the principal branches,
  * and parquet scan pushdown surviving the governed view in every
  * mode.
  */
class GovernanceSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = TestSpark.sf
  private lazy val viewName = CatalogSetup.bindGovernedCustomers(spark, sf)

  private def asPrincipal[A](groups: String)(body: => A): A = {
    spark.conf.set("spark.graft.caller.groups", groups)
    try body finally spark.conf.unset("spark.graft.caller.groups")
  }

  test("the same name resolves raw / masked / filtered per principal") {
    val admin = asPrincipal("admin") {
      spark.table(viewName).orderBy("customer_id").limit(1).collect().head
    }
    val analyst = asPrincipal("analysts") {
      spark.table(viewName).orderBy("customer_id").limit(1).collect().head
    }
    assert(admin.getAs[String]("customer_email").contains("@example.com") &&
      !admin.getAs[String]("customer_email").contains("****"),
      s"admin must read raw PII, got $admin")
    assert(analyst.getAs[String]("customer_email").contains("****@"),
      s"analyst must read masked PII, got $analyst")
    val regions = asPrincipal("region-asia") {
      spark.table(viewName).select("region_name").distinct()
        .collect().map(_.getString(0).trim).toSet
    }
    assert(regions == Set("ASIA"),
      s"region-asia principal must see only ASIA rows, got $regions")
    val all = asPrincipal("analysts") {
      spark.table(viewName).select("region_name").distinct().count()
    }
    assert(all > 1, "an unrestricted analyst must see every region")
  }

  test("principal branches constant-fold; pushdown survives every mode") {
    for (groups <- Seq("admin", "analysts", "region-america")) {
      val plan = asPrincipal(groups) {
        spark.table(viewName).filter("customer_id >= 500")
          .select("customer_id", "customer_email")
          .queryExecution.executedPlan.toString
      }
      assert(plan.contains("GreaterThanOrEqual(customer_id,500)"),
        s"customer_id pushdown lost through the governed view for " +
          s"$groups:\n$plan")
    }
    // the admin plan must carry NO mask machinery at all — the
    // membership CASE folded away at plan time
    val adminPlan = asPrincipal("admin") {
      spark.table(viewName).select("customer_email")
        .queryExecution.optimizedPlan.toString
    }
    assert(!adminPlan.contains("****"),
      s"mask expressions survived constant folding for admin:\n$adminPlan")
    val analystPlan = asPrincipal("analysts") {
      spark.table(viewName).select("customer_email")
        .queryExecution.optimizedPlan.toString
    }
    assert(analystPlan.contains("****"),
      s"analyst plan lost the mask:\n$analystPlan")
  }

  test("substring-colliding group names grant nothing (exact membership)") {
    // 'admin-interns' contains 'admin': contains()-based membership
    // would hand it raw PII — exact membership treats it as an
    // unprivileged, unrestricted principal (all rows, masked PII)
    val (email0, regionCount) = asPrincipal("admin-interns") {
      val df = spark.table(viewName)
      (df.orderBy("customer_id").limit(1).collect().head
        .getAs[String]("customer_email"),
        df.select("region_name").distinct().count())
    }
    assert(email0.contains("****@"),
      s"'admin-interns' must NOT read raw PII (exact membership), got $email0")
    assert(regionCount > 1,
      "'admin-interns' is not a region grant and must see every region")
    // 'region-americas' IS a region-shaped grant (element prefix) that
    // maps to no known region: it must fail CLOSED — zero rows — not
    // fall open to every region (and certainly not to AMERICA's rows)
    for (groups <- Seq("region-americas", "region-oceania",
        "analysts,region-oceania")) {
      val rows = asPrincipal(groups) { spark.table(viewName).count() }
      assert(rows == 0,
        s"unknown region grant '$groups' must fail closed, saw $rows rows")
    }
    // whitespace around the comma must not evade the region probe: a
    // padded list is canonicalized at the caller_groups() binding, so
    // the restricted principal keeps its restriction (fail CLOSED for
    // the unknown grant, region-scoped for the known one) instead of
    // falling open to every region
    val paddedUnknown = asPrincipal("analysts, region-oceania") {
      spark.table(viewName).count()
    }
    assert(paddedUnknown == 0,
      s"padded unknown region grant must fail closed, saw $paddedUnknown rows")
    val paddedKnown = asPrincipal(" analysts , region-europe ") {
      spark.table(viewName).select("region_name").distinct().collect()
        .map(_.getString(0)).toSet
    }
    assert(paddedKnown == Set("EUROPE"),
      s"padded known region grant must stay region-scoped, saw $paddedKnown")
    // multi-group principals still resolve by element
    val email = asPrincipal("interns,admin") {
      spark.table(viewName).orderBy("customer_id").limit(1).collect().head
        .getAs[String]("customer_email")
    }
    assert(!email.contains("****"),
      s"exact element 'admin' in a multi-group list must read raw, got $email")
  }

  test("caching a governed view never leaks across principals") {
    // CacheManager matches on the canonicalized ANALYZED plan; with
    // caller_groups() bound only at optimization time, an admin-cached
    // view would serve raw PII to the analyst below. BindCallerGroups
    // substitutes the literal during analysis, so the two plans never
    // canonicalize equal.
    val cached = asPrincipal("admin") {
      val df = spark.table(viewName)
      df.cache()
      df.count() // materialize under the admin principal
      df
    }
    try {
      val analystEmail = asPrincipal("analysts") {
        spark.table(viewName).orderBy("customer_id").limit(1)
          .collect().head.getAs[String]("customer_email")
      }
      assert(analystEmail.contains("****@"),
        "analyst query after an admin cache() of the same governed " +
          s"view must stay masked, got $analystEmail")
    } finally cached.unpersist()
  }
}
