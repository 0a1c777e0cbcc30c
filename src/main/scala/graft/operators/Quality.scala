package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality expectations — the engine behind the
  * reference's `CONSTRAINT … EXPECT (…) ON VIOLATION DROP ROW |
  * FAIL UPDATE` clauses (ref /root/reference/src/pipelines/silver/
  * order_items.sql:12-27, gold/daily_orders.sql:10-13).
  *
  * Semantics:
  *  - [[Action.Drop]]  — violating rows are filtered out (DROP ROW)
  *  - [[Action.Fail]]  — any violation aborts the pipeline (FAIL UPDATE)
  *  - [[Action.Warn]]  — rows kept, violation counted (expectation only)
  *
  * Scale: [[metrics]] computes every rule's pass/violation count in ONE
  * aggregate pass over the table (conditional-sum per rule, partial
  * aggregation map-side), then unpivots the single result row — never
  * one job per rule.
  */
object Quality {

  sealed trait Action
  object Action {
    case object Drop extends Action
    case object Warn extends Action
    case object Fail extends Action
  }

  final case class Expectation(name: String, predicate: Column,
      action: Action = Action.Drop) {
    // rule names are spliced into selectExpr by metrics(): restrict to
    // identifier characters so arbitrary caller input cannot break (or
    // inject into) the generated SQL
    require(name.matches("[A-Za-z0-9_]+"),
      s"expectation name must match [A-Za-z0-9_]+, got: '$name'")
  }

  final class ExpectationViolation(msg: String) extends RuntimeException(msg)

  /** Apply DROP/FAIL semantics: returns the cleaned frame. Fail rules
    * are validated eagerly (single count job over only the fail rules).
    */
  def enforce(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val failRules = rules.collect { case e if e.action == Action.Fail => e }
    if (failRules.nonEmpty) {
      val viol = df.filter(failRules.map(r => !coalesce(r.predicate, lit(false)))
        .reduce(_ || _)).limit(1).count()
      if (viol > 0)
        throw new ExpectationViolation(
          s"FAIL UPDATE: expectation violated among [${failRules.map(_.name).mkString(", ")}]")
    }
    val dropRules = rules.collect { case e if e.action == Action.Drop => e }
    if (dropRules.isEmpty) df
    else df.filter(dropRules.map(r => coalesce(r.predicate, lit(false))).reduce(_ && _))
  }

  /** Per-rule pass/violation counts in one pass, output one row per rule. */
  def metrics(df: DataFrame, table: String, rules: Seq[Expectation]): DataFrame = {
    val aggs = rules.flatMap { r =>
      Seq(
        sum(when(coalesce(r.predicate, lit(false)), 1L).otherwise(0L))
          .as(s"${r.name}__pass"),
        sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L))
          .as(s"${r.name}__viol"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = rules.map(r =>
      s"'${r.name}', `${r.name}__pass`, `${r.name}__viol`").mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $stackExpr) as (rule_name, passed, violated)")
      .select(lit(table).as("table_name"), col("rule_name"),
        coalesce(col("passed"), lit(0L)).as("passed"),
        coalesce(col("violated"), lit(0L)).as("violated"))
  }

  /** Quarantine route — the other half of DROP ROW: the dropped rows
    * land in an auditable side output annotated with WHICH rules they
    * violated (sorted CSV, not an array — the driver compare can't hash
    * nested types). `enforce` ∪ `quarantine` partitions the input: every
    * row is in exactly one of the two frames when the same drop-rule set
    * is applied to both. One filter pass each; no extra shuffle.
    */
  def quarantine(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val dropRules = rules.filter(_.action != Action.Fail)
    val tags = array(dropRules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*)
    df.withColumn("violated_rules",
      concat_ws(",", array_sort(filter(tags, x => x.isNotNull))))
      .filter(col("violated_rules") =!= "")
  }

  // ---- the reference's constraint sets over the testdata tables -----------
  def lineitemRules: Seq[Expectation] = Seq(
    Expectation("valid_order_id", col("l_orderkey").isNotNull),
    Expectation("valid_line_number", col("l_linenumber") > 0),
    Expectation("valid_product_id", col("l_partkey").isNotNull),
    Expectation("valid_seller_id", col("l_suppkey").isNotNull),
    Expectation("valid_quantity", col("l_quantity") > 0),
    Expectation("valid_price", col("l_extendedprice") >= 0),
    Expectation("valid_discount", col("l_discount").between(0, 1)),
    Expectation("valid_tax", col("l_tax") >= 0))

  def ordersRules: Seq[Expectation] = Seq(
    Expectation("valid_order_id", col("o_orderkey").isNotNull),
    Expectation("valid_customer_id", col("o_custkey").isNotNull),
    Expectation("valid_order_status", col("o_orderstatus").isin("O", "F", "P")),
    Expectation("valid_order_date", col("o_orderdate").isNotNull),
    Expectation("valid_total_price", col("o_totalprice") >= 0))

  def customerRules: Seq[Expectation] = Seq(
    Expectation("valid_customer_id", col("c_custkey").isNotNull),
    Expectation("valid_name", col("c_name").isNotNull &&
      length(trim(col("c_name"))) > 0),
    Expectation("valid_nation", col("c_nationkey").isNotNull))

  /** All silver constraint sets, one metrics row per (table, rule). */
  def dqMetrics(s: SparkSession, d: String): DataFrame =
    metrics(Tables.lineitem(s, d), "lineitem", lineitemRules)
      .unionByName(metrics(Tables.orders(s, d), "orders", ordersRules))
      .unionByName(metrics(Tables.customer(s, d), "customer", customerRules))

  val dqMetricsSql: String =
    """SELECT 'lineitem' AS table_name, r.rule_name,
         CASE r.rule_name
           WHEN 'valid_order_id' THEN (SELECT COUNT(CASE WHEN l_orderkey IS NOT NULL THEN 1 END) FROM lineitem)
           WHEN 'valid_line_number' THEN (SELECT COUNT(CASE WHEN l_linenumber > 0 THEN 1 END) FROM lineitem)
           WHEN 'valid_product_id' THEN (SELECT COUNT(CASE WHEN l_partkey IS NOT NULL THEN 1 END) FROM lineitem)
           WHEN 'valid_seller_id' THEN (SELECT COUNT(CASE WHEN l_suppkey IS NOT NULL THEN 1 END) FROM lineitem)
           WHEN 'valid_quantity' THEN (SELECT COUNT(CASE WHEN l_quantity > 0 THEN 1 END) FROM lineitem)
           WHEN 'valid_price' THEN (SELECT COUNT(CASE WHEN l_extendedprice >= 0 THEN 1 END) FROM lineitem)
           WHEN 'valid_discount' THEN (SELECT COUNT(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 1 END) FROM lineitem)
           WHEN 'valid_tax' THEN (SELECT COUNT(CASE WHEN l_tax >= 0 THEN 1 END) FROM lineitem)
         END AS passed,
         (SELECT COUNT(*) FROM lineitem) - CASE r.rule_name
           WHEN 'valid_order_id' THEN (SELECT COUNT(CASE WHEN l_orderkey IS NOT NULL THEN 1 END) FROM lineitem)
           WHEN 'valid_line_number' THEN (SELECT COUNT(CASE WHEN l_linenumber > 0 THEN 1 END) FROM lineitem)
           WHEN 'valid_product_id' THEN (SELECT COUNT(CASE WHEN l_partkey IS NOT NULL THEN 1 END) FROM lineitem)
           WHEN 'valid_seller_id' THEN (SELECT COUNT(CASE WHEN l_suppkey IS NOT NULL THEN 1 END) FROM lineitem)
           WHEN 'valid_quantity' THEN (SELECT COUNT(CASE WHEN l_quantity > 0 THEN 1 END) FROM lineitem)
           WHEN 'valid_price' THEN (SELECT COUNT(CASE WHEN l_extendedprice >= 0 THEN 1 END) FROM lineitem)
           WHEN 'valid_discount' THEN (SELECT COUNT(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 1 END) FROM lineitem)
           WHEN 'valid_tax' THEN (SELECT COUNT(CASE WHEN l_tax >= 0 THEN 1 END) FROM lineitem)
         END AS violated
       FROM (VALUES ('valid_order_id'),('valid_line_number'),('valid_product_id'),
         ('valid_seller_id'),('valid_quantity'),('valid_price'),
         ('valid_discount'),('valid_tax')) r(rule_name)
       UNION ALL
       SELECT 'orders', r.rule_name,
         CASE r.rule_name
           WHEN 'valid_order_id' THEN (SELECT COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) FROM orders)
           WHEN 'valid_customer_id' THEN (SELECT COUNT(CASE WHEN o_custkey IS NOT NULL THEN 1 END) FROM orders)
           WHEN 'valid_order_status' THEN (SELECT COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) FROM orders)
           WHEN 'valid_order_date' THEN (SELECT COUNT(CASE WHEN o_orderdate IS NOT NULL THEN 1 END) FROM orders)
           WHEN 'valid_total_price' THEN (SELECT COUNT(CASE WHEN o_totalprice >= 0 THEN 1 END) FROM orders)
         END,
         (SELECT COUNT(*) FROM orders) - CASE r.rule_name
           WHEN 'valid_order_id' THEN (SELECT COUNT(CASE WHEN o_orderkey IS NOT NULL THEN 1 END) FROM orders)
           WHEN 'valid_customer_id' THEN (SELECT COUNT(CASE WHEN o_custkey IS NOT NULL THEN 1 END) FROM orders)
           WHEN 'valid_order_status' THEN (SELECT COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) FROM orders)
           WHEN 'valid_order_date' THEN (SELECT COUNT(CASE WHEN o_orderdate IS NOT NULL THEN 1 END) FROM orders)
           WHEN 'valid_total_price' THEN (SELECT COUNT(CASE WHEN o_totalprice >= 0 THEN 1 END) FROM orders)
         END
       FROM (VALUES ('valid_order_id'),('valid_customer_id'),
         ('valid_order_status'),('valid_order_date'),('valid_total_price')) r(rule_name)
       UNION ALL
       SELECT 'customer', r.rule_name,
         CASE r.rule_name
           WHEN 'valid_customer_id' THEN (SELECT COUNT(CASE WHEN c_custkey IS NOT NULL THEN 1 END) FROM customer)
           WHEN 'valid_name' THEN (SELECT COUNT(CASE WHEN c_name IS NOT NULL AND length(trim(c_name)) > 0 THEN 1 END) FROM customer)
           WHEN 'valid_nation' THEN (SELECT COUNT(CASE WHEN c_nationkey IS NOT NULL THEN 1 END) FROM customer)
         END,
         (SELECT COUNT(*) FROM customer) - CASE r.rule_name
           WHEN 'valid_customer_id' THEN (SELECT COUNT(CASE WHEN c_custkey IS NOT NULL THEN 1 END) FROM customer)
           WHEN 'valid_name' THEN (SELECT COUNT(CASE WHEN c_name IS NOT NULL AND length(trim(c_name)) > 0 THEN 1 END) FROM customer)
           WHEN 'valid_nation' THEN (SELECT COUNT(CASE WHEN c_nationkey IS NOT NULL THEN 1 END) FROM customer)
         END
       FROM (VALUES ('valid_customer_id'),('valid_name'),('valid_nation')) r(rule_name)
       ORDER BY table_name, rule_name"""

  // ---- registry ------------------------------------------------------------
  /** Registered quarantine demo. The driver's testdata is clean by
    * design, so the query injects DETERMINISTIC dirt first — a
    * hash-selected ~2% of orders get a NULL status, ~1% a negated
    * total — with the identical mutation mirrored in the oracle; the
    * quarantine route then captures exactly those rows with their
    * violated-rule lists. The mechanism under test is the routing and
    * annotation, not the dirt.
    */
  def dqQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Fingerprint.fnv1a64
    val o = Tables.orders(spark, dir)
    val h1 = pmod(fnv1a64(spark,
      concat(lit("dq:"), col("o_orderkey").cast("string"))), lit(50L))
    val h2 = pmod(fnv1a64(spark,
      concat(lit("dq2:"), col("o_orderkey").cast("string"))), lit(97L))
    val dirty = o
      .withColumn("o_orderstatus",
        when(h1 === 0, lit(null).cast("string")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(h2 === 0, -col("o_totalprice")).otherwise(col("o_totalprice")))
    quarantine(dirty, Seq(
      Expectation("valid_status", col("o_orderstatus").isin("O", "F", "P")),
      Expectation("valid_total", col("o_totalprice") >= 0)))
      .select(col("o_orderkey"), col("violated_rules"))
  }

  val dqQuarantineSql: String = {
    val h1 = OracleFnv.ofText("'dq:' || CAST(o_orderkey AS VARCHAR)")
    val h2 = OracleFnv.ofText("'dq2:' || CAST(o_orderkey AS VARCHAR)")
    s"""WITH dirty AS (
         SELECT o_orderkey,
           CASE WHEN (($h1 % 50) + 50) % 50 = 0 THEN NULL
                ELSE o_orderstatus END AS st,
           CASE WHEN (($h2 % 97) + 97) % 97 = 0 THEN -o_totalprice
                ELSE o_totalprice END AS tp
         FROM orders),
       q AS (
         SELECT o_orderkey,
           array_to_string(list_sort(list_filter([
             CASE WHEN NOT coalesce(st IN ('O', 'F', 'P'), false)
                  THEN 'valid_status' END,
             CASE WHEN NOT coalesce(tp >= 0, false)
                  THEN 'valid_total' END], x -> x IS NOT NULL)), ',')
             AS violated_rules
         FROM dirty)
       SELECT o_orderkey, violated_rules FROM q
       WHERE violated_rules <> ''
       ORDER BY o_orderkey"""
  }

  /** Referential-integrity audit over the star schema's seven FK
    * edges: per edge, total child rows, NULL foreign keys, orphan rows
    * (non-null FK with no parent) and distinct orphan keys — the
    * cross-TABLE quality dimension [[metrics]]' row-local rules can't
    * express. One left join + one aggregate per edge (dimension parents
    * broadcast; the lineitem→orders edge shuffles on the fact's
    * natural key — at 100 TB that is the one unavoidable fact-scale
    * join, partial-agg combinable), seven tiny rows unioned.
    */
  def referentialAudit(spark: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String, small: Boolean): DataFrame = {
      val p0 = parent.select(col(pk).as("k")).distinct()
        .withColumn("_p", lit(1))
      val p = if (small) broadcast(p0) else p0
      child.select(col(fk).as("k"))
        .join(p, Seq("k"), "left")
        .agg(count(lit(1)).as("child_rows"),
          sum(when(col("k").isNull, 1).otherwise(0))
            .cast("bigint").as("null_fk_rows"),
          sum(when(col("k").isNotNull && col("_p").isNull, 1).otherwise(0))
            .cast("bigint").as("orphan_rows"),
          countDistinct(when(col("k").isNotNull && col("_p").isNull,
            col("k"))).as("orphan_keys"))
        .withColumn("edge", lit(name))
        .select(col("edge"), col("child_rows"), col("null_fk_rows"),
          col("orphan_rows"), col("orphan_keys"))
    }
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val s2 = Tables.supplier(spark, d)
    val p = Tables.part(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    Seq(
      edge("customer_nation", c, "c_nationkey", n, "n_nationkey", true),
      edge("lineitem_orders", li, "l_orderkey", o, "o_orderkey", false),
      edge("lineitem_part", li, "l_partkey", p, "p_partkey", true),
      edge("lineitem_supplier", li, "l_suppkey", s2, "s_suppkey", true),
      edge("nation_region", n, "n_regionkey", r, "r_regionkey", true),
      edge("orders_customer", o, "o_custkey", c, "c_custkey", true),
      edge("supplier_nation", s2, "s_nationkey", n, "n_nationkey", true))
      .reduce(_.unionByName(_))
  }

  val referentialAuditSql: String = {
    def edge(name: String, child: String, fk: String, parent: String,
        pk: String) =
      s"""SELECT '$name' AS edge,
         COUNT(*) AS child_rows,
         COUNT(*) FILTER ($fk IS NULL) AS null_fk_rows,
         COUNT(*) FILTER ($fk IS NOT NULL AND p.k IS NULL) AS orphan_rows,
         COUNT(DISTINCT CASE WHEN $fk IS NOT NULL AND p.k IS NULL
           THEN $fk END) AS orphan_keys
         FROM $child LEFT JOIN
           (SELECT DISTINCT $pk AS k FROM $parent) p ON $fk = p.k"""
    Seq(
      edge("customer_nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      edge("lineitem_orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      edge("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem_supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      edge("nation_region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      edge("orders_customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      edge("supplier_nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"))
      .mkString("", "\n       UNION ALL\n       ", "\n       ORDER BY edge")
  }

  /** FRESHNESS audit — the data-quality dimension row-level and
    * referential expectations cannot see: a pipeline that silently
    * STOPS ingesting passes every content rule while its tables go
    * stale. Per time-bearing table: row count, max event day, and the
    * staleness lag against a DATA-DERIVED reference instant (the
    * newest day across all audited tables — no wall clock, so the
    * audit is deterministic and the oracle reproduces it). One
    * column-pruned aggregate per table (at 100 TB the same numbers
    * come from footer stats — see VersionedLake.computeStats — but the
    * scan form works on any parquet, which an audit must); the
    * cross-table window runs over O(tables) rows.
    */
  def dqFreshness(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def one(name: String, df: DataFrame,
        day: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), max(day).as("max_day"))
        .withColumn("table_name", lit(name))
    val rows =
      one("orders", graft.Tables.orders(spark, sfDir), col("o_orderdate"))
        .unionByName(one("lineitem", graft.Tables.lineitem(spark, sfDir),
          col("l_shipdate")))
        .unionByName(one("events", graft.Tables.events(spark, sfDir),
          col("ts_utc").cast("date")))
    // O(tables) rows — the global window is deliberate and tiny
    val ref = Window.partitionBy()
    rows
      .withColumn("ref_day", max(col("max_day")).over(ref))
      .select(col("table_name"), col("n_rows"), col("max_day"),
        datediff(col("ref_day"), col("max_day")).cast("long")
          .as("lag_days"),
        (datediff(col("ref_day"), col("max_day")) <= 30)
          .as("fresh_within_30d"))
  }

  val dqFreshnessSql: String =
    """WITH f AS (
         SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
           MAX(o_orderdate) AS max_day FROM orders
         UNION ALL
         SELECT 'lineitem', COUNT(*), MAX(l_shipdate) FROM lineitem
         UNION ALL
         SELECT 'events', COUNT(*), CAST(MAX(ts) AS DATE) FROM events),
       r AS (SELECT MAX(max_day) AS ref_day FROM f)
       SELECT table_name, n_rows, max_day,
         CAST(date_diff('day', max_day, (SELECT ref_day FROM r))
           AS BIGINT) AS lag_days,
         date_diff('day', max_day, (SELECT ref_day FROM r)) <= 30
           AS fresh_within_30d
       FROM f
       ORDER BY table_name"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_metrics" -> ((s, d) =>
      dqMetrics(s, d).orderBy(col("table_name"), col("rule_name"))),
    "dq_quarantine" -> ((s, d) =>
      dqQuarantine(s, d).orderBy(col("o_orderkey"))),
    "dq_referential" -> ((s, d) =>
      referentialAudit(s, d).orderBy(col("edge"))),
    "dq_freshness" -> ((s, d) =>
      dqFreshness(s, d).orderBy(col("table_name"))))

  def oracles: Map[String, String] = Map(
    "dq_metrics" -> dqMetricsSql,
    "dq_quarantine" -> dqQuarantineSql,
    "dq_referential" -> referentialAuditSql,
    "dq_freshness" -> dqFreshnessSql)
}
