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
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_metrics" -> ((s, d) =>
      dqMetrics(s, d).orderBy(col("table_name"), col("rule_name"))))

  def oracles: Map[String, String] = Map("dq_metrics" -> dqMetricsSql)
}
