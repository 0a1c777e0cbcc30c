package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{GraftLakeCatalog, SqlCatalog, VersionedLake}

/** The reference's signature EXPECTATION DDL, parseable on lake tables
  * (ref src/pipelines/gold/monthly_orders.sql:9-11 FAIL UPDATE,
  * src/pipelines/silver/order_items.sql DROP ROW):
  *
  * {{{
  * ALTER TABLE graft_lake.ns.t ADD CONSTRAINT c
  *   EXPECT (pred) ON VIOLATION DROP ROW    -- drop + quarantine + metrics
  * ALTER TABLE graft_lake.ns.t ADD CONSTRAINT c
  *   EXPECT (pred) ON VIOLATION FAIL UPDATE -- reject batch wholesale
  * ALTER TABLE graft_lake.ns.t DROP EXPECTATION c
  * }}}
  *
  * Spark's grammar has no EXPECT clause, so [[GraftSqlParser]] (a
  * [[ParserInterface]] wrapper injected by graft.GraftExtensions)
  * recognizes exactly these statements and lowers them onto the lake's
  * own commits — `FAIL UPDATE` IS a CHECK constraint
  * ([[VersionedLake.addConstraint]]: existing data validated, batch
  * rejected wholesale), `DROP ROW` is an expectation
  * ([[VersionedLake.addExpectation]]: violating rows drop into the
  * per-version quarantine with `meta expect` metrics). Every other
  * statement delegates to Spark's parser untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    sqlText.trim match {
      case AddExpect(table, name, pred, onViolation) =>
        GraftExpectCommand(table, name, pred.trim,
          failUpdate =
            onViolation.toUpperCase.replaceAll("\\s+", " ") == "FAIL UPDATE")
      case DropExpect(table, name) =>
        GraftDropExpectationCommand(table, name)
      case _ => delegate.parsePlan(sqlText)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // ALTER TABLE <t> ADD CONSTRAINT <c> EXPECT (<pred>) ON VIOLATION <mode>
  // The predicate is balanced-paren-greedy: (.+) up to the LAST ')'
  // before ON VIOLATION, so nested parens inside the predicate work.
  private[plans] val AddExpect =
    ("""(?is)^ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+""" +
      """EXPECT\s*\((.+)\)\s*ON\s+VIOLATION\s+""" +
      """(DROP\s+ROW|FAIL\s+UPDATE)\s*;?\s*$""").r
  private[plans] val DropExpect =
    """(?is)^ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+EXPECTATION\s+(\w+)\s*;?\s*$""".r
}

/** Resolve a (possibly catalog-qualified) lake table name to its path
  * through the registered graft_lake catalog.
  */
private[plans] object ExpectDdl {
  def pathOf(spark: SparkSession, table: String): String = {
    val bare = table.replace("`", "")
    val cat = spark.sessionState.catalogManager
      .catalog(SqlCatalog.CatalogName) match {
      case g: GraftLakeCatalog => g
      case other => throw new IllegalStateException(
        s"catalog ${SqlCatalog.CatalogName} is ${other.getClass.getName}")
    }
    cat.lakeTablePath(bare)
  }
}

case class GraftExpectCommand(table: String, name: String, predicate: String,
    failUpdate: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = ExpectDdl.pathOf(spark, table)
    if (failUpdate) VersionedLake.addConstraint(spark, path, name, predicate)
    else VersionedLake.addExpectation(spark, path, name, predicate)
    Seq.empty
  }
}

case class GraftDropExpectationCommand(table: String, name: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedLake.dropExpectation(spark,
      ExpectDdl.pathOf(spark, table), name)
    Seq.empty
  }
}
