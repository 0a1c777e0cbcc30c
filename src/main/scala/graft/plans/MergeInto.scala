package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftDatasetFactory, Row,
  SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, Join, JoinHint, LogicalPlan, MergeAction, MergeIntoTable,
  SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

import graft.sources.{GraftLakeTable, VersionedLake}

/** SQL `MERGE INTO` on registered lake tables.
  *
  * Spark only plans MERGE natively for connectors implementing the
  * row-level-operation rewrite machinery; the extension-library pattern
  * (Delta OSS does exactly this) is an analyzer rule that intercepts the
  * RESOLVED [[MergeIntoTable]] and replaces it with a runnable command
  * executing on the engine's own primitives. Here the whole statement
  * lowers onto ONE [[VersionedLake.upsert]] commit:
  *
  *  - WHEN MATCHED … UPDATE rows become keyed change rows (the
  *    assignments evaluated over the matched `target ⋈ source` pairs);
  *  - WHEN MATCHED … DELETE rows become `_deleted = true` tombstones at
  *    the target row's own sequence (delete-wins-tie resolves them);
  *  - WHEN NOT MATCHED … INSERT rows come from the `source ▷ target`
  *    anti-join;
  *  - WHEN NOT MATCHED BY SOURCE … UPDATE/DELETE come from the
  *    `target ▷ source` anti-join;
  *
  * so SQL MERGE inherits the lake's OCC loop, constraints, generated
  * columns, column mapping and CDF publication for free — no parallel
  * write path to drift. Reference semantics: the AUTO CDC flows
  * (ref /root/reference/src/pipelines/cdc/cdc_customers_silver.sql) are
  * declarative sugar over exactly this keyed MERGE.
  *
  * Scale: both joins are batch-scale outputs (matched pairs and
  * inserts are bounded by the source), the target side prunes through
  * the scan like any lake read, and the single upsert commit rewrites
  * only touched buckets. The per-target-row cardinality check (SQL
  * MERGE must error when two source rows hit one target row) runs on
  * the materialized matched-pair set, not the table.
  *
  * Unsupported (rejected with a clear error, never silently wrong):
  * nested-field assignments, schema evolution, and targets registered
  * without the `mergeKeys`/`mergeSeq` contract.
  */
object GraftMergeRule extends Rule[LogicalPlan] {

  private def lakeTarget(p: LogicalPlan): Option[GraftLakeTable] = p match {
    case SubqueryAlias(_, child) => lakeTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftLakeTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved =>
        lakeTarget(m.targetTable) match {
          case Some(t) => GraftMergeIntoCommand(m, t)
          case None => m
        }
      case u: UpdateTable if u.resolved =>
        lakeTarget(u.table) match {
          case Some(t) => GraftUpdateCommand(u, t)
          case None => u
        }
    }
}

/** SQL `UPDATE t SET … WHERE …` on a registered lake table — the third
  * DML statement, same lowering discipline as MERGE: the affected rows
  * (condition evaluated row-level over the snapshot read; the scan
  * itself prunes through the lake's stats skipping like any read) are
  * re-emitted with the assignments applied and land as ONE keyed
  * [[VersionedLake.upsert]] commit at each row's own sequence
  * (update-wins-tie replaces the current version). Assignments to a
  * MERGE KEY column are rejected — a key rewrite is an identity change
  * (delete + insert), which SQL UPDATE must not do silently.
  */
private[plans] case class GraftUpdateCommand(update: UpdateTable,
    table: GraftLakeTable) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(update)

  override def run(spark: SparkSession): Seq[Row] = {
    val (keys, seqCol) = table.mergeSpec.getOrElse(
      throw new UnsupportedOperationException(
        "UPDATE needs the merge contract — register the table with " +
          "OPTIONS (mergeKeys 'k1,k2', mergeSeq 's')"))
    require(table.asOfVersion.isEmpty,
      "cannot UPDATE a time-travel read")
    val tAttrs = update.table.output
    def colOf(e: Expression): Column = GraftDatasetFactory.column(e)
    update.assignments.foreach { as =>
      as.key match {
        case k: Attribute =>
          if (keys.exists(conf.resolver(_, k.name)))
            throw new UnsupportedOperationException(
              s"UPDATE must not assign merge key '${k.name}' — a key " +
                "rewrite is an identity change; DELETE and INSERT instead")
        case other => throw new UnsupportedOperationException(
          s"UPDATE assignment to non-column $other (nested fields are " +
            "not assignable on lake tables)")
      }
    }
    val rows = GraftDatasetFactory.ofRows(spark, update.table)
    val affected = update.condition.map(c => rows.filter(colOf(c)))
      .getOrElse(rows)
    val out = tAttrs.map { attr =>
      update.assignments.find { as =>
        as.key match {
          case k: Attribute =>
            k.exprId == attr.exprId || conf.resolver(k.name, attr.name)
          case _ => false
        }
      }.map(as => colOf(as.value).cast(attr.dataType).as(attr.name))
        .getOrElse(colOf(attr).as(attr.name))
    }
    val updates = affected.select(out: _*)
    if (!updates.isEmpty)
      VersionedLake.upsert(spark, table.path, updates, keys, seqCol)
    Seq.empty
  }
}

private[plans] case class GraftMergeIntoCommand(merge: MergeIntoTable,
    table: GraftLakeTable) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(merge)

  override def run(spark: SparkSession): Seq[Row] = {
    val (keys, seqCol) = table.mergeSpec.getOrElse(
      throw new UnsupportedOperationException(
        "MERGE INTO needs the merge contract — register the table with " +
          "OPTIONS (mergeKeys 'k1,k2', mergeSeq 's')"))
    require(table.asOfVersion.isEmpty,
      "cannot MERGE INTO a time-travel read")
    // WITH SCHEMA EVOLUTION needs no handling HERE: by post-hoc
    // resolution time, Spark's ResolveMergeIntoSchemaEvolution has
    // already routed the source's new columns through the catalog's
    // alterTable(AddColumn) — the lake's metadata-only ADD_COLUMN
    // commit — and re-resolved the target with the evolved schema,
    // so tAttrs below already carry the new columns.
    val target = merge.targetTable
    val source = merge.sourceTable
    val tAttrs = target.output

    def colOf(e: Expression): Column = GraftDatasetFactory.column(e)
    def actionCond(a: MergeAction): Column =
      a.condition.map(colOf).getOrElse(lit(true))
    // first-match-wins action dispatch: a chained CASE in action order
    def chain(actions: Seq[MergeAction], valOf: MergeAction => Column,
        last: Column): Column =
      actions.foldRight(last)((a, els) =>
        when(actionCond(a), valOf(a)).otherwise(els))
    // the assignment (aligned by us, not Spark — alignment rules only
    // run for SupportsRowLevelOperations connectors) feeding `attr`
    def valueFor(assigns: Seq[Assignment], attr: Attribute,
        dflt: Column): Column =
      assigns.find { as =>
        as.key match {
          case k: Attribute =>
            k.exprId == attr.exprId ||
              conf.resolver(k.name, attr.name)
          case other => throw new UnsupportedOperationException(
            s"MERGE assignment to non-column $other (nested fields are " +
              "not assignable on lake tables)")
        }
      }.map(as => colOf(as.value).cast(attr.dataType)).getOrElse(dflt)

    def checkActions(actions: Seq[MergeAction], insert: Boolean): Unit =
      actions.foreach {
        case _: UpdateAction if !insert => ()
        case _: DeleteAction if !insert => ()
        case _: InsertAction if insert => ()
        case other => throw new UnsupportedOperationException(
          s"unsupported MERGE action ${other.getClass.getSimpleName} " +
            (if (insert) "in a NOT MATCHED clause" else "in a MATCHED clause"))
      }

    // UPDATE/DELETE branch builder shared by MATCHED (pairs) and NOT
    // MATCHED BY SOURCE (target-only): emits the post-action row per
    // target column — DELETE carries the current values (constraints
    // stay satisfied on tombstones) under `_deleted = true`
    def changes(df: DataFrame, actions: Seq[MergeAction]): DataFrame = {
      val fired = actions.map(actionCond).reduce(_ || _)
      val out = tAttrs.map { attr =>
        chain(actions, {
          case u: UpdateAction => valueFor(u.assignments, attr, colOf(attr))
          case _ => colOf(attr) // DeleteAction
        }, colOf(attr)).as(attr.name)
      }
      val del = chain(actions,
        { case _: DeleteAction => lit(true); case _ => lit(false) },
        lit(false)).as("_deleted")
      df.filter(fired).select(out :+ del: _*)
    }

    val parts = Seq.newBuilder[DataFrame]

    if (merge.matchedActions.nonEmpty) {
      checkActions(merge.matchedActions, insert = false)
      val joined = GraftDatasetFactory.ofRows(spark,
          Join(target, source, Inner, Some(merge.mergeCondition),
            JoinHint.NONE))
        .localCheckpoint(true) // reused: cardinality check + change rows
      // SQL MERGE cardinality rule: >1 source row MODIFYING one target
      // row is an error, not a nondeterministic pick. Keys are unique
      // in the target (the mergeKeys contract), so a duplicated key in
      // the FIRED matched pairs means a duplicated source match. The
      // count runs after WHEN-clause conditions (a second matching
      // source row whose WHEN MATCHED AND predicate is false modifies
      // nothing — Delta/SQL accept that), and a sole unconditional
      // DELETE is exempt: deleting the same row twice is idempotent,
      // not ambiguous (the duplicate change rows are deduped below).
      val keyCols = keys.map { k =>
        colOf(tAttrs.find(a => conf.resolver(a.name, k)).getOrElse(
          throw new IllegalStateException(
            s"merge key '$k' is not a column of the target table")))
      }
      val soleUnconditionalDelete = merge.matchedActions match {
        case Seq(d: DeleteAction) => d.condition.isEmpty
        case _ => false
      }
      if (!soleUnconditionalDelete) {
        val anyFired = merge.matchedActions.map(actionCond).reduce(_ || _)
        val dup = joined.filter(anyFired).groupBy(keyCols: _*).count()
          .filter(col("count") > 1).limit(1).count()
        if (dup > 0) throw new IllegalStateException(
          "MERGE cardinality violation: multiple source rows matched and " +
            "attempted to modify the same target row")
      }
      val matchedChanges = changes(joined, merge.matchedActions)
      // Unconditional-DELETE duplicates are row-identical (the change
      // row carries the target's current values), so key-dedup is safe.
      parts += (if (soleUnconditionalDelete)
        matchedChanges.dropDuplicates(keys) else matchedChanges)
    }

    if (merge.notMatchedActions.nonEmpty) {
      checkActions(merge.notMatchedActions, insert = true)
      val unmatched = GraftDatasetFactory.ofRows(spark,
        Join(source, target, LeftAnti, Some(merge.mergeCondition),
          JoinHint.NONE))
      val fired = merge.notMatchedActions.map(actionCond).reduce(_ || _)
      val out = tAttrs.map { attr =>
        val absent = lit(null).cast(attr.dataType)
        chain(merge.notMatchedActions, {
          case i: InsertAction => valueFor(i.assignments, attr, absent)
          case _ => absent
        }, absent).as(attr.name)
      }
      parts += unmatched.filter(fired)
        .select(out :+ lit(false).as("_deleted"): _*)
    }

    if (merge.notMatchedBySourceActions.nonEmpty) {
      checkActions(merge.notMatchedBySourceActions, insert = false)
      val orphans = GraftDatasetFactory.ofRows(spark,
        Join(target, source, LeftAnti, Some(merge.mergeCondition),
          JoinHint.NONE))
      parts += changes(orphans, merge.notMatchedBySourceActions)
    }

    val all = parts.result()
    if (all.nonEmpty) {
      val updates = all.reduce(_ unionByName _)
      if (!updates.isEmpty)
        VersionedLake.upsert(spark, table.path, updates, keys, seqCol)
    }
    Seq.empty
  }
}
