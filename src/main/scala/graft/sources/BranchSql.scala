package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BRANCHES as first-class SQL citizens — the half of write-audit-
  * publish [[LakeProcedures.branchWap]] still spoke through the engine
  * API. Three surfaces, all name-addressed:
  *
  *  - `ns.t.branch_<name>` — the branch as an ordinary table
  *    identifier (Iceberg's branch-identifier convention): SELECT,
  *    INSERT, MERGE INTO and the metadata tables all work on the
  *    branch chain unchanged, because a branch IS a full lake chain;
  *    the parent's merge contract carries over, so keyed DML keeps
  *    upsert semantics on the branch.
  *  - `VERSION AS OF '<branch>'` — the ref-name time-travel form now
  *    resolves branches as well as tags (the branch tip).
  *  - `ns.t.refs` — the Iceberg refs metadata table: main + every
  *    branch (with its recorded fork point) + every tag, one relation.
  *
  * Scale: identifier resolution is a directory probe; the refs table
  * is one manifest read per ref; branch DML is the same distributed
  * write the main chain runs. Nothing here adds a row-path cost.
  *
  * Reference analog: the reference's pipelines stage silver/gold
  * updates and publish only after expectations pass (ref
  * src/pipelines/gold/monthly_orders.sql expectations) — branch DML by
  * name is that workflow for a SQL user, with the audit query running
  * on `ns.t.branch_<name>` before `CALL system.fast_forward` publishes.
  */
object BranchSql {

  import SqlCatalog.CatalogName

  /** The SQL branch lifecycle as a gate row:
    *
    *  1. main lands the first half of the change feed and registers
    *     with a merge contract; `CALL system.create_tag(t, 'seeded')`
    *     pins it;
    *  2. `CALL system.create_branch(t, 'audit')`; the second half's
    *     per-key winners land via ONE `MERGE INTO ns.t.branch_audit`
    *     statement — `branch_dml_isolated` asserts main's chain never
    *     moved while the branch took DML;
    *  3. `SELECT … FROM ns.t.branch_audit` and `… VERSION AS OF
    *     'audit'` must agree row-for-row with each other AND with the
    *     engine read of the branch chain (`branch_reads_agree`);
    *  4. `ns.t.refs` must report main/branch/tag with the engine's own
    *     versions and the branch's recorded fork point, before AND
    *     after `CALL system.fast_forward` publishes
    *     (`refs_consistent`).
    *
    * Emitted rows are main AFTER the publish — the full-feed SCD1
    * winners the oracle recomputes.
    */
  def sqlRefs(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Scratch.dir("vlake_sqlrefs")
    val staged = graft.operators.Cdc.stage(graft.Tables.events(spark, sfDir))
      .localCheckpoint(true)
    val maxSeq = staged.agg(max(col("sequence_number"))).head().getLong(0)
    val t1 = maxSeq / 2
    VersionedLake.upsert(spark, path,
      staged.filter(col("sequence_number") <= t1)
        .withColumn("_deleted", col("operation") === "DELETE")
        .drop("operation"),
      Seq("key_id"), "sequence_number")
    SqlCatalog.install(spark)
    val t = s"$CatalogName.lakehouse.events_refs"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CatalogName.lakehouse")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (key_id BIGINT, value DOUBLE,
      props STRING, sequence_number BIGINT) USING graft
      OPTIONS (mergeKeys 'key_id', mergeSeq 'sequence_number')
      LOCATION '$path'""")
    spark.sql(s"CALL $CatalogName.system.create_tag('$t', 'seeded')")
      .collect()
    spark.sql(s"CALL $CatalogName.system.create_branch('$t', 'audit')")
      .collect()
    // the tag itself commits (CREATE_TAG is auditable history), so the
    // fork point is the post-tag tip — record it rather than assume it
    val mainVs0 = VersionedLake.versions(spark, path)
    // branch DML: one SQL MERGE of the second half's per-key winners
    staged.filter(col("sequence_number") > t1)
      .withColumn("_rn", row_number().over(Window.partitionBy(col("key_id"))
        .orderBy(col("sequence_number").desc)))
      .filter(col("_rn") === 1).drop("_rn")
      .createOrReplaceTempView("refs_feed")
    spark.sql(s"""MERGE INTO $t.branch_audit AS tgt USING refs_feed AS src
      ON tgt.key_id = src.key_id
      WHEN MATCHED AND src.operation = 'DELETE' THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = src.value, props = src.props,
        sequence_number = src.sequence_number
      WHEN NOT MATCHED AND src.operation <> 'DELETE' THEN
        INSERT (key_id, value, props, sequence_number)
        VALUES (src.key_id, src.value, src.props, src.sequence_number)""")
    val bp = VersionedLake.branchPath(path, "audit")
    val branchTip = VersionedLake.versions(spark, bp).last
    val dmlIsolated = VersionedLake.versions(spark, path) == mainVs0 &&
      branchTip > mainVs0.last
    // the three reads of the branch must be the same relation
    val cols = Seq("key_id", "value", "props", "sequence_number")
    val viaIdent = spark.sql(
      s"SELECT ${cols.mkString(", ")} FROM $t.branch_audit")
    val viaAsOf = spark.sql(
      s"SELECT ${cols.mkString(", ")} FROM $t VERSION AS OF 'audit'")
    val viaEngine = VersionedLake.read(spark, bp)
      .select(cols.map(col): _*)
    // one-job signed-multiset equality (≡ exceptAll both ways — r17)
    def same(a: DataFrame, b: DataFrame): Boolean =
      graft.Dist.multisetEqual(a, b)
    val readsAgree = same(viaIdent, viaAsOf) && same(viaIdent, viaEngine)
    // refs: engine-derived truth, pre- and post-publish
    def refsMap(): Map[String, (String, Int, Option[Int])] =
      spark.sql(s"SELECT name, type, version, base_version FROM $t.refs")
        .collect().map(r => r.getString(0) ->
          ((r.getString(1), r.getInt(2),
            if (r.isNullAt(3)) None else Some(r.getInt(3))))).toMap
    val pre = refsMap()
    val fork = mainVs0.last
    val refsPreOk =
      pre.get("main").contains(("BRANCH", fork, None)) &&
      pre.get("audit").contains(("BRANCH", branchTip, Some(fork))) &&
      pre.get("seeded").contains(("TAG", 1, None)) && pre.size == 3
    spark.sql(s"CALL $CatalogName.system.fast_forward('$t', 'audit')")
      .collect()
    val post = refsMap()
    val refsConsistent = refsPreOk &&
      post.get("main").contains(("BRANCH", fork + 1, None)) &&
      post.get("audit").contains(("BRANCH", branchTip, Some(fork))) &&
      post.get("seeded").contains(("TAG", 1, None))
    spark.sql(s"""SELECT key_id, value, props,
        sequence_number AS last_sequence FROM $t""")
      .withColumn("branch_dml_isolated", lit(dmlIsolated))
      .withColumn("branch_reads_agree", lit(readsAgree))
      .withColumn("refs_consistent", lit(refsConsistent))
  }

  val sqlRefsSql: String =
    """WITH stg AS (
         SELECT event_id AS sequence_number,
           CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error' THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           user_id AS key_id, value, props
         FROM events
         WHERE user_id IS NOT NULL AND event_id IS NOT NULL
           AND event_type IS NOT NULL AND value IS NOT NULL),
       ranked AS (
         SELECT s.*, row_number() OVER (PARTITION BY key_id
           ORDER BY sequence_number DESC) AS rn
         FROM stg s)
       SELECT key_id, value, props, sequence_number AS last_sequence,
         true AS branch_dml_isolated, true AS branch_reads_agree,
         true AS refs_consistent
       FROM ranked
       WHERE rn = 1 AND operation <> 'DELETE'
       ORDER BY key_id"""

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_sql_refs" -> ((s, d) => sqlRefs(s, d).orderBy(col("key_id"))))

  def oracles: Map[String, String] = Map(
    "lake_sql_refs" -> sqlRefsSql)
}
