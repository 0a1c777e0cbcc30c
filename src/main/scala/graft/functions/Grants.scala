package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** PRIVILEGE GRANTS — the one reference governance surface the
  * masking/row-filter family doesn't cover: catalog-level access that
  * REFUSES resolution instead of masking (ref
  * src/setup/unity_catalog_setup.py:152-164 — `GRANT USE CATALOG`,
  * `GRANT USE SCHEMA`, `GRANT SELECT` per principal group; commented
  * out in the reference itself, so this is the semantic core, not the
  * platform plumbing).
  *
  * Model: a process-wide registry of (securable, privilege) → granted
  * groups, enforced where the reference enforces it — at the governed
  * NAME. A governed view carries a guard predicate
  * `has_privilege('<securable>', '<PRIV>', caller_groups())`; for a
  * granted principal the guard constant-folds to `true` and vanishes
  * from the plan (zero runtime cost, pushdown survives — the
  * [[CallerGroups]] discipline), for a refused principal it folds to
  * the guard's `raise_error` branch and the read fails LOUDLY. Layered
  * privileges compose the way the reference's do: USE on the schema
  * AND SELECT on the table, each refusing independently.
  *
  * `admin` is the account-admin bypass (owner-of-everything), matching
  * the privileged-group rule the mask functions already follow.
  *
  * At 100 TB nothing here touches data: grants are metadata, the guard
  * folds at plan time, and a refused query never schedules a task.
  */
object Grants {

  private val granted =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Set[String]]()

  private def key(securable: String, privilege: String): (String, String) =
    (securable.trim.toLowerCase, privilege.trim.toUpperCase)

  def grant(securable: String, privilege: String, group: String): Unit = {
    granted.merge(key(securable, privilege), Set(group.trim),
      (a, b) => a ++ b)
    ()
  }

  def revoke(securable: String, privilege: String, group: String): Unit = {
    granted.computeIfPresent(key(securable, privilege),
      (_, gs) => gs - group.trim)
    ()
  }

  /** Drop every grant on securables under `prefix` — gate hygiene, the
    * EventLog.clear discipline for the grants window.
    */
  def clear(prefix: String): Unit = {
    val p = prefix.trim.toLowerCase
    granted.keySet.removeIf(k => k._1.startsWith(p))
  }

  /** Every grant on securables under `prefix`, sorted —
    * (securable, privilege, group) rows for `SHOW GRANTS`-style
    * introspection.
    */
  def list(prefix: String): Seq[(String, String, String)] = {
    val p = prefix.trim.toLowerCase
    import scala.jdk.CollectionConverters._
    granted.entrySet().asScala.toSeq
      .filter(_.getKey._1.startsWith(p))
      .flatMap(e => e.getValue.toSeq.map(g => (e.getKey._1, e.getKey._2, g)))
      .sorted
  }

  /** Does a caller holding `callerGroups` (comma-separated, canonical
    * or raw) hold `privilege` on `securable`? Fails CLOSED: an unknown
    * securable has no grants and refuses everyone but admin.
    */
  def check(securable: String, privilege: String,
      callerGroups: String): Boolean = {
    val gs = CallerGroups.canonical(callerGroups)
      .split(",").filter(_.nonEmpty).toSet
    gs.contains("admin") ||
      granted.getOrDefault(key(securable, privilege), Set.empty)
        .exists(gs.contains)
  }
}

/** `has_privilege(securable, privilege, groups)` — the grant check as a
  * plan-time expression. The third argument is normally
  * `caller_groups()`, which [[BindCallerGroups]] binds to a literal at
  * ANALYSIS time — so two principals' plans never canonicalize equal
  * (the CacheManager rule that motivated BindCallerGroups) and the
  * whole check folds to a boolean literal during optimization: a
  * granted read carries NO governance expressions, a refused read
  * folds its guard to the raise_error branch.
  */
case class HasPrivilege(securable: Expression, privilege: Expression,
    groups: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = securable
  override def second: Expression = privilege
  override def third: Expression = groups
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean =
    securable.foldable && privilege.foldable && groups.foldable
  override def eval(input: InternalRow): Any =
    Grants.check(securable.eval(input).toString,
      privilege.eval(input).toString,
      groups.eval(input).toString)
  override def prettyName: String = "has_privilege"
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(securable = newFirst, privilege = newSecond, groups = newThird)
}
