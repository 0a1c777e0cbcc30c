package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetFactory, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Expression, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Point-in-interval join — the custom whole-operator path
  * (LogicalPlan → Strategy → SparkPlan, injected via
  * [[graft.GraftExtensions]]).
  *
  * Semantics: for each left row, emit it joined to the right row with
  * the same key whose [start, end) interval contains the left row's
  * point (end NULL = open). Intervals are assumed non-overlapping per
  * key — exactly what [[graft.operators.Cdc.scd2History]] produces —
  * so each left row matches at most one version ("which SCD2 version
  * was valid when this event happened").
  *
  * Why a custom operator: Catalyst plans the equivalent
  * `l JOIN r ON l.k = r.k AND p >= s AND (e IS NULL OR p < e)` as an
  * equi-join that materializes EVERY version per key before the range
  * residual filters them. This exec co-partitions and co-sorts both
  * sides (Spark inserts the exchanges/sorts from
  * requiredChildDistribution/Ordering) and streams a two-pointer merge:
  * one pass, one candidate version held per key, no per-key version
  * blow-up — the shape that survives keys with deep histories at
  * 100 TB.
  */
case class PointInIntervalJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    point: Expression, start: Expression, end: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointInIntervalJoin =
    copy(left = newLeft, right = newRight)
}

case class PointInIntervalJoinExec(
    leftKey: Expression, rightKey: Expression,
    point: Expression, start: Expression, end: Expression,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Spark's EnsureRequirements inserts the hash exchanges + sorts
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(point, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(start, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lPoint = BindReferences.bindReference(point, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rStart = BindReferences.bindReference(start, right.output)
    val rEnd = BindReferences.bindReference(end, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val ptOrd = TypeUtils.getInterpretedOrdering(point.dataType)
      .asInstanceOf[Ordering[Any]]

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      var curKey: Any = null
      var curStart: Any = null
      var curEnd: Any = null
      var curRow: InternalRow = null
      val joined = new JoinedRow
      // downstream operators (sort/shuffle/collect) require UnsafeRow
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(output, output)

      lIter.flatMap { lRow =>
        val k = lKey.eval(lRow)
        val p = lPoint.eval(lRow)
        if (k == null || p == null) Iterator.empty
        else {
          // advance right to the last interval with key <= k, start <= p;
          // rows with NULL key/start are unusable versions: consume and
          // skip (they must not wedge the merge)
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKey.eval(head)
            if (hk == null) { rBuf.next() }
            else {
              val cmp = keyOrd.compare(hk, k)
              if (cmp > 0) continue = false
              else {
                val hs = rStart.eval(head)
                if (hs == null) { rBuf.next() } // skip, keep cur
                else if (cmp < 0 || ptOrd.compare(hs, p) <= 0) {
                  val r = rBuf.next().copy() // unsafe rows are reused: copy
                  curKey = hk; curStart = hs
                  curEnd = rEnd.eval(r); curRow = r
                } else continue = false
              }
            }
          }
          val matches = curRow != null && curKey != null &&
            keyOrd.compare(curKey, k) == 0 &&
            curStart != null && ptOrd.compare(curStart, p) <= 0 &&
            (curEnd == null || ptOrd.compare(p, curEnd) < 0)
          if (matches) Iterator.single[InternalRow](toUnsafe(joined(lRow, curRow)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): PointInIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

object PointInIntervalStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointInIntervalJoin(l, r, lk, rk, p, s, e) =>
      PointInIntervalJoinExec(lk, rk, p, s, e, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API.
  *
  * DATA CONTRACT — non-overlapping intervals per key: for each key, the
  * right side's [start, end) intervals must not overlap (what
  * [[graft.operators.Cdc.scd2History]] produces). The merge keeps ONE
  * candidate version per key, so each left row joins AT MOST ONE right
  * row — the last-starting containing interval. With overlapping
  * intervals this silently diverges from the equivalent range-join SQL,
  * which would emit every containing interval. Set `checkOverlap = true`
  * (debug; adds one pass over the right side) to fail fast instead.
  */
object PointInInterval {

  /** Throws if any key has an interval starting before the previous
    * interval's end (sorted by start; open end = ∞). One window pass.
    */
  def assertNonOverlapping(intervals: DataFrame, keyCol: String,
      startCol: String, endCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol))
    // previous-row existence must be tested independently of startCol
    // nullability (lag of a constant), or a NULL-start first interval
    // hides the check for its successor
    val bad = intervals
      .withColumn("__prev_end", lag(col(endCol), 1).over(w))
      .withColumn("__has_prev", lag(lit(1), 1).over(w))
      .filter(col("__has_prev").isNotNull &&
        (col("__prev_end").isNull || col(startCol) < col("__prev_end")))
      .limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(
      s"PointInInterval: overlapping [$startCol, $endCol) intervals per " +
        s"$keyCol — each left row would match only the last-starting one")
  }

  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, pointCol: String,
      startCol: String, endCol: String,
      checkOverlap: Boolean = false): DataFrame = {
    if (checkOverlap) assertNonOverlapping(right, rightKey, startCol, endCol)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    // fail fast in the driver on contracts the exec depends on: runtime
    // ordering casts would otherwise surface as executor CCEs, and
    // duplicate exprIds (self-join without aliasing) make downstream
    // resolution ambiguous
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (pt, st, en) =
      (attr(lPlan, pointCol), attr(rPlan, startCol), attr(rPlan, endCol))
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(pt.dataType == st.dataType && st.dataType == en.dataType,
      s"point/start/end types differ: ${pt.dataType}/${st.dataType}/${en.dataType}")
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "left and right share attributes — alias one side before joining")
    GraftDatasetFactory.ofRows(spark,
      PointInIntervalJoin(lPlan, rPlan, lk, rk, pt, st, en))
  }
}
