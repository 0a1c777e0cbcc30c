package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection cardinality of two SORTED `array<bigint>` columns by a
  * single merge walk — the hot kernel of the set-similarity verify
  * stage ([[graft.operators.PrefixJoin.pairsFromBase]] scores millions
  * of candidate pairs per run with it).
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a hash
  * set AND materializes the intersection array per row — two
  * allocations per candidate pair, sized by the arrays — only for
  * `size` to reduce the result to one int. The merge walk allocates
  * nothing, reads each element once, and stays inside whole-stage
  * codegen via `doGenCode` (same rationale as [[VecDot]]).
  *
  * PRECONDITIONS (caller-enforced, not checked): both arrays sorted
  * ascending with no null elements — the callers sort with
  * `sort_array` over null-free fnv1a64 gram sets. Equal values across
  * the arrays count once per distinct value iff each array is also
  * distinct (gram sets are). Null ARRAY inputs propagate null via the
  * default null-intolerant BinaryExpression contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object IntersectCount {
  /** Session-local registration (same pattern as [[VectorDot.register]];
    * also injected globally by GraftExtensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
}

object SortedIntersectCount {
  /** Called from generated code. Classic sorted-merge intersection
    * count; O(|a| + |b|), zero allocation.
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
