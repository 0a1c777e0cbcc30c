package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: strengthen `levenshtein(a, b) <= k` filters with the
  * cheap necessary condition `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is bounded below by the length gap, so the added
  * conjunct never changes results — but it costs O(1) per row against
  * the O(|a|·|b|) dynamic program, and Spark evaluates conjuncts left
  * to right, so hopeless pairs (the overwhelming majority in a fuzzy
  * self-join) are rejected before the DP runs. This is the planner-side
  * analogue of the length-bucket blocking [[graft.operators.Dedup
  * .fuzzyNamePairs]] does by hand — applied automatically to ANY query
  * using a thresholded levenshtein, SQL included.
  *
  * Registered via `injectOptimizerRule` in [[graft.GraftExtensions]].
  * Idempotence (the optimizer runs rules to fixpoint): the rewrite is
  * skipped when the guard is already present in the conjunction.
  */
object LevenshteinGuard extends Rule[LogicalPlan] {

  private def guardFor(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  /** Idempotence must survive constant folding of the guard we added
    * (e.g. `length('zinc')` folds to `4` before the next fixpoint
    * iteration), so detection is by SHAPE — any existing conjunct
    * `abs(length(x) - _) <= _` (or mirrored) over either levenshtein
    * operand counts as already-guarded.
    */
  private def alreadyGuarded(cond: Expression, l: Expression,
      r: Expression): Boolean =
    splitConjuncts(cond).exists {
      case LessThanOrEqual(Abs(Subtract(Length(x), _, _), _), _) =>
        x.semanticEquals(l) || x.semanticEquals(r)
      case LessThanOrEqual(Abs(Subtract(_, Length(y), _), _), _) =>
        y.semanticEquals(l) || y.semanticEquals(r)
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def intLiteral(e: Expression): Boolean = e match {
    case Literal(v, IntegerType) => v != null
    case _                       => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      var added = Seq.empty[Expression]
      splitConjuncts(cond).foreach {
        case LessThanOrEqual(Levenshtein(l, r, None), k)
            if intLiteral(k) && !alreadyGuarded(cond, l, r) =>
          val g = guardFor(l, r, k)
          if (!added.exists(_.semanticEquals(g))) added :+= g
        case LessThan(Levenshtein(l, r, None), k)
            if intLiteral(k) && !alreadyGuarded(cond, l, r) =>
          val g = guardFor(l, r, k) // looser but still necessary
          if (!added.exists(_.semanticEquals(g))) added :+= g
        case _ => ()
      }
      if (added.isEmpty) f
      // guards FIRST: conjuncts evaluate left to right
      else Filter(added.reduce(And) match {
        case g => And(g, cond)
      }, child)
  }
}
