package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, And, Expression, GreaterThanOrEqual, Length, LessThan,
  LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: banded edit-distance predicates.
  *
  * Rewrites `levenshtein(a, b) <= k` (and the `<` form) into
  *
  * {{{ abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0 }}}
  *
  * which is equivalent three-valued logic (see below) but asymptotically
  * cheaper on both sides of the conjunction:
  *
  *  - the LENGTH GUARD decides most non-matches with two O(1) length
  *    reads — no DP at all — and, being a plain comparison of built-ins,
  *    participates in ordinary predicate pushdown;
  *  - the THRESHOLD FORM `levenshtein(a, b, k)` is Spark's banded DP
  *    (O(k·n) with early exit, returning -1 above the threshold) instead
  *    of the full O(n·m) matrix the two-argument form fills.
  *
  * Equivalence: with either input NULL both sides are NULL (guard and
  * banded form are both null-propagating, And(NULL, NULL) = NULL). With
  * both inputs non-null: if |len(a)-len(b)| > k then lev(a,b) > k, so both
  * sides are false; otherwise the banded form returns the true distance
  * when it is <= k (>= 0 succeeds exactly when lev(a,b) <= k).
  *
  * Idempotent by construction: the rewrite requires `threshold = None` and
  * produces the three-argument expression, which no longer matches — safe
  * in the optimizer's fixpoint batch. Registered through
  * [[GraftExtensions]]; exercised by q_er_blocking's in-join distance
  * predicate (the 1.3M-candidate ER filter at sf0.1) and
  * q_str_levenshtein's projection-level uses are left untouched (value
  * context, not a bounded predicate).
  */
object LevenshteinPruning extends Rule[LogicalPlan] {

  private def banded(lev: Levenshtein, k: Int,
                     cmp: Expression): Option[Expression] = {
    // `lev < k` is `lev <= k-1`; both need a non-negative band.
    val bound = cmp match {
      case _: LessThanOrEqual => k
      case _: LessThan => k - 1
      case _ => return None
    }
    if (bound < 0) return None // always-false predicate: leave it alone
    val guard = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))),
      Literal(bound, IntegerType))
    val pruned = GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(bound, IntegerType))),
      Literal(0, IntegerType))
    Some(And(guard, pruned))
  }

  private def rewrite(cond: Expression): Expression = cond.transform {
    case cmp @ LessThanOrEqual(lev: Levenshtein, Literal(k: Int, IntegerType))
        if lev.threshold.isEmpty =>
      banded(lev, k, cmp).getOrElse(cmp)
    case cmp @ LessThan(lev: Levenshtein, Literal(k: Int, IntegerType))
        if lev.threshold.isEmpty =>
      banded(lev, k, cmp).getOrElse(cmp)
  }

  // Predicate context only (Filter and Join conditions): a projected
  // boolean VALUE gains nothing from the band and would only obscure the
  // user's expression in the plan.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter => f.copy(condition = rewrite(f.condition))
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }
}
