package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance filters.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program per row and only then compares — but Spark's own
  * threshold kernel (`levenshtein(a, b, k)`, the banded O(k·min(|a|,
  * |b|)) variant that early-exits with −1 once the distance provably
  * exceeds k) answers the same predicate. The rewrite
  *
  *   levenshtein(a, b) ≤ k   ⟶   abs(length(a) − length(b)) ≤ k
  *                                 AND levenshtein(a, b, k) ≥ 0
  *
  * (and the analogous `<` with threshold k−1) makes every
  * edit-distance verify — including [[graft.operators.Dedup
  * .editDistancePairs]]'s candidate check and any user SQL — pay the
  * banded cost, with a free length pre-filter in front (the And
  * short-circuits, so mismatched-length rows never run the DP at
  * all). On a similarity self-join the verify is the hot inner loop,
  * so this is a constant-factor win exactly where the plan spends
  * its time.
  *
  * Semantics are exact: the threshold kernel returns the true
  * distance when ≤ k and −1 otherwise, so `≥ 0` ⟺ `distance ≤ k`;
  * NULL inputs flow to NULL under both forms (And(NULL-guard,
  * NULL-cmp) filters the row exactly as the original NULL compare
  * did). Idempotent by construction: the rewritten Levenshtein
  * carries Some(threshold) and no longer matches the pattern.
  * Only literal non-negative integer bounds rewrite — a column-
  * valued bound keeps the original form. */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, t: Literal) =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), t),
      GreaterThanOrEqual(Levenshtein(a, b, Some(t)), Literal(0)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val newCond = cond transform {
        case LessThanOrEqual(Levenshtein(a, b, None),
            lit @ Literal(k: Int, IntegerType)) if k >= 0 =>
          bounded(a, b, lit)
        case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType),
            Levenshtein(a, b, None)) if k >= 0 =>
          bounded(a, b, lit)
        case LessThan(Levenshtein(a, b, None),
            Literal(k: Int, IntegerType)) if k >= 1 =>
          bounded(a, b, Literal(k - 1))
        case GreaterThan(Literal(k: Int, IntegerType),
            Levenshtein(a, b, None)) if k >= 1 =>
          bounded(a, b, Literal(k - 1))
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}
