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
  *                                 AND levenshtein_within(a, b, k) ≥ 0
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
  * did). Idempotent by construction: the rewritten form contains no
  * bare Levenshtein and no longer matches the pattern.
  * Only literal non-negative integer bounds rewrite — a column-
  * valued bound keeps the original form. */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, t: Literal) =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), t),
      // round 8: the rewrite target is the graft kernel — common
      // prefix/suffix TRIM first (near-dup strings share long affixes
      // by construction), then Spark's own banded DP on the remainder
      // (LevenshteinKernel delegates, so semantics are bit-identical)
      GreaterThanOrEqual(
        LevenshteinWithin(a, b, t.value.asInstanceOf[Int]), Literal(0)))

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

/** Optimizer rule: sorted set-intersection counting.
  *
  * `size(array_intersect(a, b))` builds the intersection ARRAY (a
  * hash-set membership pass plus an output buffer, interpreted
  * per row) only to take its length. When both inputs are provably
  * sorted — syntactically `sort_array(_, asc)` — the same number is a
  * single zero-allocation merge pass, the [[SortedIntersectCount]]
  * codegen kernel the set-similarity joins use internally. The
  * rewrite
  *
  *   size(array_intersect(sort_array(a), sort_array(b)))
  *     ⟶ cast(sorted_intersect_count(sort_array(a), sort_array(b)) as int)
  *
  * fires anywhere in any expression tree, so a user writing plain
  * Spark SQL gets the kernel for free. Guards: both sides must be
  * `sort_array(..., ascending)` over `array<string>` (null ELEMENTS
  * are fine — sort_array asc places them first and the kernel counts
  * a shared null run once, array_intersect's exact semantics), and
  * only non-legacy `size` (null input → null, matching the kernel's
  * null flow; legacy size-of-null = −1 keeps the original form).
  * Semantics are exact: array_intersect dedupes its output, and the
  * kernel counts equal-runs once. Idempotent: the rewritten tree no
  * longer contains size(array_intersect). */
object SortedIntersectRule extends Rule[LogicalPlan] {
  private def sortedStringArray(e: Expression): Boolean = e match {
    case SortArray(child, Literal(true, _)) => child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
          if sortedStringArray(a) && sortedStringArray(b) =>
        Cast(SortedIntersectCount(a, b), IntegerType)
    }
}
