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

/** Optimizer rule: length prefilter for Jaro–Winkler thresholds.
  *
  * For any lengths with ratio ρ = min/max, the similarity is bounded:
  * j ≤ (ρ + 2)/3 (at most min(|a|,|b|) characters can match, zero
  * transpositions) and the Winkler boost adds at most 0.4·(1 − j), so
  *
  *   jw(a, b) ≤ 0.6·(ρ + 2)/3 + 0.4 = 0.2·ρ + 0.8.
  *
  * Hence `jw(a, b) ≥ τ` with τ > 0.8 implies
  * `min_len ≥ (5τ − 4)·max_len` — a pure length comparison that
  * short-circuits the O(|a|·|b|)-window JW kernel on every
  * hopelessly-mismatched pair (on a blocking join the verify is the
  * hot inner loop; at τ = 0.95 any pair whose lengths differ by more
  * than 25% never runs the kernel). The rewrite
  *
  *   jw(a, b) ≥ τ  ⟶  cast(least(len a, len b) as double)
  *                      ≥ (5τ−4)·cast(greatest(len a, len b) as double)
  *                    AND jw(a, b) ≥ τ
  *
  * is EXACT (the bound is an implication, the original predicate
  * still decides) and NULL-faithful (NULL lengths → NULL And → row
  * filtered, as the original NULL compare did). Idempotent via the
  * expression's `guarded` marker — the rewritten JW node no longer
  * matches, so the fixed-point optimizer batch cannot stack
  * prefilters. Fires on ≥ and > with a literal double threshold
  * > 0.8 (at or below 0.8 the bound is vacuous), in both operand
  * orders, anywhere in a Filter condition. */
object JaroWinklerThresholdRule extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, tau: Double,
                    cmp: Expression): Expression =
    And(
      GreaterThanOrEqual(
        Cast(Least(Seq(Length(a), Length(b))),
          org.apache.spark.sql.types.DoubleType),
        Multiply(Literal(5.0 * tau - 4.0),
          Cast(Greatest(Seq(Length(a), Length(b))),
            org.apache.spark.sql.types.DoubleType))),
      cmp)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val newCond = cond transform {
        case GreaterThanOrEqual(jw @ JaroWinklerSim(a, b, false),
            lit @ Literal(t: Double, org.apache.spark.sql.types.DoubleType))
            if t > 0.8 =>
          guard(a, b, t, GreaterThanOrEqual(jw.copy(guarded = true), lit))
        case LessThanOrEqual(
            lit @ Literal(t: Double, org.apache.spark.sql.types.DoubleType),
            jw @ JaroWinklerSim(a, b, false)) if t > 0.8 =>
          guard(a, b, t, LessThanOrEqual(lit, jw.copy(guarded = true)))
        case GreaterThan(jw @ JaroWinklerSim(a, b, false),
            lit @ Literal(t: Double, org.apache.spark.sql.types.DoubleType))
            if t > 0.8 =>
          guard(a, b, t, GreaterThan(jw.copy(guarded = true), lit))
        case LessThan(
            lit @ Literal(t: Double, org.apache.spark.sql.types.DoubleType),
            jw @ JaroWinklerSim(a, b, false)) if t > 0.8 =>
          guard(a, b, t, LessThan(lit, jw.copy(guarded = true)))
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
