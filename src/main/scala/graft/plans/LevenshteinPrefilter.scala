package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom Catalyst optimizer rule: prepend a length-delta guard to
  * edit-distance threshold filters.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (every insertion/deletion changes the length by one, so the edit
  * distance is bounded below by the length difference). The guard is two
  * codegen'd length reads and a subtraction — prepended as a conjunct, it
  * short-circuits the O(|a|·|b|) dynamic program for every candidate pair
  * whose lengths already rule it out. In a fuzzy entity-resolution join
  * (j8 shape) with diverse record lengths, most same-block pairs die in
  * the guard.
  *
  * Scope: only TOP-LEVEL conjuncts of a Filter are guarded. A levenshtein
  * comparison nested under an OR must not gain a top-level guard (the
  * other branch may accept the row) — conjunct-level rewriting is what
  * keeps the rule semantics-preserving by construction. Null-transparent:
  * if either side is null the guard conjunct is null, and the original
  * comparison was null too — the row was dropped either way.
  *
  * Termination/idempotence: the rewrite collects missing guards from the
  * conjunct list and rebuilds the condition ONCE per Filter (never a
  * recursive expression transform, which would re-visit its own rewrite —
  * the classic self-stacking bug); a filter already carrying the guard
  * for the same argument pair is left untouched, so Catalyst's
  * fixed-point batches see a stable plan on the second pass.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]); the engine's query surface never
  * DEPENDS on it (it is an optimization, not a semantic), which is why the
  * driver's extension-free session still hash-matches every oracle.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def lenDelta(lev: Levenshtein): Expression =
    Abs(Subtract(Length(lev.left), Length(lev.right)))

  private def hasGuard(conjuncts: Seq[Expression], lev: Levenshtein): Boolean =
    conjuncts.exists {
      case cmp: BinaryComparison => cmp.left match {
        case Abs(Subtract(Length(a), Length(b), _), _) =>
          (a.semanticEquals(lev.left) && b.semanticEquals(lev.right)) ||
          (a.semanticEquals(lev.right) && b.semanticEquals(lev.left))
        case _ => false
      }
      case _ => false
    }

  /** `lev(a,b) <= k` with an un-thresholded Levenshtein becomes
    * `lev(a,b,k) >= 0`: the 3-arg form runs the BANDED dynamic program —
    * O(k·min(|a|,|b|)) instead of O(|a|·|b|) — and returns −1 the moment
    * the distance provably exceeds the threshold. Exactly the original
    * predicate (thresholded returns the true distance when it is ≤ k, and
    * null propagates the same), just cheaper per surviving pair. */
  private def thresholded(cmp: Expression): Expression = cmp match {
    case LessThanOrEqual(lev @ Levenshtein(_, _, None), k @ Literal(kv: Int, _))
        if kv >= 0 =>
      GreaterThanOrEqual(lev.copy(threshold = Some(k)), Literal(0))
    case GreaterThanOrEqual(k @ Literal(kv: Int, _), lev @ Levenshtein(_, _, None))
        if kv >= 0 =>
      GreaterThanOrEqual(lev.copy(threshold = Some(k)), Literal(0))
    case LessThan(lev @ Levenshtein(_, _, None), Literal(kv: Int, _))
        if kv >= 1 =>
      GreaterThanOrEqual(lev.copy(threshold = Some(Literal(kv - 1))), Literal(0))
    case GreaterThan(Literal(kv: Int, _), lev @ Levenshtein(_, _, None))
        if kv >= 1 =>
      GreaterThanOrEqual(lev.copy(threshold = Some(Literal(kv - 1))), Literal(0))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // Guards only apply to the UN-thresholded form: `levenshtein(a,b,t)`
      // returns -1 when the distance exceeds t, so e.g. `lev(a,b,3) <= 2`
      // is TRUE for pairs whose distance exceeds 3 — a length-delta guard
      // would wrongly reject those rows.
      val guards = conjuncts.collect {
        case LessThanOrEqual(lev @ Levenshtein(_, _, None), k: Literal)
            if !hasGuard(conjuncts, lev) =>
          LessThanOrEqual(lenDelta(lev), k)
        case LessThan(lev @ Levenshtein(_, _, None), k: Literal)
            if !hasGuard(conjuncts, lev) =>
          LessThan(lenDelta(lev), k)
        case GreaterThanOrEqual(k: Literal, lev @ Levenshtein(_, _, None))
            if !hasGuard(conjuncts, lev) =>
          LessThanOrEqual(lenDelta(lev), k)
        case GreaterThan(k: Literal, lev @ Levenshtein(_, _, None))
            if !hasGuard(conjuncts, lev) =>
          LessThan(lenDelta(lev), k)
      }
      val sharpened = conjuncts.map(thresholded)
      if (guards.isEmpty && sharpened == conjuncts) f
      else f.copy(condition = (guards ++ sharpened).reduceLeft(And))
  }
}
