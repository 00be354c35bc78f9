package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  Length, LessThan, LessThanOrEqual, Levenshtein, Literal, PredicateHelper,
  Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (injected via
  * `SparkSessionExtensions.injectOptimizerRule`): in front of every
  * `levenshtein(a, b) <= k` / `< k` filter conjunct, add the implied
  * cheap guard `abs(length(a) - length(b)) <= k` (resp. `< k`).
  *
  * Soundness: every single edit changes a string's length by at most 1,
  * so edit distance ≥ |length(a) − length(b)| — the guard can never
  * reject a qualifying row. Value at scale: levenshtein is O(|a|·|b|)
  * per pair while the guard is O(1) on already-computed lengths, and in
  * fuzzy-match workloads (the F_STR4 shape: short-threshold matching
  * over a pair corpus) most candidate pairs differ in length by more
  * than the threshold — the classic "length filter" of edit-similarity
  * joins, applied automatically so users write only the intent.
  *
  * Fixpoint-safe by construction: the guard is added only when no
  * semantically-equal conjunct already exists, so a second pass leaves
  * the plan unchanged.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan]
    with PredicateHelper {

  private def guardFor(cond: Expression): Option[Expression] = cond match {
    case LessThanOrEqual(Levenshtein(a, b, _), kl @ Literal(_, IntegerType)) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kl))
    case LessThan(Levenshtein(a, b, _), kl @ Literal(_, IntegerType)) =>
      Some(LessThan(Abs(Subtract(Length(a), Length(b))), kl))
    case _ => None
  }

  private def withGuards(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(guardFor)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) cond else guards.foldRight(cond)(And(_, _))
  }

  // Match Filter AND Join conditions: predicate pushdown may have
  // already folded the user's filter into a join condition (the typical
  // fuzzy-match shape IS a theta join on levenshtein) by the time this
  // rule runs in the operator-optimization fixpoint.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val c2 = withGuards(cond)
      if (c2 eq cond) f else Filter(c2, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val c2 = withGuards(cond)
      if (c2 eq cond) j else j.copy(condition = Some(c2))
  }
}
