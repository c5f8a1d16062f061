package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast,
  Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: prefix a `jaccard(a, b) >= t` filter with the classic
  * set-similarity LENGTH filter (Chaudhuri/Xiao-Wang's prefix-filter family
  * of joins builds on the same bound): since
  * `j(A,B) = |A∩B| / |A∪B| <= min(|A|,|B|) / max(|A|,|B|)`,
  * `j >= t` implies `|A| >= t·|B|  AND  |B| >= t·|A|`.
  *
  * The injected conjunct is two array-length reads — evaluated (and
  * codegen'd) BEFORE the O(|A|+|B|) merge scan of [[JaccardSortedSets]],
  * so candidate pairs whose sizes already rule them out never pay the
  * scan. On an LSH-verify stage the candidates are mostly-similar and the
  * win is small; on brute-force / high-skew verify stages the guard prunes
  * the bulk of pairs for two comparisons each.
  *
  * Applies ONLY when both jaccard operands are bare attributes: the guard
  * duplicates each operand subtree inside `Size(...)`, and conjuncts are
  * codegen'd independently (no CSE across them), so guarding a computed
  * operand (e.g. an inline shingle construction) would re-evaluate it per
  * row instead of reading a length — a regression, not a win. Pipelines
  * that materialize the sets first (the engine's own dedup verify stages
  * do) always qualify.
  *
  * Semantics-preserving by construction (the guard is implied by the
  * original predicate) and idempotent (rewritten nodes are tagged, so the
  * optimizer's fix-point loop cannot stack guards).
  */
object JaccardLengthPruning extends Rule[LogicalPlan] {

  private val Pruned = TreeNodeTag[Boolean]("graft.jaccard.length.pruned")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transform {
        case geq @ GreaterThanOrEqual(j: JaccardSortedSets, Literal(t, DoubleType))
            if positive(t) && cheapOperands(j) &&
              geq.getTagValue(Pruned).isEmpty =>
          geq.setTagValue(Pruned, true)
          And(guard(j, t.asInstanceOf[Double]), geq)
        case leq @ LessThanOrEqual(Literal(t, DoubleType), j: JaccardSortedSets)
            if positive(t) && cheapOperands(j) &&
              leq.getTagValue(Pruned).isEmpty =>
          leq.setTagValue(Pruned, true)
          And(guard(j, t.asInstanceOf[Double]), leq)
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }

  private def positive(t: Any): Boolean = t match {
    case d: java.lang.Double => d > 0.0
    case _ => false
  }

  /** Only attribute operands are safe to duplicate into the guard. */
  private def cheapOperands(j: JaccardSortedSets): Boolean =
    j.left.isInstanceOf[Attribute] && j.right.isInstanceOf[Attribute]

  /** `size(a) >= t·size(b) AND size(b) >= t·size(a)` in double space. */
  private def guard(j: JaccardSortedSets, t: Double): Expression = {
    val sa = Cast(Size(j.left), DoubleType)
    val sb = Cast(Size(j.right), DoubleType)
    And(
      GreaterThanOrEqual(sa, Multiply(Literal(t, DoubleType), sb)),
      GreaterThanOrEqual(sb, Multiply(Literal(t, DoubleType), sa)))
  }
}
