package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous window-top-k idiom
  *
  * {{{ Project(cols without rn,
  *       Filter(rn <= k,
  *         Window(row_number() over (partition by K order by O) as rn))) }}}
  *
  * into [[TopKPerKeyNode]] — the bounded-heap operator — whenever the rank
  * column itself is dropped afterwards. Users keep writing the standard
  * `row_number().over(...)` formulation; the engine plans O(keys×k) heaps
  * instead of a full per-partition sort. When the rank survives into the
  * output (e.g. r_window_rank exposes `rn`), the plan is left untouched —
  * the heap operator doesn't produce rank numbers.
  *
  * An empty `partition by` is the GLOBAL top-k idiom (every row in one
  * window partition — the worst case for the window formulation, which
  * funnels the whole input through one task's sort); TopKPerKeyExec maps
  * empty keys to AllTuples, so the rewrite turns it into per-partition
  * partial heaps plus one final heap over ≤ partitions×k rows.
  *
  * Determinism caveat (same as row_number's own): with a non-total
  * `order by`, which tied rows rank ≤ k is unspecified in BOTH
  * formulations; the rewrite preserves the contract, not tie order.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  /** cond must constrain ONLY the rank attribute: rn <= k / rn < k / rn = 1. */
  private def limitFor(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 1 => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(RowNumber(), _), _) =>
          val rn = alias.toAttribute
          limitFor(cond, rn) match {
            case Some(k) if !projList.exists(_.references.contains(rn)) =>
              Project(projList, TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, w.child))
            case _ => p
          }
        case _ => p
      }
  }
}
