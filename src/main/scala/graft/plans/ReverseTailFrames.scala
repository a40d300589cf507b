package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite O(rows²) tail window frames into their
  * incremental mirror image.
  *
  * Spark evaluates a `ROWS BETWEEN k FOLLOWING AND UNBOUNDED
  * FOLLOWING` frame by RE-AGGREGATING the partition tail for every
  * row (UnboundedFollowingWindowFunctionFrame) — O(rows²) per
  * partition — while the mirrored `ROWS BETWEEN UNBOUNDED PRECEDING
  * AND k PRECEDING` frame over the REVERSED sort maintains one
  * running buffer (UnboundedPrecedingWindowFunctionFrame) — O(rows).
  * The two frames contain exactly the same rows, so for
  * order-insensitive aggregates (min/max/sum/count/average/bit-ops)
  * the results are identical and the rewrite is pure speedup:
  * measured 50 s → 0.7 s on the queue-latency shape at sf0.1 (the
  * hand-fix this rule generalizes — see SURVEY §8's
  * UnboundedFollowing pitfall note).
  *
  * Safety gates (all checked per Window node — a node mixes frames
  * that share one sort, so flipping must not pessimize a sibling):
  *   - every window function is an order-insensitive aggregate
  *     (rank/row_number/lag read the sort direction; any such
  *     function vetoes the node);
  *   - every frame is a ROW frame that is either partition-wide
  *     (flip is the identity) or tail-shaped (lower > unbounded
  *     preceding, upper = unbounded following — the only shape that
  *     benefits); a coexisting running frame would flip INTO the
  *     quadratic shape, so it vetoes;
  *   - the node has a sort to reverse.
  * Like any ROWS frame, semantics are defined up to tie order; the
  * rewrite preserves results exactly when the sort is total (the
  * engine's own operators always tie-break) and up to tie choice
  * otherwise — the same contract the original frame had. */
object ReverseTailFrames extends Rule[LogicalPlan] {

  private def orderInsensitive(e: Expression): Boolean = e match {
    case Alias(c, _) => orderInsensitive(c)
    case WindowExpression(fn, _) => orderInsensitive(fn)
    case ae: AggregateExpression => ae.aggregateFunction match {
      case _: Min | _: Max | _: Sum | _: Count | _: Average => true
      case _ => false
    }
    case _ => false
  }

  /** (k FOLLOWING, UNBOUNDED FOLLOWING) with k ≥ current row. */
  private def isTail(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, lower, UnboundedFollowing) =>
      lower != UnboundedPreceding
    case _ => false
  }

  private def isWholePartition(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing) => true
    case _ => false
  }

  private def frames(w: Window): Seq[WindowFrame] =
    w.windowExpressions.flatMap(_.collect {
      case WindowExpression(_, WindowSpecDefinition(_, _, f)) => f
    })

  private def flipBound(b: Expression): Expression = b match {
    case UnboundedPreceding => UnboundedFollowing
    case UnboundedFollowing => UnboundedPreceding
    case CurrentRow => CurrentRow
    case Literal(v: Int, _) => Literal(-v)
    case Literal(v: Long, _) => Literal(-v)
    case UnaryMinus(e, _) => e
    case e => UnaryMinus(e)
  }

  private def flipFrame(f: WindowFrame): WindowFrame = f match {
    case SpecifiedWindowFrame(RowFrame, lower, upper) =>
      SpecifiedWindowFrame(RowFrame, flipBound(upper), flipBound(lower))
    case other => other
  }

  private def flipOrder(so: SortOrder): SortOrder = {
    val (dir, nulls) = so.direction match {
      case Ascending => (Descending, if (so.nullOrdering == NullsFirst) NullsLast else NullsFirst)
      case Descending => (Ascending, if (so.nullOrdering == NullsFirst) NullsLast else NullsFirst)
    }
    SortOrder(so.child, dir, nulls, so.sameOrderExpressions)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w: Window
        if w.orderSpec.nonEmpty &&
          w.windowExpressions.forall(orderInsensitive) &&
          frames(w).nonEmpty &&
          frames(w).forall(f => isTail(f) || isWholePartition(f)) &&
          frames(w).exists(isTail) =>
      val newExprs = w.windowExpressions.map(_.transform {
        case WindowExpression(fn, spec @ WindowSpecDefinition(_, os, f)) =>
          WindowExpression(fn, spec.copy(orderSpec = os.map(flipOrder),
            frameSpecification = flipFrame(f)))
      }.asInstanceOf[NamedExpression])
      w.copy(windowExpressions = newExprs, orderSpec = w.orderSpec.map(flipOrder))
  }
}
