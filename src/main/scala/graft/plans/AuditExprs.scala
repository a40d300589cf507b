package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.LongAccumulator

/** Pass-through census audit: returns `child` (a bucket count)
  * unchanged and, when it exceeds `cap`, bumps the two accumulators
  * (dropped buckets / dropped members) as a side effect.
  *
  * Why an accumulator when the census already carries a
  * CollectMetrics node: the metric rides the PLAN, and AQE's
  * empty-relation propagation discards the node exactly in the worst
  * case — a fully-pruned query (every candidate bucket hot) collapses
  * to an empty relation and the strongest silent-cap signal vanishes
  * with the subtree (ADVICE r9). The accumulator rides the TASKS: the
  * census stage has already executed by the time AQE can know the
  * pruned side is empty, so the counts survive any downstream
  * collapse. [[graft.operators.StopBand]] pairs both mechanisms and
  * [[graft.GraftSession]]'s listener reports whichever survived.
  *
  * deterministic = false so the optimizer never common-subexpression-
  * merges, duplicates, or reorders the side effect. CodegenFallback
  * is acceptable here: the expression evaluates once per CENSUS GROUP
  * (bucket), not per corpus row, and sits in a post-aggregate
  * projection outside every scan-side codegen span.
  *
  * At-least-once semantics (task retries, plan re-execution) can
  * over-count — fine for a loud-audit backstop, and the CollectMetrics
  * row stays the exact per-execution number whenever it survives. */
case class StopBandAudit(child: Expression, cap: Long,
    buckets: LongAccumulator, members: LongAccumulator)
    extends UnaryExpression with CodegenFallback {

  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "stop_band_audit"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v match {
      case c: java.lang.Long if c > cap =>
        buckets.add(1L)
        members.add(c)
      case _ => ()
    }
    v
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
