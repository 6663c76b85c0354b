package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Honest input-size routing for the adaptive operators (Ranks, Quantiles).
  *
  * Those operators pick between a cheap single-task/buffering built-in plan
  * and a distributed cliff-free shape by comparing the input's row count to
  * a cutoff. Callers pass a memoized base-table count as `knownCount` so the
  * choice adds no per-query job — but a memoized BASE-TABLE count is only an
  * upper bound on the input when the plan between the scan and the operator
  * cannot multiply rows. The round-10 sf1 probe proved the failure mode: a
  * 10×-replicating view (a Union over the base table) fed `globalRank` with
  * `knownCount = 150k` while the actual input was 1.5M rows, planning 1.5M
  * rows onto the single-task WindowExec cliff the cutoff exists to dodge.
  *
  * [[routeRows]] closes that hole structurally: the hint is trusted only
  * when every node of the optimized plan is on a whitelist of
  * row-preserving-or-reducing operators over a SINGLE leaf — Project /
  * Filter / Sort / limits / aliases / Aggregate / Distinct / Window /
  * repartition. Any node that can multiply rows (Union, Join, Generate,
  * Expand, `sample(withReplacement=true)`, anything unrecognized) or a
  * second leaf makes the hint unsound, and the operator falls back to an
  * honest `df.count()` of the actual input frame. Trusting an UPPER bound
  * is directionally safe in the one direction that matters: an over-count
  * can only route a small input onto the distributed path (mild, bounded
  * slowdown), never a large input onto the single-task cliff.
  */
object InputStats {

  /** True when `plan` provably yields no more rows than its single leaf —
    * i.e. a base-table upper bound is a sound upper bound for the plan. */
  def nonMultiplying(plan: LogicalPlan): Boolean = plan match {
    case p if p.children.isEmpty => true
    case _: Project | _: Filter | _: Sort | _: LocalLimit | _: GlobalLimit |
        _: Offset | _: SubqueryAlias | _: View | _: Aggregate | _: Distinct |
        _: Deduplicate | _: Window | _: RepartitionOperation =>
      plan.children.forall(nonMultiplying)
    case s: Sample => !s.withReplacement && plan.children.forall(nonMultiplying)
    case _ => false // Union, Join, Generate, Expand, unknown: can multiply
  }

  /** The row count to route on: `knownCount` when it is a sound upper bound
    * for this input (see above), otherwise an honest count of the actual
    * frame. `knownCount < 0` means the caller has no hint. */
  def routeRows(df: DataFrame, knownCount: Long): Long =
    if (knownCount >= 0 && nonMultiplying(df.queryExecution.optimizedPlan))
      knownCount
    else df.count()
}
