package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Structural lint over a physical plan — the checks this library's
  * own specs police, packaged for users: a pipeline author points it
  * at a frame before promoting a job and gets back the plan shapes
  * that do not survive 100 TB.
  *
  *   - `single-partition-exchange`: an `Exchange SinglePartition`
  *     funnels every row through one task — the signature of a
  *     global window/sort that should be a TakeOrdered, a two-level
  *     rank ([[graft.ops.Ranks]]), or a partial aggregate. Global
  *     AGGREGATES also produce one, but theirs carries only the
  *     per-partition partial rows, so exchanges directly above a
  *     partial aggregate are exempt.
  *   - `cartesian-product` / `nested-loop-join`: every pair of rows
  *     meets — either the join keys were lost (a column renamed away
  *     before the join) or a broadcastable side was not hinted.
  *
  * [[scanReport]] separately surfaces what `.explain` buries per file
  * scan — pushed filters, partition filters, and the read schema —
  * so "did my predicate and pruning reach parquet" is one call, with
  * judgment left to the caller (a full-table scan is correct for a
  * whole-corpus aggregate and wrong under a pushable filter).
  *
  * Inspection only — never changes a plan. AQE wrappers are followed
  * into their current `executedPlan`; subqueries are walked too.
  */
object PlanLint {

  /** One plan smell: a stable `kind` plus the offending node's
    * one-line rendering (truncated).
    */
  final case class Finding(kind: String, node: String)

  /** One file scan's pushdown facts. */
  final case class ScanInfo(relation: String, pushedFilters: String,
      partitionFilters: String, readSchema: String)

  /** Lint `df`'s physical plan. Empty result = none of the known
    * smells present.
    */
  def audit(df: DataFrame): Seq[Finding] =
    flatten(df.queryExecution.executedPlan).flatMap {
      case e: ShuffleExchangeLike
          if e.outputPartitioning == SinglePartition &&
            !e.children.exists(isPartialAgg) =>
        Some(Finding("single-partition-exchange", describe(e)))
      case j: CartesianProductExec =>
        Some(Finding("cartesian-product", describe(j)))
      case j: BroadcastNestedLoopJoinExec =>
        Some(Finding("nested-loop-join", describe(j)))
      case _ => None
    }.distinct

  /** Every file scan's pushdown facts, in plan order. */
  def scanReport(df: DataFrame): Seq[ScanInfo] =
    flatten(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec =>
        ScanInfo(
          s.relation.location.rootPaths.mkString(","),
          s.metadata.getOrElse("PushedFilters", "[]"),
          s.partitionFilters.mkString(", "),
          s.requiredSchema.simpleString)
    }

  private def describe(p: SparkPlan): String = {
    val s = p.simpleStringWithNodeId()
    if (s.length <= 160) s else s.take(157) + "..."
  }

  /** Every node of `p`, following AQE wrappers and subqueries. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec =>
        Seq[SparkPlan](a) ++ flatten(a.executedPlan)
      case _ => Seq(p) ++ p.children.flatMap(flatten)
    }
    self ++ p.subqueries.flatMap(flatten)
  }

  /** A partial aggregate's output is the per-partition buffer rows —
    * a single-partition exchange above one moves O(partitions) rows,
    * the CORRECT global-aggregate shape.
    */
  private def isPartialAgg(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      a.aggregateExpressions.nonEmpty &&
        a.aggregateExpressions.forall(_.mode == Partial)
    // pass-through wrappers matched on the classes themselves (a
    // string set silently rots when Spark renames a node)
    case w: WholeStageCodegenExec => isPartialAgg(w.child)
    case w: InputAdapter => isPartialAgg(w.child)
    case w: ProjectExec => isPartialAgg(w.child)
    case _ => false
  }
}
