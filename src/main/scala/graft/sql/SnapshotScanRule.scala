package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.ingest.FileStats
import graft.sources.v2.SnapshotBatchRelation

/** Vectorizes `spark.read.format("graft-snapshots")` scans: replaces the
  * V1 [[SnapshotBatchRelation]] leaf with the log-pinned parquet plan it
  * delegates to, so the PHYSICAL plan is Spark's columnar parquet scan
  * itself — whole-stage codegen, parquet predicate pushdown, partition
  * pruning and column pruning all land in the scan (FileSourceStrategy
  * collapses the splice's Projects via PhysicalOperation) instead of a
  * `RowDataSourceScan` that re-encodes every row. Injected as a pre-CBO
  * rule: it runs ONCE after operator optimization, when pushed-down
  * filters sit directly above the relation leaf, so the filter condition
  * also feeds log-side FILE skipping ([[FileStats.fromExpression]]) — a
  * pruned file costs nothing, not even a task.
  *
  * The splice aliases the inner plan's output to the relation's original
  * expression ids (self-joins swap each relation node to an
  * independently-built inner plan, keeping both sides' ids distinct).
  * Sessions without the extension still work through the V1 fallback
  * (`needConversion=false` — InternalRows end-to-end, just a row-shaped
  * scan node). Snapshot pinning is unchanged: the relation resolved its
  * version at load() and every splice serves that same version. */
case class SnapshotScanRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[SnapshotBatchRelation] =>
      // The condition both stays as the row filter AND prunes the pinned
      // file list from log stats (best-effort, only ever widens).
      Filter(cond, splice(lr, FileStats.fromExpression(cond).orNull))
    case lr: LogicalRelation
        if lr.relation.isInstanceOf[SnapshotBatchRelation] =>
      splice(lr, null)
  }

  private def splice(lr: LogicalRelation,
                     pred: FileStats.Pred): LogicalPlan = {
    val inner = lr.relation.asInstanceOf[SnapshotBatchRelation].planFor(pred)
    // planFor normalizes output to schema order = the relation's output
    // order; the positional alias map re-binds the original ids.
    Project(lr.output.zip(inner.output).map { case (orig, cur) =>
      Alias(cur, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
    }, inner)
  }
}
