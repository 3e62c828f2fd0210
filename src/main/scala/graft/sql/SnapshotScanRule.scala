package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import graft.ingest.FileStats
import graft.sources.v2.{GraftCatalogTable, SnapshotBatchRelation}

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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Row-level command targets (DELETE/UPDATE/MERGE) must STAY DSv2
    // relations — DataSourceV2Strategy plans the command off the relation
    // node itself (unlike AppendData, whose target is not a child). Shield
    // those subtrees from the read splice.
    val shielded = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        d.table.foreach(shielded.add)
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        u.table.foreach(shielded.add)
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        m.targetTable.foreach(shielded.add)
      case _ => ()
    }
    applyShielded(plan, shielded)
  }

  private def applyShielded(plan: LogicalPlan,
                            shielded: java.util.Set[LogicalPlan])
      : LogicalPlan = plan.transformDown {
    case Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[SnapshotBatchRelation] =>
      // The condition both stays as the row filter AND prunes the pinned
      // file list from log stats (best-effort, only ever widens).
      Filter(cond, splice(lr, FileStats.fromExpression(cond).orNull))
    case lr: LogicalRelation
        if lr.relation.isInstanceOf[SnapshotBatchRelation] =>
      splice(lr, null)
    // Catalog-resolved reads (`SELECT … FROM graft.t`): splice the
    // [[GraftCatalogTable]] relation the same way so catalog SQL runs the
    // columnar parquet scan instead of the per-file fallback reader. At
    // pre-CBO, predicate pushdown has already parked the filters adjacent
    // to the leaf, so the condition feeds log-side skipping exactly like
    // the V1 path. Both the pre-pushdown (DataSourceV2Relation) and
    // post-pushdown (DataSourceV2ScanRelation) shapes are handled —
    // whichever this Spark version presents at pre-CBO. Write commands
    // are untouched: a V2WriteCommand's target table is not among its
    // children, only its query is.
    case Filter(cond, r: DataSourceV2Relation)
        if r.table.isInstanceOf[GraftCatalogTable] && !shielded.contains(r) =>
      Filter(cond, spliceV2(r.table, r.output,
        FileStats.fromExpression(cond).orNull))
    case r: DataSourceV2Relation
        if r.table.isInstanceOf[GraftCatalogTable] && !shielded.contains(r) =>
      spliceV2(r.table, r.output, null)
    case Filter(cond, sr: DataSourceV2ScanRelation)
        if sr.relation.table.isInstanceOf[GraftCatalogTable] &&
          !shielded.contains(sr) && !aggPushed(sr) =>
      Filter(cond, spliceV2(sr.relation.table, sr.output,
        FileStats.fromExpression(cond).orNull))
    case sr: DataSourceV2ScanRelation
        if sr.relation.table.isInstanceOf[GraftCatalogTable] &&
          !shielded.contains(sr) && !aggPushed(sr) =>
      spliceV2(sr.relation.table, sr.output, null)
  }

  /** A scan serving a fully-pushed aggregation answers from the log and
    * must not be spliced back into a full-table plan. */
  private def aggPushed(sr: DataSourceV2ScanRelation): Boolean =
    sr.scan match {
      case b: graft.sources.v2.SnapshotScanBuilder => b.hasPushedAggregation
      case _ => false
    }

  private def spliceV2(table: org.apache.spark.sql.connector.catalog.Table,
                       output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
                       pred: FileStats.Pred): LogicalPlan = {
    val rel = new SnapshotBatchRelation(session.sqlContext,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        table.properties()))
    val inner = rel.planFor(pred)
    // The relation's output may be the PRUNED column set; map by name into
    // the inner plan's full schema-order output, re-binding the original
    // expression ids.
    val byName = inner.output.map(a => a.name -> a).toMap
    Project(output.map { orig =>
      Alias(byName(orig.name), orig.name)(
        exprId = orig.exprId, qualifier = orig.qualifier)
    }, inner)
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
