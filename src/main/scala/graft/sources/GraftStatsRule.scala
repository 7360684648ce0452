package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{
  Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Statistics visibility for the V1-bridged graft scan.
  *
  * `V2ScanRelationPushDown` wraps every [[V1Scan]] in Spark's
  * `V1ScanWrapper`, which implements only bare `Scan` — so
  * `DataSourceV2ScanRelation.computeStats` never sees the underlying
  * scan's [[SupportsReportStatistics]] and every V1-bridged source
  * reads as `defaultSizeInBytes` (8 EiB: never broadcastable, never
  * join-reorderable). JDBC has the same blind spot upstream.
  *
  * [[GraftStatsRule]] closes it: a post-pushdown optimizer rule
  * (registered idempotently on `spark.experimental
  * .extraOptimizations` — the officially supported injection point,
  * same mechanism [[graft.plans.MvRewrite]] uses — which runs AFTER
  * the early scan-pushdown batch) re-wraps the planned scan in
  * [[GraftStatsV1ScanWrapper]], a `V1ScanWrapper` subclass that
  * forwards `estimateStatistics` to the graft scan. Catalyst's join
  * planning then sees the manifest-derived size/row count
  * ([[GraftScan.estimateStatistics]]): a dimension-sized graft table
  * broadcasts without a hint, which at 100 TB is the difference
  * between a map-side join and a full fact-table shuffle. */
private[sources] final class GraftStatsV1ScanWrapper(
    v1: V1Scan,
    handled: Seq[Filter],
    ops: PushedDownOperators)
  extends V1ScanWrapper(v1, handled, ops)
  with SupportsReportStatistics {

  override def estimateStatistics(): Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // the inherited case-class equality would make this wrapper == the
  // plain one it replaces, and TreeNode.transform drops replacements
  // that compare equal — distinguish the classes so the swap sticks
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[GraftStatsV1ScanWrapper]

  override def equals(other: Any): Boolean = other match {
    case o: GraftStatsV1ScanWrapper => super.equals(o)
    case _ => false
  }

  override def hashCode(): Int = super.hashCode() * 31 + 1
}

object GraftStatsRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val swapped = plan.transform {
      case r: DataSourceV2ScanRelation => r.scan match {
        // graft scans ONLY: registration is a session-wide side effect
        // of reading any graft table, so matching every V1ScanWrapper
        // would silently change join planning for unrelated V1-bridged
        // connectors (JDBC, third-party) the user never opted in
        case w: V1ScanWrapper
          if !w.isInstanceOf[GraftStatsV1ScanWrapper] &&
            (w.v1Scan.isInstanceOf[GraftScan] ||
              w.v1Scan.isInstanceOf[GraftAggScan] ||
              w.v1Scan.isInstanceOf[GraftPartialAggScan]) =>
          r.copy(scan = new GraftStatsV1ScanWrapper(
            w.v1Scan, w.handledFilters, w.pushedDownOperators))
        case _ => r
      }
    }
    // COST-BASED JOIN REORDER, re-run over the stats-visible plan:
    // Spark's own "Join Reorder" batch fires BEFORE any injectable
    // hook that could see the V1ScanWrapper (batch order: Pre CBO
    // Rules → Early Filter and Projection Push-Down → Join Reorder →
    // … → User Provided Optimizers), so at its first run every
    // V1-bridged graft scan still reads as defaultSizeInBytes and the
    // reorder is a no-op. Re-applying the SAME rule here — after the
    // swap made manifest row counts and `#stats` NDVs visible — gives
    // multi-join graft queries the reorder CBO intends. Guards: only
    // when the plan actually contains a graft scan (never perturb
    // foreign plans), and CostBasedJoinReorder itself no-ops unless
    // spark.sql.cbo.enabled && spark.sql.cbo.joinReorder.enabled.
    val hasGraft = swapped.exists {
      case r: DataSourceV2ScanRelation =>
        r.scan.isInstanceOf[GraftStatsV1ScanWrapper] ||
          r.scan.isInstanceOf[GraftBucketedScan]
      case _ => false
    }
    if (hasGraft && conf.cboEnabled && conf.joinReorderEnabled)
      org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder(
        swapped)
    else swapped
  }

  /** Append the rule to the session's extra optimizations exactly
    * once — called from every graft snapshot resolution, so any
    * session that reads a graft table carries it. */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraOptimizations.exists(_ eq this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
