package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rewrite: an optimizer rule that substitutes a
  * pre-computed rollup for any query subtree that provably computes the
  * same thing — the warehouse trick that turns a 100 TB fact scan into
  * a megabyte MV read whenever the dashboard query IS the registered
  * rollup.
  *
  * Matching is by CANONICALIZED OPTIMIZED PLAN EQUALITY
  * (`sameResult`), the same identity test Spark's own `CacheManager`
  * uses to recognize cached plans: both the registered definition and
  * the incoming subtree have been through the full optimizer, so
  * cosmetic differences (alias names, projection order, expression ids)
  * are already normalized away, and two plans that `sameResult` are
  * guaranteed row-equivalent. This is deliberately narrower than a
  * containment-based rewriter (it will not serve a COARSER rollup from
  * a finer MV) and therefore cannot mis-fire: the rewrite is exactly
  * "this query is the view".
  *
  * The substituted scan keeps the original subtree's output attribute
  * ids via an aliasing [[Project]], so parents of the rewritten subtree
  * (a Sort, a further filter) resolve unchanged — the same attribute
  * re-stitching `CacheManager.useCachedData` performs. Name and
  * dataType are re-checked positionally before firing; any mismatch
  * (e.g. an MV written by an older definition) leaves the plan
  * untouched rather than producing a wrong rewrite.
  *
  * Registration is scoped: [[withRewrite]] installs the rule in
  * `spark.experimental.extraOptimizations` (the officially supported
  * post-optimizer injection point for a live session — no session
  * rebuild, unlike `SparkSessionExtensions`), runs the body, and in a
  * finally removes exactly its own rule (by identity, under a lock —
  * nested/concurrent scopes on one session compose instead of racing
  * a snapshot-restore). Because a DataFrame
  * optimizes lazily, callers that RETURN a rewritten frame must touch
  * `df.queryExecution.optimizedPlan` inside the scope — the
  * QueryExecution caches it, so the substitution survives the scope
  * and executes later (the q247 pattern). The rule itself matches only
  * its own registered definition, so while installed it cannot touch
  * any other query's plan. */
object MvRewrite {

  /** Rewrite every subtree of `plan` that `sameResult`s `definition`
    * to a scan of `replacement` (the MV), preserving the subtree's
    * output attribute ids. */
  final case class SubstituteView(definition: LogicalPlan,
                                  replacement: LogicalPlan)
      extends Rule[LogicalPlan] {
    private def compatible(p: LogicalPlan): Boolean =
      p.output.size == replacement.output.size &&
        p.output.zip(replacement.output).forall { case (o, n) =>
          o.name == n.name && o.dataType == n.dataType
        }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformDown {
        case p if p.sameResult(definition) && compatible(p) =>
          Project(p.output.zip(replacement.output).map { case (o, n) =>
            // nullability reconciliation: a parquet-backed MV reports
            // every column nullable, while the definition may prove an
            // output non-null (count(*), a literal). The MV's CONTRACT
            // says its rows are the definition's, so such a column
            // cannot actually hold NULL — AssertNotNull pins that:
            // the substituted attribute keeps o's exact nullability
            // (alias of a non-nullable child), and a drifted MV that
            // does carry a NULL fails LOUDLY at execution instead of
            // silently feeding NULLs to operators the plan proved
            // can't see them.
            val child =
              if (n.nullable && !o.nullable)
                org.apache.spark.sql.catalyst.expressions.objects
                  .AssertNotNull(n)
              else n
            Alias(child, o.name)(exprId = o.exprId)
          }, replacement)
      }
  }

  /** True iff some file-source leaf of `plan` scans a root path
    * containing `pathSubstring` — the did-the-rewrite-fire check
    * (a LogicalRelation's toString does NOT render its location, so
    * string-matching the plan tree cannot detect the substitution). */
  def scansPath(plan: LogicalPlan, pathSubstring: String): Boolean =
    plan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(pathSubstring))
        case _ => false
      }
      case _ => false
    }

  /** Install a one-view rewrite for the duration of `body`.
    * `definition` is the view's defining query over the base tables;
    * `mv` is the materialized result (typically `spark.read.parquet`
    * of what `definition` wrote). On exit (success or failure) exactly
    * THIS call's rule is removed from the session's
    * `extraOptimizations` — not a restore of a captured snapshot,
    * which under nested or concurrent scopes on one session could
    * resurrect a sibling's already-removed rule or drop one installed
    * after the snapshot. Mutation of the session-global rule list is
    * serialized on the session's `experimental` holder; the rules
    * themselves are matched per-view, so overlapping scopes compose
    * (each query sees every currently-installed view rule, each of
    * which only fires on its own definition). */
  def withRewrite[T](spark: SparkSession, definition: DataFrame,
                     mv: DataFrame)(body: => T): T = {
    val rule = SubstituteView(definition.queryExecution.optimizedPlan,
      mv.queryExecution.analyzed)
    val exp = spark.experimental
    exp.synchronized {
      exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
    try body
    finally exp.synchronized {
      // remove by reference identity: this scope's rule and only it
      exp.extraOptimizations =
        exp.extraOptimizations.filterNot(_ eq rule)
    }
  }
}
