package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite — tier (c) of the custom-operator ladder
  * (SURVEY.md §7.6): a `Rule[LogicalPlan]` that replaces an aggregation the
  * optimizer is about to run with a SCAN of its precomputed result. At 100 TB
  * this is the difference between re-aggregating the fact table per dashboard
  * query and reading a KB-sized summary: the rewrite happens in the
  * OPTIMIZER, so callers keep writing the aggregate query and get the MV for
  * free when one matches.
  *
  * Matching is EXACT-PLAN, not subsumption: a candidate `Aggregate` rewrites
  * iff `sameResult(definition)` — Catalyst's canonicalized structural
  * equality, which ignores alias names and expression ids but demands the
  * same grouping, aggregate expressions, filters, and underlying relation
  * (file roots included). Exact matching keeps the rule trivially SOUND; the
  * classic subsumption extensions (filter containment, group-by rollup) are
  * deliberately out of scope — each needs its own proof obligations.
  *
  * Staleness contract: like [[graft.engine.Skipping.writeStats]], the MV is a
  * snapshot of the base at [[create]] time; rewrites against a base that was
  * appended to since are answered from the stale summary. Re-run [[create]]
  * after base rewrites (the relation's file listing is part of the plan, so a
  * base written to a NEW path simply stops matching). [[create]] may run with
  * the rule already live — a reentrancy guard shields the definition's own
  * planning from being rewritten to a previously-registered MV.
  *
  * Output-side soundness: the replacement projects the MV scan's columns onto
  * the Aggregate's own output attribute ids (`Alias(..)(exprId = ..)`), and
  * bails unless the data types line up exactly — a parquet roundtrip
  * preserves every aggregate result type Spark produces, but the guard makes
  * a mismatch impossible rather than unlikely.
  */
object MaterializedViews {

  /** A registered view: the OPTIMIZED definition plan (the match key), and
    * the analyzed scan of its materialized result (the replacement). */
  private case class MvDef(defPlan: LogicalPlan, mvPlan: LogicalPlan)

  private val registry = scala.collection.mutable.ArrayBuffer.empty[MvDef]

  /** Reentrancy guard: while [[create]] plans its own definition (and writes
    * the MV), the rewrite rule must not fire — otherwise the definition would
    * be captured post-rewrite (losing its Aggregate) and the materialization
    * itself would read a previously-registered MV instead of the base. */
  private val creating = new ThreadLocal[Boolean] { override def initialValue = false }

  /** Materialize `definition` (an aggregate DataFrame over parquet sources)
    * to `mvPath` and register it for rewriting. Safe to call with the rule
    * already installed — creation is shielded from its own rewrites. */
  def create(spark: SparkSession, definition: DataFrame, mvPath: String): Unit = {
    creating.set(true)
    try {
      val defPlan = definition.queryExecution.optimizedPlan
      require(defPlan.collectFirst { case a: Aggregate => a }.isDefined,
        "MaterializedViews.create: definition must contain an Aggregate")
      require(!registry.exists(d => defPlan.sameResult(d.defPlan)),
        "MaterializedViews.create: an equivalent definition is already registered — drop it first")
      definition.write.mode("overwrite").parquet(mvPath)
      registry += MvDef(defPlan, spark.read.parquet(mvPath).queryExecution.analyzed)
    } finally creating.set(false)
  }

  def clear(): Unit = registry.clear()

  /** The optimizer rule. Install per session via
    * `spark.experimental.extraOptimizations :+= MaterializedViews.rewriteRule`
    * (runs after the main optimizer batches, so candidates are in the same
    * normalized form [[create]] captured) or globally through
    * [[GraftExtensions]]. */
  object rewriteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = if (creating.get) plan else plan transformUp {
      case agg: Aggregate =>
        registry.find(d => agg.sameResult(d.defPlan)) match {
          case Some(d) if agg.output.length == d.mvPlan.output.length &&
            agg.output.zip(d.mvPlan.output).forall {
              case (o, m) => o.dataType == m.dataType } =>
            Project(agg.output.zip(d.mvPlan.output).map {
              case (o, m) => Alias(m, o.name)(exprId = o.exprId)
            }, d.mvPlan)
          case _ => agg
        }
    }
  }
}
