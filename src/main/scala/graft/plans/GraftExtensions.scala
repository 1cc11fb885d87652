package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer (`SparkSessionExtensions`): registers the custom
  * Catalyst expressions under SQL names so `spark.sql("… graft_dot(a, b) …")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * This is the (b) tier of the custom-operator ladder (SURVEY.md §7.6): scalar
  * expressions via `injectFunction`. The (c) tier — a whole-plan optimizer
  * rule — is [[MaterializedViews.rewriteRule]], injected here so any
  * extension-built session rewrites registered aggregates to their
  * materialized summaries (sessions without extensions can install it via
  * `spark.experimental.extraOptimizations`, as q178 does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctionRegistry.all.foreach { case (name, clazz, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))
    }
    ext.injectOptimizerRule(_ => MaterializedViews.rewriteRule)
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
  }
}
