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
  * expressions via `injectFunction`; no custom LogicalPlan/Strategy is needed for
  * the parity surface (SURVEY.md §4 — the reference has no operator Spark lacks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctionRegistry.all.foreach { case (name, clazz, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))
    }
}
