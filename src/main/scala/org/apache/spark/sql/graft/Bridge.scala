package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the Column↔Expression converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); third-party engines that ship
  * custom Catalyst expressions conventionally expose them through a shim in the
  * `org.apache.spark.sql` namespace — this is that shim, kept to two forwarding
  * methods so the private-API surface stays minimal and auditable.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built LogicalPlan (`Dataset.ofRows` went
    * `private[sql]` with the Spark 4 API split) — the front door for custom
    * logical operators like [[graft.plans.GroupedTopKPlan]]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register the engine's SQL functions on an *existing* session (builder-time
    * `withExtensions(new GraftExtensions)` is the front door, but `getOrCreate`
    * ignores extensions when a session already exists — e.g. inside the driver's
    * Verify/Bench harness or a shared test JVM). */
  def installGraftFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    _root_.graft.functions.GraftFunctionRegistry.all.foreach { case (name, _, build) =>
      reg.createOrReplaceTempFunction(name, exprs => build(exprs), "built-in")
    }
  }
}
