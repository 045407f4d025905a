package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one `private[sql]` constructor a third-party operator
  * library needs: building a DataFrame from a custom [[LogicalPlan]]
  * node. Everything else in graft uses public APIs; this shim exists so
  * [[graft.plans.Asof]] can hand its logical node to the planner (where
  * the injected strategy picks it up) without forking any Spark code.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridge for native expressions that must be
    * callable inside higher-order-function lambdas (a registry-name
    * round-trip cannot reference the lambda variable). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Expose what a `spark.sql.extensions` class registered, so specs can
    * prove the config-based injection path without constructing a fresh
    * JVM-wide session (extensions only apply at session build time). */
  def builtPlannerStrategies(
      e: SparkSessionExtensions, spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
  def builtOptimizerRules(
      e: SparkSessionExtensions, spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    e.buildOptimizerRules(spark.asInstanceOf[classic.SparkSession])
  def injectedFunctionNames(e: SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    e.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
