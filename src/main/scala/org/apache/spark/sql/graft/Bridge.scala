package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` and `sessionState`
  * are `private[sql]`, so this one-file shim lives inside the
  * org.apache.spark.sql package tree — the standard pattern for
  * third-party Catalyst extensions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → fully-converted Expression through the session's
    * ColumnNode converter. [[expression]] wraps non-expression column
    * nodes in a lazy `ColumnNodeExpression` placeholder that only the
    * analyzer unwraps — fine inside select/filter, but an expression
    * embedded in a custom LogicalPlan needs the real tree NOW. */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Normalize -0.0 → 0.0 and NaN payloads to the canonical NaN
    * inside an expression (recursively through structs/arrays).
    * Spark's `NormalizeFloatingNumbers` optimizer rule does this for
    * Aggregate/Join/Window keys but NOT for custom logical nodes —
    * without it, raw-bits UnsafeRow key equality would split ±0.0 and
    * NaN-payload groups (e.g. in [[graft.plans.TopKPerKeyNode]]). */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** DataFrame from a raw LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — the construction path for custom logical
    * operators like [[graft.plans.TopKPerKeyNode]]. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Planner-strategy registration on an EXISTING session (the
    * `withExtensions` path is GraftSessionExtensions): public
    * `experimental.extraStrategies`, idempotent. */
  def registerStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Register a JVM-exit cleanup that runs AFTER Spark's own shutdown
    * hooks (`ShutdownHookManager` is `private[spark]`, hence bridged).
    * A raw `Runtime.addShutdownHook` races SparkContext.stop — Spark
    * tasks can still be reading staged files when the hook deletes
    * them; priority below SPARK_CONTEXT_SHUTDOWN_PRIORITY (50) means
    * Spark quiesces first (higher priority runs earlier). */
  def addPostSparkShutdownHook(body: () => Unit): Unit = {
    org.apache.spark.util.ShutdownHookManager.addShutdownHook(
      org.apache.spark.util.ShutdownHookManager.SPARK_CONTEXT_SHUTDOWN_PRIORITY - 25)(body)
    ()
  }

  /** Register a SQL-callable function backed by a raw Expression
    * builder on an EXISTING session (complements GraftExtensions,
    * which covers sessions built with `.withExtensions`). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
