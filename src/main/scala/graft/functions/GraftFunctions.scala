package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.Bridge

/** SQL-facing registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the
  * Column API (SURVEY.md §2.9 extensibility surface).
  *
  * Two registration paths: [[register]] for an existing session, and
  * the `spark.sql.extensions=graft.functions.GraftSessionExtensions`
  * config for sessions the engine does not construct.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_shingles",
      exprs => WordShingles(exprs.head, 3))
    // deterministic max_by/min_by twins (analyzer wraps the bare
    // AggregateFunction in an AggregateExpression, as for built-ins)
    Bridge.registerFunction(spark, "graft_argmax",
      exprs => ArgExtremum(exprs(0), exprs(1), findMax = true, tieLow = true))
    Bridge.registerFunction(spark, "graft_argmin",
      exprs => ArgExtremum(exprs(0), exprs(1), findMax = false, tieLow = true))
  }
}

/** `spark.sql.extensions`-compatible injector. */
class GraftSessionExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(exprs.head, 3)))
    ext.injectFunction((
      FunctionIdentifier("graft_argmax"),
      new ExpressionInfo(classOf[ArgExtremum].getName, "graft_argmax"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgExtremum(exprs(0), exprs(1), findMax = true, tieLow = true)))
    ext.injectFunction((
      FunctionIdentifier("graft_argmin"),
      new ExpressionInfo(classOf[ArgExtremum].getName, "graft_argmin"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgExtremum(exprs(0), exprs(1), findMax = false, tieLow = true)))
    // Auto-broadcast schema-fixed tiny dims (see BroadcastDims scaladoc).
    ext.injectOptimizerRule(_ =>
      graft.plans.BroadcastDims(graft.plans.BroadcastDims.defaultDims))
    // Per-key top-k physical operator (see TopKPerKeyNode scaladoc).
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
