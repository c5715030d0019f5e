package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graft.Bridge

import graft.plans.{TopKPerKeyNode, TopKPerKeyStrategy}

/** Per-key top-k via the engine's custom physical operator (see
  * [[graft.plans.TopKPerKeyNode]] for the why): bounded heaps instead
  * of the `row_number() <= k` sort-the-world plan. The shuffle carries
  * at most partitions × keys × k pre-reduced rows.
  */
object TopK {

  /** @param df    input rows — PROJECT to the needed columns first:
    *              custom logical nodes are opaque to Catalyst's
    *              ColumnPruning, so a select above this call does not
    *              prune the scan below it
    * @param keys  grouping columns
    * @param order ranking order (e.g. `col("score").desc`); make it a
    *              total order (unique tiebreak) for deterministic
    *              results — same contract as `row_number`
    * @param k     rows kept per key
    * @return the rows ranking ≤ k within their key, schema unchanged
    *         and order unspecified (as after any aggregation). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty && k >= 0)
    if (k == 0) return df.limit(0)
    Bridge.registerStrategy(df.sparkSession, TopKPerKeyStrategy)
    val sortOrder = order.map(c => Bridge.expression(df.sparkSession, c) match {
      case so: SortOrder => so
      case e             => SortOrder(e, Ascending)
    })
    // float keys normalize (-0.0 → 0.0, canonical NaN) so grouping
    // matches the window twin's semantics — the optimizer rule that
    // does this for built-in nodes does not match custom ones
    val keyExprs = keys.map(n =>
      Bridge.normalizeFloats(Bridge.expression(df.sparkSession, df.col(n))))
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrder, k, df.queryExecution.analyzed))
  }
}
