package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact trailing event-time window aggregation at scale.
  *
  * The direct form — `sum(x) OVER (ORDER BY t RANGE BETWEEN w PRECEDING
  * AND CURRENT ROW)` — is the right declaration but the wrong physical
  * plan for dense keys: Spark's sliding frame cannot retract
  * non-invertible aggregates (DECIMAL sums among them), so it
  * re-aggregates the whole frame on every row — O(rows × frame).
  * Measured on the 100× replica (10M events, ~4700-row frames): 228 s.
  *
  * This operator computes the same result from prefix sums:
  *   trailing(t) = peerCum(t) − peerCum(latest row with t' < t − w)
  * where `peerCum` is the peer-inclusive running total (RANGE unbounded
  * preceding — incremental, O(rows)), and the boundary row is found
  * with a backward [[AsOf]] join (one shuffle). DECIMAL subtraction is
  * exact, so the difference equals the frame sum bit-for-bit — the
  * DuckDB RANGE-frame oracle pins the equivalence. Same 100× replica:
  * 20 s (11× faster, and linear in rows instead of rows × frame).
  */
object TrailingWindow {

  /** Trailing-window sum with RANGE-frame (peer-inclusive, boundary-
    * inclusive) semantics over an integer microsecond timestamp.
    *
    * @param usCol  event-time column in microseconds (integer domain)
    * @param value  summed column (aggregated as DECIMAL(18,2))
    * @param windowMicros  trailing window width; frame = [t−w, t]
    * @param out    output column name (double)
    */
  def trailingSumMicros(df: DataFrame, keys: Seq[String], usCol: String,
                        value: Column, windowMicros: Long,
                        out: String): DataFrame = {
    val peerCum = sum(value.cast("decimal(18,2)")).over(
      Window.partitionBy(keys.map(col): _*).orderBy(col(usCol))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val withCum = df.withColumn("__cum", peerCum)
    // peers share one cum value ⇒ one boundary row per (key, timestamp)
    val boundary = withCum
      .select(keys.map(col) :+ col(usCol).as("__bus") :+ col("__cum").as("__bcum"): _*)
      .distinct()
    val probed = AsOf.asOfBackward(
      withCum.withColumn("__probe", col(usCol) - lit(windowMicros + 1)),
      boundary, keys, "__probe", "__bus")
    probed
      .withColumn(out,
        (col("__cum") - coalesce(col("__bcum"), lit(0).cast("decimal(18,2)")))
          .cast("double"))
      .drop("__cum", "__probe", "__bus", "__bcum")
  }
}
