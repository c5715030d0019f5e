package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-concurrency timeline — "how many sessions were active at
  * once?" (peak-load sizing, license-seat audits, connection-pool
  * planning). The textbook form is a GLOBAL running sum over the
  * +1/−1 boundary stream — a single-partition sort that cannot
  * survive 100 TB. Same cure as `Sequence.gaps`: decompose the global
  * cumulative sum into per-DAY running sums (parallel windows) plus a
  * day-prefix offset from the |days|-row daily-total summary — the
  * registered oracle is the global-window definition, so the hash
  * match proves the decomposition exact.
  *
  * Boundary semantics are END-INCLUSIVE (the −1 lands at end+1 µs, so
  * a session covers its last event's instant) and ties process all
  * −1s before any +1 at the same microsecond; within an equal
  * (us, delta) group the per-row running values depend on tie order,
  * but the per-day MAX does not (a +1 group's max is its last value,
  * a −1 group's max is its first), so the statistic is deterministic.
  */
object Timeline {

  /** @param intervals one row per interval.
    * @param startUs   inclusive start, µs since epoch (long).
    * @param endUs     inclusive end, µs since epoch (long).
    * @return (day, max_concurrent) for every day carrying a boundary.
    */
  def maxConcurrencyPerDay(intervals: DataFrame, startUs: Column,
      endUs: Column): DataFrame = {
    // r18: boundary stream via a single EXPLODE, not a self-union —
    // the union form referenced `intervals` twice, so its whole
    // upstream subtree (for ts9: the two-window sessionize over the
    // event log) planned and EXECUTED once per side (guide §2.4 —
    // remove duplicated passes). One generator row-doubles in place;
    // row order differs from the union but every consumer below is an
    // aggregation or an explicitly ordered window, so the result is
    // unchanged (TimelineSpec pins it).
    val deltas = intervals
      .select(explode(array(
        struct(startUs.cast("long").as("us"), lit(1L).as("delta")),
        struct((endUs.cast("long") + 1L).as("us"), lit(-1L).as("delta")))).as("b"))
      .select(col("b.us").as("us"), col("b.delta").as("delta"))
      .withColumn("day", to_date(timestamp_micros(col("us"))))
    val intra = deltas.withColumn("run",
      sum(col("delta")).over(Window.partitionBy(col("day"))
        .orderBy(col("us"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // |days|-row summary; its global window is over the summary, never
    // the boundary stream (the Sequence.gaps stitch argument)
    val prefix = deltas.groupBy(col("day")).agg(sum(col("delta")).as("tot"))
      .withColumn("prior", coalesce(
        sum(col("tot")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("prior"))
    // the day's peak must also consider the CARRY-IN concurrency at
    // midnight (`prior`): a day whose only boundaries are −1s (open
    // sessions closing) peaks before its first boundary row
    intra.join(prefix, "day")
      .groupBy(col("day"))
      .agg(greatest(max(col("prior") + col("run")), max(col("prior")))
        .as("max_concurrent"))
  }
}
