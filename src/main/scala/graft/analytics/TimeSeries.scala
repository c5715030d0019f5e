package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization and sequence analytics over an event
  * stream — the operations a metrics pipeline needs between raw events
  * and a model-ready panel: a dense per-key time spine with gaps
  * forward-filled, and the first-order transition structure of the
  * event sequence.
  */
object TimeSeries {

  /** Daily gap fill with forward fill (last observation carried
    * forward): aggregate to (key, day), expand each key's [min, max]
    * day range to a DENSE spine, and fill missing days with the most
    * recent observed value.
    *
    * Scale: the spine is generated distributed — `sequence()` +
    * `explode` per key, never a driver-side calendar loop — and the
    * fill is one windowed `last(ignoreNulls)` per key partition, so
    * the whole operator is two shuffles (daily rollup, spine join)
    * regardless of key count or time span. Daily sums go through
    * DECIMAL so the rollup is partition-order exact.
    *
    * @return (key, day, day_value — null on gap days, filled_value —
    *         LOCF, was_gap 0/1), one row per key per day in the key's
    *         observed range.
    */
  def gapFillDaily(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    val daily = df
      .groupBy(key.as("k"), to_date(ts).as("day"))
      .agg(sum(value.cast("decimal(18,2)")).cast("double").as("day_value"))
    val spine = daily
      .groupBy(col("k")).agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("k"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))
    val fill = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("day"), col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(fill).as("filled_value"),
        col("day_value").isNull.cast("int").as("was_gap"))
  }

  /** First-order Markov transition matrix of a per-key event sequence:
    * for each observed (previous state → next state) pair, the count
    * and the row-normalized transition probability. The `ord` columns
    * must be a deterministic total order within each key (e.g. ts +
    * a unique id tiebreak) or the lag pairing itself is ambiguous.
    *
    * Scale: one window pass keyed by `key` (sequences never cross
    * keys, so the sort is per-key, not global) and one aggregation
    * over at most |states|² rows. The probability is a single double
    * division of two exact longs — deterministic IEEE, engine-portable.
    */
  def transitionMatrix(df: DataFrame, key: Column, ord: Seq[Column],
                       state: Column): DataFrame = {
    val seqW = Window.partitionBy(key).orderBy(ord: _*)
    val rowTotal = Window.partitionBy(col("prev_state"))
    df.select(state.as("next_state"),
        lag(state, 1).over(seqW).as("prev_state"))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(rowTotal).cast("double"))
  }
}
