package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.Incremental

/** Incremental rollup maintenance: merged state must equal a full
  * recompute exactly (decimal-exact, not approximately), and the merge
  * must be associative so refreshes can batch arbitrarily. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir)

  private def state(df: DataFrame) = df
    .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
    .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sv"))

  private def snap(df: DataFrame) =
    df.select(col("event_type"), col("day").cast("string"), col("n"),
        col("sv").cast("string"))
      .as[(String, String, Long, String)].collect().sortBy(r => (r._1, r._2))

  test("merge(base, delta) equals a full recompute exactly") {
    val cut = to_timestamp(lit("2024-01-18 11:30:00")) // mid-day: boundary keys on both sides
    val merged = Incremental.mergeState(
      state(events.filter(col("ts") < cut)),
      state(events.filter(col("ts") >= cut)),
      Seq("event_type", "day"), "n", Seq("sv"))
    assert(snap(merged).toSeq === snap(state(events)).toSeq)
  }

  test("merge is associative: three deltas fold to the same state in any grouping") {
    val c1 = to_timestamp(lit("2024-01-10 00:00:00"))
    val c2 = to_timestamp(lit("2024-01-20 00:00:00"))
    val p1 = state(events.filter(col("ts") < c1))
    val p2 = state(events.filter(col("ts") >= c1 && col("ts") < c2))
    val p3 = state(events.filter(col("ts") >= c2))
    val keys = Seq("event_type", "day")
    val leftFold = Incremental.mergeState(
      Incremental.mergeState(p1, p2, keys, "n", Seq("sv")), p3, keys, "n", Seq("sv"))
    val rightFold = Incremental.mergeState(
      p1, Incremental.mergeState(p2, p3, keys, "n", Seq("sv")), keys, "n", Seq("sv"))
    assert(snap(leftFold).toSeq === snap(rightFold).toSeq)
    assert(snap(leftFold).toSeq === snap(state(events)).toSeq)
  }

  test("keys on one side only pass through with zero contribution from the other") {
    val empty = state(events.filter(lit(false)))
    val all = state(events)
    val merged = Incremental.mergeState(all, empty, Seq("event_type", "day"), "n", Seq("sv"))
    assert(snap(merged).toSeq === snap(all).toSeq)
    val mergedR = Incremental.mergeState(empty, all, Seq("event_type", "day"), "n", Seq("sv"))
    assert(snap(mergedR).toSeq === snap(all).toSeq)
  }
}
