package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — merge a delta batch's
  * aggregate state into a standing rollup without rescanning the base.
  *
  * The 100 TB posture: a daily ingest must not recompute a corpus-wide
  * GROUP BY. Because counts and decimal sums are commutative monoids,
  * the standing rollup IS the aggregation state; folding a batch in is
  * a |keys|-sized outer join (both sides already aggregated), so the
  * work per refresh is proportional to the DELTA, not the history.
  * This is the batch twin of what the streaming side does with
  * `st8_windowed_counts` state — and composes with it: a streaming
  * job can publish per-batch partial states and this merge compacts
  * them. AVG/ratio measures derive from (sum, count) pairs at read
  * time rather than being merged directly (they are not associative).
  *
  * Reference anchor: the reference's scheduled refresh recomputes its
  * dashboard aggregates from the warehouse on every run (README "Data
  * refresh automation"); this operator is the incremental replacement
  * that makes the same refresh O(delta).
  */
object Incremental {

  /** Merge two aggregate states sharing `keys`, a count column `cnt`,
    * and additive (decimal-exact) sum columns `sums`. Keys present on
    * one side only pass through with the other side treated as zero —
    * so the merge is total and associative: merge(merge(a,b),c) =
    * merge(a, merge(b,c)), the property that lets refreshes batch or
    * stream arbitrarily. */
  def mergeState(base: DataFrame, delta: DataFrame, keys: Seq[String],
                 cnt: String, sums: Seq[String]): DataFrame = {
    val b = (Seq(cnt) ++ sums).foldLeft(base) { (df, c) =>
      df.withColumnRenamed(c, s"__b_$c")
    }
    val d = (Seq(cnt) ++ sums).foldLeft(delta) { (df, c) =>
      df.withColumnRenamed(c, s"__d_$c")
    }
    val merged = b.join(d, keys, "full_outer")
    val measures =
      (coalesce(col(s"__b_$cnt"), lit(0L)) + coalesce(col(s"__d_$cnt"), lit(0L))).as(cnt) +:
        sums.map(c =>
          (coalesce(col(s"__b_$c"), lit(0).cast("decimal(18,2)")) +
            coalesce(col(s"__d_$c"), lit(0).cast("decimal(18,2)"))).as(c))
    merged.select(keys.map(col) ++ measures: _*)
  }
}
