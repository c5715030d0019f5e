package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-gap audit — find every missing run in an id sequence
  * ("which event_ids never arrived?"), the ingest-completeness check
  * behind at-least-once reconciliation.
  *
  * The textbook formulation is `lead(id) OVER (ORDER BY id)` — a
  * GLOBAL window, which plans as a single-partition sort: the one
  * operator shape that cannot survive 100 TB. This rewrite is
  * two-level:
  *   1. ids bucket by `id div bucketSize`; intra-bucket gaps come from
  *      `lead` over (bucket, id) — per-partition windows, fully
  *      parallel;
  *   2. bucket boundaries stitch through the bucket SUMMARY table
  *      (one (min, max) row per non-empty bucket — |id-range| /
  *      bucketSize rows, bounded by the chosen bucket size), whose
  *      global window is over the summary, never the ids. A gap that
  *      swallows whole buckets appears here automatically because
  *      empty buckets have no summary row.
  * The registered oracle is the GLOBAL-window definition, so the hash
  * match proves the bucketed rewrite exact (the o3/w8 recipe).
  */
object Sequence {

  /** @param ids        frame whose `idCol` holds the sequence values
    *                   (castable to long; duplicates tolerated).
    * @param bucketSize intra-window partition width — size it so
    *                   |id-range|/bucketSize summary rows fit one task.
    * @return (gap_start, gap_end, n_missing) per maximal missing run,
    *         exclusive of the sequence's ends (no gap before min or
    *         after max — same as the lead() definition).
    */
  def gaps(ids: DataFrame, idCol: Column, bucketSize: Long = 1000000L): DataFrame = {
    val d = ids.select(idCol.cast("long").as("id")).distinct()
      .withColumn("bkt", expr(s"id div $bucketSize"))
    val intra = d
      .withColumn("nxt", lead(col("id"), 1).over(
        Window.partitionBy(col("bkt")).orderBy(col("id"))))
      .filter(col("nxt") > col("id") + 1)
      .select((col("id") + 1).as("gap_start"), (col("nxt") - 1).as("gap_end"))
    val summary = d.groupBy(col("bkt"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    val boundary = summary
      .withColumn("nxt_mn", lead(col("mn"), 1).over(Window.orderBy(col("bkt"))))
      .filter(col("nxt_mn") > col("mx") + 1)
      .select((col("mx") + 1).as("gap_start"), (col("nxt_mn") - 1).as("gap_end"))
    intra.union(boundary)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("n_missing"))
  }
}
