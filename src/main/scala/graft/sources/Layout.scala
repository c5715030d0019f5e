package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse layout (SURVEY.md §4): one logical table per event type,
  * physically partitioned by `office` (+ date grain), replacing the
  * reference's N-physical-tables-per-office routing (webhook_app.py:37,
  * README.md:555).
  *
  * Why this matters at 100 TB:
  *  - Partition pruning turns the reference's "pick the right table"
  *    logic into a Catalyst-planned scan of only matching directories
  *    (`PruneFileSourcePartitions`); a slicer like office+month touches
  *    1/(3·84) of the data without any manual table dispatch.
  *  - Parquet row-group min/max stats give data skipping WITHIN a
  *    partition for range predicates (see Tables.eventsBetween).
  *  - Writers append per partition, so per-office ingest never
  *    contends on other offices' files.
  */
object Layout {

  /** Write a fact table partitioned by the office/date grain. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Standard event-fact layout: office → year → month. */
  def writeEventFacts(events: DataFrame, path: String): Unit =
    writePartitioned(
      events
        .withColumn("year", year(col("ts")))
        .withColumn("month", month(col("ts"))),
      path, Seq("office", "year", "month"))

  /** Morton (Z-order) key over two numeric columns: each input is
    * scaled to `bits` levels by its min/max range, then the level bits
    * are interleaved. Files written in z-key ranges carry TIGHT parquet
    * min/max footer stats on BOTH columns at once, so range predicates
    * on EITHER column skip most files/row-groups — the multi-dimension
    * clustering a single-column sort can't give (sorting by a keeps
    * file stats on b full-width, so b-predicates prune nothing).
    *
    * The min/max scaling constants come from one aggregate (4 longs to
    * the driver — bounded; a production writer would cache them in table
    * metadata). Linear scaling is right for roughly uniform keys; for
    * heavy skew substitute approx-quantile cut points per column — the
    * interleave below is unchanged. Pure codegen'd bit arithmetic: no
    * UDF, no shuffle beyond the final range partition. */
  def zValue(a: Column, b: Column, aMin: Long, aMax: Long,
             bMin: Long, bMax: Long, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val levels = (1L << bits) - 1
    def scaled(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else ((c.cast("long") - lo) * levels / (hi - lo)).cast("long")
    val sa = scaled(a, aMin, aMax)
    val sb = scaled(b, bMin, bMax)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(sa.bitwiseAND(1L << i), i))
        .bitwiseOR(shiftleft(sb.bitwiseAND(1L << i), i + 1))
    }
  }

  /** Write `df` clustered by the Z-order of (`colA`, `colB`) into
    * `nFiles` range-partitioned files. `repartitionByRange` on the
    * z-key gives each file a disjoint z-range — i.e. a small rectangle
    * of the (a, b) key space — and the in-file sort keeps row-group
    * stats tight within it. One range-exchange shuffle total; scales
    * as ordinary sorted write. */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  path: String, nFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val z = zValue(col(colA), col(colB),
      r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Scan with slicer predicates; Catalyst prunes partitions before any
    * file is opened. Callers can verify via the plan's PartitionFilters. */
  def slicerScan(spark: SparkSession, path: String, office: Option[String],
      year: Option[Int], month: Option[Int]): DataFrame = {
    val base = spark.read.parquet(path)
    Seq(
      office.map(o => col("office") === o),
      year.map(y => col("year") === y),
      month.map(m => col("month") === m)
    ).flatten.foldLeft(base)((d, p) => d.filter(p))
  }
}
