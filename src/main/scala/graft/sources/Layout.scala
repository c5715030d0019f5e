package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
