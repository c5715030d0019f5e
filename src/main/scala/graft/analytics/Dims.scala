package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension tables (SURVEY.md §2.3 J1–J3, FIXTURES.md B3).
  *
  * The reference's Power BI model precomputes calculated tables — a
  * dynamic calendar and per-office/per-agent goal tables
  * (README.md:519). Both are tiny relative to the fact tables, so every
  * join against them must be a broadcast hash join: callers wrap these
  * in `broadcast(...)`. At 100 TB of facts these dims are still < 1 MB —
  * a shuffle join here would be the single worst plan regression.
  */
object Dims {

  /** J1: calendar dimension generated in-plan via `sequence` + `explode`
    * (no driver-side row building, no custom Generator — SURVEY.md §2.9). */
  def calendar(spark: SparkSession, startDate: String, endDate: String): DataFrame =
    spark.range(1).select(
      explode(sequence(
        to_date(lit(startDate)), to_date(lit(endDate)), expr("interval 1 day")
      )).as("cal_date")
    ).select(
      col("cal_date"),
      year(col("cal_date")).as("cal_year"),
      month(col("cal_date")).as("cal_month"),
      date_format(col("cal_date"), "MMMM").as("cal_month_name")
    )

  /** J2: goal dimension. The reference's goals are hand-entered Power BI
    * tables (oficina_a_Meta_Anual etc., README.md:519); here they are
    * derived deterministically from the nation dim so the DuckDB oracle
    * can rebuild the identical table from the same parquet. */
  def goals(nation: DataFrame): DataFrame =
    nation.select(
      col("n_nationkey").as("g_nationkey"),
      col("n_name").as("g_name"),
      ((col("n_nationkey") + 1) * 2000000L).cast("double").as("monthly_goal"),
      ((col("n_nationkey") + 1) * 24000000L).cast("double").as("annual_goal")
    )
}
