package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar normalization functions F1–F12 (SURVEY.md §2.8).
  *
  * All are `Column`-returning compositions of built-ins — codegen'd by
  * Tungsten, never Scala UDFs (a UDF here would break whole-stage
  * codegen and block predicate pushdown through the projection at
  * scale; SURVEY.md §7.4).
  *
  * Reference behaviors reproduced:
  *  - F1 lenient multi-format timestamp parse with null-on-miss
  *    (Lead_Ingestion_CRM_SQLite.py:20-38)
  *  - F2 UTC → business-timezone conversion
  *    (Lead_Ingestion_CRM_SQLite.py:36-38)
  *  - F4 array → delimited string, empty ⇒ NULL
  *    (Lead_Ingestion_CRM_SQLite.py:110)
  *  - F5 null-preserving bool → int cast (Lead_Ingestion_CRM_SQLite.py:121)
  *  - F6/F7 JSON serialize / extract (webhook_app.py:61,161-164)
  *  - F8 office-prefixed naming (webhook_app.py:37)
  */
object Normalize {

  /** F1: try each timestamp format in order; first hit wins; all-miss ⇒ NULL.
    * `try_to_timestamp` keeps null-on-miss semantics under Spark 4's
    * default ANSI mode (plain to_timestamp would throw). */
  def parseTsMulti(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** Default format chain mirroring the reference: ISO datetime then bare date. */
  def parseTsLenient(c: Column): Column =
    parseTsMulti(c, Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd"))

  /** F2: UTC instant → wall time in the business timezone. */
  def toBusinessTz(c: Column, tz: String): Column = from_utc_timestamp(c, tz)

  /** F10: display formatting of a timestamp (presentation only). */
  def formatTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** F4: tags array → CSV string; empty or null array ⇒ NULL. */
  def tagsToCsv(c: Column): Column = when(size(c) > 0, array_join(c, ","))

  /** F5: boolean → 0/1, NULL-preserving. */
  def boolToInt(c: Column): Column = c.cast("int")

  /** F8: `{office}_{table}` physical-name templating, kept as a column so
    * routing stays inside the plan instead of driver-side string logic. */
  def officeTable(office: Column, tableName: String): Column =
    concat(office, lit("_" + tableName))

  /** F12: null-defaulting, the `or {}` / `.get(k, default)` idiom. */
  def withDefault(c: Column, default: Column): Column = coalesce(c, default)
}
