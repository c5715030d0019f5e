package graft.ingest

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** E1 batch backfill: paginated source → normalize → last-wins snapshot
  * (SURVEY.md §3 E1; reference: Lead_Ingestion_CRM_SQLite.py).
  *
  * The reference pulls `limit/offset` pages of 100 from a rate-limited
  * REST API on the driver, normalizes each row in Python, and
  * `INSERT OR REPLACE`s into a snapshot table. Here:
  *  - [[paginatedFetch]] keeps the reference's stop-on-empty-page loop
  *    (a driver-side concern — the API budget of 2k req/day makes the
  *    fetch itself the bottleneck, not Spark). The scale-true form is
  *    [[graft.sources.rest.PagedSource]]: a DataSource V2
  *    `TableProvider` whose `InputPartition`s carry offset ranges so
  *    executors fetch pages in parallel (`spark.read.format
  *    ("graft-paged")`); this driver-side variant remains for
  *    closure-style callers and tiny collections.
  *  - normalization is column expressions (F1/F2/F4/F5), not per-row
  *    code, so the whole transform codegens once the data is a frame.
  *  - the snapshot is [[Events.latestState]] (W1) + an overwrite — the
  *    deterministic, distributed equivalent of INSERT OR REPLACE.
  */
object Backfill {

  /** CRM lead row as fetched from the API (FIXTURES.md B2, abridged). */
  final case class RawLead(id: Long, title: String, status: String, step: String,
      amount: Option[Double], created_at: String, updated_at: String,
      tags: Seq[String], starred: Option[Boolean], user_email: String)

  /** S1: offset-paged extraction, stop on first empty page
    * (Lead_Ingestion_CRM_SQLite.py:44-66). `fetchPage(offset)` abstracts
    * the HTTP GET; pages accumulate into one Dataset. */
  def paginatedFetch[T <: Product : TypeTag](spark: SparkSession,
      fetchPage: Int => Seq[T], pageSize: Int = 100, maxPages: Int = 10000): Dataset[T] = {
    import spark.implicits._
    val rows = Iterator.from(0)
      .map(p => fetchPage(p * pageSize))
      .takeWhile(_.nonEmpty)
      .take(maxPages)
      .flatten.toSeq
    spark.createDataset(rows)
  }

  /** F1/F2/F4/F5 normalization of the raw API shape — all Column
    * expressions, no per-row code. */
  def normalize(raw: DataFrame, businessTz: String = "America/Mexico_City"): DataFrame =
    raw
      .withColumn("created_at_utc", Normalize.parseTsLenient(col("created_at")))
      .withColumn("updated_at_utc", Normalize.parseTsLenient(col("updated_at")))
      .withColumn("created_at_local",
        Normalize.formatTs(Normalize.toBusinessTz(col("created_at_utc"), businessTz)))
      .withColumn("tags_csv", Normalize.tagsToCsv(col("tags")))
      .withColumn("starred_int", Normalize.boolToInt(col("starred")))
      .drop("created_at", "updated_at", "tags", "starred")

  /** S7: last-wins snapshot keyed by lead id — newest `updated_at_utc`
    * wins, deterministic tiebreak on id. */
  def snapshot(normalized: DataFrame): DataFrame =
    Events.latestState(normalized, Seq("id"), col("updated_at_utc"), col("id"))
}
