package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the CRM webhook surface (SURVEY.md §1.2).
  *
  * Schema-on-read over dynamic JSON, made explicit: `from_json` with
  * these StructTypes reproduces the reference's `.get()`-with-default
  * behavior — any missing object or field is NULL, never an error
  * (webhook_app.py:54-61). Money is DECIMAL(18,2) (`numeric` in the
  * reference, README.md:84); event time parses leniently via
  * Normalize.parseTsLenient because payloads mix ISO datetimes and bare
  * dates (Lead_Ingestion_CRM_SQLite.py:20-38).
  */
object Schemas {

  /** `data.user` — only the email is projected (webhook_app.py:57). */
  val userSchema: StructType = StructType(Seq(
    StructField("email", StringType)))

  /** `data.client_folder` / `data.client` (webhook_app.py:23-32). */
  val clientFolderSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  /** Lead payload — union of the fields the four event-type projections
    * select (webhook_app.py:42-47,77-82,108-111,134-137). */
  val leadDataSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("status", StringType),
    StructField("step", StringType),
    StructField("step_id", IntegerType),
    StructField("pipeline", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("created_at", StringType),  // lenient-parsed downstream (F1)
    StructField("updated_at", StringType),
    StructField("permalink", StringType),
    StructField("user", userSchema),
    StructField("client_folder", clientFolderSchema),
    StructField("client", clientFolderSchema)))

  /** Webhook delivery envelope — at-least-once metadata
    * (README.md:73-80, webhook_app.py:42-46). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("event", StringType),
    StructField("signature", StringType),
    StructField("has_succeeded", BooleanType),
    StructField("try_count", IntegerType),
    StructField("last_returned_code", IntegerType),
    StructField("data", leadDataSchema)))

  /** Full POST body: `{"webhook_event": {...}}` (webhook_app.py:161-164). */
  val bodySchema: StructType = StructType(Seq(
    StructField("webhook_event", envelopeSchema)))
}
