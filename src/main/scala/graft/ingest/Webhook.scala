package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.schema.Schemas

/** E2 streaming-ingest transform chain: webhook POST body → typed event
  * rows (SURVEY.md §3 E2; reference: webhook_app.py).
  *
  * Works identically on a batch DataFrame and inside a streaming
  * micro-batch — the input is just a frame with (`account`, `body`,
  * `received_at`) columns, the shape an HTTP collector (or file/Kafka
  * source) delivers.
  *
  * Operators covered: S4 schema gate (malformed → dead-letter, never
  * fail), S5 account whitelist, P1 per-type payload projection, P3
  * null-safe nested access, P4 client_folder/client fallback, F1
  * lenient event-time parse, F3 arrival timestamp, S10/F6 raw-payload
  * archive, P2 event-type dispatch.
  */
object Webhook {

  val knownEvents: Seq[String] = Seq(
    "lead.creation", "lead.step.changed", "lead.deleted", "client_folder.created")

  /** S4 + S5: parse the envelope permissively and gate on account
    * whitelist. Malformed JSON yields a NULL envelope (routed by
    * [[rejected]]), exactly the reference's 400-without-crash posture. */
  def parsed(posts: DataFrame, allowedAccounts: Seq[String]): DataFrame =
    posts
      .filter(col("account").isin(allowedAccounts: _*))
      .withColumn("env", from_json(col("body"), Schemas.bodySchema).getField("webhook_event"))

  /** S4/ST7 side output: unparseable bodies, missing event field, or
    * unknown event types. NULL-safe: a parseable envelope whose `event`
    * is NULL (body missing the field) must land here, not vanish —
    * `isin` on a NULL yields NULL which a bare filter would drop from
    * BOTH sides. `coalesce(..., false)` makes the two predicates exact
    * complements, preserving the malformed-never-lost posture. */
  def rejected(parsedDf: DataFrame): DataFrame =
    parsedDf.filter(col("env").isNull ||
      !coalesce(col("env.event").isin(knownEvents: _*), lit(false)))

  /** Exact complement of [[rejected]]: parseable envelope, known
    * (non-NULL) event type. */
  def wellFormed(parsedDf: DataFrame): DataFrame =
    parsedDf.filter(col("env").isNotNull &&
      coalesce(col("env.event").isin(knownEvents: _*), lit(false)))

  /** Envelope table of the well-formed rows — the common columns every
    * per-type projection carries plus the raw archive. This is what ST1
    * lands in the bronze sink before type dispatch; the four
    * projections below re-derive from it (or from the parsed frame
    * directly) without another JSON parse of `raw_data` being needed
    * until a schema change forces reprocessing. */
  def envelope(parsedDf: DataFrame): DataFrame =
    wellFormed(parsedDf).select(envelopeCols: _*)

  /** Common envelope columns every event table carries (README.md:73-80)
    * plus the S10 raw archive of the full body. */
  private def envelopeCols: Seq[Column] = Seq(
    col("env.id").as("id"),
    col("env.event").as("event"),
    col("env.signature").as("signature"),
    col("env.has_succeeded").as("has_succeeded"),
    col("env.try_count").as("try_count"),
    col("env.last_returned_code").as("last_returned_code"),
    col("received_at"),
    col("account").as("office"),
    col("body").as("raw_data"))

  /** P4: `client_folder` wins over `client`; absent both ⇒ NULL
    * (webhook_app.py:23-32). */
  private def clientField(sub: String): Column =
    coalesce(col(s"env.data.client_folder.$sub"), col(s"env.data.client.$sub"))

  /** P1/P2: one filtered projection per event type. The four tables of
    * the reference collapse into functions over one parsed frame; a
    * caller materializes whichever it sinks. */
  def leadCreated(parsedDf: DataFrame): DataFrame =
    parsedDf.filter(col("env.event") === "lead.creation")
      .select(envelopeCols ++ Seq(
        col("env.data.id").as("lead_id"),
        col("env.data.title").as("title"),
        col("env.data.status").as("status"),
        col("env.data.step").as("step"),
        col("env.data.pipeline").as("pipeline"),
        col("env.data.amount").as("amount"),
        Normalize.parseTsLenient(col("env.data.created_at")).as("created_at_utc"),
        col("env.data.user.email").as("user_email"),
        clientField("id").as("client_folder_id"),
        clientField("name").as("client_folder_name")): _*)

  def stepChanged(parsedDf: DataFrame): DataFrame =
    parsedDf.filter(col("env.event") === "lead.step.changed")
      .select(envelopeCols ++ Seq(
        col("env.data.id").as("lead_id"),
        col("env.data.step").as("step"),
        col("env.data.step_id").as("step_id"),
        col("env.data.status").as("status"),
        col("env.data.amount").as("amount"),
        Normalize.parseTsLenient(col("env.data.updated_at")).as("updated_at_utc"),
        col("env.data.user.email").as("user_email")): _*)

  def leadDeleted(parsedDf: DataFrame): DataFrame =
    parsedDf.filter(col("env.event") === "lead.deleted")
      .select(envelopeCols ++ Seq(
        col("env.data.id").as("lead_id"),
        col("env.data.title").as("title")): _*)

  def folderCreated(parsedDf: DataFrame): DataFrame =
    parsedDf.filter(col("env.event") === "client_folder.created")
      .select(envelopeCols ++ Seq(
        clientField("id").as("folder_id"),
        clientField("name").as("folder_name")): _*)

  /** Reference ack protocol (webhook_app.py:153-182), mapped onto the
    * engine's gate outcomes. The HTTP endpoint answers each POST with
    * exactly one of:
    *
    *   - 400 `invalid_account` — account not whitelisted
    *     (webhook_app.py:156-157); the engine twin is the rows
    *     [[parsed]]'s whitelist filter drops.
    *   - 400 `invalid_content_type` — body is not JSON
    *     (webhook_app.py:158-159; the endpoint tests the content-type
    *     header, the batch analog is body-parses-as-JSON).
    *   - 200 `success_unhandled` — valid JSON whose event is missing
    *     or unknown (webhook_app.py:173-174): the reference ACKS these
    *     (so the collector never retries them) and only logs; the
    *     engine twin routes them to [[rejected]]/dead-letter instead
    *     of losing them.
    *   - 200 `success` — a handled event type (webhook_app.py:176).
    *
    * The remaining reference status — 500 on processing exception
    * (webhook_app.py:177-182), which makes the collector REDELIVER —
    * has no per-row batch mapping by design: its engine twin is a
    * failed foreachBatch epoch, whose retry redelivers the whole
    * micro-batch, and the `ON CONFLICT DO NOTHING` upsert sink makes
    * that redelivery a no-op (see [[graft.streaming.JdbcUpsertSink]]
    * and JdbcUpsertLiveSpec's replay case).
    *
    * Input is the RAW post frame (`account`, `body`, `received_at`) —
    * the whitelist decision must see the rows [[parsed]] would drop.
    * Output adds `http_status` (int) and `ack` (string) per row;
    * AckProtocolSpec pins the routes to [[rejected]]/[[wellFormed]].
    */
  /** Ack-honoring dispatch of an HTTP-collected batch (the
    * [[HttpIngress.drainBatch]] frame, which carries the `http_status`
    * each post was actually acked with): returns `(bronze, deadLetter)`
    * where bronze is the well-formed envelope of 200-ACKED posts only
    * and the dead letter keeps every rejected OR 400-acked post.
    *
    * The invariant this exists for: a 400-acked post is never
    * dispatched to bronze, even when its BODY parses — e.g. valid JSON
    * sent with a `text/plain` Content-Type is 400-acked (Flask
    * `request.is_json`) although body-only parsing succeeds. The
    * sender treats the 400 as undelivered and redelivers; without this
    * routing the redelivery would land the same event in bronze twice
    * (the reference's guard is Postgres `ON CONFLICT (id) DO NOTHING`,
    * webhook_app.py:41-49 — the parquet bronze sink has no id-keyed
    * upsert, so the split must happen at routing time).
    *
    * The dead-letter side is a superset union, not a partition: a post
    * can be both 400-acked and body-rejected (plain-text body) — it
    * lands once, the predicates being OR-ed on one frame. */
  def dispatchAcked(batch: DataFrame, allowedAccounts: Seq[String]): (DataFrame, DataFrame) = {
    val p = parsed(batch, allowedAccounts)
    val acked200 = col("http_status") === 200
    val bronze = envelope(p.filter(acked200))
    val dead = p.filter(!acked200 || col("env").isNull ||
        !coalesce(col("env.event").isin(knownEvents: _*), lit(false)))
      .select(col("account"), col("body"), col("received_at"), col("http_status"))
    (bronze, dead)
  }

  def ackStatus(posts: DataFrame, allowedAccounts: Seq[String]): DataFrame = {
    val env = from_json(col("body"), Schemas.bodySchema).getField("webhook_event")
    val isJson = try_parse_json(col("body")).isNotNull
    val knownEvent =
      coalesce(env.getField("event").isin(knownEvents: _*), lit(false))
    // NULL account must route to invalid_account, not fall through to a
    // success ack: `NULL isin(...)` is NULL, which `when` skips, and
    // [[parsed]] drops the row — a 200 ack would stop the collector's
    // redelivery of an event the engine never stored.
    val accountOk = coalesce(col("account").isin(allowedAccounts: _*), lit(false))
    val ack = when(!accountOk, lit("invalid_account"))
      .when(!isJson, lit("invalid_content_type"))
      .when(!knownEvent, lit("success_unhandled"))
      .otherwise(lit("success"))
    posts
      .withColumn("ack", ack)
      .withColumn("http_status",
        when(col("ack").startsWith("invalid"), lit(400)).otherwise(lit(200)))
  }
}
