package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.{Events, Webhook}

/** Golden end-to-end: the FIXTURES.md B1 webhook payload file through
  * the full E2 chain — parse, gate, dispatch, project, dedup — with
  * checked-in expectations (SURVEY.md §5.5). */
class WebhookSpec extends SparkSpec {
  import spark.implicits._

  private lazy val posts: DataFrame = {
    val path = getClass.getResource("/webhook_events.jsonl").getPath
    spark.read.text(path)
      .select(
        lit("office_a").as("account"),
        col("value").as("body"),
        to_timestamp(lit("2025-09-30 12:00:00")).as("received_at"))
  }

  private lazy val parsed = Webhook.parsed(posts, Seq("office_a", "office_b"))

  test("S5: non-whitelisted account is dropped entirely") {
    val other = posts.withColumn("account", lit("office_evil"))
    assert(Webhook.parsed(other, Seq("office_a")).count() === 0)
  }

  test("S4/ST7: non-JSON body and unknown event route to rejected") {
    val rej = Webhook.rejected(parsed)
    assert(rej.count() === 2) // "mystery.event" + the non-JSON line
    assert(rej.filter(col("env").isNull).count() === 1)
    assert(rej.filter(col("env.event") === "mystery.event").count() === 1)
  }

  test("S4: envelope with missing event field routes to rejected, never lost") {
    // parseable JSON whose webhook_event lacks `event`: isin(NULL) is
    // NULL, which a naive filter drops from BOTH sides — the row must
    // land in rejected (malformed-never-lost posture).
    val noEvent = Seq(("office_a", """{"webhook_event": {"id": 9999, "signature": "s"}}"""))
      .toDF("account", "body")
      .withColumn("received_at", to_timestamp(lit("2025-09-30 12:00:00")))
    val p = Webhook.parsed(noEvent, Seq("office_a"))
    assert(Webhook.rejected(p).count() === 1, "null-event row must be dead-lettered")
    assert(Webhook.wellFormed(p).count() === 0)
  }

  test("S4: rejected and wellFormed partition the parsed frame exactly") {
    assert(Webhook.rejected(parsed).count() + Webhook.wellFormed(parsed).count()
      === parsed.count())
  }

  test("P1/P3/P4/F1: lead_created projection — nested nulls, client fallback, date formats") {
    val lc = Webhook.leadCreated(parsed).orderBy("id").collect()
    assert(lc.length === 2)
    val casa = lc(0)
    assert(casa.getAs[String]("title") === "Casa Lomas")
    assert(casa.getAs[java.math.BigDecimal]("amount").doubleValue() === 2350000.0)
    assert(casa.getAs[Long]("client_folder_id") === 88L) // client_folder wins
    assert(casa.getAs[java.sql.Timestamp]("created_at_utc").toString
      === "2025-09-11 14:03:22.0") // ISO datetime
    val depto = lc(1)
    assert(depto.isNullAt(depto.fieldIndex("amount")), "null amount survives")
    assert(depto.isNullAt(depto.fieldIndex("user_email")), "missing user => NULL, no error")
    assert(depto.getAs[Long]("client_folder_id") === 89L) // `client` fallback
    assert(depto.getAs[java.sql.Timestamp]("created_at_utc").toString
      === "2025-09-12 00:00:00.0") // bare date
  }

  test("S6/ST3: duplicate envelope id lands exactly once (first try wins)") {
    val sc = Events.dedupFirstWins(Webhook.stepChanged(parsed),
      Seq("id"), Seq(col("try_count").asc))
    assert(sc.count() === 2) // 1003 (deduped) + 1004
    assert(sc.filter(col("id") === 1003).head().getAs[Int]("try_count") === 2)
  }

  test("F1: junk updated_at parses to NULL, row is kept") {
    val firmado = Webhook.stepChanged(parsed).filter(col("id") === 1004).head()
    assert(firmado.isNullAt(firmado.fieldIndex("updated_at_utc")))
    assert(firmado.getAs[String]("step") === "Firmados")
  }

  test("J4: active leads = created minus deleted") {
    val created = Webhook.leadCreated(parsed).select(col("lead_id"))
    val deleted = Webhook.leadDeleted(parsed).select(col("lead_id"))
    val active = Events.activeSet(created, deleted, "lead_id").as[Long].collect()
    assert(active.toSeq === Seq(501L)) // 502 was deleted
  }

  test("S10: raw body survives verbatim for reprocessing") {
    val raw = Webhook.leadCreated(parsed).filter(col("lead_id") === 501)
      .head().getAs[String]("raw_data")
    assert(raw.contains("\"id\": 1001") && raw.contains("Casa Lomas"))
  }

  test("E3 golden: funnel over the event log matches hand-computed KPIs") {
    val steps = Webhook.stepChanged(parsed)
    val latest = Events.latestState(
      Events.dedupFirstWins(steps, Seq("id"), Seq(col("try_count").asc)),
      Seq("lead_id"), col("step_id").cast("long"), col("id"))
    // lead 501's latest state is Firmados (step_id 7)
    assert(latest.head().getAs[String]("step") === "Firmados")
  }
}
