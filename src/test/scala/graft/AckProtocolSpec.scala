package graft

import org.apache.spark.sql.functions._

import graft.ingest.Webhook

/** Pins [[Webhook.ackStatus]] to the reference endpoint's ack taxonomy
  * (webhook_app.py:153-182): 400 for a non-whitelisted account or a
  * non-JSON body, 200-ack for an unknown/missing event (logged, never
  * retried by the collector), 200 success for a handled event — and
  * asserts the 200 routes land in exactly the engine frames
  * ([[Webhook.rejected]] / [[Webhook.wellFormed]]) that the dead-letter
  * and bronze sinks consume. The reference's 500-on-exception leg is
  * epoch-level in the engine (failed foreachBatch retries the batch);
  * its safety is JdbcUpsertLiveSpec's replay case, not a row mapping.
  */
class AckProtocolSpec extends SparkSpec {
  import spark.implicits._

  private val allowed = Seq("midtown", "uptown")

  private def body(event: String): String =
    s"""{"webhook_event":{"id":1,"event":"$event","data":{"id":10,"title":"t"}}}"""

  private val posts = Seq(
    // (account, body, expected ack)
    ("ghost", body("lead.creation"), "invalid_account"),       // 400: not whitelisted
    (null.asInstanceOf[String], body("lead.creation"), "invalid_account"), // 400: missing account — a 200 here would stop redelivery of a row parsed() drops
    ("midtown", "plain text, not json", "invalid_content_type"), // 400: non-JSON
    ("midtown", """{"no_envelope": true}""", "success_unhandled"), // 200: JSON, event missing
    ("midtown", body("lead.telepathy"), "success_unhandled"),  // 200: unknown event, acked
    ("midtown", body("lead.creation"), "success"),             // 200: handled
    ("uptown", body("lead.deleted"), "success")                // 200: handled
  ).toDF("account", "body", "expected")
    .withColumn("received_at", current_timestamp())

  test("ack taxonomy matches webhook_app.py:153-182 on all four routes") {
    val acked = Webhook.ackStatus(posts, allowed)
      .select("account", "ack", "http_status", "expected")
      .collect()
    acked.foreach { r =>
      assert(r.getString(1) == r.getString(3),
        s"account=${r.getString(0)}: ack=${r.getString(1)} expected=${r.getString(3)}")
      val wantStatus = if (r.getString(3).startsWith("invalid")) 400 else 200
      assert(r.getInt(2) == wantStatus)
    }
  }

  test("200-ack routes are exactly the engine's dead-letter/bronze split") {
    val acked = Webhook.ackStatus(posts, allowed).cache()
    val parsed = Webhook.parsed(posts, allowed)
    // every acked-success row is in wellFormed; every acked-unhandled
    // WHITELISTED row is in rejected (the dead-letter frame) — the
    // reference acks them so the collector stops, the engine keeps them
    val nSuccess = acked.filter(col("ack") === "success").count()
    val nUnhandledListed = acked
      .filter(col("ack") === "success_unhandled" && col("account").isin(allowed: _*))
      .count()
    // the dead-letter frame additionally keeps whitelisted non-JSON
    // bodies: the reference 400s those and DROPS them — the engine
    // 400s them too but archives the row (malformed-never-lost)
    val nBadJsonListed = acked
      .filter(col("ack") === "invalid_content_type" && col("account").isin(allowed: _*))
      .count()
    assert(Webhook.wellFormed(parsed).count() == nSuccess)
    assert(Webhook.rejected(parsed).count() == nUnhandledListed + nBadJsonListed)
    // 400s never reach the parsed frame at all
    val n400 = acked.filter(col("http_status") === 400).count()
    assert(n400 == 3) // ghost account, NULL account, non-JSON body
    assert(parsed.count() == posts.count() - 2) // both account 400s are pre-filtered
    acked.unpersist()
  }
}
