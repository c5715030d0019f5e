package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.ingest.{HttpIngress, Webhook}

/** [[graft.ingest.HttpIngress]] end-to-end over REAL HTTP: the
  * reference's `POST /webhook/<account>` route (webhook_app.py:152-182)
  * served by the JDK HttpServer, driven with real POSTs, acked with the
  * reference's status codes, then the collected posts drained into the
  * engine and dispatched through the [[Webhook]] chain to bronze and
  * dead-letter parquet sinks — the full ingest path a reference user
  * exercises, with no simulated layer.
  */
class HttpIngressSpec extends SparkSpec {
  import spark.implicits._

  private val allowed = Seq("midtown", "uptown")

  private def body(event: String): String =
    s"""{"webhook_event":{"id":1,"event":"$event","data":{"id":10,"title":"t"}}}"""

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, payload: String,
      contentType: String = "application/json"): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", contentType)
        .POST(HttpRequest.BodyPublishers.ofString(payload)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("HTTP acks match the reference taxonomy and Webhook.ackStatus; drained posts dispatch to bronze/dead-letter") {
    val ingress = new HttpIngress(allowed)
    ingress.start()
    try {
      val port = ingress.boundPort

      // the AckProtocolSpec corpus, over the wire
      assert(post(port, "/webhook/ghost", body("lead.creation")).statusCode() == 400)
      assert(post(port, "/webhook", body("lead.creation")).statusCode() == 400) // no account segment
      assert(post(port, "/webhook/midtown", "plain text, not json").statusCode() == 400)
      assert(post(port, "/webhook/midtown", """{"no_envelope": true}""").statusCode() == 200)
      assert(post(port, "/webhook/midtown", body("lead.telepathy")).statusCode() == 200)
      val ok = post(port, "/webhook/midtown", body("lead.creation"))
      assert(ok.statusCode() == 200 && ok.body().contains("\"success\""))
      assert(post(port, "/webhook/uptown", body("lead.deleted")).statusCode() == 200)
      // Flask is_json: a JSON body declared as a non-JSON content type is 400
      assert(post(port, "/webhook/midtown", body("lead.creation"),
        contentType = "text/plain").statusCode() == 400)
      // Flask is_json is also False with NO Content-Type header at all:
      // a header-less POST is 400 on the reference and must be here too
      val noCt = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/webhook/midtown"))
          .POST(HttpRequest.BodyPublishers.ofString(body("lead.creation"))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(noCt.statusCode() == 400 && noCt.body().contains("content type"),
        s"header-less POST must 400 like Flask: ${noCt.statusCode()} ${noCt.body()}")
      // method guard
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/webhook/midtown"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)

      // collected = every WHITELISTED post (400-acked ones retained for
      // the dead letter; account 400s dropped entirely) — 7 of the 10,
      // each carrying the ack it actually received
      val batch = ingress.drainBatch(spark).cache()
      assert(batch.count() == 7)
      assert(batch.columns.contains("http_status"),
        "drained frame must carry each post's actual ack")
      assert(batch.filter(col("http_status") === 400).count() == 3,
        "plain-text body, text/plain CT, and header-less posts are the 400-acked retainees")
      assert(batch.select("account").distinct().as[String].collect().toSet
        == Set("midtown", "uptown"))

      // route-for-route equivalence with the Spark-side ack computation
      // on the very same frame (the text/plain and header-less posts
      // diverge BY DESIGN: ackStatus cannot see headers and their
      // bodies ARE valid JSON — which is exactly why dispatchAcked must
      // honor the transport-level ack, below)
      val acked = Webhook.ackStatus(batch, allowed)
      val counts = acked.groupBy("ack").count().as[(String, Long)].collect().toMap
      assert(counts == Map("invalid_content_type" -> 1L,
        "success_unhandled" -> 2L, "success" -> 4L))

      // dispatch: ack-honoring split — a 400-acked post never reaches
      // bronze even when its body parses (the sender saw a 400 and WILL
      // redeliver; bronze has no id-keyed upsert to absorb the copy)
      val (bronzeDf, dlqDf) = Webhook.dispatchAcked(batch, allowed)
      val bronzeDir = java.nio.file.Files.createTempDirectory("http_bronze").toString
      val dlqDir = java.nio.file.Files.createTempDirectory("http_dlq").toString
      bronzeDf.write.mode("overwrite").parquet(bronzeDir)
      dlqDf.write.mode("overwrite").parquet(dlqDir)
      val bronze = spark.read.parquet(bronzeDir)
      val dlq = spark.read.parquet(dlqDir)
      // ONLY the 200-acked well-formed posts: lead.creation + lead.deleted
      // (the text/plain and header-less lead.creation posts were 400-acked)
      assert(bronze.count() == 2)
      assert(bronze.select("event").as[String].collect().sorted.toSeq
        == Seq("lead.creation", "lead.deleted"))
      // dead letter: plain-text body, no_envelope, unknown event, AND the
      // two 400-acked parseable posts (retained for forensics, never bronze)
      assert(dlq.count() == 5)
      assert(dlq.filter(col("body") === "plain text, not json").count() == 1)
      assert(dlq.filter(col("http_status") === 400).count() == 3)
      batch.unpersist()

      // a second drain is empty — each post belongs to one micro-batch
      assert(ingress.drainPosts().isEmpty)
    } finally ingress.stop()
  }

  test("queue at capacity sheds load with 503 and recovers after a drain") {
    val ingress = new HttpIngress(allowed, maxQueued = 2)
    ingress.start()
    try {
      val port = ingress.boundPort
      assert(post(port, "/webhook/midtown", body("lead.creation")).statusCode() == 200)
      assert(post(port, "/webhook/midtown", body("lead.creation")).statusCode() == 200)
      val shed = post(port, "/webhook/midtown", body("lead.creation"))
      assert(shed.statusCode() == 503 && shed.body().contains("Overloaded"))
      // account 400s don't consume capacity and still 400 (not 503)
      assert(post(port, "/webhook/ghost", body("lead.creation")).statusCode() == 400)
      assert(ingress.drainPosts().size == 2) // the shed post was NOT retained
      assert(post(port, "/webhook/midtown", body("lead.creation")).statusCode() == 200)
      assert(ingress.drainPosts().size == 1)
    } finally ingress.stop()
  }
}
