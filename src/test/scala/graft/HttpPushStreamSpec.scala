package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.ingest.Webhook
import graft.sources.http.HttpPushRegistry

/** [[graft.sources.http.HttpPushSource]] — the webhook path CONTINUOUS
  * and end-to-end real: live HTTP POSTs against the embedded listener,
  * micro-batches planned from the accepted-post offsets, the E2 parse/
  * gate/dispatch chain running INSIDE the stream, bronze + dead-letter
  * rows landing per batch, offsets advancing and the buffer trimming on
  * commit. The DSv2 twin of SocketWebhookSpec with the reference's
  * actual protocol. */
class HttpPushStreamSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, account: String, payload: String): Int =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/webhook/$account"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload)).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()

  private def body(event: String, id: Int): String =
    s"""{"webhook_event":{"id":$id,"event":"$event","data":{"id":${id * 10},"title":"t"}}}"""

  test("live HTTP posts stream through micro-batches into the dispatch chain") {
    val name = s"ingress-${java.util.UUID.randomUUID().toString.take(8)}"
    val posts = spark.readStream.format("graft-http-push")
      .option("name", name)
      .option("accounts", "midtown,uptown")
      .option("port", "0")
      .load()
    // the E2 chain inside the stream: parse -> well-formed envelope,
    // with the rejected side union-tagged so one sink sees both routes
    val parsed = Webhook.parsed(posts, Seq("midtown", "uptown"))
    val routed = Webhook.envelope(parsed)
      .select(lit("bronze").as("route"), col("id"), col("event"), col("office"))
      .unionByName(Webhook.rejected(parsed)
        .select(lit("dlq").as("route"), lit(null).cast("long").as("id"),
          col("env.event").as("event"), col("account").as("office")))
    val q = routed.writeStream.format("memory").queryName("http_push_out")
      .outputMode("append").start()
    try {
      // the listener comes up when the engine first asks for offsets —
      // poll briefly so the POSTs never race query startup
      val deadline = System.nanoTime() + 10e9.toLong
      def tryPort(): Option[Int] =
        try Some(HttpPushRegistry.boundPort(name))
        catch {
          case _: IllegalArgumentException if System.nanoTime() < deadline =>
            Thread.sleep(50); tryPort()
        }
      val port = tryPort().get
      assert(post(port, "midtown", body("lead.creation", 1)) == 200)
      assert(post(port, "uptown", body("lead.deleted", 2)) == 200)
      assert(post(port, "ghost", body("lead.creation", 3)) == 400)   // dropped entirely
      assert(post(port, "midtown", body("lead.telepathy", 4)) == 200) // -> dlq
      q.processAllAvailable()
      val afterB1 = spark.table("http_push_out").collect()
      assert(afterB1.length == 3, s"batch 1 must carry the 3 whitelisted posts: ${afterB1.toSeq}")

      // second round: offsets advance, earlier rows are not re-delivered
      assert(post(port, "midtown", body("lead.step.changed", 5)) == 200)
      assert(post(port, "midtown", "not json at all") == 400)         // retained -> dlq
      q.processAllAvailable()
      val all = spark.table("http_push_out")
        .select("route", "id", "event", "office")
        .as[(String, Option[Long], Option[String], String)].collect().toSeq
      assert(all.length == 5, s"got $all")
      val bronze = all.filter(_._1 == "bronze")
      assert(bronze.map(t => (t._2.get, t._3.get, t._4)).toSet ==
        Set((1L, "lead.creation", "midtown"), (2L, "lead.deleted", "uptown"),
          (5L, "lead.step.changed", "midtown")))
      val dlq = all.filter(_._1 == "dlq")
      assert(dlq.map(t => (t._3, t._4)).toSet ==
        Set((Some("lead.telepathy"), "midtown"), (None, "midtown")))
    } finally {
      q.stop()
      HttpPushRegistry.stop(name)
    }
  }

  test("checkpoint restart realigns offsets past the lost in-flight range (documented non-FT loss)") {
    val name = s"ingress-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = java.nio.file.Files.createTempDirectory("http_push_restart")
    val chk = dir.resolve("chk").toString
    val sink = dir.resolve("out").toString
    def run(posts: Seq[(String, String)]): Unit = {
      val df = spark.readStream.format("graft-http-push")
        .option("name", name).option("accounts", "midtown").option("port", "0")
        .load()
      val q = df.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append").start()
      try {
        val deadline = System.nanoTime() + 10e9.toLong
        def port(): Int =
          try HttpPushRegistry.boundPort(name)
          catch {
            case _: IllegalArgumentException if System.nanoTime() < deadline =>
              Thread.sleep(50); port()
          }
        val p = port()
        posts.foreach { case (acct, b) => post(p, acct, b) }
        q.processAllAvailable()
      } finally { q.stop(); HttpPushRegistry.stop(name) }
    }
    run(Seq("midtown" -> body("lead.creation", 1), "midtown" -> body("lead.creation", 2)))
    // second incarnation: fresh listener, checkpointed offsets replay
    // against an empty buffer — must NOT crash, and new posts flow
    run(Seq("midtown" -> body("lead.deleted", 3)))
    val out = spark.read.parquet(sink)
    val bodies = out.select("body").as[String].collect()
    assert(bodies.length >= 3, s"all acked posts of both incarnations land: ${bodies.toSeq}")
    assert(bodies.count(_.contains("lead.deleted")) == 1, "post-restart post must flow")
  }
}
