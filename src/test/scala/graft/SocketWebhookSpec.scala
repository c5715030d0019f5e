package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._

import graft.ingest.Webhook

/** The push-endpoint path END-TO-END over a real network socket: a
  * local TCP server plays the HTTP collector (reference:
  * webhook_app.py:152-182 receives POSTs and enqueues them), Spark's
  * `socket` source consumes the byte stream, and the E2 chain
  * ([[Webhook.parsed]] → dispatch) runs inside the micro-batch engine.
  * Round 7's gap: every streaming spec fed MemoryStream — no test
  * proved the wiring outside an in-process source. Fixture lines reuse
  * the B1 golden payloads so the dispatch expectations stay pinned.
  */
class SocketWebhookSpec extends SparkSpec {

  test("socket-fed webhook posts dispatch through parsed/wellFormed/rejected") {
    val goodLead =
      """{"webhook_event": {"id": 2001, "event": "lead.creation", "signature": "s1", "has_succeeded": true, "try_count": 1, "last_returned_code": 200, "data": {"id": 601, "title": "Socket Casa", "status": "open", "step": "Ingresados", "step_id": 3, "pipeline": "Ventas", "amount": 100.0, "created_at": "2025-09-11T14:03:22", "user": {"email": "a@office.com"}, "client_folder": {"id": 7, "name": "Cli"}}}}"""
    val goodDeleted =
      """{"webhook_event": {"id": 2002, "event": "lead.deleted", "signature": "s2", "has_succeeded": true, "try_count": 1, "last_returned_code": 200, "data": {"id": 602}}}"""
    val unknownEvent =
      """{"webhook_event": {"id": 2003, "event": "mystery.event", "signature": "s3", "has_succeeded": true, "try_count": 1, "last_returned_code": 200, "data": {"id": 603}}}"""
    val malformed = """this is not json {{{"""
    val lines = Seq(goodLead, goodDeleted, unknownEvent, malformed)

    val server = new ServerSocket(0)
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val w = new PrintWriter(sock.getOutputStream, true)
        lines.foreach(w.println)
        w.flush()
        Thread.sleep(120000) // keep the connection open until interrupted
      } catch { case _: InterruptedException => () }
    })
    feeder.setDaemon(true)
    feeder.start()

    val posts = spark.readStream
      .format("socket")
      .option("host", "localhost")
      .option("port", server.getLocalPort)
      .load()
      .select(lit("office_a").as("account"), col("value").as("body"),
        to_timestamp(lit("2025-09-30 12:00:00")).as("received_at"))
    val parsed = Webhook.parsed(posts, Seq("office_a"))
    val q = parsed.writeStream
      .format("memory").queryName("socket_webhook").outputMode("append")
      .start()
    try {
      // the socket feeder races the first micro-batch: poll until all
      // four lines have landed (bounded — the suite must never hang)
      val deadline = System.currentTimeMillis() + 60000
      def landed() = spark.table("socket_webhook").count()
      while (landed() < lines.size && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        if (landed() < lines.size) Thread.sleep(200)
      }
      assert(landed() === lines.size, "all socket lines must reach the sink")

      val arrived = spark.table("socket_webhook")
      assert(Webhook.wellFormed(arrived).count() === 2)
      val wf = Webhook.wellFormed(arrived)
        .select(col("env.event")).as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().sorted.toSeq
      assert(wf === Seq("lead.creation", "lead.deleted"))
      assert(Webhook.rejected(arrived).count() === 2) // unknown + malformed
      assert(Webhook.leadCreated(arrived)
        .select(col("lead_id")).head().getLong(0) === 601L)
    } finally {
      q.stop()
      feeder.interrupt()
      server.close()
    }
  }
}
