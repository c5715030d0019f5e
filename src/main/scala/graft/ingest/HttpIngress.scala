package graft.ingest

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real HTTP webhook ingress — the literal counterpart of the
  * reference's Flask entry point (`POST /webhook/<account>`,
  * webhook_app.py:152-182), closing the one reference line a user hits
  * that previously had no HTTP listener here. Built on the JDK's
  * `com.sun.net.httpserver` (no new dependencies); the Spark side is
  * unchanged — this endpoint only COLLECTS `(account, body,
  * received_at)` posts, and everything after the ack (schema gate,
  * whitelist, dispatch, bronze/dead-letter sinks) is the existing
  * [[Webhook]] chain over the drained frame, exactly as the socket and
  * file collectors feed it.
  *
  * Ack taxonomy (HttpIngressSpec pins route-for-route equality with the
  * Spark-side [[Webhook.ackStatus]] on the same posts):
  *   - unknown account            → 400 `{"error": "Invalid account"}`
  *   - non-JSON content/body      → 400 `{"error": "Invalid content type"}`
  *   - parseable, unknown event   → 200 success (logged unhandled, like
  *     the reference's `[UNHANDLED EVENT]` print)
  *   - known event                → 200 `{"status":"success",...}`
  *   - handler failure            → 500 `{"status":"error",...}`
  *   - non-POST method            → 405 (Flask's method guard)
  *   - queue at `maxQueued`       → 503 shed-load (beyond the
  *     reference: its Flask tier has Postgres as implicit
  *     backpressure; an in-memory collector must bound itself and
  *     lean on sender redelivery instead)
  *
  * One DOCUMENTED delta vs the reference: a whitelisted post acked 400
  * (invalid JSON body, or a non-JSON/missing Content-Type) is retained
  * for the dead-letter sink (the repo's S4/S10 "malformed never lost"
  * posture); the reference discards it after the 400. Retention follows
  * the ack: a 400-acked post carries `http_status = 400` in the drained
  * frame and [[Webhook.dispatchAcked]] routes it to the dead letter
  * ONLY, never bronze — the sender treats a 400 as undelivered and
  * redelivers, so a bronze landing would double the event (the
  * reference's guard is Postgres `ON CONFLICT (id) DO NOTHING`,
  * webhook_app.py:41-49). Unknown accounts are dropped entirely on
  * both sides — a 200 never acks an event the engine will not store.
  *
  * Scale posture: this is the single-node collector tier, not a Spark
  * operator — at production scale N stateless replicas of this listener
  * sit behind a load balancer and land posts on a durable queue/log;
  * the engine consumes that log (the [[graft.streaming.StreamIngest]]
  * path). The in-memory queue here IS the test harness's stand-in for
  * that log, drained per micro-batch.
  */
final class HttpIngress(allowedAccounts: Seq[String], port: Int = 0,
    maxQueued: Int = 100000,
    journal: Option[HttpIngress.Post => Unit] = None) {
  import HttpIngress.Post

  private val allowed = allowedAccounts.toSet
  // bounded: a listener nobody drains must not grow without limit.
  // At capacity the endpoint sheds load with 503 (no silent drop, no
  // OOM): the collector tells the sender to retry, which is the
  // correct durable-webhook contract (senders redeliver on non-2xx).
  private val queue = new ConcurrentLinkedQueue[Post]()
  private val queued = new java.util.concurrent.atomic.AtomicInteger(0)
  private val mapper = new ObjectMapper()
  private val pool = Executors.newFixedThreadPool(4)
  private val server = com.sun.net.httpserver.HttpServer
    .create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(pool)

  server.createContext("/webhook", (exchange: com.sun.net.httpserver.HttpExchange) =>
    try {
      if (exchange.getRequestMethod != "POST") {
        respond(exchange, 405, """{"error": "Method not allowed"}""")
      } else {
        // path = /webhook/<account>; anything else is an invalid account
        val segs = exchange.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        val account = if (segs.length == 2) segs(1) else null
        val body = new String(
          exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val contentType = Option(
          exchange.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        if (account == null || !allowed.contains(account)) {
          respond(exchange, 400, """{"error": "Invalid account"}""")
        } else if (queued.incrementAndGet() > maxQueued) {
          // shed load BEFORE the ack decision: a 200 must imply the
          // post is retained for the engine. Reserve-then-check keeps
          // the bound exact under concurrent handler threads (a plain
          // get() pre-check lets the pool overshoot the cap).
          queued.decrementAndGet()
          respond(exchange, 503, """{"error": "Overloaded, retry later"}""")
        } else {
          // whitelisted: the post is RETAINED whatever the ack (the
          // dead-letter split downstream keeps the forensic record),
          // and it carries ITS ack so downstream routing can honor it —
          // a 400-acked post will be redelivered by the sender, so it
          // must never dispatch to bronze (the slot was reserved by the
          // capacity check above). The journal write happens BEFORE the
          // ack goes out: in durable (WAL) mode an acked post survives
          // a crash, and a journal failure falls through to the 500
          // catch-all so the sender redelivers.
          val eventOpt = parseEvent(contentType, body)
          val status = if (eventOpt.isEmpty) 400 else 200
          val p = Post(account, body,
            java.sql.Timestamp.from(java.time.Instant.now()), status)
          try retain(p) catch {
            case e: Exception => queued.decrementAndGet(); throw e
          }
          eventOpt match {
            case None =>
              respond(exchange, 400, """{"error": "Invalid content type"}""")
            case Some(event) =>
              if (event == null || !Webhook.knownEvents.contains(event))
                // the reference prints [UNHANDLED EVENT] and still 200s
                System.err.println(
                  s"[${account.toUpperCase}][UNHANDLED EVENT] $event")
              respond(exchange, 200, mapper.writeValueAsString(
                java.util.Map.of("status", "success", "account", account,
                  "event", if (event == null) "" else event)))
          }
        }
      }
    } catch {
      case e: Exception => // the reference's catch-all 500
        respond(exchange, 500, mapper.writeValueAsString(
          java.util.Map.of("status", "error",
            "message", Option(e.getMessage).getOrElse(e.getClass.getName))))
    })

  /** Single retention point: queue the post, journaling first when a
    * journal is configured. The lock makes journal order and queue
    * order agree under concurrent handler threads — on WAL replay the
    * recovered sequence must match the order posts were delivered. */
  private val retainLock = new Object
  private def retain(p: Post): Unit = journal match {
    case Some(j) => retainLock.synchronized { j(p); queue.add(p) }
    case None => queue.add(p); ()
  }

  /** Flask `request.is_json` + `get_json()` in one step: a JSON content
    * type AND a parseable body. A MISSING Content-Type header is a 400
    * too — Flask's `request.is_json` is False with no header, so the
    * reference rejects a header-less POST (webhook_app.py:158-159) and
    * so does this endpoint. None = the 400 "Invalid content type"
    * route; Some(event) may hold null when `webhook_event.event` is
    * absent — the 200 success_unhandled route, mirroring from_json's
    * NULL field. */
  private def parseEvent(contentType: String, body: String): Option[String] = {
    if (!contentType.toLowerCase.contains("json")) None
    else
      try {
        val root = mapper.readTree(body)
        if (root == null || !root.isContainerNode) None
        else {
          val ev = root.path("webhook_event").path("event")
          Some(if (ev.isTextual) ev.asText() else null)
        }
      } catch { case _: Exception => None }
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os: OutputStream = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  def start(): Unit = server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Drain every post collected so far (oldest first). Draining is
    * destructive — each post belongs to exactly one micro-batch, the
    * same once-per-batch contract the durable-log consumer has. */
  def drainPosts(): Seq[Post] = {
    val buf = Seq.newBuilder[Post]
    var p = queue.poll()
    while (p != null) { buf += p; queued.decrementAndGet(); p = queue.poll() }
    buf.result()
  }

  /** Drained posts as the `(account, body, received_at, http_status)`
    * frame the [[Webhook]] chain consumes — `http_status` is the ack
    * each post actually received, so [[Webhook.dispatchAcked]] can keep
    * 400-acked (to-be-redelivered) posts out of bronze. */
  def drainBatch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    drainPosts().map(p => (p.account, p.body, p.received_at, p.http_status))
      .toDF("account", "body", "received_at", "http_status")
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdown()
    pool.awaitTermination(5, TimeUnit.SECONDS)
    ()
  }
}

object HttpIngress {
  /** One collected post — the row shape [[Webhook.parsed]] eats, plus
    * the ack the sender actually saw (400-acked posts are retained for
    * forensics but must never dispatch to bronze: the sender redelivers
    * them). */
  final case class Post(account: String, body: String,
      received_at: java.sql.Timestamp, http_status: Int)
}
