package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.http.{HttpPushRegistry, PushWal}

/** Durable mode for the `graft-http-push` source: with the `wal` option
  * every accepted post is fsync'd to [[PushWal]] BEFORE its 200 ack, so
  * a checkpoint restart replays acked-but-unprocessed posts instead of
  * losing them — the reference's commit-to-Postgres-then-respond
  * durability (webhook_app.py:41-49). The WAL-less twin of this spec
  * (HttpPushStreamSpec's restart case) pins the documented loss window;
  * this one pins ZERO lost acked posts. */
class HttpPushWalSpec extends SparkSpec {
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

  test("WAL restart loses no acked post: acked-but-unprocessed rows replay after restart") {
    val name = s"ingress-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = Files.createTempDirectory("http_push_wal")
    val chk = dir.resolve("chk").toString
    val sink = dir.resolve("out").toString
    val wal = dir.resolve("wal").toString

    // one incarnation: posts `processed` and drains them through the
    // engine, then posts `ackedOnly` (acked + journaled, NEVER given a
    // micro-batch before the stop — the exact window the WAL-less
    // source documents as lost)
    def run(processed: Seq[String], ackedOnly: Seq[String]): Unit = {
      val df = spark.readStream.format("graft-http-push")
        .option("name", name).option("accounts", "midtown").option("port", "0")
        .option("wal", wal)
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
        processed.foreach(b => assert(post(p, "midtown", b) == 200))
        q.processAllAvailable()
        ackedOnly.foreach(b => assert(post(p, "midtown", b) == 200))
      } finally { q.stop(); HttpPushRegistry.stop(name) }
    }

    run(Seq(body("lead.creation", 1), body("lead.creation", 2)),
      Seq(body("lead.deleted", 3)))
    // restart: post 3 was acked into the WAL only — it must come out
    // here, exactly once, alongside the new post
    run(Seq(body("lead.step.changed", 4)), Seq.empty)

    val out = spark.read.parquet(sink).select("body").as[String].collect().toSeq
    assert(out.size == 4, s"all four acked posts land exactly once: $out")
    (1 to 4).foreach { id =>
      assert(out.count(_.contains(s""""id":$id,""")) == 1,
        s"post $id must land exactly once across the restart: $out")
    }
  }

  test("PushWal drops a torn tail record and compacts once fully committed") {
    val dir = Files.createTempDirectory("pushwal_unit")
    val w1 = new PushWal(dir)
    def p(id: Int) = graft.ingest.HttpIngress.Post("midtown", s"""{"id":$id}""",
      new java.sql.Timestamp(1700000000000L + id), 200)
    w1.append(p(0)); w1.append(p(1)); w1.append(p(2))
    w1.commitFloor(1) // post 0 committed; 1 and 2 still in flight
    w1.close()
    // torn append: a crash mid-write leaves a record with no newline —
    // its ack never went out, so replay must drop it
    Files.write(dir.resolve("posts.log"),
      "dG9ybg\ttorn-partial-record".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)

    val w2 = new PushWal(dir)
    assert(w2.recoveredBase == 1L)
    assert(w2.recoveredPosts.map(_._2) == Seq("""{"id":1}""", """{"id":2}"""),
      s"uncommitted complete records replay, torn tail dropped: ${w2.recoveredPosts}")
    // committing everything compacts the log to zero bytes while the
    // absolute numbering survives in the sidecar
    w2.commitFloor(3)
    assert(Files.size(dir.resolve("posts.log")) == 0L, "fully-committed log compacts")
    w2.append(p(9))
    w2.close()
    val w3 = new PushWal(dir)
    assert(w3.recoveredBase == 3L && w3.recoveredPosts.map(_._2) == Seq("""{"id":9}"""),
      s"post-compaction appends keep absolute sequence: ${w3.recoveredBase} ${w3.recoveredPosts}")
    w3.close()
  }

  test("PushWal physically truncates a torn tail so post-recovery appends never fuse with it") {
    // the append channel opens in APPEND mode: if replay only dropped
    // the torn bytes logically, the next append would fuse with them
    // into one malformed interior line and the FOLLOWING restart's
    // strict corruption check would permanently refuse the WAL.
    val dir = Files.createTempDirectory("pushwal_torn_append")
    def p(id: Int) = graft.ingest.HttpIngress.Post("midtown", s"""{"id":$id}""",
      new java.sql.Timestamp(1700000000000L + id), 200)
    val w1 = new PushWal(dir)
    w1.append(p(0)); w1.append(p(1))
    w1.close()
    Files.write(dir.resolve("posts.log"),
      "dG9ybg\ttorn-partial".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    val w2 = new PushWal(dir) // replay truncates the torn bytes
    w2.append(p(2)) // lands directly after record 1, NOT after the torn bytes
    w2.close()
    val w3 = new PushWal(dir) // the formerly-fatal second restart
    assert(w3.recoveredPosts.map(_._2) ==
      Seq("""{"id":0}""", """{"id":1}""", """{"id":2}"""),
      s"clean replay after torn-tail + append: ${w3.recoveredPosts}")
    w3.close()
  }

  test("PushWal torn tail with non-ASCII bytes never truncates into an acked record") {
    // replay finds the last record terminator by scanning RAW BYTES: a
    // char index from the UTF-8 decode only equals the byte offset while
    // every byte is ASCII, and a torn tail carrying multi-byte or
    // invalid-UTF-8 garbage would shift the decode — the truncate could
    // then cut INTO the last complete acked record, losing durable data.
    val dir = Files.createTempDirectory("pushwal_nonascii")
    def p(id: Int) = graft.ingest.HttpIngress.Post("midtown", s"""{"id":$id}""",
      new java.sql.Timestamp(1700000000000L + id), 200)
    val w1 = new PushWal(dir)
    w1.append(p(0)); w1.append(p(1))
    w1.close()
    val cleanLen = Files.size(dir.resolve("posts.log"))
    // torn tail: 2-byte UTF-8 chars plus a lone continuation byte
    // (invalid UTF-8 — decodes to replacement chars, shrinking/shifting
    // any char-indexed offset relative to the byte offset)
    Files.write(dir.resolve("posts.log"),
      Array[Byte]('9', '\t', 0xC3.toByte, 0xA9.toByte, 0xC3.toByte,
        0xA9.toByte, 0xBF.toByte, 0xC3.toByte),
      StandardOpenOption.APPEND)
    val w2 = new PushWal(dir)
    assert(w2.recoveredPosts.map(_._2) == Seq("""{"id":0}""", """{"id":1}"""),
      s"both acked records survive a non-ASCII torn tail: ${w2.recoveredPosts}")
    assert(Files.size(dir.resolve("posts.log")) == cleanLen,
      "truncate lands exactly on the last record terminator, byte-exact")
    w2.append(p(2))
    w2.close()
    val w3 = new PushWal(dir)
    assert(w3.recoveredPosts.map(_._2) ==
      Seq("""{"id":0}""", """{"id":1}""", """{"id":2}"""),
      s"clean replay after non-ASCII torn tail + append: ${w3.recoveredPosts}")
    w3.close()
  }

  test("compaction crash window loses nothing: sidecar published, truncate lost") {
    // commitFloor persists the sidecar (floor, logStart=appended) BEFORE
    // truncating. Simulate a crash exactly between the two steps: the
    // log still physically holds fully-committed records whose
    // in-record sequences sit BELOW the published logStart. Replay must
    // skip them by their own sequence numbers and land `appended` on
    // the true floor — NOT renumber them (duplicates) and NOT reset
    // appended below the engine's checkpointed offset (acked posts
    // numbered into the committed range = silent loss, the round-11
    // ADVICE scenario for the old truncate-first ordering).
    val dir = Files.createTempDirectory("pushwal_crashwin")
    val w1 = new PushWal(dir)
    def p(id: Int) = graft.ingest.HttpIngress.Post("midtown", s"""{"id":$id}""",
      new java.sql.Timestamp(1700000000000L + id), 200)
    w1.append(p(0)); w1.append(p(1)); w1.append(p(2))
    w1.close()
    // hand-publish the compaction sidecar the real commitFloor(3) would
    // write first — the log keeps records 0..2 (the "truncate lost" half)
    Files.write(dir.resolve("committed"), "3 3".getBytes(StandardCharsets.UTF_8))

    val w2 = new PushWal(dir)
    assert(w2.recoveredBase == 3L && w2.recoveredPosts.isEmpty,
      s"committed-below-logStart records skip by in-record seq: " +
        s"${w2.recoveredBase} ${w2.recoveredPosts}")
    // posts acked after the restart must number AT the floor, never below
    w2.append(p(7))
    w2.close()
    val w3 = new PushWal(dir)
    assert(w3.recoveredBase == 3L && w3.recoveredPosts.map(_._2) == Seq("""{"id":7}"""),
      s"post-crash appends continue the absolute numbering: " +
        s"${w3.recoveredBase} ${w3.recoveredPosts}")
    w3.close()
  }

  test("replay refuses a malformed or out-of-sequence INTERIOR record") {
    // only a torn FINAL record is a recoverable crash artifact; a
    // malformed complete line is corruption, and silently absorbing it
    // would renumber every later record relative to the committed floor
    def p(id: Int) = graft.ingest.HttpIngress.Post("midtown", s"""{"id":$id}""",
      new java.sql.Timestamp(1700000000000L + id), 200)

    val d1 = Files.createTempDirectory("pushwal_corrupt")
    val a = new PushWal(d1)
    a.append(p(0)); a.append(p(1)); a.close()
    val log = Files.readAllLines(d1.resolve("posts.log"))
    Files.write(d1.resolve("posts.log"),
      (Seq(log.get(0), "garbage-complete-line") ++ Seq(log.get(1)))
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val e1 = intercept[IllegalStateException] { new PushWal(d1) }
    assert(e1.getMessage.contains("corrupt WAL"), e1.getMessage)

    val d2 = Files.createTempDirectory("pushwal_gap")
    val b = new PushWal(d2)
    b.append(p(0)); b.append(p(1)); b.append(p(2)); b.close()
    val lines = Files.readAllLines(d2.resolve("posts.log"))
    Files.write(d2.resolve("posts.log"),
      Seq(lines.get(0), lines.get(2)) // drop the middle record: a seq gap
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[IllegalStateException] { new PushWal(d2) }
    assert(e2.getMessage.contains("sequence gap"), e2.getMessage)
  }

  test("registry getOrCreate rejects a config change on a live stream name") {
    val name = s"ingress-${java.util.UUID.randomUUID().toString.take(8)}"
    HttpPushRegistry.getOrCreate(name, Seq("midtown"), 0, None)
    try {
      intercept[IllegalArgumentException] {
        HttpPushRegistry.getOrCreate(name, Seq("uptown"), 0, None)
      }
      intercept[IllegalArgumentException] {
        HttpPushRegistry.getOrCreate(name, Seq("midtown"), 12345, None)
      }
      intercept[IllegalArgumentException] {
        HttpPushRegistry.getOrCreate(name, Seq("midtown"), 0, Some("/tmp/nope"))
      }
      // the same config is idempotent (stream restarts in one JVM)
      HttpPushRegistry.getOrCreate(name, Seq("midtown"), 0, None)
    } finally HttpPushRegistry.stop(name)
  }
}
