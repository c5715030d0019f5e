package graft

import java.nio.file.{Files, Paths}

/** Drives [[Refresh.runOnce]] — the scheduled-refresh posture —
  * end-to-end twice and asserts scheduler-grade idempotence: a re-run
  * with no new landing files changes nothing, a re-run after a new
  * drop ingests exactly the new envelopes (replays of already-seen ids
  * are first-wins no-ops at the bronze boundary). */
class RefreshSpec extends SparkSpec {

  private def jsonl(account: String, body: String): String = {
    // one landing record per line: the (account, body, received_at)
    // envelope a collector drops; body is embedded as escaped JSON
    val esc = body.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"account": "$account", "body": "$esc", "received_at": "2025-09-30T12:00:00.000Z"}"""
  }

  private def envelopeBody(id: Long, event: String): String =
    s"""{"webhook_event": {"id": $id, "event": "$event", "signature": "s", "has_succeeded": true, "try_count": 1, "last_returned_code": 200, "data": {"id": ${id + 500}}}}"""

  test("refresh is idempotent across re-runs and incremental on new drops") {
    val landing = Files.createTempDirectory("graft_landing").toString
    val wh = Files.createTempDirectory("graft_wh").toString

    Files.writeString(Paths.get(s"$landing/drop1.jsonl"), Seq(
      jsonl("office_a", envelopeBody(1, "lead.creation")),
      jsonl("office_a", envelopeBody(2, "lead.deleted")),
      jsonl("office_a", "not json at all"),
      jsonl("office_evil", envelopeBody(3, "lead.creation")) // not whitelisted
    ).mkString("\n"))

    val r1 = Refresh.runOnce(spark, landing, wh, sfDir)
    assert(r1.bronzeRows === 2, "two well-formed whitelisted envelopes")
    assert(r1.deadLetterRows === 1, "malformed body dead-letters; foreign office drops")
    assert(r1.marts === Seq("manager_dashboard", "monthly_trend", "funnel"))
    assert(spark.read.parquet(s"$wh/marts/manager_dashboard").count() > 0)

    // re-run with NO new files: checkpoint makes the drain a no-op
    val r2 = Refresh.runOnce(spark, landing, wh, sfDir)
    assert(r2.bronzeRows === 2 && r2.deadLetterRows === 1)

    // new drop: one new envelope + one replay of id=1 (stale retry)
    Files.writeString(Paths.get(s"$landing/drop2.jsonl"), Seq(
      jsonl("office_a", envelopeBody(4, "client_folder.created")),
      jsonl("office_a", envelopeBody(1, "lead.creation"))
    ).mkString("\n"))
    val r3 = Refresh.runOnce(spark, landing, wh, sfDir)
    assert(r3.bronzeRows === 3, "new id ingested once, replayed id a no-op")
    assert(r3.deadLetterRows === 1)
  }
}
