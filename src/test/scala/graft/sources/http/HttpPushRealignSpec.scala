package graft.sources.http

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.HttpIngress

/** Durable-mode recovery alignment at the Entry level — the crash
  * window the end-to-end WAL spec cannot stage deterministically: the
  * engine's commit log was written but the WAL sidecar persist was
  * lost, so the checkpointed floor is AHEAD of the recovered base.
  * Correctness requires the recovered numbering to stand: the stale
  * leading rows occupy the checkpoint-committed range (slice skips
  * them — no duplicates), the uncommitted row replays (no loss), and
  * the next commit retires the stale rows and re-syncs the sidecar.
  * Renumbering (the WAL-less fastForward contract) would redeliver
  * committed rows as fresh ones; eager dropping would lose the rows of
  * an uncommitted offset-WAL batch end that deserializes before its
  * replay. */
class HttpPushRealignSpec extends AnyFunSuite {

  private def post(id: Int) = HttpIngress.Post("midtown", s"""{"id":$id}""",
    new java.sql.Timestamp(1700000000000L + id), 200)

  test("checkpoint floor ahead of WAL floor: no duplicates, no loss, sidecar re-syncs") {
    val dir = Files.createTempDirectory("pushwal_realign")
    val w1 = new PushWal(dir)
    w1.append(post(0)); w1.append(post(1)); w1.append(post(2))
    w1.commitFloor(1) // sidecar floor 1; the engine's commit log reached 2
    w1.close()

    val ing = new HttpIngress(Seq("midtown"))
    val w2 = new PushWal(dir)
    val e = new HttpPushRegistry.Entry(ing, Some(w2), Seq("midtown"), 0, Some(dir.toString))
    try {
      assert(e.baseSeq == 1L && e.total == 3L, "recovery restores the WAL floor + rows")

      // recovery deserializes BOTH the committed floor (2, ahead of the
      // sidecar) and the uncommitted batch end (3) — durable mode must
      // not move the sequence for either
      e.realignRecovered(2L)
      e.realignRecovered(3L)
      assert(e.baseSeq == 1L && e.total == 3L, "durable realign is a strict no-op")

      // the engine replays the uncommitted batch [2, 3): exactly the
      // one genuinely-undelivered row — the stale row 1 (committed
      // pre-crash) is skipped by the slice, not redelivered
      assert(e.slice(2L, 3L).map(_._2).toSeq == Seq("""{"id":2}"""),
        "replay delivers the uncommitted row only")

      // commit retires stale + delivered rows and re-syncs the sidecar
      e.trim(3L)
      assert(e.baseSeq == 3L && e.total == 3L)
    } finally e.close()

    val w3 = new PushWal(dir)
    assert(w3.recoveredBase == 3L && w3.recoveredPosts.isEmpty,
      "the post-commit sidecar carries the caught-up floor")
    w3.close()
  }
}
