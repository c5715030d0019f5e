package graft.sources.http

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import java.util.Base64

import graft.ingest.HttpIngress

/** Write-ahead log for the `graft-http-push` durable mode: every
  * accepted post is appended (and fsync'd) BEFORE its 200 ack goes out,
  * so an acked post survives a listener crash — the posture the
  * reference gets from committing to Postgres before responding
  * (webhook_app.py:41-49, 176). Without a WAL the source is the
  * documented non-fault-tolerant socket-source tier; with one, restart
  * recovery replays every acked-but-uncommitted post and the
  * at-least-once gap closes (HttpPushWalSpec pins zero lost acked posts
  * across a restart).
  *
  * Layout under `dir`:
  *   - `posts.log`  — one record per accepted post, append-only:
  *     `b64(account)\tb64(body)\tmicros\thttp_status\n` (base64 keeps
  *     arbitrary bodies newline-safe). A torn final record (crash
  *     mid-append) is dropped on replay: its ack never went out, so the
  *     sender redelivers — nothing acked is lost.
  *   - `committed`  — two longs `floor logStart`: `floor` is the count
  *     of posts (since the stream's birth) the engine has committed;
  *     `logStart` is the absolute sequence of `posts.log`'s first
  *     record. Written atomically (tmp + ATOMIC_MOVE) at every source
  *     commit.
  *
  * Compaction: when a commit leaves nothing uncommitted (`floor` ==
  * append count), the log is truncated and `logStart` jumps to the
  * floor — steady-state disk usage is one in-flight batch, matching the
  * in-memory buffer's contract. Absolute sequence numbers never reset,
  * so checkpointed offsets from any incarnation stay meaningful.
  *
  * Thread safety: appends come from listener handler threads (already
  * serialized by [[HttpIngress]]'s retain lock), commits from the
  * engine's thread — all state mutation here synchronizes on `this`.
  */
final class PushWal(dir: Path) {
  Files.createDirectories(dir)
  private val logPath = dir.resolve("posts.log")
  private val committedPath = dir.resolve("committed")

  /** Absolute sequence of the first record in posts.log. */
  private var logStart: Long = 0L
  /** Committed floor (absolute). */
  private var floor: Long = 0L
  /** Absolute sequence one past the last appended record. */
  private var appended: Long = 0L

  /** Recovered posts in append order, with their absolute base — set by
    * [[replay]] before the channel opens for append. */
  val (recoveredBase, recoveredPosts): (Long, Seq[(String, String, Long, Int)]) = replay()

  private val ch = FileChannel.open(logPath, StandardOpenOption.CREATE,
    StandardOpenOption.WRITE, StandardOpenOption.APPEND)

  private def replay(): (Long, Seq[(String, String, Long, Int)]) = {
    if (Files.exists(committedPath)) {
      val parts = new String(Files.readAllBytes(committedPath),
        StandardCharsets.UTF_8).trim.split("\\s+")
      floor = parts(0).toLong
      logStart = if (parts.length > 1) parts(1).toLong else 0L
    }
    val rows = Seq.newBuilder[(String, String, Long, Int)]
    var seq = logStart
    if (Files.exists(logPath)) {
      val bytes = Files.readAllBytes(logPath)
      val text = new String(bytes, StandardCharsets.UTF_8)
      // records end in '\n'; a torn tail (no terminator) is dropped —
      // its ack never went out, the sender redelivers
      val complete = text.lastIndexOf('\n')
      if (complete >= 0) {
        text.substring(0, complete).split("\n").foreach { line =>
          if (line.nonEmpty) {
            val f = line.split("\t", -1)
            if (f.length == 4) {
              if (seq >= floor) {
                rows += ((new String(Base64.getDecoder.decode(f(0)), StandardCharsets.UTF_8),
                  new String(Base64.getDecoder.decode(f(1)), StandardCharsets.UTF_8),
                  f(2).toLong, f(3).toInt))
              }
              seq += 1
            }
          }
        }
      }
    }
    appended = seq
    // the committed floor can exceed the replayed records only if the
    // sidecar outlived a deleted log — trust the floor (those rows were
    // committed; nothing uncommitted can be recovered from a lost log)
    if (floor > appended) appended = floor
    (math.max(floor, logStart), rows.result())
  }

  /** Durable append — fsync'd before returning, so the caller may ack. */
  def append(p: HttpIngress.Post): Unit = synchronized {
    val micros = p.received_at.getTime * 1000L + (p.received_at.getNanos / 1000L) % 1000L
    val line = Base64.getEncoder.encodeToString(p.account.getBytes(StandardCharsets.UTF_8)) +
      "\t" + Base64.getEncoder.encodeToString(p.body.getBytes(StandardCharsets.UTF_8)) +
      "\t" + micros + "\t" + p.http_status + "\n"
    ch.write(ByteBuffer.wrap(line.getBytes(StandardCharsets.UTF_8)))
    ch.force(false)
    appended += 1
  }

  /** Persist the committed floor; compact when nothing is uncommitted. */
  def commitFloor(newFloor: Long): Unit = synchronized {
    if (newFloor > floor) floor = newFloor
    if (floor >= appended && logStart < appended) {
      // everything in the log is committed — truncate and restart the
      // log at the floor (absolute numbering is preserved by logStart)
      ch.truncate(0L)
      logStart = appended
    }
    val tmp = dir.resolve("committed.tmp")
    Files.write(tmp, s"$floor $logStart".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, committedPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def close(): Unit = synchronized { ch.close() }
}
