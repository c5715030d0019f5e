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
  *     `seq\tb64(account)\tb64(body)\tmicros\thttp_status\n`. `seq` is
  *     the record's ABSOLUTE sequence number, written into the record
  *     itself so replay numbering never depends on the sidecar's
  *     `logStart` being in sync with the log's physical content (the
  *     compaction crash window below). Base64 keeps arbitrary bodies
  *     newline-safe. A torn FINAL record (crash mid-append) is dropped
  *     on replay: its ack never went out, so the sender redelivers —
  *     nothing acked is lost. A malformed or out-of-sequence INTERIOR
  *     record is corruption, not a torn write, and replay REFUSES to
  *     open the WAL rather than silently renumbering every record after
  *     it (which would skip or redeliver the wrong posts relative to
  *     the committed floor).
  *   - `committed`  — two longs `floor logStart`: `floor` is the count
  *     of posts (since the stream's birth) the engine has committed;
  *     `logStart` is the absolute sequence the log is INTENDED to start
  *     at. Written atomically (tmp + force + ATOMIC_MOVE) at every
  *     source commit.
  *
  * Compaction: when a commit leaves nothing uncommitted (`floor` ==
  * append count), the sidecar is atomically persisted with `logStart`
  * jumped to the floor FIRST, and only then is the log truncated —
  * steady-state disk usage is one in-flight batch, matching the
  * in-memory buffer's contract. Ordering matters: a crash between the
  * two steps leaves old records in the log with in-record sequences
  * BELOW the published `logStart`; replay skips them by their own
  * sequence numbers and `appended` still lands on the true floor. (The
  * reverse order — truncate first — would leave an EMPTY log with a
  * STALE sidecar on the same crash, resetting `appended` below the
  * engine's checkpointed offset and silently never delivering posts
  * acked after restart.) Absolute sequence numbers never reset, so
  * checkpointed offsets from any incarnation stay meaningful.
  *
  * Thread safety: appends come from listener handler threads (already
  * serialized by [[HttpIngress]]'s retain lock), commits from the
  * engine's thread — all state mutation here synchronizes on `this`.
  */
final class PushWal(dir: Path) {
  Files.createDirectories(dir)
  private val logPath = dir.resolve("posts.log")
  private val committedPath = dir.resolve("committed")

  /** Absolute sequence the log is intended to start at (sidecar). */
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
    var firstDelivered = -1L
    var next = -1L // expected sequence of the next record; -1 until the first is read
    if (Files.exists(logPath)) {
      val bytes = Files.readAllBytes(logPath)
      // records end in '\n'; a torn tail (no terminator) is dropped —
      // its ack never went out, the sender redelivers. The scan is over
      // RAW BYTES: a char index from the decoded string would only equal
      // the byte offset while every byte is ASCII, and external
      // corruption injecting non-ASCII bytes would shift the decode and
      // make the truncate below cut into the last complete acked record.
      var complete = -1
      var bi = bytes.length - 1
      while (bi >= 0 && complete < 0) {
        if (bytes(bi) == '\n') complete = bi
        bi -= 1
      }
      // the torn bytes must also be PHYSICALLY truncated: the append
      // channel opens in APPEND mode, so a logically-dropped tail left
      // in place would fuse with the next record into one malformed
      // interior line and the strict corruption check above would
      // refuse to open on the NEXT restart — turning the one declared
      // -recoverable crash artifact into a permanent failure.
      if (complete + 1 < bytes.length) {
        val t = FileChannel.open(logPath, StandardOpenOption.WRITE)
        try { t.truncate(complete + 1L); t.force(false) } finally t.close()
      }
      if (complete >= 0) {
        // decode only the bytes BEFORE the last terminator — the torn
        // tail (possibly invalid UTF-8) never reaches the decoder
        val text = new String(bytes, 0, complete, StandardCharsets.UTF_8)
        text.split("\n", -1).foreach { line =>
          // every complete interior line MUST parse — a malformed one is
          // corruption, and absorbing it would renumber everything after
          // it relative to the committed floor (wrong posts skipped or
          // redelivered). Refuse to open instead.
          val f = line.split("\t", -1)
          if (f.length != 5)
            throw new IllegalStateException(
              s"corrupt WAL: interior record with ${f.length} fields in $logPath " +
                "(only a torn FINAL record is recoverable)")
          val seq =
            try f(0).toLong
            catch { case _: NumberFormatException =>
              throw new IllegalStateException(
                s"corrupt WAL: unparseable sequence '${f(0)}' in $logPath") }
          if (next >= 0 && seq != next)
            throw new IllegalStateException(
              s"corrupt WAL: sequence gap in $logPath (expected $next, found $seq)")
          if (seq >= floor) {
            if (firstDelivered < 0) firstDelivered = seq
            rows += ((new String(Base64.getDecoder.decode(f(1)), StandardCharsets.UTF_8),
              new String(Base64.getDecoder.decode(f(2)), StandardCharsets.UTF_8),
              f(3).toLong, f(4).toInt))
          }
          next = seq + 1
        }
      }
    }
    appended = if (next >= 0) next else math.max(floor, logStart)
    // the committed floor can exceed the replayed records only if the
    // sidecar outlived a deleted log — trust the floor (those rows were
    // committed; nothing uncommitted can be recovered from a lost log)
    if (floor > appended) appended = floor
    (if (firstDelivered >= 0) firstDelivered else appended, rows.result())
  }

  /** Durable append — fsync'd before returning, so the caller may ack. */
  def append(p: HttpIngress.Post): Unit = synchronized {
    val micros = p.received_at.getTime * 1000L + (p.received_at.getNanos / 1000L) % 1000L
    val line = appended.toString +
      "\t" + Base64.getEncoder.encodeToString(p.account.getBytes(StandardCharsets.UTF_8)) +
      "\t" + Base64.getEncoder.encodeToString(p.body.getBytes(StandardCharsets.UTF_8)) +
      "\t" + micros + "\t" + p.http_status + "\n"
    ch.write(ByteBuffer.wrap(line.getBytes(StandardCharsets.UTF_8)))
    ch.force(false)
    appended += 1
  }

  /** Persist the committed floor; compact when nothing is uncommitted.
    * The sidecar (with the post-compaction `logStart`) is forced to disk
    * and atomically published BEFORE the log is truncated — see the
    * class doc for why the reverse order loses acked posts. */
  def commitFloor(newFloor: Long): Unit = synchronized {
    if (newFloor > floor) floor = newFloor
    val compact = floor >= appended && logStart < appended
    val newLogStart = if (compact) appended else logStart
    val tmp = dir.resolve("committed.tmp")
    val tc = FileChannel.open(tmp, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      tc.write(ByteBuffer.wrap(
        s"$floor $newLogStart".getBytes(StandardCharsets.UTF_8)))
      tc.force(true)
    } finally tc.close()
    Files.move(tmp, committedPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    logStart = newLogStart
    if (compact) {
      // crash-safe: if we die right here, the log still holds records
      // whose in-record sequences are below the published logStart —
      // replay skips them by seq, numbering unaffected
      ch.truncate(0L)
    }
  }

  def close(): Unit = synchronized { ch.close() }
}
