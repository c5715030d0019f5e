package graft.sources.http

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StructType, StringType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S3 as a real DataSource V2 MICRO-BATCH STREAM fed by live HTTP: the
  * reference's Flask `POST /webhook/<account>` (webhook_app.py:152-182)
  * becomes `spark.readStream.format("graft-http-push")` — a running
  * [[graft.ingest.HttpIngress]] listener acks each POST with the
  * reference's status taxonomy, and every micro-batch drains the posts
  * accepted since the previous batch into `(account, body, received_at,
  * http_status)` rows — the frame the [[graft.ingest.Webhook]] chain
  * consumes, with each post's actual ack attached so downstream routing
  * can keep 400-acked (to-be-redelivered) posts out of bronze
  * ([[graft.ingest.Webhook.dispatchAcked]]).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-http-push")
  *     .option("name", "ingress-1")        // registry key (required)
  *     .option("accounts", "midtown,uptown")
  *     .option("port", 0)                  // 0 = ephemeral
  *     .option("wal", "/path/to/waldir")   // optional: durable mode
  *     .load()
  *   // HttpPushRegistry.boundPort("ingress-1") -> where to POST
  * }}}
  *
  * Offsets are the monotone count of accepted posts; `commit` trims the
  * retained buffer, so standing memory is one in-flight batch.
  *
  * Durability is the `wal` option's choice:
  *   - WITHOUT a WAL this is the NON-fault-tolerant collector tier,
  *     like Spark's own socket source (a post acked between checkpoint
  *     and crash is lost; restart realigns offsets past the lost
  *     range): a production deployment puts N stateless
  *     [[graft.ingest.HttpIngress]] replicas in front of a durable log
  *     and streams FROM the log; this mode stands in for that log in
  *     single-box tests.
  *   - WITH a WAL ([[PushWal]]) every accepted post is fsync'd to a
  *     local log BEFORE its ack goes out — the reference's
  *     commit-to-Postgres-then-respond posture (webhook_app.py:41-49) —
  *     and restart replays acked-but-uncommitted posts, so nothing
  *     acked is ever lost (HttpPushWalSpec). The ack/dispatch semantics
  *     stay in `Webhook`/`HttpIngress`, shared by both postures.
  */
final class HttpPushSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http-push"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpPushSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HttpPushTable(properties)
}

object HttpPushSource {
  val schema: StructType = new StructType()
    .add("account", StringType)
    .add("body", StringType)
    .add("received_at", TimestampType)
    .add("http_status", IntegerType)
}

/** Driver-side registry of live listeners, keyed by the stream's
  * `name` option — the streaming engine constructs/destroys scan
  * objects freely, so listener lifetime can't live in them. */
object HttpPushRegistry {
  final class Entry(val ingress: graft.ingest.HttpIngress,
      private[http] val wal: Option[PushWal],
      private[http] val accounts: Seq[String],
      private[http] val requestedPort: Int,
      private[http] val walDir: Option[String]) {
    // accepted posts not yet committed, as (account, body, micros,
    // http_status); `base` counts rows already trimmed by commit()
    private[http] val buf = new ArrayBuffer[(String, String, Long, Int)]()
    private[http] var base: Long = 0L
    // durable mode: recover acked-but-uncommitted posts from the WAL
    wal.foreach { w => base = w.recoveredBase; buf ++= w.recoveredPosts }
    private[http] def drain(): Unit = synchronized {
      ingress.drainPosts().foreach { p =>
        buf += ((p.account, p.body, p.received_at.getTime * 1000L +
          (p.received_at.getNanos / 1000L) % 1000L, p.http_status))
      }
    }
    private[http] def total: Long = synchronized(base + buf.length)
    private[http] def baseSeq: Long = synchronized(base)
    private[http] def slice(from: Long, until: Long): Array[(String, String, Long, Int)] =
      synchronized {
        buf.slice((from - base).toInt, (until - base).toInt).toArray
      }
    private[http] def trim(upTo: Long): Unit = synchronized {
      val n = math.max(0, math.min(buf.length.toLong, upTo - base)).toInt
      buf.remove(0, n)
      base += n
      wal.foreach(_.commitFloor(base))
    }
    /** Checkpoint-restart recovery WITHOUT a WAL: the engine replays
      * offsets from a previous listener incarnation whose buffer is
      * gone. Jump the sequence base PAST the replayed range so offsets
      * stay monotone. The buffer is KEPT — posts the new incarnation
      * already acked are renumbered to [to, to+len), never discarded (a
      * 200 implies retention); only the pre-crash in-flight rows are
      * lost, which is the WAL-less documented contract (same as Spark's
      * socket source). In durable mode the WAL replay already restored
      * the true base, so this is a no-op unless the WAL itself was
      * deleted out from under the checkpoint. */
    private[http] def fastForward(to: Long): Unit = synchronized {
      if (to > base) base = to
    }

    /** Recovery-time alignment (deserializeOffset before the first
      * latestOffset). DURABLE mode must be a strict NO-OP: the WAL's
      * absolute numbering is authoritative, and every checkpointed
      * offset refers to that same sequence. In the crash window where
      * the checkpoint floor outran the WAL sidecar (commit-log written,
      * sidecar persist lost), the recovered buffer's leading rows sit
      * BELOW the checkpoint floor — `slice` naturally skips them (they
      * were delivered pre-crash) and the next commit's `trim` retires
      * them, so neither renumbering (fastForward — would redeliver them
      * as fresh rows: duplicates) nor eager dropping (would also drop
      * rows of an UNCOMMITTED offset-WAL batch end that deserializes
      * through here before replay: loss) is allowed. A checkpoint
      * pointing past a DELETED WAL is handled by planInputPartitions'
      * out-of-range guard. WAL-less mode keeps the renumbering
      * contract (the buffer only ever holds posts the NEW incarnation
      * acked, which have no durable numbering to preserve). */
    private[http] def realignRecovered(to: Long): Unit = synchronized {
      if (wal.isEmpty && to > base) base = to
    }
    private[http] def close(): Unit = {
      ingress.stop()
      wal.foreach(_.close())
    }
  }

  private val entries = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  def getOrCreate(name: String, accounts: Seq[String], port: Int,
      walDir: Option[String] = None): Entry = {
    val e = entries.computeIfAbsent(name, _ => {
      val wal = walDir.map(d => new PushWal(java.nio.file.Paths.get(d)))
      val ing = new graft.ingest.HttpIngress(accounts, port,
        journal = wal.map(w => (p: graft.ingest.HttpIngress.Post) => w.append(p)))
      ing.start()
      new Entry(ing, wal, accounts, port, walDir)
    })
    // a second stream (or a restart in the same JVM) reusing the name
    // must not silently inherit a DIFFERENT configuration — fail loudly
    // on any mismatch instead of ignoring the requested options
    require(e.accounts.toSet == accounts.toSet,
      s"graft-http-push '$name' is already running with accounts " +
        s"${e.accounts.mkString(",")}; requested ${accounts.mkString(",")} — " +
        "stop the stream (HttpPushRegistry.stop) before changing its whitelist")
    require(port == 0 || port == e.requestedPort,
      s"graft-http-push '$name' is already running on requested port " +
        s"${e.requestedPort}; requested $port — stop the stream before changing its port")
    require(e.walDir == walDir,
      s"graft-http-push '$name' is already running with wal=${e.walDir}; " +
        s"requested wal=$walDir — stop the stream before changing its durability mode")
    e
  }

  /** Where to POST for a named stream (the ephemeral-port lookup). */
  def boundPort(name: String): Int = {
    val e = entries.get(name)
    require(e != null, s"no running graft-http-push stream named '$name'")
    e.ingress.boundPort
  }

  def stop(name: String): Unit = {
    val e = entries.remove(name)
    if (e != null) e.close()
  }
}

private final class HttpPushTable(props: JMap[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"http-push(${props.get("name")})"
  override def schema(): StructType = HttpPushSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpPushScan(options.get("name"),
      Option(options.get("accounts")).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq.empty),
      options.getInt("port", 0),
      Option(options.get("wal")))
}

/** Monotone accepted-post count. */
private final case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private final case class HttpBatchPartition(rows: Array[(String, String, Long, Int)])
  extends InputPartition

private final class HttpPushScan(name: String, accounts: Seq[String], port: Int,
    walDir: Option[String])
    extends ScanBuilder with Scan with MicroBatchStream {
  require(name != null && name.nonEmpty,
    "option 'name' (the listener registry key) is required")

  override def build(): Scan = this
  override def readSchema(): StructType = HttpPushSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = this

  private def entry = HttpPushRegistry.getOrCreate(name, accounts, port, walDir)

  // becomes true at the first latestOffset call; deserializeOffset
  // realigns the sequence ONLY before that point (checkpoint recovery).
  // The engine also deserializes its offset WAL mid-run — realigning
  // then would renumber rows that are mid-delivery and the stream
  // would chase its own growing offset forever.
  @volatile private var started = false

  override def initialOffset(): Offset = SeqOffset(entry.total)
  override def latestOffset(): Offset = {
    started = true
    val e = entry
    e.drain() // pull everything the listener accepted since last batch
    SeqOffset(e.total)
  }
  override def deserializeOffset(json: String): Offset = {
    // recovery-time deserialization is the FIRST sight of a prior
    // incarnation's offsets (committed floor AND any WAL batch end).
    // WAL-less mode: realign the fresh entry's sequence so latestOffset
    // is monotone from the engine's very first call and posts the NEW
    // incarnation acked are renumbered past the checkpointed range,
    // never trimmed as if they had been delivered. Durable mode: rows
    // below a checkpoint floor that outran the WAL sidecar (the
    // commit-log-vs-sidecar crash window) were already delivered —
    // realignRecovered DROPS them instead of renumbering them into
    // duplicates; normally it is a no-op (offsets land in [base, total]).
    val seq = json.toLong
    if (!started) entry.realignRecovered(seq)
    SeqOffset(seq)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    val en = entry
    if (e <= s) Array.empty
    else if (s < en.baseSeq || e > en.total) {
      // offsets from a pre-restart incarnation — the replayed rows are
      // gone (WAL-less documented loss); realign and deliver nothing
      // for them. Durable mode never lands here for acked posts: the
      // WAL replay restored them, so [s, e) ⊆ [base, total].
      en.fastForward(e)
      Array.empty
    } else Array(HttpBatchPartition(en.slice(s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[HttpBatchPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val (acct, body, us, status) = rows(i)
            InternalRow(UTF8String.fromString(acct), UTF8String.fromString(body),
              us, status)
          }
          override def close(): Unit = ()
        }
      }
    }
  override def commit(end: Offset): Unit = {
    val seq = end.asInstanceOf[SeqOffset].seq
    val en = entry
    // a commit beyond this incarnation's sequence is the replay of a
    // pre-restart batch — realign (keep the fresh rows) instead of
    // trimming rows that were never delivered
    if (seq > en.total) en.fastForward(seq) else en.trim(seq)
  }
  override def stop(): Unit = HttpPushRegistry.stop(name)
}
