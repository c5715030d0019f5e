package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamIngest
import graft.streaming.StreamIngest.{Ev, KeyState}

/** End-to-end micro-batch runs over MemoryStream: duplicate delivery,
  * out-of-order arrival, unknown-type routing (SURVEY.md §5.4). */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ST3: duplicate delivery ids are dropped within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("st3_out").outputMode("append").start()
    // same event delivered twice in one batch + re-delivered next batch
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0))
    q.processAllAvailable()
    in.addData(Ev(1, ts("2024-01-01 10:00:01"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-01 10:00:02"), 7, "purchase", 2.0))
    q.processAllAvailable()
    val ids = spark.table("st3_out").select("event_id").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq === Seq(1L, 2L), "retries of event 1 must land exactly once")
  }

  test("ST6: latest-state keeps the newest event per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.latestState(spark, in.toDS())
      .writeStream.format("memory").queryName("st6_out").outputMode("update").start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0))
    q.processAllAvailable()
    // out-of-order: an OLDER event arrives later and must NOT win
    in.addData(Ev(2, ts("2024-01-01 09:00:00"), 7, "view", 0.5),
      Ev(3, ts("2024-01-01 11:00:00"), 7, "purchase", 9.0))
    q.processAllAvailable()
    val last = spark.table("st6_out").as[KeyState].collect()
      .groupBy(_.user_id).view.mapValues(_.last).toMap
    q.stop()
    assert(last(7L).last_event_id === 3L)
    assert(last(7L).last_type === "purchase")
  }

  test("ST7: unknown event types route to dead-letter, never fail") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.deadLetter(in.toDF())
      .writeStream.format("memory").queryName("st7_out").outputMode("append").start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-01 10:00:01"), 7, "mystery.event", 0.0))
    q.processAllAvailable()
    val dead = spark.table("st7_out").select("event_id").as[Long].collect()
    q.stop()
    assert(dead.toSeq === Seq(2L))
  }

  test("ST2: scheduled batch-incremental refresh via Trigger.AvailableNow") {
    // the reference refreshes its BI dataset 8x/day from the warehouse;
    // the Spark-native equivalent is a file-source stream drained with
    // AvailableNow — processes what exists, then stops (checkpointed,
    // so the next scheduled run picks up only new files).
    val dir = java.nio.file.Files.createTempDirectory("graft_st2")
    val src = dir.resolve("in").toString
    Tables.events(spark, sfDir).write.parquet(src)
    val batchCounts = spark.read.parquet(src)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val q = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("st2_out").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", dir.resolve("chk").toString)
      .start()
    q.awaitTermination(60000)
    val got = spark.table("st2_out").as[(String, Long)].collect().toMap
    assert(got === batchCounts, "AvailableNow drain must equal the batch view")
  }

  test("ST8: watermarked window agg buckets late-but-in-horizon events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.windowedCounts(in.toDF(), horizon = "1 day")
      .writeStream.format("memory").queryName("st8_out").outputMode("update").start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
      Ev(2, ts("2024-01-02 09:00:00"), 7, "view", 1.0))
    q.processAllAvailable()
    // late arrival for the Jan-1 window, still ahead of the watermark
    // (max ts Jan-2 09:00 − 1 day = Jan-1 09:00 < 23:30)
    in.addData(Ev(3, ts("2024-01-01 23:30:00"), 8, "view", 1.0))
    q.processAllAvailable()
    val got = spark.table("st8_out")
      .as[(Timestamp, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).max).toMap
    q.stop()
    assert(got((ts("2024-01-01 00:00:00"), "view")) === 2L,
      "late event must land in its event-time day bucket")
    assert(got((ts("2024-01-02 00:00:00"), "view")) === 1L)
  }

  test("ST16: hopping windows put every event in exactly two overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.hoppingCounts(in.toDF(), horizon = "1 day")
      .writeStream.format("memory").queryName("st16_out").outputMode("update").start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0))
    q.processAllAvailable()
    in.addData(Ev(2, ts("2024-01-01 13:00:00"), 8, "view", 1.0))
    q.processAllAvailable()
    val got = spark.table("st16_out").as[(Timestamp, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    q.stop()
    // event 1 (10:00) → windows starting Dec-31 12:00 and Jan-1 00:00;
    // event 2 (13:00) → Jan-1 00:00 and Jan-1 12:00. Overlap bucket
    // (Jan-1 00:00) holds both.
    assert(got(ts("2023-12-31 12:00:00")) === 1L)
    assert(got(ts("2024-01-01 00:00:00")) === 2L)
    assert(got(ts("2024-01-01 12:00:00")) === 1L)
    assert(got.values.sum === 4L, "2 events x 2 windows each")
  }

  test("ST17: streamed histogram fold equals the batch bin counts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.histogramCounts(in.toDF(), "value",
        lo = 0.0, width = 8.0, bins = 64, horizon = "1 day")
      .writeStream.format("memory").queryName("st17_out").outputMode("update").start()
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 3.0),     // bin 0
      Ev(2, ts("2024-01-01 11:00:00"), 8, "view", 7.9),     // bin 0
      Ev(3, ts("2024-01-01 12:00:00"), 9, "view", 8.0),     // bin 1
      Ev(4, ts("2024-01-02 09:00:00"), 7, "view", 600.0),   // clamps to bin 63
      Ev(5, ts("2024-01-02 10:00:00"), 8, "view", -4.0))    // clamps to bin 0
    in.addData(evs.take(2))
    q.processAllAvailable()
    in.addData(evs.drop(2)) // incremental fold across micro-batches
    q.processAllAvailable()
    val got = spark.table("st17_out")
      .as[(Timestamp, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).max).toMap
    q.stop()
    val batch = StreamIngest.histogramCounts(
        evs.toDF(), "value", lo = 0.0, width = 8.0, bins = 64)
      .as[(Timestamp, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === batch, "stream fold must converge to the batch histogram")
    assert(got((ts("2024-01-01 00:00:00"), 0)) === 2L)
    assert(got((ts("2024-01-02 00:00:00"), 63)) === 1L, "over-domain clamps high")
    assert(got((ts("2024-01-02 00:00:00"), 0)) === 1L, "under-domain clamps low")
  }

  test("ST15: CMS counters folded over micro-batches equal the batch sketch") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val evs = (1L to 60L).map(i =>
      Ev(i, ts("2024-01-01 10:00:00"), i % 7, if (i % 3 == 0) "view" else "click", 1.0))
    val in = MemoryStream[Ev]
    // the counter table IS the streaming state: a plain streaming
    // groupBy-count in complete mode — merge across batches is the
    // aggregation itself (elementwise addition), nothing bespoke.
    val q = graft.sketch.Sketches.cmsCounters(in.toDF(), col("user_id"))
      .writeStream.format("memory").queryName("st15_out")
      .outputMode("complete").start()
    evs.grouped(20).foreach { b => in.addData(b); q.processAllAvailable() }
    val streamed = spark.table("st15_out")
      .as[(Int, Long, Long)].collect().toSeq.sorted
    q.stop()
    val batch = graft.sketch.Sketches.cmsCounters(evs.toDF(), col("user_id"))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(streamed === batch,
      "3-micro-batch fold must be bit-identical to the one-shot sketch")
    assert(streamed.map(_._3).sum === 60L * graft.sketch.Sketches.CMS_DEPTH)
  }

  test("ST1/ST2: restart from checkpoint processes only new files, exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_restart")
    val src = dir.resolve("in").toString
    val sink = dir.resolve("out").toString
    val chk = dir.resolve("chk").toString
    val batch1 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-01 10:00:01"), 8, "view", 2.0)).toDF()
    batch1.write.parquet(src)
    def drain(): Unit = {
      val q = spark.readStream.schema(batch1.schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    drain()
    assert(spark.read.parquet(sink).count() === 2)
    // new file lands while the query is DOWN; restart resumes from the
    // checkpointed offsets — old files are not reprocessed
    Seq(Ev(3, ts("2024-01-01 10:00:02"), 7, "purchase", 9.0)).toDF()
      .write.mode("append").parquet(src)
    drain()
    val ids = spark.read.parquet(sink).select("event_id").as[Long]
      .collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L),
      "restart must deliver each source file exactly once")
  }

  test("ST3/ST6 run on the RocksDB state store (the large-state backend)") {
    // at 100 TB the dedup/session state outgrows the default in-memory
    // HDFS-backed store; RocksDB keeps state off-heap with incremental
    // checkpoints. The operators must be provider-agnostic — run the
    // watermarked dedup end-to-end against RocksDB and confirm the
    // same exactly-once result.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = StreamIngest.dedupWithinWatermark(in.toDF())
        .writeStream.format("memory").queryName("st_rocks_out")
        .outputMode("append").start()
      in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
        Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts("2024-01-01 10:00:01"), 7, "signup", 1.0),
        Ev(2, ts("2024-01-01 10:00:02"), 7, "purchase", 2.0))
      q.processAllAvailable()
      val ids = spark.table("st_rocks_out").select("event_id").as[Long].collect().sorted
      q.stop()
      assert(ids.toSeq === Seq(1L, 2L), "RocksDB-backed dedup must match the default store")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ST10: streaming session windows merge bursts and emit on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.sessionCounts(in.toDF(), gap = "30 minutes", horizon = "10 minutes")
      .writeStream.format("memory").queryName("st10_out").outputMode("append").start()
    // burst of 3 events inside the gap + a separate later burst of 1
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 7, "click", 1.0),
      Ev(3, ts("2024-01-01 10:25:00"), 7, "view", 1.0),
      Ev(4, ts("2024-01-01 12:00:00"), 7, "view", 1.0))
    q.processAllAvailable()
    // advance the watermark far past both session ends so both emit
    in.addData(Ev(5, ts("2024-01-01 15:00:00"), 8, "view", 1.0))
    q.processAllAvailable()
    val got = spark.table("st10_out")
      .as[(Long, Timestamp, Timestamp, Long)].collect().filter(_._1 == 7L)
      .sortBy(_._2.getTime)
    q.stop()
    assert(got.length === 2, "two closed sessions for user 7")
    assert(got(0)._2 === ts("2024-01-01 10:00:00") &&
      got(0)._3 === ts("2024-01-01 10:55:00") && got(0)._4 === 3L,
      "burst merges into one session ending last-event + gap")
    assert(got(1)._2 === ts("2024-01-01 12:00:00") && got(1)._4 === 1L)
  }

  test("ST9: stream-stream interval join attributes purchases to in-window signups") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val q = StreamIngest.purchaseAttribution(purchases.toDF(), signups.toDF())
      .writeStream.format("memory").queryName("st9_out").outputMode("append").start()
    signups.addData(
      Ev(10, ts("2024-01-01 09:30:00"), 7, "signup", 0.0),  // in window
      Ev(11, ts("2024-01-01 08:30:00"), 7, "signup", 0.0),  // too early
      Ev(12, ts("2024-01-01 09:45:00"), 8, "signup", 0.0))  // other user
    purchases.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "purchase", 5.0))
    q.processAllAvailable()
    // the other side arriving later still joins (state retained by watermark)
    signups.addData(Ev(13, ts("2024-01-01 09:59:00"), 7, "signup", 0.0))
    q.processAllAvailable()
    val got = spark.table("st9_out")
      .select("purchase_id", "signup_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got === Set((1L, 10L), (1L, 13L)),
      "exactly the same-user in-window signups must attribute")
  }

  test("ST2/E3: scheduled mart refresh — bronze append + KPI overwrite per drain") {
    // the reference's Import-mode refresh: events land in the warehouse,
    // the measure mart is recomputed on schedule. Here: foreachBatch
    // appends idempotently to bronze, then rebuilds the mart — rerun
    // with late + duplicate events and the mart stays consistent.
    val dir = java.nio.file.Files.createTempDirectory("graft_mart")
    val src = dir.resolve("in").toString
    val bronze = dir.resolve("bronze").toString
    val mart = dir.resolve("mart").toString
    val schema = Seq(Ev(0, ts("2024-01-01 00:00:00"), 0, "x", 0.0)).toDF().schema
    def refresh(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamIngest.idempotentAppend(batch, bronze, "event_id")
          spark.read.parquet(bronze).groupBy("event_type").count()
            .write.mode("overwrite").parquet(mart)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", dir.resolve("chk").toString)
        .start()
      q.awaitTermination(60000); q.stop()
    }
    Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-01 10:00:01"), 8, "view", 2.0)).toDF().write.parquet(src)
    refresh()
    // second refresh: one new event + one duplicate delivery of event 1
    Seq(Ev(3, ts("2024-01-01 11:00:00"), 7, "view", 3.0),
      Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0)).toDF()
      .write.mode("append").parquet(src)
    refresh()
    val kpis = spark.read.parquet(mart).as[(String, Long)].collect().toMap
    assert(kpis === Map("signup" -> 1L, "view" -> 2L),
      "duplicate delivery must not inflate the refreshed mart")
  }

  test("ST1: idempotent sink append — replayed batch adds nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val batch = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-01 10:00:01"), 8, "view", 2.0)).toDF()
    StreamIngest.idempotentAppend(batch, dir, "event_id")
    StreamIngest.idempotentAppend(batch, dir, "event_id") // replay
    assert(spark.read.parquet(dir).count() === 2)
  }

  import org.apache.spark.sql.functions.{col, lit, to_date, to_timestamp}

  test("ST1: partitioned idempotent sink — duplicate delivery across batches deduped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psink").toString + "/t"
    val day = to_date(col("ts"))
    val b1 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-02 10:00:01"), 8, "view", 2.0)).toDF()
    StreamIngest.idempotentAppendPartitioned(b1, dir, "event_id", "day", day)
    // batch 2: at-least-once retry of event 1 + a genuinely new event
    val b2 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(3, ts("2024-01-03 11:00:00"), 7, "purchase", 9.0)).toDF()
    StreamIngest.idempotentAppendPartitioned(b2, dir, "event_id", "day", day)
    val ids = spark.read.parquet(dir).select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L), "retry must land exactly once")
  }

  test("ST1: pendingRows prunes the sink scan to the batch's own partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/t"
    val day = to_date(col("ts"))
    val sink3days = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-02 10:00:01"), 8, "view", 2.0),
      Ev(3, ts("2024-01-03 11:00:00"), 7, "purchase", 9.0)).toDF()
    StreamIngest.idempotentAppendPartitioned(sink3days, dir, "event_id", "day", day)
    // batch touches ONE of the three sink partitions
    val batch = Seq(Ev(4, ts("2024-01-02 12:00:00"), 9, "view", 1.0)).toDF()
      .withColumn("day", day)
    val pending = StreamIngest.pendingRows(batch, dir, "event_id", "day")
    val sinkScans = pending.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.partitionFilters.nonEmpty => s
    }
    assert(sinkScans.nonEmpty, "sink scan must carry PartitionFilters")
    assert(sinkScans.head.partitionFilters.mkString.contains("day"),
      "pruning must be on the partition column")
    assert(pending.select("event_id").as[Long].collect().toSeq === Seq(4L))
  }

  test("ST1: NULL partition value still dedups (HIVE default partition)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nullpart").toString + "/t"
    val b = Seq((1L, null.asInstanceOf[String], "a"), (2L, "2024-01-01", "b"))
      .toDF("event_id", "day_src", "v")
    StreamIngest.idempotentAppendPartitioned(b, dir, "event_id", "day", col("day_src"))
    StreamIngest.idempotentAppendPartitioned(b, dir, "event_id", "day", col("day_src"))
    assert(spark.read.parquet(dir).count() === 2,
      "null-partition rows must not re-land on retry")
  }

  test("ST1: batch spanning more partitions than maxParts falls back to full anti-join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_horizon").toString + "/t"
    val day = to_date(col("ts"))
    val b = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-02 10:00:01"), 8, "view", 2.0),
      Ev(3, ts("2024-01-03 11:00:00"), 7, "purchase", 9.0)).toDF()
    StreamIngest.idempotentAppendPartitioned(b, dir, "event_id", "day", day)
    val batchWithPart = b.withColumn("day", day)
    // horizon violated (3 partitions > maxParts=2): still correct, just unpruned
    val pending = StreamIngest.pendingRows(batchWithPart, dir, "event_id", "day", maxParts = 2)
    assert(pending.count() === 0, "fallback path must still anti-join everything")
  }

  test("ST1/E2: streamed ingest through the partitioned upsert sink, retries absorbed") {
    import graft.streaming.ParquetUpsertSink
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert")
    val sink = new ParquetUpsertSink(dir.resolve("bronze").toString,
      "event_id", "day", to_date(col("ts")))
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.upsert(batch, id)
        sink.upsert(batch, id) // foreachBatch is at-least-once: replay the epoch
      }
      .option("checkpointLocation", dir.resolve("chk").toString)
      .start()
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(2, ts("2024-01-02 10:00:01"), 8, "view", 2.0))
    q.processAllAvailable()
    // cross-batch duplicate delivery on top of the in-batch replay
    in.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0),
      Ev(3, ts("2024-01-03 11:00:00"), 7, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.read.parquet(dir.resolve("bronze").toString)
      .select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L), "every delivery lands exactly once")
  }

  test("S3/ST1/E2: file-tail push source -> webhook parse -> partitioned sink, restart-safe") {
    // the reference's always-on POST endpoint re-expressed as a file-tail
    // stream (each landed file = a batch of webhook deliveries): parse ->
    // envelope -> idempotent partitioned bronze sink, drained with
    // AvailableNow per schedule; kill/resume on the same checkpoint must
    // neither lose nor duplicate, including a re-delivered envelope id.
    import graft.ingest.Webhook
    import graft.streaming.ParquetUpsertSink
    val dir = java.nio.file.Files.createTempDirectory("graft_push")
    val src = dir.resolve("in"); java.nio.file.Files.createDirectories(src)
    val bronze = dir.resolve("bronze").toString
    def body(id: Long, event: String): String =
      s"""{"webhook_event": {"id": $id, "event": "$event", "try_count": 1, "data": {"id": ${id + 500}}}}"""
    def land(name: String, lines: String*): Unit =
      java.nio.file.Files.write(src.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
    val sink = new ParquetUpsertSink(bronze, "id", "office", col("office"))
    def drain(): Unit = {
      val q = spark.readStream.text(src.toString)
        .select(lit("office_a").as("account"), col("value").as("body"),
          to_timestamp(lit("2025-09-30 12:00:00")).as("received_at"))
        .writeStream
        .foreachBatch { (posts: org.apache.spark.sql.DataFrame, id: Long) =>
          val parsed = Webhook.parsed(posts, Seq("office_a"))
          sink.upsert(Webhook.envelope(parsed), id)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", dir.resolve("chk").toString)
        .start()
      q.awaitTermination(60000); q.stop()
    }
    land("f1.jsonl", body(1, "lead.creation"), body(2, "lead.step.changed"))
    drain()
    assert(spark.read.parquet(bronze).count() === 2)
    // query DOWN; new file lands with one retry (id 1) + one new delivery
    land("f2.jsonl", body(1, "lead.creation"), body(3, "lead.deleted"))
    drain() // restart from checkpoint: only f2 processed, retry absorbed
    val got = spark.read.parquet(bronze)
    assert(got.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L),
      "restart must deliver each envelope exactly once")
    assert(got.columns.contains("raw_data"), "bronze keeps the raw archive (S10)")
  }

  test("JdbcUpsertSink emits the reference's conflict statement per dialect") {
    import graft.streaming.JdbcUpsertSink
    val pg = new JdbcUpsertSink("jdbc:postgresql://wh/db", "events", "event_id")
    assert(pg.upsertSql(Seq("event_id", "ts", "value")) ===
      "INSERT INTO events (event_id, ts, value) VALUES (?, ?, ?) " +
        "ON CONFLICT (event_id) DO NOTHING")
    val mg = new JdbcUpsertSink("jdbc:x://wh/db", "events", "event_id", dialect = "merge")
    val sql = mg.upsertSql(Seq("event_id", "value"))
    assert(sql.contains("MERGE INTO events t") && sql.contains("ON t.event_id = s.event_id"))
    intercept[IllegalArgumentException] {
      new JdbcUpsertSink("jdbc:x", "t", "k", dialect = "nope").upsertSql(Seq("k"))
    }
  }

  test("ST1: unreadable (non-path-missing) sink fails loudly, never duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badsink").resolve("t")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("part-0000.parquet"),
      "this is not parquet".getBytes("UTF-8"))
    val batch = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0)).toDF()
    intercept[Exception] {
      StreamIngest.idempotentAppend(batch, dir.toString, "event_id")
    }
  }

  test("ST12: delta publication emits only real changes; snapshot stays newest-wins") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_cdc")
    val snap = base.resolve("snapshot").toString
    val delta = base.resolve("deltas").toString
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.publishDeltas(b, snap, delta,
          "user_id", "ts", "event_id", Seq("event_type", "value"),
          batchId = id, nBuckets = 8)
      }
      .option("checkpointLocation", base.resolve("chk").toString)
      .start()
    // batch 1: two users appear -> two inserts
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "signup", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 8L, "signup", 2.0))
    q.processAllAvailable()
    // batch 2: user 7 advances (update), user 8 gets a STALE row (no
    // delta), user 9 appears (insert), user 7 also gets a same-batch
    // older row that must lose to its newer sibling
    in.addData(
      (3L, ts("2024-01-01 12:00:00"), 7L, "purchase", 9.0),
      (4L, ts("2024-01-01 09:00:00"), 7L, "view", 0.5),
      (5L, ts("2024-01-01 10:30:00"), 8L, "view", 0.1),
      (6L, ts("2024-01-01 12:30:00"), 9L, "signup", 3.0))
    q.processAllAvailable()
    // batch 3: a newer row for user 9 with IDENTICAL values — state
    // refreshes, but no delta is published
    in.addData((7L, ts("2024-01-01 13:00:00"), 9L, "signup", 3.0))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.read.parquet(delta)
      .select("user_id", "change_type").as[(Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(deltas === Map(
      (7L, "insert") -> 1, (8L, "insert") -> 1, (9L, "insert") -> 1,
      (7L, "update") -> 1))
    val state = spark.read.parquet(snap)
      .select("user_id", "event_id", "event_type").as[(Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(state === Map(
      7L -> ((3L, "purchase")), 8L -> ((2L, "signup")), 9L -> ((7L, "signup"))))
  }

  test("ST12: a replayed batch replaces, not duplicates, its delta partition") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdc_replay")
    val snap = base.resolve("snapshot").toString
    val delta = base.resolve("deltas").toString
    val b1 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "signup", 1.0)).toDF()
    def run() = StreamIngest.publishDeltas(b1, snap, delta, "user_id", "ts",
      "event_id", Seq("event_type", "value"), batchId = 0L, nBuckets = 4)
    run()
    // retry AFTER the snapshot rewrite (failure before checkpoint
    // commit): recomputes empty deltas, must leave batch 0's rows alone
    run()
    def deltaRows() = spark.read.parquet(delta).select("user_id", "change_type")
      .as[(Long, String)].collect().toSeq
    assert(deltaRows() === Seq((7L, "insert")))
    // retry BEFORE the snapshot rewrite landed: same epoch recomputes
    // the same deltas and must REPLACE its partition, not append
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(snap))
    run()
    assert(deltaRows() === Seq((7L, "insert")))
  }

  test("ST13: drift PSI is ~zero on the baseline mix, positive when skewed, NULL on new types") {
    val baseline = Seq(("view", 0.5), ("click", 0.5)).toDF("event_type", "base_p")
    // day 1 matches the baseline exactly; day 2 is 90/10 skewed;
    // day 3 introduces a type the baseline never saw
    val counts = Seq(
      (ts("2024-02-01 00:00:00"), "view", 50L), (ts("2024-02-01 00:00:00"), "click", 50L),
      (ts("2024-02-02 00:00:00"), "view", 90L), (ts("2024-02-02 00:00:00"), "click", 10L),
      (ts("2024-02-03 00:00:00"), "view", 50L), (ts("2024-02-03 00:00:00"), "mystery", 50L))
      .toDF("day_start", "event_type", "n")
    val out = StreamIngest.psiAgainstBaseline(counts, baseline)
      .select("day_start", "event_type", "psi_term")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("2024-02-01", "view")) === Some(0.0))
    assert(out(("2024-02-02", "view")).exists(_ > 0.1), "skew must score high")
    assert(out(("2024-02-02", "click")).exists(_ > 0.1), "shrinkage scores too")
    assert(out(("2024-02-03", "mystery")) === None,
      "never-seen category surfaces as NULL, not dropped")
  }

  test("ST11: streaming admission keeps the corpus content-duplicate-free") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_admit")
    val sink = base.resolve("corpus").toString
    val idx = base.resolve("index").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamIngest.admitToCorpus(b, sink, idx)
      }
      .option("checkpointLocation", base.resolve("chk").toString)
      .start()
    in.addData((1L, "alpha beta gamma delta epsilon"), (2L, "one two three four five"))
    q.processAllAvailable()
    // batch 2: a re-crawl of doc 1 under a NEW id (by-id idempotence
    // can't catch it), a senior-batch dup, and two genuinely new docs
    in.addData((10L, "alpha beta gamma delta epsilon"),
      (11L, "fresh words appearing here first"),
      (12L, "fresh words appearing here first"),
      (13L, "completely different final content"))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(sink).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 11L, 13L))
    // the index tracks the sink row-for-row (it IS the next batch's corpus side)
    val idxIds = spark.read.parquet(idx).select("doc_id").as[Long].collect().sorted
    assert(idxIds.toSeq === got.toSeq)
  }

  test("ST25: streaming semantic admission — cold start, e24-twin equivalence, " +
      "pruned index read, replay idempotence") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_semadmit")
    val sink = base.resolve("corpus").toString
    val idx = base.resolve("index").toString
    val emb = Tables.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    def slice(m: Long) = emb.filter(col("vec_id") % 3 === m)
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2, b3) = (slice(0), slice(1), slice(2))
    val tau = 0.4
    // an empty batch before any data must write NOTHING — a
    // zero-centroid index would disable admission forever
    StreamIngest.semAdmitToCorpus(
      emb.limit(0).toDF("vec_id", "embedding"), sink, idx, batchId = -1L, tau = tau)
    assert(!new java.io.File(s"$idx/centroids").exists(),
      "an empty batch must not seed the index")
    val in = MemoryStream[(Long, Array[Float])]
    val q = in.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.semAdmitToCorpus(b, sink, idx, batchId = id, tau = tau)
      }
      .option("checkpointLocation", base.resolve("chk").toString)
      .start()
    in.addData(b1); q.processAllAvailable()
    // cold start: the pinned admit-all path seeds the corpus verbatim
    val after1 = spark.read.parquet(sink).select("vec_id").as[Long].collect().toSet
    assert(after1 === b1.map(_._1).toSet, "cold start admits the whole first batch")
    in.addData(b2); q.processAllAvailable()
    // warm batch ≡ the oracle-gated batch twin: same prefix-seed
    // centroids (√|b1| over the SAME corpus), and bucket pruning is a
    // superset of the probed cells, so verdicts must be identical
    val expected2 = graft.similarity.Ann.incrementalSemAdmit(
        emb.filter(col("vec_id") % 3 === 0), emb.filter(col("vec_id") % 3 === 1), tau)
      .filter(col("admitted") === 1).select("vec_id").as[Long].collect().toSet
    val after2 = spark.read.parquet(sink).select("vec_id").as[Long].collect().toSet
    assert((after2 -- after1) === expected2,
      "streaming admission must equal the e24 batch twin on the same corpus")
    assert(expected2.size < b2.size, s"non-trivial split at $sfDir")
    in.addData(b3); q.processAllAvailable()
    q.stop()
    val after3 = spark.read.parquet(sink).select("vec_id").as[Long].collect().toSet
    // soundness: every rejected batch-3 vector has a TRUE cosine >= tau
    // senior (corpus or a smaller-id batch-3 vector)
    val vecs = emb.as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    b3.map(_._1).filterNot(after3).foreach { rid =>
      val seniors = after2 ++ b3.map(_._1).filter(_ < rid)
      assert(seniors.exists(s => cos(vecs(rid), vecs(s)) >= tau),
        s"rejected $rid must have a justifying >=tau senior")
    }
    // the cells index tracks the sink row-for-row
    val idxIds = spark.read.parquet(s"$idx/cells")
      .select("vec_id").as[Long].collect().toSet
    assert(idxIds === after3, "index rows track the admitted corpus")
    // replay idempotence: re-running a fully committed batch under its
    // ORIGINAL epoch id overwrites its own partitions, appending nothing
    StreamIngest.semAdmitToCorpus(
      b3.toDF("vec_id", "embedding"), sink, idx, batchId = 2L, tau = tau)
    val replayed = spark.read.parquet(sink).count()
    assert(replayed === after3.size.toLong,
      "a foreachBatch retry of a committed batch must append nothing")
    // the standing-index read is partition-pruned by the probed buckets
    val prunedPlan = spark.read.parquet(s"$idx/cells")
      .filter(col("cell_bucket").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") &&
      prunedPlan.contains("cell_bucket"),
      s"bucket filter must prune index partitions:\n$prunedPlan")
  }

  test("ST14: stream-stream correlate matches across micro-batches, bounds by tolerance") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamIngest.correlateStreams(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      buys.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts", "30 minutes")
    val q = joined.select("user_id", "click_id", "purchase_id")
      .writeStream.format("memory").queryName("st14_out")
      .outputMode("append").start()
    // micro-batch 1: a click, no purchase yet — nothing emits, the
    // click waits in the join state store
    clicks.addData((7L, 1L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // micro-batch 2: one purchase inside the 30-minute tolerance (must
    // match the BUFFERED click from batch 1), one outside it (must not)
    buys.addData((7L, 2L, ts("2024-01-01 10:20:00")),
      (7L, 3L, ts("2024-01-01 11:30:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT user_id, click_id, purchase_id FROM st14_out")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 1L, 2L)))
  }

  test("ST18: streaming per-key top-k converges to the batch heap-operator twin") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.topKPerKeyStream(spark, in.toDS(), k = 3)
      .writeStream.format("memory").queryName("st18_out").outputMode("update").start()
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 5.0),
      Ev(2, ts("2024-01-01 10:01:00"), 7, "view", 9.0),
      Ev(3, ts("2024-01-01 10:02:00"), 7, "view", 1.0),
      Ev(4, ts("2024-01-01 10:03:00"), 7, "view", 9.0), // tie with 2 -> id asc
      Ev(5, ts("2024-01-01 10:04:00"), 8, "view", 2.0),
      Ev(6, ts("2024-01-01 10:05:00"), 7, "view", 7.0),
      Ev(7, ts("2024-01-01 10:06:00"), 7, "view", 0.5), // never enters top-3
      Ev(8, ts("2024-01-01 10:07:00"), 8, "view", Double.NaN)) // SQL: NaN greatest
    in.addData(evs.take(3): _*)
    q.processAllAvailable()
    in.addData(evs(3), evs(4))
    q.processAllAvailable()
    in.addData(evs(5), evs(6), evs(6), evs(7)) // duplicate delivery of 6
    q.processAllAvailable()
    // last emitted ranking per (user, rank) = the standing leaderboard
    val fin = spark.table("st18_out")
      .as[graft.streaming.StreamIngest.TopKEntry].collect()
      .zipWithIndex
      .groupBy(e => (e._1.user_id, e._1.rank)).view
      .mapValues(_.maxBy(_._2)._1).values.toSeq
      // ranks beyond a key's final depth can linger from earlier
      // batches only if the key SHRANK — impossible here (append-only)
    q.stop()
    // Scala tuple equality unboxes Doubles to primitive == (NaN is
    // never equal to itself) — compare on canonicalized bits instead
    def norm(t: (Long, Int, Long, Double)) =
      (t._1, t._2, t._3, java.lang.Double.doubleToLongBits(
        if (t._4.isNaN) Double.NaN else t._4))
    val got = fin.map(e => norm((e.user_id, e.rank, e.event_id, e.value))).toSet
    // batch twin: the heap operator over the full event set
    val batch = graft.operators.TopK.perKey(
        evs.toDF().select(col("user_id"), col("event_id"), col("value")),
        Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3)
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("value").desc, col("event_id").asc)))
      .select(col("user_id"), col("rank"), col("event_id"), col("value"))
      .as[(Long, Int, Long, Double)].collect().map(norm).toSet
    assert(got == batch)
    val bits9 = java.lang.Double.doubleToLongBits(9.0)
    assert(got.contains((7L, 1, 2L, bits9)) && got.contains((7L, 2, 4L, bits9)),
      "value tie must break by event_id asc")
  }

  test("ST24: streaming covariance moment fold equals the batch table") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val dims = 4
    val in = MemoryStream[Array[Float]]
    val q = StreamIngest.covarianceStream(spark, in.toDS(), dims)
      .writeStream.format("memory").queryName("st24_out").outputMode("update").start()
    // deterministic vectors with correlated + anti-correlated dims,
    // sized to cross several micro-batches
    val vecs = (0 until 90).map { k =>
      Array((k % 7 - 3).toFloat, (k % 7 - 3) * 0.5f + (k % 3).toFloat,
        (3 - k % 7).toFloat, (k % 5 - 2) * 0.25f)
    }
    in.addData(vecs.take(30): _*)
    q.processAllAvailable()
    in.addData(vecs.slice(30, 60): _*)
    q.processAllAvailable()
    in.addData(vecs.drop(60): _*)
    q.processAllAvailable()
    // standing view = the LAST emitted row per (i, j)
    val fin = spark.table("st24_out")
      .as[graft.streaming.StreamIngest.CovCell].collect()
      .zipWithIndex
      .groupBy(e => (e._1.i, e._1.j)).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(c => (c.i, c.j, java.lang.Double.doubleToLongBits(c.cov))).toSet
    q.stop()
    val batch = graft.similarity.Ann.covarianceTable(
        vecs.zipWithIndex.map { case (v, k) => (k.toLong, v) }
          .toDF("vec_id", "embedding"), dims)
      .select("i", "j", "cov").as[(Int, Int, Double)].collect()
      .map(c => (c._1, c._2, java.lang.Double.doubleToLongBits(c._3))).toSet
    assert(fin.size === dims * (dims - 1) / 2)
    assert(fin === batch,
      s"streaming moment fold $fin must equal the batch table $batch")
  }

  test("ST23: streaming HLL fold equals the batch sketch (redeliveries included)") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.hllDistinctStream(spark, in.toDS())
      .writeStream.format("memory").queryName("st23_out").outputMode("update").start()
    // enough distinct users per group that several registers are hit
    val evs = (1 to 60).map(i =>
      Ev(i.toLong, ts("2024-01-01 10:00:00"), 1000L + i % 40, "view", 1.0)) ++
      (61 to 80).map(i =>
        Ev(i.toLong, ts("2024-01-01 11:00:00"), 2000L + i, "click", 1.0))
    in.addData(evs.take(30): _*)
    q.processAllAvailable()
    in.addData(evs.slice(30, 60) ++ evs.take(5): _*) // duplicate delivery
    q.processAllAvailable()
    in.addData(evs.drop(60): _*)
    q.processAllAvailable()
    // standing estimate per group = the LAST emitted row
    val fin = spark.table("st23_out")
      .as[graft.streaming.StreamIngest.HllEstimate].collect()
      .zipWithIndex
      .groupBy(_._1.event_type).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(e => (e.event_type, e.m_hit.toLong, e.hll_est)).toSet
    q.stop()
    val batch = graft.sketch.Sketches.hllDistinct(
        evs.toDF(), col("event_type"), col("user_id"))
      .as[(String, Long, Long)].collect().toSet
    assert(fin == batch, s"streaming fold $fin must equal batch sketch $batch")
  }

  test("ST19: streaming KMV distinct fold equals the batch sketch (redeliveries included)") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // k = 4 so the "view" group (6 distinct users) exercises the
    // estimate branch while "click" (2 users) stays on the exact branch
    val q = StreamIngest.kmvDistinctStream(spark, in.toDS(), k = 4)
      .writeStream.format("memory").queryName("st19_out").outputMode("update").start()
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 101, "view", 1.0),
      Ev(2, ts("2024-01-01 10:01:00"), 102, "view", 1.0),
      Ev(3, ts("2024-01-01 10:02:00"), 201, "click", 1.0),
      Ev(4, ts("2024-01-01 10:03:00"), 103, "view", 1.0),
      Ev(5, ts("2024-01-01 10:04:00"), 101, "view", 1.0), // repeat user
      Ev(6, ts("2024-01-01 10:05:00"), 104, "view", 1.0),
      Ev(7, ts("2024-01-01 10:06:00"), 202, "click", 1.0),
      Ev(8, ts("2024-01-01 10:07:00"), 105, "view", 1.0),
      Ev(9, ts("2024-01-01 10:08:00"), 106, "view", 1.0))
    in.addData(evs.take(4): _*)
    q.processAllAvailable()
    in.addData(evs(4), evs(5), evs(6), evs(4)) // duplicate delivery
    q.processAllAvailable()
    in.addData(evs.drop(7): _*)
    q.processAllAvailable()
    // standing estimate per group = the LAST emitted row
    val fin = spark.table("st19_out")
      .as[graft.streaming.StreamIngest.KmvEstimate].collect()
      .zipWithIndex
      .groupBy(_._1.event_type).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(e => (e.event_type, e.n_kept, e.est_distinct)).toSet
    q.stop()
    val batch = graft.sketch.Sketches.kmvDistinct(
        evs.toDF(), col("event_type"), col("user_id"), k = 4)
      .as[(String, Double)].collect().toMap
    assert(fin.map(t => (t._1, t._3)).toMap == batch,
      s"streaming fold $fin must equal batch sketch $batch")
    // exact branch: click has 2 < k distinct users -> exact count
    assert(fin.contains(("click", 2, 2.0)))
    // estimate branch engaged: view retains exactly k hashes
    assert(fin.exists(t => t._1 == "view" && t._2 == 4))
  }

  test("ST21: streaming Theil-Sen fold equals the batch twin; outlier day cannot move it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.theilSenStream(spark, in.toDS())
      .writeStream.format("memory").queryName("st21_out").outputMode("update").start()
    // "view": a clean slope-2 daily ramp (1,3,5,7 events on days 1-4),
    // then a 40-day gap to day 44 — the ramp falls OUT of the 30-day
    // band, so the standing slope is computed over days 44-46 only.
    // "click": linear days 1-4 plus an outlier day 5 (100 events) —
    // the lower median over C(5,2)=10 slopes stays uncontaminated.
    def evs(day: Int, tp: String, n: Int, base: Long) = {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1L)
      (0 until n).map(i => Ev(base + i, ts(s"$d 10:00:00"), 100, tp, 1.0))
    }
    val b1 = evs(1, "view", 1, 1000) ++ evs(2, "view", 3, 2000) ++
      evs(1, "click", 2, 3000) ++ evs(2, "click", 4, 4000)
    val b2 = evs(3, "view", 5, 5000) ++ evs(4, "view", 7, 6000) ++
      evs(3, "click", 6, 7000) ++ evs(4, "click", 8, 8000)
    val b3 = evs(44, "view", 2, 9000) ++ evs(45, "view", 9, 10000) ++
      evs(46, "view", 4, 11000) ++ evs(5, "click", 100, 12000)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(b3: _*); q.processAllAvailable()
    val fin = spark.table("st21_out")
      .as[graft.streaming.StreamIngest.TheilSenRow].collect()
      .zipWithIndex
      .groupBy(_._1.event_type).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(r => (r.event_type, r.day.toString, r.n_pairs, r.slope)).toSet
    q.stop()
    val all = b1 ++ b2 ++ b3
    val batch = StreamIngest.theilSenBatchTwin(all.toDF())
      .as[(String, java.sql.Date, Long, Double)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4)).toSet
    assert(fin == batch, s"streaming fold $fin must equal batch twin $batch")
    // band expiry engaged: view's standing slope uses days 44-46
    // (= 2024-02-13..15) only — 3 days, 3 pairs; slopes {7, -5, 1},
    // lower median 1.0 — the expired slope-2 ramp contributes nothing
    val view = fin.find(_._1 == "view").get
    assert(view._2 == "2024-02-15" && view._3 == 3L && view._4 == 1.0,
      s"view band: $view")
    // robustness: click's lower median over C(5,2)=10 slopes ignores
    // the day-5 outlier (100 events) — the uncontaminated slope is 2.0
    val click = fin.find(_._1 == "click").get
    assert(click._2 == "2024-01-05" && click._3 == 10L && click._4 == 2.0,
      s"click robust slope: $click")
  }

  test("ST22: streaming CUSUM fold equals the batch twin; band expiry engaged") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.cusumStream(spark, in.toDS())
      .writeStream.format("memory").queryName("st22_out").outputMode("update").start()
    def evs(day: Int, tp: String, n: Int, base: Long) = {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1L)
      (0 until n).map(i => Ev(base + i, ts(s"$d 10:00:00"), 100, tp, 1.0))
    }
    // "view": low level (10,10,10) then a shift to 20s — but the low
    // days land 40+ days before the final ones, so the band EXPIRES
    // them and the standing row is computed over days 44-46 only.
    // "click": the clean level shift inside one band — 10,10,10 then
    // 20,20,20; the peak |Σ(n·D−T)| sits on the last low day (day 3).
    val b1 = evs(1, "view", 10, 1000) ++ evs(2, "view", 10, 2000) ++
      evs(1, "click", 10, 3000) ++ evs(2, "click", 10, 4000)
    val b2 = evs(3, "view", 10, 5000) ++
      evs(3, "click", 10, 6000) ++ evs(4, "click", 20, 7000)
    val b3 = evs(44, "view", 20, 8000) ++ evs(45, "view", 20, 9000) ++
      evs(46, "view", 20, 10000) ++
      evs(5, "click", 20, 11000) ++ evs(6, "click", 20, 12000)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    in.addData(b3: _*); q.processAllAvailable()
    val fin = spark.table("st22_out")
      .as[graft.streaming.StreamIngest.CusumRow].collect()
      .zipWithIndex
      .groupBy(_._1.event_type).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(r => (r.event_type, r.change_day.toString, r.cusum_peak, r.n_days, r.total))
      .toSet
    q.stop()
    val all = b1 ++ b2 ++ b3
    val batch = StreamIngest.cusumBatchTwin(all.toDF())
      .as[(String, java.sql.Date, Long, Long, Long)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4, r._5)).toSet
    assert(fin == batch, s"streaming fold $fin must equal batch twin $batch")
    // click: D=6, T=90 → cusum −30,−60,−90,−60,−30,0 → peak 90 on day 3
    val click = fin.find(_._1 == "click").get
    assert(click == (("click", "2024-01-03", 90L, 6L, 90L)), s"click: $click")
    // view: constant 20s inside the band → every cusum 0, earliest
    // band day wins — the expired low-level days contribute nothing
    val view = fin.find(_._1 == "view").get
    assert(view == (("view", "2024-02-13", 0L, 3L, 60L)), s"view: $view")
  }

  test("ST20: streaming EWMA fold equals the batch twin across micro-batches") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamIngest.ewmaStream(spark, in.toDS())
      .writeStream.format("memory").queryName("st20_out").outputMode("update").start()
    // two types; "view" spans 16 days so the oldest days fall OUT of
    // the 14-day band; day 5 is a gap (missing days renormalize)
    def ev(id: Long, day: Int, tp: String) =
      Ev(id, ts(f"2024-01-$day%02d 10:00:00"), 100 + id, tp, 1.0)
    val evs = Seq(
      ev(1, 1, "view"), ev(2, 1, "view"), ev(3, 2, "view"),
      ev(4, 3, "click"), ev(5, 4, "view"), ev(6, 4, "view"),
      ev(7, 6, "view"), ev(8, 16, "view"), ev(9, 16, "view"),
      ev(10, 16, "click"), ev(11, 17, "view"))
    in.addData(evs.take(4): _*)
    q.processAllAvailable()
    in.addData(evs.slice(4, 8): _*)
    q.processAllAvailable()
    in.addData(evs.drop(8): _*)
    q.processAllAvailable()
    // the standing row per type = the LAST emitted row
    val fin = spark.table("st20_out")
      .as[graft.streaming.StreamIngest.EwmaRow].collect()
      .zipWithIndex
      .groupBy(_._1.event_type).view
      .mapValues(_.maxBy(_._2)._1).values
      .map(r => (r.event_type, r.day.toString, r.n, r.ewma)).toSet
    q.stop()
    val batch = StreamIngest.ewmaBatchTwin(evs.toDF())
      .as[(String, java.sql.Date, Long, Double)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4)).toSet
    assert(fin == batch, s"streaming fold $fin must equal batch twin $batch")
    // the 14-day band really engaged: view's latest day is Jan 17, so
    // Jan 1-2 (distance 15-16) are out of state and out of the smooth
    assert(fin.exists(t => t._1 == "view" && t._2 == "2024-01-17"))
  }

  test("ST18: leaderboard state survives a checkpoint restart") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_restart")
    val src = dir.resolve("in").toString
    val sink = dir.resolve("out").toString
    val chk = dir.resolve("chk").toString
    val b1 = Seq(Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 5.0),
      Ev(2, ts("2024-01-01 10:00:01"), 7, "view", 8.0)).toDF()
    b1.write.parquet(src)
    def drain(): Unit = {
      val in = spark.readStream.schema(b1.schema).parquet(src).as[Ev]
      val q = StreamIngest.topKPerKeyStream(spark, in, k = 2)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.StreamIngest.TopKEntry],
           id: Long) =>
            b.toDF().withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink): Unit
        }
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    drain()
    // new events land while the query is DOWN; 6.0 displaces 5.0 only
    // if the restarted state still remembers 8.0 from before
    Seq(Ev(3, ts("2024-01-01 10:00:02"), 7, "view", 6.0),
      Ev(4, ts("2024-01-01 10:00:03"), 9, "view", 1.0)).toDF()
      .write.mode("append").parquet(src)
    drain()
    val out = spark.read.parquet(sink)
    val last = out.as[(Long, Int, Long, Double, Long)].collect()
      .groupBy(e => (e._1, e._2)).view.mapValues(_.maxBy(_._5)).toMap
    // user 7's post-restart leaderboard: 8.0 (pre-restart state) over
    // 6.0 (post-restart event) — a lost state store would rank 6.0 first
    assert(last((7L, 1))._3 === 2L && last((7L, 1))._4 === 8.0)
    assert(last((7L, 2))._3 === 3L && last((7L, 2))._4 === 6.0)
    assert(last((9L, 1))._3 === 4L)
  }
}
