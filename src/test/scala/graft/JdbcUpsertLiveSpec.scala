package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.streaming.JdbcUpsertSink

/** Drives [[JdbcUpsertSink]] against a LIVE JDBC connection — embedded
  * Derby (in Spark's own classpath), in-memory database shared across
  * the local executor threads. Round 7's gap: the sink had per-dialect
  * SQL but no test ever opened a real connection, so the executor-side
  * prepare/bind/batch/commit loop (the mirror of the reference's
  * psycopg2 loop, webhook_app.py:38-49) ran for the first time at a
  * user's Postgres. The `derby` dialect's MERGE..WHEN NOT MATCHED is
  * the same insert-if-absent contract as `ON CONFLICT (id) DO NOTHING`.
  */
class JdbcUpsertLiveSpec extends SparkSpec {
  import spark.implicits._

  // keep Derby's log out of the repo
  System.setProperty("derby.system.home",
    Files.createTempDirectory("derby_home").toString)

  private val url = "jdbc:derby:memory:upsertdb;create=true"

  private def withTable[A](name: String)(f: => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        s"CREATE TABLE $name (event_id BIGINT PRIMARY KEY, event_type VARCHAR(32), value DOUBLE)")
    } finally conn.close()
    f
  }

  private def tableRows(name: String): Map[Long, (String, Double)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT event_id, event_type, value FROM $name")
      val b = Map.newBuilder[Long, (String, Double)]
      while (rs.next()) b += rs.getLong(1) -> (rs.getString(2), rs.getDouble(3))
      b.result()
    } finally conn.close()
  }

  test("live upsert: replayed batch and overlapping batch are first-wins no-ops") {
    withTable("events_t1") {
      val sink = new JdbcUpsertSink(url, "events_t1", "event_id", dialect = "derby")
      val batch1 = Seq((1L, "signup", 10.0), (2L, "purchase", 20.0), (3L, "view", 30.0))
        .toDF("event_id", "event_type", "value").repartition(4)
      sink.upsert(batch1, batchId = 0L)
      assert(tableRows("events_t1") === Map(
        1L -> ("signup", 10.0), 2L -> ("purchase", 20.0), 3L -> ("view", 30.0)))

      // foreachBatch is at-least-once: the SAME epoch replays on retry
      sink.upsert(batch1, batchId = 0L)
      // an overlapping later batch must not clobber existing keys
      val batch2 = Seq((2L, "CHANGED", 99.0), (4L, "click", 40.0))
        .toDF("event_id", "event_type", "value")
      sink.upsert(batch2, batchId = 1L)

      assert(tableRows("events_t1") === Map(
        1L -> ("signup", 10.0), 2L -> ("purchase", 20.0),
        3L -> ("view", 30.0), 4L -> ("click", 40.0)))
    }
  }

  test("live upsert: intra-batch duplicate keys insert exactly once") {
    withTable("events_t2") {
      val sink = new JdbcUpsertSink(url, "events_t2", "event_id", dialect = "derby")
      val dup = Seq((7L, "a", 1.0), (7L, "a", 1.0), (8L, "b", 2.0))
        .toDF("event_id", "event_type", "value").repartition(3)
      sink.upsert(dup, batchId = 0L)
      val rows = tableRows("events_t2")
      assert(rows.keySet === Set(7L, 8L))
      assert(rows(8L) === ("b", 2.0))
    }
  }

  test("live upsert agrees with the parquet test-double on the same replay sequence") {
    withTable("events_t3") {
      val out = Files.createTempDirectory("pq_double").toString + "/events"
      val sink = new JdbcUpsertSink(url, "events_t3", "event_id", dialect = "derby")
      val double_ = new graft.streaming.ParquetUpsertSink(
        out, "event_id", "day", to_date(lit("2024-01-01")))
      val batches = Seq(
        Seq((1L, "signup", 10.0), (2L, "purchase", 20.0)),
        Seq((2L, "purchase", 20.0), (3L, "view", 30.0)), // overlap
        Seq((1L, "REPLAY", 99.0), (4L, "click", 40.0))) // stale replay of key 1
      batches.zipWithIndex.foreach { case (b, i) =>
        val df = b.toDF("event_id", "event_type", "value")
        sink.upsert(df, i.toLong)
        double_.upsert(df, i.toLong)
      }
      val jdbc = tableRows("events_t3").map { case (k, (t, v)) => (k, t, v) }.toSet
      val lake = spark.read.parquet(out)
        .select("event_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSet
      assert(jdbc === lake, "warehouse and lake sinks must converge to the same state")
    }
  }
}
