package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "signup", 10.0),
    (2L, ts("2024-01-01 11:00:00"), 7L, "purchase", 20.0),
    (3L, ts("2024-01-01 09:00:00"), 8L, "signup", 30.0))

  private def df(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("S6: dedup is idempotent — ingest(xs ++ xs) == ingest(xs)") {
    val once = Events.dedupFirstWins(df(evs), Seq("event_id"), Seq(col("ts").asc))
    val twice = Events.dedupFirstWins(df(evs ++ evs), Seq("event_id"), Seq(col("ts").asc))
    assert(twice.count() === once.count())
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("W1: latestState equals fold over time-sorted events") {
    val latest = Events.latestState(df(evs), Seq("user_id"), col("ts"), col("event_id"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    val expected = evs.groupBy(_._3).view.mapValues(_.maxBy(e => (e._2.getTime, e._1))._1).toMap
    assert(latest === expected)
  }

  test("J4: activeSet = created minus deleted by key") {
    val created = Seq(1L, 2L, 3L).toDF("lead_id")
    val deleted = Seq(2L).toDF("lead_id")
    assert(Events.activeSet(created, deleted, "lead_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("U2: hist/live merge collapses overlap duplicates") {
    val hist = df(evs.take(2))
    val live = df(evs.drop(1))
    assert(Events.mergeHistLive(hist, live).count() === 3)
  }

  test("S5: office routing filters to whitelist with a partition column") {
    val routed = Events.routeOffices(df(evs), col("user_id"), Seq("office_1"))
    assert(routed.select("user_id").as[Long].collect().toSet === Set(7L))
  }

  test("U6: snapshotDiff classifies insert/update/delete, drops unchanged, null-safe") {
    // key 1: unchanged (dropped); key 2: value change; key 3: deleted;
    // key 4: inserted; key 5: NULL -> value transition must be 'update'
    // (a value-equality compare would drop it as NULL-unknown).
    val oldSnap = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)),
      (3L, Some("c"), Some(3.0)), (5L, None: Option[String], Some(5.0)))
      .toDF("user_id", "type", "value")
    val newSnap = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(9.0)),
      (4L, Some("d"), Some(4.0)), (5L, Some("e"), Some(5.0)))
      .toDF("user_id", "type", "value")
    val diff = Events.snapshotDiff(oldSnap, newSnap, Seq("user_id"), Seq("type", "value"))
      .select("user_id", "change_type").as[(Long, String)].collect().toMap
    assert(diff === Map(2L -> "update", 3L -> "delete", 4L -> "insert", 5L -> "update"))
  }
}
