package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics on a handcrafted frame: backward match,
  * inclusive ties, no-match nulls, per-key isolation, and the
  * deterministic tie-break among equal right timestamps. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // after r1, before r2
    (2L, 10L, ts("2024-01-01 12:00:00")), // exactly at r2 (inclusive)
    (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row
    (4L, 20L, ts("2024-01-01 10:00:00"))  // other key: no right rows at all
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 09:00:00"), 101L),
    (10L, ts("2024-01-01 12:00:00"), 102L),
    (10L, ts("2024-01-01 12:00:00"), 103L) // same ts: max id must win
  ).toDF("user_id", "r_ts", "r_id")

  private lazy val out = AsOf
    .asOfBackward(left, right, Seq("user_id"), "ts", "r_ts")
    .select("event_id", "r_id").as[(Long, Option[Long])]
    .collect().toMap

  test("backward match picks the latest right row at or before the left ts") {
    assert(out(1L) === Some(101L))
  }

  test("equal timestamps match inclusively, tie-broken to the max payload") {
    assert(out(2L) === Some(103L))
  }

  test("left rows with no preceding right row get NULL payload") {
    assert(out(3L) === None)
    assert(out(4L) === None, "matches must not leak across keys")
  }

  private lazy val fwd = AsOf
    .asOfForward(left, right, Seq("user_id"), "ts", "r_ts")
    .select("event_id", "r_id").as[(Long, Option[Long])]
    .collect().toMap

  test("forward match picks the earliest right row at or after the left ts") {
    assert(fwd(1L) === Some(102L), "next right after 10:00 is the 12:00 pair, min id wins")
    assert(fwd(3L) === Some(101L))
  }

  test("forward: equal timestamps match inclusively, tie-broken to the min payload") {
    assert(fwd(2L) === Some(102L))
  }

  test("forward: left rows with no following right row get NULL payload") {
    assert(fwd(4L) === None, "matches must not leak across keys")
    val lateLeft = Seq((9L, 10L, ts("2024-01-01 13:00:00"))).toDF("event_id", "user_id", "ts")
    val late = AsOf.asOfForward(lateLeft, right, Seq("user_id"), "ts", "r_ts")
      .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
    assert(late(9L) === None)
  }

  test("trailing-window sum equals the naive RANGE frame (peers + boundary)") {
    import graft.operators.TrailingWindow
    import org.apache.spark.sql.expressions.Window
    // handcrafted: same-timestamp peers (2,3), an exact-boundary row
    // (1 at t=0 with window 10 probed from t=10), and a separate key
    val rows = Seq(
      (1L, 10L, 0L, 1.0), (2L, 10L, 5L, 2.0), (3L, 10L, 5L, 4.0),
      (4L, 10L, 10L, 8.0), (5L, 10L, 16L, 16.0), (6L, 20L, 5L, 32.0)
    ).toDF("event_id", "user_id", "us", "value")
    def naive(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"),
        sum(col("value").cast("decimal(18,2)"))
          .over(Window.partitionBy(col("user_id")).orderBy(col("us"))
            .rangeBetween(-10L, 0L)).cast("double").as("t"))
    val fast = TrailingWindow
      .trailingSumMicros(rows, Seq("user_id"), "us", col("value"), 10L, "t")
      .select("event_id", "t").as[(Long, Double)].collect().toMap
    val slow = naive(rows).as[(Long, Double)].collect().toMap
    assert(fast === slow)
    // peers see each other; t=10 still includes the t=0 boundary row
    assert(fast(2L) === 7.0 && fast(3L) === 7.0)
    assert(fast(4L) === 15.0)
    assert(fast(5L) === 24.0, "t=16 window [6,16] must drop rows at t<=5")
    // and on real data
    val ev = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val f2 = TrailingWindow
      .trailingSumMicros(ev, Seq("user_id"), "us", col("value"), 604800000000L, "t")
      .select("event_id", "t").as[(Long, Double)].collect().toMap
    val s2 = ev.select(col("event_id"),
        sum(col("value").cast("decimal(18,2)"))
          .over(Window.partitionBy(col("user_id")).orderBy(col("us"))
            .rangeBetween(-604800000000L, 0L)).cast("double").as("t"))
      .as[(Long, Double)].collect().toMap
    assert(f2 === s2)
  }

  test("as-of equals the quadratic reference formulation on real data") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"),
        col("event_id").as("signup_event_id"))
    val fast = AsOf.asOfBackward(purchases, signups, Seq("user_id"), "ts", "signup_ts")
    // reference: inequality join + keep the max (signup_ts, signup_event_id)
    val slow = purchases.as("p")
      .join(signups.as("s"),
        col("p.user_id") === col("s.user_id") && col("signup_ts") <= col("p.ts"),
        "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max(struct(col("signup_ts"), col("signup_event_id"))).as("m"))
      .select(col("event_id"), col("m.signup_ts").as("signup_ts"),
        col("m.signup_event_id").as("signup_event_id"))
    val a = fast.select("event_id", "signup_ts", "signup_event_id")
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    val b = slow.collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(a === b)
  }
}
