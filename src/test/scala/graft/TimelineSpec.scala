package graft

import graft.operators.Timeline
import org.apache.spark.sql.functions._

class TimelineSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L // µs

  test("concurrency: overlap counting, end-inclusive ties, midnight spans, day prefix") {
    // day 0: [10, 20], [15, 30], [20, 40] — at t=20 the first interval
    // is still active (end-inclusive) and the third starts: 3 active.
    // one interval spans midnight into day 1 ([80, Day+10]), and day 1
    // has its own [Day+5, Day+6] — peak 2 there, carried by the
    // prefix offset from day 0's open interval.
    val iv = Seq(
      (10L, 20L), (15L, 30L), (20L, 40L), (80L, Day + 10L),
      (Day + 5L, Day + 6L)).toDF("a", "b")
    val got = Timeline.maxConcurrencyPerDay(iv, col("a"), col("b"))
      .orderBy("day").as[(java.sql.Date, Long)].collect().toSeq
    assert(got.map(_._2) === Seq(3L, 2L), s"got $got")
    assert(got.map(_._1.toString) === Seq("1970-01-01", "1970-01-02"))
  }

  test("concurrency: a decay-only day reports its midnight carry-in, not the post-close count") {
    // two sessions open on day 0 and close early on day 1 with no
    // day-1 starts: day 1's true peak is the carry-in 2 (both active
    // from midnight until the first close), not the post-close 1/0
    val iv = Seq((10L, Day + 100L), (20L, Day + 200L)).toDF("a", "b")
    val got = Timeline.maxConcurrencyPerDay(iv, col("a"), col("b"))
      .orderBy("day").as[(java.sql.Date, Long)].collect().toSeq
    assert(got.map(_._2) === Seq(2L, 2L), s"got $got")
  }

  test("concurrency: a session ending when another starts overlaps it (end-inclusive)") {
    val iv = Seq((0L, 100L), (100L, 200L)).toDF("a", "b")
    val got = Timeline.maxConcurrencyPerDay(iv, col("a"), col("b"))
      .as[(java.sql.Date, Long)].collect()
    assert(got.map(_._2).max === 2L)
  }

  test("concurrency: decomposed form equals a global running-sum reference") {
    val rng = new scala.util.Random(11)
    val iv = Seq.fill(300) {
      val a = rng.nextInt(5 * 86400) * 1000000L
      (a, a + rng.nextInt(3 * 86400) * 1000000L)
    }
    def globalRef(xs: Seq[(Long, Long)]): Map[String, Long] = {
      val deltas = (xs.map(x => (x._1, 1L)) ++ xs.map(x => (x._2 + 1, -1L)))
        .sortBy(t => (t._1, t._2))
      var c = 0L
      // each day's peak candidates: every in-day running value PLUS
      // the carry-in concurrency at midnight (c before the first row)
      deltas.flatMap { case (us, d) =>
        val day = java.time.LocalDate.ofEpochDay(us / Day).toString
        val carryIn = day -> c
        c += d
        Seq(carryIn, day -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    }
    val got = Timeline.maxConcurrencyPerDay(
        iv.toDF("a", "b").repartition(9), col("a"), col("b"))
      .as[(java.sql.Date, Long)].collect()
      .map(r => r._1.toString -> r._2).toMap
    assert(got === globalRef(iv))
  }
}
