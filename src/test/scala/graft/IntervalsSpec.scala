package graft

import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Banded point-in-interval join: the banding rewrite must be
  * invisible in the result — same pairs as the plain non-equi join on
  * every band-boundary alignment. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val B = 100L // band width for the tests

  private def plainJoin(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
        points("k") === intervals("ik") &&
          points("us") >= intervals("lo") && points("us") <= intervals("hi"))
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet

  private def banded(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    Intervals.bandedContainmentJoin(points, "k", "us",
        intervals, "ik", "lo", "hi", bandMicros = B)
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet

  test("banded join equals the plain containment join on boundary alignments") {
    // intervals deliberately hitting every band-boundary case: inside
    // one band, exactly band-aligned, spanning 2 and 4 bands, zero
    // -length, and ending exactly on a boundary
    val intervals = Seq(
      (1L, 10L, 110L, 190L),  // inside band 1
      (1L, 11L, 100L, 199L),  // exactly band 1
      (1L, 12L, 150L, 250L),  // spans bands 1-2
      (1L, 13L, 90L, 410L),   // spans bands 0-4
      (1L, 14L, 300L, 300L),  // zero-length
      (1L, 15L, 100L, 200L),  // ends exactly ON a boundary (inclusive)
      (2L, 20L, 110L, 190L)   // other key, same span as 10
    ).toDF("ik", "iid", "lo", "hi")
    val points = Seq(
      (1L, 100L, 110L), (1L, 101L, 150L), (1L, 102L, 199L),
      (1L, 103L, 200L), (1L, 104L, 250L), (1L, 105L, 300L),
      (1L, 106L, 89L), (1L, 107L, 411L), (1L, 108L, 410L),
      (2L, 200L, 150L), (3L, 300L, 150L)
    ).toDF("k", "pid", "us")
    val exp = plainJoin(points, intervals)
    val got = banded(points, intervals)
    assert(got === exp, s"banded must equal plain: missing=${exp -- got} extra=${got -- exp}")
    // sanity on the cases themselves: boundary point 200 hits the
    // inclusive-end interval 15 and the spanning 12/13
    assert(exp.contains((103L, 15L)) && exp.contains((103L, 12L)) &&
      exp.contains((103L, 13L)))
    // zero-length interval matches exactly its instant
    assert(exp.contains((105L, 14L)))
    // no cross-key leakage
    assert(!exp.exists { case (p, i) => p == 300L } &&
      exp.contains((200L, 20L)))
  }

  test("negative (pre-epoch) timestamps and inverted intervals band correctly") {
    val intervals = Seq(
      (1L, 1L, -250L, -50L),  // spans negative band boundaries
      (1L, 2L, -50L, 50L),    // straddles zero
      (1L, 3L, 90L, 10L)      // INVERTED: matches nothing (BETWEEN is empty);
                              // unguarded, sequence() would step DOWNWARD
    ).toDF("ik", "iid", "lo", "hi")
    val points = Seq(
      (1L, 1L, -250L), (1L, 2L, -100L), (1L, 3L, -50L), (1L, 4L, 0L),
      (1L, 5L, 50L), (1L, 6L, -251L), (1L, 7L, 20L))
      .toDF("k", "pid", "us")
    assert(banded(points, intervals) === plainJoin(points, intervals),
      "banded must equal plain on negative domains and inverted intervals")
  }

  test("a point never duplicates against a multi-band interval") {
    val intervals = Seq((1L, 1L, 0L, 1000L)).toDF("ik", "iid", "lo", "hi")
    val points = Seq((1L, 1L, 500L)).toDF("k", "pid", "us")
    val rows = Intervals.bandedContainmentJoin(points, "k", "us",
        intervals, "ik", "lo", "hi", bandMicros = B).collect()
    assert(rows.length === 1, s"one containment, one row: ${rows.toSeq}")
  }
}
