package graft

import graft.operators.Sequence
import org.apache.spark.sql.functions._

class SequenceSpec extends SparkSpec {
  import spark.implicits._

  test("gap audit: intra-bucket, boundary, and whole-missing-bucket gaps; duplicates collapse") {
    // bucketSize 10 → buckets [0..9], [10..19], [20..29], [30..39]:
    //   ids 1,2,5 (gap 3-4 INSIDE bucket 0), 9,10 (no gap across the
    //   0|1 boundary), 12, then nothing until 31 — a gap 13-30 that
    //   swallows ALL of bucket 2 (boundary stitch must bridge the
    //   empty bucket), 31,31,33 (duplicate id; gap 32).
    val ids = Seq(1L, 2L, 5L, 9L, 10L, 12L, 31L, 31L, 33L).toDF("id")
    val got = Sequence.gaps(ids, col("id"), bucketSize = 10L)
      .orderBy("gap_start").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 4L, 2L), (6L, 8L, 3L), (11L, 11L, 1L),
      (13L, 30L, 18L), (32L, 32L, 1L)))
  }

  test("gap audit: bucketed rewrite equals the global-window definition on random sets") {
    val rng = new scala.util.Random(7)
    val ids = Seq.fill(400)(rng.nextInt(2000).toLong).distinct
    val df = ids.toDF("id").repartition(13)
    def global(xs: Seq[Long]): Seq[(Long, Long, Long)] = {
      val s = xs.sorted
      s.zip(s.tail).collect { case (a, b) if b > a + 1 => (a + 1, b - 1, b - 1 - a) }
    }
    for (bs <- Seq(1L, 7L, 100L, 1000000L)) {
      val got = Sequence.gaps(df, col("id"), bucketSize = bs)
        .orderBy("gap_start").as[(Long, Long, Long)].collect().toSeq
      assert(got === global(ids), s"bucketSize=$bs diverged from the lead() definition")
    }
  }

  test("gap audit: a dense or single-id sequence has no gaps") {
    assert(Sequence.gaps((1L to 50L).toDF("id"), col("id"), 7L).count() === 0L)
    assert(Sequence.gaps(Seq(42L).toDF("id"), col("id"), 7L).count() === 0L)
  }
}
