package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline: the banded linear formulation must equal the quadratic
  * domination definition on adversarial shapes — ties, duplicates,
  * single-band degeneracy, and random clouds. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force domination check (the definition). */
  private def bruteSkyline(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { p =>
      !pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Int)], bands: Int): Set[Long] =
    Skyline.skyline2d(pts.toDF("id", "price", "size"), "price", "size", bands)
      .select("id").as[Long].collect().toSet

  test("matches brute-force domination on a deterministic random cloud") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, 900.0 + rnd.nextInt(1000) / 10.0, 1 + rnd.nextInt(50)))
    assert(run(pts, bands = 8) === bruteSkyline(pts))
    // band count must not matter, including the single-band degenerate case
    assert(run(pts, bands = 1) === bruteSkyline(pts))
    assert(run(pts, bands = 64) === bruteSkyline(pts))
  }

  test("exact duplicate optimal pairs all survive; dominated ties die") {
    val pts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5),   // duplicate pair on the front — both stay
      (3L, 10.0, 4),                  // same price, smaller size — dominated
      (4L, 9.0, 5),                   // cheaper, same size — dominates 1/2? no: price 9 < 10, size equal → dominates
      (5L, 20.0, 9))                  // bigger but pricier — on the front
    val got = run(pts, bands = 4)
    assert(got === bruteSkyline(pts))
    assert(got === Set(4L, 5L)) // 4 dominates 1,2,3 (cheaper, size ≥)
  }

  test("all-identical input keeps every row") {
    val pts = Seq((1L, 5.0, 3), (2L, 5.0, 3), (3L, 5.0, 3))
    assert(run(pts, bands = 4) === Set(1L, 2L, 3L))
  }
}
