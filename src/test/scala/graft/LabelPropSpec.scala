package graft

import graft.graph.LabelProp

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two triangles bridged by one edge: communities must split at the
  // bridge. Hand-computed synchronous rounds (labels start as ids):
  //   r1: 1→2, 2→1, 3→1, 4→3, 5→4, 6→4
  //   r2: 1→1, 2→1, 3→1, 4→4, 5→3, 6→3
  //   r3: 1→1, 2→1, 3→1, 4→3, 5→3, 6→3
  //   r4 = r3 (fixpoint): {1,2,3}→1, {4,5,6}→3
  private val bridged = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L),
    (3L, 4L))

  test("G10: hand-computed two-community graph reaches its fixpoint") {
    val got = LabelProp.propagate(bridged.toDF("u", "v"), rounds = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)))
  }

  test("G10: converged labeling is a fixpoint — extra rounds are no-ops") {
    val r4 = LabelProp.propagate(bridged.toDF("u", "v"), rounds = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val r6 = LabelProp.propagate(bridged.toDF("u", "v"), rounds = 6)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r4 === r6)
  }

  test("G10: intermediate rounds match the hand computation (synchronous votes)") {
    // round 2 is where synchronous vs in-place updating diverges:
    // node 5's vote must see node 4's OLD label (3), not its round-2
    // label — an in-place implementation gives node 5 a different
    // answer. The hand table above says l2(5) = 3.
    val r2 = LabelProp.propagate(bridged.toDF("u", "v"), rounds = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("G11: modularity of the bridged graph — hand-computed exact terms") {
    // m=7; both triangles: intra=3, deg_sum = 2+2+3 = 7
    // q_contrib = (4·7·3 − 49)/(4·49) = 35/196 = 0.178571 each;
    // Q = 0.357143 — genuinely modular, as the bridge structure should be
    val got = LabelProp.modularity(bridged.toDF("u", "v"), rounds = 4)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3L, 3L, 7L, 0.178571),
      (3L, 3L, 3L, 7L, 0.178571)))
    assert(math.abs(got.map(_._5).sum - 0.357142) < 1e-5)
  }

  test("G10: self-loops and duplicate edges are ignored; ties break to min label") {
    val got = LabelProp.propagate(
        Seq((7L, 7L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("u", "v"), rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 1 and 2 swap labels each round: r1 → (1→2, 2→1), r2 → (1→1, 2→2);
    // the isolated self-loop node 7 never appears (no real edges)
    assert(got === Seq((1L, 1L, 1L), (2L, 2L, 1L)))
  }
}
