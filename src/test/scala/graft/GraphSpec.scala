package graft

import org.apache.spark.sql.functions._

import graft.graph.{Bfs, PageRank}

/** Fixed-point PageRank: the properties that make an iterative graph
  * computation trustworthy at scale — determinism under repartitioning
  * (the whole point of integer arithmetic), bounded mass, and the
  * structural sanity of the ranking itself. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // path a-b-c-d plus a hub e connected to everything: e must rank top.
  private def toyPairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L),
    (5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)).toDF("a", "b")

  test("k-core peeling cascades: marginal chains fall, the clique survives") {
    // 4-clique {1,2,3,4} + tail 4-5-6 + triangle {7,8,9} + a cascade
    // pair: 10 has degree 3 (to 1, 2, 11) but depends on 11 (degree 2)
    // — round 1 peels 11 (and 5, 6, the triangle), round 2 peels 10.
    // One degree filter would KEEP 10; the iteration is the operator.
    val g = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L),
      (10L, 1L), (10L, 2L), (10L, 11L), (11L, 3L)).toDF("a", "b")
    val core = graft.graph.KCore.kcore(g, k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be exactly the clique at clique degrees: $core")
    // duplicate/reversed edges collapse before peeling
    val noisy = g.union(g.select(col("b"), col("a"))).union(g)
    val core2 = graft.graph.KCore.kcore(noisy, k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(core2 === core, "noisy edge list must peel identically")
  }

  test("per-node clustering coefficient: triangle corners, wedges-only nodes, leaves") {
    // triangle 1-2-3 plus a pendant 4 off node 3 and an isolated edge 5-6
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("a", "b")
    val cc = graft.graph.Triangles.perNode(g)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(cc(1L) === ((2L, 1L, 1.0)))       // in the triangle, fully closed
    assert(cc(2L) === ((2L, 1L, 1.0)))
    assert(cc(3L) === ((3L, 1L, round6(2.0 / 6.0)))) // 1 of 3 neighbor pairs closed
    assert(cc(4L) === ((1L, 0L, 0.0)))       // leaf: degree < 2 reports 0
    assert(cc(5L) === ((1L, 0L, 0.0)))
    // duplicate + reversed edges collapse before counting
    val dup = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L))
      .toDF("a", "b")
    val cc2 = graft.graph.Triangles.perNode(dup)
      .as[(Long, Long, Long, Double)].collect()
    assert(cc2.forall(r => r._2 == 2L && r._3 == 1L && r._4 == 1.0),
      s"clean triangle from noisy edges: ${cc2.toSeq}")
  }

  private def round6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("hub node ranks first; every incident node appears exactly once") {
    val r = PageRank.fixedPoint(toyPairs, iterations = 3)
      .orderBy(col("rank_fp").desc, col("node_id"))
      .as[(Long, Long)].collect()
    assert(r.length === 5)
    assert(r.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(r.head._1 === 5L) // the hub
    // symmetric positions rank identically: 1~4 and 2~3 by graph symmetry
    val m = r.toMap
    assert(m(1L) === m(4L))
    assert(m(2L) === m(3L))
  }

  test("bit-identical under repartitioning and input row order") {
    def run(df: org.apache.spark.sql.DataFrame) =
      PageRank.fixedPoint(df, iterations = 3)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val base = run(toyPairs)
    assert(run(toyPairs.repartition(7)) === base)
    assert(run(toyPairs.orderBy(col("b"))) === base)
    // duplicate edges must not change the graph (distinct inside)
    assert(run(toyPairs.union(toyPairs)) === base)
  }

  test("triangle stats: known graph, celebrity hub, duplicate/reversed edges") {
    import graft.graph.Triangles
    // K4 has 4 triangles; an extra pendant edge adds none.
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)) :+ (4L, 9L)
    val r = Triangles.stats(k4.toDF("a", "b"))
      .as[(Long, Long, Long)].head()
    assert(r === ((5L, 7L, 4L)))
    // duplicate + reversed edges must not change counts
    val noisy = k4 ++ k4.map(_.swap)
    assert(Triangles.stats(noisy.toDF("a", "b"))
      .as[(Long, Long, Long)].head() === ((5L, 7L, 4L)))
    // star graph (celebrity node): many wedges, zero triangles
    val star = (2L to 30L).map(i => (1L, i))
    assert(Triangles.stats(star.toDF("a", "b"))
      .as[(Long, Long, Long)].head() === ((30L, 29L, 0L)))
  }

  test("weighted PageRank: heavy edges pull rank; unit weights reduce to unweighted") {
    // star: node 9 heavily tied to the hub, others lightly
    val wPairs = Seq((1L, 9L, 10L), (1L, 2L, 1L), (1L, 3L, 1L)).toDF("a", "b", "w")
    val r = PageRank.fixedPointWeighted(wPairs, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(9L) > r(2L) && r(9L) > r(3L),
      "the heavy neighbor must outrank the light ones")
    assert(r(2L) === r(3L), "symmetric light neighbors rank identically")
    // all-unit weights must reproduce the unweighted recurrence exactly
    val pairs = toyPairs
    val unit = PageRank.fixedPointWeighted(
        pairs.withColumn("w", lit(1L)), iterations = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val plain = PageRank.fixedPoint(pairs, iterations = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(unit === plain)
  }

  test("total mass stays within floor-loss of SCALE and every rank is positive") {
    val r = PageRank.fixedPoint(toyPairs, iterations = 3)
      .agg(sum(col("rank_fp")), min(col("rank_fp"))).as[(Long, Long)].head()
    assert(r._1 <= PageRank.Scale)
    // floor loss per iteration is < |E|+|V| units of 10^-12
    assert(r._1 > PageRank.Scale - 1000L)
    assert(r._2 > 0L)
  }

  test("BFS hops: min distances, round bound, unreachable nodes absent") {
    // path 1-2-3-4 plus a shortcut 1-3 (min must win: hops(3)=1, not
    // 2), an isolated component 8-9, and seed 7 with no edges at all
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (8L, 9L))
      .toDF("u", "v")
    val seeds = Seq(1L, 7L).toDF("node")
    val got = Bfs.hops(edges, seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 7L -> 0L))
    // the round bound truncates: from seed 4, node 1 is 2 hops via the
    // shortcut — with maxHops = 1 only the direct neighbor appears
    val bounded = Bfs.hops(edges, Seq(4L).toDF("node"), maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(bounded === Map(4L -> 0L, 3L -> 1L))
  }
}
