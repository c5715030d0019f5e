package graft

import graft.analytics.MarketBasket
import org.apache.spark.sql.functions._

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("association rules compute basket-probability support/confidence/lift") {
    // baskets: b1={1,2,3}, b2={1,1,2} (duplicate line collapses),
    // b3={1,2}, b4={3} → N=4; pair (1,2) support 3, (1,3)/(2,3)
    // support 1 (below minSupport=2).
    val presence = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L),
      (40L, 3L)).toDF("basket", "item")
    val got = MarketBasket.rules(presence, minSupport = 2)
      .orderBy("antecedent", "consequent")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    // n(1)=3, n(2)=3, lift = 3·4/(3·3) = 1.3333
    assert(got === Seq(
      (1L, 2L, 3L, 3L, 3L, 1.0, 1.3333),
      (2L, 1L, 3L, 3L, 3L, 1.0, 1.3333)))
  }

  test("confidence is direction-sensitive") {
    // item 1 in 4 baskets, item 2 in 2, together twice:
    // conf(1→2)=0.5, conf(2→1)=1.0; lift identical both ways.
    val presence = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (4L, 1L))
      .toDF("basket", "item")
    val got = MarketBasket.rules(presence, minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((1L, 2L))._6 === 0.5)
    assert(got((2L, 1L))._6 === 1.0)
    assert(got((1L, 2L))._7 === got((2L, 1L))._7)
  }

  test("rulesFromPairs(mart pairs) is bit-identical to rules() on the harness corpus") {
    // mb2's registered path reads the basket_pairs mart; this pins the
    // refactor: the mart's pair table + slim presence aggregations
    // must reproduce the in-query collect_set construction exactly
    val presence = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val direct = MarketBasket.rules(presence, minSupport = 2)
      .orderBy("antecedent", "consequent").collect().toSeq
    val viaMart = MarketBasket.rulesFromPairs(
        graft.sources.Marts.basketPairs(spark, sfDir), presence)
      .orderBy("antecedent", "consequent").collect().toSeq
    assert(viaMart === direct)
  }
}
