package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over basket co-occurrence — the classic
  * support / confidence / lift triple (Agrawal-Srikant a-priori at the
  * 2-itemset level), the "customers who bought A also bought B" engine
  * behind the reference README's cross-sell dashboard ambitions.
  *
  * Semantics are set-based: support counts DISTINCT baskets containing
  * both items (duplicate lines of the same item in one basket count
  * once), so the numbers are probabilities over baskets —
  * conf(a→b) = P(b|a), lift = P(a,b)/(P(a)P(b)).
  *
  * Scale posture: the basket→pair expansion rides the same
  * collect-per-basket + in-row pair enumeration as mb1 (bounded by the
  * largest basket, never a shuffled self-join); item counts are one
  * aggregate over the deduplicated presence table; the basket total is
  * ONE scalar broadcast. All counts are exact integers — conf/lift are
  * single double divisions of exact integers, rounded at 4dp for
  * display only.
  */
object MarketBasket {

  /** Directed 2-item association rules.
    *
    * @param presence   deduplicated basket membership: (basket, item) —
    *                   first two columns, castable to long.
    * @param minSupport minimum distinct-basket co-occurrence count for
    *                   a pair to produce rules.
    * @return (antecedent, consequent, support, n_ante, n_cons,
    *         confidence, lift) — two directed rows per surviving pair.
    */
  def rules(presence: DataFrame, minSupport: Long): DataFrame = {
    val c = presence.columns
    // ONE shuffle by basket builds the deduplicated item-set table
    // (collect_set collapses duplicate lines in-aggregate — a separate
    // distinct would shuffle the presence rows a second time);
    // materialized because pair expansion, item counts, and the basket
    // total all read it, and it is the post-aggregation SMALL frame
    // (one row per basket).
    val baskets = presence
      .select(col(c(0)).as("basket"), col(c(1)).cast("long").as("item"))
      .groupBy(col("basket"))
      .agg(collect_set(col("item")).as("items"))
      .localCheckpoint(true)
    val pairs = baskets
      .select(explode(
        graft.functions.PairExpressions.sortedPairs(col("items"))).as("q"))
      .select(col("q.u").as("u"), col("q.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val itemN = baskets.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
    val total = baskets.select(count(lit(1)).as("n_baskets"))
    // both rule directions from one undirected pair row; item counts
    // broadcast (bounded by the item catalog), the basket total is a
    // single-row broadcast cross join — no extra shuffle past the pair
    // aggregate itself.
    val directed = pairs
      .select(col("u").as("antecedent"), col("v").as("consequent"), col("support"))
      .union(pairs
        .select(col("v").as("antecedent"), col("u").as("consequent"), col("support")))
    directed
      .join(broadcast(itemN.select(col("item").as("antecedent"), col("n").as("n_ante"))),
        "antecedent")
      .join(broadcast(itemN.select(col("item").as("consequent"), col("n").as("n_cons"))),
        "consequent")
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_ante"), col("n_cons"),
        round(col("support").cast("double") / col("n_ante"), 4).as("confidence"),
        // denominator factors cast to double BEFORE the multiply: at
        // billions of baskets per item the long×long product would
        // silently wrap 64-bit (DuckDB's HUGEINT would not), diverging
        // at exactly the scale the oracle can't reach
        round(col("support").cast("double") * col("n_baskets") /
          (col("n_ante").cast("double") * col("n_cons").cast("double")), 4)
          .as("lift"))
  }

  /** [[rules]] fed from a PREBUILT pair table (the session-warmed
    * `Marts.basketPairs` — pairs already support-filtered on
    * distinct-basket co-occurrence). Item counts and the basket total
    * come straight off the deduplicated presence rows — one exchange of
    * slim (basket, item) pairs, no collect_set, no basket array
    * materialization — so the query pays ONLY the small-side
    * aggregations and two broadcast joins; the expansion lives in the
    * mart (paid once per session, like mb1/g-family). Result is
    * bit-identical to [[rules]]: same support construction, and itemN/
    * total over distinct presence equal the basket-array counts by the
    * set semantics (MarketBasketSpec pins the equality). */
  def rulesFromPairs(pairs: DataFrame, presence: DataFrame): DataFrame = {
    val c = presence.columns
    val dedup = presence
      .select(col(c(0)).as("basket"), col(c(1)).cast("long").as("item"))
      .distinct()
      .localCheckpoint(true) // feeds itemN and the basket total
    val itemN = dedup.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val total = dedup.select(countDistinct(col("basket")).as("n_baskets"))
    val directed = pairs
      .select(col("u").as("antecedent"), col("v").as("consequent"), col("support"))
      .union(pairs
        .select(col("v").as("antecedent"), col("u").as("consequent"), col("support")))
    directed
      .join(broadcast(itemN.select(col("item").as("antecedent"), col("n").as("n_ante"))),
        "antecedent")
      .join(broadcast(itemN.select(col("item").as("consequent"), col("n").as("n_cons"))),
        "consequent")
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_ante"), col("n_cons"),
        round(col("support").cast("double") / col("n_ante"), 4).as("confidence"),
        round(col("support").cast("double") * col("n_baskets") /
          (col("n_ante").cast("double") * col("n_cons").cast("double")), 4)
          .as("lift"))
  }
}
