package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round breadth-first search — min-hop distances from a seed
  * set (the "who is within k hops of these accounts" reachability
  * question behind fraud rings, blast-radius analysis, and influence
  * seeding). Pregel's BFS expressed declaratively: each round joins
  * the current distance table to the edge list and folds with
  * `min(hops)` — all arithmetic is small exact integers, so the
  * result is bit-reproducible and an identically-unrolled SQL oracle
  * hash-matches (the g1 fixed-round recipe applied to reachability).
  *
  * Scale: the symmetrized edge list materializes ONCE (recomputable
  * persist — the PageRank rationale); each round shuffles only the
  * distance table, |reached| rows of (id, long), and the min-hop fold
  * has map-side partial aggregation. Rounds are a fixed constant, so
  * the plan is statically bounded; frontiers that saturate early just
  * stop growing (min keeps the first label).
  */
object Bfs {

  /** @param pairs   undirected edge list; first two columns are the
    *                (castable-to-long) node ids. Deduplicated and
    *                symmetrized internally.
    * @param seeds   seed nodes (first column, castable to long) — hop 0.
    * @param maxHops fixed round count — NOT convergence-tested, so the
    *                unrolled SQL oracle reproduces the exact result.
    * @return (node_id, hops) — every node reachable within `maxHops`,
    *         seeds included at 0; min hop count per node.
    */
  def hops(pairs: DataFrame, seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    val c = pairs.columns
    val e0 = pairs
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = seeds
      .select(col(seeds.columns.head).cast("long").as("node")).distinct()
      .withColumn("hops", lit(0L))
    (1 to maxHops)
      .foldLeft(init) { (d, _) =>
        val expanded = edges
          .join(d.select(col("node").as("u"), col("hops")), "u")
          .select(col("v").as("node"), (col("hops") + 1L).as("hops"))
        d.union(expanded).groupBy(col("node")).agg(min(col("hops")).as("hops"))
      }
      .select(col("node").as("node_id"), col("hops"))
  }
}
