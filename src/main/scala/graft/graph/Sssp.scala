package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single-source-set shortest paths (min-plus
  * Bellman–Ford) — cheapest-cost reachability from a seed set over a
  * weighted undirected graph ("how tightly is this account coupled to
  * the flagged ring", influence cost, routing over affinity graphs).
  *
  * Unlike BFS ([[Bfs]]), a node's best distance can IMPROVE in later
  * rounds (a longer-hop path can be cheaper), so delta frontiers don't
  * apply: each round relaxes every edge out of the current distance
  * table and min-folds — dist_h = min(dist_{h−1}, min_{(u,v,w)}
  * dist_{h−1}(u) + w). All arithmetic is exact 64-bit integers, and
  * the round count is a FIXED constant (never convergence-tested), so
  * the identically-unrolled SQL oracle replays the result bit-for-bit
  * — the g1/g5 fixed-round recipe applied to min-plus.
  *
  * Scale: the symmetrized weighted edge list materializes once
  * (recomputable persist — the PageRank rationale); each round
  * shuffles only the node-bounded distance table (|V| rows of
  * (id, long)), joined to the edges with map-side min partials.
  * Rounds are eagerly checkpointed because each round references its
  * predecessor TWICE (the union and the relax join) — without
  * materialization lineage doubles per round.
  */
object Sssp {

  /** @param edges  undirected weighted edge list; columns (castable to
    *               long) u, v, w. Symmetrized internally; self-loops
    *               dropped.
    * @param seeds  seed nodes (first column) — distance 0.
    * @param rounds fixed relaxation count (paths of ≤ `rounds` edges).
    * @return (node_id, dist) — min cost over paths of ≤ rounds edges
    *         from any seed; seeds at 0, unreached nodes absent.
    */
  def boundedMinPlus(edges: DataFrame, seeds: DataFrame,
      rounds: Int = 3): DataFrame = {
    val c = edges.columns
    val base = edges
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"),
        col(c(2)).cast("long").as("w"))
      .filter(col("u") =!= col("v"))
    val sym = base
      .select(explode(array(struct(col("u"), col("v"), col("w")),
        struct(col("v").as("u"), col("u").as("v"), col("w")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.w").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = seeds
      .select(col(seeds.columns.head).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(eager = true)
    var h = 0
    while (h < rounds) {
      val relaxed = sym
        .join(dist.select(col("node").as("u"), col("dist")), "u")
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = true)
      h += 1
    }
    dist.select(col("node").as("node_id"), col("dist"))
  }
}
