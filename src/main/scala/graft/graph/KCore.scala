package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core decomposition — the survivors of repeatedly
  * peeling nodes of degree < k (the standard dense-subgraph /
  * engagement-core extraction; a node is in the k-core iff it keeps ≥k
  * neighbors AFTER everyone weaker is removed, so one degree filter is
  * not enough — peeling must iterate).
  *
  * Like [[Bfs]] and PageRank, the rounds are a FIXED constant rather
  * than convergence-tested, so the identically-unrolled SQL oracle
  * replays the exact result: after `rounds` peels the output is
  * well-defined whether or not the peeling has reached its fixpoint
  * (a converged graph just stops changing — later rounds are no-ops
  * in both engines). All arithmetic is exact integer degree counts.
  *
  * Scale: each round is one degree aggregation over the CURRENT edge
  * set plus two semi-joins against the (node-bounded, eagerly
  * materialized) survivor set — the edge set only ever SHRINKS, so
  * per-round cost is monotonically non-increasing; survivor sets are
  * checkpointed so AQE sees true sizes and broadcasts them while they
  * fit. Nothing is ever pairwise beyond the input edge list.
  */
object KCore {

  /** @param edges  undirected edge list; first two columns are the
    *               (castable-to-long) node ids. Deduplicated and
    *               canonicalized internally.
    * @param k      core order (default 3).
    * @param rounds fixed peel count — NOT convergence-tested (oracle
    *               replay; see class doc).
    * @return (node_id, degree) — nodes alive after `rounds` peels
    *         whose degree within the surviving subgraph is ≥ k,
    *         with that degree.
    */
  def kcore(edges: DataFrame, k: Int = 3, rounds: Int = 4): DataFrame = {
    val c = edges.columns
    var e = edges
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = true)
    def degrees(edges0: DataFrame): DataFrame = edges0
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    var remaining = e.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val keep = degrees(e).filter(col("d") >= k)
        .select(col("node")).localCheckpoint(eager = true)
      e = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(eager = true)
      val n = e.count() // free off the materialized checkpoint
      // fixpoint short-circuit: a peel that removed nothing makes every
      // later peel the identity — in BOTH engines, so the unrolled
      // oracle is unaffected (its remaining rounds are no-ops too)
      converged = n == remaining
      remaining = n
      r += 1
    }
    degrees(e).filter(col("d") >= k)
      .select(col("node").as("node_id"), col("d").as("degree"))
  }
}
