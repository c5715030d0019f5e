package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting via degree-ordered orientation — the classic
  * bound that makes wedge enumeration feasible at scale (Suri &
  * Vassilvitskii's MapReduce formulation): orient every undirected
  * edge from its lower-(degree, id) endpoint to the higher one, so
  * each node's out-degree is O(√m) and the wedge join generates
  * O(m^1.5) candidates TOTAL instead of Σ deg² (a single celebrity
  * node in a naive wedge join yields deg² ≈ n² wedges; ordered by
  * degree it yields at most m).
  *
  * Every step is a join or aggregation on the edge table — the
  * document/fact corpus never enters — and the count is exact, so the
  * SQL oracle (canonical a<b<c triple join) hash-matches.
  */
object Triangles {

  /** @param edges undirected simple graph; first two columns are the
    *              node ids (castable to long). Deduplicated and
    *              canonicalized internally.
    * @return one row: (n_nodes, n_edges, n_triangles).
    */
  def stats(edges: DataFrame): DataFrame = {
    val c = edges.columns
    // canonical u < v edge list, checkpointed: consumed by the degree
    // table, the wedge join, AND the closure probe.
    val canon = edges
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val sym = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    // orient x→y iff (d(x), x) < (d(y), y): total order, acyclic.
    val oriented = sym
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("s"), col("v").as("t"))
    // wedges from a common source; t1 < t2 canonicalizes the probe.
    // INNER join, not semi: distinct wedges closing the same edge are
    // distinct triangles, so join multiplicity IS the count.
    val wedges = oriented.as("a")
      .join(oriented.as("b"), col("a.s") === col("b.s"))
      .filter(col("a.t") < col("b.t"))
      .select(col("a.t").as("u"), col("b.t").as("v"))
    val tri = wedges.join(canon, Seq("u", "v"))
    sym.select(countDistinct(col("u")).as("n_nodes"))
      .crossJoin(canon.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Per-node triangle participation and local clustering coefficient
    * — cc(v) = triangles through v / (deg(v)·(deg(v)−1)/2), the
    * standard "how clique-like is this node's neighborhood" signal
    * (spam-farm and bot-ring detection reads low cc at high degree).
    *
    * Same degree-ordered O(m^1.5) wedge enumeration as [[stats]], but
    * the closure keeps all three endpoints and explodes each found
    * triangle to its corners before the per-node rollup — one extra
    * narrow exchange of 3·|triangles| rows over the global count.
    * (The oriented frame's two wedge-join branches are served by one
    * exchange via ReuseExchange; an eager-checkpoint A/B measured
    * slower — the added materialization jobs cost more than the
    * reuse saves.) Exact integer counts; cc is a single final
    * division — the SQL oracle (canonical a<b<c triple join, corners
    * unnested) hash-matches. Nodes with degree < 2 report cc = 0.
    *
    * @return (node_id, degree, n_triangles, clustering_coeff).
    */
  def perNode(edges: DataFrame): DataFrame = {
    val c = edges.columns
    val canon = edges
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val sym = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    val oriented = sym
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("s"), col("v").as("t"))
    val wedges = oriented.as("a")
      .join(oriented.as("b"), col("a.s") === col("b.s"))
      .filter(col("a.t") < col("b.t"))
      .select(col("a.s").as("s"), col("a.t").as("u"), col("b.t").as("v"))
    val corners = wedges.join(canon, Seq("u", "v"))
      .select(explode(array(col("s"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("u").as("node"), col("d"))
      .join(corners, Seq("node"), "left")
      .select(col("node").as("node_id"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("d") >= 2,
          round(coalesce(col("n_triangles"), lit(0L)).cast("double") * 2.0 /
            (col("d") * (col("d") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }
}
