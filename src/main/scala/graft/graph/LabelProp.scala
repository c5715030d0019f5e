package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G10: bounded-round synchronous label propagation — community
  * detection over an undirected graph (the clustering step a mixing
  * pipeline keys on: sa3/sa4 temperature/domain mixing needs a
  * community/domain id per item, and co-purchase communities are that
  * id for the part catalog).
  *
  * Variant pinned exactly (LPA has asynchronous/random-order forms
  * that are NOT reproducible; this one is): labels start as node ids;
  * each round, EVERY node simultaneously adopts the label most
  * frequent among its neighbors, ties broken by SMALLEST label (the
  * g1/d7 determinism recipe: integer state + total ordering). Fixed
  * `rounds`, not convergence-tested, so the identically-unrolled SQL
  * oracle replays the exact result; a converged labeling makes later
  * rounds no-ops in both engines.
  *
  * Scale shape: per round ONE co-keyed shuffle join (adjacency ⋈
  * labels on the neighbor id), one count aggregation, one per-node
  * window over ≤deg(v) candidate labels. The adjacency never changes
  * (checkpointed once); label state is |V| rows. No round touches the
  * base tables.
  */
object LabelProp {

  /** @param edges  undirected edge list; first two columns are the
    *               (castable-to-long) node ids. Deduplicated and
    *               canonicalized internally; self-loops dropped.
    * @param rounds fixed synchronous vote count.
    * @return (node_id, community, community_size) — every node that
    *         has at least one edge. */
  /** Canonical undirected edge list: long ids, self-loops dropped,
    * u < v, deduplicated — the shared front of [[propagate]] and
    * [[modularity]]. */
  private def canonical(edges: DataFrame): DataFrame = {
    val c = edges.columns
    edges
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** The vote loop over an ALREADY-canonical edge list → (node, lbl). */
  private def propagateLabels(e: DataFrame, rounds: Int): DataFrame = {
    val adj = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .select(col("u").as("node"), col("v").as("nbr"))
      // r18: pre-keyed on the per-round join key (the PageRank edges
      // rationale — while the label table broadcasts the layout is
      // moot; past that scale every vote round's SMJ would re-exchange
      // and re-sort the ADJACENCY without it)
      .repartition(col("nbr")).sortWithinPartitions("nbr")
      .localCheckpoint(eager = true)
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(eager = true)
    val byVote = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("lbl"))
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nbr"), col("lbl")), "nbr")
        .groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byVote))
        .filter(col("rn") === 1)
        .select(col("node"), col("lbl"))
        .localCheckpoint(eager = true)
    }
    labels
  }

  def propagate(edges: DataFrame, rounds: Int = 4): DataFrame = {
    val labels = propagateLabels(canonical(edges), rounds)
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("community_size"))
    // no broadcast HINT: |communities| is usually ≪ |V| but worst-case
    // |V| (a labeling that never converges) — let AQE pick broadcast
    // from the measured size instead of forcing a |V|-row broadcast
    labels.join(sizes, "lbl")
      .select(col("node").as("node_id"), col("lbl").as("community"),
        col("community_size"))
  }

  /** G11: Newman modularity audit of a [[propagate]] labeling — the
    * partition-quality number that tells a mixing pipeline whether
    * g10's communities are real structure or noise (Q near 0 ⇒ the
    * strata are meaningless and sa16's rebalance is sampling noise;
    * Q ≳ 0.3 ⇒ genuine modular structure). Per community c:
    * q_contrib = e_c/m − (d_c/2m)², Q = Σ q_contrib.
    *
    * Determinism: e_c, d_c, m are exact integer counts; the only
    * division is ONE integer-ratio-to-double per community,
    * (4m·e_c − d_c²) / (4m²), rounded at 6 dp — both engines convert
    * the same exact integers, so the rounding is bit-identical (the
    * g8/e1 recipe). Integer bound: 4m² must fit int64 ⇒ m ≲ 1.5·10⁹
    * edges; past that, audit a uniform edge sample. m is ONE
    * driver-side scalar (the bounded-collect class).
    *
    * @return (community, n_nodes, intra_edges, deg_sum, q_contrib)
    *         per community, ordered. */
  def modularity(edges: DataFrame, rounds: Int = 4): DataFrame = {
    // shared canonical front, then the label-only core — not
    // propagate(), whose community_size aggregation+join this caller
    // would throw away (and whose canonicalization would re-run)
    val e = canonical(edges).localCheckpoint(eager = true)
    val m = e.count()
    val lbl = propagateLabels(e, rounds)
      .select(col("node").as("node_id"), col("lbl").as("community"))
    val nNodes = lbl.groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val intra = e
      .join(lbl.select(col("node_id").as("u"), col("community").as("cu")), "u")
      .join(lbl.select(col("node_id").as("v"), col("community").as("cv")), "v")
      .filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = e.select(explode(array(col("u"), col("v"))).as("node_id"))
      .groupBy(col("node_id")).agg(count(lit(1)).as("d"))
      .join(lbl, "node_id")
      .groupBy(col("community")).agg(sum(col("d")).as("deg_sum"))
    nNodes
      .join(intra, Seq("community"), "left")
      .join(deg, Seq("community"))
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("deg_sum"))
      // `+ 0.0` normalizes IEEE negative zero: round() of a tiny
      // negative contribution yields -0.0, whose bit pattern differs
      // from DuckDB's +0.0 under bit-tagged hashing even though the
      // values compare equal. -0.0 + 0.0 = +0.0 on both engines.
      .withColumn("q_contrib", round(
        (lit(4L * m) * col("intra_edges") - col("deg_sum") * col("deg_sum"))
          .cast("double") / lit(4.0 * m * m), 6) + lit(0.0))
      .orderBy("community")
  }

  /** Oracle SQL for [[modularity]] over the co-purchase graph. */
  def modularitySql(rounds: Int = 4): String =
    s"""WITH ${copurchaseCtes(rounds)},
       |mm AS (SELECT count(*) AS m FROM e),
       |nn AS (SELECT lbl AS community, count(*) AS n_nodes FROM l$rounds GROUP BY 1),
       |ie AS (SELECT lu.lbl AS community, count(*) AS intra_edges
       |  FROM e JOIN l$rounds lu ON lu.node = e.u
       |    JOIN l$rounds lv ON lv.node = e.v
       |  WHERE lu.lbl = lv.lbl GROUP BY 1),
       |dg AS (SELECT l.lbl AS community, CAST(sum(d.d) AS BIGINT) AS deg_sum
       |  FROM (SELECT node, count(*) AS d FROM adj GROUP BY node) d
       |  JOIN l$rounds l ON l.node = d.node GROUP BY 1)
       |SELECT nn.community, nn.n_nodes,
       |  CAST(coalesce(ie.intra_edges, 0) AS BIGINT) AS intra_edges,
       |  dg.deg_sum,
       |  round(CAST(4 * mm.m * coalesce(ie.intra_edges, 0)
       |      - dg.deg_sum * dg.deg_sum AS DOUBLE)
       |    / (4.0 * mm.m * mm.m), 6) + 0.0 AS q_contrib
       |FROM nn JOIN dg ON dg.community = nn.community
       |  LEFT JOIN ie ON ie.community = nn.community, mm
       |ORDER BY nn.community""".stripMargin

  /** The shared WITH-body of the co-purchase LPA oracles: edge build,
    * adjacency, l0, and `rounds` unrolled vote rounds ending at
    * l`rounds` (node, lbl). Reused by g10 and the sa16 community-mix
    * oracle. */
  def copurchaseCtes(rounds: Int = 4): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""l$k AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT node, lbl,
         |    row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
         |  FROM (SELECT a.node, l.lbl, count(*) AS cnt
         |    FROM adj a JOIN l${k - 1} l ON l.node = a.nbr
         |    GROUP BY a.node, l.lbl)) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |adj AS MATERIALIZED (
       |  SELECT u AS node, v AS nbr FROM e
       |  UNION ALL SELECT v AS node, u AS nbr FROM e),
       |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM adj),
       |$roundCtes""".stripMargin
  }

  /** Oracle SQL for [[propagate]] over the co-purchase graph: the
    * identical synchronous recurrence unrolled (the g7/g9 recipe;
    * label tables MATERIALIZED — each feeds the next round and the
    * final size join). */
  def copurchaseSql(rounds: Int = 4): String =
    s"""WITH ${copurchaseCtes(rounds)},
       |sz AS (SELECT lbl, count(*) AS community_size FROM l$rounds GROUP BY lbl)
       |SELECT l.node AS node_id, l.lbl AS community, sz.community_size
       |FROM l$rounds l JOIN sz ON sz.lbl = l.lbl
       |ORDER BY node_id""".stripMargin
}
