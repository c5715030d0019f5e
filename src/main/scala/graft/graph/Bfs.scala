package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round breadth-first search — min-hop distances from a seed
  * set (the "who is within k hops of these accounts" reachability
  * question behind fraud rings, blast-radius analysis, and influence
  * seeding). Pregel's BFS with DELTA FRONTIERS, expressed
  * declaratively: round h sends messages only from the nodes FIRST
  * reached at round h−1 (not the whole reached set), drops already-
  * visited targets with an anti-join, and the survivors ARE layer h —
  * a node's layer is its min hop count by BFS invariant, so no min-fold
  * re-aggregation of the full distance table is ever needed. All
  * arithmetic is small exact integers: the result is bit-identical to
  * the textbook full-relaxation recurrence, and the identically-
  * unrolled SQL oracle hash-matches (the g1 fixed-round recipe applied
  * to reachability).
  *
  * Scale: the symmetrized edge list materializes ONCE (recomputable
  * persist — the PageRank rationale), built in a single pass (explode
  * of both orientations, not a self-union that would compute the
  * upstream twice); each round's moving data is the DELTA frontier and
  * its out-neighbors, not |reached| — on a graph whose frontier
  * saturates early, later rounds cost ~nothing instead of re-shuffling
  * the whole distance table. Frontiers are eagerly materialized
  * (localCheckpoint), so their EXACT row counts are known on the
  * driver: while frontier and visited stay under `broadcastRows` the
  * round's expand-join and visited-anti-join are explicitly broadcast
  * (two map-side hash joins + one node-level dedup shuffle per round,
  * with map-side partial dedup bounding that exchange by
  * |nodes|·|map partitions|); past the threshold the hints are
  * withheld and the planner falls back to shuffle joins — the correct
  * degradation when a frontier is a billion nodes. Rounds are bounded
  * by a fixed constant; an exhausted frontier short-circuits
  * (identical result — empty frontiers expand to nothing in the
  * oracle too).
  */
object Bfs {

  /** @param pairs      undirected edge list; first two columns are the
    *                   (castable-to-long) node ids. Symmetrized
    *                   internally.
    * @param seeds      seed nodes (first column, castable to long) —
    *                   hop 0.
    * @param maxHops    fixed round count — NOT convergence-tested, so
    *                   the unrolled SQL oracle reproduces the exact
    *                   result.
    * @param dedupEdges deduplicate the edge list before the rounds
    *                   (one extra full-edge exchange). BFS results are
    *                   multiplicity-insensitive — duplicates only
    *                   multiply per-round message volume BEFORE the
    *                   map-side partial dedup — so on a near-simple
    *                   graph (duplication factor ≈ 1) the dedup
    *                   exchange costs more than it saves and callers
    *                   may turn it off; keep it on for graphs of
    *                   unknown multiplicity.
    * @param broadcastRows frontier/visited sets up to this EXACT row
    *                   count (known from the materialized checkpoint)
    *                   get broadcast-join hints; larger ones fall back
    *                   to planner-chosen shuffle joins.
    * @return (node_id, hops) — every node reachable within `maxHops`,
    *         seeds included at 0; min hop count per node.
    */
  def hops(pairs: DataFrame, seeds: DataFrame, maxHops: Int = 3,
      dedupEdges: Boolean = true, broadcastRows: Long = 4L << 20): DataFrame = {
    val c = pairs.columns
    val base = pairs
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val e0 = if (dedupEdges) base.distinct() else base
    val edges = e0
      .select(explode(array(struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      // r18: pre-keyed on the per-round expand key (the PageRank edges
      // rationale — while frontiers broadcast the layout is moot; past
      // `broadcastRows` each round's shuffle join would re-exchange and
      // re-sort the EDGES per round without it)
      .repartition(col("u")).sortWithinPartitions("u")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = seeds
      .select(col(seeds.columns.head).cast("long").as("node")).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint(eager = true)
    // layers(h) = nodes FIRST reached at hop h; their union is the
    // answer (each node appears exactly once, at its min hop)
    var layers = List(init)
    var frontierRows = init.count() // exact — counts materialized blocks
    var visitedRows = frontierRows
    var h = 1
    while (h <= maxHops && frontierRows > 0L) {
      val frontier = layers.head
      def hinted(df: DataFrame, rows: Long): DataFrame =
        if (rows <= broadcastRows) broadcast(df) else df
      val visited = layers.map(_.select(col("node"))).reduce(_ union _)
      val next = edges
        .join(hinted(frontier.select(col("node").as("u")), frontierRows), "u")
        .select(col("v").as("node"))
        // anti BEFORE distinct: the visited set only ever holds reached
        // nodes, so while it broadcasts the round's one shuffle
        // deduplicates only the genuinely-new node ids, not every message
        .join(hinted(visited, visitedRows), Seq("node"), "left_anti")
        .distinct()
        .withColumn("hops", lit(h.toLong))
        .localCheckpoint(eager = true)
      layers ::= next
      frontierRows = next.count()
      visitedRows += frontierRows
      h += 1
    }
    layers.reduce(_ union _).select(col("node").as("node_id"), col("hops"))
  }
}
