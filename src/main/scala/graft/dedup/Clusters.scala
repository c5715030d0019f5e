package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster induction: connected components over the near-dup
  * pair graph (MinHash-LSH verified pairs, [[Dedup.minhashLshPairs]]),
  * so "keep one doc per duplicate *family*" — the step after pairwise
  * dedup in a training-data pipeline (a transitive family {a~b, b~c}
  * must collapse to ONE representative even when a~c was never emitted
  * as a pair).
  *
  * Algorithm: bounded min-label propagation — every node starts with
  * its own id as label and repeatedly takes the min of its own and its
  * neighbors' labels. `iterations` bounds the propagation diameter;
  * duplicate families are near-cliques (every member overlaps the same
  * base document), so their diameter is tiny and the default converges
  * with a wide margin (measured: both harness SFs converge by round 3;
  * the default keeps a 2× margin). The iteration count is FIXED, not
  * convergence-tested, so an identically-unrolled SQL oracle reproduces
  * the result exactly even in the (never-observed) non-converged case.
  *
  * Scale: each iteration is one self-equi-join on node id — shuffle of
  * the (tiny) label table, never of document bodies. At 100 TB the
  * label table is |docs-with-a-dup-edge| rows (orders of magnitude
  * smaller than the corpus); for adversarially long chains switch the
  * final iterations to large-star/small-star alternation, which
  * converges in O(log n) rounds with the same join shape.
  */
object Clusters {

  /** Cluster assignment: (doc_id, cluster_id = min doc id reachable
    * within `iterations` hops, n_members of that label). Only documents
    * that participate in at least one near-dup pair appear. */
  def duplicateClusters(docs: DataFrame, threshold: Double,
                        iterations: Int = 4): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, threshold).select(col("d1"), col("d2"))
    // localCheckpoint: materialize the (tiny) edge list once instead of
    // recomputing the whole MinHash pipeline 2× per iteration, and keep
    // the iterated plan linear-sized (each round references its
    // predecessor twice — unbroken lineage would grow 2^iterations).
    val edges = pairs.union(pairs.select(col("d2"), col("d1")))
      .toDF("src", "dst").localCheckpoint(true)
    val init = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val labels = (1 to iterations).foldLeft(init) { (l, i) =>
      val nbrMin = edges
        .join(l.select(col("node").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src")).agg(min(col("nlbl")).as("nbr_min"))
      val next = l.join(nbrMin.select(col("src").as("node"), col("nbr_min")), "node")
        .select(col("node"), least(col("lbl"), col("nbr_min")).as("lbl"))
      // Checkpoint every OTHER round: one uncheckpointed round references
      // its predecessor only 4× (l twice, and ReuseExchange dedupes the
      // identical shuffle subtrees), and each eager checkpoint is a full
      // Spark job — halving them halves the fixed dispatch cost of the
      // iteration, which dominates when the label table is tiny.
      if (i % 2 == 0 && i < iterations) next.localCheckpoint(true) else next
    }
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
      count(lit(1)).over(Window.partitionBy(col("lbl"))).as("n_members"))
  }

  /** Connected components to FULL convergence via large-star/small-star
    * alternation (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the scale path [[duplicateClusters]]' scaladoc
    * promises for adversarially long chains. Bounded label propagation
    * is exact only up to its iteration diameter; this converges in
    * O(log² n) rounds regardless of component shape, each round two
    * self-equi-joins on the (tiny) edge table — document bodies never
    * enter the shuffle.
    *
    * Round r: large-star points every neighbor v > u at m = min(Γ(u) ∪
    * {u}); small-star points every neighbor v < u (and u itself) at the
    * min of u's smaller neighborhood. Both preserve connectivity and
    * monotonically flatten trees toward the component-min root.
    *
    * Termination is certificate-checked, not assumed: the loop exits
    * when the edge set is a disjoint union of stars — no target node
    * reappears as a source (depth 1) AND every source points at exactly
    * one target (single root per node). Both star transforms preserve
    * connectivity, so the certificate proves labels = exact
    * component-min of the ORIGINAL graph. `maxRounds` is a safety rail
    * far above the O(log² n) bound; hitting it throws rather than
    * returning silently-unconverged labels.
    *
    * @param pairs undirected edge list; first two columns are node ids.
    * @return (node, cluster_id = min node id of the component); every
    *         node incident to an edge appears exactly once.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 40): DataFrame = {
    val spark = pairs.sparkSession
    val c = pairs.columns
    var e = pairs
      .select(col(c(0)).cast("long").as("u"), col(c(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint(true)

    def sym(e: DataFrame) = e.union(e.select(col("v").as("u"), col("u").as("v")))

    // large-star: for each u, m = min(Γ(u) ∪ {u}); emit (v, m) ∀ v ∈ Γ(u), v > u.
    def largeStar(e: DataFrame): DataFrame = {
      val adj = sym(e)
      val m = adj.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      adj.filter(col("v") > col("u")).join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }

    // small-star: for each u with smaller neighbors N = {v ∈ Γ(u): v < u},
    // m = min(N); emit (x, m) ∀ x ∈ N ∪ {u}, x ≠ m.
    def smallStar(e: DataFrame): DataFrame = {
      val sm = sym(e).filter(col("v") < col("u"))
      val m = sm.groupBy("u").agg(min(col("v")).as("m"))
      sm.join(m, "u").select(col("v").as("x"), col("m"))
        .union(m.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(col("x").as("u"), col("m").as("v")).distinct()
    }

    // star certificate: no root is also a leaf, and each leaf has one
    // root. ONE aggregation action per round (the old form ran up to
    // three driver actions per round — isEmpty, the chained-node join,
    // the multi-root scan — each a full job dispatch on a tiny table;
    // the fixed per-action cost dominated the certificate at harness
    // SF). Tagged union → per-node rollup: a violating node is either
    // (a) both a source and a target — a chain — or (b) a source with
    // more than one distinct target — a multi-root leaf. An empty edge
    // set yields no violations, which also subsumes the old isEmpty
    // pre-check (stars over zero edges — loop exits identically).
    def isStars(e: DataFrame): Boolean =
      e.select(col("u").as("node"), lit(1).as("src"), col("v"))
        .union(e.select(col("v").as("node"), lit(0).as("src"),
          lit(null).cast("long").as("v")))
        .groupBy(col("node"))
        .agg(max(col("src")).as("is_src"), min(col("src")).as("min_src"),
          countDistinct(col("v")).as("k"))
        .filter((col("is_src") === 1 && col("min_src") === 0) || col("k") > 1)
        .limit(1).isEmpty

    var rounds = 0
    while (!isStars(e)) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no convergence after $maxRounds rounds " +
            s"(O(log² n) expected; graph is pathological or inputs are corrupt)")
      // localCheckpoint: each round references its predecessor several
      // times; unbroken lineage would grow exponentially.
      e = smallStar(largeStar(e)).localCheckpoint(true)
      rounds += 1
    }
    // stars: u → root, plus each root labeling itself.
    e.select(col("u").as("node"), col("v").as("lbl"))
      .union(e.select(col("v").as("node"), col("v").as("lbl")).distinct())
  }

  /** [[duplicateClusters]] with exact convergence: families are the TRUE
    * connected components of the verified near-dup pair graph, whatever
    * their diameter — the variant to ship when duplicate chains (doc A ~
    * B ~ C ~ … with A !~ C) can be arbitrarily long, e.g. boilerplate
    * drift across crawl snapshots. Same output shape as
    * [[duplicateClusters]]. */
  def duplicateClustersConverged(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, threshold).select(col("d1"), col("d2"))
    connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        count(lit(1)).over(Window.partitionBy(col("lbl"))).as("n_members"))
  }

  /** D8: dedup survivors — the corpus with every non-canonical member
    * of a duplicate family removed (canonical = the family's min doc
    * id, which IS the converged cluster label). This is the step a
    * training pipeline actually ships: pairs → families → one document
    * per family. The drop list is |family members − families| rows —
    * tiny relative to the corpus — so it broadcasts and the anti-join
    * never shuffles document bodies. */
  def survivors(docs: DataFrame, threshold: Double, iterations: Int = 4): DataFrame = {
    val drop = duplicateClusters(docs, threshold, iterations)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    docs.join(broadcast(drop), Seq("doc_id"), "left_anti")
  }
}
