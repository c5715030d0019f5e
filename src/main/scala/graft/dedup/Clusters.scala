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
    val labels = (1 to iterations).foldLeft(init) { (l, _) =>
      val nbrMin = edges
        .join(l.select(col("node").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src")).agg(min(col("nlbl")).as("nbr_min"))
      l.join(nbrMin.select(col("src").as("node"), col("nbr_min")), "node")
        .select(col("node"), least(col("lbl"), col("nbr_min")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
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
