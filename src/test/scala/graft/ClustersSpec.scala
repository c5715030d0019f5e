package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Clusters, Dedup}

/** Duplicate-family clustering: transitive closure over near-dup pairs. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  // Three exact-duplicate families built from repeated text so MinHash
  // finds every pair: {0,1,2} (transitive via identical text), {10,11},
  // and a singleton 20 with no near-dup (absent from output).
  private lazy val docs = {
    val a = ("spark shuffle exchange partition codegen whole stage " * 5).trim
    val b = ("window frame rank dense ntile lead lag cumulative " * 5).trim
    val c = "completely unrelated document about something else entirely ok"
    Seq((0L, a), (1L, a), (2L, a), (10L, b), (11L, b), (20L, c))
      .toDF("doc_id", "text")
  }

  private lazy val out = Clusters.duplicateClusters(docs, 0.7)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("transitive families collapse to one min-id label") {
    val byDoc = out.map(r => r._1 -> r._2).toMap
    assert(byDoc(0L) === 0L && byDoc(1L) === 0L && byDoc(2L) === 0L)
    assert(byDoc(10L) === 10L && byDoc(11L) === 10L)
  }

  test("singletons without any near-dup edge are not emitted") {
    assert(!out.exists(_._1 === 20L))
  }

  test("n_members counts the whole family") {
    val sizes = out.map(r => r._1 -> r._3).toMap
    assert(sizes(0L) === 3L && sizes(11L) === 2L)
  }

  test("connectedComponents: a 100-link chain collapses to one min-id component") {
    // Diameter 100 — far beyond any bounded propagation; the star
    // certificate must still deliver the exact component min.
    val edges = (0L until 100L).map(i => (i, i + 1)).toDF("src", "dst")
    val lbl = Clusters.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(lbl.length === 101)
    assert(lbl.forall(_._2 === 0L), "every chain node must take label 0")
  }

  test("connectedComponents matches a union-find ground truth on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 400
    val edges = Seq.fill(300)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find ground truth (test-only)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = touched.map(v => v -> {
      // component min = min over members sharing the root
      val r = find(v.toInt)
      touched.filter(w => find(w.toInt) == r).min
    }).toMap
    val got = Clusters.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === truth)
  }

  test("converged clusters agree with bounded propagation on the real table") {
    // At this SF families are near-cliques, so d7's 4 rounds have
    // converged — the exact-CC variant must produce identical output.
    val real = Tables.table(spark, sfDir, "documents")
    val a = Clusters.duplicateClusters(real, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Clusters.duplicateClustersConverged(real, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.nonEmpty && (a sameElements b))
  }

  test("clusters refine the pair graph: every verified pair is co-clustered") {
    val real = Tables.table(spark, sfDir, "documents")
    val lbl = Clusters.duplicateClusters(real, 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashLshPairs(real, 0.7)
      .select("d1", "d2").as[(Long, Long)].collect()
    pairs.foreach { case (d1, d2) =>
      assert(lbl(d1) === lbl(d2), s"pair ($d1,$d2) split across clusters")
    }
  }
}
