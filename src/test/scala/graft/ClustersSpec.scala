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
