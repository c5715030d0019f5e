package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** e16 (MMR-diversified retrieval) and sa7 (leakage-aware split) —
  * the two round-9 curation operators. MMR is pinned on a constructed
  * geometry where diversity PROVABLY changes the answer; the split is
  * pinned on the invariant it exists for: no verified near-dup pair
  * straddles train/val/test. */
class MmrLeakageSpec extends SparkSpec {
  import spark.implicits._

  test("MMR demotes the near-duplicate of an already-selected result") {
    // Unit vectors in the plane, angles from query q: a at 25°, its
    // near-clone a' at 26° (same side, ~1° apart → sim ≈ 0.9998), c at
    // 40° on the OPPOSITE side (65° from a → sim ≈ 0.423). Plain top-2
    // = {a, a'}. MMR round 2: a' scores 0.7·0.899 − 0.3·0.9998 ≈ 0.329;
    // c scores 0.7·0.766 − 0.3·0.423 ≈ 0.409 → c wins. (With a
    // too-dominant a — e.g. rel ≈ 1 and a perfect clone — λ=0.7 can
    // NEVER demote the clone: 0.7·1 − 0.3·1 = 0.4 beats 0.4·rel_c for
    // any rel_c < 1; the balanced-angle geometry is what makes the
    // demotion provable.)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),                 // q
      (1L, Array(0.90631f, 0.42262f, 0.0f)),         // a  (25°)
      (2L, Array(0.89879f, 0.43837f, 0.0f)),         // a' (26°)
      (3L, Array(0.76604f, -0.64279f, 0.0f))         // c  (40°, other side)
    ).toDF("vec_id", "embedding")
    val mmr = Ann.mmrTopK(vecs, k = 2, shortlist = 3)
      .filter(col("query_id") === 0L)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(mmr(0) == 1L, "first pick is pure relevance (a)")
    assert(mmr(1) == 3L, s"second pick must be the diverse c, got ${mmr(1)}")
    // control: plain top-2 picks the clone
    val plain = Ann.cosineTopKBlocked(vecs, 2)
      .filter(col("query_id") === 0L).orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(plain.toSeq == Seq(1L, 2L))
  }

  test("MMR picks k distinct shortlist members per query, first = top-1") {
    val emb = Tables.embeddings(spark, sfDir)
    val mmr = Ann.mmrTopK(emb, k = 3, shortlist = 8).cache()
    val perQuery = mmr.groupBy("query_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("neighbor_id")).as("nd"))
    assert(perQuery.filter(col("n") =!= 3 || col("nd") =!= 3).count() == 0)
    // rank-1 of MMR is exactly rank-1 of the plain shortlist
    val top1 = Ann.cosineTopKBlocked(emb, 1)
      .select(col("query_id"), col("neighbor_id").as("want"))
    val firsts = mmr.filter(col("rank") === 1)
      .join(top1, "query_id")
      .filter(col("neighbor_id") =!= col("want"))
    assert(firsts.count() == 0)
    mmr.unpersist()
  }

  test("sa7: no verified near-dup pair straddles splits; singletons keep sa1") {
    val docs = Tables.documents(spark, sfDir)
    val split = SparkEntry.queries("sa7_leakage_split")(spark, sfDir)
      .select(col("doc_id"), col("split"), col("rep")).cache()
    // every verified near-dup pair lands in ONE split
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs, 0.7).select("d1", "d2")
    val straddling = pairs
      .join(split.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
      .join(split.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
      .filter(col("s1") =!= col("s2"))
    assert(straddling.count() == 0, "a near-dup pair straddles splits")
    // docs with no near-dup (rep == own id) keep their sa1 assignment
    val sa1 = SparkEntry.queries("sa1_hash_split")(spark, sfDir)
      .select(col("doc_id"), col("split").as("sa1_split"))
    val singletonsMoved = split.filter(col("rep") === col("doc_id"))
      .join(sa1, "doc_id").filter(col("split") =!= col("sa1_split"))
    assert(singletonsMoved.count() == 0)
    // and the plain per-doc split DOES leak on this data (else the
    // operator is untested): at least one pair straddles under sa1
    val sa1ByDoc = sa1.select(col("doc_id"), col("sa1_split"))
    val leakyControl = pairs
      .join(sa1ByDoc.select(col("doc_id").as("d1"), col("sa1_split").as("s1")), "d1")
      .join(sa1ByDoc.select(col("doc_id").as("d2"), col("sa1_split").as("s2")), "d2")
      .filter(col("s1") =!= col("s2"))
    assert(leakyControl.count() > 0,
      "control vacuous: per-doc split did not leak on this data")
    split.unpersist()
  }
}
