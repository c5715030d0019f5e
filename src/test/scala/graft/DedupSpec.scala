package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("D1: exact dedup groups identical texts and keeps min id") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val got = Dedup.exact(df).select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 3L -> 1L))
  }

  test("D3: MinHash LSH finds the same pairs as exact Jaccard at 0.7") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.7).select("d1", "d2")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.7).select("d1", "d2")
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must not invent pairs (it Jaccard-verifies)")
    assert(exact.nonEmpty, "corpus must contain planted near-dups")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"banded LSH recall too low: $recall")
  }

  test("D4: identical texts have identical SimHash; disjoint texts differ") {
    val df = Seq((1L, "spark query plan join"), (2L, "spark query plan join"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(df).as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("D5: duplicate docs pair at Hamming 0; unrelated docs never pair") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely unrelated text about spark catalyst optimizer internals")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df).select("d1", "d2", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 0)))
  }

  test("D5: pigeonhole blocking finds every pair within the Hamming bound") {
    // on the real corpus: candidates from blocking ∪ filter must equal a
    // brute-force Hamming scan — blocking may not lose pairs.
    val sig = Dedup.simhashSignatures(docs).as[(Long, Long)].collect()
    val brute = (for {
      (d1, s1) <- sig; (d2, s2) <- sig if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= Dedup.SIMHASH_MAX_HAMMING
    } yield (d1, d2, h)).toSet
    val blocked = Dedup.simhashPairs(docs).select("d1", "d2", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(blocked === brute)
  }
}
