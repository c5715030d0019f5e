package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("T25: mergeGreedy — overlap chains and multi-char symbols") {
    // "aaa" under (a,a): greedy non-overlapping takes the FIRST pair
    assert(Bpe.mergeGreedy(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    // "aaaa" → two disjoint merges
    assert(Bpe.mergeGreedy(Array("a", "a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "aa"))
    // a≠b merges are independent (candidates can never be adjacent)
    assert(Bpe.mergeGreedy(Array("a", "b", "a", "b"), "a", "b").toSeq ===
      Seq("ab", "ab"))
    // merged symbol must not re-match `a` within the same round
    assert(Bpe.mergeGreedy(Array("aa", "a", "a"), "aa", "a").toSeq ===
      Seq("aaa", "a"))
    // multi-char symbols from earlier rounds
    assert(Bpe.mergeGreedy(Array("ab", "b", "b"), "ab", "b").toSeq ===
      Seq("abb", "b"))
    assert(Bpe.mergeGreedy(Array("x"), "a", "b").toSeq === Seq("x"))
    assert(Bpe.mergeGreedy(Array.empty[String], "a", "b").toSeq === Seq.empty)
  }

  test("T25: mergeFold (Column form) ≡ mergeGreedy (kernel form)") {
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("a", "b", "a", "b"), "a", "b"),
      (Seq("aa", "a", "a"), "aa", "a"),
      (Seq("ab", "b", "b"), "ab", "b"),
      (Seq("x", "y", "z"), "a", "b"),
      (Seq("b", "a", "b", "a", "b"), "a", "b"))
    cases.foreach { case (syms, a, b) =>
      val viaFold = Seq(Tuple1(syms))
        .toDF("syms")
        .select(Bpe.mergeFold(col("syms"), a, b).as("m"))
        .as[Seq[String]].head()
      val viaKernel = Bpe.mergeGreedy(syms.toArray, a, b).toSeq
      assert(viaFold === viaKernel, s"fold vs kernel on $syms merge ($a,$b)")
    }
  }

  test("T25: bpeTrain matches a hand-computed merge sequence with tie-breaks") {
    // corpus: "abab abab ab cd cd cd" → vocab {abab:2, ab:1, cd:3}
    // round 1 pair counts: (a,b): 2·2+1 = 5; (b,a): 2; (c,d): 3
    //   → winner (a,b) n=5
    // after merge: abab→[ab,ab], ab→[ab], cd→[c,d]
    // round 2: (ab,ab): 2; (c,d): 3 → winner (c,d) n=3
    // round 3: (ab,ab): 2 → winner (ab,ab) n=2
    // round 4: no pairs left → training exhausts at 3 merges
    val docs = Seq((1L, "abab abab ab cd cd cd")).toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, rounds = 4)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 5L), (2, "c", "d", 3L), (3, "ab", "ab", 2L)))
  }

  test("T25: deterministic tie-break is count desc then (a, b) ascending") {
    // "ba" and "ab" both appear twice; (a,b) must win over (b,a)
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, rounds = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 2L)))
  }

  test("T26: bpeTokenCounts — hand-computed tokenization under the trained merges") {
    // merges learned on this corpus (pinned above): (a,b), (c,d),
    // (ab,ab) — so abab→1 token, ab→1, cd→1; 6 words → 6 tokens;
    // chars_per_tok_milli = 21·1000 div 6 = 3500
    val docs = Seq((1L, "abab abab ab cd cd cd", 21L))
      .toDF("doc_id", "text", "n_chars")
    val got = Bpe.bpeTokenCounts(docs, rounds = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 6L, 6L, 3500L)))
    // with only ONE merge round (a,b): abab→[ab,ab]=2, ab→1, cd→[c,d]=2
    // → 2·2 + 1 + 3·2 = 11 tokens
    val one = Bpe.bpeTokenCounts(docs, rounds = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(one === Seq((1L, 6L, 11L, 21000L / 11L)))
  }

  test("T25: vocabCap binds deterministically by (wf desc, w)") {
    // cap 2 keeps the two most frequent words {cc:3, bb:2}; "aa" (1)
    // is cut, so round 1 counts (c,c)=3 not including any (a,a)
    val docs = Seq((1L, "aa bb bb cc cc cc")).toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, rounds = 1, vocabCap = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "c", "c", 3L)))
  }
}
