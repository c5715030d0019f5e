package graft

import org.apache.spark.sql.functions._

import graft.text.Chunking

/** Chunking / packing / TF-IDF invariants over the harness corpus. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sfDir, "documents")

  test("chunk windows tile every token: stride-spaced starts, full coverage") {
    val chunks = Chunking.chunkWindows(docs, size = 50, stride = 40)
    // starts are 1, 41, 81, ... and every chunk begins within the doc
    assert(chunks.filter((col("start_tok") - 1) % 40 =!= 0).count() === 0L)
    // last chunk reaches the final token: max(start+n_tok-1) == n_words
    val cover = chunks.groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_tok") - 1).as("covered"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
    assert(cover.filter(col("covered") =!= col("n")).count() === 0L)
    // chunk text really has n_tok tokens
    val widths = chunks.filter(
      size(split(col("chunk_text"), " ")).cast("long") =!= col("n_tok")).count()
    assert(widths === 0L)
  }

  test("packing is contiguous and capacity-aligned") {
    val packed = Chunking.packSequences(docs, capacity = 512).orderBy("doc_id")
      .select("doc_id", "n_tok", "cum_tok", "pack_id")
      .as[(Long, Long, Long, Long)].collect()
    // cumulative sum is exact and pack ids are the token-offset bins
    var cum = 0L
    packed.foreach { case (_, n, c, p) =>
      assert(c === cum + n)
      assert(p === cum / 512)
      cum = c
    }
    // pack ids are nondecreasing in doc order (contiguity)
    assert(packed.map(_._4).toSeq === packed.map(_._4).toSeq.sorted)
  }

  test("tf-idf matches hand-computed scores on a known corpus") {
    val tiny = Seq(
      (1L, "apple apple banana common"),  // tf(apple)=2, df(apple)=1
      (2L, "banana cherry common"),       // df(banana)=2
      (3L, "cherry cherry cherry common") // common: df=3 ⇒ idf=ln(1)=0
    ).toDF("doc_id", "text")
    val top = Chunking.tfidfTopTerms(tiny, k = 2)
      .select("doc_id", "term", "tfidf").as[(Long, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    def s(tf: Int, df: Int) =
      BigDecimal(tf * math.log(3.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top((1L, "apple")) === s(2, 1))
    assert(top((1L, "banana")) === s(1, 2))
    assert(top((2L, "cherry")) === s(1, 2))
    // 'common' appears everywhere ⇒ idf 0 ⇒ outranked in every doc
    assert(!top.contains((1L, "common")) && !top.contains((2L, "common")))
    // doc 3: only cherry and common remain; zero-score common IS kept
    // when fewer than k positive terms exist (k per doc, not k nonzero)
    assert(top((3L, "cherry")) === s(3, 2))
    assert(top((3L, "common")) === 0.0)
  }

  test("tf-idf returns at most k terms per doc on the real corpus") {
    val top = Chunking.tfidfTopTerms(docs, k = 3)
    assert(top.groupBy("doc_id").count().filter(col("count") > 3).count() === 0L)
    assert(top.select("doc_id").distinct().count() === docs.count())
  }

  test("T12: bigram NLL matches a hand computation; short docs drop out") {
    // d1 "x y x z": bigrams (x y)(y x)(x z); contexts x·=2, y·=1.
    // nll(x y) = -ln(1/2), nll(y x) = -ln(1/1) = 0, nll(x z) = -ln(1/2)
    // ⇒ avg = 2·ln2 / 3. d2 is a single token: no bigrams, no row.
    val df = Seq((1L, "x y x z"), (2L, "solo")).toDF("doc_id", "text")
    val out = Chunking.bigramLogProb(df)
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet === Set(1L))
    val (_, n, avg) = out.head
    assert(n === 3L)
    assert(math.abs(avg - 2 * math.log(2) / 3) < 1e-6)
  }

  test("T12: a word-order shuffle raises bigram NLL but not unigram NLL") {
    // 5 fluent docs share their transitions; doc 6 is the same BAG of
    // words in a shuffled order, so its transitions are corpus-rare.
    val fluent = "the quick fox jumps over the lazy dog"
    val shuffled = "the fox the jumps quick dog over lazy"
    val df = ((1L to 5L).map(_ -> fluent) :+ (6L -> shuffled))
      .toDF("doc_id", "text")
    val uni = Chunking.unigramLogProb(df)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val bi = Chunking.bigramLogProb(df)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(math.abs(uni(1L) - uni(6L)) < 1e-9,
      "same bag of words ⇒ identical unigram score")
    assert(bi(6L) > bi(1L),
      "the improbable transitions must surface in the bigram score")
  }

  test("T15: BM25 matches a hand computation; non-matching docs drop out") {
    // N=3, df(q)=2, every dl=4 so avgdl=4 and the length norm is 1:
    // idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6); denom = tf + k1.
    val df = Seq(
      (1L, "a a q b"), (2L, "q q b c"), (3L, "b c d e")).toDF("doc_id", "text")
    val out = Chunking.bm25(df, Seq("q"))
      .select("doc_id", "n_q_terms", "bm25")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet === Set(1L, 2L), "docs without query terms emit no row")
    val idf = math.log(1.6)
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - idf * 2.2 / 2.2) < 1e-9)
    assert(math.abs(out(2L)._2 - idf * 4.4 / 3.2) < 1e-9)
    assert(out(2L)._2 > out(1L)._2, "higher tf at equal length scores higher")
  }

  test("C3: sharded packing = per-shard c2 packing, and the plan has no single-partition exchange") {
    val sharded = Chunking.packSequencesSharded(docs, capacity = 512, shards = 16)
    val got = sharded.select("doc_id", "shard", "cum_tok", "pack_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // per shard, the packing is EXACTLY c2's greedy cumulative packing
    // applied to that shard's documents in id order
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val shardDocs = docs.filter(
        graft.sampling.Sampling.bucket(col("doc_id"), "pack", 16) === shard)
      val local = Chunking.packSequences(shardDocs, capacity = 512)
        .select("doc_id", "cum_tok", "pack_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val expect = local.map { case (id, cum, pid) =>
        (id, shard, cum, shard * (1L << 40) + pid) }
      assert(rows.sortBy(_._1).toSeq == expect.toSeq, s"shard $shard diverges")
    }
    // the scale claim, plan-asserted: c2's global running sum needs a
    // SinglePartition exchange; c3's partitioned window must not
    def singlePartitionExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // finalize AQE
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("SinglePartition"))
    }
    assert(singlePartitionExchanges(
      Chunking.packSequences(docs, capacity = 512)) > 0,
      "control: c2 is expected to serialize through SinglePartition")
    assert(singlePartitionExchanges(sharded) == 0,
      "c3 must not serialize through a SinglePartition exchange")
  }

  test("T24: BPE merge pairs count on the weighted vocab, not the token stream") {
    // "ab ab ab cd" per doc over 2 docs: vocab = {ab: 6, cd: 2} — the
    // pair 'ab' must count 6 (word frequency), not 2 (vocab rows), and
    // a 3-char word contributes BOTH its adjacent pairs
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "ab ab ab cd xyz"), (2L, "ab ab ab cd"))
      .toDF("doc_id", "text")
    val vocab = docs
      .select(explode(graft.text.TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    val got = vocab.filter(length(col("w")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got("ab") === 6L, s"weighted count must be 6: $got")
    assert(got("cd") === 2L, s"got $got")
    assert(got("xy") === 1L && got("yz") === 1L,
      s"3-char word must contribute both adjacent pairs: $got")
  }

  test("C4: density audit sums to the packing's token mass; plan stays sharded") {
    val packs = Chunking.packSequencesSharded(docs, capacity = 512, shards = 16)
    val audit = packs.groupBy(col("shard"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
      .withColumn("density_milli", expr("(sum_tok * 1000) div (n_packs * 512)"))
    val rows = audit.select("shard", "n_packs", "n_docs", "sum_tok", "density_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
    // conservation: audit's doc and token totals equal the packing's
    val (totDocs, totTok) = (rows.map(_._3).sum, rows.map(_._4).sum)
    val base = packs.agg(count(lit(1)), sum(col("n_tok")))
      .as[(Long, Long)].head()
    assert((totDocs, totTok) === base, "per-shard audit must conserve totals")
    // density is positive and bounded: a doc straddling its final bin
    // counts fully in its starting bin, so density can exceed 1000,
    // but never by more than one max-doc per bin amortized — assert
    // the loose invariant density > 0 and n_packs >= 1 per shard
    rows.foreach { case (shard, nPacks, _, sumTok, dens) =>
      assert(nPacks >= 1 && dens > 0, s"shard $shard: degenerate audit row")
      assert(sumTok >= (nPacks - 1) * 512,
        s"shard $shard: $nPacks bins opened needs > ${(nPacks - 1) * 512} tokens")
    }
    // same scale posture as c3: the audit must not introduce a
    // SinglePartition exchange on top of the sharded packing
    audit.collect()
    assert(audit.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("SinglePartition")) == 0,
      "c4 audit must stay sharded end-to-end")
  }

  test("T27: rank-tertile boundary arithmetic — n=7 splits 2/2/3, n=6 splits 2/2/2") {
    import org.apache.spark.sql.functions._
    // avg_nll ascending with doc_id: ranks are the doc ids themselves
    def scored(lang: String, n: Int) = (1 to n).map(i =>
      (i.toLong, 10L, i * 0.1, lang))
    val df = (scored("a7", 7) ++ scored("b6", 6))
      .toDF("doc_id", "n_tok", "avg_nll", "lang")
    val got = graft.text.Chunking.pplBuckets(df)
      .select("lang", "bucket", "n_docs")
      .as[(String, String, Long)].collect().toSet
    // n=7: 3·rn ≤ 7 → rn ≤ 2 head; 3·rn ≤ 14 → rn ≤ 4 middle; 5..7 tail
    // n=6: exact thirds
    assert(got === Set(
      ("a7", "head", 2L), ("a7", "middle", 2L), ("a7", "tail", 3L),
      ("b6", "head", 2L), ("b6", "middle", 2L), ("b6", "tail", 2L)))
  }

  test("T27: carry columns ride through unigramLogProb unchanged") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a b a", "en"), (2L, "b b", "es"))
      .toDF("doc_id", "text", "lang")
    val plain = graft.text.Chunking.unigramLogProb(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val carried = graft.text.Chunking.unigramLogProb(docs, carry = Seq("lang"))
      .select("doc_id", "lang", "n_tok", "avg_nll")
      .as[(Long, String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(carried(1L) === ((1L, "en", plain(1L)._2, plain(1L)._3)))
    assert(carried(2L) === ((2L, "es", plain(2L)._2, plain(2L)._3)))
  }
}
