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

  test("D13: containment is asymmetric — a quoted doc scores high, its superset low") {
    // doc 1 (8 words, 6 shingles) is verbatim inside doc 2 (21 words,
    // 19 shingles); Jaccard is 6/19 (below any dedup threshold) but
    // containment 1→2 is exactly 1.0. doc 3 shares nothing.
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val host = s"intro words here $quote and then a long tail of unrelated filler tokens follows"
    val df = Seq((1L, quote), (2L, host), (3L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, 0.5)
      .select("d1", "d2", "containment").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) === 1.0, "quote fully contained in host")
    assert(!got.contains((2L, 1L)), "host is not contained in the quote")
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // sanity vs the Jaccard baseline: this pair is invisible at 0.5
    val jac = Dedup.ngramJaccardPairs(df, 0.5).select("d1", "d2")
      .as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("D13: the df cap drops high-multiplicity family pairs, keeps rare-shingle pairs") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val host = s"intro words here $quote and then a long tail of unrelated filler tokens follows"
    // docs 10..12: a 3-strong exact-copy family (df 3 on every shingle)
    val fam = "copy pasta body repeated verbatim in every member here"
    val df5 = (Seq((1L, quote), (2L, host)) ++ (10L to 12L).map(_ -> fam))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(df5, 0.5, maxDf = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped((1L, 2L)), "df<=2 quote shingles survive the cap")
    assert(!capped.exists { case (a, b) => a >= 10L || b >= 10L },
      "df-3 family shingles are dropped — exact-copy families are d1's domain")
    val uncapped = Dedup.containmentPairs(df5, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert((10L to 12L).forall(a => (10L to 12L).forall(b =>
      a == b || uncapped((a, b)))), "inactive cap keeps all family pairs")
  }

  test("native MinHash signatures equal the explode+groupBy formulation") {
    import graft.dedup.Dedup.{minhashParams, MINHASH_P}
    val builtin = {
      val exploded = Dedup.shingleSets(docs)
        .select(col("doc_id"), explode(col("g")).as("g"))
        .withColumn("base", graft.text.TextAnalysis.hash28(col("g")))
      val mins = minhashParams.zipWithIndex.map { case ((a, b), j) =>
        min((lit(a) * col("base") + lit(b)) % MINHASH_P).as(s"h$j")
      }
      exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    }
    val cols = "doc_id" +: minhashParams.indices.map(j => s"h$j")
    val a = Dedup.minhashSignatures(docs).select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    val b = builtin.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("native SimHash equals the vote-aggregation formulation") {
    import graft.dedup.Dedup.SIMHASH_BITS
    import graft.text.TextAnalysis.{hash60, words}
    val builtin = {
      val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
        .withColumn("hv", hash60(col("w"), "sh"))
      val votes = (0 until SIMHASH_BITS).map(i =>
        sum(when(shiftright(col("hv"), i).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"b$i"))
      val assembled = (0 until SIMHASH_BITS)
        .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), assembled.as("simhash"))
    }
    val a = Dedup.simhashSignatures(docs).as[(Long, Long)].collect().toSet
    val b = builtin.as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("D4: identical texts have identical SimHash; disjoint texts differ") {
    val df = Seq((1L, "spark query plan join"), (2L, "spark query plan join"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(df).as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("D4: NULL text yields no signature row (matches explode+groupBy)") {
    // the explode+groupBy formulation drops NULL-text docs (explode of a
    // NULL array emits nothing); the native projection must agree, and
    // no NULL block value may reach simhashPairs' equality join.
    val df = Seq((1L, Option("spark query plan join")), (2L, Option.empty[String]),
      (3L, Option("spark query plan join"))).toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(df).as[(Long, Long)].collect().toMap
    assert(sig.keySet === Set(1L, 3L), "NULL text must not emit a signature row")
    val pairs = Dedup.simhashPairs(df).select("d1", "d2")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 3L)))
  }

  test("D8: survivors keep exactly one canonical doc per duplicate family") {
    val fams = graft.dedup.Clusters.duplicateClusters(docs, 0.7)
      .as[(Long, Long, Long)].collect()
    val surv = graft.dedup.Clusters.survivors(docs, 0.7)
      .select("doc_id").as[Long].collect().toSet
    val total = docs.count()
    // every family contributes exactly its canonical (min id) member
    fams.groupBy(_._2).foreach { case (cluster, members) =>
      val ids = members.map(_._1).toSet
      assert(surv.intersect(ids) === Set(cluster),
        s"family $cluster must keep exactly its canonical member")
    }
    // docs with no dup edge are all kept
    assert(surv.size === total - fams.count(f => f._1 != f._2))
  }

  test("D9: decontamination removes exact and near matches of the eval set, nothing else") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about catalyst optimizer rules"),
      (3L, "the quick brown fox jumps over the lazy dog right now today"), // near-dup of eval 10
      (4L, "spark structured streaming watermark semantics explained fully")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // exact = train 1, near = train 3
      (11L, "held out benchmark question nobody should train on")).toDF("doc_id", "text")
    val clean = Dedup.decontaminate(train, eval, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(2L, 4L),
      "exact match (1) and near match (3) must be removed; unrelated docs kept")
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

  test("T10: contamination fraction on hand-computed overlaps") {
    val evalDocs = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c d e f g h i j"),                 // identical: 3/3 windows hit
      (2L, "a b c d e f g h z y x w v u t s"),     // 1 of 9 windows hits
      (3L, "short words only")                     // < 8 words: no windows
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationStats(train, evalDocs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 3 && got(1L).getLong(2) === 3)
    assert(got(1L).getDouble(3) === 1.0)
    assert(got(2L).getLong(1) === 9 && got(2L).getLong(2) === 1)
    assert(got(2L).getDouble(3) === 0.1111)
    assert(got(3L).getLong(1) === 0 && got(3L).getLong(2) === 0)
    assert(got(3L).isNullAt(3))
  }

  test("D12: incremental admission rejects corpus and senior-batch dupes") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // exact corpus dup
      (6L, "fresh unique words never seen anywhere before now"),
      (9L, "fresh unique words never seen anywhere before now"), // senior-batch dup
      (12L, "totally disjoint vocabulary in this arriving document")
    ).toDF("doc_id", "text")
    val admitted = Dedup.incrementalAdmit(batch, corpus, 0.7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(admitted === Seq(6L, 12L))
    // real-corpus invariants: admitted ⊆ batch; re-admitting the
    // admitted set against the same corpus changes nothing (idempotent)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val c = docs.filter(col("doc_id") % 3 =!= 0)
    val once = Dedup.incrementalAdmit(b, c, 0.7)
    val ids = once.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(b.select("doc_id").as[Long].collect().toSet))
    val twice = Dedup.incrementalAdmit(once, c, 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(twice === ids, "admission must be idempotent")
  }

  test("D11: passage dedup keeps first global occurrence, rebuilds text") {
    val df = Seq(
      (1L, "a b c d e f"),      // passages: "a b c" | "d e f"
      (2L, "a b c x y z"),      // "a b c" repeats doc1 → dropped
      (3L, "a b c d e f"),      // both passages repeat → NULL text
      (4L, "q r")               // single short passage, unique
    ).toDF("doc_id", "text")
    val got = Dedup.passageDedup(df, passageTokens = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 2 && got(1L).getLong(2) === 2)
    assert(got(1L).getString(3) === "a b c d e f")
    assert(got(2L).getLong(1) === 2 && got(2L).getLong(2) === 1)
    assert(got(2L).getString(3) === "x y z")
    assert(got(3L).getLong(2) === 0 && got(3L).isNullAt(3))
    assert(got(4L).getString(3) === "q r")
    // corpus-level invariant: every distinct passage content is kept
    // exactly once across the whole corpus
    val out = Dedup.passageDedup(docs)
    val total = out.agg(sum("n_passages"), sum("n_kept")).head()
    assert(total.getLong(1) <= total.getLong(0))
    assert(out.filter(col("n_kept") > col("n_passages")).count() === 0)
  }

  test("D14: sparse cosine weights rare shared shingles above boilerplate") {
    // docs 1/2: identical → cos 1.0. docs 3/4 share ONE rare shingle
    // ("u v w") plus nothing else; docs 5/6/7/8 all share a ubiquitous
    // header ("the real estate") that idf should drive toward zero.
    val df = Seq(
      (1L, "p q r s t"), (2L, "p q r s t"),
      (3L, "u v w a1 b1 c1"), (4L, "u v w d1 e1 f1"),
      (5L, "the real estate x1 y1 z1"), (6L, "the real estate x2 y2 z2"),
      (7L, "the real estate x3 y3 z3"), (8L, "the real estate x4 y4 z4")
    ).toDF("doc_id", "text")
    val all = Dedup.sparseCosinePairs(df, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(all((1L, 2L)) - 1.0) < 1e-9, "identical docs must score 1")
    // the rare-shingle pair must beat every boilerplate-only pair
    val boiler = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
      .map(all)
    assert(boiler.forall(all((3L, 4L)) > _),
      "one rare shared shingle must outweigh shared boilerplate")
    // thresholding keeps only the exact pair at tau = 0.9
    val kept = Dedup.sparseCosinePairs(df, threshold = 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(kept === Set((1L, 2L)))
  }

  test("D16: prefix-filter join finds EVERY pair brute force finds (completeness)") {
    // random word soup from a tiny vocabulary -> dense near-dup space
    // with heavy shingle ties; the prefix theorem must hold on ties,
    // minimal (3-word) docs, and docs too short to shingle
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (1L to 60L).map { i =>
      val n = 1 + rnd.nextInt(8) // 1..8 words; <3 words -> no shingles
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, 0.7)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // brute force: exact Jaccard on distinct 3-shingle sets, same
    // integer keep rule
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) =>
        val w = t.split(" ")
        id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap.filter(_._2.nonEmpty)
    val want = (for {
      a <- toks.keys; b <- toks.keys if a < b
      inter = (toks(a) & toks(b)).size
      union = toks(a).size + toks(b).size - inter
      if 10 * inter >= 7 * union
    } yield (a, b)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "the generator must actually produce near-dups")
  }

  test("D16: maxFamily cap bounds an exact-copy blow-up; generous cap changes nothing") {
    // 30 exact copies (the precondition violation d16 documents) + a
    // genuine near-dup pair: uncapped, the copies alone produce
    // 30·29/2 = 435 pairs; capped at family ≤ 5, the copy family's
    // prefix keys are dropped and only pairs with a sub-cap shared
    // prefix key survive
    val copy = "alpha beta gamma delta eps zeta eta theta"
    // 10 words differing in the last → 7 of 8+8 distinct shingles
    // shared → J = 7/9 ≈ 0.78 ≥ 0.7
    val docs = ((1L to 30L).map(i => (i, copy)) ++ Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "one two three four five six seven eight nine zzz"))).toDF("doc_id", "text")
    val uncapped = Dedup.prefixFilterPairs(docs, 0.7)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 435 + 1)
    val capped = Dedup.prefixFilterPairs(docs, 0.7, maxFamily = 5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)),
      "cap must drop the copy-family pairs and keep the rare-prefix pair")
    // a cap above every family size is the identity
    val generous = Dedup.prefixFilterPairs(docs, 0.7, maxFamily = 1000)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(generous == uncapped)
    // the audit makes the truncation observable: the copy family's
    // prefix keys exceed cap 5 (each shared by 30 docs → 435 excluded
    // candidate pairs per key); the generous cap drops nothing
    val audit = Dedup.prefixFamilyAudit(docs, 0.7, maxFamily = 5)
      .as[(Long, Long, Long)].head()
    assert(audit._1 > 0, "over-cap keys must be reported")
    assert(audit._2 == 30L, "largest family is the 30-copy cluster")
    assert(audit._3 >= 435L, "excluded candidate pairs counted per key")
    val auditNone = Dedup.prefixFamilyAudit(docs, 0.7, maxFamily = 1000)
      .as[(Long, Long, Long)].head()
    assert(auditNone == ((0L, 0L, 0L)), "generous cap excludes nothing")
  }

  test("D17: repeated-span coverage unions overlapping windows; intra-doc repeats count") {
    def toks(a: Int, b: Int) = (a until b).map(i => s"w$i").mkString(" ")
    val run16 = toks(0, 16) // 16 shared tokens = 2 overlapping 15-windows
    val docs = Seq(
      // doc 1: the 16-token run + unique tail. Both its windows (pos 0,
      // 1) repeat in doc 2 → coverage unions [0,15)+[1,16) = 16 tokens,
      // NOT 30
      (1L, run16 + " " + (100 until 104).map(i => s"u$i").mkString(" ")),
      // doc 2: unique head + the same 16-token run → covered 16 of 21
      (2L, (200 until 205).map(i => s"v$i").mkString(" ") + " " + run16),
      // doc 3: an INTRA-doc repeat — the same 15-gram twice, nothing
      // shared with other docs → both occurrences covered (30 of 30)
      (3L, toks(300, 315) + " " + toks(300, 315)),
      // doc 4: all unique, long enough to window → zero coverage
      (4L, toks(400, 430)),
      // doc 5: shorter than the window → no windows, zero coverage
      (5L, toks(500, 510))).toDF("doc_id", "text")
    val got = Dedup.repeatedSpanCoverage(docs)
      .select("doc_id", "n_tokens", "n_rep_windows", "covered_tokens")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 20L, 2L, 16L), s"doc 1: ${got(1L)}")
    assert(got(2L) == (2L, 21L, 2L, 16L), s"doc 2: ${got(2L)}")
    assert(got(3L) == (3L, 30L, 2L, 30L), s"doc 3: ${got(3L)}")
    assert(got(4L) == (4L, 30L, 0L, 0L), s"doc 4: ${got(4L)}")
    assert(got(5L) == (5L, 10L, 0L, 0L), s"doc 5: ${got(5L)}")
  }

  test("D19: Bloom membership never false-negatives; a saturated filter false-positives") {
    import org.apache.spark.sql.functions.col
    val corpus = (1L to 40L).map(i => (i, s"corpus document number $i"))
      .toDF("doc_id", "text")
    // probes: 10 re-delivered corpus texts + 30 genuinely new ones
    val probes = ((101L to 110L).map(i => (i, s"corpus document number ${i - 100}")) ++
      (201L to 230L).map(i => (i, s"fresh document $i")))
      .toDF("doc_id", "text")
    // adversarially tiny filter (64 bits, 3 hashes, 40 keys) — heavily
    // saturated, so false positives MUST appear while the
    // no-false-negative contract still holds
    val tiny = Dedup.bloomMembership(corpus, probes, mBits = 64L, kHash = 3)
      .as[(Long, Long, Int, Int)].collect()
    tiny.filter(_._4 == 1).foreach { r =>
      assert(r._3 == 1, s"false negative on re-delivered doc ${r._1}")
    }
    val fp = tiny.count(r => r._3 == 1 && r._4 == 0)
    assert(fp > 0, "a 64-bit filter over 40 keys must produce false positives")
    // production-sized filter: same contract, and the new docs all clear
    val big = Dedup.bloomMembership(corpus, probes)
      .as[(Long, Long, Int, Int)].collect()
    assert(big.count(_._4 == 1) == 10)
    big.foreach { r => assert((r._4 == 1) <= (r._3 == 1)) }
    assert(big.count(r => r._3 == 1 && r._4 == 0) == 0,
      "64Ki bits over 40 keys should not false-positive on 30 probes")
  }

  test("D2's O(n²) baseline refuses a corpus above the admission bound") {
    // the Ann.maxControlCorpus posture (r13) applied to the exact-
    // Jaccard control: the guard fires on the count, BEFORE the
    // quadratic join is even planned into a job
    import org.apache.spark.sql.functions.{col, concat, lit}
    val big = spark.range(0, Dedup.maxControlDocs + 1)
      .select(col("id").as("doc_id"),
        concat(lit("a b c d "), col("id")).as("text"))
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(big, 0.5)
    }
    assert(e.getMessage.contains("control baseline"))
  }
}
