package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Deterministic split/sample: exhaustive+disjoint assignment, run-to-run
  * and partitioning-independence, per-stratum rate enforcement. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sfDir, "documents")

  test("hash split assigns every row to exactly one split") {
    val s = Sampling.hashSplit(docs, col("doc_id"))
    assert(s.count() === docs.count())
    val bad = s.filter(
      (col("split") === "train") =!= (col("bucket") < 80) ||
      (col("split") === "val") =!= (col("bucket") >= 80 && col("bucket") < 90) ||
      (col("split") === "test") =!= (col("bucket") >= 90)).count()
    assert(bad === 0L)
  }

  test("assignment is independent of partitioning (re-shard never moves a doc)") {
    val once = Sampling.hashSplit(docs, col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val reparted = Sampling.hashSplit(docs.repartition(17), col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(once === reparted)
  }

  test("stratified sample enforces the per-stratum bucket rate") {
    val s = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 10), 50)
    assert(s.filter(col("lang") === "en" && col("bucket") >= 10).count() === 0L)
    assert(s.filter(col("lang") =!= "en" && col("bucket") >= 50).count() === 0L)
    // the sample is a subset keyed by the same hash — stable across runs
    val ids = s.select("doc_id").as[Long].collect().sorted
    val again = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 10), 50).select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq === again.toSeq)
  }

  test("balanced mix downsamples every stratum toward the smallest") {
    val mixed = Sampling.balancedMix(docs, col("doc_id"), col("lang"))
    val before = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val after = mixed.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val mn = before.values.min
    after.foreach { case (lang, kept) =>
      // every stratum lands near min_count: binomial(count_d, mn/count_d)
      // with resolution-10000 buckets — ±40% covers sf0.001's tiny strata
      assert(kept <= before(lang), s"$lang grew")
      assert(math.abs(kept - mn) <= math.max(4L, (mn * 0.4).toLong),
        s"$lang kept $kept, expected ≈$mn of ${before(lang)}")
    }
    // deterministic: same ids on a re-run over a re-shard
    val a = mixed.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.balancedMix(docs.repartition(13), col("doc_id"), col("lang"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("SA4: temperature mix interpolates between flat (τ=0) and natural (τ=1)") {
    def keptBy(tn: Int, td: Int): Map[String, Long] =
      Sampling.temperatureMix(docs, col("doc_id"), col("lang"), tn, td)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
    val natural = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val mn = natural.values.min
    val flat = keptBy(0, 1)     // τ=0 ⇒ balancedMix semantics
    val half = keptBy(1, 2)     // τ=1/2 ⇒ rate sqrt(min/cnt)
    val full = keptBy(1, 1)     // τ=1 ⇒ keep everything
    assert(full === natural)
    natural.keys.foreach { l =>
      assert(flat(l) <= half(l) + 2 && half(l) <= full(l),
        s"$l: expected flat ≤ half ≤ full, got ${flat(l)}/${half(l)}/${full(l)}")
      // τ=1/2 keeps ≈ sqrt(min·cnt) rows: cnt·(min/cnt)^(1/2)
      val expect = math.sqrt(mn.toDouble * natural(l)).toLong
      assert(math.abs(half(l) - expect) <= math.max(4L, (expect * 0.4).toLong),
        s"$l kept ${half(l)}, expected ≈$expect")
    }
    // reshard-stable like every sampler here
    val x = Sampling.temperatureMix(docs, col("doc_id"), col("lang"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val y = Sampling.temperatureMix(docs.repartition(7), col("doc_id"), col("lang"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(x === y)
  }

  test("SA5: quality filter keeps each language's top half by score") {
    val scored = graft.text.TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .as[(Long, String, Double)].collect()
    val kept = Sampling.qualityQuantileFilter(docs)
      .select("doc_id").as[Long].collect().toSet
    scored.groupBy(_._2).foreach { case (lang, rows) =>
      val (k, d) = rows.partition(r => kept(r._1))
      // separation: no dropped doc outscores a kept doc
      if (k.nonEmpty && d.nonEmpty)
        assert(d.map(_._3).max <= k.map(_._3).min, s"$lang: overlap across threshold")
      // ≥ half kept (ties at the median stay), but not everything
      assert(k.size * 2 >= rows.size, s"$lang kept ${k.size}/${rows.size}")
      assert(d.nonEmpty, s"$lang dropped nothing — threshold degenerate")
    }
  }

  test("SA6: fixed-size sample takes exactly min(k, |stratum|) docs, reshard-stable") {
    def sample(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(graft.text.TextAnalysis.hash60(col("doc_id").cast("string"), "sa6"),
          col("doc_id"))
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 20)
        .select("lang", "doc_id").as[(String, Long)].collect().toSet
    }
    val got = sample(docs)
    val strata = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.size === math.min(20L, strata(lang)), s"$lang size")
    }
    assert(sample(docs.repartition(13)) === got, "sample must not depend on sharding")
  }

  test("SA13: heap bottom-k sample equals the window formulation and is reshard-stable") {
    def prepared(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("lang"),
        graft.text.TextAnalysis.hash28(
          concat(lit("bk:"), col("doc_id").cast("string"))).as("h"))
    val heap = graft.operators.TopK.perKey(prepared(docs), Seq("lang"),
        Seq(col("h").asc, col("doc_id").asc), 7)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    val window = prepared(docs).withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(heap === window, "heap bottom-k must equal the window formulation")
    val resharded = graft.operators.TopK.perKey(prepared(docs.repartition(13)),
        Seq("lang"), Seq(col("h").asc, col("doc_id").asc), 7)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(resharded === heap, "sample must not depend on sharding")
    val strata = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    heap.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.size === math.min(7L, strata(lang)), s"$lang exact-k")
    }
  }

  test("SA12: epoch upsampling caps repetition, fills budget, and is reshard-stable") {
    // tiny stratum (100 tokens) vs huge (900) → budget 500 each:
    // tiny's uncapped rate is 5.0 epochs → capped at 3.0 (exactly 3
    // copies, no coin); huge gets 0.55 → each doc 0 or 1 copies with
    // P = 0.55 on the salted hash.
    val docs = ((1L to 10L).map(i => (i, "tiny", 10L)) ++
      (11L to 100L).map(i => (i, "huge", 10L)))
      .toDF("doc_id", "src", "tok")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.epochUpsample(d, col("doc_id"), col("src"), col("tok"))
        .as[(Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._5)).toSeq
    val got = run(docs)
    val byDoc = got.groupBy(_._1)
    // every tiny doc: exactly 3 copies at the cap
    (1L to 10L).foreach { i =>
      assert(byDoc(i).length == 3 && byDoc(i).head._3 == 300L, s"tiny doc $i")
    }
    // huge docs: n_copies ∈ {0 (absent), 1}, rate 55 basis points
    byDoc.filter(_._1 > 10L).foreach { case (i, rows) =>
      assert(rows.length == 1 && rows.head._3 == 55L, s"huge doc $i: $rows")
    }
    val hugeKept = got.count(_._2 == "huge")
    // 90 docs at P=0.55 — the deterministic-hash realization is fixed;
    // just bound it away from degenerate all/none
    assert(hugeKept > 30 && hugeKept < 75, s"huge kept: $hugeKept")
    // copy ids are 1..n_copies and the result is reshard-stable
    got.groupBy(r => r._1).foreach { case (_, rows) =>
      assert(rows.map(_._5).sorted == (1L to rows.length).toSeq)
    }
    assert(run(docs.repartition(7)) == got, "upsample must not depend on sharding")
  }

  test("SA15: DSIR importance separates target-vocab docs when vocabularies diverge") {
    // the registered query runs on the shared-vocabulary harness corpus
    // (every token appears in every language — separation is honestly
    // weak there); THIS corpus has disjoint vocabularies, where the
    // likelihood-ratio machinery must separate sharply: target docs use
    // {red green blue}, source-only docs use {xx yy zz}.
    val rows =
      (1L to 40L).map(i => (i, "red green blue red green", "en")) ++
      (41L to 80L).map(i => (i, "xx yy zz xx yy", "zh"))
    val docs = rows.toDF("doc_id", "text", "lang")
    val got = graft.sampling.Sampling
      .dsirResample(docs, col("lang") === "en")
      .select("doc_id", "score_milli", "kept")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val (tgt, src) = got.partition(_._1 <= 40L)
    // target-vocab docs: every token's bucket is ~pure-target, ratio
    // p_t/p_s ≈ (nt+1)(Ns+1)/((ns+1)(Nt+1)) ≈ Ns/Nt ≈ 2 ⇒ score ~2000;
    // source-only docs: nt = 0 per bucket ⇒ score near 0
    assert(tgt.forall(_._2 > 1500), s"target scores: ${tgt.take(3).mkString(",")}")
    assert(src.forall(_._2 < 200), s"source scores: ${src.take(3).mkString(",")}")
    // the draw is importance-proportional: capped target scores keep
    // (near-)everything, near-zero source scores keep (near-)nothing
    assert(tgt.count(_._3 == 1) >= 35, "high-importance docs must mostly survive")
    assert(src.count(_._3 == 1) <= 5, "low-importance docs must mostly drop")
    // deterministic: reshard-stable
    val resharded = graft.sampling.Sampling
      .dsirResample(docs.repartition(7), col("lang") === "en")
      .select("doc_id", "score_milli", "kept")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(resharded.toSeq == got.toSeq)
  }
}
