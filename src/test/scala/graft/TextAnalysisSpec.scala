package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("T3: whitespace vs BPE-ish token counts on a known string") {
    val df = Seq((1L, "spark runs 32 tasks fast!")).toDF("doc_id", "text")
    val r = TextAnalysis.withTokenCounts(df).head()
    assert(r.getAs[Int]("n_ws_tokens") === 5)
    // [spark][runs][32][tasks][fast][!]
    assert(r.getAs[Int]("n_bpe_tokens") === 6)
  }

  test("native BpeTokenCount equals the regex formulation") {
    import org.apache.spark.sql.functions._
    val tricky = Seq(
      (1L, "abc def"), (2L, "abc123def"), (3L, "!!a1!b..c "),
      (4L, ""), (5L, "   "), (6L, "42"), (7L, "a,b.c;d 99x")
    ).toDF("doc_id", "text")
    val corpus = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    Seq(tricky, corpus).foreach { df =>
      val both = df.select(col("doc_id"),
        graft.functions.TextExpressions.bpeTokenCount(col("text")).as("native"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("regex"))
      assert(both.filter(col("native") =!= col("regex")).count() === 0L)
    }
  }

  test("T4: fingerprint is order-sensitive but deterministic") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df).as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(3L), "same text, same fingerprint")
    assert(fp(1L) !== fp(2L), "token order must change the fingerprint")
  }

  test("T1: predicted language is deterministic and covers every doc") {
    val out = TextAnalysis.withLangScores(Tables.documents(spark, sfDir))
    assert(out.filter(col("predicted_lang").isNull).count() === 0)
    val langs = out.select("predicted_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(TextAnalysis.langMarkers.map(_._1).toSet))
  }

  test("T2: quality score stays in [0,1]") {
    val q = TextAnalysis.withQuality(Tables.documents(spark, sfDir))
      .agg(min("quality_score"), max("quality_score")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("native WordShingles matches the built-in lambda formulation exactly") {
    val docs = Tables.documents(spark, sfDir)
    val w = TextAnalysis.words(col("text"))
    val native = docs.select(col("doc_id"),
      graft.functions.TextExpressions.wordShingles(w, 3).as("g"))
    val builtin = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.shingles3(w)).as("g"))
    assert(native.exceptAll(builtin).isEmpty && builtin.exceptAll(native).isEmpty)
  }

  test("shingles3 guards short docs (no descending-sequence bug)") {
    val df = Seq((1L, "one two")).toDF("doc_id", "text")
    val n = df.select(size(TextAnalysis.shingles3(TextAnalysis.words(col("text")))).as("n"))
      .head().getInt(0)
    assert(n === 0)
  }

  test("T8: repetition metrics on hand-computed documents") {
    // "a a a b": tokens a×3 b×1 → dup = 1-2/4, top = 3/4;
    // bigrams [a a, a a, a b] → dup = 1-2/3, top = 2/3.
    val df = Seq((1L, "a a a b"), (2L, "solo")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getDouble(1) === 0.5)     // dup_token_frac
    assert(m(1L).getDouble(2) === 0.75)    // top_token_frac
    assert(m(1L).getDouble(3) === 0.3333)  // dup_bigram_frac
    assert(m(1L).getDouble(4) === 0.6667)  // top_bigram_frac
    // single-token doc: token metrics defined, bigram metrics NULL
    assert(m(2L).getDouble(1) === 0.0 && m(2L).getDouble(2) === 1.0)
    assert(m(2L).isNullAt(3) && m(2L).isNullAt(4))
  }

  test("T11: gopher rules evaluate each filter on crafted documents") {
    val longDoc = Array.fill(60)("the good word and").mkString(" ") // 240 words, stopwords ok
    val docs = Seq(
      (1L, longDoc),                                        // passes everything
      (2L, "the a of to and tiny"),                         // < 50 words
      (3L, Array.fill(30)("the xx ##tag...").mkString(" ")) // symbol-heavy
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs)
      .select("doc_id", "keep", "n_words", "n_stop").collect()
      .map(x => x.getLong(0) -> (x.getBoolean(1), x.getInt(2), x.getInt(3))).toMap
    assert(r(1L)._1, "long clean doc must pass")
    assert(!r(2L)._1 && r(2L)._2 < 50, "short doc fails the word-count rule")
    assert(!r(3L)._1, "symbol-laden doc fails the symbol-ratio rule")
    // symbol fraction on doc 3: every 3rd word carries # and ...
    val s3 = TextAnalysis.gopherRules(docs).filter(col("doc_id") === 3)
      .select("symbol_frac").head().getDouble(0)
    assert(s3 > 0.3)
  }

  test("T9: PII scrub redacts emails, IPv4s, and dictionary terms") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.com from 10.0.42.7 re customer intake"),
      (2L, "no pii here"),
      (3L, "customer customer and uncustomary words")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) === 1 && got(1L).getInt(2) === 1 && got(1L).getInt(3) === 1)
    assert(got(1L).getString(4) === "mail <EMAIL> from <IP> re <NAME> intake")
    assert(got(2L).getString(4) === "no pii here")
    // word-boundary anchored: "uncustomary" survives, both bare hits redact
    assert(got(3L).getInt(3) === 2)
    assert(got(3L).getString(4) === "<NAME> <NAME> and uncustomary words")
  }

  test("T14: intra-doc segment dedup keeps first occurrence in order") {
    val df = Seq(
      (1L, "a b c d a b e f"),      // "a b" repeats at segments 0 and 2
      (2L, "x y x y x y"),          // one segment survives of three
      (3L, "p q r"),                // odd length: trailing partial segment
      (4L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.intraDocDedup(df, width = 2)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(got === Seq(
      (1L, "a b c d e f", 3, 4),
      (2L, "x y", 1, 3),
      (3L, "p q r", 2, 2),          // "p q" and "r" both kept
      (4L, "solo", 1, 1)))
  }

  test("native SegmentDedup is bit-identical to the Column-API chain") {
    // real corpus + the edge shapes where split semantics diverge
    // (trailing/leading/double spaces: split(_, -1) keeps empties)
    import org.apache.spark.sql.functions.col
    val edges = Seq((9001L, "a b "), (9002L, " a"), (9003L, "a  b"),
      (9004L, "a"), (9005L, "x y x y x y")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .union(edges)
    for (w <- Seq(1, 2, 3, 20)) {
      val native = TextAnalysis.intraDocDedup(docs, width = w)
        .orderBy("doc_id").collect().toSeq
      val columns = TextAnalysis.intraDocDedupColumns(docs, width = w)
        .orderBy("doc_id").collect().toSeq
      assert(native === columns, s"width=$w")
    }
  }

  test("T20: classifier score is the exact integer mean of bucket weights") {
    import org.apache.spark.sql.functions._
    // single-token docs: the score IS that token's bucket weight, so
    // the whole hash→bucket→weight→mean chain is pinned per token
    val single = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    def weightOf(tok: String): Long = spark.range(1)
      .select((TextAnalysis.hash28(concat(
        lit("clw:"), (TextAnalysis.hash28(lit("cls:" + tok)) % 4096L)
          .cast("string"))) % 2001L).as("w"))
      .as[Long].head()
    val got = TextAnalysis.classifierScore(single)
      .select("doc_id", "n_tokens", "score_milli", "keep")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    val toks = Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    got.foreach { case (id, n, score, keep) =>
      val w = weightOf(toks(id))
      assert(n == 1L && score == w, s"doc $id: score $score vs weight $w")
      assert(keep == (if (w >= 1000) 1 else 0))
    }
    // multi-token doc: integer mean (floor), not float
    val multi = Seq((10L, "alpha beta gamma")).toDF("doc_id", "text")
    val ws = Seq("alpha", "beta", "gamma").map(weightOf)
    val m = TextAnalysis.classifierScore(multi)
      .select("n_tokens", "score_milli").as[(Long, Long)].head()
    assert(m == ((3L, ws.sum / 3)), s"got $m expected ${(3L, ws.sum / 3)}")
    // reshard-stable on the harness corpus
    val docs = Tables.documents(spark, sfDir)
    val a = TextAnalysis.classifierScore(docs).orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.classifierScore(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
