package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: tokenization,
  * shingling, deterministic 60-bit content hashing, language ID, quality
  * scoring, token counting, and document fingerprinting.
  *
  * Everything is built from codegen'd expressions (no UDFs) and — key
  * design decision — all hashing is md5-derived so the DuckDB oracle can
  * replicate results bit-for-bit: `hash60(x) = first 15 hex chars of
  * md5(salt:x) as a 60-bit integer`. A JVM-specific hash (murmur3,
  * xxhash) would be faster but unverifiable cross-engine; at 100 TB the
  * md5 cost is still embarrassingly parallel scan work, and a later swap
  * to xxhash64 is a one-line change per call site.
  */
object TextAnalysis {

  /** Whitespace tokenization (the reference corpus is space-delimited). */
  def words(text: Column): Column = split(text, " ")

  /** Deterministic 60-bit salted content hash (see object scaladoc). */
  def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), c).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic 28-bit unsalted content hash — small enough that
    * universal-hash permutations `(a*h + b) mod P` stay inside 64-bit
    * arithmetic (a < 2^29, h < 2^28 ⇒ product < 2^57, ANSI-safe). */
  def hash28(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")

  /** 3-gram word shingles; < 3 words ⇒ empty (guard needed because
    * Spark's `sequence(1, 0)` counts DOWN instead of returning empty). */
  def shingles3(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(typedlit(Seq.empty[String]))

  /** Characteristic-word lists per language for the n-gram/stopword
    * language-ID heuristic. Keys sorted alphabetically = tie-break order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("sort", "merge", "join", "group", "agg"),
    "en" -> Seq("the", "a", "fast", "slow", "big", "small"),
    "es" -> Seq("data", "row", "column", "table", "key"),
    "fr" -> Seq("query", "filter", "scan", "window", "batch"),
    "zh" -> Seq("spark", "stream", "vector", "hash", "dup"))

  /** Language ID: overlap score against each marker list, argmax with
    * alphabetical tie-break. One pass, no shuffle — pure projection. */
  def withLangScores(docs: DataFrame): DataFrame = {
    val distinctWords = array_distinct(words(col("text")))
    val scored = langMarkers.foldLeft(docs) { case (d, (l, ws)) =>
      d.withColumn(s"score_$l", size(array_intersect(distinctWords, typedlit(ws))))
    }
    val langs = langMarkers.map(_._1)
    // argmax via ordered when-chain: first lang (alphabetical) whose
    // score is >= all later langs' scores wins.
    val predicted = langs.zipWithIndex.init.foldLeft(when(lit(false), lit(""))) {
      case (acc, (l, i)) =>
        val rest = langs.drop(i + 1)
        acc.when(rest.map(r => col(s"score_$l") >= col(s"score_$r")).reduce(_ && _), lit(l))
    }.otherwise(lit(langs.last))
    scored.withColumn("predicted_lang", predicted)
  }

  /** T21: segment-level language ID — CODE-SWITCHING detection, the
    * curation signal document-level langID (t1) structurally cannot
    * see: a half-English/half-Spanish page scores as mildly-both at
    * the document grain but flips cleanly segment by segment. Each
    * ⌈n/segTokens⌉-token window runs t1's marker-overlap argmax (same
    * markers, same tie-break chain, so the two grains can never
    * disagree about what a language "is"); the profile is then
    * segments, adjacent-segment switches, the dominant language, and
    * its exact milli-fraction — mixed-language docs route to
    * splitting/per-lang pipelines instead of polluting one bucket.
    *
    * Scale: one explode into (doc, segment) slim rows (bodies carried
    * only to the slice projection, never shuffled past it), one
    * per-doc window for switch counting, one tiny per-(doc, lang)
    * rollup for dominance. All integer arithmetic; hash-oracled. */
  def codeSwitchProfile(docs: DataFrame, segTokens: Int = 20): DataFrame = {
    val w = words(col("text"))
    val nSeg = greatest(lit(1L),
      ceil(size(w) / lit(segTokens.toDouble)).cast("long"))
    val segs = docs
      .select(col("doc_id"), w.as("w"),
        explode(sequence(lit(0L), nSeg - 1)).as("seg"))
      .select(col("doc_id"), col("seg"),
        array_distinct(slice(col("w"),
          (col("seg") * segTokens + 1).cast("int"), lit(segTokens))).as("sw"))
    val scored = langMarkers.foldLeft(segs) { case (d, (l, ws)) =>
      d.withColumn(s"score_$l", size(array_intersect(col("sw"), typedlit(ws))))
    }
    val langs = langMarkers.map(_._1)
    val predicted = langs.zipWithIndex.init.foldLeft(when(lit(false), lit(""))) {
      case (acc, (l, i)) =>
        val rest = langs.drop(i + 1)
        acc.when(rest.map(r => col(s"score_$l") >= col(s"score_$r")).reduce(_ && _), lit(l))
    }.otherwise(lit(langs.last))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("seg"))
    val labeled = scored.select(col("doc_id"), col("seg"), predicted.as("seg_lang"))
      .withColumn("switch",
        (col("seg_lang") =!= lag(col("seg_lang"), 1).over(byDoc)).cast("int"))
    val base = labeled.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        coalesce(sum(col("switch")), lit(0L)).as("n_switches"))
    val dom = labeled.groupBy(col("doc_id"), col("seg_lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("seg_lang"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("seg_lang").as("dominant_lang"),
        col("c").as("dom_segments"))
    base.join(dom, "doc_id")
      .select(col("doc_id"), col("n_segments"), col("n_switches"),
        col("dominant_lang"),
        expr("(dom_segments * 1000) div n_segments").as("dominant_frac_milli"))
  }

  /** Stopword list for quality scoring (ratio of filler tokens). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  /** Quality scoring: length, uniqueness, stopword density → composite
    * in [0,1]. The composite's 4-dp value is computed in EXACT INTEGER
    * arithmetic with pinned round-half-up — the double formulation hit
    * data-dependent .XXXX5 boundaries where Spark's `round` (shortest-
    * decimal-string HALF_UP) and DuckDB's (binary-value) disagree
    * (sf0.1 doc 663: exact composite 0.60225 → 0.6023 vs 0.6022). The
    * exact rational is q = T / (10000·n_words) with
    * T = 5000·n_unique + 2000·(n_words−n_stop) + 30·min(100,n_words)·n_words,
    * so q₄ = ⌊(2T + n_words) / (2·n_words)⌋ is the half-up 4-dp value
    * as one integer division, identical in any engine. */
  def withQuality(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val uniqueRatio = col("n_unique").cast("double") / col("n_words")
    val stopRatio = col("n_stop").cast("double") / col("n_words")
    docs
      .withColumn("n_words", size(w))
      .withColumn("n_unique", size(array_distinct(w)))
      .withColumn("n_stop", size(filter(w, x => array_contains(typedlit(stopwords), x))))
      .withColumn("avg_word_len",
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_words"), 4))
      .withColumn("q_t",
        lit(5000L) * col("n_unique") + lit(2000L) * (col("n_words") - col("n_stop")) +
          lit(30L) * least(lit(100L), col("n_words").cast("long")) * col("n_words"))
      .withColumn("quality_score",
        expr("(2 * q_t + n_words) div (2 * n_words)").cast("double") / 10000.0)
      .drop("q_t")
      .withColumn("unique_ratio", round(uniqueRatio, 4))
      .withColumn("stop_ratio", round(stopRatio, 4))
  }

  /** 2-gram word shingles; < 2 words ⇒ empty (same `sequence` guard as
    * [[shingles3]]). */
  def bigrams(w: Column): Column =
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(typedlit(Seq.empty[String]))

  /** Exploded adjacent-pair rows — the row-generating twin of
    * [[bigrams]], and the form every aggregation pipeline should use:
    * higher-order `transform` is NOT codegen'd in Spark, and exploding
    * the interpreted array measured 13× the cost of a plain explode at
    * sf0.1 (2.3 s vs 0.18 s warm, ProfileT12). Here the generator runs
    * over a primitive int `sequence` and the bigram string is
    * assembled by codegen'd element_at/concat_ws OUTSIDE the
    * generator, keeping the whole stage in WholeStageCodegen.
    *
    * Docs with < 2 tokens produce no rows (filtered BEFORE the
    * sequence: `sequence(1, 0)` would generate a descending range, not
    * an empty one). Output keeps `df`'s columns plus `bg`. */
  def bigramRows(df: DataFrame, tokens: Column, bg: String): DataFrame = {
    val t = df.withColumn("__w", tokens)
      .filter(size(col("__w")) >= 2)
      .withColumn("__i", explode(sequence(lit(1), size(col("__w")) - 1)))
    t.withColumn(bg, concat_ws(" ",
        element_at(col("__w"), col("__i")),
        element_at(col("__w"), col("__i") + 1)))
      .drop("__w", "__i")
  }

  /** T8: repetition metrics in the style of the Gopher quality rules
    * (Rae et al. 2021 §A1.1): fraction of duplicate tokens/2-grams and
    * the share taken by the single most-frequent token/2-gram. High
    * values flag boilerplate, keyword stuffing, and generation loops —
    * the documents a curation pipeline drops before training.
    *
    * Shape: explode → count per (doc, term) → one per-doc aggregate;
    * everything keyed by doc_id, so the two token-level shuffles
    * partition evenly at any corpus size and nothing is ever global.
    * 2-gram metrics are NULL for single-token documents (no bigrams
    * exist; a left join keeps the row). */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"), words(col("text")).as("tk"))
    val tokenAgg = tk.select(col("doc_id"), explode(col("tk")).as("x"))
      .groupBy(col("doc_id"), col("x")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
    val bigramAgg = bigramRows(tk, col("tk"), "g")
      .select(col("doc_id"), col("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), count(lit(1)).as("n_distinct_g"),
        max(col("c")).as("top_g"))
    tokenAgg.join(bigramAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("dup_token_frac"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 4)
          .as("top_token_frac"),
        round(lit(1.0) - col("n_distinct_g").cast("double") / col("n_bigrams"), 4)
          .as("dup_bigram_frac"),
        round(col("top_g").cast("double") / col("n_bigrams"), 4)
          .as("top_bigram_frac"))
  }

  /** T11: Gopher static quality rules (Rae et al. 2021, Table A1) —
    * the document-shape filters a curation pipeline applies before the
    * repetition metrics of [[repetitionMetrics]]:
    *  - word count in [50, 100000]
    *  - mean word length in [3, 10]
    *  - symbol-to-word ratio ≤ 0.1 (`#` or `...` bearing words)
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 stopwords (the "real prose" test)
    *
    * Pure projection — one scan, no shuffle, embarrassingly parallel at
    * any corpus size. The `keep` verdict is computed from the UNROUNDED
    * ratios (see [[withQuality]]'s rounding-boundary note); the rounded
    * columns are reporting-only. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nWords = col("n_words").cast("double")
    val meanLen = col("n_letters").cast("double") / nWords
    val symbolFrac = col("n_symbol").cast("double") / nWords
    val alphaFrac = col("n_alpha").cast("double") / nWords
    docs
      .withColumn("n_words", size(w))
      .withColumn("n_letters", length(regexp_replace(col("text"), " ", "")))
      .withColumn("n_symbol", size(filter(w, x => x.contains("#") || x.contains("..."))))
      .withColumn("n_alpha", size(filter(w, x => x.rlike("[a-zA-Z]"))))
      .withColumn("n_stop", size(filter(w, x => array_contains(typedlit(stopwords), x))))
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
          meanLen >= 3.0 && meanLen <= 10.0 &&
          symbolFrac <= 0.1 &&
          alphaFrac >= 0.8 &&
          col("n_stop") >= 2)
      .withColumn("mean_word_len", round(meanLen, 4))
      .withColumn("symbol_frac", round(symbolFrac, 4))
      .withColumn("alpha_frac", round(alphaFrac, 4))
  }

  /** T9: PII scrubbing — the redaction pass a corpus runs before
    * training. Three deterministic redaction classes, each counted on
    * the original text and replaced in sequence:
    *  - emails  → `<EMAIL>`
    *  - IPv4    → `<IP>`
    *  - a dictionary of sensitive terms → `<NAME>` (word-boundary
    *    anchored; stands in for the gazetteer/NER stage of a production
    *    scrubber — swap the alternation for a broader list or a model
    *    without touching the plumbing)
    *
    * Pure projection (regexp_count/regexp_replace are codegen'd) — no
    * shuffle, pushes through column pruning, embarrassingly parallel at
    * any corpus size. Patterns deliberately stay in the common
    * Java-regex ∩ RE2 subset (no backrefs, no lookaround) so the DuckDB
    * oracle replays them verbatim. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiScrub(docs: DataFrame,
               nameDict: Seq[String] = Seq("customer")): DataFrame = {
    val nameRe = "\\b(" + nameDict.mkString("|") + ")\\b"
    val t = col("text")
    docs.select(col("doc_id"),
      regexp_count(t, lit(emailRe)).as("n_email"),
      regexp_count(t, lit(ipv4Re)).as("n_ip"),
      regexp_count(t, lit(nameRe)).as("n_name"),
      regexp_replace(regexp_replace(regexp_replace(
        t, emailRe, "<EMAIL>"), ipv4Re, "<IP>"), nameRe, "<NAME>")
        .as("scrubbed"))
  }

  /** Token counting: whitespace tokens + a BPE-ish segmentation
    * (letter runs / digit runs / single punctuation — the native
    * [[graft.functions.BpeTokenCount]] scan; equivalence with the
    * regex `[a-z]+|[0-9]+|[^a-z0-9 ]` is pinned in TextAnalysisSpec
    * and by the DuckDB regex oracle). */
  def withTokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_ws_tokens", size(words(col("text"))))
      .withColumn("n_bpe_tokens",
        graft.functions.TextExpressions.bpeTokenCount(col("text")))

  /** T19: lexical-diversity quality signals — type-token ratio and
    * hapax-legomenon fraction per document. Low TTR flags templated /
    * repetitive text (the t8 repetition signal from the vocabulary
    * side); a high hapax fraction flags OCR noise and gibberish
    * (every "word" unique). Both are standard corpus-QA features next
    * to the Gopher rules (t11).
    *
    * Two-level aggregate — (doc, token) counts, then a per-doc rollup
    * — so every stage has map-side partial aggregation and nothing
    * collects a vocabulary list per row. Counts are exact integers;
    * the two ratios are single divisions rounded 4dp for display. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 4).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 4).as("hapax_frac"))

  /** Document fingerprint: position-salted rolling-style hash folded
    * with BIT_XOR — order-sensitive (token swaps change it) yet
    * aggregation-order-independent, so it distributes with no sort.
    * The multiplier is the 32-bit FNV/Knuth constant; h + pos*c stays
    * well under 2^63 (ANSI-safe, no overflow). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"),
        (hash60(col("w"), "fp") + col("pos") * lit(2654435761L)).as("term"))
      .groupBy("doc_id")
      .agg(expr("bit_xor(term)").as("fingerprint"))

  /** Intra-document segment dedup — the C4-style "remove repeated
    * lines" cleanup, adapted to the corpus's line-less text by treating
    * fixed `width`-word windows as segments: repeated segments are
    * dropped, first occurrence kept, document reassembled in order.
    * (Cross-document passage dedup is d11; this is its within-document
    * complement — boilerplate that repeats INSIDE a page.)
    *
    * Scale: a pure projection — segmentation is array `slice`/
    * `transform` on the already-split token array and first-occurrence
    * dedup is `array_distinct` (which preserves first-occurrence
    * order), so there is NO shuffle and no explode; the operator runs
    * at scan speed on any corpus size. The higher-order lambdas are
    * interpreted (PLANS.md round-7 note) but per-row over short
    * arrays — linear, not the t12-class generator hot path.
    */
  def intraDocDedup(docs: DataFrame, width: Int = 2): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.TextExpressions.segmentDedup(col("text"), width).as("r"))
      .select(col("doc_id"), col("r.clean_text").as("clean_text"),
        col("r.n_kept").as("n_kept"), col("r.n_segments").as("n_segments"))

  /** The Column-API formulation [[intraDocDedup]]'s native expression
    * replaced (kept for the equivalence spec): interpreted HOF lambdas
    * per segment, token array re-materialized per consumer. */
  private[graft] def intraDocDedupColumns(docs: DataFrame, width: Int = 2): DataFrame = {
    val arr = words(col("text"))
    val nSeg = ceil(size(arr) / lit(width.toDouble)).cast("int")
    val segs = transform(sequence(lit(0), nSeg - 1),
      i => array_join(slice(arr, i * width + 1, lit(width)), " "))
    val kept = array_distinct(segs)
    docs.select(col("doc_id"),
      array_join(kept, " ").as("clean_text"),
      size(kept).as("n_kept"),
      size(segs).as("n_segments"))
  }

  /** T20: linear text-classifier INFERENCE via the hashing trick — the
    * fastText/GPT-3-quality-filter serving shape: tokens hash into a
    * FIXED bucket space (here 2^12; fastText uses 2^21), each bucket
    * carries a trained weight, a document's score is the mean bucket
    * weight of its tokens, and the keep decision is a threshold on
    * that score. The hashing trick is what makes the shape
    * 100 TB-safe: the weight table is `buckets` rows BY CONSTRUCTION —
    * independent of corpus vocabulary — so it always broadcasts, the
    * join is map-side, and document bodies never shuffle (explode
    * projects slim (doc_id, bucket) rows; the per-doc mean partial-
    * aggregates before the one doc_id exchange).
    *
    * Weights here derive deterministically from the bucket id (md5-28
    * mod 2001 ∈ [0, 2000] — nonnegative so the integer mean floors
    * identically in both engines); in production the trained
    * classifier's weight vector loads in their place — the PLAN is
    * identical. Score is exact integer math end to end, hence
    * hash-oracled: score_milli = Σw div n_tokens, keep = score ≥ 1000
    * (the all-buckets-equally-likely null expectation).
    *
    * Reference anchor: the quality-gate stage of the reference's
    * ingest (webhook_app.py's whitelist routing decides what enters
    * the warehouse); this is that gate's ML-scored form at corpus
    * scale. */
  def classifierScore(docs: DataFrame, buckets: Int = 4096,
      thresholdMilli: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    val weights = spark.range(buckets.toLong).toDF("bucket")
      .select(col("bucket"),
        (hash28(concat(lit("clw:"), col("bucket").cast("string"))) % 2001L)
          .as("w_milli"))
    val toks = docs.select(col("doc_id"),
        explode(words(col("text"))).as("tk"))
      .select(col("doc_id"),
        (hash28(concat(lit("cls:"), col("tk"))) % buckets.toLong).as("bucket"))
    toks.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_milli")).as("sw"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sw div n_tokens").as("score_milli"),
        (expr("sw div n_tokens") >= thresholdMilli).cast("int").as("keep"))
  }

  /** Oracle SQL for [[classifierScore]] on the documents table —
    * weight derivation, bucket hash, and integer mean replayed
    * step-for-step. */
  def classifierScoreSql(buckets: Int = 4096, thresholdMilli: Int = 1000): String =
    s"""WITH wt AS (SELECT bucket,
       |    ('0x' || substr(md5('clw:' || bucket), 1, 7))::BIGINT % 2001 AS w_milli
       |  FROM (SELECT unnest(range($buckets)) AS bucket)),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
       |tb AS (SELECT doc_id,
       |    ('0x' || substr(md5('cls:' || tk), 1, 7))::BIGINT % $buckets AS bucket
       |  FROM tok),
       |sc AS (SELECT doc_id, count(*) AS n_tokens, sum(w_milli) AS sw
       |  FROM tb JOIN wt USING (bucket) GROUP BY doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(sw // n_tokens AS BIGINT) AS score_milli,
       |  (sw // n_tokens >= $thresholdMilli)::INT AS keep
       |FROM sc ORDER BY doc_id""".stripMargin
}
