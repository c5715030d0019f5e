package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.hash28

/** Deterministic sampling / split assignment for the training-data
  * pipeline. Everything is keyed on a salted content hash of the row id
  * — NOT on `rand()` — so that:
  *  - assignment is reproducible across runs, engines, partitionings,
  *    and cluster sizes (a re-shard never moves a document between
  *    train and test);
  *  - the split is a pure projection: no shuffle, no driver state, no
  *    seed plumbing — it scales to 100 TB as embarrassingly parallel
  *    scan work and pushes through any column-pruned Parquet read;
  *  - the DuckDB oracle reproduces it bit-for-bit (md5-derived buckets,
  *    see TextAnalysis.hash60 scaladoc for the rationale).
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from a salted md5 of the id. */
  def bucket(id: Column, salt: String, buckets: Int = 100): Column =
    hash28(concat(lit(salt + ":"), id.cast("string"))) % buckets

  /** Train/val/test split assignment: bucket < trainPct → train,
    * < trainPct+valPct → val, else test. Adds `bucket` and `split`. */
  def hashSplit(df: DataFrame, id: Column, salt: String = "split",
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("bucket", bucket(id, salt))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Stratified deterministic sample: per-stratum percentage rates
    * (e.g. downsample an over-represented language). Rows keep their
    * stratum's rate: bucket(id) < rate(stratum). */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Int], defaultRate: Int,
                       salt: String = "strat"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, r).otherwise(acc)
    }
    df.withColumn("bucket", bucket(id, salt)).filter(col("bucket") < rate)
  }

  /** SA14: per-ROW weight-proportional deterministic sampling — keep
    * row i with probability min(w_i, cap)/cap (e.g. w = character or
    * token count: long documents are kept surely, short ones in
    * proportion — the standard length-weighted curation draw whose
    * expected sampled-token mass is uniform per document up to the
    * cap). The keep predicate is integer cross-multiplication —
    * `bucket · cap < resolution · min(w, cap)` — the sa3 posture
    * applied per row: no float rate, bit-stable across engines and
    * re-shards, and the whole operator is one scan-side projection +
    * filter (no shuffle, pushes through column pruning at 100 TB). */
  def weightedSample(df: DataFrame, id: Column, weight: Column, cap: Long,
                     salt: String = "wsamp", resolution: Int = 10000): DataFrame =
    df.withColumn("bucket", bucket(id, salt, resolution))
      // NULL weight → keep-prob 0 in BOTH engines, explicitly: Spark's
      // `least` SKIPS nulls (least(NULL, cap) = cap — a null-weighted
      // row would be kept surely), so the coalesce is load-bearing,
      // not defensive
      .filter(col("bucket") * lit(cap) <
        lit(resolution.toLong) * least(coalesce(weight, lit(0L)), lit(cap)))

  /** SA3: balanced domain mix — deterministically downsample every
    * stratum (language, source, ...) to the size of the SMALLEST one,
    * the data-mixing step before training when domains must contribute
    * equally. Rates are derived from the data, not configured: stratum
    * d keeps ~min_count/count_d of its rows.
    *
    * The keep predicate is integer cross-multiplication —
    * `bucket * count_d < resolution * min_count` — never a floating-
    * point rate, so Spark and any oracle agree bit-for-bit and the
    * sample is stable under re-sharding (same salted-hash posture as
    * [[hashSplit]]). Scale: the per-stratum count table is |domains|
    * rows; it broadcasts, and the corpus itself sees one scan + one
    * broadcast-join — no wide shuffle of bodies. */
  def balancedMix(df: DataFrame, id: Column, stratum: Column,
                  salt: String = "mix", resolution: Int = 10000): DataFrame = {
    val counts = df.groupBy(stratum.as("stratum_key"))
      .agg(count(lit(1)).as("stratum_cnt"))
    // global min via an unpartitioned window over the |domains|-row
    // count table: a second `counts.agg(min)` branch would re-scan the
    // corpus (the plan audit's re-scan detector exists for exactly this).
    val rates = counts.withColumn("min_cnt",
      min(col("stratum_cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy()))
    df.join(broadcast(rates), stratum === col("stratum_key"))
      .withColumn("bucket", bucket(id, salt, resolution))
      .filter(col("bucket") * col("stratum_cnt") <
        lit(resolution.toLong) * col("min_cnt"))
      .drop("stratum_key", "stratum_cnt", "min_cnt")
  }

  /** SA5: per-domain quality-quantile filtering — keep each domain's
    * top (1-q) fraction by [[graft.text.TextAnalysis.withQuality]]
    * score (q = 0.5 ⇒ drop the bottom half per language), the standard
    * "filter junk per domain, don't let one domain's scale set the
    * bar" curation step.
    *
    * The threshold, not the rank, is what's distributed: one aggregate
    * computes the per-domain quantile (a |domains|-row table), it
    * broadcasts, and the keep decision is a map-side comparison — no
    * per-domain global sort of the corpus survives into the filter. At
    * 100 TB swap the exact `percentile` (per-group sort inside the agg)
    * for `approx_percentile` with an accuracy bound — a one-line
    * change; the broadcast-threshold shape is unchanged. Exact here so
    * the DuckDB oracle (quantile_cont) matches bit-for-bit. */
  def qualityQuantileFilter(docs: DataFrame, q: Double = 0.5): DataFrame = {
    val scored = graft.text.TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("lang"), col("quality_score"))
    val thr = scored.groupBy(col("lang"))
      .agg(expr(s"percentile(quality_score, $q)").as("q_thr"))
    scored.join(broadcast(thr), "lang")
      .filter(col("quality_score") >= col("q_thr"))
      .select(col("doc_id"), col("lang"), col("quality_score"))
  }

  /** SA4: temperature-scaled domain mixing — the generalization of
    * [[balancedMix]] used by multilingual / multi-domain training
    * recipes (sample domain d with probability ∝ count_d^τ): each
    * stratum keeps rate (min_count / count_d)^(1-τ), so τ=0 flattens
    * every domain to the smallest and τ=1 keeps the natural mix, with
    * a smooth rebalance in between. Downsample-only — no row is ever
    * repeated.
    *
    * τ is a RATIONAL p/q so the keep predicate stays in integer
    * arithmetic: bucket < resolution·(min/cnt)^((q-p)/q)  ⟺
    * bucket^q · cnt^(q-p) < resolution^q · min^(q-p) — no floating-
    * point `pow`, whose last-ulp differences across engines could flip
    * boundary rows. Same scale shape as [[balancedMix]]: one corpus
    * scan + one broadcast join against the |domains|-row rate table.
    *
    * Overflow bound (documented, enforced): resolution^q · min^(q-p)
    * and bucket^q · cnt^(q-p) must fit in signed 64-bit — with the
    * default resolution 10^4 and q=2, strata up to ~9·10^10 rows are
    * safe; callers with larger strata should lower `resolution`. */
  def temperatureMix(df: DataFrame, id: Column, stratum: Column,
                     tauNum: Int = 1, tauDen: Int = 2, salt: String = "tmix",
                     resolution: Int = 10000): DataFrame =
    temperatureMixWithCounts(df, id, stratum,
      df.groupBy(stratum.as("stratum_key")).agg(count(lit(1)).as("stratum_cnt")),
      tauNum, tauDen, salt, resolution)

  /** [[temperatureMix]] with the per-stratum counts supplied by the
    * caller (schema: stratum_key, stratum_cnt — exactly the aggregate
    * the default overload computes). r18: callers that ALSO need the
    * per-stratum totals for reporting (sa16) were paying a third full
    * pass over the corpus to re-aggregate what the mix already counted;
    * sharing the counts frame makes the operator exactly two corpus
    * passes (count + keep-decision) at any scale, with no materialized
    * intermediate. Same integer keep-predicate arithmetic — the default
    * overload delegates here, so the SamplingSpec pins cover both. */
  def temperatureMixWithCounts(df: DataFrame, id: Column, stratum: Column,
                     counts: DataFrame,
                     tauNum: Int = 1, tauDen: Int = 2, salt: String = "tmix",
                     resolution: Int = 10000): DataFrame = {
    require(tauDen >= 1 && tauNum >= 0 && tauNum <= tauDen,
      s"tau must be a rational in [0,1], got $tauNum/$tauDen")
    require(tauDen <= 4, s"tauDen must be <= 4 (int64 overflow bound), got $tauDen")
    val q = tauDen
    val qp = tauDen - tauNum
    def ipow(c: Column, k: Int): Column =
      (1 until k).foldLeft(c) { (acc, _) => acc * c }
    if (qp == 0) df.withColumn("bucket", bucket(id, salt, resolution))
    else {
      val rates = counts.withColumn("min_cnt",
        min(col("stratum_cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      df.join(broadcast(rates), stratum === col("stratum_key"))
        .withColumn("bucket", bucket(id, salt, resolution))
        .filter(ipow(col("bucket"), q) * ipow(col("stratum_cnt"), qp) <
          ipow(lit(resolution.toLong), q) * ipow(col("min_cnt"), qp))
        .drop("stratum_key", "stratum_cnt", "min_cnt")
    }
  }

  /** SA12: epoch-based upsampling MATERIALIZED — the physical output
    * of a repetition-capped equal-budget mix (sa11 computes budgets;
    * this op actually emits the repeated rows a training run reads).
    * Every stratum targets an equal share of the total token budget;
    * its epoch rate is capped (default 3.0 — the "don't repeat data
    * past a few epochs" rule), and each document materializes
    * `floor(e)` copies plus one more on a salted-hash coin with
    * P = frac(e) — so the EXPECTED stratum volume hits the target
    * while every decision is a deterministic integer comparison
    * (reshard-stable, replayable, no RNG state).
    *
    * Scale: stratum rates are a broadcast |strata|-row table; copy
    * explosion is a per-row `sequence` bounded by the epoch cap —
    * output size is budget-bounded by construction. All arithmetic is
    * integer basis points (epochs ×100).
    *
    * @return one row per MATERIALIZED COPY: (id, stratum,
    *         epochs_x100, n_copies, copy).
    */
  def epochUpsample(docs: DataFrame, id: Column, stratum: Column,
      tokens: Column, maxEpochsX100: Long = 300L,
      salt: String = "epoch"): DataFrame = {
    val d = docs.select(id.as("id"), stratum.as("stratum"),
      tokens.cast("long").as("tok"))
    // |strata| rows — materialized once so the budget scalar and the
    // per-stratum rates don't each re-scan the corpus rollup
    val dom = d.groupBy(col("stratum")).agg(sum(col("tok")).as("dom_tok"))
      .localCheckpoint(true)
    val tot = dom.agg(sum(col("dom_tok")).as("total"),
      count(lit(1)).as("n_dom"))
    // dom_tok > 0 BEFORE the rate: a zero-token stratum would make the
    // integer division NULL under non-ANSI Spark and least() skips
    // NULLs, silently granting the full epoch cap where the oracle
    // errors on divide-by-zero — empty strata emit nothing instead
    // (n_dom still counts them: the equal-share budget is unchanged)
    val rates = dom.filter(col("dom_tok") > 0L).crossJoin(broadcast(tot))
      .withColumn("budget", expr("total DIV n_dom"))
      .withColumn("epochs_x100",
        least(lit(maxEpochsX100), expr("(100 * budget) DIV dom_tok")))
      .select(col("stratum"), col("epochs_x100"))
    d.join(broadcast(rates), "stratum")
      .withColumn("n_copies", expr("epochs_x100 DIV 100") +
        (bucket(col("id"), salt) < col("epochs_x100") % 100).cast("long"))
      .filter(col("n_copies") > 0)
      .select(col("id"), col("stratum"), col("epochs_x100"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  /** SA15: data-selection-by-importance resampling (the DSIR shape —
    * Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): hashed-n-gram bucket frequencies are
    * estimated on a TARGET distribution (the high-quality/in-domain
    * subset training should look like) and on the raw SOURCE corpus;
    * each document scores by how target-like its tokens are
    * (mean per-bucket probability ratio), and the resampling draw
    * keeps documents with probability proportional to that importance.
    *
    * Exact-integer twin of the paper's likelihood-ratio machinery so
    * the whole path is hash-oracled: per-bucket weight is the
    * add-one-smoothed cross-multiplied ratio
    * w = ((nt+1)·(Ns+1)·1000) div ((ns+1)·(Nt+1)) computed in
    * decimal(38,0) (overflow-free at any corpus size), a document's
    * score_milli is the integer mean of its tokens' weights
    * (nonnegative, so floor agrees across engines), and the keep draw
    * is the [[weightedSample]] cross-multiplication with the score as
    * the weight — importance-proportional, reproducible, re-shard
    * stable (a ratio-of-logs form would hit libm divergence; the
    * probability-ratio mean keeps the same ordering for thresholding).
    *
    * Scale posture: bucket statistics are TWO map-side-combined
    * aggregations over slim (bucket, is_target) projections into
    * `buckets` rows (a fixed 2^8 here; 10⁴–10⁶ in production — always
    * broadcastable BY CONSTRUCTION, the t20 hashing-trick bound), the
    * weight table broadcasts back over the token stream map-side, and
    * document bodies never shuffle. At 100 TB the target statistics
    * come from the curated subset once; everything else is one scan.
    *
    * @return (doc_id, n_tokens, score_milli, kept) */
  def dsirResample(docs: DataFrame, targetPred: Column,
      buckets: Int = 256, capMilli: Long = 2000L): DataFrame = {
    val toks = docs.select(col("doc_id"), targetPred.cast("int").as("is_t"),
        explode(graft.text.TextAnalysis.words(col("text"))).as("tk"))
      .select(col("doc_id"), col("is_t"),
        (hash28(concat(lit("dsir:"), col("tk"))) % buckets).as("bucket"))
    // ≤`buckets` rows — materialized once so the totals scalar and the
    // weight table don't each re-run the corpus aggregation (the
    // epochUpsample posture; PlanAudit counts scans)
    val stats = toks.groupBy("bucket")
      .agg(count(lit(1)).as("ns"), sum(col("is_t")).as("nt"))
      .localCheckpoint(true)
    val tot = stats.agg(sum(col("ns")).as("s_tot"), sum(col("nt")).as("t_tot"))
    val weights = stats.crossJoin(broadcast(tot))
      .select(col("bucket"),
        expr("""CAST((CAST(nt + 1 AS DECIMAL(38,0)) * (s_tot + 1) * 1000)
               |  div (CAST(ns + 1 AS DECIMAL(38,0)) * (t_tot + 1)) AS BIGINT)"""
          .stripMargin).as("w_milli"))
    toks.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_milli")).as("sw"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sw div n_tokens").as("score_milli"),
        (bucket(col("doc_id"), "dsirs", capMilli.toInt) <
          least(expr("sw div n_tokens"), lit(capMilli))).cast("int").as("kept"))
  }

  /** Oracle SQL for [[dsirResample]] on the documents table with the
    * `lang = 'en'` target — every integer step replayed. */
  def dsirResampleSql(buckets: Int = 256, capMilli: Long = 2000L): String =
    s"""WITH tok AS (SELECT doc_id, (lang = 'en')::INT AS is_t,
       |    ('0x' || substr(md5('dsir:' || tk), 1, 7))::BIGINT % $buckets AS bucket
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
       |        FROM documents)),
       |stats AS (SELECT bucket, count(*) AS ns, sum(is_t) AS nt
       |  FROM tok GROUP BY bucket),
       |tot AS (SELECT sum(ns) AS s_tot, sum(nt) AS t_tot FROM stats),
       |wt AS (SELECT bucket,
       |    CAST(((nt + 1)::HUGEINT * (s_tot + 1) * 1000)
       |      // ((ns + 1)::HUGEINT * (t_tot + 1)) AS BIGINT) AS w_milli
       |  FROM stats, tot),
       |sc AS (SELECT doc_id, count(*) AS n_tokens, sum(w_milli) AS sw
       |  FROM tok JOIN wt USING (bucket) GROUP BY doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(sw // n_tokens AS BIGINT) AS score_milli,
       |  (('0x' || substr(md5('dsirs:' || doc_id), 1, 7))::BIGINT % $capMilli
       |     < least(sw // n_tokens, $capMilli))::INT AS kept
       |FROM sc ORDER BY doc_id""".stripMargin
}
