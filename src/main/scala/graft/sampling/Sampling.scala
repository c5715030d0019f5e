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
      val counts = df.groupBy(stratum.as("stratum_key"))
        .agg(count(lit(1)).as("stratum_cnt"))
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
}
