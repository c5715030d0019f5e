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
}
