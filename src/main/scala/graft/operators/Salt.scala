package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation ("salting"): spread each grouping
  * key over `salts` sub-keys, partially aggregate on (key, salt), then
  * merge the partials per key.
  *
  * Why: at 100 TB a single hot key (one power user, one viral document)
  * can put an entire shuffle partition on one executor. AQE's skew-join
  * handling does not apply to aggregations; salting bounds the largest
  * aggregation partition at |hot key| / salts, at the cost of one extra
  * (tiny — one row per key per salt) shuffle stage.
  *
  * Correctness: for algebraic aggregates with exact merge semantics —
  * counts, DECIMAL sums, min/max — partial-then-merge is EXACTLY the
  * direct aggregation (decimal addition is associative), so the salted
  * form hash-matches the plain GROUP BY oracle. Salt assignment uses
  * a per-row id and never reaches the output, so ANY assignment yields
  * the same result.
  */
object Salt {

  /** Salted exact money-sum + count per key. Identical results to
    * `df.groupBy(keys).agg(moneySum, count)`, skew-proof. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value.cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as("total"),
        sum(col("__pcnt")).as("n"))
  }
}
