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

  /** Skew-safe salted EQUI-JOIN: spread the fact side's rows over
    * `salts` sub-keys and replicate the (narrow) enrichment side once
    * per salt, so the join key becomes (key, salt) and a hot key's
    * probe rows land on `salts` partitions instead of one.
    *
    * Why not just AQE: AQE's runtime skew split (OptimizeSkewedJoin,
    * proven live in SkewSpec) re-plans AFTER a map stage has already
    * written the skewed shuffle files, only applies to sort-merge /
    * shuffled-hash joins, and is disabled under some downstream
    * distribution requirements. Salting bakes the bound into the PLAN:
    * the largest join partition is |hot key| / salts by construction,
    * on any Spark version, under any follow-up operator. The cost is
    * `salts`× replication of the enrichment side — use it when that
    * side is per-key small (stats rows, dimension slices) but too
    * large or too dynamic to broadcast outright.
    *
    * Correctness: every enrichment row is replicated once per salt and
    * every fact row carries exactly one salt, so each matching
    * (fact, enrich) pair joins exactly once — the result is EXACTLY
    * the plain equi-join for any salt assignment (the per-row id never
    * reaches the output), which is why the registered query's oracle
    * is the unsalted SQL join (the a19 pattern for joins).
    *
    * Column contract: output = fact columns ++ (enrich columns minus
    * the keys), like `facts.join(enrich, keys)`. */
  def saltedEquiJoin(facts: DataFrame, enrich: DataFrame, keys: Seq[String],
                     salts: Int = 16): DataFrame = {
    require(!facts.columns.contains("__salt") && !enrich.columns.contains("__salt"),
      "saltedEquiJoin reserves the __salt column name")
    val salted = facts.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val replicated = enrich.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

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
