package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bag (multiset) set operations computed by count arithmetic instead
  * of Spark's row-level `EXCEPT ALL` / `INTERSECT ALL` physical plans.
  *
  * `DataFrame.exceptAll` shuffles FULL-WIDTH rows of both sides to
  * co-partition them, then runs a row-at-a-time counting aggregate —
  * at 100 TB that is an exchange of the entire fact table. The same
  * bag semantics are two NARROW aggregations: group each side on all
  * columns (map-side partial combine collapses duplicates before the
  * exchange, so the shuffle carries one row per distinct tuple), left
  * join the count tables, and keep `max(0, lc - rc)` copies. For
  * typical dedup-shaped inputs (many repeats per distinct tuple) the
  * shuffled volume drops from O(rows) to O(distinct tuples).
  *
  * Two result shapes:
  *   - [[exceptAllCounts]]: (columns..., n) — one row per surviving
  *     distinct tuple with its surplus multiplicity. The right form
  *     when the caller aggregates anyway (the common analytics case).
  *   - [[exceptAllRows]]: surplus rows re-generated via an exploded
  *     `sequence`, bit-identical to `DataFrame.exceptAll` output.
  */
object SetOps {

  /** Per-tuple surplus multiplicities of `left EXCEPT ALL right`.
    *
    * @param countCol name of the appended multiplicity column
    * @return df with `left`'s columns plus `countCol` (long, >= 1)
    */
  def exceptAllCounts(left: DataFrame, right: DataFrame,
                      countCol: String = "n"): DataFrame = {
    val cols = left.columns.toSeq
    require(right.columns.toSeq == cols,
      s"exceptAll requires identical schemas: $cols vs ${right.columns.toSeq}")
    val lc = left.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__lc"))
    val rc = right.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__rc"))
    // Null-safe equality on every column: EXCEPT ALL treats NULLs as
    // equal values, unlike a plain join predicate.
    val on = cols.map(c => lc(c) <=> rc(c)).reduce(_ && _)
    lc.join(rc, on, "left")
      .select(cols.map(lc(_)) :+
        (col("__lc") - coalesce(col("__rc"), lit(0L))).as(countCol): _*)
      .filter(col(countCol) > 0)
  }

  /** `left EXCEPT ALL right` with surplus rows materialized — same
    * output bag as `DataFrame.exceptAll`, built from the narrow count
    * join plus an exploded `sequence(1, n)` to re-generate copies.
    */
  def exceptAllRows(left: DataFrame, right: DataFrame): DataFrame = {
    val cols = left.columns.toSeq
    exceptAllCounts(left, right, "__n")
      .withColumn("__i", explode(sequence(lit(1L), col("__n"))))
      .select(cols.map(col): _*)
  }

  /** Per-tuple multiplicities of `left INTERSECT ALL right` —
    * `least(lc, rc)` copies of every tuple present in both bags.
    */
  def intersectAllCounts(left: DataFrame, right: DataFrame,
                         countCol: String = "n"): DataFrame = {
    val cols = left.columns.toSeq
    require(right.columns.toSeq == cols,
      s"intersectAll requires identical schemas: $cols vs ${right.columns.toSeq}")
    val lc = left.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__lc"))
    val rc = right.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__rc"))
    val on = cols.map(c => lc(c) <=> rc(c)).reduce(_ && _)
    lc.join(rc, on, "inner")
      .select(cols.map(lc(_)) :+
        least(col("__lc"), col("__rc")).as(countCol): _*)
  }
}
