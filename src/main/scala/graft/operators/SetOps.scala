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
    // lc − rc as ONE weighted aggregation over the union (+1 per left
    // row, −1 per right row): a single map-side-combined exchange where
    // the two-rollup + null-safe-join form paid two exchanges plus the
    // sort-merge join between them (r9 A/B at sf0.1: parity within box
    // noise — the win is the removed join machinery, which is what
    // scales). groupBy's SQL-GROUP-BY null handling (NULLs grouped
    // equal) gives EXCEPT ALL's null semantics for free — the join
    // form needed <=> per column for the same thing.
    left.select(cols.map(col) :+ lit(1L).as("__w"): _*)
      .union(right.select(cols.map(col) :+ lit(-1L).as("__w"): _*))
      .groupBy(cols.map(col): _*).agg(sum(col("__w")).as(countCol))
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
    // Same single-shuffle posture as [[exceptAllCounts]]: tag sides,
    // count each side in one aggregation, keep tuples present in both.
    left.select(cols.map(col) :+ lit(1).as("__side"): _*)
      .union(right.select(cols.map(col) :+ lit(2).as("__side"): _*))
      .groupBy(cols.map(col): _*)
      .agg(sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__lc"),
        sum(when(col("__side") === 2, 1L).otherwise(0L)).as("__rc"))
      .filter(col("__lc") > 0 && col("__rc") > 0)
      .select(cols.map(col) :+ least(col("__lc"), col("__rc")).as(countCol): _*)
  }
}
