package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for each left row, attach the payload
  * of the latest right row whose timestamp is <= the left row's
  * timestamp, per key — the standard temporal-join primitive for
  * event logs and slowly-changing state (the reference's `leads`
  * snapshot semantics generalized to *any* point in time, not just
  * "now"; see SURVEY.md §2.3 "absent: as-of joins" — this closes that
  * gap as a beyond-reference operator).
  *
  * Implementation is the union-merge formulation, not a range join:
  * tag both sides, hash-partition by key, sort by (ts, side), and carry
  * the last right-side payload forward with `last(_, ignoreNulls)` over
  * a running frame. Cost is ONE shuffle of (|L| + |R|) rows on the join
  * key plus a per-partition sort — at 100 TB this is the same shape as
  * any keyed aggregation, whereas an inequality (theta) join would
  * explode into a per-key cross product. No custom physical operator is
  * needed; Catalyst plans it as Exchange + Sort + Window.
  */
object AsOf {

  /** Backward as-of join (match right rows at or before the left ts).
    *
    * @param left    probe side; all its columns are preserved
    * @param right   build side: `keys` ++ payload columns. Its timestamp
    *                column `rightTs` is also part of the payload (rename
    *                it before calling to avoid collision with left
    *                columns). Ties on (key, ts) are broken by the
    *                lexicographic order of the payload struct, so put a
    *                unique tiebreak column (e.g. the event id) right
    *                after the timestamp in the right schema.
    * @param keys    equi-join key columns (present on both sides)
    * @param leftTs  left timestamp column name
    * @param rightTs right timestamp column name (payload, pre-renamed)
    * @return left columns plus the matched right payload columns
    *         (NULL when no right row precedes the left row)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val packed = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"),
        struct(payloadCols.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(0))
    val probe = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    // Right rows sort BEFORE left rows at an equal timestamp (__side
    // 0 < 1), which is exactly the <= match semantics; among right rows
    // with the same (key, ts) the running `last` picks the max payload
    // struct, matching a DESC-ordered row_number()=1 oracle.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(packed, allowMissingColumns = true)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Forward as-of join (match the EARLIEST right row at or after the
    * left ts) — the mirror of [[asOfBackward]] for "next event"
    * semantics: next price update, SLA first-response matching, the
    * next state transition after a checkpoint.
    *
    * Same union-merge single-shuffle shape, traversed in DESCENDING
    * time order: right rows still sort before left rows at an equal
    * timestamp (>= matches), and among same-(key, ts) right rows the
    * running `last` picks the MIN payload struct — matching an
    * ASC-ordered row_number()=1 oracle. */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val packed = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"),
        struct(payloadCols.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(0))
    val probe = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(packed, allowMissingColumns = true)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
