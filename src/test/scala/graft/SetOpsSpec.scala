package graft

import org.apache.spark.sql.functions._

import graft.operators.SetOps

/** Pins the r9 single-shuffle SetOps rewrites (weighted-union
  * aggregation, no join) to Spark's own `exceptAll`/`intersectAll` on a
  * null-containing multiset — the null-equality and multiplicity edge
  * cases are exactly where a bag-subtraction rewrite goes wrong. */
class SetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def bag(rows: Seq[(Option[Int], String)]) =
    rows.toDF("k", "v")

  private val left = bag(Seq(
    (Some(1), "a"), (Some(1), "a"), (Some(1), "a"),  // 3 copies
    (Some(2), "b"),
    (None, "n"), (None, "n"),                        // nulls, 2 copies
    (Some(3), "c")))
  private val right = bag(Seq(
    (Some(1), "a"),                                  // removes one copy
    (None, "n"),                                     // null matches null
    (Some(4), "d"),                                  // right-only: ignored
    (Some(3), "c"), (Some(3), "c")))                 // over-subtracts to 0

  private def counted(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k", "v").agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet

  test("exceptAllCounts matches DataFrame.exceptAll multiplicities incl. nulls") {
    val got = SetOps.exceptAllCounts(left, right, "n")
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(got === counted(left.exceptAll(right)))
  }

  test("exceptAllRows re-generates the exact surplus bag") {
    val got = counted(SetOps.exceptAllRows(left, right))
    assert(got === counted(left.exceptAll(right)))
  }

  test("intersectAllCounts matches DataFrame.intersectAll multiplicities incl. nulls") {
    val got = SetOps.intersectAllCounts(left, right, "n")
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(got === counted(left.intersectAll(right)))
  }
}
