package graft

import org.apache.spark.sql.functions._

/** sa11_budget_waterfill — the repetition-capped budget allocation.
  * The DuckDB oracle pins cross-engine parity; THIS spec pins that the
  * answer is actually a correct waterfilling (the invariants define
  * the problem, independent of either engine's formulation):
  *   1. no domain exceeds its cap, capped domains sit exactly at it;
  *   2. the budget is respected, and is exhausted up to integer-floor
  *      remainder whenever any domain is uncapped;
  *   3. uncapped allocations are proportional to weight at one common
  *      level (alloc = floor(level × w));
  *   4. the boundary is consistent: every capped domain caps at or
  *      below the final level, every uncapped domain's cap is above
  *      its own share — i.e. no domain is on the wrong side;
  *   5. the configuration is non-trivial at harness data (0 < k < n —
  *      both branches of the operator execute).
  */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  test("sa11 waterfill invariants hold at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = SparkEntry.queries("sa11_budget_waterfill")(spark, dir)
        .select("source", "tokens_d", "weight", "cap_d", "alloc", "is_capped")
        .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
      val n = out.size
      val budget = out.map(_._2).sum * 3 / 2
      val capped = out.filter(_._6 == 1)
      val uncapped = out.filter(_._6 == 0)

      // (5) non-trivial split
      assert(capped.nonEmpty && uncapped.nonEmpty,
        s"$dir: both branches must execute (capped=${capped.size}/$n)")
      // (1) cap respected; capped rows exactly at cap
      out.foreach { r => assert(r._5 <= r._4, s"$dir ${r._1}: alloc over cap") }
      capped.foreach { r => assert(r._5 == r._4, s"$dir ${r._1}: capped != cap") }
      // (2) budget respected; with uncapped domains present the
      // leftover is only the integer-floor remainder (< w_rem)
      val total = out.map(_._5).sum
      assert(total <= budget, s"$dir: allocated $total > budget $budget")
      val wRem = uncapped.map(_._3).sum
      assert(budget - total < wRem,
        s"$dir: leftover ${budget - total} >= uncapped weight $wRem — under-filled")
      // (3) one common level: alloc_d = floor(tRem * w_d / wRem)
      val tRem = budget - capped.map(_._5).sum
      uncapped.foreach { r =>
        assert(r._5 == tRem * r._3 / wRem,
          s"$dir ${r._1}: alloc ${r._5} != floor-share ${tRem * r._3 / wRem}")
      }
      // (4) boundary consistency, exact integer cross-multiplication:
      // capped: cap_d·wRem ≤ w_d·tRem; uncapped: cap_d·wRem > w_d·tRem
      capped.foreach { r =>
        assert(r._4 * wRem <= r._3 * tRem, s"$dir ${r._1}: capped above the level")
      }
      uncapped.foreach { r =>
        assert(r._4 * wRem > r._3 * tRem, s"$dir ${r._1}: uncapped below the level")
      }
    }
  }
}
