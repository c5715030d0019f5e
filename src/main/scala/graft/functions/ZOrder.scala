package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data clustering.
  *
  * Sorting a table by the bit-interleaving of two columns places rows
  * that are close in BOTH dimensions into the same parquet row groups,
  * so a 2-D range predicate prunes row groups via min/max stats in
  * both dimensions at once. A single-column sort gives perfect pruning
  * on that column and none on the other; at 100 TB the difference is
  * reading one dimension's worth of stripes versus the intersection.
  * This is a WRITE-TIME layout choice — queries are unchanged, the
  * reader's ordinary stats pruning does the work (ZOrderSpec measures
  * it via scan-output row counts, and `s12_zorder_scan` runs the
  * pattern end-to-end: clustered write → pruned 2-D range read).
  *
  * The key is pure Column arithmetic (shifts and masks over a long) —
  * whole-stage codegen, no UDF; `bits` per dimension bounds the key
  * domain, values clamp to [0, 2^bits). Skewed dimensions should be
  * bucketed (e.g. `pmod(hash, n)`) before interleaving, exactly like
  * any range-partitioning key.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative
    * dimensions: result bit 2i is a's bit i, bit 2i+1 is b's bit i.
    * Both inputs clamp into [0, 2^bits) first so out-of-domain values
    * land in the edge stripe instead of corrupting high bits. */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val max = (1L << bits) - 1
    def clamp(c: Column) = least(lit(max), greatest(lit(0L), c.cast("long")))
    val (ca, cb) = (clamp(a), clamp(b))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }
}
