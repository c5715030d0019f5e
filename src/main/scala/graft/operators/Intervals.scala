package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded point-in-interval join — the scale shape for "which interval
  * contains this event" when the containment predicate is a RANGE, not
  * an equality.
  *
  * The naive formulation (`p JOIN i ON p.k = i.k AND p.ts BETWEEN i.lo
  * AND i.hi`) is an equi-join only on `k`: every (key) group becomes a
  * nested-loop of its points × its intervals, and a hot key (one user
  * with a million events and thousands of intervals) degenerates
  * quadratically — at 100 TB the plan is at the mercy of key skew.
  * Banding makes the TIME axis part of the equi-key: each interval
  * explodes to the fixed-width bands it overlaps, each point maps to
  * the single band containing it, and the join runs on (key, band) —
  * pure hash-join machinery, shuffle volume = points + Σ interval
  * spans / bandwidth, per-group fan-out bounded by interval length /
  * bandwidth instead of by key cardinality. The residual BETWEEN
  * filter restores exactness. (This is the rewrite behind dedicated
  * range-join support in Spark-family engines, expressed with stock
  * operators.)
  *
  * A point meets a given interval in exactly ONE band (the point's
  * own), so banding introduces no duplicate pairs and needs no
  * post-distinct.
  */
object Intervals {

  /** @param points      rows with a key column `pKey` and an event-time
    *                    micros column `pUs`; all columns pass through
    * @param intervals   rows with key `iKey` and [`loUs`, `hiUs`]
    *                    micros bounds (inclusive); all columns pass
    *                    through. Column names must not collide with
    *                    `points`' (pre-project on the caller side).
    * @param bandMicros  band width; choose ≈ the typical interval
    *                    length so most intervals explode to 1–2 bands
    * @return one row per (point, containing interval) — inner join;
    *         points in no interval drop out
    */
  def bandedContainmentJoin(points: DataFrame, pKey: String, pUs: String,
      intervals: DataFrame, iKey: String, loUs: String, hiUs: String,
      bandMicros: Long = 3600000000L): DataFrame = {
    // band id by INTEGER division (`div`), not a double divide + cast:
    // the float quotient is provably safe below 2^53 µs but the exact
    // form needs no proof, and truncation is monotone, so a point's
    // band always lies within its containing interval's band range —
    // for negative (pre-epoch) timestamps too
    def band(c: String) = expr(s"$c div ${bandMicros}L")
    val bandedIntervals = intervals
      // an inverted interval (hi < lo) matches nothing in the plain
      // BETWEEN join; dropped HERE because Spark's sequence() would
      // otherwise auto-step DOWNWARD and band it as if valid
      .filter(col(hiUs) >= col(loUs))
      .withColumn("__band", explode(sequence(band(loUs), band(hiUs))))
    val bandedPoints = points
      .withColumn("__band", band(pUs))
    bandedPoints
      .join(bandedIntervals,
        bandedPoints(pKey) === bandedIntervals(iKey) &&
          bandedPoints("__band") === bandedIntervals("__band"))
      .filter(col(pUs) >= col(loUs) && col(pUs) <= col(hiUs))
      .drop("__band").drop(iKey)
  }
}
