package graft.functions

/** Shared EWMA constants for ts6 (batch), st20 (streaming state), and
  * their oracles: α = 0.3 geometric weights over a 14-day horizon,
  * quantized to 9-dp longs HERE — one definition inlined as literals
  * into every consumer (Spark plans, the flatMapGroupsWithState fold,
  * and the SQL oracle strings), so no engine ever evaluates pow() and
  * no two twins can drift. */
object Ewma {
  val Horizon = 14
  val weightsQ: IndexedSeq[Long] =
    (0 until Horizon).map(i => Math.round(0.3 * math.pow(0.7, i) * 1e9))

  /** The smoothed value both twins report: one double division of the
    * two exact BIGINT sums (Σ w_q·n, Σ w_q over observed days). */
  def smooth(numQ: Long, denQ: Long): Double = numQ.toDouble / denQ.toDouble
}
