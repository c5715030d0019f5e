package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingestion (SURVEY.md §2.10 ST1–ST7).
  *
  * The reference's webhook service is an always-on push endpoint with
  * at-least-once delivery (retry envelope) and idempotent inserts
  * (webhook_app.py:41-49,152-182). Spark-first re-expression:
  *
  *  - ST1: `readStream` micro-batches replace per-request handling; one
  *    sink transaction per batch instead of one DB connection per POST.
  *  - ST3: exactly-once via idempotence = watermarked dedup on the
  *    delivery id BEFORE the sink, bounded state (the watermark is the
  *    retry horizon). At 100 TB/day this is the only state that grows:
  *    it is keyed by event id and expires with the watermark.
  *  - ST4/ST5: event-time (`created_at`) vs arrival (`received_at`) are
  *    both kept; moderately-late data rides the watermark, arbitrarily
  *    late data goes through the batch backfill union (U2/J6).
  *  - ST6: latest-state snapshot via `flatMapGroupsWithState` — the one
  *    genuinely stateful operator; state is one row per key.
  *  - ST7: unknown event types are side-channeled, never failed
  *    (webhook_app.py:175-176 logs + acks them).
  *
  * Batch twins of ST3/ST6/ST7 are registered in SparkEntry (DuckDB
  * cannot evaluate streams); these operators are exercised end-to-end
  * with MemoryStream in StreamIngestSpec.
  */
object StreamIngest {

  /** Event-envelope record (harness `events` shape). */
  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** ST6 state: last-known action per key (the `leads` snapshot grain). */
  final case class KeyState(user_id: Long, last_event_id: Long,
      last_type: String, last_ts: Timestamp, last_value: Double)

  val knownTypes: Seq[String] = Seq("view", "click", "signup", "purchase", "error")

  /** ST3: idempotent dedup on the delivery id within the retry horizon.
    * State is dropped once the watermark passes — bounded memory. */
  def dedupWithinWatermark(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark("event_id")

  /** ST7: dead-letter side output — route, don't fail. */
  def deadLetter(events: DataFrame): DataFrame =
    events.filter(!col("event_type").isin(knownTypes: _*))

  /** Known-type main output (pairs with [[deadLetter]]). */
  def wellTyped(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin(knownTypes: _*))

  /** ST6: streaming latest-state view, one state row per key. Emits the
    * updated snapshot row whenever a key sees newer events. */
  def latestState(spark: SparkSession, events: Dataset[Ev]): Dataset[KeyState] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[KeyState]) =>
          val candidates = state.getOption.iterator ++ it.map(e =>
            KeyState(uid, e.event_id, e.event_type, e.ts, e.value))
          // deterministic: max by (ts, event_id) — same tiebreak as the
          // batch twin (Events.latestState).
          val latest = candidates.maxBy(k => (k.last_ts.getTime, k.last_event_id))
          val changed = !state.getOption.contains(latest)
          state.update(latest)
          if (changed) Iterator.single(latest) else Iterator.empty
      }
  }

  /** ST18 state/output: one key's current top-k entries, ranked. */
  final case class TopKEntry(user_id: Long, rank: Int, event_id: Long, value: Double)

  /** ST18: streaming per-key top-k — the continuous leaderboard, and
    * the stream form of the batch [[graft.plans.TopKPerKeyNode]] heap
    * operator: identical merge semantics (keep the k best under
    * (value desc, event_id asc) — a total order, so ties are pinned),
    * state bounded at k entries per key regardless of stream length.
    * Emits a key's FULL re-ranked top-k whenever a batch changes it
    * (idempotent upsert grain: (user_id, rank)), nothing otherwise.
    * Batch twin: `st18_stream_topk_twin` runs the heap operator over
    * the same events; StreamIngestSpec replays split batches against
    * it. */
  def topKPerKeyStream(spark: SparkSession, events: Dataset[Ev],
      k: Int = 3): Dataset[TopKEntry] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[(Double, Long)]]) =>
          val cur = state.getOption.getOrElse(Nil)
          // comparator mirrors Spark SQL's double ordering exactly
          // (SQLOrderingUtil: -0.0 == 0.0, NaN greatest — so NaN ranks
          // FIRST under desc, as in the batch twin); Scala's sortBy on
          // (-v, id) would instead sort NaN last and split signed zero.
          val sqlDesc = new Ordering[(Double, Long)] {
            override def compare(a: (Double, Long), b: (Double, Long)): Int = {
              val c = if (a._1 == b._1) 0 else java.lang.Double.compare(b._1, a._1)
              if (c != 0) c else java.lang.Long.compare(a._2, b._2)
            }
          }
          val merged = (cur.iterator ++ it.map(e => (e.value, e.event_id)))
            .toList.distinct
            .sorted(sqlDesc).take(k)
          if (merged == cur) Iterator.empty
          else {
            state.update(merged)
            merged.iterator.zipWithIndex.map { case ((v, id), i) =>
              TopKEntry(uid, i + 1, id, v)
            }
          }
      }
  }

  /** ST19 output: one standing distinct-estimate row per group. */
  final case class KmvEstimate(event_type: String, n_kept: Int, est_distinct: Double)

  /** ST19: streaming KMV distinct-count — the continuous form of
    * [[graft.sketch.Sketches.kmvDistinct]] (the a13/dq1 scale path).
    * State per group is the ≤ k smallest DISTINCT md5-60-bit hashes of
    * the value — a bounded, order-insensitive monoid (set-union then
    * take-k), so micro-batch folds commute with the batch build:
    * StreamIngestSpec proves a 3-batch fold (with redeliveries) equals
    * the batch sketch on the union, and `st19_kmv_state_twin` runs the
    * SAME state construction in batch under the SQL oracle. The
    * estimate replicates [[Sketches.kmvDistinct]] arithmetic exactly
    * (exact below k; (k−1)·2^60/h_k, HALF_UP 4dp, above). */
  def kmvDistinctStream(spark: SparkSession, events: Dataset[Ev],
      k: Int = 256): Dataset[KmvEstimate] = {
    import spark.implicits._
    val hashed = events
      .select(col("event_type"),
        graft.sketch.Sketches.kmvHash(col("user_id")).as("h"))
      .as[(String, Long)]
    hashed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val prev = state.getOption.getOrElse(Array.empty[Long])
          // bounded fold: O(k) memory however large the batch's group
          // is (never buffer the batch to sort it) — same result as
          // distinct-sort-take-k by the set semantics
          val set = scala.collection.mutable.TreeSet.empty[Long] ++ prev
          it.foreach { case (_, h) =>
            if (set.size < k) set += h // TreeSet ignores duplicates
            else if (h < set.last && set.add(h)) set -= set.last
          }
          val merged = set.toArray
          if (java.util.Arrays.equals(merged, prev)) Iterator.empty
          else {
            state.update(merged)
            val m = merged.length
            val est =
              if (m < k) m.toDouble
              else new java.math.BigDecimal(java.lang.Double.toString(
                  (k - 1).toDouble * math.pow(2, 60) / merged.last.toDouble))
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            Iterator(KmvEstimate(grp, m, est))
          }
      }
  }

  /** ST23 output: one standing HLL-estimate row per group. */
  final case class HllEstimate(event_type: String, m_hit: Int, hll_est: Long)

  /** ST23: streaming HyperLogLog distinct-count — the continuous form
    * of [[graft.sketch.Sketches.hllDistinct]] (a32's scale path).
    * State per group is the 64 register maxima — a FIXED 64-int array
    * however large the group, folded by elementwise max, which is
    * commutative/idempotent, so micro-batch folds (including
    * redeliveries) converge to the batch sketch on the union:
    * StreamIngestSpec proves a 3-batch fold with duplicate delivery
    * equals [[Sketches.hllDistinct]], and `st23_hll_state_twin` runs
    * the SAME register construction in batch under the SQL oracle.
    * The (register, ρ) pair comes from [[Sketches.hllRegRho]] — the
    * batch sketch's own Column expressions evaluated per event — and
    * the estimate replays the batch integer algebra exactly
    * (Σ 2^(55−M) over all 64 registers, one BigInt division by
    * S·10⁶). */
  def hllDistinctStream(spark: SparkSession, events: Dataset[Ev]): Dataset[HllEstimate] = {
    import spark.implicits._
    val m = graft.sketch.Sketches.HLL_M
    val num = BigInt(graft.sketch.Sketches.HLL_NUM)
    val (reg, rho) = graft.sketch.Sketches.hllRegRho(col("user_id"))
    val regRows = events.filter(col("user_id").isNotNull)
      .select(col("event_type"), reg.cast("int").as("reg"), rho.as("rho"))
      .as[(String, Int, Int)]
    regRows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[(String, Int, Int)], state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(Array.fill(m)(0))
          var changed = false
          it.foreach { case (_, r, p) =>
            if (p > regs(r)) { regs(r) = p; changed = true }
          }
          if (!changed) Iterator.empty
          else {
            state.update(regs)
            // unhit registers carry M = 0 ⇒ the 2^55 term of the batch
            // (m − hit)·2^55 form falls out of the uniform sum
            val s = regs.map(v => 1L << (55 - v)).sum
            val est = (num / (BigInt(s) * 1000000)).toLong
            Iterator(HllEstimate(grp, regs.count(_ > 0), est))
          }
      }
  }

  /** ST24 output: one standing covariance cell (i < j, 1-based). */
  final case class CovCell(i: Int, j: Int, cov: Double)

  /** ST24: streaming embedding-covariance monitor — the continuous
    * form of [[graft.similarity.Ann.covarianceTable]] (e41's full
    * view). State is the exact integer moment vector — d·(d−1)/2
    * cross moments + d first moments + the row count, each a BigInt
    * carried as a string — which is FIXED-SIZE however many vectors
    * stream through, and the fold is plain addition (associative and
    * commutative, so micro-batch boundaries cannot change the result;
    * this is the sufficient-statistics property the batch kernel's
    * scaladoc promises, made literal). Each batch re-emits the full
    * d·(d−1)/2-cell covariance view; quantization and display
    * rounding replicate the batch Column semantics exactly
    * (`BigDecimal.valueOf` HALF_UP — Spark's own `round`), so
    * StreamIngestSpec can require fold ≡ batch with doubles compared
    * bit-for-bit, and `st24_cov_state_twin` hash-gates the same view
    * against the SQL oracle. */
  def covarianceStream(spark: SparkSession, vecs: Dataset[Array[Float]],
      dims: Int = 64): Dataset[CovCell] = {
    import spark.implicits._
    val nPairs = dims * (dims - 1) / 2
    val stateLen = nPairs + dims + 1
    vecs.filter((v: Array[Float]) => v != null).groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Array[Float]], state: GroupState[Array[String]]) =>
          val st = state.getOption.map(_.map(BigInt(_)))
            .getOrElse(Array.fill(stateLen)(BigInt(0)))
          // batch-local Long accumulators, flushed into the BigInt
          // state before overflow (the e41 kernel's recipe)
          val accL = new Array[Long](nPairs)
          val sxL = new Array[Long](dims)
          var count = 0L
          var sinceFlush = 0
          def flush(): Unit = {
            var k = 0
            while (k < nPairs) { st(k) += accL(k); accL(k) = 0; k += 1 }
            sinceFlush = 0
          }
          it.foreach { v =>
            require(v.length == dims,
              s"expected $dims-dim embedding, got ${v.length}")
            // Spark round() semantics: BigDecimal.valueOf + HALF_UP
            val xq = v.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1e6)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
            var i = 0
            var k = 0
            while (i < dims) { sxL(i) += xq(i); i += 1 }
            i = 0
            while (i < dims - 1) {
              var j = i + 1
              val vi = xq(i)
              while (j < dims) { accL(k) += vi * xq(j); k += 1; j += 1 }
              i += 1
            }
            count += 1
            sinceFlush += 1
            if (sinceFlush == 4096) flush()
          }
          if (count == 0) Iterator.empty
          else {
            flush()
            var i = 0
            while (i < dims) { st(nPairs + i) += sxL(i); i += 1 }
            st(stateLen - 1) += count
            state.update(st.map(_.toString))
            val n = st(stateLen - 1)
            val nd = n.toDouble
            val out = new Array[CovCell](nPairs)
            var k = 0
            i = 0
            while (i < dims - 1) {
              var j = i + 1
              while (j < dims) {
                val num = n * st(k) - st(nPairs + i) * st(nPairs + j)
                // the batch covDisplay replayed: decimal→double nearest,
                // two double divisions, round(_, 8) HALF_UP
                val cov = java.math.BigDecimal
                  .valueOf(num.toDouble / (nd * nd) / 1e12)
                  .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
                out(k) = CovCell(i + 1, j + 1, cov)
                k += 1
                j += 1
              }
              i += 1
            }
            out.iterator
          }
      }
  }

  /** ST20 output: the standing smoothed-rate row per type. */
  final case class EwmaRow(event_type: String, day: java.sql.Date,
      n: Long, ewma: Double)

  /** ST20: streaming bounded-horizon EWMA — the continuous form of the
    * ts6 daily smoother. State per type is the last ≤14 OBSERVED days'
    * counts (day-distance ≤ 13 from the latest observed day — the same
    * band the ts6 self-join keeps), a bounded map that only shrinks as
    * the window advances. Each micro-batch folds its per-day deltas
    * into the map and re-emits the latest day's smoothed value; the
    * arithmetic replicates ts6 exactly — the shared
    * [[graft.functions.Ewma.weightsQ]] literals, BIGINT Σ w·n and Σ w,
    * one double division — so `st20_ewma_state_twin` hash-gates the
    * same construction in batch and StreamIngestSpec proves the
    * 3-micro-batch fold equals it. */
  def ewmaStream(spark: SparkSession, events: Dataset[Ev]): Dataset[EwmaRow] = {
    import spark.implicits._
    val w = graft.functions.Ewma.weightsQ
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .as[(String, java.sql.Date)]
    daily.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tp: String, it: Iterator[(String, java.sql.Date)],
            state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.Map[Long, Long]() ++
            state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (_, d) =>
            val ed = d.toLocalDate.toEpochDay
            m(ed) = m.getOrElse(ed, 0L) + 1L
          }
          if (m.isEmpty) Iterator.empty
          else {
            val latest = m.keys.max
            // horizon retention: distances only grow, so dropping
            // beyond-band days is monotone and the state stays ≤14 rows
            val kept = m.filter { case (ed, _) => latest - ed <= 13L }
            state.update(kept.toMap)
            var numQ = 0L
            var denQ = 0L
            kept.foreach { case (ed, n) =>
              val wq = w((latest - ed).toInt)
              numQ += wq * n
              denQ += wq
            }
            Iterator(EwmaRow(tp,
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(latest)),
              kept(latest), graft.functions.Ewma.smooth(numQ, denQ)))
          }
      }
  }

  /** The st20 batch twin — the SAME standing row the stream converges
    * to, built relationally: per type, the latest day's count smoothed
    * over the trailing band (shared weight literals, exact BIGINT
    * sums). Lives here so SparkEntry's registration and
    * StreamIngestSpec's comparison cannot diverge. */
  def ewmaBatchTwin(events: DataFrame): DataFrame = {
    val wq = array(graft.functions.Ewma.weightsQ.map(lit): _*)
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val latest = daily.groupBy(col("event_type").as("et"))
      .agg(max(col("day")).as("latest"))
    daily.as("a")
      .join(latest.as("l"), col("a.event_type") === col("l.et") &&
        datediff(col("l.latest"), col("a.day")).between(0, 13))
      .withColumn("w_q",
        element_at(wq, datediff(col("l.latest"), col("a.day")) + 1))
      .groupBy(col("a.event_type").as("event_type"), col("l.latest").as("day"))
      .agg(sum(col("w_q") * col("a.n")).as("num_q"), sum(col("w_q")).as("den_q"),
        sum(when(col("a.day") === col("l.latest"), col("a.n"))
          .otherwise(lit(0L))).as("n"))
      .select(col("event_type"), col("day"), col("n"),
        (col("num_q").cast("double") / col("den_q").cast("double")).as("ewma"))
      .orderBy("event_type")
  }

  /** One standing robust-trend row per event type (ST21). */
  final case class TheilSenRow(event_type: String, day: java.sql.Date,
      n_pairs: Long, slope: Double)

  /** ST21: ts7's Theil–Sen robust trend as STREAMING STATE — per type
    * the trailing ≤30 observed days' counts (the same bounded-band
    * retention as [[ewmaStream]]), re-emitting after each micro-batch
    * the latest day plus the LOWER MEDIAN of all pairwise slopes over
    * the band. The monitoring deployment of ts7: an anomaly in today's
    * volume (ts5's flag) asks "is the TREND still what it was?" and a
    * single wild day cannot move this answer.
    *
    * Arithmetic is convention-shared with [[theilSenBatchTwin]] /
    * `TimeSeries.theilSen`: each slope ONE IEEE double division of two
    * exact longs, the median an explicit lower-median pick at position
    * (cnt+1) div 2 of the ascending sort (ties irrelevant — the VALUE
    * at the position is unique), HALF_UP 6-dp rounding at emission
    * only. State is a ≤30-entry day→count map; pair work per emission
    * is ≤ C(30,2) = 435 slopes — O(1) regardless of volume. A
    * single-day band emits nothing (no pairs), matching the batch
    * twin's absence-by-construction. */
  def theilSenStream(spark: SparkSession, events: Dataset[Ev]): Dataset[TheilSenRow] = {
    import spark.implicits._
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .as[(String, java.sql.Date)]
    daily.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tp: String, it: Iterator[(String, java.sql.Date)],
            state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.Map[Long, Long]() ++
            state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (_, d) =>
            val ed = d.toLocalDate.toEpochDay
            m(ed) = m.getOrElse(ed, 0L) + 1L
          }
          if (m.isEmpty) Iterator.empty
          else {
            val latest = m.keys.max
            val kept = m.filter { case (ed, _) => latest - ed <= 29L }
            state.update(kept.toMap)
            val ds = kept.toArray.sortBy(_._1)
            val slopes = (for {
              i <- ds.indices.iterator
              j <- (i + 1) until ds.length
            } yield (ds(j)._2 - ds(i)._2).toDouble /
              (ds(j)._1 - ds(i)._1).toDouble).toArray
            if (slopes.isEmpty) Iterator.empty
            else {
              java.util.Arrays.sort(slopes)
              val pick = slopes(((slopes.length + 1) / 2) - 1)
              val rounded = new java.math.BigDecimal(
                  java.lang.Double.toString(pick))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              Iterator(TheilSenRow(tp,
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(latest)),
                slopes.length, rounded))
            }
          }
      }
  }

  /** The st21 batch twin — the standing row [[theilSenStream]]
    * converges to, built relationally: per type, all pairwise slopes
    * among the days within 29 of the latest day, lower median by
    * row_number pick (the ts7 conventions over the banded frame).
    * Lives here so SparkEntry's registration and StreamIngestSpec's
    * comparison cannot diverge. */
  def theilSenBatchTwin(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val latest = daily.groupBy(col("event_type").as("et"))
      .agg(max(col("day")).as("latest"))
    val band = daily.as("a")
      .join(latest.as("l"), col("a.event_type") === col("l.et") &&
        datediff(col("l.latest"), col("a.day")).between(0, 29))
      .select(col("a.event_type").as("event_type"), col("l.latest").as("latest"),
        col("a.day").as("day"), col("a.n").as("n"))
    band.as("x").join(band.as("y"),
        col("x.event_type") === col("y.event_type") &&
          col("x.day") < col("y.day"))
      .select(col("x.event_type").as("event_type"), col("x.latest").as("day"),
        ((col("y.n") - col("x.n")).cast("double") /
          datediff(col("y.day"), col("x.day")).cast("double")).as("slope"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("slope"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === ((col("cnt") + lit(1L)) / lit(2L)).cast("long"))
      .select(col("event_type"), col("day"), col("cnt").as("n_pairs"),
        round(col("slope"), 6).as("slope"))
      .orderBy("event_type")
  }

  /** One standing changepoint row per event type (ST22). */
  final case class CusumRow(event_type: String, change_day: java.sql.Date,
      cusum_peak: Long, n_days: Long, total: Long)

  /** ST22: ts8's CUSUM changepoint as STREAMING STATE — per type the
    * trailing ≤30 observed days' counts (the same bounded-band
    * retention as [[theilSenStream]]), re-emitting after each
    * micro-batch the day within the band where the cumulative
    * deviation from the band mean peaks. The monitoring deployment of
    * ts8: a level shift in ingest volume surfaces as a standing "the
    * break was HERE" row that sharpens as post-shift days arrive.
    *
    * Arithmetic is convention-shared with
    * `TimeSeries.cusumChangepoint`: deviations pre-scaled by the band
    * day count (n·D − T), the running statistic an exact 64-bit
    * integer, the peak an explicit (|cusum| desc, day asc) pick —
    * bit-identical to the batch twin on the same band. State is a
    * ≤30-entry day→count map; per-emission work is one sorted walk of
    * ≤30 entries — O(1) regardless of volume. */
  def cusumStream(spark: SparkSession, events: Dataset[Ev]): Dataset[CusumRow] = {
    import spark.implicits._
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .as[(String, java.sql.Date)]
    daily.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tp: String, it: Iterator[(String, java.sql.Date)],
            state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.Map[Long, Long]() ++
            state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (_, d) =>
            val ed = d.toLocalDate.toEpochDay
            m(ed) = m.getOrElse(ed, 0L) + 1L
          }
          if (m.isEmpty) Iterator.empty
          else {
            val latest = m.keys.max
            val kept = m.filter { case (ed, _) => latest - ed <= 29L }
            state.update(kept.toMap)
            val ds = kept.toArray.sortBy(_._1)
            val dd = ds.length.toLong
            val tt = ds.map(_._2).sum
            var cus = 0L
            var bestAbs = -1L
            var bestDay = 0L
            ds.foreach { case (ed, n) =>
              cus += n * dd - tt
              val a = math.abs(cus)
              if (a > bestAbs) { bestAbs = a; bestDay = ed } // ties keep earliest
            }
            Iterator(CusumRow(tp,
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(bestDay)),
              bestAbs, dd, tt))
          }
      }
  }

  /** The st22 batch twin — the standing row [[cusumStream]] converges
    * to: ts8's exact-integer CUSUM pick over the days within 29 of
    * each type's latest day. Lives here so SparkEntry's registration
    * and StreamIngestSpec's comparison cannot diverge. */
  def cusumBatchTwin(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val latest = daily.groupBy(col("event_type").as("et"))
      .agg(max(col("day")).as("latest"))
    val band = daily.as("a")
      .join(latest.as("l"), col("a.event_type") === col("l.et") &&
        datediff(col("l.latest"), col("a.day")).between(0, 29))
      .select(col("a.event_type").as("event_type"), col("a.day").as("day"),
        col("a.n").as("n"))
    graft.analytics.TimeSeries
      .cusumChangepoint(band, col("event_type"), col("day"), col("n"))
      .withColumnRenamed("k", "event_type")
      .orderBy("event_type")
  }

  /** ST8: watermarked tumbling-window event-time aggregation — counts
    * per (1-day window, event_type). Late rows inside the watermark
    * still land in their event-time bucket; state for a window is
    * dropped once the watermark passes its end. Batch twin:
    * `st8_windowed_counts_twin` (same buckets via date_trunc). */
  def windowedCounts(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .count()
      .select(col("w.start").as("day_start"), col("event_type"),
        col("count").as("n"))

  /** ST17: streaming HISTOGRAM fold — per-(day window, value bin)
    * counts, the stream form of the w14 rolling-quantile monitor's
    * state. Bin counts are a monoid, so watermarked tumbling windows
    * fold them incrementally with state bounded by windows × bins
    * (≤64 cells/day here — the whole point of the sketch: a streaming
    * percentile needs no raw-value retention at all). Closed windows
    * land in the standing (day, bin, cnt) table on which
    * [[graft.sketch.Sketches.rollingHistQuantiles]]'s fan-out + walk
    * produces the trailing-window quantiles — identical arithmetic to
    * the batch twin `st17_hist_fold_twin`. */
  def histogramCounts(events: DataFrame, valueCol: String,
      lo: Double, width: Double, bins: Int,
      horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .groupBy(window(col("ts"), "1 day").as("w"),
        least(lit(bins - 1), greatest(lit(0),
          floor((col(valueCol) - lo) / width))).cast("int").as("bin"))
      .count()
      .select(col("w.start").as("day_start"), col("bin"),
        col("count").as("cnt"))

  /** ST16: HOPPING (sliding) windows — 1-day windows advancing every
    * 12 h, so every event lands in exactly two overlapping windows and a
    * dashboard reads a smoothed daily trend twice per day instead of
    * once. Same watermark/state mechanics as [[windowedCounts]]; state
    * is (windows × types), i.e. 2× the tumbling variant — the
    * overlap factor is the knob. Batch twin `st16_hopping_twin`. */
  def hoppingCounts(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .count()
      .select(col("w.start").as("win_start"), col("event_type"),
        col("count").as("n"))

  /** ST13: streaming drift monitor — per-day event-type mix scored
    * against a fixed BASELINE distribution with PSI terms (batch twin
    * `st13_drift_twin`; one-shot form `dq5_drift_psi`). The baseline is
    * a tiny (category, share) frame — broadcast, typically last week's
    * profile — so the stream side stays the [[windowedCounts]]
    * aggregation: watermark-bounded state, append-mode emission when a
    * day closes, and the alert predicate (`psi_term` above threshold)
    * composes downstream. The one subtlety: per-window shares need the
    * window TOTAL, which in append-mode streaming must come from a
    * second keyless aggregation — instead the day total is folded in as
    * `sum over the emitted day's rows` in the same grouped result via a
    * self-contained two-level groupBy (day first, then the small
    * (day, type) frame is re-grouped in the same micro-batch epoch).
    * Here we keep it single-level: counts emit per (day, type) and the
    * PSI projection runs wherever the closed windows land (foreachBatch
    * / the downstream mart), exactly how the batch twin computes it. */
  def driftCounts(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    windowedCounts(events, horizon)

  /** The PSI scoring applied to closed (day, type) count rows —
    * shared verbatim by the streaming sink side and the batch twin.
    * LEFT join: a category the baseline has never seen surfaces with a
    * NULL psi_term (the strongest drift signal there is) instead of
    * silently dropping out of the monitor. A baseline row carrying a
    * ZERO share is guarded to NULL explicitly — Spark's log(0) yields
    * NULL silently but other engines (DuckDB) raise on ln(0), so the
    * monitor stays engine-portable when its output is re-validated
    * elsewhere. */
  def psiAgainstBaseline(dayCounts: DataFrame, baseline: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("day_start"))
    dayCounts
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(w))
      .join(broadcast(baseline), Seq("event_type"), "left")
      .select(col("day_start"), col("event_type"), col("n"),
        round(col("p"), 6).as("p"),
        when(col("base_p").isNull || col("base_p") === 0, lit(null))
          .otherwise(
            round((col("p") - col("base_p")) * log(col("p") / col("base_p")), 6))
          .as("psi_term"))
  }

  /** ST14: stream-stream correlation join — match each LEFT event to
    * the RIGHT events of the same key within a forward time tolerance
    * (click→purchase attribution, request→response pairing, CDC
    * enrichment against a second feed). This is the capability the
    * reference's architecture delegates entirely to batch (SURVEY.md
    * §2.10 "absent: stream-stream joins"); Spark expresses it natively.
    *
    * Both sides carry a watermark equal to the tolerance, and the join
    * condition bounds `rightTs` to [leftTs, leftTs + tolerance] — the
    * two facts Spark needs to EVICT join state: a left row older than
    * the watermark can never match a future right row, so per-key
    * buffered state is bounded by tolerance × arrival rate, never by
    * stream age. Inner join ⇒ append-mode emission as matches arrive;
    * a match whose sides land in different micro-batches is produced
    * by the state store when the second side shows up
    * (StreamIngestSpec asserts exactly that).
    *
    * The SAME code path runs in batch (`withWatermark` is a no-op
    * there), so the oracled twin `st14_correlate_twin` IS this
    * function on the stored table — not a reimplementation.
    *
    * Inputs must be pre-projected so column names don't collide apart
    * from `key` (the standard enrichment shape: narrow key + payload). */
  def correlateStreams(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tolerance: String): DataFrame = {
    val l = left.withWatermark(leftTs, tolerance)
    val r = right.withWatermark(rightTs, tolerance)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $tolerance"))
      .drop(r(key))
  }

  /** ST10: streaming session windows — gap-merged activity bursts per
    * user via the native `session_window`. State per key is the set of
    * OPEN sessions only: a session closes (and emits, in append mode)
    * once the watermark passes its end, so memory is bounded by the
    * gap + horizon, never by stream age. Batch twin:
    * `st10_session_counts_twin` (same gap semantics, oracled via the
    * lag/cumsum island form). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .count()
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("count").as("n_events"))

  /** ST9: stream-stream interval join — attribute each purchase to the
    * signups of the same user within the preceding hour, as both sides
    * arrive. Watermarks bound the buffered state on each side: a
    * purchase can stop waiting for signups once the signup watermark
    * passes its window start; Spark derives the eviction from the join
    * condition. Batch twin: `j8_interval_join` (same condition). */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame,
                          lateness: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val s = signups
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", lateness)
    p.join(s, expr(
      """p_user = s_user AND
        |s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("signup_id"), col("p_ts"), col("s_ts"))
  }

  /** ST1/ST2 sink: idempotent append per micro-batch (the reference's
    * ON CONFLICT DO NOTHING against already-landed rows). For plain
    * parquet this anti-joins the sink's key set.
    *
    * This unpartitioned form re-reads the WHOLE sink per batch —
    * O(sink size) each time, fine for a small mart or a test double but
    * a scale-killer for an always-on ingest path. The production path is
    * [[idempotentAppendPartitioned]], whose per-batch read cost is
    * bounded by the batch's own partition spread (the retry horizon),
    * not the sink's age. A transactional table format (or JDBC MERGE —
    * [[JdbcUpsertSink]]) replaces both at a real warehouse boundary. */
  def idempotentAppend(batch: DataFrame, sinkPath: String, key: String): Unit = {
    val spark = batch.sparkSession
    val deduped = batch.dropDuplicates(key)
    val toWrite = readSinkIfExists(spark, sinkPath) match {
      case None       => deduped
      case Some(sink) => deduped.join(sink.select(col(key)), Seq(key), "left_anti")
    }
    toWrite.write.mode("append").parquet(sinkPath)
  }

  /** ST11: streaming corpus admission — the streaming twin of
    * [[graft.dedup.Dedup.incrementalAdmit]] (batch twin query
    * `d12_incremental_admit`): every micro-batch of documents is
    * content-deduped against the standing corpus BEFORE appending, so
    * the sink stays duplicate-free by construction — content-level
    * exactly-once, one level stronger than [[idempotentAppend]]'s
    * by-id idempotence (a re-crawled page gets a fresh id; only its
    * content betrays it).
    *
    * Per-batch cost is O(index + batch), not O(corpus): the corpus
    * side is its persisted [[graft.dedup.Dedup.dedupKeys]] INDEX at
    * `indexPath` (digest + minhash signature, a few hundred bytes/doc),
    * appended in the same call for every admitted batch; corpus BODIES
    * at `sinkPath` are opened only for the LSH-candidate verify fetch,
    * semi-join-pruned to a handful of doc_ids. Invoke from
    * `foreachBatch` — batch-id-based replay protection composes via
    * the usual checkpointed trigger. */
  def admitToCorpus(batch: DataFrame, sinkPath: String, indexPath: String,
                    threshold: Double = 0.7): Unit = {
    val spark = batch.sparkSession
    val admitted = (readSinkIfExists(spark, indexPath) match {
      case None => graft.dedup.Dedup.incrementalAdmit(batch, batch.limit(0), threshold)
      case Some(idx) => graft.dedup.Dedup.incrementalAdmitIndexed(
        batch, idx, spark.read.parquet(sinkPath), threshold)
    }).localCheckpoint(true) // one computation feeds two sinks
    admitted.write.mode("append").parquet(sinkPath)
    graft.dedup.Dedup.dedupKeys(admitted).write.mode("append").parquet(indexPath)
  }

  /** ST25: SEMANTIC admission at ingest — [[admitToCorpus]]'s sibling
    * in embedding space: each micro-batch of `(vec_id, embedding)`
    * rows is admitted only if no already-curated corpus vector (or
    * more-senior batch vector) has cosine ≥ `tau`, with candidates
    * IVF-pruned exactly as the oracle-gated batch twin
    * (`e24_incremental_semdedup` /
    * [[graft.similarity.Ann.incrementalSemAdmit]]).
    *
    * Index layout — the 100 TB posture:
    *  - `indexPath/centroids`: the √n₁ prefix-seed centroids, built
    *    ONCE from the first admitted batch and persisted (the
    *    amortized index build the batch twin's scaladoc names).
    *    Corpus drift eventually wants a rebuild — the usual IVF
    *    re-index, out of band, same as any serving index;
    *  - `indexPath/cells`: `(cell, vec_id, v, nrm)` assignment rows
    *    laid out in `cell_bucket = pmod(cell, nBuckets)` partitions.
    *    A batch reads ONLY the buckets its probes hash into
    *    (`PartitionFilters` prune, StreamIngestSpec asserts) — so
    *    per-batch cost tracks the batch, not the corpus, the same
    *    index-only posture as the MinHash face.
    *
    * Cold start (no index yet) follows the batch twin's pinned
    * semantics: the first batch seeds the corpus verbatim (AnnSpec's
    * "empty corpus admits all"); first-wins intra-batch dedup is
    * active from batch 2 on, where batch-1 twins reject as corpus
    * matches. An EMPTY first batch (no-data trigger, recovery epoch)
    * writes nothing — a zero-centroid index would disable admission
    * forever, so cold start waits for data.
    *
    * Replay safety, both failure windows: (a) the sink and the cells
    * index are `batch_id`-partitioned DYNAMIC overwrites, so a
    * foreachBatch retry — at ANY point of the previous attempt —
    * replaces its own partitions instead of appending a second copy
    * (pass Spark's epoch id as `batchId`); (b) rows already present
    * in the standing index (the same vectors redelivered under a
    * different batch id) are dropped by an id-level anti-join before
    * admission — their assigned cell is always their top probe, so
    * the bucket-pruned index read is guaranteed to contain them.
    * Consumers of `sinkPath` see the extra `batch_id` partition
    * column. Invoke from `foreachBatch`. */
  def semAdmitToCorpus(batch: DataFrame, sinkPath: String, indexPath: String,
      batchId: Long, tau: Double = 0.85, nProbe: Int = 4, nBuckets: Int = 64,
      maxCells: Int = 4096): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.{col, pmod, lit}
    import spark.implicits._
    val centroidsPath = s"$indexPath/centroids"
    val cellsPath = s"$indexPath/cells"
    // micro-batch-sized; computed ONCE, feeds the guard, the probes,
    // the verify, and both writes (a streaming source would otherwise
    // be re-read per use)
    val b = batch.localCheckpoint(true)
    // an empty batch (no-data trigger, recovery epoch) must not seed
    // an empty index — zero centroids would disable admission forever
    if (b.isEmpty) return
    // both data writes are batch_id-partitioned DYNAMIC overwrites
    // (the publishDeltas recipe): a foreachBatch retry REPLACES its
    // own partitions instead of appending a second copy, whatever
    // point the previous attempt died at
    def writeAdmitted(admitted: DataFrame,
        cvs: Array[Array[Double]], cns: Array[Double]): Unit = {
      admitted.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .parquet(sinkPath)
      graft.similarity.Ann.cellAssignments(admitted, cvs, cns)
        .withColumn("cell_bucket", pmod(col("cell"), lit(nBuckets)))
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id", "cell_bucket")
        .mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .parquet(cellsPath)
    }
    readSinkIfExists(spark, centroidsPath) match {
      case None =>
        // cold start: pinned admit-all, then build + persist the index
        val verdicts = graft.similarity.Ann
          .incrementalSemAdmit(b.limit(0), b, tau, nProbe, maxCells)
        val admitted = b.join(
            verdicts.filter(col("admitted") === 1).select(col("vec_id").as("aid")),
            col("vec_id") === col("aid"))
          .drop("aid").localCheckpoint(true)
        // the SHARED seed rule (Ann.prefixSeedCentroids) — the batch
        // twin and this persisted copy cannot drift. Centroids commit
        // FIRST (idempotent overwrite): once they exist, recovery goes
        // through the warm path, which tolerates a missing cells dir.
        val seeds = graft.similarity.Ann.prefixSeedCentroids(admitted, maxCells)
        seeds.zipWithIndex
          .map { case (p, i) => (i, p.v, p.nrm) }.toSeq
          .toDF("cell", "v", "nrm")
          .coalesce(1).write.mode("overwrite").parquet(centroidsPath)
        writeAdmitted(admitted, seeds.map(_.v), seeds.map(_.nrm))
      case Some(centDf) =>
        val cents = centDf.select(col("cell"), col("v"), col("nrm"))
          .as[(Int, Array[Double], Double)].collect().sortBy(_._1)
        val (cvs, cns) = (cents.map(_._2), cents.map(_._3))
        val buckets = graft.similarity.Ann.probedCells(b, cvs, cns, nProbe)
          .map(_ % nBuckets).distinct.toSeq
        // the standing index read prunes to the probed buckets — the
        // partition filter is the whole point of the layout. A missing
        // cells dir (cold-start crash between the centroid and data
        // writes) reads as an empty corpus: the batch replays with
        // intra-batch dedup and the data writes complete the recovery.
        val corpusCells = (readSinkIfExists(spark, cellsPath) match {
          case Some(cells) => cells
            .filter(col("cell_bucket").isin(buckets: _*))
            .select(col("cell"), col("vec_id"), col("v"), col("nrm"))
          case None => spark.emptyDataset[(Int, Long, Array[Double], Double)]
            .toDF("cell", "vec_id", "v", "nrm")
        }).localCheckpoint(true) // feeds the replay guard AND the verify
        // replay guard (belt to the dynamic overwrite's braces): rows
        // already indexed — e.g. the same vectors redelivered under a
        // DIFFERENT batch id — must not re-admit; their assigned cell
        // is their top probe, so the pruned read above contains them
        val fresh = b.join(corpusCells.select(col("vec_id")),
          Seq("vec_id"), "left_anti")
        val verdicts = graft.similarity.Ann
          .incrementalSemAdmitIndexed(fresh, cvs, cns, corpusCells, tau, nProbe)
        val admitted = fresh.join(
            verdicts.filter(col("admitted") === 1).select(col("vec_id").as("aid")),
            col("vec_id") === col("aid"))
          .drop("aid").localCheckpoint(true) // one computation, two sinks
        writeAdmitted(admitted, cvs, cns)
    }
  }

  /** ST12: streaming CDC publication — the streaming twin of
    * [[graft.ingest.Events.snapshotDiff]] (batch twin `u6_snapshot_diff`).
    * Each micro-batch folds into a persisted latest-state snapshot and
    * only the CHANGED rows are appended to a delta feed: downstream
    * consumers get an incremental `insert`/`update` stream instead of
    * re-reading a nightly full snapshot rewrite.
    *
    * Scale mechanics (the same trick as [[idempotentAppendPartitioned]],
    * applied to a KEY domain instead of a time domain):
    *  - the snapshot is laid out in `pmod(xxhash64(key), nBuckets)`
    *    partitions, so a batch touches only the buckets its own keys
    *    hash into — the snapshot read prunes to those directories
    *    (`PartitionFilters`), and the rewrite replaces ONLY those
    *    buckets (dynamic partition overwrite), never the whole store;
    *  - newest-wins merge is one window over (old ∩ touched buckets) ∪
    *    batch — a late/stale batch row loses to the standing state and
    *    emits nothing;
    *  - an update is emitted only when a value column actually changed
    *    (null-safe compare); a newer timestamp with identical values
    *    refreshes the state silently.
    * Deletes don't arise from an append-only event stream — route
    * tombstone events to [[graft.ingest.Events.snapshotDiff]] semantics
    * downstream if the source has them. Invoke from `foreachBatch`,
    * passing Spark's epoch id as `batchId`.
    *
    * Replay safety: the delta feed is laid out `partitionBy(batch_id)`
    * and written with DYNAMIC partition overwrite, so a foreachBatch
    * retry (failure anywhere between the delta write and the
    * checkpoint commit) REPLACES its own batch partition instead of
    * appending a second copy of the same change rows. The two failure
    * windows both resolve correctly: a retry before the snapshot
    * rewrite recomputes identical deltas and overwrites them in place;
    * a retry after it recomputes an EMPTY delta set, and an empty
    * dynamic overwrite touches no partitions — the already-published
    * rows stand. */
  def publishDeltas(batch: DataFrame, snapshotPath: String, deltaPath: String,
      key: String, tsCol: String, tiebreak: String, valueCols: Seq[String],
      batchId: Long, nBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val cols = Seq(key, tsCol, tiebreak) ++ valueCols
    val fresh = graft.ingest.Events
      .latestState(batch.select(cols.map(col): _*), Seq(key), col(tsCol), col(tiebreak))
      .withColumn("bucket", pmod(xxhash64(col(key)), lit(nBuckets)).cast("int"))
      .persist()
    try {
      val buckets = fresh.select(col("bucket")).distinct().collect()
        .map(_.getInt(0)).toSeq
      val old = readSinkIfExists(spark, snapshotPath)
        .map(_.filter(col("bucket").isInCollection(buckets))
          .select((cols :+ "bucket").map(col): _*))
      val unioned = old match {
        case None      => fresh.withColumn("__src", lit("new"))
        case Some(o)   => o.withColumn("__src", lit("old"))
          .unionByName(fresh.withColumn("__src", lit("new")))
      }
      val w = Window.partitionBy(col(key))
        .orderBy(col(tsCol).desc, col(tiebreak).desc, col("__src").desc)
      val winners = unioned.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .localCheckpoint(true) // feeds the delta classification AND the state rewrite
      val changed = valueCols.map(c => !(col(c) <=> col(s"__old_$c"))).reduce(_ || _)
      // presence flag, not value-nullness: an old row whose value
      // columns are all NULL must still classify as update, not insert
      val oldVals = old.map(_.select(
          col(key) +: (valueCols.map(c => col(c).as(s"__old_$c")) :+
            lit(1).as("__in_old")): _*))
        .getOrElse(winners.limit(0).select(
          col(key) +: (valueCols.map(c => col(c).as(s"__old_$c")) :+
            lit(1).as("__in_old")): _*))
      val deltas = winners.join(oldVals, Seq(key), "left_outer")
        .withColumn("change_type",
          when(col("__in_old").isNull && col("__src") === "new", lit("insert"))
            .when(col("__src") === "new" && changed, lit("update")))
        .filter(col("change_type").isNotNull)
        .select((cols :+ "change_type").map(col): _*)
      deltas.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(deltaPath)
      winners.select((cols :+ "bucket").map(col): _*)
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(snapshotPath)
    } finally { fresh.unpersist(); () }
  }

  /** Read the sink, treating ONLY path-not-found as "sink is new".
    * Any other failure (transient FS error, corrupt footer, permission)
    * rethrows — silently skipping the anti-join on a flaky read would
    * append duplicates, the exact bug idempotence exists to prevent. */
  private def readSinkIfExists(spark: SparkSession, sinkPath: String): Option[DataFrame] =
    try Some(spark.read.parquet(sinkPath))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => None
    }

  /** Scale-safe ST1 sink: the sink is laid out `partitionBy(partCol)`
    * (sources.Layout grain — here typically the received date), and a
    * batch anti-joins ONLY the partitions its own keys can touch.
    *
    * Why this bounds the cost: a webhook retry arrives within the retry
    * horizon of its first delivery, so a batch's `partExpr` values span
    * a handful of partitions no matter how old the sink grows. The
    * anti-join's sink read therefore prunes to O(horizon) partitions —
    * Catalyst turns the `isInCollection` into `PartitionFilters` (no
    * file outside those directories is even listed; asserted in
    * StreamIngestSpec) — where the unpartitioned form re-reads the
    * entire sink every batch.
    *
    * A duplicate delivered LATER than the horizon lands again (its
    * partition differs) — the same at-least-once posture as the
    * reference's retry envelope; the batch backfill union (J6) and
    * downstream dedup-by-id absorb it. */
  def idempotentAppendPartitioned(batch: DataFrame, sinkPath: String, key: String,
      partCol: String, partExpr: Column): Unit = {
    val withPart = batch.withColumn(partCol, partExpr).dropDuplicates(key).persist()
    try {
      pendingRows(withPart, sinkPath, key, partCol)
        .write.mode("append").partitionBy(partCol).parquet(sinkPath)
    } finally { withPart.unpersist(); () }
  }

  /** The partition-pruned new-rows plan of [[idempotentAppendPartitioned]]
    * (exposed so specs can assert `PartitionFilters` on the sink scan).
    * `batchWithPart` must already carry `partCol`. */
  def pendingRows(batchWithPart: DataFrame, sinkPath: String, key: String,
      partCol: String, maxParts: Int = 64): DataFrame = {
    val spark = batchWithPart.sparkSession
    readSinkIfExists(spark, sinkPath) match {
      case None => batchWithPart // first write: nothing to collide with
      case Some(sink) =>
        // the batch's own partition values — bounded by the retry
        // horizon (a few dates), never by sink age. Collecting them is
        // the one driver-side step and it is O(horizon). `maxParts`
        // enforces that assumption: a batch spanning more partitions
        // than the horizon allows falls back to the full anti-join
        // (correct, just unpruned) instead of building a huge IN list.
        val parts = batchWithPart.select(col(partCol)).distinct().collect()
          .map(_.get(0)).toSeq
        val (nullPart, defined) = parts.partition(_ == null)
        val sinkKeys =
          if (parts.size > maxParts) sink.select(col(key))
          else if (parts.isEmpty) return batchWithPart
          else {
            // NULL partition values land in __HIVE_DEFAULT_PARTITION__;
            // isInCollection is NULL for them, so OR-in isNull explicitly
            // or those sink rows are never anti-joined and re-land as
            // duplicates every retry.
            val inDefined =
              if (defined.isEmpty) lit(false) else col(partCol).isInCollection(defined)
            val pred = if (nullPart.nonEmpty) inDefined || col(partCol).isNull else inDefined
            sink.filter(pred).select(col(key))
          }
        batchWithPart.join(sinkKeys, Seq(key), "left_anti")
    }
  }
}
