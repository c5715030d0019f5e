package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization and sequence analytics over an event
  * stream — the operations a metrics pipeline needs between raw events
  * and a model-ready panel: a dense per-key time spine with gaps
  * forward-filled, and the first-order transition structure of the
  * event sequence.
  */
object TimeSeries {

  /** Daily gap fill with forward fill (last observation carried
    * forward): aggregate to (key, day), expand each key's [min, max]
    * day range to a DENSE spine, and fill missing days with the most
    * recent observed value.
    *
    * Scale: the spine is generated distributed — `sequence()` +
    * `explode` per key, never a driver-side calendar loop — and the
    * fill is one windowed `last(ignoreNulls)` per key partition, so
    * the whole operator is two shuffles (daily rollup, spine join)
    * regardless of key count or time span. Daily sums go through
    * DECIMAL so the rollup is partition-order exact.
    *
    * @return (key, day, day_value — null on gap days, filled_value —
    *         LOCF, was_gap 0/1), one row per key per day in the key's
    *         observed range.
    */
  def gapFillDaily(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    val daily = df
      .groupBy(key.as("k"), to_date(ts).as("day"))
      .agg(sum(value.cast("decimal(18,2)")).cast("double").as("day_value"))
    val spine = daily
      .groupBy(col("k")).agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("k"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))
    val fill = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("day"), col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(fill).as("filled_value"),
        col("day_value").isNull.cast("int").as("was_gap"))
  }

  /** First-order Markov transition matrix of a per-key event sequence:
    * for each observed (previous state → next state) pair, the count
    * and the row-normalized transition probability. The `ord` columns
    * must be a deterministic total order within each key (e.g. ts +
    * a unique id tiebreak) or the lag pairing itself is ambiguous.
    *
    * Scale: one window pass keyed by `key` (sequences never cross
    * keys, so the sort is per-key, not global) and one aggregation
    * over at most |states|² rows. The probability is a single double
    * division of two exact longs — deterministic IEEE, engine-portable.
    */
  def transitionMatrix(df: DataFrame, key: Column, ord: Seq[Column],
                       state: Column): DataFrame = {
    val seqW = Window.partitionBy(key).orderBy(ord: _*)
    val rowTotal = Window.partitionBy(col("prev_state"))
    df.select(state.as("next_state"),
        lag(state, 1).over(seqW).as("prev_state"))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(rowTotal).cast("double"))
  }

  /** TS7: Theil–Sen robust trend slope per key — the LOWER MEDIAN of
    * all pairwise slopes (n_j − n_i)/(day_j − day_i) over a (key, day,
    * n) daily series. One wild day moves an OLS slope arbitrarily but
    * cannot move the pairwise-slope median (breakdown point ~29%) —
    * the robust-TREND companion of the robust location/outlier stats
    * (dq7/a20) and ts5's anomaly flags.
    *
    * Exactness: each slope is one IEEE double division of two exact
    * integers (identical in any engine), and the median is an explicit
    * row_number pick at (cnt+1) div 2 — deterministic under slope ties
    * and free of percentile interpolation differences.
    *
    * Scale: the pair self-join runs on the |keys|×|days| DAILY rollup,
    * never the facts; |days| is bounded by the calendar, not the
    * corpus, so pair volume is volume-invariant. Keys with a single
    * day have no pairs and are absent by construction. */
  def theilSen(daily: DataFrame, key: Column, day: Column, n: Column): DataFrame = {
    val d = daily.select(key.as("k"), day.as("day"), n.as("n"))
    val pairs = d.as("a").join(d.as("b"),
        col("a.k") === col("b.k") && col("a.day") < col("b.day"))
      .select(col("a.k").as("k"),
        ((col("b.n") - col("a.n")).cast("double") /
          datediff(col("b.day"), col("a.day")).cast("double")).as("slope"))
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("slope"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("rn") === ((col("cnt") + lit(1L)) / lit(2L)).cast("long"))
      .select(col("k"), col("cnt").as("n_pairs"), round(col("slope"), 6).as("slope"))
  }

  /** W17: trailing-window Pearson correlation between every pair of
    * per-key daily series — "did clicks decouple from views this
    * month?" as a standing daily table (ts4 answers it once,
    * globally; this answers it per trailing window, the monitoring
    * form).
    *
    * A day with no events is a true zero (counts), so every window
    * has exactly `windowDays` points and the five sufficient
    * statistics (Σx, Σy, Σx², Σy², Σxy) are EXACT integers — missing
    * days simply contribute nothing to the sums. Each daily row fans
    * out to the ≤`windowDays` anchors it contributes to (the w12/w14
    * presence-fan-out trick — no COUNT-over-RANGE frame, no spine
    * nested-loop join); cross products are built per DAY first
    * (|days|·|pairs| rows, calendar-bounded), then fanned the same
    * way. The final Pearson value is one IEEE expression over exact
    * integers — deterministic cross-engine; zero-variance windows are
    * NULL by definition.
    *
    * Scale: every frame is bounded by |calendar| × |keys|² — volume
    * -invariant (10× the events changes the n values, not the row
    * counts). Shuffles are keyed by (key, anchor) or (pair, anchor).
    *
    * @return (k1, k2, day, n_days, corr) for every key pair (k1 < k2)
    *         and every anchor day with a FULL trailing window.
    */
  def rollingCorr(daily: DataFrame, key: Column, day: Column, n: Column,
      windowDays: Int = 28): DataFrame = {
    val w = windowDays
    val d = daily.select(key.as("k"), day.as("day"), n.cast("long").as("n"))
      .localCheckpoint(true) // small rollup, read by 4 frames below
    val span = d.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    // anchors with a full trailing window; each daily row contributes
    // to anchors [day, day+w-1] clamped to that range
    def fanned(src: DataFrame): DataFrame = src
      .crossJoin(broadcast(span))
      .withColumn("anchor", explode(expr(
        s"""CASE WHEN least(date_add(day, ${w - 1}), d1) >=
           |  greatest(day, date_add(d0, ${w - 1}))
           |THEN sequence(greatest(day, date_add(d0, ${w - 1})),
           |  least(date_add(day, ${w - 1}), d1))
           |ELSE CAST(array() AS ARRAY<DATE>) END""".stripMargin)))
      .drop("d0", "d1", "day")
    val stats = fanned(d)
      .groupBy(col("k"), col("anchor"))
      .agg(sum(col("n")).as("sx"), sum(col("n") * col("n")).as("sxx"))
      .localCheckpoint(true) // |keys|×|days| — read as both pair sides
    val prod = fanned(
        d.as("a").join(d.as("b"), col("a.day") === col("b.day") &&
            col("a.k") < col("b.k"))
          .select(col("a.k").as("k1"), col("b.k").as("k2"), col("a.day").as("day"),
            (col("a.n") * col("b.n")).as("p")))
      .groupBy(col("k1"), col("k2"), col("anchor"))
      .agg(sum(col("p")).as("sxy"))
    // full pair × DENSE anchor grid so all-zero windows still emit
    // (NULL corr) — dense from the calendar span, not from observed
    // windows, or an all-keys-quiet gap longer than the window would
    // drop its anchors while the global-definition oracle emits them
    val keys = d.select(col("k")).distinct()
    val grid = keys.as("x").join(keys.as("y"), col("x.k") < col("y.k"))
      .select(col("x.k").as("k1"), col("y.k").as("k2"))
      .crossJoin(broadcast(span))
      .select(col("k1"), col("k2"), explode(expr(
        s"""CASE WHEN d1 >= date_add(d0, ${w - 1})
           |THEN sequence(date_add(d0, ${w - 1}), d1)
           |ELSE CAST(array() AS ARRAY<DATE>) END""".stripMargin)).as("anchor"))
    grid
      .join(stats.select(col("k").as("k1"), col("anchor"),
        col("sx").as("sx1"), col("sxx").as("sxx1")), Seq("k1", "anchor"), "left")
      .join(stats.select(col("k").as("k2"), col("anchor"),
        col("sx").as("sx2"), col("sxx").as("sxx2")), Seq("k2", "anchor"), "left")
      .join(prod, Seq("k1", "k2", "anchor"), "left")
      .select(col("k1"), col("k2"), col("anchor").as("day"), lit(w.toLong).as("n_days"),
        round({
          // num/dx/dy each run EXACTLY: decimal(19,0) inputs widen to
          // decimal(38,0) products, so every n·Σxy − ΣxΣy term is an
          // exact integer up to 10³⁸ (a double-per-product path would
          // round each product before subtracting and the 6-dp corr
          // could diverge once a window sum exceeds ~2²⁶·⁵, i.e.
          // ~9.5e7 events/window). den2 = dx·dy is the one place the
          // exact chain would exceed decimal(38,0) (dx,dy can each
          // reach ~1e19 around ~5e8 events/day/key-pair, where the
          // overflow surfaces as a silent NULL vs DuckDB's error — r13
          // advice), so dx and dy cast to double BEFORE multiplying:
          // den2 only feeds the >0 guard (dx,dy ≥ 0 by Cauchy-Schwarz,
          // and sign survives rounding) and sqrt, which is double
          // anyway. The oracle applies the identical per-factor cast,
          // so the IEEE product is bit-equal cross-engine.
          def dec(c: Column) = c.cast("decimal(19,0)")
          val wD = lit(w.toLong).cast("decimal(19,0)")
          val sx1 = dec(coalesce(col("sx1"), lit(0L)))
          val sx2 = dec(coalesce(col("sx2"), lit(0L)))
          val dx = wD * dec(coalesce(col("sxx1"), lit(0L))) - sx1 * sx1
          val dy = wD * dec(coalesce(col("sxx2"), lit(0L))) - sx2 * sx2
          val den2 = dx.cast("double") * dy.cast("double")
          val num = wD * dec(coalesce(col("sxy"), lit(0L))) - sx1 * sx2
          num.cast("double") /
            sqrt(when(den2 > lit(0.0), den2)) // zero variance → NULL corr
        }, 6).as("corr"))
  }

  /** TS8: CUSUM changepoint over a per-key daily series — the day
    * where the cumulative deviation from the series mean peaks (Page's
    * cumulative-sum statistic; the standard level-shift detector for
    * ingest-volume monitoring).
    *
    * All arithmetic is EXACT 64-bit integer: the deviation of day d is
    * scaled by the day count D (n_d·D − T instead of n_d − T/D), so
    * the running sum is an integer in both engines and the argmax is
    * bit-identical — no float accumulation order to drift. Ties on
    * |cusum| break to the EARLIEST day (explicit row_number order).
    *
    * Scale: runs on the |keys|×|days| daily rollup, never the facts;
    * per-key windows are calendar-bounded. Two window passes (per-key
    * totals, then the running sum) over one shuffle by key.
    *
    * @return (k, change_day, cusum_peak, n_days, total) — cusum_peak
    *         is |Σ(n·D−T)| at the peak, in D-scaled units.
    */
  def cusumChangepoint(daily: DataFrame, key: Column, day: Column,
      n: Column): DataFrame = {
    val d = daily.select(key.as("k"), day.as("day"), n.cast("long").as("n"))
    val perKey = Window.partitionBy(col("k"))
    val run = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("dd", count(lit(1)).over(perKey))
      .withColumn("tt", sum(col("n")).over(perKey))
      .withColumn("cusum", sum(col("n") * col("dd") - col("tt")).over(run))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(abs(col("cusum")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("k"), col("day").as("change_day"),
        abs(col("cusum")).as("cusum_peak"), col("dd").as("n_days"),
        col("tt").as("total"))
  }

  /** TS10: LTTB downsampling — Largest-Triangle-Three-Buckets
    * (Steinarsson 2013), the standard visual decimation every
    * observability dashboard runs: keep the first and last points,
    * split the interior into fixed buckets, and keep from each bucket
    * the point forming the LARGEST TRIANGLE with its neighbor buckets
    * — peaks, dips, and changepoints survive where naive striding or
    * averaging erases them.
    *
    * This is the PARALLEL bucket-average variant: both triangle
    * anchors are the NEIGHBOR BUCKETS' AVERAGES (canonical LTTB uses
    * the previous bucket's SELECTED point, a sequential dependency no
    * shuffle-parallel plan can honor; the average-anchor variant is
    * the standard streaming/partitioned adaptation). Selection is
    * EXACT: the triangle-area comparison clears both rational anchors'
    * denominators, so candidates within a bucket compare by an exact
    * integer cross product E = (pₓ·cₐ − sₐₓ)(s꜀ᵧ·cₐ − sₐᵧ·c꜀) −
    * (s꜀ₓ·cₐ − sₐₓ·c꜀)(pᵧ·cₐ − sₐᵧ), computed in decimal(38,0) (the
    * w17 posture — same 128-bit width as the oracle's HUGEINT), ties
    * to the earliest day. Bit-identical cross-engine ⇒ hash-oracled.
    *
    * Scale: runs on the |keys|×|days| daily rollup; one shuffle by
    * key, two window passes (row numbering, neighbor-bucket lag/lead)
    * and one per-(key, bucket) argmax — no self-joins, volume-
    * invariant in the fact count (the w17 property).
    *
    * @return (k, day, y, bucket) — retained points only, bucket −1 and
    *         max are the two anchors.
    */
  def lttbDownsample(daily: DataFrame, key: Column, day: Column,
      n: Column, bucketSize: Int = 7): DataFrame = {
    val B = bucketSize.toLong
    val d = daily.select(key.as("k"), day.as("day"),
      datediff(day, lit("1970-01-01").cast("date")).cast("long").as("x"),
      n.cast("long").as("y"))
    val w = Window.partitionBy(col("k")).orderBy(col("x"))
    val tagged = d
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("k"))))
      .withColumn("b",
        when(col("rn") === 0, lit(-1L))
          .when(col("rn") === col("cnt") - 1,
            when(col("cnt") >= 3,
              floor((col("cnt") - 3) / B).cast("long") + 1L).otherwise(lit(0L)))
          .otherwise(floor((col("rn") - 1) / B).cast("long")))
    val isAnchor = col("rn") === 0 || col("rn") === col("cnt") - 1
    // per-(key, bucket) sums; anchors form their own 1-point buckets at
    // the two ends, so lag/lead over bucket order yields every interior
    // bucket's neighbor anchors
    val sums = tagged.groupBy(col("k"), col("b"))
      .agg(sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        count(lit(1)).as("c"))
    val wb = Window.partitionBy(col("k")).orderBy(col("b"))
    val dec = "decimal(38,0)"
    val nb = sums
      .withColumn("sax", lag(col("sx"), 1).over(wb))
      .withColumn("say", lag(col("sy"), 1).over(wb))
      .withColumn("ca", lag(col("c"), 1).over(wb))
      .withColumn("scx", lead(col("sx"), 1).over(wb))
      .withColumn("scy", lead(col("sy"), 1).over(wb))
      .withColumn("cc", lead(col("c"), 1).over(wb))
    val cands = tagged.filter(!isAnchor)
      .join(nb.select(col("k"), col("b"), col("sax"), col("say"), col("ca"),
        col("scx"), col("scy"), col("cc")), Seq("k", "b"))
    val e = (col("x").cast(dec) * col("ca") - col("sax")) *
        (col("scy").cast(dec) * col("ca") - col("say").cast(dec) * col("cc")) -
      (col("scx").cast(dec) * col("ca") - col("sax").cast(dec) * col("cc")) *
        (col("y").cast(dec) * col("ca") - col("say"))
    val picked = cands
      .withColumn("pr", row_number().over(Window.partitionBy(col("k"), col("b"))
        .orderBy(abs(e).desc, col("x"))))
      .filter(col("pr") === 1)
      .select(col("k"), col("day"), col("y"), col("b").as("bucket"))
    tagged.filter(isAnchor)
      .select(col("k"), col("day"), col("y"), col("b").as("bucket"))
      .union(picked)
  }
}
