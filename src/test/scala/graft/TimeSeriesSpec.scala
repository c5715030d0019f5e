package graft

import java.sql.Date
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap fill produces a dense spine with LOCF values") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 5.0),  // same day: sums to 15
      (1L, ts("2024-01-04 09:00:00"), 7.0),  // two-day gap before this
      (2L, ts("2024-01-02 00:00:00"), 1.0)).toDF("k", "ts", "v")
    val got = TimeSeries.gapFillDaily(df, col("k"), col("ts"), col("v"))
      .orderBy("k", "day")
      .as[(Long, Date, Option[Double], Double, Int)].collect().toSeq
    assert(got === Seq(
      (1L, Date.valueOf("2024-01-01"), Some(15.0), 15.0, 0),
      (1L, Date.valueOf("2024-01-02"), None, 15.0, 1),
      (1L, Date.valueOf("2024-01-03"), None, 15.0, 1),
      (1L, Date.valueOf("2024-01-04"), Some(7.0), 7.0, 0),
      (2L, Date.valueOf("2024-01-02"), Some(1.0), 1.0, 0)))
  }

  test("Theil-Sen: hand-computed median slope; one outlier day cannot move it") {
    def d(s: String) = Date.valueOf(s)
    // key 1: perfectly linear n = 2·day → every pairwise slope is 2
    val lin = Seq(1, 2, 3, 4, 5).map(i => (1L, d(f"2024-01-0$i"), 2L * i))
    // key 2: the same line with day 5 replaced by a wild outlier
    // (n=1000). Of the C(5,2)=10 pairwise slopes, only the 4 touching
    // day 5 are contaminated; the lower median (5th of 10 sorted) is
    // still an uncontaminated slope of 2. An OLS fit on the same data
    // gives slope ~197 — this pin IS the robustness property.
    val out = Seq((2L, d("2024-01-01"), 2L), (2L, d("2024-01-02"), 4L),
      (2L, d("2024-01-03"), 6L), (2L, d("2024-01-04"), 8L),
      (2L, d("2024-01-05"), 1000L))
    // key 3: single day → no pairs → absent from the output
    val single = Seq((3L, d("2024-01-01"), 7L))
    val daily = (lin ++ out ++ single).toDF("k", "day", "n")
    val got = TimeSeries.theilSen(daily, col("k"), col("day"), col("n"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 10L, 2.0), s"linear series: ${got(1L)}")
    assert(got(2L) == (2L, 10L, 2.0), s"outlier-contaminated series: ${got(2L)}")
    assert(!got.contains(3L), "single-day key emits no slope")
  }

  test("transition matrix rows are counts of adjacent pairs and probabilities sum to 1") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 5L, "a"), (2L, 6L, "a")).toDF("k", "seq", "s")
    val got = TimeSeries.transitionMatrix(
        df, col("k"), Seq(col("seq")), col("s"))
      .orderBy("prev_state", "next_state")
      .as[(String, String, Long, Double)].collect().toSeq
    // user 1: a→b, b→a, a→b; user 2: a→a
    assert(got === Seq(
      ("a", "a", 1L, 1.0 / 3.0), ("a", "b", 2L, 2.0 / 3.0),
      ("b", "a", 1L, 1.0)))
    // probabilities per prev row sum to 1 exactly on these fractions
    val byPrev = got.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    byPrev.foreach { case (_, p) => assert(math.abs(p - 1.0) < 1e-12) }
  }

  test("sequences never cross keys: single-event keys emit no transitions") {
    val df = Seq((1L, 1L, "a"), (2L, 2L, "b")).toDF("k", "seq", "s")
    assert(TimeSeries.transitionMatrix(df, col("k"), Seq(col("seq")), col("s"))
      .count() === 0L)
  }

  test("rolling correlation: perfect/anti/zero-variance windows; missing day is a true zero") {
    def d(i: Int) = Date.valueOf(f"2024-01-$i%02d")
    // 4-day window over 5 days; c = 2a (perfect +1), b anti-moves a,
    // z is constant (zero variance → NULL). Day 3 is MISSING for a
    // and c (a true zero) and present for b/z.
    val daily = Seq(
      ("a", d(1), 1L), ("a", d(2), 2L), ("a", d(4), 4L), ("a", d(5), 5L),
      ("c", d(1), 2L), ("c", d(2), 4L), ("c", d(4), 8L), ("c", d(5), 10L),
      ("b", d(1), 9L), ("b", d(2), 8L), ("b", d(3), 10L), ("b", d(4), 6L), ("b", d(5), 4L),
      ("z", d(1), 7L), ("z", d(2), 7L), ("z", d(3), 7L), ("z", d(4), 7L), ("z", d(5), 7L))
      .toDF("k", "day", "n")
    val got = TimeSeries.rollingCorr(daily, col("k"), col("day"), col("n"),
        windowDays = 4)
      .as[(String, String, Date, Long, Option[Double])].collect()
      .map(r => (r._1, r._2, r._3.toString) -> r._5).toMap
    // full-window anchors are days 4 and 5 only
    assert(got.size == 12, s"pairs×anchors: ${got.size}")
    assert(got(("a", "c", "2024-01-05")).contains(1.0), "scaled copy must correlate +1")
    assert(got(("a", "c", "2024-01-04")).contains(1.0))
    // zero-variance partner → NULL, never NaN/divide-by-zero
    assert(got(("a", "z", "2024-01-05")).isEmpty)
    // the missing day-3 zero DRIVES the a/b correlation negative at
    // day 5's window {2,0,4,5} vs {8,10,6,4}: hand value -0.989778
    assert(got(("a", "b", "2024-01-05")).contains(-0.989778),
      s"got ${got(("a", "b", "2024-01-05"))}")
  }

  test("CUSUM changepoint lands on the level shift and ties break earliest") {
    // key 1: level shift after day 3 (10,10,10 then 20,20,20) — the
    // cumulative deviation |Σ(n·D−T)| peaks at the last low day.
    // D=6, T=90: dev(low)=10·6−90=−30, dev(high)=+30 → cusum
    // −30,−60,−90,−60,−30,0 → peak |−90| on day 3.
    // key 2: constant series — every cusum is 0, tie on all days →
    // earliest day wins by the explicit row_number order.
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 10L), (1L, Date.valueOf("2024-01-02"), 10L),
      (1L, Date.valueOf("2024-01-03"), 10L), (1L, Date.valueOf("2024-01-04"), 20L),
      (1L, Date.valueOf("2024-01-05"), 20L), (1L, Date.valueOf("2024-01-06"), 20L),
      (2L, Date.valueOf("2024-02-01"), 5L), (2L, Date.valueOf("2024-02-02"), 5L))
      .toDF("k", "day", "n")
    val got = TimeSeries.cusumChangepoint(daily, col("k"), col("day"), col("n"))
      .as[(Long, Date, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, Date.valueOf("2024-01-03"), 90L, 6L, 90L)))
    assert(got(2L) === ((2L, Date.valueOf("2024-02-01"), 0L, 2L, 10L)))
  }

  test("LTTB downsampling keeps anchors, keeps the spike, ties to earliest on flat series") {
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
    // key 1: 21 days, flat y=5 except a spike y=100 on day 10 (bucket
    // [8..14]) — the spike MUST survive (the whole point of LTTB;
    // striding or averaging would smear it).
    // key 2: flat everywhere — every interior point is collinear with
    // both anchors (area 0), so each bucket ties and keeps its
    // EARLIEST day.
    // key 3: single point — both anchors collapse to one row.
    val rows =
      (0 to 20).map(i => (1L, d(i), if (i == 10) 100L else 5L)) ++
        (0 to 20).map(i => (2L, d(i), 7L)) ++
        Seq((3L, d(0), 9L))
    val got = TimeSeries.lttbDownsample(rows.toDF("k", "day", "n"),
        col("k"), col("day"), col("n"), bucketSize = 7)
      .as[(Long, Date, Long, Long)].collect()
    val k1 = got.filter(_._1 == 1L).sortBy(_._2.toLocalDate.toEpochDay)
    assert(k1.head._2 === d(0) && k1.last._2 === d(20), "anchors retained")
    assert(k1.exists(r => r._2 === d(10) && r._3 === 100L),
      s"the spike must survive downsampling: ${k1.toSeq}")
    // interior buckets for 21 points at B=7: rn 1..19 -> buckets 0,1,2
    assert(k1.length === 5, s"2 anchors + 3 bucket picks: ${k1.toSeq}")
    val k2 = got.filter(_._1 == 2L).sortBy(_._2.toLocalDate.toEpochDay)
    assert(k2.map(_._2).toSeq === Seq(d(0), d(1), d(8), d(15), d(20)),
      s"flat series ties to each bucket's earliest day: ${k2.toSeq}")
    val k3 = got.filter(_._1 == 3L)
    assert(k3.length === 1 && k3.head._2 === d(0), "single point survives once")
  }

  test("TS13: Fano factor — Poisson-like reads ~1000 milli, constant reads 0") {
    // constant daily volume (n=4 every day): variance 0 → fano 0.
    // alternating 2/6 (mean 4, population variance 4): fano = 1000.
    // the registered query's exact rational: ((D·Σn² − (Σn)²)·1000)
    // div (D·Σn) — for D=4, n=(2,6,2,6): Σn=16, Σn²=80 →
    // (320−256)·1000 div 64 = 1000 exactly.
    import org.apache.spark.sql.functions._
    val daily = Seq(
      ("flat", 1, 4L), ("flat", 2, 4L), ("flat", 3, 4L), ("flat", 4, 4L),
      ("burst", 1, 2L), ("burst", 2, 6L), ("burst", 3, 2L), ("burst", 4, 6L))
      .toDF("event_type", "day", "n")
    val got = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("sum_n"),
        sum(col("n") * col("n")).as("sum_n2"))
      .select(col("event_type"),
        expr("((n_days * sum_n2 - sum_n * sum_n) * 1000) div (n_days * sum_n)")
          .as("fano_milli"))
      .as[(String, Long)].collect().toMap
    assert(got("flat") === 0L, s"constant series must read fano 0: $got")
    assert(got("burst") === 1000L, s"var=mean must read exactly 1000: $got")
  }

  test("CUSUM statistic is invariant to input row order") {
    val rows = Seq(
      (1L, Date.valueOf("2024-01-04"), 20L), (1L, Date.valueOf("2024-01-01"), 10L),
      (1L, Date.valueOf("2024-01-03"), 10L), (1L, Date.valueOf("2024-01-06"), 20L),
      (1L, Date.valueOf("2024-01-02"), 10L), (1L, Date.valueOf("2024-01-05"), 20L))
    val a = TimeSeries.cusumChangepoint(rows.toDF("k", "day", "n"),
      col("k"), col("day"), col("n")).collect().toSeq
    val b = TimeSeries.cusumChangepoint(
      rows.reverse.toDF("k", "day", "n").repartition(7),
      col("k"), col("day"), col("n")).collect().toSeq
    assert(a === b)
  }
}
