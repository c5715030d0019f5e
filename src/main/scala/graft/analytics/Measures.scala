package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The DAX-measure library re-expressed as one-pass Spark aggregations
  * (SURVEY.md §2.4 A1–A13, §2.2 P5).
  *
  * Design rules (all motivated by the 100 TB target):
  *  - Funnel tiles are ONE conditional-aggregation pass
  *    (`sum(when(cond,1))`), never N filtered scans — N stage counts
  *    cost one shuffle instead of N.
  *  - Ratios are derived columns computed AFTER aggregation, so the
  *    rollup Total row gets ratio-of-totals (52/213 = 24.41%, the
  *    seller-dashboard arithmetic), not an average of ratios.
  *  - Money is aggregated exactly: `sum(cast(x as decimal(18,2)))` is
  *    associative-exact, so partial aggregation across any number of
  *    executors is bit-identical to a single-threaded oracle — float
  *    sums would drift with partitioning. Cast back to double at the end.
  *  - Percent-of-total uses an empty-frame window over the aggregated
  *    (small) result, not a second scan of the facts.
  */
object Measures {

  /** Exact, partitioning-independent money sum (see scaladoc above). */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** A1-style conditional count (DAX CALCULATE(COUNTROWS, filter)). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** A4: guarded percentage ratio, 2 decimals, NULL when denominator=0. */
  def pctRatio(num: Column, den: Column): Column =
    round(num * 100.0 / nullif(den.cast("double"), lit(0.0)), 2)

  /** P5: the dashboard slicer "filter context" — month / year / agent
    * multi-select applied before every measure (manager dashboard
    * MES/AÑO/ASESOR slicers). Year/month selections compile to HALF-OPEN
    * RANGES on the bare date column, not `year(c) === y` — a
    * function-wrapped predicate reduces the parquet scan to IsNotNull
    * (full read at 100 TB), while a range on the raw column pushes to
    * the reader, prunes row groups via min/max stats, and prunes
    * partitions on a date-partitioned layout. Month-without-year is the
    * one slicer shape a range cannot express (every March of every
    * year); only there does the function form remain. */
  final case class FilterCtx(
      year: Option[Int] = None,
      month: Option[Int] = None,
      agents: Seq[String] = Nil) {
    def apply(df: DataFrame, dateCol: Column, agentCol: Column): DataFrame = {
      val range: Option[Column] = (year, month) match {
        case (Some(y), Some(m)) =>
          val start = java.time.LocalDate.of(y, m, 1)
          Some(dateCol >= lit(start.toString) &&
            dateCol < lit(start.plusMonths(1).toString))
        case (Some(y), None) =>
          Some(dateCol >= lit(s"$y-01-01") && dateCol < lit(s"${y + 1}-01-01"))
        case (None, Some(m)) =>
          Some(org.apache.spark.sql.functions.month(dateCol) === m)
        case (None, None) => None
      }
      val preds = Seq(range,
        if (agents.nonEmpty) Some(agentCol.isin(agents: _*)) else None
      ).flatten
      preds.foldLeft(df)((d, p) => d.filter(p))
    }
  }

  /** A1+A4: one-pass funnel — stage counts plus pairwise conversion
    * ratios, one row out. `stages` maps output column name → predicate. */
  def funnel(df: DataFrame, stages: Seq[(String, Column)],
             ratios: Seq[(String, String, String)]): DataFrame = {
    val counts = df.agg(
      countIf(stages.head._2).as(stages.head._1),
      stages.tail.map { case (n, c) => countIf(c).as(n) }: _*
    )
    ratios.foldLeft(counts) { case (d, (name, num, den)) =>
      d.withColumn(name, pctRatio(col(num), col(den)))
    }
  }

  /** A5: per-agent pivot with a grand-total row via ROLLUP; ratio
    * columns recomputed post-rollup (ratio-of-totals). `grouping()`
    * labels the Total row exactly like the oracle's GROUP BY ROLLUP. */
  def rollupWithTotal(df: DataFrame, key: Column, keyName: String,
                      aggs: Seq[Column], post: Seq[(String, Column)]): DataFrame = {
    // grouping() is only legal inside the aggregate list of the rollup,
    // and must reference a plain attribute — pre-project the key so no
    // alias appears inside the rollup expression.
    val base = df.withColumn(keyName, key)
      .rollup(col(keyName))
      .agg(aggs.head, (aggs.tail :+ grouping(col(keyName)).cast("int").as("is_total")): _*)
      .withColumn(keyName, coalesce(col(keyName), lit("TOTAL")))
    post.foldLeft(base) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  /** A6/W2: top-k leaderboard with deterministic tiebreak.
    *
    * `orderBy().limit(k)` plans as TakeOrderedAndProject (per-partition
    * bounded top-k + single merge of k·partitions rows); rank is then
    * assigned post-hoc on the k survivors. The rank-then-filter window
    * form this replaces pushed the ENTIRE aggregated keyspace through
    * one partition — harmless over bounded dims, a scale-killer over
    * unbounded keys (agents/tokens at 100 TB). */
  def topK(df: DataFrame, key: Column, keyName: String, measure: Column,
           k: Int): DataFrame = {
    val agg = df.groupBy(key.as(keyName)).agg(measure.as("total"))
    agg.orderBy(col("total").desc, col(keyName)).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("total").desc, col(keyName))))
  }

  /** A8/W4: percent-of-total distribution over an aggregated slice. */
  def pctOfTotal(df: DataFrame, key: Column, keyName: String,
                 measure: Column): DataFrame =
    df.groupBy(key.as(keyName)).agg(measure.as("v"))
      .withColumn("pct", round(col("v") * 100.0 / sum("v").over(Window.partitionBy()), 2))

  /** A9: monthly trend bucketing (calendar-grain aggregation). */
  def monthlyTrend(df: DataFrame, dateCol: Column, aggs: Seq[Column]): DataFrame =
    df.groupBy(date_trunc("month", dateCol).as("month_start"))
      .agg(aggs.head, aggs.tail: _*)

  /** A12/W3: running (cumulative-to-date) total within a partition —
    * the DAX time-intelligence YTD pattern. Runs over the already
    * aggregated month grain, so the window is trivially small. */
  def runningTotal(monthly: DataFrame, part: Seq[Column], order: Column,
                   valueCol: Column): Column =
    sum(valueCol).over(
      Window.partitionBy(part: _*).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** A21: cohort retention — users grouped by their first-activity
    * period, counted per period offset (the "how many of the week-1
    * signups were still active in week N" triangle every growth
    * dashboard carries).
    *
    * `grain` is any date_trunc grain. Offsets are computed per grain
    * family: fixed-length grains ("day", "week") use day-difference /
    * days-per-grain — exact for truncated timestamps and identical
    * across engines (DuckDB's date_diff('week') counts boundary
    * crossings, which agrees only because both sides are truncated;
    * the day arithmetic avoids relying on that). Calendar grains
    * ("month", "quarter", "year") use `months_between`, which is exact
    * on truncated boundaries — day division would mis-bucket almost
    * immediately (Jan→Mar is 59 days in a non-leap year: 59/30 = 1,
    * not the correct offset 2).
    *
    * Scale: the (user, period) activity table is distinct-ed FIRST (one
    * shuffle on the pair, collapsing the raw event volume), the cohort
    * min is a second shuffle on user — and the activity→cohort join
    * then reuses that user partitioning; the final rollup is over
    * |periods|² cells. Event bodies never move — only (user, period)
    * pairs. */
  def cohortRetention(events: DataFrame, userCol: Column, tsCol: Column,
                      grain: String, daysPerGrain: Int = 1): DataFrame = {
    val monthly = events.select(userCol.as("u"), date_trunc(grain, tsCol).as("m")).distinct()
    val cohorts = monthly.groupBy(col("u")).agg(min(col("m")).as("cohort_start"))
    val offset = grain.toLowerCase match {
      case "month" =>
        floor(months_between(col("m"), col("cohort_start"))).cast("int")
      case "quarter" =>
        floor(months_between(col("m"), col("cohort_start")) / 3).cast("int")
      case "year" =>
        floor(months_between(col("m"), col("cohort_start")) / 12).cast("int")
      case _ =>
        (datediff(col("m"), col("cohort_start")) / daysPerGrain).cast("int")
    }
    monthly.join(cohorts, "u")
      .groupBy(col("cohort_start"), offset.as("offset"))
      .agg(countDistinct(col("u")).as("n_active"))
  }
}
