package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loaders for the harness star schema (TESTDATA.md).
  *
  * Scale note: all loads go through `spark.read.parquet` so Catalyst's
  * `PruneFileSourcePartitions` + parquet min/max data skipping apply
  * unchanged on a partitioned 100 TB layout — callers never hand-route
  * physical tables (the reference routes per-office tables by name,
  * webhook_app.py:37; we replace that with a partition column, see
  * SURVEY.md §2.1 S5).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val allTables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every harness table as a temp view (events through the
    * nanos-aware loader), so the whole surface is queryable via
    * `spark.sql` — with [[graft.functions.GraftFunctions.register]]
    * this gives a reference user a drop-in SQL endpoint. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    allTables.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` varies by harness data generation; normalize every
    * generation to the µs `TimestampType` the rest of the engine
    * (window frames, `unix_micros`, as-of joins) is written against:
    *
    *  - parquet TIMESTAMP(NANOS): Spark cannot map it to µs natively.
    *    Read as long (legacy conf) and convert with exact integer
    *    division — `ts div 1000` truncates ns→µs exactly like DuckDB's
    *    TIMESTAMP_NS→TIMESTAMP cast. (A double-typed division would
    *    corrupt it: epoch-nanos ≈ 1.7e18 > 2^53.)
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ, which `unix_micros` et al reject. The wall-clock
    *    fields ARE the UTC instant, so the instant is computed
    *    arithmetically from the (timezone-free) NTZ fields — NOT via
    *    `cast("timestamp")`, which interprets the wall clock in the
    *    SESSION timezone and silently shifts every instant for a
    *    library caller whose session is not UTC.
    *  - µs-UTC generation: already TimestampType, pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", ntzAsUtcInstant(col("ts")))
      case _ => raw
    }
  }

  /** TIMESTAMP_NTZ whose wall-clock fields denote a UTC instant →
    * TimestampType, independent of `spark.sql.session.timeZone`. Every
    * field extraction on NTZ is timezone-free by definition, so the
    * epoch-micros arithmetic below is deterministic on any session —
    * and exactly equal to `cast("timestamp")` under a UTC session.
    * (`date_part('SECOND')` is DECIMAL(8,6) seconds INCLUDING the
    * sub-second fraction, so ×1e6 completes the sub-minute remainder
    * exactly.) */
  private def ntzAsUtcInstant(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(
      (unix_date(c.cast("date")) * 86400L + hour(c) * 3600L + minute(c) * 60L)
        .cast("long") * 1000000L +
        (date_part(lit("SECOND"), c) * 1000000L).cast("long"))
  /** S2 incremental scan with working predicate pushdown: the range is
    * applied to the RAW int64 nanos column (before the µs conversion),
    * so it reaches the parquet reader as a long comparison and prunes
    * row groups via min/max stats. Filtering the derived timestamp
    * instead would reduce the scan to IsNotNull — a full read at 100 TB. */
  def eventsBetween(s: SparkSession, d: String, startUtc: String, endUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    def ldt(t: String): java.time.LocalDateTime =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
    def nanos(t: String): Long =
      ldt(t).toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= nanos(startUtc) && col("ts") < nanos(endUtc))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Filter with NTZ literals on the RAW column (same type on both
        // sides ⇒ the comparison pushes to the parquet reader and prunes
        // row groups); only then normalize the survivors to TimestampType
        // (session-tz-independent, see ntzAsUtcInstant).
        raw.filter(col("ts") >= lit(ldt(startUtc)) && col("ts") < lit(ldt(endUtc)))
          .withColumn("ts", ntzAsUtcInstant(col("ts")))
      case _ =>
        raw.filter(col("ts") >= to_timestamp(lit(startUtc)) &&
          col("ts") < to_timestamp(lit(endUtc)))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
