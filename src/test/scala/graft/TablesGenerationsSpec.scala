package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Pins [[Tables.events]] / [[Tables.eventsBetween]] across the three
  * harness data generations observed so far:
  *
  *  1. nanos-as-long  — parquet TIMESTAMP(NANOS); under
  *     `spark.sql.legacy.parquet.nanosAsLong` the column surfaces as
  *     LongType (simulated here by writing a raw int64 `ts`, which is
  *     bit-identical to what the legacy conf produces),
  *  2. µs-NTZ         — parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
  *     read as TIMESTAMP_NTZ (the round-7 regeneration that broke every
  *     `unix_micros(ts)` call site at analysis time),
  *  3. µs-UTC         — plain TimestampType.
  *
  * All three must normalize to identical µs TimestampType instants and
  * keep the incremental-scan predicate pushed down to the parquet scan.
  */
class TablesGenerationsSpec extends SparkSpec {
  import spark.implicits._

  // two instants, one inside the [start, end) probe window and one out
  private val insideMicros = 1704103200000000L // 2024-01-01 10:00:00 UTC
  private val outsideMicros = 1706781600000000L // 2024-02-01 10:00:00 UTC

  private def base = Seq(
    (1L, insideMicros, 7L, "signup", 10.0),
    (2L, outsideMicros, 8L, "purchase", 20.0))
    .toDF("event_id", "us", "user_id", "event_type", "value")

  private def writeGen(kind: String): String = {
    val dir = Files.createTempDirectory(s"gen_$kind").toString
    val df = kind match {
      case "nanos" => base.withColumn("ts", col("us") * 1000L)
      case "ntz" => base.withColumn("ts",
        timestamp_micros(col("us")).cast("timestamp_ntz"))
      case "utc" => base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.drop("us").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  for (kind <- Seq("nanos", "ntz", "utc")) {
    test(s"events($kind generation) normalizes ts to µs TimestampType, same instants") {
      val ev = Tables.events(spark, writeGen(kind))
      assert(ev.schema("ts").dataType === TimestampType)
      val got = ev.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> insideMicros, 2L -> outsideMicros))
    }

    test(s"eventsBetween($kind generation) filters to the window and stays pushed down") {
      val dir = writeGen(kind)
      val win = Tables.eventsBetween(spark, dir,
        "2024-01-01 00:00:00", "2024-01-15 00:00:00")
      assert(win.schema("ts").dataType === TimestampType)
      assert(win.select("event_id").as[Long].collect().toSeq === Seq(1L))
      // the range must reach the parquet reader as a data filter on the
      // RAW column (long or NTZ) — not evaluate post-scan on a derived
      // column, which degrades to a full read at 100 TB
      val scans = win.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "")
      }
      assert(scans.exists(p => p.contains("GreaterThanOrEqual(ts") &&
        p.contains("LessThan(ts")), s"no pushed ts range in: $scans")
    }
  }

  test("NTZ normalization is session-timezone-INDEPENDENT") {
    // a library caller with a non-UTC session must read the same
    // instants: the r8 implementation used cast("timestamp"), which
    // interprets NTZ wall fields in the session zone and silently
    // shifted every event by the zone offset
    val dir = writeGen("ntz")
    val tokyo = spark.newSession()
    tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    val got = Tables.events(tokyo, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .collect().toMap
    assert(got === Map(1L -> insideMicros, 2L -> outsideMicros))
    // and the windowed scan agrees across zones too
    val win = Tables.eventsBetween(tokyo, dir,
      "2024-01-01 00:00:00", "2024-01-15 00:00:00")
    assert(win.select("event_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
