package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("F1: multi-format parse — ISO, bare date, junk, null") {
    val df = Seq("2025-09-11T14:03:22", "2025-09-11", "not-a-date", null)
      .toDF("raw")
      .select(Normalize.parseTsLenient(col("raw")).as("ts"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).contains("2025-09-11 14:03:22.0"))
    assert(got(1).contains("2025-09-11 00:00:00.0"))
    assert(got(2).isEmpty, "junk must parse to NULL, not error")
    assert(got(3).isEmpty, "NULL in => NULL out")
  }

  test("F4: tags to CSV — empty and null arrays become NULL") {
    val df = Seq(
        (1, Seq("a", "b")), (2, Seq.empty[String])
      ).toDF("id", "tags")
      .select(Normalize.tagsToCsv(col("tags")).as("csv"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("a,b"), None))
  }

  test("F5: bool->int cast preserves NULL") {
    val df = Seq[(Int, Option[Boolean])]((1, Some(true)), (2, Some(false)), (3, None))
      .toDF("id", "b").select(Normalize.boolToInt(col("b")).as("i"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq ===
      Seq(Some(1), Some(0), None))
  }

  test("F2: UTC -> America/Mexico_City is -6h in 2024 (no DST)") {
    val df = Seq("2024-06-15 12:00:00").toDF("s")
      .select(Normalize.formatTs(
        Normalize.toBusinessTz(to_timestamp(col("s")), "America/Mexico_City")).as("l"))
    assert(df.head().getString(0) === "2024-06-15 06:00:00")
  }
}
