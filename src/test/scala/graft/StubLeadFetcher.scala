package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.rest.PageFetcher

/** Deterministic stand-in for the CRM's paged REST endpoint (no network
  * in-sandbox): 237 leads served in `limit/offset` windows. Top-level
  * class with a no-arg constructor — instantiated by reflection on
  * executors (see PageFetcher's contract). */
final class StubLeadFetcher extends PageFetcher {
  private val total = 237L

  override val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType),
    StructField("amount", DoubleType),
    StructField("updated_at", StringType)))

  override def count(): Long = total

  override def fetch(offset: Long, limit: Int): Iterator[Row] =
    (offset until math.min(offset + limit, total)).iterator.map(i =>
      Row(i, s"lead-$i", i * 10.0, "2025-09-11T14:03:22"))
}
