package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Media

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Media.asAssets(Tables.documents(spark, sfDir))

  test("MM: asset schema carries binary content + typed metadata") {
    val sch = assets.schema
    assert(sch("content").dataType.typeName === "binary")
    assert(sch("meta").dataType.typeName === "struct")
  }

  test("MM: decode stub runs per-partition and checksums match md5 of content") {
    val decoded = Media.decodeStub(spark, assets.limit(10))
    val viaSql = assets.limit(10)
      .select(col("asset_id"), md5(col("content")).as("c")).as[(Long, String)].collect().toMap
    val got = decoded.select("asset_id", "checksum").as[(Long, String)].collect().toMap
    assert(got === viaSql)
    assert(decoded.columns.toSet ===
      Set("asset_id", "width", "height", "n_frames", "n_bytes", "checksum"))
  }

  test("MM: frame sampling takes every step-th element") {
    val df = Seq((1L, Seq("f0", "f1", "f2", "f3", "f4", "f5"))).toDF("id", "frames")
    val got = df.select(Media.sampleFrames(col("frames"), 3).as("s"))
      .head().getSeq[String](0)
    assert(got === Seq("f0", "f3"))
  }
}
