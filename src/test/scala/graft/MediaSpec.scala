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

  test("MM: codec boundary is pluggable — a custom codec swaps in without schema changes") {
    // a "decoder" that reports constant dimensions and a fake digest —
    // stands in for a real TwelveMonkeys/JavaCV implementation
    object FakePixelCodec extends Media.MediaCodec {
      def open(): Media.MediaCodec.Session = new Media.MediaCodec.Session {
        def decode(id: Long, bytes: Array[Byte], w: Int, h: Int, f: Int): Media.Decoded =
          Media.Decoded(id, 2 * w, 2 * h, f, bytes.length, s"decoded-$id")
      }
    }
    val ten = assets.limit(10)
    val got = Media.decode(spark, ten, FakePixelCodec)
    assert(got.columns.toSet ===
      Set("asset_id", "width", "height", "n_frames", "n_bytes", "checksum"))
    val metaW = ten.select(col("asset_id"), col("meta.width")).as[(Long, Int)].collect().toMap
    got.select("asset_id", "width", "checksum").as[(Long, Int, String)].collect()
      .foreach { case (id, w, ck) =>
        assert(w === 2 * metaW(id) && ck === s"decoded-$id")
      }
  }

  test("MM: frame sampling takes every step-th element") {
    val df = Seq((1L, Seq("f0", "f1", "f2", "f3", "f4", "f5"))).toDF("id", "frames")
    val got = df.select(Media.sampleFrames(col("frames"), 3).as("s"))
      .head().getSeq[String](0)
    assert(got === Seq("f0", "f3"))
  }
}
