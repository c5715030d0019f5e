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

  test("MM: ImageIOCodec decodes REAL PNGs — width/height from pixels, not metadata") {
    // encode genuine PNGs in-test (JDK imageio, no fixtures): the meta
    // envelope deliberately LIES about the dimensions so the assertion
    // can only pass if the pixel buffer was actually decoded
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, "image", png(2, 2), (99, 99, 9)),     // 2x2 despite meta 99x99
      (2L, "image", png(5, 3), (99, 99, 9)),
      (3L, "image", "not an image".getBytes("UTF-8"), (99, 99, 9)))
      .toDF("asset_id", "media_type", "content", "m")
      .select(col("asset_id"), col("media_type"), col("content"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("n_frames")).as("meta"))
    val got = Media.decode(spark, rows, Media.ImageIOCodec)
      .select("asset_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 2, 2, 1)))
    assert(got(1) === ((2L, 5, 3, 1)))
    assert(got(2) === ((3L, -1, -1, 0))) // undecodable -> sentinel, never a throw
  }

  test("MM7: containerDims reads REAL encoder output — byte math vs javax.imageio") {
    // the registered query's oracle pins the parse against the
    // FABRICATED headers; this pins it against PNGs produced by an
    // actual encoder (JDK imageio), so offset/endianness math can't be
    // wrong in a way the fabrication shares. Sizes >255 exercise the
    // multi-byte big-endian path.
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(2, 3)), (2L, png(300, 517)), (3L, png(1, 1)),
      (4L, "GIF89a".getBytes("ISO-8859-1") ++
        Array(0x2C, 0x01, 0x0A, 0x00).map(_.toByte)), // 300 x 10 LE
      (5L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val (w, h) = Media.containerDims(col("content"))
    val got = rows.select(col("asset_id"), w.as("w"), h.as("h"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(2L), Some(3L))))
    assert(got(2L) === ((Some(300L), Some(517L))))
    assert(got(3L) === ((Some(1L), Some(1L))))
    assert(got(4L) === ((Some(300L), Some(10L))), s"GIF LE16: ${got(4L)}")
    assert(got(5L) === ((None, None)), "unparseable container -> NULL dims")
  }

  test("MM8: jpegDims walks REAL encoder output — SOF hunt vs javax.imageio") {
    // the registered query pins the walk against fabricated segment
    // stacks; this pins it against JPEGs produced by an actual encoder
    // (JDK imageio writes APP0 + two DQTs before SOF0 — a genuine
    // variable-length walk, including the FFC4/DHT-is-not-SOF case in
    // progressive streams). Sizes >255 exercise the BE16 pair.
    def jpg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, jpg(2, 3)), (2L, jpg(300, 517)), (3L, jpg(1, 1)),
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val (w, h) = Media.jpegDims(col("content"))
    val got = rows.select(col("asset_id"), w.as("w"), h.as("h"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(2L), Some(3L))), s"got ${got(1L)}")
    assert(got(2L) === ((Some(300L), Some(517L))), s"got ${got(2L)}")
    assert(got(3L) === ((Some(1L), Some(1L))))
    assert(got(4L) === ((None, None)), "non-JPEG bytes -> NULL dims")
  }

  test("MM6: magic sniffing rejects lookalikes the fabricated oracle never shows") {
    def b(s: String) = s.getBytes("ISO-8859-1")
    val rows = Seq(
      (1L, Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 'x').map(_.toByte)),
      (2L, Array(0xFF, 0xD8, 0xFF, 0xDB).map(_.toByte)), // JPEG, non-JFIF marker
      (3L, b("GIF89a-payload")),
      (4L, b("RIFF") ++ b("1234") ++ b("WEBPdata")),
      (5L, b("RIFF") ++ b("1234") ++ b("WAVEdata")), // RIFF but NOT webp
      (6L, Array(0x89, 'P', 'N', 'G').map(_.toByte)), // truncated PNG header
      (7L, Array.empty[Byte]),
      (8L, b("GIF87a-old"))) // 87a variant: not the 89a signature
      .toDF("asset_id", "content")
    val got = rows.select(col("asset_id"), Media.sniffMime(col("content")).as("m"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "image/png")
    assert(got(2L) == "image/jpeg")
    assert(got(3L) == "image/gif")
    assert(got(4L) == "image/webp")
    assert(got(5L) == "application/octet-stream", s"WAV sniffed as ${got(5L)}")
    assert(got(6L) == "application/octet-stream", "truncated header must not match")
    assert(got(7L) == "application/octet-stream")
    assert(got(8L) == "application/octet-stream", "GIF87a is not the 89a signature")
  }

  test("MM9: wavMeta reads REAL encoder output — byte math vs javax.sound.sampled") {
    // the registered query pins the parse against fabricated headers;
    // this pins it against WAVs produced by the JDK's own audio writer
    // (canonical 44-byte RIFF/WAVE/fmt/data layout), so the
    // little-endian offset math can't be wrong in a way the
    // fabrication shares. Rates >65535 exercise the full LE32 path.
    def wav(sr: Float, bits: Int, ch: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sr, bits, ch, true, false)
      val data = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wav(44100f, 16, 2, 4410)),   // 100 ms stereo CD audio
      (2L, wav(96000f, 16, 1, 96000)),  // 1 s high-rate mono (LE32 > 2^16)
      (3L, wav(8000f, 8, 1, 123)),
      (4L, "RIFF1234WEBPVP8 ".getBytes("ISO-8859-1")), // RIFF, not audio
      (5L, "not audio".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val got = rows.select(col("asset_id") +: Media.wavMeta(col("content")): _*)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, Some(2L), Some(44100L), Some(16L),
      Some(4410L * 4), Some(100L))), s"got ${got(1L)}")
    assert(got(2L) === ((2L, Some(1L), Some(96000L), Some(16L),
      Some(96000L * 2), Some(1000L))), s"got ${got(2L)}")
    assert(got(3L) === ((3L, Some(1L), Some(8000L), Some(8L),
      Some(123L), Some(15L))), s"got ${got(3L)}") // 123*1000 div 8000 = 15
    assert(got(4L)._2.isEmpty && got(4L)._6.isEmpty,
      "RIFF/WEBP must parse to NULLs — RIFF magic alone is not audio")
    assert(got(5L)._2.isEmpty, "non-RIFF bytes -> NULLs")
  }

  test("MM10: exifOrientation walks layouts the fabrication never shows") {
    // hand-built EXIF blobs: orientation mid-table, counts beyond the
    // walk cap, and corrupt TIFF magic — the registered query's
    // fabrication always writes a 2-entry IFD with orientation first,
    // so these are the cases only this spec pins.
    def u2(v: Int, le: Boolean) =
      if (le) Array((v & 0xFF).toByte, (v >> 8).toByte)
      else Array((v >> 8).toByte, (v & 0xFF).toByte)
    def u4(v: Int, le: Boolean) =
      if (le) Array(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, v >>> 24).map(_.toByte)
      else Array(v >>> 24, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF).map(_.toByte)
    def entry(tag: Int, value: Int, le: Boolean): Array[Byte] =
      u2(tag, le) ++ u2(3, le) ++ u4(1, le) ++ u2(value, le) ++ u2(0, le)
    def exif(le: Boolean, entries: Seq[(Int, Int)], magic: Int = 42): Array[Byte] = {
      val tiff = (if (le) "II" else "MM").getBytes("ISO-8859-1") ++
        u2(magic, le) ++ u4(8, le) ++ u2(entries.length, le) ++
        entries.flatMap { case (t, v) => entry(t, v, le) } ++ u4(0, le)
      Array(0xFF, 0xD8, 0xFF, 0xE1).map(_.toByte) ++
        u2(2 + 6 + tiff.length, le = false) ++
        "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ tiff
    }
    val rows = Seq(
      // orientation mid-table among 5 entries, both byte orders
      (1L, exif(le = true, Seq(0x0100 -> 640, 0x0101 -> 480, 0x0112 -> 6,
        0x011A -> 72, 0x011B -> 72))),
      (2L, exif(le = false, Seq(0x0100 -> 640, 0x0101 -> 480, 0x0112 -> 8,
        0x011A -> 72, 0x011B -> 72))),
      // no orientation tag at all -> NULL orientation, entries still read
      (3L, exif(le = true, Seq(0x0100 -> 640, 0x011A -> 72))),
      // orientation past the 8-entry walk cap -> honestly NULL
      (4L, exif(le = false,
        (0x0100 to 0x0108).map(t => t -> 1) :+ (0x0112 -> 3))),
      // corrupt TIFF magic (43) -> full NULL parse
      (5L, exif(le = true, Seq(0x0112 -> 1), magic = 43)),
      (6L, "not an image".getBytes("UTF-8")),
      // crafted IFD offset 0x80000000: wraps negative through toInt —
      // crashed the native walk with ArrayIndexOutOfBounds before the
      // upper-bound guard; must parse to NULLs, not throw
      (7L, Array(0xFF, 0xD8, 0xFF, 0xE1).map(_.toByte) ++
        Array[Byte](0, 30) ++ "Exif".getBytes("ISO-8859-1") ++
        Array[Byte](0, 0) ++ "II".getBytes("ISO-8859-1") ++
        Array[Byte](42, 0) ++ Array(0x00, 0x00, 0x00, 0x80).map(_.toByte) ++
        Array.fill[Byte](16)(0)))
      .toDF("asset_id", "content")
    val got = rows
      .select(col("asset_id") +: Media.exifOrientation(col("content")): _*)
      .as[(Long, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, Some("II"), Some(5L), Some(6L))), s"got ${got(1L)}")
    assert(got(2L) === ((2L, Some("MM"), Some(5L), Some(8L))), s"got ${got(2L)}")
    assert(got(3L) === ((3L, Some("II"), Some(2L), None)), s"got ${got(3L)}")
    assert(got(4L) === ((4L, Some("MM"), Some(10L), None)),
      s"beyond-cap orientation must be NULL, not misread: ${got(4L)}")
    assert(got(5L)._2.isEmpty, "TIFF magic != 42 must gate the whole parse")
    assert(got(6L)._2.isEmpty, "non-JPEG bytes -> NULLs")
    assert(got(7L) === ((7L, None, None, None)),
      s"out-of-range IFD offset must NULL, never wrap/crash: ${got(7L)}")
    // native packed walk ≡ the composed-Column formulation it replaced
    // on WELL-FORMED layouts (rows 1-6; the crafted offset row 7 is
    // native-only: the Column form leaves byte_order set where the
    // native walk judges the whole TIFF unreadable)
    val composed = rows.filter(col("asset_id") <= 6)
      .select(col("asset_id") +:
        Media.exifOrientationColumns(col("content")): _*)
      .as[(Long, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(composed === got.filter(_._1 <= 6),
      "ExifOrientationPacked must equal the Column form")
  }

  test("MM12: srtMeta hand-built cues — strict field gates, hour-scale times") {
    // layouts the fabrication never writes: hour-scale timestamps,
    // invalid SECONDS (not just minutes), end-field violations, a cue
    // index other than 1, and a truncated timing line
    def srt(a: String, b: String) = s"1\n$a --> $b\nhello".getBytes("UTF-8")
    val rows = Seq(
      (1L, srt("01:02:03,004", "01:02:04,500")),  // hour-scale
      (2L, srt("00:00:00,000", "99:59:59,999")),  // max fields
      (3L, srt("00:61:00,000", "00:00:01,000")),  // bad start MM
      (4L, srt("00:00:61,000", "00:00:62,000")),  // bad SS both sides
      (5L, srt("00:00:01,000", "00:77:00,000")),  // bad end MM
      (6L, "2\n00:00:01,000 --> 00:00:02,000\nx".getBytes("UTF-8")), // index 2
      (7L, "1\n00:00:01,000 --> ".getBytes("UTF-8")),                // truncated
      (8L, "just text".getBytes("UTF-8")),
      (9L, srt("00:00:05,000", "00:00:01,000")))  // end < start: reject
      .toDF("asset_id", "content")
    val got = rows.select(col("asset_id") +: Media.srtMeta(col("content")): _*)
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, Some(3723004L), Some(3724500L), Some(1496L))),
      s"got ${got(1L)}")
    assert(got(2L) === ((2L, Some(0L), Some(359999999L), Some(359999999L))),
      s"got ${got(2L)}")
    for (i <- 3L to 8L)
      assert(got(i)._2.isEmpty, s"row $i must reject to NULLs: ${got(i)}")
    assert(got(9L)._2.isEmpty,
      s"end-before-start cue must reject, never a negative dur_ms: ${got(9L)}")
  }

  test("MM13: bmpBytes → ImageIO round trip — per-pixel channels, orientation, padding") {
    // the registered queries pin aggregate checksums; this pins the
    // INDIVIDUAL pixels: ImageIO.getRGB at image coordinates must
    // equal the closed-form channel arithmetic — a BGR/RGB swap or a
    // bottom-up flip in the encoder fails here pixel-by-pixel. id=6
    // gives w=10 (rowSize 32, 2 pad bytes/row), covering the padded
    // path; id=0 gives w=4 (no padding).
    for (id <- Seq(0L, 6L)) {
      val w = (id % 48 + 4).toInt
      val h = (id % 32 + 4).toInt
      val bytes = Media.bmpBytes(id, w, h)
      assert(bytes.length === 54 + h * ((w * 3 + 3) / 4 * 4))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img !== null, s"JDK BMP reader must accept bmpBytes(id=$id)")
      assert(img.getWidth === w)
      assert(img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) === ((x * 5L + y * 17L + id * 3L) % 256L).toInt,
          s"R at ($x,$y) id=$id")
        assert(((rgb >> 8) & 0xFF) === ((x * 11L + y * 3L + id * 5L) % 256L).toInt,
          s"G at ($x,$y) id=$id")
        assert((rgb & 0xFF) === ((x * 7L + y * 13L + id) % 256L).toInt,
          s"B at ($x,$y) id=$id")
      }
    }
  }

  test("MM13: imagePixelStats dead-letters undecodable bytes, never throws") {
    val valid = Media.bmpBytes(3L, 7, 5)
    val corrupt = valid.clone(); corrupt(0) = 'X'.toByte
    val truncated = valid.take(60) // header intact, pixel array cut
    val rows = Seq((1L, valid), (2L, corrupt), (3L, "not an image".getBytes("UTF-8")),
        (4L, truncated), (5L, Array.empty[Byte]))
      .toDF("asset_id", "content")
    val got = Media.imagePixelStats(spark, rows)
      .as[(Long, Int, Int, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === 7)
    assert(got(1L)._3 === 5)
    assert(got(1L)._4.nonEmpty && got(1L)._5.nonEmpty)
    for (i <- Seq(2L, 3L, 5L))
      assert(got(i) === ((i, -1, -1, None, None)),
        s"undecodable bytes must dead-letter: ${got(i)}")
    // the JDK BMP reader may either reject a truncated pixel array or
    // decode the header dims with zeroed tail pixels — both are total;
    // what it must NEVER do is throw out of the operator
    assert(got.contains(4L))
  }

  test("MM13: decode bomb — a header declaring 60000x60000 dead-letters before allocation") {
    // a classic decompression bomb: 54 valid header bytes declaring
    // ~3.6 gigapixels (~14 GB ARGB). Reading it through plain
    // ImageIO.read raises OutOfMemoryError, which no `catch Exception`
    // sees; readImageBounded's header-first dim gate must reject it to
    // the dead-letter row without allocating a pixel buffer.
    val bomb = Media.bmpBytes(0L, 4, 4).take(54)
    val b = java.nio.ByteBuffer.wrap(bomb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(18, 60000) // biWidth
    b.putInt(22, 60000) // biHeight
    val got = Media.imagePixelStats(spark,
        Seq((1L, bomb)).toDF("asset_id", "content"))
      .as[(Long, Int, Int, Option[Long], Option[Long])].collect()
    assert(got.toSeq === Seq((1L, -1, -1, None, None)))
    // and through the codec boundary too (same shared reader)
    val dec = Media.decode(spark,
        Seq((1L, bomb)).toDF("asset_id", "content")
          .select(col("asset_id"), col("content"),
            struct(lit(0).as("width"), lit(0).as("height"),
              lit(0).as("n_frames")).as("meta")),
        Media.ImageIOCodec)
      .select("asset_id", "width", "height", "n_frames").as[(Long, Int, Int, Int)]
      .collect()
    assert(dec.toSeq === Seq((1L, -1, -1, 0)))
  }

  test("MM14: audioSampleStats — hand-replayed stats, strict format + truncation gates") {
    // id=0, n=25: replay the closed-form samples in the test and
    // compare against the full pcmBytes → AudioSystem → native-walk
    // loop (the JDK's WAV reader is the independent implementation)
    val id = 0L
    val n = 25
    val samples = (0 until n).map(k => ((id * 11 + k * 37) % 65536) - 32768)
    val expPeak = samples.map(math.abs).max
    val expMean = 1000L * samples.map(s => math.abs(s)).sum / n
    val expClip = 1000L * samples.count(s => math.abs(s) >= 30000) / n
    val valid = Media.pcmBytes(id, n, 8000)
    // an 8-bit PCM WAV: a well-formed container the strict 16-bit walk
    // must REJECT on the bits gate (averaging 8-bit bytes as 16-bit LE
    // would be silently wrong), not mis-decode
    val eightBit = {
      val b = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + 4)
        .put("WAVE".getBytes("ISO-8859-1"))
        .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
        .put("data".getBytes("ISO-8859-1")).putInt(4)
        .put(Array[Byte](1, 2, 3, 4))
      b.array()
    }
    val rows = Seq(
      (1L, valid),
      (2L, valid.take(44 + n)),                  // truncated payload
      (3L, "definitely not audio".getBytes("UTF-8")),
      (4L, eightBit),
      (5L, Array.empty[Byte]))
      .toDF("asset_id", "content")
    val got = Media.audioSampleStats(spark, rows)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, n.toLong, Some(expPeak.toLong), Some(expMean),
      Some(expClip))), s"got ${got(1L)}")
    for (i <- 2L to 5L)
      assert(got(i) === ((i, -1L, None, None, None)),
        s"row $i must dead-letter: ${got(i)}")
  }

  test("MM11: id3Meta hand-built headers — strict syncsafe, version gates") {
    // the registered query pins the fabricated classes; this pins
    // layouts the fabrication never writes: max syncsafe size, a high
    // bit set in EACH of the four size positions, out-of-range major
    // versions, and a printable-text blob that starts with "ID3".
    def id3(ver: Int, rev: Int, flags: Int, sz: Array[Byte]): Array[Byte] =
      "ID3".getBytes("ISO-8859-1") ++
        Array(ver.toByte, rev.toByte, flags.toByte) ++ sz
    val rows = Seq(
      (1L, id3(4, 0, 0x80, Array[Byte](0x7F, 0x7F, 0x7F, 0x7F))), // max size
      (2L, id3(2, 0, 0, Array[Byte](0, 0, 2, 1))),                // v2.2, 257
      (3L, id3(3, 0, 0, Array[Byte](0x80.toByte, 0, 0, 0))),      // hi bit, pos 1
      (4L, id3(3, 0, 0, Array[Byte](0, 0x81.toByte, 0, 0))),      // hi bit, pos 2
      (5L, id3(3, 0, 0, Array[Byte](0, 0, 0, 0xFF.toByte))),      // hi bit, pos 4
      (6L, id3(5, 0, 0, Array[Byte](0, 0, 0, 1))),                // major 5: reject
      (7L, id3(3, 0xFF, 0, Array[Byte](0, 0, 0, 1))),             // rev $FF: reject
      (8L, "ID3 is a tag format".getBytes("UTF-8")),              // text: reject
      (9L, "ID3".getBytes("ISO-8859-1")))                         // truncated
      .toDF("asset_id", "content")
    val got = rows.select(col("asset_id") +: Media.id3Meta(col("content")): _*)
      .as[(Long, Option[Long], Option[Int], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, Some(4L), Some(1), Some(268435455L),
      Some(268435465L))), s"got ${got(1L)}")
    assert(got(2L) === ((2L, Some(2L), Some(0), Some(257L), Some(267L))),
      s"got ${got(2L)}")
    for (i <- 3L to 5L)
      assert(got(i)._2.isEmpty,
        s"syncsafe-forbidden high bit at any position must reject: ${got(i)}")
    assert(got(6L)._2.isEmpty, "major version 5 must reject")
    assert(got(7L)._2.isEmpty, "revision $FF must reject")
    assert(got(8L)._2.isEmpty,
      "printable text starting with 'ID3' must reject on the version gate")
    assert(got(9L)._2.isEmpty, "truncated header must reject, not throw")
  }
}
