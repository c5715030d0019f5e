package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-batch decode / feature-extract
  * operators.
  *
  * The Spark-side plumbing (schema, partition-friendly batch shape,
  * deterministic metadata derivation) is real and tested; the actual
  * codec step is STUBBED with a deterministic fake ([[decodeStub]])
  * because no image/audio libraries ship in this environment — swap the
  * body of `decodeStub` for a real decoder (e.g. TwelveMonkeys/JavaCV)
  * without touching any schema or operator.
  *
  * Scale notes: decode runs via `mapPartitions` so codec state
  * initializes once per partition (not per row), and content bytes stay
  * columnar (parquet binary) end-to-end — no driver round-trips. Wide
  * binary payloads should be size-bucketed (`spark.sql.files.
  * maxPartitionBytes`) so a partition of 100 MB blobs still fits in
  * executor memory.
  */
object Media {

  /** A media asset row: opaque bytes + envelope metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Wrap the harness `documents` table as fake media assets: utf-8
    * bytes as content, deterministic metadata. This is the columnar
    * shape a real ingest (S3 binary files → parquet) would produce. */
  def asAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("video")).as("media_type"),
      col("text").cast("binary").as("content"),
      struct(
        (pmod(col("doc_id") * 37, lit(624)) + 16).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(464)) + 16).cast("int").as("height"),
        (expr("n_chars div 100") + 1).cast("int").as("n_frames")).as("meta"))

  /** One decoded asset's features — the row type every [[MediaCodec]]
    * produces (top-level so the Dataset Encoder stays codegen'd). */
  case class Decoded(asset_id: Long, width: Int, height: Int,
      n_frames: Int, n_bytes: Int, checksum: String)

  /** The codec boundary: a serializable factory whose [[MediaCodec.Session]]
    * holds per-PARTITION decoder state (native contexts, buffers) —
    * `open()` runs once per partition inside `mapPartitions`, never per
    * row. A real deployment implements this with TwelveMonkeys/JavaCV
    * and plugs it into [[decode]]; nothing else in the pipeline —
    * schema, batch shape, partitioning — changes. */
  trait MediaCodec extends Serializable {
    def open(): MediaCodec.Session
  }
  object MediaCodec {
    trait Session {
      def decode(assetId: Long, bytes: Array[Byte],
          width: Int, height: Int, nFrames: Int): Decoded
      def close(): Unit = ()
    }
  }

  /** Deterministic fake codec — byte-level features only (length + MD5
    * digest), standing in for pixel/sample decode in an environment
    * with no media libraries. The Session allocates its MessageDigest
    * once per partition, exactly where a real codec would open its
    * native context. */
  object StubCodec extends MediaCodec {
    def open(): MediaCodec.Session = new MediaCodec.Session {
      private val md = java.security.MessageDigest.getInstance("MD5")
      def decode(id: Long, bytes: Array[Byte], w: Int, h: Int, f: Int): Decoded = {
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        Decoded(id, w, h, f, bytes.length, digest)
      }
    }
  }

  /** REAL image decode through the JDK's own `javax.imageio` (PNG, GIF,
    * BMP, JPEG — no external libraries): width/height come from the
    * decoded pixel buffer, not the metadata envelope, so a lying `meta`
    * column is corrected at decode time (the reason a real pipeline
    * decodes at all). Bytes that no registered reader accepts yield the
    * documented sentinel `(width, height, n_frames) = (-1, -1, 0)` —
    * the caller routes those to dead-letter exactly like a malformed
    * webhook body; decode never throws on bad content. [[StubCodec]]
    * remains the determinism-sensitive oracle path (mm-family queries
    * hash byte-level features only); this is the swap-in the interface
    * was built for, exercised by MediaSpec on in-test-encoded PNGs. */
  /** The ONE ImageIO entry point both [[ImageIOCodec]] and
    * [[imagePixelStats]] decode through (the codec boundary's "single
    * swap-in" promise, kept for the pixel path too): header-first dim
    * read, then a DECODE-BOMB GUARD — a 54-byte BMP can declare
    * 65535×65535 and make the reader allocate ~17 GB before touching
    * pixel data, which surfaces as OutOfMemoryError no `catch
    * Exception` sees. Dims beyond `maxPixels` (default 2²⁶ ≈ 67 MP —
    * generous for real media, 3 orders below the bomb) reject to the
    * dead-letter null BEFORE any pixel allocation, and a second,
    * depth-aware bound rejects images whose declared bits-per-pixel
    * would blow the byte ceiling (maxPixels×4 B) even under the pixel
    * cap — e.g. a 67 MP 16-bit RGBA PNG. NonFatal parse failures also
    * return null; decode never throws. */
  private[multimodal] def readImageBounded(bytes: Array[Byte],
      maxPixels: Long = 1L << 26): java.awt.image.BufferedImage = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) null
            else {
              // depth-aware half of the guard (r16 ADVICE): the pixel
              // cap alone assumes ≤32bpp — a declared 16-bit RGBA
              // (64bpp) image under the pixel cap would still make
              // ImageIO allocate 2× the intended ceiling. Read the
              // reader's declared bits-per-pixel from its first
              // ImageTypeSpecifier and bound the BYTE count at
              // maxPixels×4 (the 32bpp assumption, made explicit).
              // Readers that can't say (no type specifier) pass — they
              // are bounded by the pixel cap like before.
              val bpp: Long =
                try {
                  val types = r.getImageTypes(0)
                  if (types != null && types.hasNext)
                    math.max(1, types.next().getColorModel.getPixelSize).toLong
                  else 32L
                } catch { case scala.util.control.NonFatal(_) => 32L }
              if (w * h * ((bpp + 7L) / 8L) > maxPixels * 4L) null
              else r.read(0)
            }
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  object ImageIOCodec extends MediaCodec {
    def open(): MediaCodec.Session = new MediaCodec.Session {
      // default ImageIO.read(InputStream) wraps the stream in a
      // FileCacheImageInputStream — one temp-file create/write/delete
      // per blob, disk I/O inside the per-partition hot loop. Inputs
      // are already in-memory byte arrays; decode fully in memory.
      javax.imageio.ImageIO.setUseCache(false)
      private val md = java.security.MessageDigest.getInstance("MD5")
      def decode(id: Long, bytes: Array[Byte], w0: Int, h0: Int, f0: Int): Decoded = {
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        val img = readImageBounded(bytes)
        if (img == null) Decoded(id, -1, -1, 0, bytes.length, digest)
        else Decoded(id, img.getWidth, img.getHeight, 1, bytes.length, digest)
      }
    }
  }

  /** Decode-bound stages must not inherit an under-split scan: a
    * corpus that arrives as one fat parquet row group gives the
    * per-row codec ONE partition and serializes every core but one
    * (measured: mm14 at the 10× replica ran ~15 s on 1 split vs ~1 s
    * spread). Repartition to cores only when under-split — at real
    * scale the scan already has thousands of splits and this is a
    * no-op costing nothing. */
  private def spreadForDecode[T](spark: SparkSession,
      ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val cores = spark.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < cores) ds.repartition(cores) else ds
  }

  /** Decode / feature-extract over binary content through a pluggable
    * [[MediaCodec]]: one `open()` per partition, `close()` when the
    * partition drains. */
  def decode(spark: SparkSession, assets: DataFrame,
      codec: MediaCodec = StubCodec): DataFrame = {
    import spark.implicits._
    val flat = spreadForDecode(spark, assets.select(col("asset_id"), col("content"),
        col("meta.width"), col("meta.height"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Int, Int, Int)])
    flat.mapPartitions { it =>
      val session = codec.open()
      new Iterator[Decoded] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) session.close()
          h
        }
        def next(): Decoded = {
          val (id, bytes, w, h, f) = it.next()
          session.decode(id, bytes, w, h, f)
        }
      }
    }.toDF()
  }

  /** Back-compat alias for [[decode]] with the stub codec. */
  def decodeStub(spark: SparkSession, assets: DataFrame): DataFrame =
    decode(spark, assets, StubCodec)

  // ---- MM13: real pixel decode through javax.imageio -----------------------

  /** Deterministic 24-bit BI_RGB BMP bytes for asset `id` at `w`×`h`:
    * the spec-exact 54-byte header (BITMAPFILEHEADER +
    * BITMAPINFOHEADER) followed by the bottom-up, 4-byte-row-padded
    * pixel array. Pixel channels are arithmetic in IMAGE coordinates
    * (x right, y DOWN from the top-left — the encoder flips to the
    * BMP's bottom-up row order), so an independent decoder's output
    * has a closed-form ground truth the oracle states without touching
    * bytes:
    *   R = (5x + 17y + 3·id) mod 256
    *   G = (11x + 3y + 5·id) mod 256
    *   B = (7x + 13y + id) mod 256
    * Hand-written on purpose: `ImageIO.write` would make mm13 a
    * JDK-internal round trip; this encoder vs the JDK's BMP reader is
    * a cross-implementation check (a misplaced header field or a
    * flipped row order breaks the oracle, not just a unit test). */
  def bmpBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + h * rowSize
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(h * rowSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      val y = h - 1 - r // positive biHeight = bottom-up row order
      var x = 0
      while (x < w) {
        b.put(((x * 7L + y * 13L + id) % 256L).toByte)      // B
        b.put(((x * 11L + y * 3L + id * 5L) % 256L).toByte) // G
        b.put(((x * 5L + y * 17L + id * 3L) % 256L).toByte) // R
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      r += 1
    }
    b.array()
  }

  /** MM13 fabrication: one third of the corpus gets a valid
    * deterministic BMP ([[bmpBytes]], w = id%48+4, h = id%32+4); one
    * third the SAME bytes with the magic's first byte corrupted — no
    * registered ImageIO reader claims it, so decode must route it to
    * the (-1,-1,0) dead-letter sentinel, never throw; one third raw
    * text (not an image at all). Ground truth is arithmetic in the
    * ids (the mm7–mm12 recipe). Fabrication runs distributed in the
    * same typed map a binary-files ingest would. */
  def bmpAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val content: Array[Byte] = (id % 3) match {
          case 2 => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case m =>
            val bytes = bmpBytes(id, (id % 48 + 4).toInt, (id % 32 + 4).toInt)
            if (m == 1) bytes(0) = 'X'.toByte
            bytes
        }
        (id, content)
      }.toDF("asset_id", "content")
  }

  /** One image's pixel statistics (the feature-extraction step after
    * decode). For undecodable bytes: (-1, -1, NULL, NULL). */
  case class PixelStats(asset_id: Long, width: Int, height: Int,
      px_sum: Option[Long], px_wsum: Option[Long])

  /** MM13: REAL pixel statistics through `javax.imageio` — not a
    * header read: every pixel of the decoded buffer contributes, so
    * the oracle match proves the full encode→decode loop agrees with
    * the BMP spec.
    *   px_sum  = Σ (R+G+B)                    — decode proof
    *   px_wsum = Σ (y·w + x + 1)·(3R+5G+7B)   — position weight
    *              catches a flipped row order (plain sums are
    *              orientation-invariant), channel weights catch a
    *              BGR/RGB swap (R+G+B is channel-order-invariant)
    * Bounds: w ≤ 51, h ≤ 35 → ≤ 1785 px; per-pixel weighted term
    * ≤ 1785·5355 ≈ 9.6e6, total ≤ 1.7e10 — Long-safe by 8 orders.
    * `mapPartitions` so ImageIO cache config runs once per partition;
    * blob bytes stay columnar, nothing collects. Undecodable bytes
    * yield the dead-letter row, never an exception (fuzz-pinned). */
  def imagePixelStats(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    spreadForDecode(spark, assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])])
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = readImageBounded(bytes)
          if (img == null) PixelStats(id, -1, -1, None, None)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var s = 0L
            var ws = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xFF
                val g = (rgb >> 8) & 0xFF
                val bb = rgb & 0xFF
                s += r + g + bb
                ws += (y.toLong * w + x + 1) * (3L * r + 5L * g + 7L * bb)
                x += 1
              }
              y += 1
            }
            PixelStats(id, w, h, Some(s), Some(ws))
          }
        }
      }.toDF()
  }

  // ---- MM14: real audio sample decode through javax.sound.sampled ---------

  /** Deterministic canonical 44-byte 16-bit mono PCM WAV for asset
    * `id` with `n` samples at rate `sr`. Sample k (k ∈ [0, n)) is
    * closed-form — s_k = ((11·id + 37·k) mod 65536) − 32768 — so the
    * decoded stream has an arithmetic ground truth the oracle replays
    * in SQL without touching bytes. */
  def pcmBytes(id: Long, n: Int, sr: Int): Array[Byte] = {
    val dataSize = n * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataSize)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1).putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
      .put("data".getBytes("ISO-8859-1")).putInt(dataSize)
    var k = 0
    while (k < n) {
      b.putShort((((id * 11L + k * 37L) % 65536L) - 32768L).toShort)
      k += 1
    }
    b.array()
  }

  /** MM14 fabrication: one third of the corpus gets a valid
    * deterministic PCM WAV ([[pcmBytes]], n = id%1000+25 samples, the
    * mm9 sample rates); one third the SAME file TRUNCATED halfway into
    * the sample array — the header still declares the full dataSize,
    * the shape a interrupted S3 transfer lands as, which the decoder
    * must dead-letter rather than average over garbage; one third raw
    * text. Ground truth is arithmetic in the ids. */
  def pcmAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val content: Array[Byte] = (id % 3) match {
          case 2 => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case m =>
            val n = (id % 1000 + 25).toInt
            val sr = (id % 4) match {
              case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
            }
            val bytes = pcmBytes(id, n, sr)
            if (m == 1) bytes.take(44 + n) else bytes // half the samples
        }
        (id, content)
      }.toDF("asset_id", "content")
  }

  /** One audio asset's exact-integer sample statistics. Dead-letter
    * (unparseable container, unsupported format, truncated payload):
    * n_samples = -1, stats NULL. */
  case class AudioStats(asset_id: Long, n_samples: Long, peak: Option[Long],
      mean_abs_milli: Option[Long], clip_milli: Option[Long])

  /** MM14: audio sample decode — a STRICT native RIFF/WAVE chunk walk
    * (the binary twin of mm9's [[wavMeta]] Column walk, extended past
    * the header into the sample array; `javax.sound.sampled` was
    * A/B'd and rejected: under Spark's executor classloader its
    * per-call service-provider lookup costs ~5 ms/blob — 145 s for
    * 500k blobs where this walk takes ~2 s), then 16-bit little-endian
    * samples in EXACT integer arithmetic:
    *   n_samples      — decoded sample count
    *   peak           — max |s|
    *   mean_abs_milli — (1000·Σ|s|) div n  (truncating div, both engines)
    *   clip_milli     — per-mille of samples with |s| ≥ 30000 (the
    *                    near-full-scale threshold a loudness-QA /
    *                    re-recording filter keys on)
    * STRICT gates: only format-1 PCM 16-bit is walked (averaging µ-law
    * or 8-bit bytes as 16-bit LE would be silently wrong), and a
    * payload shorter than the declared data size dead-letters rather
    * than computing stats over a partial stream (an interrupted
    * transfer keeps its full-size header — declared-vs-available is
    * the reliable truncation signal). Every read is bounds-checked;
    * arbitrary bytes never throw (fuzz-pinned). */
  def audioSampleStats(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    spreadForDecode(spark, assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val dead = AudioStats(id, -1L, None, None, None)
          def ascii(p: Int, s: String): Boolean =
            p + s.length <= bytes.length &&
              s.indices.forall(i => bytes(p + i) == s.charAt(i).toByte)
          def le16(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
          def le32(p: Int): Long =
            (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
              ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
          if (!ascii(0, "RIFF") || bytes.length < 12 || !ascii(8, "WAVE")) dead
          else {
            // chunk walk: find "fmt " and "data" (any order, extra
            // chunks skipped — the general RIFF layout, not just the
            // canonical 44-byte one)
            var p = 12
            var fmtAt = -1
            var dataAt = -1
            var dataSize = -1L
            while (p + 8 <= bytes.length && (fmtAt < 0 || dataAt < 0)) {
              val sz = le32(p + 4)
              if (ascii(p, "fmt ") && fmtAt < 0 && sz >= 16 &&
                p + 8 + 16 <= bytes.length) fmtAt = p + 8
              else if (ascii(p, "data") && dataAt < 0) { dataAt = p + 8; dataSize = sz }
              // chunks are word-aligned (odd sizes carry a pad byte)
              val step = 8L + sz + (sz % 2)
              if (step <= 0 || p + step > Int.MaxValue) p = bytes.length
              else p += step.toInt
            }
            if (fmtAt < 0 || dataAt < 0 || dataSize < 0) dead
            else {
              val audioFormat = le16(fmtAt)
              val bits = le16(fmtAt + 14)
              val avail = math.max(0, bytes.length - dataAt)
              if (audioFormat != 1 || bits != 16) dead        // strict: PCM 16-bit only
              else if (avail < dataSize || dataSize < 2) dead // truncated payload
              else {
                val n = (dataSize / 2).toInt
                var sumAbs = 0L
                var peak = 0L
                var clip = 0L
                var k = 0
                while (k < n) {
                  // LE 16-bit: low byte unsigned, high byte carries sign
                  val s = (bytes(dataAt + 2 * k) & 0xFF) |
                    (bytes(dataAt + 2 * k + 1).toInt << 8)
                  val a = math.abs(s.toLong)
                  sumAbs += a
                  if (a > peak) peak = a
                  if (a >= 30000L) clip += 1L
                  k += 1
                }
                AudioStats(id, n.toLong, Some(peak),
                  Some(1000L * sumAbs / n), Some(1000L * clip / n))
              }
            }
          }
        }
      }.toDF()
  }

  /** Frame sampling: every `step`-th frame of a frame array — the
    * video-pipeline "1 fps sample" pattern, as a pure array op. */
  def sampleFrames(frames: org.apache.spark.sql.Column, step: Int): org.apache.spark.sql.Column =
    filter(frames, (_, i) => i % step === 0)

  /** Fixed-size byte-range chunking of binary content with per-chunk
    * checksums — the blob-storage path for media too large for one
    * parquet cell (content-addressed chunk store / resumable transfer).
    * Pure projection + explode over the byte offsets; bytes are sliced
    * with `substring` on the BinaryType column (never decoded). */
  def chunkBytes(assets: DataFrame, size: Int = 100): DataFrame =
    assets
      .select(col("asset_id"), col("content"),
        length(col("content")).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col("asset_id"), col("content"), col("n"),
        explode(sequence(lit(0L), col("n") - 1, lit(size.toLong))).as("offset"))
      .select(col("asset_id"),
        (col("offset") / size).cast("long").as("chunk_id"),
        col("offset"),
        least(lit(size.toLong), col("n") - col("offset")).as("n_bytes"),
        md5(expr(s"substring(content, offset + 1, $size)")).as("chunk_md5"))

  /** MM6 fabrication: blobs with REAL container signatures — each
    * document's bytes prefixed by a deterministic magic-number header
    * (PNG / JPEG / GIF89a / RIFF-WEBP by `doc_id mod 5`; the fifth
    * class stays unsigned), the shape an S3 media crawl lands as. The
    * header bytes are the published file-format signatures. */
  def signedAssets(docs: DataFrame): DataFrame = {
    val m = col("doc_id") % 5
    val sig = when(m === 0, unhex(lit("89504E470D0A1A0A")))       // PNG
      .when(m === 1, unhex(lit("FFD8FFE0")))                      // JPEG/JFIF
      .when(m === 2, lit("GIF89a").cast("binary"))                // GIF
      .when(m === 3, concat(lit("RIFF").cast("binary"),           // WEBP
        unhex(lit("AABBCCDD")), lit("WEBP").cast("binary")))
      .otherwise(lit("").cast("binary"))
    docs.select(col("doc_id").as("asset_id"),
      concat(sig, col("text").cast("binary")).as("content"))
  }

  /** MM7 fabrication: the [[signedAssets]] corpus upgraded to carry
    * REAL dimension headers — PNG blobs get a spec-exact IHDR chunk
    * (length 13, type "IHDR", width/height as big-endian int32 at
    * byte offsets 16/20) and GIF blobs a spec-exact logical screen
    * descriptor (width/height as little-endian uint16 at offsets
    * 6/8), with dimensions derived arithmetically from the asset id —
    * so a parser's output has an INDEPENDENT ground truth the oracle
    * can state without touching bytes. JPEG/WEBP/raw classes carry no
    * parseable dimensions (NULL is the correct parse). */
  def dimensionedAssets(docs: DataFrame): DataFrame = {
    val m = col("doc_id") % 5
    val w = (col("doc_id") % 1000 + 16).cast("int")
    val h = (col("doc_id") % 777 + 16).cast("int")
    def be4(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def le2(c: org.apache.spark.sql.Column) = unhex(concat(
      lpad(hex(pmod(c, lit(256))), 2, "0"),
      lpad(hex(shiftright(c, 8)), 2, "0")))
    val png = concat(unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")),                        // IHDR length = 13
      lit("IHDR").cast("binary"), be4(w), be4(h))
    val gif = concat(lit("GIF89a").cast("binary"), le2(w), le2(h))
    val sig = when(m === 0, png)
      .when(m === 1, unhex(lit("FFD8FFE0")))
      .when(m === 2, gif)
      .when(m === 3, concat(lit("RIFF").cast("binary"),
        unhex(lit("AABBCCDD")), lit("WEBP").cast("binary")))
      .otherwise(lit("").cast("binary"))
    docs.select(col("doc_id").as("asset_id"),
      concat(sig, col("text").cast("binary")).as("content"))
  }

  /** MM7: image dimensions parsed straight from container bytes — the
    * metadata pass a media pipeline runs on billions of blobs BEFORE
    * any expensive decode (resize budgets, aspect filters, thumbnail
    * planning all need width×height only). Pure `substring`/`hex`/
    * `conv` Column byte math inside the scan projection, codegen'd,
    * bytes never decoded: PNG reads the IHDR big-endian int32 pair at
    * offsets 16/20, GIF the little-endian uint16 pair at 6/8;
    * formats whose dimensions need a frame scan (JPEG SOF hunting,
    * WEBP VP8 bitstream) return NULL here — they are the decode-audit
    * tier's job (mm5). Returns (width, height) columns. */
  def containerDims(content: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val isPng = hex(substring(content, 1, 8)) === "89504E470D0A1A0A"
    val isGif = substring(content, 1, 6).cast("string") === "GIF89a"
    def be4(pos: Int) =
      conv(hex(substring(content, pos, 4)), 16, 10).cast("long")
    def le2(pos: Int) =
      (conv(hex(substring(content, pos, 1)), 16, 10).cast("long") +
        conv(hex(substring(content, pos + 1, 1)), 16, 10).cast("long") * 256L)
    (when(isPng, be4(17)).when(isGif, le2(7)),
      when(isPng, be4(21)).when(isGif, le2(9)))
  }

  /** Fabricated JPEG assets for mm8: SOI, then `doc_id % 4` APP1
    * segments of id-derived VARIABLE length (the thing that makes JPEG
    * dimensions a marker WALK, not a fixed offset read), then a
    * spec-exact SOF0 carrying id-derived big-endian height/width.
    * Ground truth is arithmetic in the ids, so the oracle never parses
    * bytes and any walk/offset/endianness slip hash-fails. */
  def jpegAssets(docs: DataFrame): DataFrame = {
    def be2(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
    val w = (col("doc_id") % 4000 + 16).cast("int")
    val h = (col("doc_id") % 3000 + 16).cast("int")
    val nSeg = col("doc_id") % 4
    // APP1 segment i: FF E1, BE16 length (2 + payload), 'X' * payload
    def seg(i: Int) = {
      val payload = (col("doc_id") + i) % 9 + 1
      when(nSeg > i, concat(unhex(lit("FFE1")), be2(payload + 2),
        repeat(lit("X"), payload.cast("int")).cast("binary")))
        .otherwise(lit("").cast("binary"))
    }
    val sof0 = concat(unhex(lit("FFC00011")), unhex(lit("08")),
      be2(h), be2(w), unhex(lit("03")))
    docs.select(col("doc_id").as("asset_id"),
      concat(unhex(lit("FFD8")), seg(0), seg(1), seg(2), seg(3), sof0,
        col("text").cast("binary")).as("content"))
  }

  /** MM8: JPEG dimensions via a bounded SOF marker WALK — the format
    * mm7's fixed-offset reads explicitly defer: JPEG prefixes its
    * frame header with a VARIABLE number of variable-length segments
    * (APPn metadata, quantization tables...), so width/height live
    * behind a walk, not an offset. The walk is still pure Column byte
    * math inside the scan projection (substr/hex/conv, codegen'd, no
    * decode): up to `maxSegments` hops of
    * `offset += 2 + BE16(length)`, stopping at SOF0/SOF2 (FFC0/FFC2 —
    * baseline/progressive; FFC4/DHT is NOT a frame header and is
    * correctly skipped), then height at SOF+5, width at SOF+7 (both
    * BE16, read as plain Column byte math off the found offset).
    *
    * The WALK itself is the native [[graft.functions.JpegSofOffset]]
    * loop, not composed Column math: the composed form duplicates the
    * offset subtree per hop (the next offset embeds the previous one
    * twice), so plan size, generated code, and evaluation cost all
    * DOUBLE per hop — measured 4 s at 4 hops → 40 s at 8 hops over 5k
    * rows before the rewrite, 0.4 s after. Same lesson as
    * SignLshBuckets: when a per-row algorithm has a loop, put the loop
    * IN an expression, don't unroll it into the plan.
    *
    * Frames whose SOF sits deeper than `maxSegments` return NULL —
    * production sets the bound to the corpus's observed segment depth.
    * Returns (width, height); non-JPEG/malformed bytes → NULL. */
  def jpegDims(content: org.apache.spark.sql.Column, maxSegments: Int = 8)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    def be2(pos: org.apache.spark.sql.Column) =
      conv(hex(content.substr(pos, lit(2))), 16, 10).cast("long")
    val sof = graft.functions.MediaExpressions.jpegSofOffset(content, maxSegments)
    (when(sof.isNotNull, be2(sof + 7)),
      when(sof.isNotNull, be2(sof + 5)))
  }

  /** MM6: container-format sniffing from magic bytes — the mandatory
    * first pass of any multimodal ingest (extensions lie; upstream
    * Content-Type headers lie more). Pure `substring`/`hex` Column
    * composition over the BinaryType prefix — bytes are never decoded,
    * never leave the executor, and the expression whole-stage-codegens
    * inside the scan projection. WEBP needs the two-part test (RIFF
    * container at 0, format tag at byte 8) — prefix equality alone
    * misclassifies every other RIFF (WAV, AVI). */
  def sniffMime(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(content, 1, 8)) === "89504E470D0A1A0A", "image/png")
      .when(hex(substring(content, 1, 3)) === "FFD8FF", "image/jpeg")
      .when(substring(content, 1, 6).cast("string") === "GIF89a", "image/gif")
      .when(substring(content, 1, 4).cast("string") === "RIFF" &&
        substring(content, 9, 4).cast("string") === "WEBP", "image/webp")
      .otherwise("application/octet-stream")

  // ---- MM9: RIFF/WAVE audio headers ---------------------------------------

  /** Little-endian uint16 fabrication (2 bytes, value < 2^16). */
  private def le2b(c: org.apache.spark.sql.Column) = unhex(concat(
    lpad(hex(pmod(c, lit(256))), 2, "0"),
    lpad(hex(pmod(shiftright(c, 8), lit(256))), 2, "0")))

  /** Little-endian uint32 fabrication (4 bytes, value < 2^31). */
  private def le4b(c: org.apache.spark.sql.Column) = unhex(concat(
    lpad(hex(pmod(c, lit(256))), 2, "0"),
    lpad(hex(pmod(shiftright(c, 8), lit(256))), 2, "0"),
    lpad(hex(pmod(shiftright(c, 16), lit(256))), 2, "0"),
    lpad(hex(pmod(shiftright(c, 24), lit(256))), 2, "0")))

  /** MM9 fabrication: one third of the corpus gets a SPEC-EXACT
    * canonical 44-byte PCM WAV header (RIFF size, "WAVE", 16-byte
    * "fmt " chunk, "data" chunk size) whose channel count / sample
    * rate / bit depth / data size all derive arithmetically from the
    * asset id; one third gets a RIFF/WEBP blob — a RIFF container
    * that is NOT audio, the classic false-positive for a parser that
    * stops at the "RIFF" magic; one third raw text. Ground truth is
    * arithmetic in the ids (the mm7/mm8 recipe), so the oracle never
    * touches bytes and any endianness/offset/tag slip hash-fails. */
  def wavAssets(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val m = id % 3
    val ch = (id % 2 + 1).cast("int")                      // 1 or 2 channels
    val sr = when(id % 4 === 0, 8000).when(id % 4 === 1, 16000)
      .when(id % 4 === 2, 22050).otherwise(44100)          // sample rate
    val bits = ((expr("doc_id div 2") % 2 + 1) * 8).cast("int") // 8 or 16
    val block = (ch * bits / lit(8)).cast("int")           // frame stride
    val byteRate = (sr * block).cast("int")
    val dataSize = ((id % 1000 + 25) * block).cast("int")
    val wav = concat(
      lit("RIFF").cast("binary"), le4b(dataSize + 36),
      lit("WAVE").cast("binary"),
      lit("fmt ").cast("binary"), le4b(lit(16)),
      le2b(lit(1)), le2b(ch), le4b(sr), le4b(byteRate), le2b(block), le2b(bits),
      lit("data").cast("binary"), le4b(dataSize))
    val webp = concat(lit("RIFF").cast("binary"), le4b(id % 65536 + 12),
      lit("WEBP").cast("binary"), lit("VP8 ").cast("binary"))
    val header = when(m === 0, wav).when(m === 1, webp)
      .otherwise(lit("").cast("binary"))
    docs.select(id.as("asset_id"),
      concat(header, col("text").cast("binary")).as("content"))
  }

  /** MM10 fabrication: spec-exact JPEG/APP1/EXIF blobs — SOI, APP1
    * (length 46), "Exif\0\0", then a TIFF body whose BYTE ORDER
    * alternates by class: one third little-endian ("II"), one third
    * big-endian ("MM") — the flag every real EXIF parser must honor —
    * and one third plain JPEG with no APP1 (NULL parse). The IFD holds
    * two entries sorted by tag: 0x0112 Orientation (SHORT, value
    * doc_id%8+1 — all eight spec rotations occur) and 0x011A
    * XResolution. Ground truth is arithmetic in the ids (the mm7/mm8
    * recipe). */
  def exifAssets(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val m = id % 3
    val orient = (id % 8 + 1).cast("int")
    def le2(c: org.apache.spark.sql.Column) = le2b(c)
    def be2(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
    def le4(c: org.apache.spark.sql.Column) = le4b(c)
    def be4(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def tiff(le: Boolean): org.apache.spark.sql.Column = {
      def w2(c: org.apache.spark.sql.Column) = if (le) le2(c) else be2(c)
      def w4(c: org.apache.spark.sql.Column) = if (le) le4(c) else be4(c)
      concat(
        lit(if (le) "II" else "MM").cast("binary"), w2(lit(42)), w4(lit(8)),
        w2(lit(2)),                                    // 2 IFD entries
        w2(lit(0x0112)), w2(lit(3)), w4(lit(1)),       // Orientation SHORT×1
        w2(orient), w2(lit(0)),                        // value, left-justified
        w2(lit(0x011A)), w2(lit(3)), w4(lit(1)),       // XResolution SHORT×1
        w2(lit(72)), w2(lit(0)),
        w4(lit(0)))                                    // next IFD: none
    }
    val app1 = (t: org.apache.spark.sql.Column) => concat(
      unhex(lit("FFD8")), unhex(lit("FFE1")), be2(lit(46)),
      lit("Exif").cast("binary"), unhex(lit("0000")), t)
    val header = when(m === 0, app1(tiff(le = true)))
      .when(m === 1, app1(tiff(le = false)))
      .otherwise(unhex(lit("FFD8FFDB"))) // JPEG, no APP1
    docs.select(id.as("asset_id"),
      concat(header, col("text").cast("binary")).as("content"))
  }

  /** MM10: EXIF orientation via the TIFF IFD walk — the rotation flag
    * a multimodal pipeline must read before any resize/crop (a decoder
    * that ignores it silently trains on sideways images). This is the
    * multimodal parser family's hardest case: the TIFF body declares
    * its OWN byte order ("II" little / "MM" big — both occur in the
    * wild), so every multi-byte read switches on a flag read from the
    * data itself; the IFD is then a counted entry table scanned for
    * tag 0x0112, whose SHORT value sits left-justified in the 4-byte
    * value slot in the declared order. Pure `substring`/`hex`/`conv`
    * Column math in the scan projection (the walk is bounded:
    * `maxEntries` candidate reads, each guarded by the live entry
    * count — the mm8 bounded-walk posture, branch-free enough to stay
    * inside whole-stage codegen at 8 entries). Non-EXIF blobs parse to
    * NULLs through the full gate chain SOI→APP1→"Exif\0\0".
    *
    * @return (byte_order, n_entries, orientation) Columns. */
  def exifOrientation(content: org.apache.spark.sql.Column, maxEntries: Int = 8)
      : Seq[org.apache.spark.sql.Column] = {
    // one native walk per row (ExifOrientationPacked — the JpegSofOffset
    // escape: the composed-Column form below measured 2.9 s over 5k
    // rows re-deriving the endian-switched reads per candidate entry);
    // the packed long unpacks with pure integer Columns. MediaSpec pins
    // native ≡ composed on hand-built layouts.
    val packed = graft.functions.MediaExpressions
      .exifOrientationPacked(content, maxEntries)
    Seq(
      when(packed.isNotNull,
        when(shiftright(packed, 32) === 1L, "II").otherwise("MM"))
        .as("byte_order"),
      when(packed.isNotNull, shiftright(packed, 16) % 65536L).as("n_entries"),
      when(packed.isNotNull && packed % 65536L =!= 0L, packed % 65536L)
        .as("orientation"))
  }

  /** The composed-Column formulation [[exifOrientation]]'s native
    * expression replaced (kept for the equivalence spec). */
  private[graft] def exifOrientationColumns(
      content: org.apache.spark.sql.Column, maxEntries: Int = 8)
      : Seq[org.apache.spark.sql.Column] = {
    def bc(p: org.apache.spark.sql.Column) =
      conv(hex(content.substr(p, lit(1))), 16, 10).cast("long")
    val isExif = hex(substring(content, 1, 4)) === "FFD8FFE1" &&
      hex(substring(content, 7, 6)) === "457869660000"
    val bo = substring(content, 13, 2).cast("string")
    val isLe = bo === "II"
    def u2(p: org.apache.spark.sql.Column) =
      when(isLe, bc(p) + bc(p + 1) * 256L).otherwise(bc(p) * 256L + bc(p + 1))
    def u4(p: org.apache.spark.sql.Column) =
      when(isLe,
        bc(p) + bc(p + 1) * 256L + bc(p + 2) * 65536L + bc(p + 3) * 16777216L)
      .otherwise(
        bc(p) * 16777216L + bc(p + 1) * 65536L + bc(p + 2) * 256L + bc(p + 3))
    val validTiff = (isLe || bo === "MM") && u2(lit(15)) === 42L
    val ifdPos = lit(13L) + u4(lit(17))
    // entry i: 12 bytes from ifdPos+2; tag at +0, value slot at +8
    val entryVals = (0 until maxEntries).map { i =>
      val base = ifdPos + lit(2L + 12L * i)
      when(lit(i) < u2(ifdPos) && u2(base) === 0x0112L, u2(base + 8L))
    }
    val gate = isExif && validTiff
    Seq(
      when(gate, bo).as("byte_order"),
      when(gate, u2(ifdPos)).as("n_entries"),
      when(gate, coalesce(entryVals: _*)).as("orientation"))
  }

  /** MM9: audio metadata parsed straight from RIFF/WAVE header bytes —
    * the billion-blob pass an audio pipeline runs BEFORE any codec
    * (duration budgeting, sample-rate routing, mono/stereo splits all
    * need the 44-byte header only). Pure `substring`/`hex`/`conv`
    * little-endian Column math inside the scan projection, codegen'd,
    * bodies never decoded and never shuffled. The gate requires the
    * full tag chain RIFF → WAVE → "fmt " → "data": a RIFF/WEBP (or any
    * other RIFF) blob correctly parses to NULLs. duration_ms is exact
    * integer division data_bytes·1000 div byte_rate.
    *
    * @return (n_channels, sample_rate, bits_per_sample, data_bytes,
    *         duration_ms) Columns, all NULL for non-WAVE content. */
  def wavMeta(content: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    def b(p: Int) = conv(hex(substring(content, p, 1)), 16, 10).cast("long")
    def le2(p: Int) = b(p) + b(p + 1) * 256L
    def le4(p: Int) = b(p) + b(p + 1) * 256L + b(p + 2) * 65536L +
      b(p + 3) * 16777216L
    val isWav = substring(content, 1, 4).cast("string") === "RIFF" &&
      substring(content, 9, 4).cast("string") === "WAVE" &&
      substring(content, 13, 4).cast("string") === "fmt " &&
      substring(content, 37, 4).cast("string") === "data"
    val byteRate = le4(29)
    // exact integral division: (a - a mod b) is divisible by b and the
    // quotient is far below 2^53, so the double divide is exact
    val ms = le4(41) * 1000L
    val durationMs = ((ms - pmod(ms, byteRate)) / byteRate).cast("long")
    Seq(
      when(isWav, le2(23)).as("n_channels"),
      when(isWav, le4(25)).as("sample_rate"),
      when(isWav, le2(35)).as("bits_per_sample"),
      when(isWav, le4(41)).as("data_bytes"),
      when(isWav, durationMs).as("duration_ms"))
  }

  // ---- MM12: SRT timed-text cues ------------------------------------------

  /** MM12 fabrication: one third of the corpus gets a spec-exact SRT
    * first cue (index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing
    * line) whose start/end derive arithmetically from the asset id;
    * one third gets a cue whose start MINUTES field reads 77 — a
    * timestamp no spec-conforming writer emits, which a parser doing
    * plain positional math happily "decodes" into a wrong epoch; one
    * third raw text. Ground truth is arithmetic in the ids (the
    * mm7–mm11 recipe). */
  def srtAssets(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val m = id % 3
    docs.select(id.as("asset_id"), m.as("m"),
        ((id % 3000L) * 1000L + id % 997L).as("sms"),
        ((id % 3000L) * 1000L + id % 997L + id % 5000L + 500L).as("ems"),
        col("text"))
      .withColumn("ts_s", expr(
        """format_string('%02d:%02d:%02d,%03d', sms div 3600000,
          |  (sms div 60000) % 60, (sms div 1000) % 60, sms % 1000)""".stripMargin))
      .withColumn("ts_e", expr(
        """format_string('%02d:%02d:%02d,%03d', ems div 3600000,
          |  (ems div 60000) % 60, (ems div 1000) % 60, ems % 1000)""".stripMargin))
      .withColumn("ts_bad", expr(
        """format_string('%02d:77:%02d,%03d', sms div 3600000,
          |  (sms div 1000) % 60, sms % 1000)""".stripMargin))
      .select(col("asset_id"),
        when(col("m") === 0,
          concat(lit("1\n"), col("ts_s"), lit(" --> "), col("ts_e"),
            lit("\n"), col("text")))
        .when(col("m") === 1,
          concat(lit("1\n"), col("ts_bad"), lit(" --> "), col("ts_e"),
            lit("\n"), col("text")))
        .otherwise(col("text")).as("content"))
  }

  /** MM12: SRT first-cue timing parse — the alignment pre-step of any
    * audio/subtitle pairing pipeline (cut audio at cue boundaries,
    * pair the clip with the cue text). STRICT field validation: the
    * minutes/seconds fields must be < 60, so the fabricated
    * 77-minutes class rejects to NULLs where a positional h·3600000 +
    * m·60000 + … decode would silently yield a wrong epoch. Field
    * gates evaluate under `when(matched, …)` so the casts only run on
    * regex-matched digit groups (ANSI-safe). Pure regex/arith Column
    * ops in the scan projection.
    *
    * @return (start_ms, end_ms, dur_ms) Columns, NULL without a
    *         well-formed leading cue. */
  def srtMeta(content: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val re = "^1\\n(\\d{2}):(\\d{2}):(\\d{2}),(\\d{3}) --> " +
      "(\\d{2}):(\\d{2}):(\\d{2}),(\\d{3})\\n"
    val s = content.cast("string")
    def g(k: Int) = regexp_extract(s, re, k)
    val matched = g(0) =!= ""
    def ms(h: Int, mi: Int, sec: Int, mil: Int) =
      g(h).cast("long") * 3600000L + g(mi).cast("long") * 60000L +
        g(sec).cast("long") * 1000L + g(mil).cast("long")
    val sms = ms(1, 2, 3, 4)
    val ems = ms(5, 6, 7, 8)
    // field ranges AND cue ordering: end < start is as malformed as a
    // 77-minutes field — it rejects to NULLs, never a negative dur_ms
    val gate = when(matched,
      g(2).cast("long") < 60 && g(3).cast("long") < 60 &&
        g(6).cast("long") < 60 && g(7).cast("long") < 60 &&
        ems >= sms)
      .otherwise(lit(false))
    Seq(
      when(gate, sms).as("start_ms"),
      when(gate, ems).as("end_ms"),
      when(gate, ems - sms).as("dur_ms"))
  }

  // ---- MM11: ID3v2 tag headers (syncsafe integers) ------------------------

  /** Single-byte fabrication (value < 256). */
  private def byte1(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(pmod(c, lit(256))), 2, "0"))

  /** MM11 fabrication: one third of the corpus gets a spec-exact ID3v2
    * tag header — "ID3", major version 3/4 alternating, revision 0,
    * the unsynchronisation flag bit alternating, then the 28-bit
    * SYNCSAFE size (four 7-bit groups, high bit of every byte zero by
    * spec); one third gets a corrupted twin whose third size byte has
    * the high bit SET — the exact corruption syncsafe encoding exists
    * to exclude (a parser that decodes the four bytes as a plain
    * big-endian int accepts it and mis-sizes every following frame);
    * one third raw text. Ground truth is arithmetic in the ids (the
    * mm7–mm10 recipe), so the oracle never touches bytes. */
  def id3Assets(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val m = id % 3
    val size = id % 2097152L + 10L
    val ver = (id % 2 + 3).cast("int")
    val flags = ((expr("doc_id div 2") % 2) * 128).cast("int")
    def ss(shift: Int) = pmod(shiftright(size, shift), lit(128))
    val good = concat(lit("ID3").cast("binary"), byte1(ver), byte1(lit(0)),
      byte1(flags),
      byte1(ss(21)), byte1(ss(14)), byte1(ss(7)), byte1(pmod(size, lit(128))))
    val bad = concat(lit("ID3").cast("binary"), byte1(lit(3)), byte1(lit(0)),
      byte1(lit(0)),
      byte1(ss(21)), byte1(ss(14)), byte1(ss(7) + 128), byte1(pmod(size, lit(128))))
    val header = when(m === 0, good).when(m === 1, bad)
      .otherwise(lit("").cast("binary"))
    docs.select(id.as("asset_id"),
      concat(header, col("text").cast("binary")).as("content"))
  }

  /** MM11: ID3v2 tag-header parse with a STRICT syncsafe decode — the
    * skip-length read an audio pipeline performs before seeking to the
    * first MPEG frame (mis-reading it desynchronizes every downstream
    * byte offset). Syncsafe integers keep bit 7 of every byte zero so
    * tag bytes can never alias an MPEG sync pattern; the spec makes a
    * set high bit ill-formed, and this parser REJECTS it (NULLs) where
    * a naive big-endian read would silently accept — the fabricated
    * corrupted class pins exactly that. Pure `substring`/`hex`/`conv`
    * Column math in the scan projection (the mm9 posture); non-ID3
    * blobs gate to NULLs on magic + version-range checks.
    *
    * @return (ver_major, unsync, tag_size, total_bytes) Columns, all
    *         NULL for blobs without a well-formed ID3v2 header. */
  def id3Meta(content: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    def b(p: Int) = conv(hex(substring(content, p, 1)), 16, 10).cast("long")
    val magic = substring(content, 1, 3).cast("string") === "ID3"
    // version gate: major 2-4 (the deployed ID3v2 range), revision
    // $FF forbidden by spec — both reads also reject printable text
    // bytes (≥ 0x20), so a text blob that merely STARTS with "ID3"
    // can never sneak through the chain
    val verOk = b(4) >= 2L && b(4) <= 4L && b(5) =!= 255L && b(5) < 32L
    val syncsafe = b(7) < 128L && b(8) < 128L && b(9) < 128L && b(10) < 128L
    val gate = magic && verOk && syncsafe
    val size = b(7) * 2097152L + b(8) * 16384L + b(9) * 128L + b(10)
    Seq(
      when(gate, b(4)).as("ver_major"),
      when(gate, (b(6) >= 128L).cast("int")).as("unsync"),
      when(gate, size).as("tag_size"),
      when(gate, size + 10L).as("total_bytes"))
  }
}
