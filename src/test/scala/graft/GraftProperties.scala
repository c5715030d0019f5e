package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.analytics.Measures
import graft.functions.Normalize
import graft.ingest.Events

/** Generated event row — top-level and public so Catalyst codegen can
  * reach the accessors (a private inner class forces interpreter-mode
  * fallback with noisy compile errors). */
case class GenEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Property-based invariants (SURVEY.md §5.3): dedup idempotence,
  * latest-state ≡ fold, funnel partition completeness, parser totality. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each trial runs Spark jobs

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val types = Seq("view", "click", "signup", "purchase", "error")

  private val genEvent: Gen[GenEv] = for {
    id <- Gen.chooseNum(0L, 50L)
    off <- Gen.chooseNum(0L, 86400L)
    uid <- Gen.chooseNum(0L, 5L)
    tp <- Gen.oneOf(types)
    v <- Gen.chooseNum(0, 100000).map(_ / 100.0)
  } yield GenEv(id, new Timestamp(1704067200000L + off * 1000), uid, tp, v)

  private val genEvents: Gen[List[GenEv]] = Gen.listOfN(30, genEvent)

  property("dedup is idempotent: ingest(xs ++ xs) == ingest(xs)") =
    forAll(genEvents) { evs =>
      def run(rows: Seq[GenEv]) =
        Events.dedupFirstWins(rows.toDF(), Seq("event_id"),
            Seq(col("ts").asc, col("user_id").asc, col("event_type").asc, col("value").asc))
          .as[GenEv].collect().toSet
      run(evs) == run(evs ++ evs)
    }

  property("latestState equals a fold over time-sorted events") =
    forAll(genEvents) { evs =>
      evs.isEmpty || {
        val got = Events.latestState(evs.toDF(), Seq("user_id"), col("ts"), col("event_id"))
          .select("user_id", "event_id").as[(Long, Long)].collect().toMap
        val expected = evs.groupBy(_.user_id).view
          .mapValues(_.maxBy(e => (e.ts.getTime, e.event_id)).event_id).toMap
        got == expected
      }
    }

  property("funnel stage counts partition the event log") =
    forAll(genEvents) { evs =>
      evs.isEmpty || {
        val row = Measures.funnel(evs.toDF(),
          types.map(t => t -> (col("event_type") === t)), Nil).head()
        types.map(t => row.getAs[Long](t)).sum == evs.size
      }
    }

  property("lenient timestamp parse is total: never throws, null or valid") =
    forAll(Gen.oneOf(
        Gen.alphaNumStr,
        Gen.const("2024-02-30"),          // invalid date
        Gen.const("2024-06-15T25:61:61"), // invalid time
        genEvent.map(_.ts.toString.take(19)))) { s =>
      val out = Seq(s).toDF("raw")
        .select(Normalize.parseTsLenient(col("raw")).as("ts")).collect()
      out.length == 1 // no exception; NULL or parsed both acceptable
    }

  property("pctRatio never divides by zero") =
    forAll(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 5L)) { (a, b) =>
      val r = Seq((a, b)).toDF("num", "den")
        .select(Measures.pctRatio(col("num"), col("den")).as("r")).head()
      if (b == 0) r.isNullAt(0) else math.abs(r.getDouble(0) - a * 100.0 / b) < 0.01
    }

  private val genDoc: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 1000000L)
    n <- Gen.chooseNum(1, 130)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta"))
  } yield (id, ws.mkString(" "))

  property("chunk windows tile every token exactly once per stride step") =
    forAll(Gen.listOfN(5, genDoc)) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      val df = docs.toDF("doc_id", "text")
      val chunks = graft.text.Chunking.chunkWindows(df, size = 50, stride = 40)
        .select("doc_id", "start_tok", "n_tok").as[(Long, Long, Long)]
        .collect().groupBy(_._1)
      docs.forall { case (id, text) =>
        val n = text.split(" ").length.toLong
        val cs = chunks(id).sortBy(_._2)
        cs.map(_._2).sameElements(1L to n by 40L) && // stride-spaced starts
          cs.last._2 + cs.last._3 - 1 == n &&        // coverage reaches the end
          cs.forall { case (_, s, len) => len == math.min(50L, n - s + 1) }
      }
    }

  property("hash split is a partition: one split per doc, bucket-consistent") =
    forAll(Gen.listOfN(20, genDoc)) { docs0 =>
      val df = docs0.distinctBy(_._1).toDF("doc_id", "text")
      val s = graft.sampling.Sampling.hashSplit(df, col("doc_id"))
        .select("doc_id", "bucket", "split").as[(Long, Long, String)].collect()
      s.length == docs0.distinctBy(_._1).length && s.forall { case (_, b, sp) =>
        b >= 0 && b < 100 &&
          sp == (if (b < 80) "train" else if (b < 90) "val" else "test")
      }
    }

  property("dedup survivors partition the corpus: kept ⊎ dropped, one canonical per family") =
    forAll(Gen.listOfN(8, genDoc)) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      val df = docs.toDF("doc_id", "text")
      val fams = graft.dedup.Clusters.duplicateClusters(df, 0.7)
        .select("doc_id", "cluster_id").as[(Long, Long)].collect()
      val surv = graft.dedup.Clusters.survivors(df, 0.7)
        .select("doc_id").as[Long].collect().toSet
      val dropped = fams.filter(f => f._1 != f._2).map(_._1).toSet
      surv.intersect(dropped).isEmpty && surv.size + dropped.size == docs.size &&
        fams.filter(f => f._1 == f._2).forall(f => surv.contains(f._1))
    }

  property("connectedComponents equals union-find on random graphs") =
    forAll(Gen.chooseNum(2, 60), Gen.listOfN(60, Gen.chooseNum(0, 59))) { (n, picks) =>
      // random edge list over n nodes (pairs drawn from the pick stream)
      val edges = picks.grouped(2).collect {
        case List(a, b) if a % n != b % n => ((a % n).toLong, (b % n).toLong)
      }.toList
      edges.isEmpty || {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val truth = touched.map { v =>
          val r = find(v.toInt)
          v -> touched.filter(w => find(w.toInt) == r).min
        }.toMap
        val got = graft.dedup.Clusters.connectedComponents(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        got == truth
      }
    }

  property("decontaminate: exact eval matches always removed; cleaning is idempotent") =
    forAll(Gen.listOfN(6, genDoc), Gen.listOfN(3, genDoc)) { (tr0, ev0) =>
      val trainRows = tr0.distinctBy(_._1)
      val train = trainRows.toDF("doc_id", "text")
      // eval ids disjoint from train ids (held-out set); doc_id is a
      // KEY, so dedupe by id BEFORE deriving both the frame and the
      // expected-text set — computing evalTexts from the raw list let a
      // shrunk id collision drop a text from the frame but not from the
      // expectation (the one falsification this property ever produced)
      val evalRows = ev0.distinctBy(_._1)
      val evalDf = evalRows.map { case (id, t) => (id + 2000000L, t) }
        .toDF("doc_id", "text")
      val clean = graft.dedup.Dedup.decontaminate(train, evalDf, 0.7)
      val cleanIds = clean.select("doc_id").as[Long].collect().toSet
      val evalTexts = evalRows.map(_._2).toSet
      val exactMatches = trainRows.filter(d => evalTexts.contains(d._2)).map(_._1).toSet
      val again = graft.dedup.Dedup.decontaminate(clean, evalDf, 0.7)
        .select("doc_id").as[Long].collect().toSet
      cleanIds.intersect(exactMatches).isEmpty && again == cleanIds
    }

  property("as-of join: every match precedes the probe, per key") =
    forAll(genEvents) { evs =>
      val left = evs.filter(_.event_type == "purchase")
        .map(e => (e.event_id, e.user_id, e.ts)).toDF("event_id", "user_id", "ts")
      val right = evs.filter(_.event_type == "signup")
        .map(e => (e.user_id, e.ts, e.event_id))
        .toDF("user_id", "signup_ts", "signup_event_id")
      val out = graft.operators.AsOf
        .asOfBackward(left, right, Seq("user_id"), "ts", "signup_ts")
        .select("user_id", "ts", "signup_ts")
        .collect()
      val signupsByUser = evs.filter(_.event_type == "signup")
        .groupBy(_.user_id).view.mapValues(_.map(_.ts.getTime)).toMap
      out.forall { r =>
        if (r.isNullAt(2)) {
          // no match ⇒ genuinely no signup at or before the purchase
          signupsByUser.getOrElse(r.getLong(0), Nil)
            .forall(_ > r.getTimestamp(1).getTime)
        } else {
          // match is the LATEST signup at or before the purchase
          val m = r.getTimestamp(2).getTime
          m <= r.getTimestamp(1).getTime &&
            signupsByUser(r.getLong(0))
              .filter(_ <= r.getTimestamp(1).getTime).max == m
        }
      }
    }

  property("forward as-of mirrors backward under time reversal") =
    forAll(genEvents) { evs =>
      // reflect every timestamp around a pivot: the forward match on
      // the original data must equal the backward match on the
      // reflected data (with ties broken on the reflected id order —
      // use distinct (user, ts) right rows to keep the oracle simple)
      val pivot = 1704067200000L + 86400000L
      val right = evs.filter(_.event_type == "signup")
        .map(e => (e.user_id, e.ts)).distinct
        .map { case (u, t) => (u, t, t.getTime) }
        .toDF("user_id", "r_ts", "r_id")
      val left = evs.filter(_.event_type == "purchase")
        .map(e => (e.event_id, e.user_id, e.ts)).toDF("event_id", "user_id", "ts")
      def reflect(t: Timestamp) = new Timestamp(2 * pivot - t.getTime)
      val rightR = evs.filter(_.event_type == "signup")
        .map(e => (e.user_id, e.ts)).distinct
        .map { case (u, t) => (u, reflect(t), t.getTime) }
        .toDF("user_id", "r_ts", "r_id")
      val leftR = evs.filter(_.event_type == "purchase")
        .map(e => (e.event_id, e.user_id, reflect(e.ts))).toDF("event_id", "user_id", "ts")
      val fwd = graft.operators.AsOf
        .asOfForward(left, right, Seq("user_id"), "ts", "r_ts")
        .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
      val bwdReflected = graft.operators.AsOf
        .asOfBackward(leftR, rightR, Seq("user_id"), "ts", "r_ts")
        .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
      fwd == bwdReflected
    }

  property("snapshotDiff: applying deltas to the old snapshot reproduces the new one") =
    forAll(genEvents, genEvents) { (a, b) =>
      val oldSnap = Events.latestState(a.toDF(), Seq("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_type").as("t"), col("value").as("v"))
      val newSnap = Events.latestState(b.toDF(), Seq("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_type").as("t"), col("value").as("v"))
      val oldM = oldSnap.as[(Long, String, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val newM = newSnap.as[(Long, String, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val diff = Events.snapshotDiff(oldSnap, newSnap, Seq("user_id"), Seq("t", "v"))
        .select("user_id", "change_type", "new_t", "new_v")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) null else r.getString(2),
            if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
      // replay the CDC feed over the old state
      val replayed = diff.foldLeft(oldM) {
        case (m, (k, ("delete", _, _)))  => m - k
        case (m, (k, (_, t, v)))         => m + (k -> ((t, v)))
      }
      replayed == newM
    }

  property("SortedPairs kernel == instance-pair reference on arbitrary multisets") =
    forAll(Gen.listOfN(10, Gen.chooseNum(0L, 6L))) { xs =>
      val got = Seq(Tuple1(xs)).toDF("ks")
        .select(explode(graft.functions.PairExpressions.sortedPairs(col("ks"))).as("p"))
        .select(col("p.u"), col("p.v")).as[(Long, Long)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = (for {
        i <- xs.indices; j <- xs.indices
        if i != j && xs(i) < xs(j)
      } yield (xs(i), xs(j))).groupBy(identity).view.mapValues(_.size).toMap
      got == want
    }

  property("WeightedPairs kernel == weighted instance-pair reference") =
    forAll(Gen.listOfN(8,
        Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(1, 64)))) { raw =>
      // distinct ids with dyadic weights (exact in double, so the
      // product comparison is equality, not epsilon)
      val m = raw.toMap.toSeq.map { case (id, w) => (id, w / 16.0) }
      val got = Seq((m.map(_._1), m.map(_._2))).toDF("ids", "ws")
        .select(explode(graft.functions.PairExpressions.weightedPairs(
          col("ids"), col("ws"))).as("p"))
        .select(col("p.u"), col("p.v"), col("p.p"))
        .as[(Long, Long, Double)].collect().toSet
      val want = (for {
        (a, wa) <- m; (b, wb) <- m
        if a < b
      } yield (a, b, wa * wb)).toSet
      got == want
    }

  property("ArgExtremum == sorted-reference argmax/argmin under every tie rule") =
    forAll(Gen.listOfN(20,
        Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 5), Gen.chooseNum(0L, 50L)))) { raw =>
      {
        // listOfN(20, _) is never empty, so every group exists
        val df = raw.toDF("g", "ord", "arg")
        val A = graft.functions.AggExpressions
        val got = df.groupBy("g").agg(
            A.argMax(col("ord"), col("arg")).as("maxlo"),
            A.argMaxHigh(col("ord"), col("arg")).as("maxhi"),
            A.argMin(col("ord"), col("arg")).as("minlo"),
            A.argMinHigh(col("ord"), col("arg")).as("minhi"))
          .as[(Int, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
        val want = raw.groupBy(_._1).map { case (g, rows) =>
          val mxOrd = rows.map(_._2).max
          val mnOrd = rows.map(_._2).min
          val atMax = rows.filter(_._2 == mxOrd).map(_._3)
          val atMin = rows.filter(_._2 == mnOrd).map(_._3)
          g -> (atMax.min, atMax.max, atMin.min, atMin.max)
        }
        got == want
      }
    }

  property("SegmentDedup == Column-API chain on random word soup") =
    forAll(
      Gen.chooseNum(1, 4),
      Gen.listOfN(6, Gen.listOfN(9, Gen.oneOf("a", "b", "ab", ""))
        .map(_.mkString(" ")))) { (w, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = graft.text.TextAnalysis.intraDocDedup(df, width = w)
        .orderBy("doc_id").collect().toSeq
      val cols = graft.text.TextAnalysis.intraDocDedupColumns(df, width = w)
        .orderBy("doc_id").collect().toSeq
      native == cols
    }

  property("banded containment join == plain BETWEEN join on random intervals") =
    forAll(
      Gen.listOf(for {
        k <- Gen.chooseNum(1L, 3L)
        iid <- Gen.chooseNum(0L, 500L)
        lo <- Gen.chooseNum(-300L, 300L)
        len <- Gen.chooseNum(-30L, 400L) // negative => inverted interval
      } yield (k, iid, lo, lo + len)),
      Gen.listOf(for {
        k <- Gen.chooseNum(1L, 3L)
        pid <- Gen.chooseNum(0L, 500L)
        us <- Gen.chooseNum(-350L, 750L)
      } yield (k, pid, us))) { (ivs, pts) =>
      val intervals = ivs.distinct.toDF("ik", "iid", "lo", "hi")
      val points = pts.distinct.toDF("k", "pid", "us")
      val got = graft.operators.Intervals
        .bandedContainmentJoin(points, "k", "us",
          intervals, "ik", "lo", "hi", bandMicros = 100L)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
      val want = points.join(intervals,
          points("k") === intervals("ik") &&
            points("us") >= intervals("lo") && points("us") <= intervals("hi"))
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
      got == want
    }

  property("TopKPerKey == row_number window twin on random skewed frames") =
    forAll(
      Gen.chooseNum(1, 5),
      Gen.listOf(for {
        g <- Gen.chooseNum(0, 6)
        v <- Gen.chooseNum(0, 9) // dense value range -> many ties
        id <- Gen.chooseNum(0L, 1000L)
      } yield (s"g$g", v, id))) { (k, rows) =>
      val distinctRows = rows.distinct // unique (g,v,id) keeps the order total
      val df = distinctRows.toDF("g", "v", "id").repartition(3)
      val got = graft.operators.TopK.perKey(df, Seq("g"),
          Seq(col("v").desc, col("id").asc), k)
        .select("g", "v", "id").as[(String, Int, Long)].collect().toSet
      val want = distinctRows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy { case (_, v, id) => (-v, id) }.take(k)
      }.toSet
      got == want
    }

  property("binary container parsers are total on arbitrary bytes") = {
    import org.apache.spark.sql.functions.col
    // fuzz the byte-walk parsers (WAV header, EXIF IFD, JPEG SOF,
    // PNG/GIF dims, MIME sniff): on ANY byte string — including ones
    // opening with valid magics then truncating mid-structure — every
    // parser must return a row (nulls allowed), never throw or read
    // out of bounds. Seed some generators with real magic prefixes so
    // the walks actually enter their parse paths before hitting the
    // garbage tail.
    val magics = Seq(
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte),
      "RIFF".getBytes("ISO-8859-1"),
      "RIFF1234WAVEfmt ".getBytes("ISO-8859-1"),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte) ++
        Array[Byte](0, 10) ++ "Exif".getBytes("ISO-8859-1") ++
        Array[Byte](0, 0) ++ "II".getBytes("ISO-8859-1"),
      // a FULLY-GATED little-endian TIFF (magic 42 passes) so the
      // random tail becomes the IFD offset + entry table — this is
      // the seed that reaches the deep walk (a crafted 4-byte offset
      // ≥ 2^31 once wrapped negative through toInt and crashed b(p))
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte) ++
        Array[Byte](0, 10) ++ "Exif".getBytes("ISO-8859-1") ++
        Array[Byte](0, 0) ++ "II".getBytes("ISO-8859-1") ++
        Array[Byte](42, 0),
      // same, big-endian
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte) ++
        Array[Byte](0, 10) ++ "Exif".getBytes("ISO-8859-1") ++
        Array[Byte](0, 0) ++ "MM".getBytes("ISO-8859-1") ++
        Array[Byte](0, 42),
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
      // ID3v2 magic + valid version so the random tail becomes the
      // flags byte + syncsafe size the mm11 parser must bound-check
      "ID3".getBytes("ISO-8859-1") ++ Array[Byte](3, 0),
      // SRT cue opener so random tails land inside the mm12 regex
      "1\n00:00:01,000 --> ".getBytes("ISO-8859-1"),
      Array.empty[Byte])
    forAll(for {
      prefix <- Gen.oneOf(magics)
      tail <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
    } yield prefix ++ tail.toArray) { bytes =>
      val df = Seq((1L, bytes)).toDF("asset_id", "content")
      val m = graft.multimodal.Media
      val out = df.select(
        Seq(m.sniffMime(col("content")).as("mime")) ++
          m.wavMeta(col("content")) ++
          m.id3Meta(col("content")) ++
          m.srtMeta(col("content")) ++
          m.exifOrientation(col("content")) ++ {
            val (w, h) = m.containerDims(col("content"))
            Seq(w.as("png_w"), h.as("png_h"))
          } ++ {
            val (w, h) = m.jpegDims(col("content"))
            Seq(w.as("jpg_w"), h.as("jpg_h"))
          }: _*)
      out.collect().length == 1 // one row back, no exception
    }
  }

  property("ImageIO pixel decode is total on arbitrary bytes") = {
    // the mm13 path runs a REAL JDK decoder inside mapPartitions: on
    // ANY byte string — a bare "BM" magic, a full spec-exact header
    // with a garbage pixel tail, a header truncated mid-INFOHEADER —
    // it must emit exactly one row (the dead-letter sentinel where
    // undecodable), never throw out of the operator
    val valid = graft.multimodal.Media.bmpBytes(9L, 4, 3)
    val seeds = Seq(
      "BM".getBytes("ISO-8859-1"),
      valid.take(54),  // full header → random tail becomes pixel data
      valid.take(20),  // truncated mid-INFOHEADER
      Array.empty[Byte])
    forAll(for {
      prefix <- Gen.oneOf(seeds)
      tail <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
    } yield prefix ++ tail.toArray) { bytes =>
      val df = Seq((1L, bytes)).toDF("asset_id", "content")
      graft.multimodal.Media.imagePixelStats(spark, df).collect().length == 1
    }
  }

  property("audio sample decode is total on arbitrary bytes") = {
    // mm14's JDK container parse + native 16-bit walk: any byte string
    // — bare RIFF magic, a full WAV header with a garbage sample tail,
    // a header truncated mid-fmt — yields exactly one row, never throws
    val valid = graft.multimodal.Media.pcmBytes(9L, 8, 8000)
    val seeds = Seq(
      "RIFF".getBytes("ISO-8859-1"),
      valid.take(44), // full header → random tail becomes sample data
      valid.take(18), // truncated mid-fmt chunk
      Array.empty[Byte])
    forAll(for {
      prefix <- Gen.oneOf(seeds)
      tail <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
    } yield prefix ++ tail.toArray) { bytes =>
      val df = Seq((1L, bytes)).toDF("asset_id", "content")
      graft.multimodal.Media.audioSampleStats(spark, df).collect().length == 1
    }
  }

  property("BPE mergeFold (Column) == mergeGreedy (kernel) on random symbol runs") = {
    // a tiny alphabet maximizes overlap chains — the case where greedy
    // left-to-right semantics actually bite
    val genSyms = Gen.listOfN(12, Gen.oneOf("a", "b", "ab", "aa"))
    val genPair = Gen.oneOf(("a", "a"), ("a", "b"), ("b", "a"), ("ab", "b"),
      ("aa", "a"), ("a", "ab"))
    forAll(genSyms, genPair) { (syms, pair) =>
      val (a, b) = pair
      val viaFold = Seq(Tuple1(syms)).toDF("syms")
        .select(graft.text.Bpe.mergeFold(col("syms"), a, b).as("m"))
        .as[Seq[String]].head()
      viaFold == graft.text.Bpe.mergeGreedy(syms.toArray, a, b).toSeq
    }
  }
}
