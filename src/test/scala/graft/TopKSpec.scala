package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.plans.TopKPerKeyExec

/** [[graft.plans.TopKPerKeyNode]] — the custom per-key top-k physical
  * operator: result ≡ the `row_number() <= k` window formulation on a
  * total order (the semantic contract), the planned shape (partial +
  * final heap execs around one exchange, NO sort — the reason it
  * exists), and the flush path (correct at a threshold small enough to
  * force mid-partition flushes). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTwin(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)))
      .filter(col("rn") <= k).drop("rn")

  // deterministic pseudo-random rows: skewed keys (g0 holds ~half),
  // duplicate v values inside keys (ties the id tiebreak must resolve)
  private lazy val rows = (1 to 5000).map { i =>
    val g = if (i % 2 == 0) 0 else i % 37
    (s"g$g", (i * 2654435761L % 97).toInt, i.toLong)
  }
  private lazy val df = rows.toDF("g", "v", "id")

  private def asSet(d: org.apache.spark.sql.DataFrame) =
    d.select("g", "v", "id").as[(String, Int, Long)].collect().toSet

  test("perKey(k) equals the row_number window twin on a total order") {
    for (k <- Seq(1, 3, 10)) {
      val got = TopK.perKey(df, Seq("g"), Seq(col("v").desc, col("id").asc), k)
      assert(asSet(got) == asSet(windowTwin(df, k)), s"k=$k")
    }
  }

  test("k larger than any group passes everything through; k=0 is empty") {
    val all = TopK.perKey(df, Seq("g"), Seq(col("v").desc, col("id").asc), 10000)
    assert(asSet(all) == rows.toSet.map((r: (String, Int, Long)) => r))
    assert(TopK.perKey(df, Seq("g"), Seq(col("v").desc, col("id").asc), 0).count() == 0)
  }

  test("planned shape: partial + final heap execs, no SortExec anywhere") {
    val topk = TopK.perKey(df, Seq("g"), Seq(col("v").desc, col("id").asc), 3)
    val plan = topk.queryExecution.executedPlan match {
      // collect() does not descend into the AQE wrapper's inner plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val heapNodes = plan.collect { case e: TopKPerKeyExec => e }
    assert(heapNodes.map(_.isPartial).sorted == Seq(false, true),
      s"expected one partial and one final exec, got: $plan")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, s"heap operator must not sort: $plan")
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.nonEmpty, "EnsureRequirements should have inserted the key exchange")
    // the control: the window twin DOES plan a per-key sort
    val twinPlan = windowTwin(df, 3).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(twinPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.nonEmpty)
  }

  test("partial-side flush threshold does not change the result") {
    // force MANY mid-partition flushes: 5000 rows, 7 partitions,
    // threshold 16 → every partition flushes its heap map dozens of
    // times; the flushed supersets must still reduce to the exact
    // top-k in the final pass. Session-conf override (the r9-advice
    // shape): scoped to this session, no process-global state.
    try {
      spark.conf.set(graft.plans.TopKPerKey.FlushRowsKey, "16")
      val spread = df.repartition(7, col("id"))
      val got = TopK.perKey(spread, Seq("g"), Seq(col("v").desc, col("id").asc), 5)
      assert(asSet(got) == asSet(windowTwin(df, 5)))
    } finally spark.conf.unset(graft.plans.TopKPerKey.FlushRowsKey)
  }

  test("byte-based flush threshold flushes and does not change the result") {
    // retained-BYTES trigger (the wide-row guard): a threshold far
    // below one partition's retained size forces byte-driven flushes
    // while the row threshold stays at its 4M default — result must
    // still be exact, and the partial exec must report flushes
    try {
      spark.conf.set(graft.plans.TopKPerKey.FlushBytesKey, "512")
      val spread = df.repartition(7, col("id"))
      val got = TopK.perKey(spread, Seq("g"), Seq(col("v").desc, col("id").asc), 5)
      // execute THIS plan (asSet would wrap it in a fresh QueryExecution
      // whose metrics never accrue)
      val collected = got.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(collected == asSet(windowTwin(df, 5)))
      val plan = got.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // post-execution AQE turns the partial's shuffle into a leaf
      // QueryStageExec — descend into materialized stages explicitly
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case n => n }.flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q +: allNodes(q.plan)
          case n => Seq(n)
        }
      val partials = allNodes(plan).collect { case e: TopKPerKeyExec if e.isPartial => e }
      assert(partials.nonEmpty && partials.head.flushBytes == 512L,
        "planning must capture the session's byte threshold")
      assert(partials.head.metrics("numFlushes").value > 0,
        "a 512-byte threshold over ~700 retained rows/partition must flush")
    } finally spark.conf.unset(graft.plans.TopKPerKey.FlushBytesKey)
  }

  test("adversarial wide-row near-unique-key input: DEFAULT byte bound flushes and the result stays exact") {
    // The spill-pressure case the byte accounting exists for: ~1 KB
    // rows, EVERY key unique, one input partition. Unbounded, the
    // partial heap map would retain the whole ~140 MB partition (the
    // 4M ROW bound is untouchable at 150k rows — a count proxy never
    // fires); the 64 MB DEFAULT byte bound must fire instead, holding
    // any epoch's retained heap under the bound the SortExec spill
    // path this operator replaces would have enforced. No conf
    // override here — this pins the DEFAULT guard.
    val n = 150000
    val pad = concat_ws("", (0 until 24).map(i =>
      md5(concat(col("id").cast("string"), lit(s"_$i")))): _*)
    val wide = spark.range(n).select(
      concat(lit("k"), col("id")).as("g"),
      (col("id") % 997).cast("int").as("v"),
      col("id"),
      pad.as("pad")).repartition(1)
    val got = TopK.perKey(wide, Seq("g"), Seq(col("v").desc, col("id").asc), 2)
    // run got's OWN plan to completion so ITS metrics accrue (wrapping
    // it in an agg would execute a fresh QueryExecution instead)
    assert(got.queryExecution.toRdd.count() == n,
      "every row of a unique-key input survives top-k")
    // unique keys → the exact result is the input itself; compare as
    // an aggregate checksum (collecting 140 MB to the driver proves
    // nothing about the operator)
    def sig(d: org.apache.spark.sql.DataFrame): (Long, Long) =
      d.agg(count(lit(1)), bit_xor(xxhash64(col("g"), col("v"), col("id"), col("pad"))))
        .as[(Long, Long)].head()
    assert(sig(got) == sig(wide), "unique-key top-k must be the identity")
    // metrics accrue on THIS executed plan
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case nd => nd }.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: allNodes(q.plan)
        case nd => Seq(nd)
      }
    val plan = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val partials = allNodes(plan).collect { case e: TopKPerKeyExec if e.isPartial => e }
    assert(partials.nonEmpty)
    assert(partials.head.flushBytes == graft.plans.TopKPerKey.DefaultFlushBytes,
      "no override in play — this must be the default bound")
    assert(partials.head.metrics("numFlushes").value >= 1,
      s"~140 MB retained against the 64 MB default byte bound must flush " +
        s"(got ${partials.head.metrics("numFlushes").value})")
  }

  test("malformed flush conf fails fast with the key in the message") {
    try {
      spark.conf.set(graft.plans.TopKPerKey.FlushRowsKey, "4m")
      val ex = intercept[IllegalArgumentException] {
        TopK.perKey(df, Seq("g"), Seq(col("v").desc), 2).collect()
      }
      assert(ex.getMessage.contains(graft.plans.TopKPerKey.FlushRowsKey))
    } finally spark.conf.unset(graft.plans.TopKPerKey.FlushRowsKey)
  }

  test("null ordering values and null keys group and rank like the window") {
    val withNulls = Seq(
      ("a", Some(5), 1L), ("a", None, 2L), ("a", Some(9), 3L),
      (null.asInstanceOf[String], Some(1), 4L),
      (null.asInstanceOf[String], Some(2), 5L), ("b", None, 6L), ("b", None, 7L))
      .toDF("g", "v", "id")
    val got = TopK.perKey(withNulls, Seq("g"), Seq(col("v").desc, col("id").asc), 1)
    val want = withNulls.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)))
      .filter(col("rn") === 1).drop("rn")
    assert(got.select("g", "v", "id").as[(String, Option[Int], Long)].collect().toSet ==
      want.select("g", "v", "id").as[(String, Option[Int], Long)].collect().toSet)
  }

  test("float grouping keys: ±0.0 and NaN payloads form ONE group, like the window") {
    // raw-bits UnsafeRow key equality would split -0.0 from 0.0 and
    // NaN payloads from each other; perKey normalizes float keys the
    // way NormalizeFloatingNumbers does for built-in nodes
    val df = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L),
      (java.lang.Double.longBitsToDouble(0x7ff8000000000001L), 4L))
      .toDF("g", "id")
    val got = TopK.perKey(df, Seq("g"), Seq(col("id").asc), 1)
      .select("id").as[Long].collect().toSet
    val twin = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("id").asc)))
      .filter(col("rn") === 1).select("id").as[Long].collect().toSet
    assert(got == twin)
    assert(got == Set(1L, 3L), "one zero group (min id 1), one NaN group (min id 3)")
  }
}
