package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

/** Bounded-state sketches: estimator guarantees (CMS one-sided error,
  * histogram-quantile error ≤ one bin width vs the exact percentile)
  * and partitioning-independence of the estimates. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir)

  test("histogram quantile estimate is within one bin width of the exact percentile") {
    val qs = Seq(1 -> 4, 1 -> 2, 3 -> 4, 9 -> 10)
    val est = Sketches.histQuantiles(events, col("value"), 0.0, 8.0, 64, qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val exact = events
      .agg(expr("percentile(value, 0.25)"), expr("percentile(value, 0.5)"),
        expr("percentile(value, 0.75)"), expr("percentile(value, 0.9)"))
      .as[(Double, Double, Double, Double)].head()
    val pairs = Seq(0.25 -> exact._1, 0.5 -> exact._2, 0.75 -> exact._3, 0.9 -> exact._4)
    pairs.foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= 8.0, s"q=$q est=${est(q)} exact=$ex")
    }
  }

  test("histogram quantiles are partitioning-independent") {
    val qs = Seq(1 -> 4, 1 -> 2, 9 -> 10, 99 -> 100)
    val a = Sketches.histQuantiles(events, col("value"), 0.0, 8.0, 64, qs)
      .select("q", "n", "est").as[(Double, Long, Double)].collect().sortBy(_._1)
    val b = Sketches.histQuantiles(events.repartition(13), col("value"), 0.0, 8.0, 64, qs)
      .select("q", "n", "est").as[(Double, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("grouped histogram quantiles: per-group bin-width bound, single-group ≡ global") {
    val qs = Seq(1 -> 4, 1 -> 2, 3 -> 4, 9 -> 10)
    // per-group estimates within one bin width of each group's exact percentile
    val est = Sketches.histQuantilesBy(events, col("event_type"), col("value"),
        0.0, 8.0, 64, qs)
      .select("grp", "q", "est").as[(String, Double, Double)].collect()
      .map { case (g, q, e) => (g, q) -> e }.toMap
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.25)"), expr("percentile(value, 0.5)"),
        expr("percentile(value, 0.75)"), expr("percentile(value, 0.9)"))
      .as[(String, Double, Double, Double, Double)].collect()
    exact.foreach { case (g, p25, p50, p75, p90) =>
      Seq(0.25 -> p25, 0.5 -> p50, 0.75 -> p75, 0.9 -> p90).foreach { case (q, ex) =>
        assert(math.abs(est((g, q)) - ex) <= 8.0, s"g=$g q=$q")
      }
    }
    // degenerate single group reproduces the global sketch exactly
    val one = Sketches.histQuantilesBy(events, lit("all"), col("value"), 0.0, 8.0, 64, qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val glob = Sketches.histQuantiles(events, col("value"), 0.0, 8.0, 64, qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    assert(one === glob)
  }

  test("KMV set ops: exhaustive sketches are exact; saturated estimates land near truth") {
    // A = {0..149}, B = {100..299}: |A∪B| = 300, |A∩B| = 50
    val rows = ((0 until 150).map(i => ("a", i.toLong)) ++
      (100 until 300).map(i => ("b", i.toLong))).toDF("tg", "v")
    // k = 512 > 300 distinct: the merged sketch is exhaustive — both
    // estimates must be the EXACT counts
    val exact = Sketches.kmvSetOps(rows, col("tg"), col("v").cast("string"),
        "a", "b", k = 512)
      .as[(Long, Long, Double, Double)].collect().head
    assert(exact === ((300L, 50L, 300.0, 50.0)), s"exhaustive must be exact: $exact")
    // k = 64 << 300: saturated sketch — estimates are approximate but
    // must land within the KMV error envelope (~1/sqrt(k) ≈ 12.5%;
    // assert a generous 35% so the pin survives any seed)
    val est = Sketches.kmvSetOps(rows, col("tg"), col("v").cast("string"),
        "a", "b", k = 64)
      .as[(Long, Long, Double, Double)].collect().head
    assert(est._1 === 64L, "saturated sketch keeps exactly k")
    assert(math.abs(est._3 - 300.0) / 300.0 < 0.35, s"union estimate: $est")
    assert(math.abs(est._4 - 50.0) / 50.0 < 0.75, s"intersection estimate: $est")
    // estimates are partitioning-independent (set semantics end to end)
    val resharded = Sketches.kmvSetOps(rows.repartition(13), col("tg"),
        col("v").cast("string"), "a", "b", k = 64)
      .as[(Long, Long, Double, Double)].collect().head
    assert(resharded === est, "sketch must not depend on sharding")
  }

  test("CMS estimates are one-sided: est >= exact for every key") {
    val exact = events.groupBy(col("user_id").as("k")).agg(count(lit(1)).as("exact"))
    val bad = Sketches.cmsEstimates(events, col("user_id"))
      .join(exact, "k")
      .filter(col("est") < col("exact"))
      .count()
    assert(bad === 0L)
  }

  test("CMS counter table is bounded by depth x width and sums to depth x n") {
    val counters = Sketches.cmsCounters(events, col("user_id"))
    assert(counters.count() <= Sketches.CMS_DEPTH.toLong * Sketches.CMS_WIDTH)
    val total = counters.agg(sum("cnt")).as[Long].head()
    assert(total === Sketches.CMS_DEPTH * events.count())
  }

  test("CMS from per-key counts equals CMS from raw rows (weighted-cell identity)") {
    val fromRows = Sketches.cmsEstimates(events, col("user_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val perKey = events.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
    val fromCounts = Sketches.cmsFromCounts(perKey, col("user_id"), col("exact"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(fromRows.toSeq === fromCounts.toSeq)
  }

  test("rolling quantile with a 1-day window equals the per-day grouped sketch") {
    val qs = Seq(1 -> 2, 9 -> 10)
    val rolled = Sketches.rollingHistQuantiles(events, to_date(col("ts")),
        col("value"), 0.0, 8.0, 64, windowDays = 1, qs)
      .select(col("day").cast("string"), col("q"), col("n"), col("est"))
    val grouped = Sketches.histQuantilesBy(events, to_date(col("ts")),
        col("value"), 0.0, 8.0, 64, qs)
      .select(col("grp").cast("string").as("day"), col("q"), col("n"), col("est"))
    assert(rolled.exceptAll(grouped).isEmpty && grouped.exceptAll(rolled).isEmpty)
  }

  test("rolling 7-day window count equals the window's raw row count per anchor") {
    val rolled = Sketches.rollingHistQuantiles(events, to_date(col("ts")),
        col("value"), 0.0, 8.0, 64, windowDays = 7, Seq(1 -> 2))
      .select(col("day"), col("n")).as[(java.sql.Date, Long)].collect().toMap
    val days = events.select(to_date(col("ts")).as("d")).distinct()
      .as[java.sql.Date].collect()
    val perDay = events.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).as[(java.sql.Date, Long)].collect().toMap
    days.foreach { d =>
      val want = perDay.filter { case (k, _) =>
        !k.after(d) && k.toLocalDate.plusDays(6).compareTo(d.toLocalDate) >= 0
      }.values.sum
      assert(rolled(d) === want, s"anchor $d")
    }
  }

  test("CMS estimates are partitioning-independent (sketch merge is commutative)") {
    val a = Sketches.cmsEstimates(events, col("user_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = Sketches.cmsEstimates(events.repartition(7), col("user_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("KMV distinct: exact below k, within the 1/sqrt(k) band above it, reshard-stable") {
    // synthetic groups with KNOWN cardinalities straddling k=64:
    // g_small has 40 distinct values (< k → exact), g_big has 5000
    val rows = (1 to 40).map(i => ("g_small", s"v$i")) ++
      (1 to 5000).flatMap(i => Seq(("g_big", s"w$i"), ("g_big", s"w$i"))) // dups collapse
    val df = rows.toDF("g", "v")
    val est = Sketches.kmvDistinct(df, col("g"), col("v"), k = 64)
      .as[(String, Double)].collect().toMap
    assert(est("g_small") == 40.0, "below k the KMV count is exact")
    // standard KMV relative error ~ 1/sqrt(k) = 12.5%; allow 3 sigma
    assert(math.abs(est("g_big") - 5000.0) / 5000.0 < 0.375,
      s"KMV estimate ${est("g_big")} too far from 5000")
    // estimates are set-functions of the values: partitioning-independent
    val resharded = Sketches.kmvDistinct(df.repartition(13), col("g"), col("v"), k = 64)
      .as[(String, Double)].collect().toMap
    assert(resharded === est)
  }

  test("HLL distinct: within the 3-sigma register band, merge = max, reshard-stable") {
    // m = 64 registers ⇒ standard error 1.04/8 = 13%; allow 3 sigma.
    // Cardinalities well above the small-range zone (~2.5m = 160).
    val rows = (1 to 2000).map(i => ("g_a", s"v$i")) ++
      (1 to 8000).flatMap(i => Seq(("g_b", s"w$i"), ("g_b", s"w$i")))
    val df = rows.toDF("g", "v")
    val est = Sketches.hllDistinct(df, col("g"), col("v"))
      .select("grp", "hll_est").as[(String, Long)].collect().toMap
    assert(math.abs(est("g_a") - 2000.0) / 2000.0 < 0.39,
      s"HLL estimate ${est("g_a")} too far from 2000")
    assert(math.abs(est("g_b") - 8000.0) / 8000.0 < 0.39,
      s"HLL estimate ${est("g_b")} too far from 8000")
    // registers merge by max ⇒ the estimate is a set function of the
    // values: duplicate-insensitive and partitioning-independent
    val resharded = Sketches.hllDistinct(df.repartition(13), col("g"), col("v"))
      .select("grp", "hll_est").as[(String, Long)].collect().toMap
    assert(resharded === est)
    val deduped = Sketches.hllDistinct(df.distinct(), col("g"), col("v"))
      .select("grp", "hll_est").as[(String, Long)].collect().toMap
    assert(deduped === est, "HLL must be duplicate-insensitive")
  }
}
