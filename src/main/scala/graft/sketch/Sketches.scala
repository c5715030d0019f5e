package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state summary sketches — the aggregation shapes that replace
  * full-keyspace shuffles when the keyspace (or the sort) is the thing
  * that doesn't fit at 100 TB.
  *
  * Unlike the HLL-based paths (`a13_approx_distinct`,
  * `w7_ntile_approx`), every sketch here is built from the repo's
  * deterministic 60-bit md5 hash, so the estimates are bit-reproducible
  * under any partitioning AND expressible in ANSI SQL — each gets a
  * DuckDB hash-compare oracle, not just a recall spec.
  *
  * Scale posture (the reason these exist):
  *  - the histogram sketch reduces a full sort (exact percentiles) to
  *    ONE linear scan with `bins` counters of state — a map-side
  *    partial aggregation over a fixed-size key domain, mergeable by
  *    addition across executors/batches;
  *  - the count-min sketch answers per-key frequency queries with
  *    `depth × width` counters regardless of key cardinality — the
  *    building block for heavy-hitter detection over keyspaces too
  *    large to group-by (URLs, n-grams, user agents at 100 TB);
  *  - both are one-pass and commutative, so they compose with
  *    Structured Streaming micro-batches (merge = elementwise sum).
  *
  * Reference anchor: the reference's dashboards compute exact
  * percentile/top-n summaries in the warehouse (README KPI list);
  * these are the scale-path twins of those summaries.
  */
object Sketches {

  /** Deterministic 60-bit salted hash (TextAnalysis.hash60 twin kept
    * local so the sketch module is self-contained). */
  private def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), c).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  // ---- fixed-bin histogram quantiles --------------------------------------

  /** Bin occupancy histogram over a declared [lo, lo + bins*width)
    * domain: one `groupBy` over at most `bins` keys (map-side combined,
    * so the shuffle moves ≤ bins rows per task regardless of input
    * size). Values outside the domain clamp to the edge bins. */
  def histogram(df: DataFrame, value: Column, lo: Double, width: Double, bins: Int): DataFrame =
    df.select(
        least(lit(bins - 1),
          greatest(lit(0), floor((value - lo) / width))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from the histogram by cumulative walk + linear
    * interpolation inside the crossing bin.
    *
    * Quantiles are passed as exact integer fractions (qnum/qden) and
    * the crossing rank is computed in integer arithmetic
    * (`ceil(q*n)` = `(qnum*n + qden - 1) div qden`), so the only
    * floating-point steps are the final interpolation divide/multiply —
    * written identically in the SQL oracle, hence bit-equal. The
    * post-histogram walk runs over ≤ bins rows (a single light
    * partition), which is the point: the heavy input never sorts. */
  def histQuantiles(df: DataFrame, value: Column, lo: Double, width: Double, bins: Int,
                    quantiles: Seq[(Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = histogram(df, value, lo, width, bins)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
    val qs = quantiles.toDF("qnum", "qden")
    qs.crossJoin(cum)
      // rank of the q-th value (1-based): ceil(q * n) in integer math.
      .withColumn("target", expr("(qnum * n + qden - 1) div qden"))
      .filter(col("cum") >= col("target"))
      .withColumn("pick", row_number().over(
        Window.partitionBy(col("qnum"), col("qden")).orderBy(col("bin"))))
      .filter(col("pick") === 1)
      .select(
        round(col("qnum").cast("double") / col("qden"), 4).as("q"),
        col("n"),
        round(lit(lo) + lit(width) * col("bin") +
          lit(width) * ((col("target") - (col("cum") - col("cnt"))).cast("double") /
            col("cnt").cast("double")), 6).as("est"))
  }

  /** Oracle SQL for [[histQuantiles]] over a one-column relation
    * `FROM (...) src(v)`; arithmetic mirrors the Scala exactly. */
  def histQuantilesSql(srcSql: String, lo: Double, width: Double, bins: Int,
                       quantiles: Seq[(Int, Int)]): String = {
    val qRows = quantiles.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    s"""WITH src AS ($srcSql),
       |hist AS (
       |  SELECT CAST(least(${bins - 1}, greatest(0, floor((v - $lo) / $width))) AS INT) AS bin,
       |         count(*) AS cnt
       |  FROM src GROUP BY 1),
       |cum AS (
       |  SELECT bin, cnt, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
       |         CAST(sum(cnt) OVER () AS BIGINT) AS n
       |  FROM hist),
       |qs AS (SELECT * FROM (VALUES $qRows) q(qnum, qden)),
       |hit AS (
       |  SELECT qnum, qden, n, bin, cnt, cum,
       |         (qnum * n + qden - 1) // qden AS target,
       |         row_number() OVER (PARTITION BY qnum, qden ORDER BY bin) AS pick
       |  FROM qs, cum
       |  WHERE cum >= (qnum * n + qden - 1) // qden)
       |SELECT round(CAST(qnum AS DOUBLE) / qden, 4) AS q, n,
       |       round($lo + $width * bin +
       |             $width * (CAST(target - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) AS est
       |FROM hit WHERE pick = 1 ORDER BY q""".stripMargin
  }

  /** [[histQuantiles]] per group — the sketch composed with grouping:
    * state is ≤ groups × bins counters (map-side combined), the
    * quantile walk runs inside each group's ≤bins-row partition, and
    * no group ever sorts its raw values. The per-group twin of a15's
    * exact grouped percentiles at any group cardinality. */
  def histQuantilesBy(df: DataFrame, group: Column, value: Column,
                      lo: Double, width: Double, bins: Int,
                      quantiles: Seq[(Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .select(group.as("grp"),
        least(lit(bins - 1),
          greatest(lit(0), floor((value - lo) / width))).cast("int").as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("grp")).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
    val qs = quantiles.toDF("qnum", "qden")
    qs.crossJoin(cum)
      .withColumn("target", expr("(qnum * n + qden - 1) div qden"))
      .filter(col("cum") >= col("target"))
      .withColumn("pick", row_number().over(
        Window.partitionBy(col("grp"), col("qnum"), col("qden"))
          .orderBy(col("bin"))))
      .filter(col("pick") === 1)
      .select(col("grp"),
        round(col("qnum").cast("double") / col("qden"), 4).as("q"),
        col("n"),
        round(lit(lo) + lit(width) * col("bin") +
          lit(width) * ((col("target") - (col("cum") - col("cnt"))).cast("double") /
            col("cnt").cast("double")), 6).as("est"))
  }

  /** Oracle SQL for [[histQuantilesBy]] over a two-column relation
    * `FROM (...) src(g, v)`; arithmetic mirrors the Scala exactly. */
  def histQuantilesBySql(srcSql: String, outName: String,
                         lo: Double, width: Double, bins: Int,
                         quantiles: Seq[(Int, Int)]): String = {
    val qRows = quantiles.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    s"""WITH src AS ($srcSql),
       |hist AS (
       |  SELECT g, CAST(least(${bins - 1}, greatest(0, floor((v - $lo) / $width))) AS INT) AS bin,
       |         count(*) AS cnt
       |  FROM src GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, bin, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS BIGINT) AS cum,
       |         CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
       |  FROM hist),
       |qs AS (SELECT * FROM (VALUES $qRows) q(qnum, qden)),
       |hit AS (
       |  SELECT g, qnum, qden, n, bin, cnt, cum,
       |         (qnum * n + qden - 1) // qden AS target,
       |         row_number() OVER (PARTITION BY g, qnum, qden ORDER BY bin) AS pick
       |  FROM qs, cum
       |  WHERE cum >= (qnum * n + qden - 1) // qden)
       |SELECT g AS $outName, round(CAST(qnum AS DOUBLE) / qden, 4) AS q, n,
       |       round($lo + $width * bin +
       |             $width * (CAST(target - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) AS est
       |FROM hit WHERE pick = 1 ORDER BY $outName, q""".stripMargin
  }

  /** W14: TRAILING-WINDOW sketch quantiles — for every day with data,
    * the histogram-sketch quantiles of the last `windowDays` days of
    * values (the "did quality drift this week" rolling monitor).
    *
    * Rolling percentiles are normally the worst of both worlds (a
    * sort per window position); the sketch makes the window FOLDABLE:
    * daily bin counts are a monoid, so each (day, bin, cnt) row fans
    * out to the ≤windowDays window anchors it contributes to (the w12
    * rolling-distinct trick) and one sum per (anchor, bin) rebuilds
    * every window's histogram — shuffle volume is windowDays ×
    * |days × bins| TINY rows regardless of event volume, and no raw
    * value is ever sorted. Integer crossing-rank + one documented
    * interpolation per quantile (dq6's arithmetic) keeps it
    * bit-reproducible, so this rolling APPROXIMATE path is
    * hash-oracled like dq6/dq9. */
  def rollingHistQuantiles(df: DataFrame, day: Column, value: Column,
                           lo: Double, width: Double, bins: Int,
                           windowDays: Int,
                           quantiles: Seq[(Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .select(day.as("day"),
        least(lit(bins - 1),
          greatest(lit(0), floor((value - lo) / width))).cast("int").as("bin"))
      .groupBy("day", "bin").agg(count(lit(1)).as("cnt"))
    // anchors = days that have their OWN data (the oracle's day set);
    // a |calendar|-bounded table — broadcast.
    val anchors = hist.select(col("day")).distinct()
    val rolled = hist
      .select(explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("anchor"), col("bin"), col("cnt"))
      .join(broadcast(anchors.select(col("day").as("anchor"))), "anchor")
      .groupBy(col("anchor"), col("bin")).agg(sum(col("cnt")).as("cnt"))
    val cum = rolled
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("anchor")).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("anchor"))))
    val qs = quantiles.toDF("qnum", "qden")
    qs.crossJoin(cum)
      .withColumn("target", expr("(qnum * n + qden - 1) div qden"))
      .filter(col("cum") >= col("target"))
      .withColumn("pick", row_number().over(
        Window.partitionBy(col("anchor"), col("qnum"), col("qden"))
          .orderBy(col("bin"))))
      .filter(col("pick") === 1)
      .select(col("anchor").as("day"),
        round(col("qnum").cast("double") / col("qden"), 4).as("q"),
        col("n"),
        round(lit(lo) + lit(width) * col("bin") +
          lit(width) * ((col("target") - (col("cum") - col("cnt"))).cast("double") /
            col("cnt").cast("double")), 6).as("est"))
  }

  /** Oracle SQL for [[rollingHistQuantiles]] over a two-column relation
    * `FROM (...) src(day, v)`; arithmetic mirrors the Scala exactly
    * (the fan-out join is expressed as the equivalent window-range
    * join — same (anchor, bin) sums). */
  def rollingHistQuantilesSql(srcSql: String,
                              lo: Double, width: Double, bins: Int,
                              windowDays: Int,
                              quantiles: Seq[(Int, Int)]): String = {
    val qRows = quantiles.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    s"""WITH src AS ($srcSql),
       |hist AS (
       |  SELECT day, CAST(least(${bins - 1}, greatest(0, floor((v - $lo) / $width))) AS INT) AS bin,
       |         count(*) AS cnt
       |  FROM src GROUP BY 1, 2),
       |anchors AS (SELECT DISTINCT day FROM hist),
       |rolled AS (
       |  SELECT a.day, h.bin, sum(h.cnt) AS cnt
       |  FROM anchors a JOIN hist h
       |    ON h.day <= a.day AND h.day >= a.day - ${windowDays - 1}
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT day, bin, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY day ORDER BY bin) AS BIGINT) AS cum,
       |         CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS n
       |  FROM rolled),
       |qs AS (SELECT * FROM (VALUES $qRows) q(qnum, qden)),
       |hit AS (
       |  SELECT day, qnum, qden, n, bin, cnt, cum,
       |         (qnum * n + qden - 1) // qden AS target,
       |         row_number() OVER (PARTITION BY day, qnum, qden ORDER BY bin) AS pick
       |  FROM qs, cum
       |  WHERE cum >= (qnum * n + qden - 1) // qden)
       |SELECT day, round(CAST(qnum AS DOUBLE) / qden, 4) AS q, n,
       |       round($lo + $width * bin +
       |             $width * (CAST(target - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)), 6) AS est
       |FROM hit WHERE pick = 1 ORDER BY day, q""".stripMargin
  }

  // ---- count-min sketch ---------------------------------------------------

  val CMS_DEPTH = 4
  val CMS_WIDTH = 256

  /** CMS counter table: `depth × width` cells, cell (r,c) = number of
    * rows whose r-th hash lands in column c. Built as ONE groupBy over
    * a ≤ depth*width key domain (each input row contributes `depth`
    * (r,c) pairs via posexplode) — partial aggregation collapses the
    * shuffle to ≤ depth*width rows per task. Merging two sketches is
    * elementwise addition, which is how a streaming deployment folds
    * micro-batches into a standing sketch. */
  def cmsCounters(df: DataFrame, key: Column): DataFrame = {
    val cells = array((0 until CMS_DEPTH).map(r => pmod(hash60(key, s"cms$r"), lit(CMS_WIDTH))): _*)
    df.select(posexplode(cells).as(Seq("r", "c")))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of every distinct key: min over the
    * key's depth cells. The counter table broadcasts (≤ depth*width
    * rows — a few KB at any corpus size), so estimation is a scan of
    * the DISTINCT keys with a broadcast join, never a re-shuffle of
    * the raw rows. Estimates are biased high (collisions only add),
    * never low — the CMS guarantee the spec asserts. */
  def cmsEstimates(df: DataFrame, key: Column): DataFrame = {
    val counters = cmsCounters(df, key)
    val keyed = df.select(key.as("k")).distinct()
      .select(col("k"), posexplode(
        array((0 until CMS_DEPTH).map(r => pmod(hash60(col("k"), s"cms$r"), lit(CMS_WIDTH))): _*))
        .as(Seq("r", "c")))
    keyed.join(broadcast(counters), Seq("r", "c"))
      .groupBy("k").agg(min(col("cnt")).as("est"))
  }

  /** [[cmsEstimates]] built from an already-aggregated (key, count)
    * table instead of the raw rows. Definitionally identical — cell
    * (r,c) = Σ_{k: h_r(k)=c} count(k) whether the rows stream through
    * the hash or their counts do (SketchSpec pins the equivalence) —
    * but ONE scan of the raw input instead of three when the exact
    * counts are needed anyway (the a25 leaderboard joins them). The
    * raw-row [[cmsEstimates]] stays the deployment shape for keyspaces
    * too large to group exactly — which is the sketch's reason to
    * exist. Pass the per-key frame pre-checkpointed so its two uses
    * (counters + estimates) read memory, not the source. */
  def cmsFromCounts(perKey: DataFrame, key: Column, cnt: Column): DataFrame = {
    val cells = perKey.select(key.as("k"), cnt.as("w"), posexplode(
        array((0 until CMS_DEPTH).map(r => pmod(hash60(key, s"cms$r"), lit(CMS_WIDTH))): _*))
      .as(Seq("r", "c")))
    val counters = cells.groupBy("r", "c").agg(sum(col("w")).as("cnt"))
    cells.select("k", "r", "c").join(broadcast(counters), Seq("r", "c"))
      .groupBy("k").agg(min(col("cnt")).as("est"))
  }

  /** Oracle SQL for the raw [[cmsCounters]] cell table over a
    * one-column relation `FROM (...) src(k)` — the st15 streaming
    * twin's oracle (the counters ARE the mergeable state, so the twin
    * verifies them directly). */
  def cmsCountersSql(srcSql: String): String = {
    val hashes = (0 until CMS_DEPTH).map { r =>
      s"SELECT $r AS r, ('0x' || substr(md5('cms$r:' || k), 1, 15))::BIGINT % $CMS_WIDTH AS c FROM src"
    }.mkString(" UNION ALL ")
    s"""WITH src AS ($srcSql),
       |cells AS ($hashes)
       |SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c ORDER BY r, c""".stripMargin
  }

  // ---- KMV distinct-count sketch ------------------------------------------

  /** K-minimum-values distinct estimator (Bar-Yossef et al. 2002) on
    * the deterministic md5 hash — the hash-oracled twin of
    * `approx_count_distinct`: per group, keep the k smallest DISTINCT
    * 60-bit hashes of the value; if fewer than k distinct hashes exist
    * the count is exact, otherwise the k-th smallest normalized hash
    * h/2^60 estimates density and `(k−1)·2^60/h_k` the cardinality.
    * Every step (md5, integer compare, one double divide, 4dp round)
    * replays identically in SQL — the dq6/a25 recipe applied to the
    * HLL `no_oracle` paths.
    *
    * Scale: per-group state is ≤ k hashes. The distinct-hash reduce is
    * map-side combinable, and the k-smallest selection runs on the
    * engine's own [[graft.plans.TopKPerKeyNode]] heap operator — the
    * shuffle carries ≤ partitions × groups × k hash rows, never the
    * raw keyspace (the reason the HLL form existed). Estimates are
    * partition-order independent (set semantics), unlike HLL only in
    * that they are also ENGINE-independent.
    *
    * `value` is hashed via its canonical string form — cast
    * numeric/decimal columns to an exact string type (e.g.
    * `decimal(18,2)`) at the call site so both engines render
    * identical bytes. NULLs are excluded, matching
    * `approx_count_distinct`/`count(DISTINCT ...)`. */
  /** The KMV hash column (md5-60-bit, "kmv" salt) — public so the
    * streaming fold ([[graft.streaming.StreamIngest.kmvDistinctStream]])
    * hashes identically to the batch sketch. */
  def kmvHash(value: Column): Column = hash60(value.cast("string"), "kmv")

  def kmvDistinct(df: DataFrame, group: Column, value: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashes = df.filter(value.isNotNull)
      .select(group.as("grp"), kmvHash(value).as("h"))
      .distinct()
    val kept = graft.operators.TopK.perKey(hashes, Seq("grp"), Seq(col("h").asc), k)
    kept.groupBy("grp")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("grp"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
              col("hk").cast("double"), 4))
          .as("est_distinct"))
  }

  /** Oracle SQL for [[kmvDistinct]] over a two-column relation
    * `FROM (...) src(g, v)` (v already cast to its canonical VARCHAR);
    * emits `(outName, est_distinct)`, arithmetic mirroring the Scala
    * exactly (255·2^60 is exact in a double; the divide is the only
    * inexact step and is written identically). */
  def kmvDistinctSql(srcSql: String, outName: String, k: Int = 256): String =
    s"""WITH src AS ($srcSql),
       |h AS (SELECT DISTINCT g, ('0x' || substr(md5('kmv:' || v), 1, 15))::BIGINT AS h
       |  FROM src WHERE v IS NOT NULL),
       |topk AS (SELECT g, h FROM (
       |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h)
       |  WHERE rn <= $k),
       |agg AS (SELECT g, count(*) AS n_kept, max(h) AS hk FROM topk GROUP BY g)
       |SELECT g AS $outName,
       |  CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |       ELSE round((${k - 1} * 1152921504606846976.0) / CAST(hk AS DOUBLE), 4)
       |  END AS est_distinct
       |FROM agg""".stripMargin

  /** KMV SET-OPERATION estimation (Beyer et al. 2007, "On Synopses
    * for Distinct-Value Estimation") — the property that makes KMV
    * the warehouse sketch: two sketches COMPOSE. The k smallest
    * hashes of A ∪ B are a subset of kmv(A) ∪ kmv(B), so the union
    * sketch merges without touching the data; and because the merged
    * sketch is a uniform sample of A ∪ B's hash space, the fraction
    * of its entries present in BOTH input sketches estimates the
    * Jaccard — |A∩B| ≈ (K∩/k)·|A∪B|. Distinct-count audits across
    * segments ("how many users do these two funnels share") run on
    * ≤k-row synopses instead of re-scanning either side.
    *
    * Same determinism contract as [[kmvDistinct]] (md5-60 hashes,
    * integer compares, one double divide per estimate, 4dp round) —
    * the sketch ALGEBRA itself is hash-oracled. When the merged
    * sketch holds fewer than k hashes it is exhaustive and both
    * estimates are exact counts.
    *
    * @return one row: (n_kept, k_common, est_union, est_intersection)
    */
  def kmvSetOps(df: DataFrame, tag: Column, value: Column,
      tagA: String, tagB: String, k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashes = df.filter(value.isNotNull && (tag === tagA || tag === tagB))
      .select(tag.as("tg"), kmvHash(value).as("h"))
      .distinct()
    val kept = graft.operators.TopK.perKey(hashes, Seq("tg"), Seq(col("h").asc), k)
      .localCheckpoint(true) // ≤ 2k rows; consumed by 3 frames below
    val keptA = kept.filter(col("tg") === tagA).select(col("h"))
    val keptB = kept.filter(col("tg") === tagB).select(col("h"))
    val merged = keptA.union(keptB).distinct().orderBy(col("h")).limit(k)
      .localCheckpoint(true)
    val estU = lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
      col("hk").cast("double")
    merged.agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .crossJoin(broadcast(
        merged.join(keptA, Seq("h"), "left_semi")
          .join(keptB, Seq("h"), "left_semi")
          .agg(count(lit(1)).as("k_common"))))
      .select(col("n_kept"), col("k_common"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(estU, 4)).as("est_union"),
        when(col("n_kept") < k, col("k_common").cast("double"))
          .otherwise(round(col("k_common").cast("double") * estU / k, 4))
          .as("est_intersection"))
  }

  /** Oracle SQL for [[kmvSetOps]] over a two-column relation
    * `FROM (...) src(tg, v)` — sketch construction, merge, and both
    * estimates mirrored exactly. */
  def kmvSetOpsSql(srcSql: String, tagA: String, tagB: String,
      k: Int = 256): String =
    s"""WITH src AS ($srcSql),
       |h AS (SELECT DISTINCT tg, ('0x' || substr(md5('kmv:' || v), 1, 15))::BIGINT AS h
       |  FROM src WHERE v IS NOT NULL AND tg IN ('$tagA', '$tagB')),
       |ka AS (SELECT h FROM (
       |    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h WHERE tg = '$tagA')
       |  WHERE rn <= $k),
       |kb AS (SELECT h FROM (
       |    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h WHERE tg = '$tagB')
       |  WHERE rn <= $k),
       |merged AS (SELECT h FROM (
       |    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
       |      SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)))
       |  WHERE rn <= $k),
       |ms AS (SELECT count(*) AS n_kept, max(h) AS hk FROM merged),
       |cm AS (SELECT count(*) AS k_common FROM merged
       |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb))
       |SELECT n_kept, k_common,
       |  CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |       ELSE round((${k - 1} * 1152921504606846976.0) / CAST(hk AS DOUBLE), 4)
       |  END AS est_union,
       |  CASE WHEN n_kept < $k THEN CAST(k_common AS DOUBLE)
       |       ELSE round(CAST(k_common AS DOUBLE) *
       |         ((${k - 1} * 1152921504606846976.0) / CAST(hk AS DOUBLE)) / $k, 4)
       |  END AS est_intersection
       |FROM ms, cm""".stripMargin

  // ---- HyperLogLog (register form) ----------------------------------------

  /** HLL register count (p = 6 ⇒ m = 64, standard error 1.04/√64 ≈ 13%). */
  val HLL_M = 64

  /** Fixed-point numerator of the raw HLL estimator: round(α₆₄·10⁶) ·
    * m² · 2⁵⁵, where α₆₄ = 0.7213/(1 + 1.079/64) (Flajolet et al.
    * 2007). Held as a decimal literal so BOTH engines divide the same
    * exact integer. */
  val HLL_NUM: String = "104680255103913656422760448" // 709341 * 4096 * 2^55

  /** A32: HyperLogLog distinct estimation — the REGISTER sketch
    * (Flajolet et al. 2007), complementing [[kmvDistinct]]'s order-
    * statistics sketch: state is m = 64 five-bit registers per group
    * REGARDLESS of cardinality (KMV keeps k full hashes), registers
    * merge by elementwise max (union across executors, shards, days),
    * and the estimate is the bias-corrected harmonic mean of register
    * maxima.
    *
    * Bit-reproducible end to end, so the estimate is hash-oracled,
    * not spec-only: the 60-bit md5 hash splits into a 6-bit register
    * index and a 54-bit pattern w; ρ = 55 − bitlen(w) (the 1-based
    * position of w's highest set bit from the field's MSB; w = 0 ⇒ 55)
    * computed via `length(bin(w))` — identical minimal-binary
    * semantics in Spark and DuckDB; the harmonic sum runs EXACTLY in
    * 64-bit integers as S = Σ 2^(55−Mⱼ) + (m − hit)·2⁵⁵ ≤ 2⁶¹, and the
    * estimate is ONE decimal integer division [[HLL_NUM]] div (S·10⁶)
    * — no float enters at any step.
    *
    * Scale posture: the aggregation state is 64 counters per group
    * (map-side combined), the shuffle moves ≤ 64 rows per group per
    * task, and nothing is ever sorted or retained — the shape that
    * counts distinct users per segment at 100 TB in one pass. The raw
    * estimator is emitted as-is (no small-range linear-counting
    * branch — it needs ln(); `m_hit` is emitted so a consumer can
    * apply it); callers needing small-range exactness use
    * [[kmvDistinct]], exact below k by construction.
    *
    * @return (grp, m_hit, hll_est): registers touched and the raw
    *         HLL estimate as a BIGINT. */
  /** The (register, ρ) pair for a value's 60-bit HLL hash — public so
    * the streaming fold ([[graft.streaming.StreamIngest.hllDistinctStream]])
    * builds bit-identical register state to the batch sketch. */
  def hllRegRho(value: Column): (Column, Column) = {
    val h = hash60(value.cast("string"), "hll")
    val w = shiftright(h, 6) // h div 64: h is nonnegative
    (pmod(h, lit(HLL_M)),
      when(w === 0, lit(55)).otherwise(lit(55) - length(bin(w))).cast("int"))
  }

  def hllDistinct(df: DataFrame, group: Column, value: Column): DataFrame = {
    val (reg, rhoC) = hllRegRho(value)
    val rho = df.filter(value.isNotNull)
      .select(group.as("grp"), reg.as("reg"), rhoC.as("rho"))
    rho.groupBy("grp", "reg").agg(max(col("rho")).as("m"))
      .groupBy("grp")
      .agg(count(lit(1)).as("m_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).as("s_hit"))
      .select(col("grp"), col("m_hit"),
        expr(s"""CAST(CAST('$HLL_NUM' AS DECIMAL(38,0)) div
                 |  (CAST(s_hit + ($HLL_M - m_hit) * CAST(36028797018963968 AS BIGINT)
                 |     AS DECIMAL(38,0)) * 1000000) AS BIGINT)""".stripMargin)
          .as("hll_est"))
  }

  /** Oracle SQL for [[hllDistinct]] over a two-column relation
    * `FROM (...) src(g, v)` (v pre-cast to canonical VARCHAR); emits
    * `(outName, m_hit, hll_est)`, every step the exact-integer twin of
    * the Scala (md5-60 split, bin()-length ρ, 2^(55−M) harmonic sum,
    * one HUGEINT division). */
  def hllDistinctSql(srcSql: String, outName: String): String =
    s"""WITH src AS ($srcSql),
       |h AS (SELECT g, ('0x' || substr(md5('hll:' || v), 1, 15))::BIGINT AS h
       |  FROM src WHERE v IS NOT NULL),
       |rho AS (SELECT g, h % $HLL_M AS reg,
       |  CASE WHEN h // $HLL_M = 0 THEN 55
       |       ELSE 55 - length(bin(h // $HLL_M)) END AS rho FROM h),
       |regs AS (SELECT g, reg, max(rho) AS m FROM rho GROUP BY g, reg),
       |agg AS (SELECT g, count(*) AS m_hit,
       |    sum(CAST(1 AS BIGINT) << (55 - m)) AS s_hit FROM regs GROUP BY g)
       |SELECT g AS $outName, CAST(m_hit AS BIGINT) AS m_hit,
       |  CAST(CAST('$HLL_NUM' AS HUGEINT) //
       |    (CAST(s_hit + ($HLL_M - m_hit) * 36028797018963968 AS HUGEINT) * 1000000)
       |    AS BIGINT) AS hll_est
       |FROM agg""".stripMargin

  /** Oracle SQL for [[cmsEstimates]] joined with exact counts, over a
    * one-column relation `FROM (...) src(k)`; the key is emitted as
    * `outName` so the driver's by-name column compare lines up. */
  def cmsTopSql(srcSql: String, outName: String, limit: Int): String = {
    val hashes = (0 until CMS_DEPTH).map { r =>
      s"SELECT $r AS r, ('0x' || substr(md5('cms$r:' || k), 1, 15))::BIGINT % $CMS_WIDTH AS c, k FROM src"
    }.mkString(" UNION ALL ")
    s"""WITH src AS ($srcSql),
       |cells AS ($hashes),
       |counters AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY r, c),
       |keys AS (SELECT DISTINCT r, c, k FROM cells),
       |est AS (
       |  SELECT k, min(cnt) AS est FROM keys JOIN counters USING (r, c) GROUP BY k),
       |exact AS (SELECT k, count(*) AS exact FROM src GROUP BY k)
       |SELECT k AS $outName, est, exact FROM est JOIN exact USING (k)
       |ORDER BY est DESC, k LIMIT $limit""".stripMargin
  }
}
