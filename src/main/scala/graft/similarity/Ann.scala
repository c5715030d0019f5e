package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prepared vector row (cast-to-double embedding + precomputed norm).
  * Top-level: Encoders for nested/private case classes fall back to
  * interpreted paths. */
case class PreparedVec(vec_id: Long, v: Array[Double], nrm: Double)

/** One vector's membership in one (LSH table, bucket) cell. */
case class BucketedVec(tbl: Int, bucket: Int, vec_id: Long, v: Array[Double], nrm: Double)

/** One vector's membership in its (unique) IVF cell. */
case class CellVec(cell: Int, vec_id: Long, v: Array[Double], nrm: Double)

/** One query's probe of one IVF cell (nProbe rows per query). */
case class CellProbe(cell: Int, query_id: Long, qv: Array[Double], qn: Double)

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - [[cosineTopK]]: brute-force all-pairs cosine top-k — the exact
  *    baseline. The small side is broadcast, so the cartesian product
  *    is map-side only (no shuffle of the big side); cost is O(n·m·d).
  *  - [[lshTopK]]: random-hyperplane (sign) LSH — vectors land in
  *    2^planes buckets via deterministic ±1 projections; candidates
  *    only form within a bucket, turning O(n²) into an equality join.
  *    This is the 100 TB path: bucket id is a tiny int key, and recall
  *    is tunable via the plane count (fewer planes = bigger buckets).
  *
  * Determinism: vectors are cast float→double (exact) and the dot
  * product is a strict left fold (`aggregate`), so the DuckDB oracle's
  * `list_reduce` fold reproduces it bit-for-bit.
  */
object Ann {

  /** Hard admission bound for the driver-collected O(n²) CONTROL
    * kernels ([[cosineTopKBlocked]], [[cosineNearDupPairs]]). These
    * exist as oracle baselines and recall-evaluation references; the
    * production serving paths are the bucketed compositions (LSH/IVF/
    * PQ — e21/e25/e27/e28/e34). 200k 64-dim doubles ≈ 100 MB of
    * broadcast — comfortably inside one executor, far outside any
    * corpus a baseline should ever scan pairwise. Above the bound the
    * kernel DEGRADES to the bucketed LSH path (with a loud warning) so
    * no production path can silently ride an unbounded
    * corpus-to-driver collect at scale — the guard is a fallback
    * ramp, not a wall. */
  val MaxControlCorpus: Long = 200000L

  /** Overflow notice for the control kernels when they degrade to the
    * bucketed path: the count that gates it is a cheap distributed
    * aggregate; the collect only happens once the corpus is proven
    * bounded. */
  private def warnControlOverflow(n: Long, max: Long, caller: String,
      escape: String): Unit =
    org.slf4j.LoggerFactory.getLogger("graft.similarity.Ann").warn(
      s"$caller is a driver-collected O(n²) control baseline, admitted up " +
      s"to $max vectors (got $n) — DEGRADING to the bucketed $escape path. " +
      "The answer is the LSH approximation, not the exact scan (any " +
      "EXACT-oracle comparison of this call will mismatch above the " +
      "bound); pin an evaluation sample if you need the exact control " +
      "at this scale.")

  /** Strict left-fold dot product — native codegen'd expression (26s →
    * ~2s on the sf0.1 ANN query vs the interpreted aggregate/zip_with
    * formulation; identical fp semantics, see DotProduct scaladoc). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  /** L2 norm via the same strict left fold (dot(v, v)). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Vectors with precomputed norms (norm once per vector, not per pair). */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact brute-force cosine top-k neighbors per query vector. */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val e = prepared(embeddings)
    val q = e.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val sims = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    sims
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Blocked all-pairs top-k kernel: broadcast the candidate matrix
    * once, scan query vectors with `mapPartitions`, keep a per-query
    * bounded top-k selection — no n² row materialization (the join
    * formulation pays ~1µs of row machinery per pair; this kernel does
    * the 64-dim dot in-register).
    *
    * This is the documented `mapPartitions` last resort (SURVEY.md
    * §2.9 preference order) taken deliberately: top-k-per-query is
    * genuinely imperative (bounded selection state per row). At scale
    * the candidate side is an IVF/LSH shard that fits executor memory;
    * the query side streams. Output is bit-identical to [[cosineTopK]]
    * (same left-fold dot, same (sim desc, id asc) order, same HALF_UP
    * rounding), so it shares the same DuckDB oracle.
    */
  def cosineTopKBlocked(embeddings: DataFrame, k: Int,
      maxControlCorpus: Long = MaxControlCorpus): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm")).as[(Long, Array[Double], Double)]
    val nVecs = vecs.count()
    if (nVecs > maxControlCorpus) {
      // graceful escape (r16 verdict #3): above the control bound,
      // return the bucketed LSH answer instead of throwing — same
      // schema, same fold/tiebreak/rounding; recall is the LSH
      // approximation (asserted vs this kernel in AnnSpec).
      warnControlOverflow(nVecs, maxControlCorpus, "cosineTopKBlocked", "lshTopK")
      return lshTopK(embeddings, k)
    }
    val bc = spark.sparkContext.broadcast(vecs.collect())
    val out = vecs.mapPartitions { it =>
      val cands = bc.value
      it.flatMap { case (qid, qv, qn) =>
        val ids = new Array[Long](k)
        val sims = new Array[Double](k)
        var filled = 0
        var ci = 0
        while (ci < cands.length) {
          val (cid, cv, cn) = cands(ci)
          if (cid != qid) {
            var acc = 0.0
            var i = 0
            val n = math.min(qv.length, cv.length)
            while (i < n) { acc += qv(i) * cv(i); i += 1 }
            val sim = acc / (qn * cn)
            // insertion position under (sim desc, id asc) — identical to
            // row_number() OVER (ORDER BY sim DESC, neighbor_id)
            var pos = filled
            while (pos > 0 && (sims(pos - 1) < sim ||
                (sims(pos - 1) == sim && ids(pos - 1) > cid))) pos -= 1
            if (pos < k) {
              val last = math.min(filled, k - 1)
              var j = last
              while (j > pos) { sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1 }
              sims(pos) = sim
              ids(pos) = cid
              if (filled < k) filled += 1
            }
          }
          ci += 1
        }
        (0 until filled).map { r =>
          val rounded = new java.math.BigDecimal(java.lang.Double.toString(sims(r)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          (qid, ids(r), rounded, r + 1)
        }
      }
    }.toDF("query_id", "neighbor_id", "sim", "rank")
    out
  }

  /** Deterministic ±1 hyperplane matrix (LCG-derived; no runtime RNG so
    * repeated runs and resumed jobs bucket identically). `table` salts
    * the matrix so each LSH table cuts the space differently. */
  def planes(nPlanes: Int, dim: Int, table: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, d) =>
      val x = (1103515245L * (j * dim + d + 1 + table * 7919L) + 12345L) & 0x7FFFFFFFL
      if (((x >> 16) & 1L) == 1L) 1.0 else -1.0
    }

  /** Bucket id = sign bits of the plane projections. */
  def bucketOf(v: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, j) =>
      when(dot(v, typedlit(p.toSeq)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Multi-table sign-LSH approximate top-k (OR-amplification: a pair
    * is a candidate if ANY table buckets it together — more tables =
    * higher recall, fewer planes = bigger buckets). Candidates only
    * form within a (table, bucket) equality join; identical pairs from
    * different tables collapse via distinct before ranking.
    *
    * The plane count ADAPTS to corpus size (≈ log2(n / bucketTarget)) so
    * expected bucket size stays constant as data grows — with a fixed
    * plane count, buckets grow linearly with n and the candidate join
    * degenerates to worse-than-brute-force (measured 374 s vs 34 s
    * brute force at a 20k-vector 10× scale test; adaptive planes
    * restore ~constant per-query candidate cost).
    *
    * Approximate by construction — no SQL oracle; recall vs
    * [[cosineTopK]] is asserted in AnnSpec.
    *
    * This join formulation is the cross-check reference for
    * [[lshTopK]]; it pays ~4µs of join machinery per candidate pair,
    * so the production path is the probe kernel below. */
  def lshTopKJoin(embeddings: DataFrame, k: Int, nTables: Int = 8,
      bucketTarget: Int = 64, nPlanesOverride: Int = -1,
      queryPred: Option[Column] = None): DataFrame = {
    val dim = 64
    val nPlanes =
      if (nPlanesOverride > 0) nPlanesOverride
      else adaptivePlanes(embeddings.count(), bucketTarget)
    // Buckets via the native SignLshBuckets loop (one expression node;
    // the composed CASE-tree form generated a method past the JIT's
    // huge-method limit — see SignLshBuckets scaladoc), MATERIALIZED
    // once (eager checkpoint) so the self-join's two sides read the
    // computed buckets instead of re-deriving them.
    val e = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm"),
        posexplode(graft.functions.VectorExpressions
          .signLshBuckets(col("v"), nTables, nPlanes, dim)).as(Seq("tbl", "bucket")))
      .localCheckpoint(true)
    // queryPred restricts the PROBE side only (per-query candidate
    // sets are independent, so per-query results are unchanged); the
    // index side stays the full corpus. With a bounded workload the
    // candidate join is |queries|·nTables·occupancy — linear in the
    // corpus only through the one bucketing pass above — and the
    // bounded probe side is explicitly broadcast (it is
    // |queries|·nTables rows by construction).
    val q = queryPred.map(p => broadcast(e.filter(p))).getOrElse(e)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("tbl"), col("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"),
      col("tbl"), col("bucket"))
    q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Plane count that keeps expected bucket size ≈ bucketTarget as the
    * corpus grows (≈ log2(n / bucketTarget)). */
  def adaptivePlanes(n: Long, bucketTarget: Int): Int =
    math.max(2, math.min(16,
      math.round(math.log(math.max(2.0, n.toDouble / bucketTarget)) / math.log(2.0)).toInt))

  /** Bounded top-k selection of one query against a cell's members —
    * the probe kernel shared by [[lshTopK]] and [[ivfTopK]]. Same
    * strict left-fold dot and (sim desc, id asc) tiebreak as the join
    * formulations, so outputs stay bit-identical. Emits RAW sims; the
    * caller ranks globally and rounds once at the end. */
  private def topKAgainst(qid: Long, qv: Array[Double], qn: Double,
      cids: Array[Long], cvs: Array[Array[Double]], cns: Array[Double],
      k: Int): Seq[(Long, Long, Double)] = {
    val ids = new Array[Long](k)
    val sims = new Array[Double](k)
    var filled = 0
    var ci = 0
    while (ci < cids.length) {
      val cid = cids(ci)
      if (cid != qid) {
        val cv = cvs(ci)
        var acc = 0.0
        var i = 0
        val n = math.min(qv.length, cv.length)
        while (i < n) { acc += qv(i) * cv(i); i += 1 }
        val sim = acc / (qn * cns(ci))
        // insertion position under (sim desc, id asc) — identical to
        // row_number() OVER (ORDER BY sim DESC, neighbor_id)
        var pos = filled
        while (pos > 0 && (sims(pos - 1) < sim ||
            (sims(pos - 1) == sim && ids(pos - 1) > cid))) pos -= 1
        if (pos < k) {
          val last = math.min(filled, k - 1)
          var j = last
          while (j > pos) { sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1 }
          sims(pos) = sim
          ids(pos) = cid
          if (filled < k) filled += 1
        }
      }
      ci += 1
    }
    (0 until filled).map(r => (qid, ids(r), sims(r)))
  }

  /** Global per-query rank over (deduped) candidate partials: window is
    * partitioned by query_id — bounded rows per query (nTables·k or
    * nProbe·k), never a global sort. Rounding (HALF_UP, 6) happens here
    * exactly once, after ranking on raw sims, matching the join twins. */
  /** Final per-query ranking of a candidate table — on the engine's
    * own [[graft.plans.TopKPerKeyNode]] heap operator rather than a
    * bare `row_number` window: the partial heap reduces each task's
    * candidates to ≤ k per query BEFORE the exchange (at scale a hot
    * query's candidate set is nProbe × cell-size rows scattered across
    * tasks; the window formulation shuffles and sorts all of them),
    * and the residual `row_number` then sorts only the ≤ k survivors —
    * already co-partitioned, so no second exchange. Output is
    * identical (same (sim desc, id asc) total order), which the
    * hash-oracled e18/e19/e21 replays gate every round. */
  private def rankCandidates(cands: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.perKey(cands, Seq("query_id"),
        Seq(col("sim").desc, col("neighbor_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))

  /** Multi-table sign-LSH top-k, fully distributed — the production ANN
    * query shape at 100 TB: vectors explode to their (table, bucket)
    * cells via the same [[bucketOf]] projection the join twin uses, ONE
    * shuffle co-locates each cell, and the bounded probe kernel runs
    * per cell — no driver-side index, no corpus `collect()`. The
    * per-cell partial top-k is a safe prune (the global top-k of a
    * union is contained in the union of per-set top-ks); duplicate
    * candidate pairs from different tables carry bit-identical sims
    * (same fold) and collapse via `distinct` before the per-query rank.
    *
    * Identical output to [[lshTopKJoin]] (same planes, same candidate
    * set, same fold/tiebreak — asserted in AnnSpec) at the kernel's
    * per-candidate economics (~50× less row machinery than the join,
    * and immune to the join's skewed-bucket row blowup: a hot cell
    * costs O(m²·d) in-register flops, not m² shuffled join rows —
    * measured 525 s join vs seconds for the probe kernel on a
    * 20k-vector clustered corpus). Adaptive plane count keeps expected
    * cell size ≈ bucketTarget as the corpus grows. */
  def lshTopK(embeddings: DataFrame, k: Int, nTables: Int = 8,
      bucketTarget: Int = 64, nPlanesOverride: Int = -1): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = 64
    // nPlanesOverride > 0 pins the plane count (e18's oracle embeds the
    // fixed ±1 matrices as SQL literals — an adaptive count would make
    // the oracle text data-dependent); default stays adaptive.
    val nPlanes =
      if (nPlanesOverride > 0) nPlanesOverride
      else adaptivePlanes(embeddings.count(), bucketTarget)
    // buckets via the native SignLshBuckets loop — bit-identical to the
    // composed bucketOf form, without its JIT-busting expression tree
    // (see SignLshBuckets scaladoc)
    val cells = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm"),
        posexplode(graft.functions.VectorExpressions
          .signLshBuckets(col("v"), nTables, nPlanes, dim)).as(Seq("tbl", "bucket")))
      .select(col("tbl"), col("bucket"), col("vec_id"), col("v"), col("nrm"))
      .as[BucketedVec]
    val partial = cells.groupByKey(m => (m.tbl, m.bucket)).flatMapGroups {
      (_: (Int, Int), it: Iterator[BucketedVec]) =>
        val ms = it.toArray
        val cids = ms.map(_.vec_id)
        val cvs = ms.map(_.v)
        val cns = ms.map(_.nrm)
        ms.iterator.flatMap(q => topKAgainst(q.vec_id, q.v, q.nrm, cids, cvs, cns, k))
    }
    rankCandidates(partial.toDF("query_id", "neighbor_id", "sim").distinct(), k)
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * Voronoi cells around ~√n deterministic centroids, index members
    * per cell, and probe only the `nProbe` nearest cells per query.
    *
    * Complementary to [[lshTopK]]: IVF cells adapt to the DATA
    * distribution (centroids sit where vectors are, so clustered
    * corpora get balanced cells — exactly where sign-LSH buckets skew),
    * at the price of a centroid-selection step.
    *
    * Fully distributed build — only the ≤4096-row centroid table ever
    * touches the driver:
    *  1. seeds: top-nCells by `xxhash64(vec_id)` — a deterministic
    *     pseudo-random spread that plans as TakeOrderedAndProject
    *     (per-partition top-k + merge), never a corpus collect;
    *  2. one k-means mean step: map-side assignment against the
    *     broadcast seeds, then per-(cell, dim) means via EXACT decimal
    *     sums — associative ⇒ the refined centroids are bit-identical
    *     regardless of partitioning / shuffle fetch order (no RNG, no
    *     fp-order nondeterminism; reproducible across runs + resumes);
    *  3. members: map-side assignment against the broadcast refined
    *     centroids — each vector lands in exactly one cell;
    *  4. probe: each query explodes to its nProbe nearest cells
    *     (map-side against the same broadcast), and a cogroup on cell
    *     id runs the bounded probe kernel per cell. Cells partition the
    *     corpus, so per-cell partials are disjoint — no dedup needed
    *     before the per-query rank.
    * Approximate ⇒ no SQL oracle; recall vs [[cosineTopK]] asserted in
    * AnnSpec.
    *
    * `maxCells` caps the centroid table (the one structure broadcast to
    * every executor and collected on the driver). nCells grows as √n up
    * to the cap, so past n = maxCells² vectors (~16M at the default)
    * per-cell membership grows linearly again and the probe kernel
    * re-inherits the scan cost — at that scale raise `maxCells` to
    * ≈√n (a 1M-row centroid table is still broadcast-able at ~500 MB,
    * or shard the corpus and run one index per shard; see PLANS.md
    * "IVF beyond 16M vectors"). */
  def ivfTopK(embeddings: DataFrame, k: Int, nProbe: Int = 4,
      maxCells: Int = 4096, prefixSeeds: Boolean = false,
      refine: Boolean = true): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val n = embeddings.count()
    if (n == 0)
      return rankCandidates(
        spark.emptyDataset[(Long, Long, Double)].toDF("query_id", "neighbor_id", "sim"), k)
    val nCells = math.max(1, math.min(maxCells, math.round(math.sqrt(n.toDouble)).toInt))
    // prefixSeeds = lowest vec_ids instead of the xxhash64 spread:
    // e19's oracle needs seed selection DuckDB can replay (there is no
    // cross-engine xxhash64); the hash spread stays the default.
    val seeds: Array[PreparedVec] =
      (if (prefixSeeds) vecs.orderBy(col("vec_id"))
       else vecs.orderBy(xxhash64(col("vec_id")), col("vec_id")))
        .limit(nCells).collect()
    val dim = seeds.head.v.length
    val sc = spark.sparkContext
    val bcSeeds = sc.broadcast((seeds.map(_.v), seeds.map(_.nrm)))
    // refine = false skips the Lloyd mean step (seeds ARE the
    // centroids): the oracle-able configuration — the mean step's
    // decimal-division rounding has no cross-engine twin, so e19 pins
    // the assignment/probe/scan path one refinement off the production
    // default.
    val (centroids, cnorms) = if (!refine) (seeds.map(_.v), seeds.map(_.nrm)) else {
      // one mean-refinement pass: map-side assign, decimal-exact means
      val assigned0 = vecs.map { p =>
        val (cs, cns) = bcSeeds.value
        (nearestCell(p.v, p.nrm, cs, cns), p.v)
      }.toDF("cell", "v")
      val meanRows = assigned0
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,15)")) / count(lit(1))).cast("double").as("m"))
        .collect()
      val cents = Array.tabulate(nCells)(c => seeds(c).v.clone()) // empty cells keep their seed
      meanRows.foreach { r =>
        cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      val cns = cents.map { v =>
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i) * v(i); i += 1 }
        math.sqrt(acc)
      }
      (cents, cns)
    }
    val bcCent = sc.broadcast((centroids, cnorms))
    val members = vecs.map { p =>
      val (cs, cns) = bcCent.value
      CellVec(nearestCell(p.v, p.nrm, cs, cns), p.vec_id, p.v, p.nrm)
    }
    val probes = vecs.flatMap { p =>
      val (cs, cns) = bcCent.value
      nearestCells(p.v, p.nrm, cs, cns, nProbe)
        .map(c => CellProbe(c, p.vec_id, p.v, p.nrm))
    }
    val partial = probes.groupByKey(_.cell).cogroup(members.groupByKey(_.cell)) {
      (_: Int, qs: Iterator[CellProbe], ms: Iterator[CellVec]) =>
        val arr = ms.toArray
        if (arr.isEmpty) Iterator.empty
        else {
          val cids = arr.map(_.vec_id)
          val cvs = arr.map(_.v)
          val cns = arr.map(_.nrm)
          qs.flatMap(q => topKAgainst(q.query_id, q.qv, q.qn, cids, cvs, cns, k))
        }
    }
    rankCandidates(partial.toDF("query_id", "neighbor_id", "sim"), k)
  }

  /** E28: tombstone-aware IVF serving — query a STALE index after
    * deletions without rebuilding it. The two index-maintenance facts
    * this encodes:
    *  - centroids do NOT move on delete (rebuilds are batched in real
    *    deployments — FAISS `remove_ids` leaves the coarse quantizer
    *    untouched), so cell seeds come from the FULL corpus;
    *  - the tombstone mask applies to the MEMBER side BEFORE the
    *    per-cell kernel, and queries are restricted to live vectors.
    *    Post-filtering a finished top-k instead would silently
    *    under-fill any query whose shortlist was dominated by deleted
    *    vectors (the e17 post-filter trap, again).
    *
    * Pinned to the oracle-able configuration (prefix seeds, no Lloyd
    * refinement — the e4/e19 recipe), so the whole serving path
    * including the mask replays in SQL and hash-matches.
    *
    * Scale: the mask is one anti join on vec_id before the cell
    * cogroup — at 100 TB the tombstone set is ≪ corpus and broadcasts;
    * everything downstream is [[ivfTopK]]'s bounded per-cell kernel.
    */
  def ivfTopKTombstoned(embeddings: DataFrame, tombstones: DataFrame,
      k: Int, nProbe: Int = 4, maxCells: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // materialized once: the tombstone set is ≪ corpus by assumption,
    // and callers often derive it from the SAME table being served —
    // without this the member/probe sides would each re-scan the
    // corpus through the anti join (PlanAudit's ≥3-scan flag).
    val tomb = tombstones
      .select(col(tombstones.columns.head).cast("long").as("vec_id"))
      .localCheckpoint(true)
    val n = embeddings.count()
    if (n == 0)
      return rankCandidates(
        spark.emptyDataset[(Long, Long, Double)].toDF("query_id", "neighbor_id", "sim"), k)
    val nCells = math.max(1, math.min(maxCells, math.round(math.sqrt(n.toDouble)).toInt))
    // seeds over the FULL corpus — the stale-quantizer property; a
    // deleted vector can still BE a centroid seed, it just can't be
    // returned.
    val seeds: Array[PreparedVec] = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
      .orderBy(col("vec_id")).limit(nCells).collect()
    val live = prepared(embeddings)
      .join(tomb, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val sc = spark.sparkContext
    val bcCent = sc.broadcast((seeds.map(_.v), seeds.map(_.nrm)))
    val members = live.map { p =>
      val (cs, cns) = bcCent.value
      CellVec(nearestCell(p.v, p.nrm, cs, cns), p.vec_id, p.v, p.nrm)
    }
    val probes = live.flatMap { p =>
      val (cs, cns) = bcCent.value
      nearestCells(p.v, p.nrm, cs, cns, nProbe)
        .map(c => CellProbe(c, p.vec_id, p.v, p.nrm))
    }
    val partial = probes.groupByKey(_.cell).cogroup(members.groupByKey(_.cell)) {
      (_: Int, qs: Iterator[CellProbe], ms: Iterator[CellVec]) =>
        val arr = ms.toArray
        if (arr.isEmpty) Iterator.empty
        else {
          val cids = arr.map(_.vec_id)
          val cvs = arr.map(_.v)
          val cns = arr.map(_.nrm)
          qs.flatMap(q => topKAgainst(q.query_id, q.qv, q.qn, cids, cvs, cns, k))
        }
    }
    rankCandidates(partial.toDF("query_id", "neighbor_id", "sim"), k)
  }

  /** Sharded IVF — the composition that survives past `maxCells`² ≈
    * 16M vectors (PLANS.md "IVF beyond 16M vectors", escape (b)).
    *
    * [[ivfTopK]]'s wall: its centroid table caps at `maxCells`, so for
    * n ≫ maxCells² the per-cell membership grows linearly and the
    * probe kernel re-inherits scan cost. Sharding breaks the coupling
    * between TOTAL index size and the per-vector assignment cost:
    *  - the corpus hash-shards on `xxhash64(vec_id) mod nShards`
    *    (uniform, key-deterministic — a vector's shard never moves);
    *  - each shard builds its own IVF index over √(n/nShards) cells
    *    (same deterministic seed → one-mean-step recipe as
    *    [[ivfTopK]], run for ALL shards in the same three distributed
    *    passes — the loop is over array slices of one broadcast, not
    *    per-shard Spark jobs);
    *  - assignment scans only the OWN shard's `cellsPerShard`
    *    centroids (an array slice), so total cells = nShards ×
    *    cellsPerShard can exceed `maxCells` while per-vector work
    *    stays O(cellsPerShard · d);
    *  - every query probes its nProbe nearest cells IN EACH shard
    *    (neighbors live anywhere), and the per-shard partial top-ks
    *    union into one [[rankCandidates]] pass — per-shard cells are
    *    disjoint by construction (global id = shard·cellsPerShard +
    *    local), so no dedup is needed.
    *
    * Cost model at 100 TB: query fan-out is nShards·nProbe probe rows
    * (the price of sharding — same shape as raising nProbe), build
    * stays three linear passes, and the broadcast grows to nShards ×
    * cellsPerShard × dim doubles — size shards so that product fits
    * executor memory (e.g. 64 shards × 65k cells × 64 dims ≈ 2 GB;
    * past that, per-shard REMOTE indexes with a scatter-gather query
    * tier, which is an architecture change, not a parameter).
    *
    * Approximate ⇒ no SQL oracle; AnnSpec asserts recall vs
    * [[cosineTopK]] at parity with the unsharded index on the same
    * corpus. */
  def ivfTopKSharded(embeddings: DataFrame, k: Int, nProbe: Int = 4,
      maxCellsPerShard: Int = 4096, nShards: Int = 4): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    // shard is computed ONCE as a column (Spark's xxhash64) and carried
    // alongside the vector — the JVM side never re-derives it.
    val sharded = prepared(embeddings)
      .withColumn("shard", pmod(xxhash64(col("vec_id")), lit(nShards)).cast("int"))
      .select(col("shard"), col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Long, Array[Double], Double)]
    val n = embeddings.count()
    if (n == 0)
      return rankCandidates(
        spark.emptyDataset[(Long, Long, Double)].toDF("query_id", "neighbor_id", "sim"), k)
    val cps = math.max(1, math.min(maxCellsPerShard,
      math.round(math.sqrt(n.toDouble / nShards)).toInt))
    val nCellsTotal = nShards * cps
    // per-shard seeds: top-cps by key hash WITHIN each shard — one
    // window over the shard key, never a corpus collect (the collect
    // below is ≤ nCellsTotal rows, the same bounded centroid table
    // ivfTopK collects).
    val seedRows = prepared(embeddings)
      .withColumn("shard", pmod(xxhash64(col("vec_id")), lit(nShards)).cast("int"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(xxhash64(col("vec_id"), lit(17)), col("vec_id"))))
      .filter(col("rn") <= cps)
      .select(col("shard"), col("rn"), col("v"), col("nrm"))
      .collect()
    val dim = seedRows.head.getSeq[Double](2).length
    // global centroid arrays indexed by shard*cps + local; slots of a
    // shard with < cps vectors keep a zero vector (norm 1 ⇒ sim 0) and
    // simply never win an assignment.
    val centroids = Array.fill(nCellsTotal)(new Array[Double](dim))
    seedRows.foreach { r =>
      centroids(r.getInt(0) * cps + (r.getInt(1) - 1)) = r.getSeq[Double](2).toArray
    }
    def normsOf(cs: Array[Array[Double]]): Array[Double] = cs.map { v =>
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i) * v(i); i += 1 }
      val s = math.sqrt(acc); if (s == 0.0) 1.0 else s
    }
    val bcSeeds = sc.broadcast((centroids, normsOf(centroids)))
    // one mean-refinement pass across ALL shards at once: map-side
    // assignment against the own-shard slice, decimal-exact means
    // (bit-reproducible regardless of partitioning — same recipe and
    // rationale as ivfTopK step 2).
    val meanRows = sharded.map { case (sh, _, v, nrm) =>
        val (cs, cns) = bcSeeds.value
        (sh * cps + nearestCellIn(v, nrm, cs, cns, sh * cps, cps), v)
      }.toDF("cell", "v")
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("x").cast("decimal(28,15)")) / count(lit(1))).cast("double").as("m"))
      .collect()
    val refined = centroids.map(_.clone()) // empty cells keep their seed
    meanRows.foreach { r =>
      refined(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    val bcCent = sc.broadcast((refined, normsOf(refined)))
    val members = sharded.map { case (sh, id, v, nrm) =>
      val (cs, cns) = bcCent.value
      CellVec(sh * cps + nearestCellIn(v, nrm, cs, cns, sh * cps, cps), id, v, nrm)
    }
    // queries fan out to nProbe cells in EVERY shard
    val probes = sharded.flatMap { case (_, id, v, nrm) =>
      val (cs, cns) = bcCent.value
      (0 until nShards).flatMap { sh =>
        nearestCellsIn(v, nrm, cs, cns, sh * cps, cps, nProbe)
          .map(c => CellProbe(sh * cps + c, id, v, nrm))
      }
    }
    val partial = probes.groupByKey(_.cell).cogroup(members.groupByKey(_.cell)) {
      (_: Int, qs: Iterator[CellProbe], ms: Iterator[CellVec]) =>
        val arr = ms.toArray
        if (arr.isEmpty) Iterator.empty
        else {
          val cids = arr.map(_.vec_id)
          val cvs = arr.map(_.v)
          val cns = arr.map(_.nrm)
          qs.flatMap(q => topKAgainst(q.query_id, q.qv, q.qn, cids, cvs, cns, k))
        }
    }
    rankCandidates(partial.toDF("query_id", "neighbor_id", "sim"), k)
  }

  /** Nearest centroid by cosine (sim desc, cell asc tiebreak via strict
    * `>` over ascending scan) — the map-side IVF assignment kernel. */
  private def nearestCell(v: Array[Double], vn: Double,
      cents: Array[Array[Double]], cnorms: Array[Double]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val s = cosineTo(v, vn, cents(c), cnorms(c))
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  /** [[nearestCell]] over a slice [off, off+len) of the centroid
    * arrays — the per-shard assignment kernel of [[ivfTopKSharded]].
    * Returns the LOCAL cell index within the slice. */
  private def nearestCellIn(v: Array[Double], vn: Double,
      cents: Array[Array[Double]], cnorms: Array[Double],
      off: Int, len: Int): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < len) {
      val s = cosineTo(v, vn, cents(off + c), cnorms(off + c))
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  /** [[nearestCells]] over a slice [off, off+len) — local indices. */
  private def nearestCellsIn(v: Array[Double], vn: Double,
      cents: Array[Array[Double]], cnorms: Array[Double],
      off: Int, len: Int, nProbe: Int): Seq[Int] =
    (0 until len).map(c => (cosineTo(v, vn, cents(off + c), cnorms(off + c)), c))
      .sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)

  /** nProbe nearest cells (sim desc, cell asc tiebreak). */
  private def nearestCells(v: Array[Double], vn: Double,
      cents: Array[Array[Double]], cnorms: Array[Double], nProbe: Int): Seq[Int] =
    cents.indices.map(c => (cosineTo(v, vn, cents(c), cnorms(c)), c))
      .sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)

  private def cosineTo(v: Array[Double], vn: Double,
      c: Array[Double], cn: Double): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { acc += v(i) * c(i); i += 1 }
    acc / (vn * cn)
  }

  /** Symmetric int8 quantization of an embedding column — the storage
    * path for 100 TB of vectors (4×/8× smaller than float32/float64,
    * and int8 dot products SIMD-accelerate downstream). Per-vector
    * scale = 127 / max|x|; round-half-away matches both engines.
    * Emits the quantized codes (CSV-serialized — the harness compare
    * canonicalizes rows and cannot sort raw array cells), the scale
    * needed for dequantization, and the max absolute reconstruction
    * error for quality monitoring. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val scale = (lit(127.0) / array_max(transform(v, x => abs(x)))).as("scale")
    embeddings
      .select(col("vec_id"), v.as("v"), scale)
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("v"),
          x => round(x * col("scale")).cast("int").cast("string")), ",").as("q_csv"),
        round(array_max(transform(col("v"),
          x => abs(round(x * col("scale")) / col("scale") - x))), 6).as("max_err"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold
    * (blocked kernel, same rationale and numerics as
    * [[cosineTopKBlocked]]; d1 < d2 ordering). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
      maxControlCorpus: Long = MaxControlCorpus): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm")).as[(Long, Array[Double], Double)]
    val nVecs = vecs.count()
    if (nVecs > maxControlCorpus) {
      // graceful escape (r16 verdict #3): above the control bound,
      // return the bucketed LSH pair set instead of throwing — same
      // schema and per-pair numerics (strict fold, HALF_UP-6 round
      // before the threshold compare); recall is the OR-amplified
      // LSH approximation (asserted vs this kernel in AnnSpec).
      warnControlOverflow(nVecs, maxControlCorpus, "cosineNearDupPairs",
        "lshNearDupPairs")
      return lshNearDupPairs(embeddings, threshold)
    }
    val bc = spark.sparkContext.broadcast(vecs.collect())
    vecs.mapPartitions { it =>
      val cands = bc.value
      it.flatMap { case (qid, qv, qn) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var ci = 0
        while (ci < cands.length) {
          val (cid, cv, cn) = cands(ci)
          if (cid > qid) {
            var acc = 0.0
            var i = 0
            val n = math.min(qv.length, cv.length)
            while (i < n) { acc += qv(i) * cv(i); i += 1 }
            val sim = new java.math.BigDecimal(java.lang.Double.toString(acc / (qn * cn)))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            if (sim >= threshold) out += ((qid, cid, sim))
          }
          ci += 1
        }
        out
      }
    }.toDF("d1", "d2", "sim")
  }

  /** Bucketed near-duplicate pairs — the at-scale escape of
    * [[cosineNearDupPairs]] and the pair-shaped sibling of [[lshTopK]]:
    * vectors explode to their (table, bucket) sign-LSH cells, ONE
    * shuffle co-locates each cell, and an in-register all-pairs scan
    * runs per cell (|cell| ≈ bucketTarget by the adaptive plane count,
    * so per-cell work is bounded — Σ|cell|² ≈ n·bucketTarget, linear).
    * A pair is a candidate if ANY table buckets it together
    * (OR-amplification); duplicate emissions from different tables
    * carry bit-identical sims (same strict fold on the same arrays) and
    * collapse via `distinct`. Per-pair numerics match the blocked
    * kernel exactly — smaller-id vector on the fold's left, HALF_UP-6
    * round BEFORE the threshold compare — so on any corpus the result
    * is a subset of the exact answer, equal whenever every qualifying
    * pair shares a cell (AnnSpec pins equality on the harness corpus).
    * Approximate by construction, but the pinned nPlanes=8 face IS
    * hash-oracled end-to-end as `e44_lsh_near_dup` (the oracle replays
    * buckets → candidates → verified cosines relationally); the
    * adaptive production config stays recall-asserted in AnnSpec. */
  def lshNearDupPairs(embeddings: DataFrame, threshold: Double,
      nTables: Int = 8, bucketTarget: Int = 64,
      nPlanesOverride: Int = -1): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = 64
    val nPlanes =
      if (nPlanesOverride > 0) nPlanesOverride
      else adaptivePlanes(embeddings.count(), bucketTarget)
    val cells = prepared(embeddings)
      .select(col("vec_id"), col("v"), col("nrm"),
        posexplode(graft.functions.VectorExpressions
          .signLshBuckets(col("v"), nTables, nPlanes, dim)).as(Seq("tbl", "bucket")))
      .select(col("tbl"), col("bucket"), col("vec_id"), col("v"), col("nrm"))
      .as[BucketedVec]
    cells.groupByKey(m => (m.tbl, m.bucket)).flatMapGroups {
      (_: (Int, Int), it: Iterator[BucketedVec]) =>
        // sort by vec_id so the fold direction (smaller id on the
        // left) matches cosineNearDupPairs' qid < cid orientation
        val ms = it.toArray.sortBy(_.vec_id)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < ms.length) {
          val a = ms(i)
          var j = i + 1
          while (j < ms.length) {
            val b = ms(j)
            var acc = 0.0
            var t = 0
            val n = math.min(a.v.length, b.v.length)
            while (t < n) { acc += a.v(t) * b.v(t); t += 1 }
            val sim = new java.math.BigDecimal(
                java.lang.Double.toString(acc / (a.nrm * b.nrm)))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            if (sim >= threshold) out += ((a.vec_id, b.vec_id, sim))
            j += 1
          }
          i += 1
        }
        out
    }.toDF("d1", "d2", "sim").distinct()
  }

  /** Product-quantization encoding: split each vector into `m`
    * subspaces, assign every sub-vector to its nearest sub-centroid
    * (codebook = the first `k` vectors' slices, deterministic seeding
    * as in [[centroidAssign]]), emit the code string plus the
    * reconstruction MSE. PQ is the memory-bound ANN storage format —
    * m log2(k) bits per vector instead of 64 floats — and this is its
    * build step: an equality join of (vector, subspace) slices against
    * a broadcast codebook, argmin per cell, one aggregation to
    * assemble codes. Per-cell distances are strict left folds and the
    * summed MSE terms are decimal-quantized, so the DuckDB twin
    * reproduces codes AND error bit-for-bit. */
  /** (vector, subspace) slices — shared by [[pqEncode]] and
    * [[pqAdcTopK]]: one row per vector per subspace, `sv` = the
    * dim/m-wide sub-vector. */
  private def subSlices(e: DataFrame, m: Int): DataFrame = {
    val dim = 64 / m
    val subCols = (0 until m).map(j =>
      struct(lit(j).as("sub"), slice(col("v"), j * dim + 1, dim).as("sv")))
    e.select(col("vec_id"), explode(array(subCols: _*)).as("s"))
      .select(col("vec_id"), col("s.sub").as("sub"), col("s.sv").as("sv"))
  }

  /** Squared L2 between the `sv` and `cv` sub-vector columns — strict
    * left fold, the engine-portable semantics of the e7/e12 oracles.
    * Codegen'd kernel (graft.functions.L2Squared); identical numerics
    * to the `aggregate(zip_with(...))` form it replaced. */
  private val subDist2 =
    graft.functions.VectorExpressions.l2Squared(col("sv"), col("cv"))

  /** Per-(vector, subspace) nearest-codeword assignment — shared by
    * the encoder [[pqEncode]] and the trainer [[pqCodebookUpdate]] so
    * the seed rule, distance kernel, and tie-break can never diverge:
    * prefix-seed codebook (`vec_id < k`), broadcast equality join on
    * the subspace, deterministic argmin (d2, then centroid_id).
    * Returns (vec_id, sub, sv, centroid_id, d2). */
  private def pqAssign(embeddings: DataFrame, m: Int, k: Int): DataFrame = {
    val sub = subSlices(prepared(embeddings), m)
    val codebook = sub.filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("centroid_id"), col("sv").as("cv"))
    sub.join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("sub"), col("sv"), col("centroid_id"), subDist2.as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("sub"))
          .orderBy(col("d2"), col("centroid_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("sv"), col("centroid_id"), col("d2"))
  }

  def pqEncode(embeddings: DataFrame, m: Int = 8, k: Int = 16): DataFrame = {
    val best = pqAssign(embeddings, m, k)
    best.groupBy(col("vec_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("sub"), col("centroid_id").as("code")))),
          x => x.getField("code").cast("string")), ",").as("codes"),
        round(sum(col("d2").cast("decimal(20,12)")).cast("double") / 64, 6).as("mse"))
  }

  /** E12: PQ asymmetric-distance (ADC) search — the lookup step that
    * makes [[pqEncode]] a usable index (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the corpus is stored
    * only as m-byte codes; each query precomputes its exact squared
    * distance to every sub-centroid (an m×k lookup table) and a
    * corpus vector's approximate distance is the sum of m table
    * lookups — no corpus floats are ever read at query time.
    *
    * Scale: the distance tables are nQueries·m·k rows and BROADCAST;
    * the corpus side streams its (vec_id, sub, code) triples through
    * one map-side-combined aggregation keyed (query, vec_id) — per
    * query the work is linear in corpus size with an m-lookup constant,
    * and at 100 TB the same plan shards by corpus partition with a
    * union of per-shard top-k (the e4 IVF posture). Per-sub distances
    * quantize to DECIMAL(20,12) before the m-term sum, so ranking is
    * order-independent and the DuckDB twin exact. */
  def pqAdcTopK(embeddings: DataFrame, nQueries: Int = 50, m: Int = 8,
                k: Int = 16, topK: Int = 5): DataFrame = {
    val e = prepared(embeddings)
    // slices feed the codebook, the corpus codes, AND the query tables
    val sub = subSlices(e, m).localCheckpoint(true)
    val codebook = sub.filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("centroid_id"), col("sv").as("cv"))
    // argmin via min(struct(d2, centroid_id)) — lexicographic struct
    // ordering IS orderBy(d2, centroid_id) row 1, but runs as a
    // map-side-combined hash aggregate instead of a sort-based window
    // (no per-partition sort, ~k× less data past the partial agg)
    val codes = sub.join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("sub"), col("centroid_id"), subDist2.as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.centroid_id").as("centroid_id"))
    // 12-dp scaled-long quantization (the d14 recipe): same half-up
    // contract as the former DECIMAL(20,12) cast, but the ADC fold
    // sums PRIMITIVE longs in the hash aggregate (sums stay ≪ 2^53,
    // so ordering and the final long→double are exact).
    val dtable = sub.filter(col("vec_id") < nQueries)
      .join(broadcast(codebook), "sub")
      .select(col("vec_id").as("query_id"), col("sub"), col("centroid_id"),
        round(subDist2 * lit(1e12)).cast("long").as("qd2_fp"))
    codes.join(broadcast(dtable), Seq("sub", "centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd2_fp")).as("adc_fp"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("adc_fp"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("adc_fp").cast("double") / lit(1e12), 6).as("adc_dist2"), col("rank"))
  }

  /** E25: the composed IVF-PQ retriever — Jégou et al. 2011's IVFADC
    * with an exact refine stage, the FAISS `IVFPQ(,refine)` production
    * architecture and the standard shape for billion-vector corpora:
    *  1. IVF restricts each query's candidate set to the members of
    *     its `nProbe` probed cells (√n prefix-seed cells, e4/e19's
    *     oracle-able configuration — no Lloyd refinement);
    *  2. ADC scores ONLY those candidates from their m-byte PQ codes
    *     (e7/e12's vec_id<kCode codebook) — no corpus floats are read
    *     in the scoring pass;
    *  3. the exact cosine reranks just the per-query `shortlist` ADC
    *     survivors (nQueries·shortlist pairs).
    * Every stage is deterministic (prefix seeds, 12-dp scaled-long ADC
    * sums, id tie-breaks), so cells, probes, codes, ADC ranks, AND the
    * exact rerank replay row-for-row in the DuckDB oracle — the e21
    * recipe applied to the PQ index family.
    *
    * Scale: the only broadcast structures are the ≤4096-row centroid
    * table, the m·kCode-row codebook, the nQueries·nProbe probe set,
    * and the nQueries·m·kCode distance tables — all corpus-size-free.
    * The corpus contributes three linear passes (cell assignment, PQ
    * encoding, the candidate-code join keyed on neighbor_id) and never
    * self-joins; ADC volume is |probed-cell members| · m per query,
    * the quantity IVF exists to bound, and the float-touching rerank
    * is nQueries·shortlist rows. At 100 TB both the codes and the cell
    * layout persist (e22's partitionBy("cell") posture) and steps 1–2
    * become probe-pruned scans of the code index alone. */
  def ivfPqTopK(embeddings: DataFrame, nQueries: Int = 50, m: Int = 8,
      kCode: Int = 16, nProbe: Int = 4, shortlist: Int = 20, topK: Int = 5,
      maxCells: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // one eager materialization feeds every consumer (seeds, members,
    // probes, PQ slices, both rerank sides) — without it the parquet
    // would scan 6× (PlanAudit's p2 bug class)
    val e = prepared(embeddings).localCheckpoint(true)
    val vecs = e.select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val n = e.count()
    if (n == 0)
      return rankCandidates(
        spark.emptyDataset[(Long, Long, Double)].toDF("query_id", "neighbor_id", "sim"), topK)
    val nCells = math.max(1, math.min(maxCells, math.round(math.sqrt(n.toDouble)).toInt))
    val seeds = vecs.orderBy(col("vec_id")).limit(nCells).collect()
    val bcCent = spark.sparkContext.broadcast((seeds.map(_.v), seeds.map(_.nrm)))
    // corpus → cells: one map-side pass against the broadcast centroids
    val members = vecs.map { p =>
      val (cs, cns) = bcCent.value
      (nearestCell(p.v, p.nrm, cs, cns), p.vec_id)
    }.toDF("cell", "neighbor_id")
    // query workload → probe sets (nQueries·nProbe rows — broadcast)
    val probes = vecs.filter(_.vec_id < nQueries).flatMap { p =>
      val (cs, cns) = bcCent.value
      nearestCells(p.v, p.nrm, cs, cns, nProbe).map(c => (c, p.vec_id))
    }.toDF("cell", "query_id")
    val cand = members.join(broadcast(probes), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
    // PQ codes for the corpus + scaled-long distance tables per query
    // (the e12 machinery verbatim: same slices, codebook, argmin, and
    // 12-dp quantization, so the two operators cannot drift)
    val sub = subSlices(e, m).localCheckpoint(true)
    val codebook = sub.filter(col("vec_id") < kCode)
      .select(col("sub"), col("vec_id").as("centroid_id"), col("sv").as("cv"))
    val codes = sub.join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("sub"), col("centroid_id"), subDist2.as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
      .select(col("vec_id").as("neighbor_id"), col("sub"),
        col("best.centroid_id").as("centroid_id"))
    val dtable = sub.filter(col("vec_id") < nQueries)
      .join(broadcast(codebook), "sub")
      .select(col("vec_id").as("query_id"), col("sub"), col("centroid_id"),
        round(subDist2 * lit(1e12)).cast("long").as("qd2_fp"))
    // candidate side is workload-bounded (nQueries·nProbe·avgCell ≈
    // 200·√n rows at the defaults — sublinear in the corpus), so it
    // broadcasts and the corpus-sized codes never sort or re-shuffle
    // for this join (a plain shuffle here planned as the suite's only
    // sort-merge join)
    val adc = codes.join(broadcast(cand), "neighbor_id")
      .join(broadcast(dtable), Seq("query_id", "sub", "centroid_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd2_fp")).as("adc_fp"))
    val short = graft.operators.TopK.perKey(adc, Seq("query_id"),
        Seq(col("adc_fp").asc, col("neighbor_id").asc), shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank touches only the shortlist survivors
    val sims = short
      .join(e.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), "query_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    rankCandidates(sims, topK)
  }

  /** E34: RESIDUAL-encoded IVF-PQ — IVFADC as Jégou et al. 2011
    * actually specify it: PQ codes quantize the residual v − c(v)
    * relative to the vector's OWN cell centroid, not the raw vector
    * ([[ivfPqTopK]]'s simplification). Residuals concentrate near the
    * origin — their variance is what remains AFTER the coarse
    * quantizer explains the cell structure — so the same m·log2(k)
    * bits quantize a much tighter distribution and ADC distances come
    * out sharper at identical storage. The price is query-side work:
    * the distance table must be built per (query, PROBED CELL), since
    * the query's residual differs per cell — nQueries·nProbe·m·kCode
    * rows, still corpus-size-free and broadcast.
    *
    * Same determinism contract as e25 (prefix seeds, no Lloyd
    * refinement, prefix-residual codebook, 12-dp scaled-long ADC,
    * id tie-breaks), so cells, residuals, codes, per-cell tables, ADC
    * ranks, and the exact rerank all replay row-for-row in the DuckDB
    * oracle. Residual arithmetic is plain IEEE subtraction — identical
    * cross-engine.
    *
    * Scale: everything e25's scaladoc says, plus one broadcast
    * |cells|-row centroid-vector table for the residual joins; the
    * corpus contributes the same three linear passes (assignment,
    * residual PQ encoding, candidate-code join). */
  def ivfPqResidualTopK(embeddings: DataFrame, nQueries: Int = 50, m: Int = 8,
      kCode: Int = 16, nProbe: Int = 4, shortlist: Int = 20, topK: Int = 5,
      maxCells: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = prepared(embeddings).localCheckpoint(true)
    val vecs = e.select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val n = e.count()
    if (n == 0)
      return rankCandidates(
        spark.emptyDataset[(Long, Long, Double)].toDF("query_id", "neighbor_id", "sim"), topK)
    val nCells = math.max(1, math.min(maxCells, math.round(math.sqrt(n.toDouble)).toInt))
    val seeds = vecs.orderBy(col("vec_id")).limit(nCells).collect()
    val bcCent = spark.sparkContext.broadcast((seeds.map(_.v), seeds.map(_.nrm)))
    val members = vecs.map { p =>
      val (cs, cns) = bcCent.value
      (nearestCell(p.v, p.nrm, cs, cns), p.vec_id)
    }.toDF("cell", "vec_id")
    val probes = vecs.filter(_.vec_id < nQueries).flatMap { p =>
      val (cs, cns) = bcCent.value
      nearestCells(p.v, p.nrm, cs, cns, nProbe).map(c => (c, p.vec_id))
    }.toDF("cell", "query_id")
    // the |cells|-row centroid VECTOR table — the one extra broadcast
    // structure residual coding needs
    val cents = seeds.zipWithIndex.map { case (p, i) => (i, p.v) }
      .toSeq.toDF("cell", "cv0")
    val dimSub = 64 / m
    def slices(df: DataFrame, keys: Seq[String]): DataFrame = {
      val subCols = (0 until m).map(j =>
        struct(lit(j).as("sub"), slice(col("v"), j * dimSub + 1, dimSub).as("sv")))
      df.select(keys.map(col) :+ explode(array(subCols: _*)).as("s"): _*)
        .select(keys.map(col) ++ Seq(col("s.sub").as("sub"), col("s.sv").as("sv")): _*)
    }
    // corpus residuals vs each vector's OWN cell
    val res = e.join(members, "vec_id")
      .join(broadcast(cents), "cell")
      .select(col("vec_id"), zip_with(col("v"), col("cv0"), (a, b) => a - b).as("v"))
    val rsub = slices(res, Seq("vec_id")).localCheckpoint(true)
    val codebook = rsub.filter(col("vec_id") < kCode)
      .select(col("sub"), col("vec_id").as("centroid_id"), col("sv").as("cv"))
    val codes = rsub.join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("sub"), col("centroid_id"), subDist2.as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("centroid_id"))).as("best"))
      .select(col("vec_id").as("neighbor_id"), col("sub"),
        col("best.centroid_id").as("centroid_id"))
    // query residuals PER PROBED CELL (the IVFADC-specific step)
    val qres = e.filter(col("vec_id") < nQueries)
      .join(probes.withColumnRenamed("query_id", "vec_id"), "vec_id")
      .join(broadcast(cents), "cell")
      .select(col("vec_id").as("query_id"), col("cell"),
        zip_with(col("v"), col("cv0"), (a, b) => a - b).as("v"))
    val dtable = slices(qres, Seq("query_id", "cell"))
      .join(broadcast(codebook), "sub")
      .select(col("query_id"), col("cell"), col("sub"), col("centroid_id"),
        round(subDist2 * lit(1e12)).cast("long").as("qd2_fp"))
    // candidates carry their cell — the ADC lookup is cell-specific
    val candc = members.withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(probes), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("cell"))
    // NO broadcast hint on candc: unlike the distance table
    // (nQueries·nProbe·m·kCode — corpus-size-free), the candidate
    // carrier is ~nQueries·nProbe·avgCellSize ≈ O(√n)-per-query rows,
    // which GROWS with the corpus. The planner (AQE) broadcasts it
    // while it measures small and degrades to a shuffle join when it
    // doesn't — forcing the hint would pin a corpus-dependent relation
    // to driver memory at scale (r13 advice).
    val adc = codes.join(candc, "neighbor_id")
      .join(broadcast(dtable), Seq("query_id", "cell", "sub", "centroid_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qd2_fp")).as("adc_fp"))
    val short = graft.operators.TopK.perKey(adc, Seq("query_id"),
        Seq(col("adc_fp").asc, col("neighbor_id").asc), shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val sims = short
      .join(e.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), "query_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    rankCandidates(sims, topK)
  }

  /** E13: Matryoshka truncated-dimension cosine top-k — run the exact
    * [[cosineTopKBlocked]] pipeline on only the FIRST `dims` of each
    * embedding (Kusupati et al. 2022: MRL embeddings front-load
    * information, so a prefix is a valid low-cost representation).
    * The standard cheap first pass of a two-stage retriever: 8 of 64
    * dims = 8× less compute and memory at the same plan shape; rerank
    * survivors with the full vector (e1) if needed. */
  def matryoshkaTopK(embeddings: DataFrame, dims: Int = 8, k: Int = 5): DataFrame =
    cosineTopKBlocked(
      embeddings.select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), 1, dims).as("embedding")),
      k)

  /** E14: the COMPOSED two-stage retriever e13's docs promise — stage 1
    * shortlists `cand` neighbors per query on the first `dims`
    * Matryoshka dims (8× cheaper per pair), stage 2 reranks ONLY the
    * shortlist with the exact full-dimension cosine. Exact same
    * (sim desc, id) tie conventions as e1/e13, so the pipeline is
    * deterministic and DuckDB-oracled end-to-end.
    *
    * Scale: stage 2's pair count drops from n² (e1's posture) to
    * n·cand — the expensive kernel touches 1.25% of the pairs at
    * cand=25/n=2000 — and both stage-2 sides are hash joins on vec_id.
    * At 100 TB stage 1 swaps for the bucketed e2/e4 candidate
    * generators; the rerank join is unchanged (candidates are the
    * interface, not the index). Recall floor vs exact top-k pinned in
    * AnnSpec. */
  def twoStageTopK(embeddings: DataFrame, dims: Int = 8, cand: Int = 25,
                   k: Int = 5): DataFrame = {
    val shortlist = matryoshkaTopK(embeddings, dims, cand)
      .select(col("query_id"), col("neighbor_id"))
    // materialized once: both rerank sides join it (without this the
    // corpus scans three times — PlanAudit flag)
    val full = prepared(embeddings).localCheckpoint(true)
    shortlist
      .join(full.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), "query_id")
      .join(full.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** E15: reciprocal-rank fusion (Cormack et al. 2009) — merge two
    * retrieval rankings into one by summing 1/(k + rank) per candidate.
    * THE standard hybrid-search combiner (dense ⊕ lexical, or two dense
    * stages): rank-based, so incomparable score scales fuse without
    * calibration. A FULL OUTER join on (query, candidate) — a candidate
    * one ranker missed still scores on the other's term — then one
    * fixed-order two-term sum per row (no aggregation ⇒ deterministic
    * doubles, oracle replays exactly). Scale: inputs are already
    * per-query top-k lists (tiny); the fusion is a |q|·k-row join. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60, topK: Int = 3): DataFrame = {
    val x = a.select(col("query_id"), col("neighbor_id"), col("rank").as("ra"))
    val y = b.select(col("query_id"), col("neighbor_id"), col("rank").as("rb"))
    x.join(y, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(lit(1.0) / (lit(k) + col("ra")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(k) + col("rb")), lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("neighbor_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("rrf"), 6).as("rrf"), col("rank"))
  }

  /** E17: top-k against a SEPARATE candidate corpus — the primitive
    * behind metadata-FILTERED vector search ("nearest English docs
    * over 150 chars"), where the filter must restrict the CANDIDATE
    * SET before distance computation: post-filtering a plain top-k
    * under-fills (a query whose true neighbors are all filtered out
    * returns fewer than k, silently). Join formulation with the
    * filtered corpus broadcast — the filtered-segment-fits-memory
    * case; a larger corpus composes this with IVF/LSH bucketing
    * exactly as e14 does (filter inside the cell scan). */
  def cosineTopKAgainst(queries: DataFrame, corpus: DataFrame, k: Int,
      broadcastQueries: Boolean = false): DataFrame = {
    val q = prepared(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = prepared(corpus)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    // Which side broadcasts is the caller's scale statement: the e17
    // filtered-search shape broadcasts the (filtered, fits-memory)
    // CORPUS segment and streams every query; a bounded evaluation
    // workload (the e26/e31/e36 recall pins: 50 fixed queries against
    // the whole corpus) broadcasts the QUERY side and STREAMS the
    // corpus — the orientation that stays linear as the corpus grows.
    val scored = (if (broadcastQueries) broadcast(q).join(c,
        col("query_id") =!= col("neighbor_id"))
      else q.join(broadcast(c), col("query_id") =!= col("neighbor_id")))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
    // heap-reduce the n·|segment| scored pairs to k per query WITHOUT
    // the window plan's per-query sort (TopKPerKey), then rank the
    // surviving ≤k rows — the "window over the aggregate, never the
    // facts" rule applied to retrieval; ordering is total, so the
    // result is identical to the row_number formulation
    graft.operators.TopK.perKey(scored, Seq("query_id"),
        Seq(col("sim").desc, col("neighbor_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** E29: int8-quantized retrieval — top-k served from the e5
    * quantization codes ONLY (4× memory compression; the
    * scalar-quantized index tier every production vector store offers
    * below float32). Scoring is the cosine of the CODE vectors: the
    * per-vector descale factor is a uniform positive scalar, so it
    * cancels out of cosine exactly — no dequantization at query time.
    * Every intermediate (code products ≤ 127², 64-dim sums ≤ 2²⁰) is
    * an exact integer below 2⁵³, so double arithmetic is EXACT and
    * the whole quantized serving path replays in SQL bit-identically
    * — an approximate INDEX with an exact oracle, like e28.
    * Accuracy vs the float path is pinned in AnnSpec (recall@5).
    *
    * Scan posture: this registers the e1 exact-baseline shape over the
    * code tier — the operator demonstrated is the quantized SCORING
    * path. At scale the same codes live inside IVF cells and the
    * kernel scans probed cells only (e25 is that composed shape; PQ
    * there, scalar-int8 here — interchangeable code tiers).
    *
    * Precondition (shared with every cosine operator here): vectors
    * are non-zero — a zero vector has no cosine direction and its
    * 127/max|x| scale is undefined; filter such rows upstream. */
  def int8TopK(embeddings: DataFrame, k: Int,
      queryPred: Option[Column] = None): DataFrame =
    scalarQuantTopK(embeddings, k, levels = 127.0, queryPred)

  /** E37: 4-bit scalar quantization tier — codes in [−7, 7], two
    * packed codes per byte at rest (8× below float32, 2× below e29's
    * int8; the bottom rung of the quantization ladder every production
    * store offers for cold shards). Same uniform-scalar cancellation
    * and exact-integer contract as [[int8TopK]] (products ≤ 49, 64-dim
    * sums ≤ 2¹², all exact in double), so the whole tier replays in
    * SQL; accuracy is pinned by the e38 recall row. */
  def int4TopK(embeddings: DataFrame, k: Int,
      queryPred: Option[Column] = None): DataFrame =
    scalarQuantTopK(embeddings, k, levels = 7.0, queryPred)

  /** Shared scalar-quantized serving kernel: codes = round(x · L/max|x|)
    * for L ∈ {127 (int8), 7 (int4)}, scored by code-vector cosine
    * (the per-vector descale factor cancels exactly). queryPred
    * restricts the QUERY side only (scales are per-vector, so
    * per-query results are unchanged) — the evaluation-workload
    * posture: |queries|·n scoring instead of n², with the bounded
    * workload broadcast and the corpus streamed. */
  private def scalarQuantTopK(embeddings: DataFrame, k: Int, levels: Double,
      queryPred: Option[Column]): DataFrame = {
    val v = col("embedding").cast("array<double>")
    // scale hoisted to its own projection: inside the transform lambda
    // the array_max(|x|) subexpression is re-evaluated per ELEMENT
    // (64 max-scans + 64 array allocations per vector); hoisting makes
    // it once per row. Same parenthesization (x * (levels / max)), so
    // the doubles — and the codes — are bit-identical. The code table
    // is then CHECKPOINTED: higher-order array lambdas (transform /
    // array_max) run interpreted, not codegen'd, so every downstream
    // re-read of the lazy frame would re-pay ~2·d interpreted lambda
    // calls per vector — the kernel/join reads the code tier two-to-
    // three times, and the table is d·8 bytes/vector (tiny at the
    // control bound, the point of a quantized tier).
    val codes = embeddings
      .withColumn("qscale", lit(levels) / array_max(transform(v, y => abs(y))))
      .select(col("vec_id"),
        transform(v, x => round(x * col("qscale"))).as("embedding"))
    queryPred match {
      // evaluation workload: bounded query side broadcasts, corpus
      // streams — exactly two lazy reads of the code projection, so a
      // materialization job would cost more than it saves (measured).
      case Some(p) => cosineTopKAgainst(codes.filter(p), codes, k,
        broadcastQueries = true)
      // full self-retrieval: the blocked kernel (bit-identical contract
      // with the join formulation — same fold, tiebreak, HALF_UP-6)
      // scores the n² code pairs in-register instead of through join-row
      // machinery (guide §1.2 "per-task work"); above MaxControlCorpus
      // it degrades to the bucketed LSH path like every control kernel.
      // The kernel reads its input three times (count, collect,
      // mapPartitions), so the code table is checkpointed here.
      case None => cosineTopKBlocked(codes.localCheckpoint(true), k)
    }
  }

  /** E30: binary-code retrieval — each 64-dim embedding sign-binarized
    * into two 32-bit words (16 bytes/vector, 16× below float32; the
    * bottom rung of the code-tier ladder under int8/e29 and PQ/e12)
    * and ranked by HAMMING distance, whose popcount arithmetic is
    * exactly what sign-LSH (e2) thresholds — this is the ranked form
    * of that family. All-integer (binarize → xor → popcount → rank),
    * so the whole tier replays in SQL bit-identically.
    *
    * Scan posture: e1's baseline shape over the binary tier (the
    * operator demonstrated is the code arithmetic; binary scans ARE
    * linear in production — 16 bytes/vector is the point — and at
    * cluster scale the words sit inside IVF cells like any code tier,
    * the e25/e29 composition). AnnSpec pins recall overlap vs float
    * cosine. */
  def hammingTopK(embeddings: DataFrame, k: Int,
      queryPred: Option[Column] = None): DataFrame = {
    def word(lo: Int): Column = expr(
      s"""aggregate(sequence($lo, ${lo + 31}), CAST(0 AS BIGINT),
         |  (acc, i) -> acc + IF(element_at(v, i + 1) > 0D,
         |    shiftleft(CAST(1 AS BIGINT), i - $lo), CAST(0 AS BIGINT)))""".stripMargin)
    // 16 bytes/vector: the whole code table is small by construction —
    // materialize once, read as both query and corpus side.
    val words = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), word(0).as("w1"), word(32).as("w2"))
      .localCheckpoint(true)
    // queryPred: evaluation-workload restriction of the query side
    // (per-query results unchanged — candidates stay the full corpus);
    // the bounded workload broadcasts, the corpus streams
    val q = queryPred.map(p => broadcast(words.filter(p))).getOrElse(words)
      .select(col("vec_id").as("query_id"),
        col("w1").as("q1"), col("w2").as("q2"))
    val c0 = words.select(col("vec_id").as("neighbor_id"),
      col("w1").as("c1"), col("w2").as("c2"))
    // with a bounded workload the query side carries the (only)
    // broadcast hint; otherwise the 16-byte/vector code table does
    val c = if (queryPred.isDefined) c0 else broadcast(c0)
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("bit_count(q1 ^ c1)") + expr("bit_count(q2 ^ c2)"))
          .cast("long").as("hamming"))
    graft.operators.TopK.perKey(scored, Seq("query_id"),
        Seq(col("hamming").asc, col("neighbor_id").asc), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming"), col("neighbor_id"))))
      .select(col("query_id"), col("neighbor_id"), col("hamming"), col("rank"))
  }

  /** E16: Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98)
    * — diversified top-k: greedily select `k` of each query's
    * `shortlist` candidates maximizing
    * `λ·rel(c) − μ·max_{s∈selected} sim(c, s)`, so two near-duplicate
    * passages never both fill a result slot (the retrieval-side twin
    * of SemDedup: dedup at QUERY time instead of corpus time).
    *
    * Determinism (the engine posture): relevance and candidate-pair
    * sims are rounded to 6dp BEFORE scoring (the same cross-engine pin
    * as e1), `λ`/`μ` are independent literals — NOT `1−λ`, whose
    * binary rounding differs from the literal `0.3` the oracle parses
    * — and every greedy pick runs through [[graft.functions.AggExpressions.argMax]]
    * (ties → smallest candidate id), so the selection is replayable
    * bit-for-bit and SQL-oracle-able despite being an iterative
    * algorithm.
    *
    * Scale: the candidate stage is pluggable (here the exact
    * [[cosineTopKBlocked]] baseline; [[ivfMmrTopK]] is the composed
    * production form). Everything after is |q|·m rows: the
    * pairwise-sim table is |q|·m·(m−1) with m = `shortlist` (bounded
    * small), and the greedy selection itself runs in ONE cogroup with
    * a bounded per-query in-memory loop (see [[mmrOverShortlist]]).
    * Nothing here scans the corpus again. */
  def mmrTopK(embeddings: DataFrame, k: Int = 5, shortlist: Int = 20,
      lambda: Double = 0.7, mu: Double = 0.3): DataFrame =
    mmrOverShortlist(embeddings,
      cosineTopKBlocked(embeddings, shortlist)
        .select(col("query_id"), col("neighbor_id").as("cid"), col("sim").as("rel")),
      k, lambda, mu)

  /** E21: the COMPOSED production retriever — stage 1 is [[ivfTopK]]'s
    * cell-probed shortlist (sub-linear candidate generation, never the
    * n² kernel), stage 2 is the same greedy MMR diversification as
    * [[mmrTopK]]. This is the query-level proof of the "production
    * stage 1 is e2/e4" claim the e16 registration only documents: the
    * registered `e21_ivf_mmr` runs it in the oracle-able IVF
    * configuration (prefix seeds, no Lloyd refinement — the e19
    * recipe) so the whole two-stage pipeline hash-gates against a SQL
    * replay; production flips `prefixSeeds=false, refine=true` and
    * nothing else changes.
    *
    * Under-filled shortlists (a query whose probed cells hold fewer
    * than `shortlist` members) degrade gracefully: greedy rounds past
    * the shortlist size emit no pick for that query, identically on
    * both engines. */
  def ivfMmrTopK(embeddings: DataFrame, k: Int = 5, shortlist: Int = 20,
      nProbe: Int = 4, lambda: Double = 0.7, mu: Double = 0.3,
      prefixSeeds: Boolean = false, refine: Boolean = true): DataFrame =
    mmrOverShortlist(embeddings,
      ivfTopK(embeddings, shortlist, nProbe = nProbe,
          prefixSeeds = prefixSeeds, refine = refine)
        .select(col("query_id"), col("neighbor_id").as("cid"), col("sim").as("rel")),
      k, lambda, mu)

  /** Greedy MMR over an arbitrary per-query shortlist `(query_id, cid,
    * rel)` — the pluggable stage-2 shared by [[mmrTopK]] (exact
    * shortlist) and [[ivfMmrTopK]] (IVF shortlist). `rel` must already
    * be 6dp-rounded for cross-engine pick stability. */
  def mmrOverShortlist(embeddings: DataFrame, shortlistDf: DataFrame,
      k: Int, lambda: Double = 0.7, mu: Double = 0.3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = prepared(embeddings)
    // each shortlist row picks up its candidate's vector+norm — ONE
    // broadcast-able join of |q|·m rows; the m(m−1)-per-query pairwise
    // table is never materialized distributed (computed in-kernel)
    val withVec = shortlistDf
      .join(e.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .select(col("query_id").cast("long").as("query_id"),
        col("cid").cast("long").as("cid"), col("rel").cast("double").as("rel"),
        col("v"), col("nrm"))
      .as[(Long, Long, Double, Array[Double], Double)]
    // Greedy selection as ONE groupByKey + a per-query in-memory loop —
    // the documented mapGroups last resort (SURVEY §2.9 ladder (d)),
    // taken because the greedy recurrence is genuinely imperative and
    // its whole state is bounded small: m candidate vectors (m =
    // shortlist, ~20) and their m(m−1)/2 pairwise cosines per query.
    // The previous formulation unrolled k rounds as 3 distributed
    // joins each over a materialized |q|·m² pairwise table (12 joins
    // at k=5) — 3.3× slower at sf0.1 and the round-9 verdict's worst
    // 10× slope; one shuffle of |q|·m vector rows replaces all of it.
    // Arithmetic is replicated EXACTLY: pairwise sims use the same
    // ascending-index left-fold dot and HALF_UP 6dp rounding as the
    // Column twin (the cosineTopKBlocked recipe, spec-pinned
    // bit-identical), penalties are λ·rel − μ·max-pen on those
    // doubles, and argmax ties break to the smallest cid (the
    // ArgExtremum rule) — so the unrolled-CTE SQL oracle still
    // hash-gates the output every round (e16/e21).
    withVec.groupByKey(_._1).flatMapGroups { (q, it) =>
      // cid-ascending scan + strict > keeps the SMALLEST cid on score
      // ties — identical to argMax's tieLow rule
      val cl = it.toArray.sortBy(_._2)
      if (cl.isEmpty) Iterator.empty
      else {
        val m = cl.length
        // pairwise cosine matrix, same fold + rounding as the oracle
        val sim = Array.ofDim[Double](m, m)
        var i = 0
        while (i < m) {
          var j = i + 1
          while (j < m) {
            val a = cl(i)._4; val b = cl(j)._4
            var acc = 0.0
            var d0 = 0
            val n = math.min(a.length, b.length)
            while (d0 < n) { acc += a(d0) * b(d0); d0 += 1 }
            val s = new java.math.BigDecimal(
                java.lang.Double.toString(acc / (cl(i)._5 * cl(j)._5)))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            sim(i)(j) = s; sim(j)(i) = s
            j += 1
          }
          i += 1
        }
        val used = new Array[Boolean](m)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
        val rounds = math.min(k, m)
        var r = 1
        while (r <= rounds) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var ci = 0
          while (ci < m) {
            if (!used(ci)) {
              val rel = cl(ci)._3
              val score =
                if (r == 1) rel // round 1: pure relevance, no penalty
                else {
                  // max sim to the selected set (nonempty for r > 1)
                  var pen = Double.NegativeInfinity
                  var si = 0
                  while (si < m) {
                    if (used(si) && sim(ci)(si) > pen) pen = sim(ci)(si)
                    si += 1
                  }
                  lambda * rel - mu * pen
                }
              if (score > bestScore) { bestScore = score; best = ci }
            }
            ci += 1
          }
          out += ((q, r, cl(best)._2, cl(best)._3))
          used(best) = true
          r += 1
        }
        out.iterator
      }
    }.toDF("query_id", "rank", "neighbor_id", "rel")
  }

  /** E39: in-batch negative construction for contrastive training —
    * the pair-building stage an embedding trainer (InfoNCE/SimCLR/CLIP
    * style) runs over the corpus: vectors hash into fixed "batches",
    * every batch-mate is a candidate negative, and each anchor emits
    * its first k batch-mates (id order — deterministic, re-shard
    * stable) together with the anchor↔negative cosine. The `sim`
    * column is the FALSE-NEGATIVE audit: a batch-mate that is actually
    * a near-duplicate (sim ≈ 1) would teach the loss to push apart
    * semantic twins — the reason SemDedup ([[semDedup]], e8) runs
    * BEFORE pair construction; downstream filters on it.
    *
    * Scale: the only shuffle clusters on `batch`, whose sizes are
    * n/nBatches by hash uniformity — no hot keys BY CONSTRUCTION, and
    * the batch COUNT is adaptive (max(128, n/targetBatch) — the
    * e2_adaptive rule applied to batching), so batch sizes hold at
    * ~targetBatch and the self-join volume Σ batch² ≈ n·targetBatch
    * stays LINEAR at any corpus scale. The count() that drives it is
    * one scalar job (the g5 count-driven-planning posture); the oracle
    * computes the same count in SQL. Dots are computed only for the
    * ≤ k survivors, via the codegen'd strict-left-fold [[dot]] —
    * bit-identical to the SQL replay, so the whole construction is
    * hash-oracled. */
  def inBatchNegatives(embeddings: DataFrame, targetBatch: Int = 16,
      k: Int = 4): DataFrame = {
    val nBatches = math.max(128L, embeddings.count() / targetBatch).toInt
    val e = prepared(embeddings)
      .withColumn("batch",
        graft.sampling.Sampling.bucket(col("vec_id"), "batch", nBatches))
    val a = e.select(col("batch"), col("vec_id").as("anchor_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("batch"), col("vec_id").as("neg_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    a.join(b, Seq("batch")).filter(col("anchor_id") =!= col("neg_id"))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("anchor_id")).orderBy(col("neg_id"))))
      .filter(col("neg_rank") <= k)
      .select(col("anchor_id"), col("neg_rank"), col("neg_id"), col("batch"),
        round(dot(col("av"), col("bv")) / (col("an") * col("bn")), 6).as("sim"))
  }

  /** E8: SemDedup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * near-duplicate removal via centroid clustering: assign every
    * vector to its nearest of `k` fixed centroids (the [[centroidAssign]]
    * step), then WITHIN each cell drop any vector that has a
    * more-senior neighbor (lower vec_id) with cosine ≥ `threshold`.
    * Cross-cell near-duplicates are deliberately out of scope — that
    * locality assumption is the whole point of the method (pairwise
    * work collapses from O(n²) to Σ|cell|²).
    *
    * Returns every vector with its cell and a `kept` flag, so callers
    * can either filter survivors or audit the drop set.
    *
    * Scale: centroids broadcast (k rows); assignment is map-side; the
    * within-cell self-join shuffles each cell once on centroid_id. With
    * k ≈ √n cells the expected pairwise term is n — linear overall; a
    * skewed giant cell is the known failure mode, and `maxCellCompare`
    * bounds it (the d13 `maxDf` posture applied to cells): only the
    * `maxCellCompare` MOST-SENIOR members of a cell (lowest vec_id)
    * act as drop-authorities on the join's left side, so a cell's
    * pairwise term is |cell| × min(|cell|, cap) — linear in |cell| —
    * instead of |cell|². For any cell within the cap the result is
    * IDENTICAL to the uncapped method (every potential senior is
    * eligible); in a pathological giant cell, a junior pair whose only
    * senior sits past the cap survives — bounded, documented recall
    * degradation on exactly the input the uncapped method cannot
    * finish at all. The comparison uses the 6-decimal-rounded cosine
    * so the keep/drop decision is stable across engines (same posture
    * as [[centroidAssign]]'s output rounding).
    *
    * The assigned table is localCheckpoint'ed: it feeds both sides of
    * the self-join and the final anti-join — without the barrier the
    * O(n·k) assignment would run three times. */
  def semDedup(embeddings: DataFrame, k: Int = 8,
               threshold: Double = 0.8, maxCellCompare: Int = 4096,
               keepSim: Boolean = false): DataFrame = {
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cn"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("centroid_id"),
        (dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("centroid_id"), col("sim"))
      .localCheckpoint(true)
    // giant-cell cap: only the cap most-senior members per cell sit on
    // the drop-authority side — |cell| × cap pairs, never |cell|²
    val seniors = assigned
      .withColumn("srn", row_number().over(
        Window.partitionBy(col("centroid_id")).orderBy(col("vec_id"))))
      .filter(col("srn") <= maxCellCompare)
      .drop("srn")
    val drops = seniors.as("a").join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6)
        >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val out = assigned
      .join(drops.withColumn("dropped", lit(true)), Seq("vec_id"), "left")
    // keepSim: expose the assignment similarity (rounded like
    // centroidAssign) so a consumer needing both dedup verdicts and
    // cohesion (pipe_embed_curation) reads ONE assignment instead of
    // recomputing it
    if (keepSim)
      out.select(col("vec_id"), col("centroid_id"),
        coalesce(col("dropped"), lit(false)).unary_!.as("kept"),
        round(col("sim"), 6).as("sim"))
    else
      out.select(col("vec_id"), col("centroid_id"),
        coalesce(col("dropped"), lit(false)).unary_!.as("kept"))
  }

  /** IVF build step, exposed as a standalone (oracle-checked) operator:
    * assign every vector to its nearest of the first `k` vectors taken
    * as fixed centroids (deterministic seeding — the k-means++ style
    * refinement loop would iterate this exact assignment). Broadcast
    * the k-row centroid table; cost is O(n·k·d) map-side work, no
    * shuffle of the vector corpus — the partitioning primitive that
    * makes [[ivfTopK]] scale. */
  def centroidAssign(embeddings: DataFrame, k: Int): DataFrame = {
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cn"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        (dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("sim"), 6).as("sim"))
  }

  /** E40: IVF cell-occupancy audit — the index-quality diagnostic an
    * ANN deployment runs after every (re)build: per-cell vector counts,
    * exact milli-share of the corpus, size rank, and the cell's
    * mean assignment similarity (cohesion). Skewed cells are the IVF
    * failure mode — one giant cell turns every probe of it into a
    * near-linear scan (the e28/SemDedup `maxCellCompare` guards exist
    * because of exactly this) — so the audit that DETECTS the skew is
    * part of the index surface, not an afterthought. Exact arithmetic:
    * share_milli = n·1000 div total (integer), cohesion = the 6dp
    * assignment sims averaged through decimal(18,6) (the
    * partitioning-exact double posture). Scale: one pass over the
    * assignment (broadcast centroids, map-side), then a k-row rollup. */
  def ivfOccupancy(embeddings: DataFrame, k: Int): DataFrame = {
    val assigned = centroidAssign(embeddings, k)
    val cells = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("sim").cast("decimal(18,6)")).as("sim_sum"))
    cells
      .withColumn("total", sum(col("n_vectors")).over(Window.partitionBy()))
      .select(col("centroid_id"), col("n_vectors"),
        expr("(n_vectors * 1000) div total").as("share_milli"),
        rank().over(Window.orderBy(col("n_vectors").desc,
          col("centroid_id"))).as("size_rank"),
        // cast BOTH sides to double before the one divide (exact
        // decimal sum → identical doubles → IEEE-identical quotient)
        round(col("sim_sum").cast("double") / col("n_vectors").cast("double"), 6)
          .as("mean_sim"))
  }

  /** E11: the probe-set half of IVF candidate generation, oracle-exact:
    * the `nProbe` nearest centroids each QUERY will search — [[ivfTopK]]
    * step 4's fan-out, isolated over the same deterministic `vec_id < k`
    * centroids as [[centroidAssign]] so a SQL oracle can replay it
    * row-for-row (the end-to-end e4 stays approximate only because its
    * centroids come from the hash-seeded mean step). Same broadcast
    * shape and (sim desc, centroid asc) tiebreak as assignment;
    * `probe_rank` 1..nProbe per query. */
  def probeCells(embeddings: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cn"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        (dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("sim"))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("probe_rank") <= nProbe)
      .select(col("vec_id"), col("probe_rank"), col("centroid_id"),
        round(col("sim"), 6).as("sim"))
  }

  /** E9: one Lloyd update step — per-(centroid, dimension) member means
    * over the [[centroidAssign]] partition. With e6 (assign) this
    * completes the exactly-testable half of a k-means/IVF index build:
    * iterate assign→update to train, then [[ivfTopK]] probes the result.
    *
    * Exactness recipe (the e7/t7 pattern): each element is quantized
    * double→DECIMAL(25,12) per row FIRST, and only the decimals are
    * summed across rows — decimal addition is associative, so the means
    * are bit-identical under any partitioning / shuffle order, and the
    * DuckDB oracle replays them. The mean itself is one double division
    * of that exact sum, rounded for reporting.
    *
    * Scale: assignment is a map-side broadcast compare; the update is
    * ONE shuffle of (cell, dim, decimal) partials with map-side combine
    * — k×dim cells regardless of corpus size. This plan IS the
    * distributed k-means iteration at 100 TB (the classic
    * reduce-by-(cell,dim) formulation); nothing touches the driver. */
  def centroidUpdate(embeddings: DataFrame, k: Int): DataFrame = {
    // Same assignment as [[centroidAssign]], but `v` rides along so the
    // update needs no second pass over the corpus (2 scans total: the
    // k-row centroid slice — `vec_id < k` pushed to the reader — and
    // one member pass).
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cn"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("centroid_id"),
        (dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rn") === 1)
    assigned.select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("centroid_id"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(25,12)")).as("sx"))
      .select(col("centroid_id"), col("dim"), col("n"),
        // `+ 0.0`: signed-zero normalization (the g11/e20 class) — a
        // tiny-negative dimension mean rounds to -0.0 in DuckDB.
        (round(col("sx").cast("double") / col("n"), 6) + lit(0.0)).as("mean_x"))
  }

  /** E20: PQ codebook refinement — one Lloyd step PER SUBSPACE, the
    * training half that turns [[pqEncode]]'s seed codebook into a
    * fitted one (Jégou et al. 2011 §III: k-means independently in each
    * of the m sub-quantizers). Same assignment join as pqEncode (sub-
    * slices against the broadcast codebook, argmin per (vector, sub)),
    * then [[centroidUpdate]]'s decimal-exact mean taken per
    * (sub, centroid, dim). Iterating encode↔update to convergence is
    * this one plan in a driver loop, exactly like the PageRank rounds.
    *
    * Scale: one corpus pass; the shuffle carries (sub, centroid, dim)
    * partial sums — m·k·(64/m) = 1024 combined rows per map task, not
    * members. Output is the m·k·(64/m)-row new codebook. */
  def pqCodebookUpdate(embeddings: DataFrame, m: Int = 8, k: Int = 16): DataFrame = {
    pqAssign(embeddings, m, k)
      .select(col("sub"), col("centroid_id"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub"), col("centroid_id"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(25,12)")).as("sx"))
      .select(col("sub").cast("long").as("sub"), col("centroid_id"), col("dim"),
        col("n"),
        // `+ 0.0` normalizes IEEE negative zero (the g11 class): a
        // tiny-negative subspace mean rounds to -0.0 in DuckDB but
        // +0.0 here — equal values, different bits under the driver's
        // bit-tagged hash (observed at sf0.001 in r17's inherit sweep).
        (round(col("sx").cast("double") / col("n"), 6) + lit(0.0)).as("mean_x"))
  }

  /** E24: INCREMENTAL SEMANTIC ADMISSION — d12's steady-state batch
    * admission transplanted to embedding space: a batch vector is
    * REJECTED when its cosine to any already-curated CORPUS vector, or
    * to a more-senior batch vector (lower vec_id — first-wins, the
    * d12/[[graft.ingest.Events.dedupFirstWins]] posture), reaches
    * `tau`. Candidates come from the e4 IVF machinery, never all
    * pairs: corpus + seniors assign to prefix-seeded cells, each batch
    * vector probes its `nProbe` nearest cells, and only cohabitants
    * are exactly verified — the oracle replays the SAME pruned
    * candidate set, so the approximation is deterministic and
    * hash-gated end-to-end (the e2/e4 r11 recipe).
    *
    * Scale shape: the corpus contributes only its cell assignment (in
    * production persisted from the original index build, amortized
    * across batches); batch probes fan out nProbe rows per vector; the
    * per-cell verify kernel touches cohabitants only. Corpus bodies
    * never shuffle — members/probes group on the cell key.
    *
    * Output per batch vector: `(vec_id, admitted, matched_id,
    * n_matches)` with `matched_id` = the smallest rejecting id (NULL
    * when admitted) — the audit row an admission log keeps. */
  def incrementalSemAdmit(corpus: DataFrame, batch: DataFrame, tau: Double,
      nProbe: Int = 4, maxCells: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cv = prepared(corpus).select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val bv = prepared(batch).select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val allBatch = bv.select(col("vec_id"))
    // prefix seeds, no refinement — the oracle-able configuration;
    // shared with the streaming face so the seed rule cannot drift
    val seeds = prefixSeedCentroids(corpus, maxCells)
    if (seeds.isEmpty)
      return allBatch.select(col("vec_id"), lit(1).as("admitted"),
        lit(null).cast("long").as("matched_id"), lit(0L).as("n_matches"))
        .orderBy("vec_id")
    val bcCent = spark.sparkContext.broadcast((seeds.map(_.v), seeds.map(_.nrm)))
    // members carry their origin flag IN the row (a broadcast id-set
    // would collect the whole batch to the driver — not 100 TB-safe)
    def assign(ds: org.apache.spark.sql.Dataset[PreparedVec], isBatch: Boolean) =
      ds.map { p =>
        val (cs, cns) = bcCent.value
        (nearestCell(p.v, p.nrm, cs, cns), p.vec_id, p.v, p.nrm, isBatch)
      }
    val members = assign(cv, isBatch = false)
      .union(assign(bv, isBatch = true)) // seniors act as corpus
    val probes = bv.flatMap { p =>
      val (cs, cns) = bcCent.value
      nearestCells(p.v, p.nrm, cs, cns, nProbe)
        .map(c => CellProbe(c, p.vec_id, p.v, p.nrm))
    }
    semAdmitVerdicts(allBatch, members, probes, tau)
  }

  /** The e24 prefix-seed rule as ONE shared implementation: √n cells
    * (capped at `maxCells`), seeds = the lowest-vec_id prepared
    * vectors in id order. [[incrementalSemAdmit]] derives its
    * centroids here per call;
    * [[graft.streaming.StreamIngest.semAdmitToCorpus]] persists this
    * exact output at index creation — one implementation, so the
    * streaming face can never drift from the batch twin's seeding
    * (the semAdmitVerdicts extraction, applied to the seed rule). */
  def prefixSeedCentroids(vectors: DataFrame, maxCells: Int = 4096): Array[PreparedVec] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val prep = prepared(vectors)
      .select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val n = prep.count()
    if (n == 0) Array.empty
    else {
      val nCells = math.max(1,
        math.min(maxCells, math.round(math.sqrt(n.toDouble)).toInt))
      prep.orderBy(col("vec_id")).limit(nCells).collect()
    }
  }

  /** Shared verdict tail of [[incrementalSemAdmit]] and
    * [[incrementalSemAdmitIndexed]] — the per-cell cohabitant verify
    * (corpus members match any batch vector, batch members only their
    * juniors) folded to one audit row per batch vector. Kept in one
    * place so the two admission faces can never diverge on the
    * first-wins rule, the fold order, or the match-pick tiebreak. */
  private def semAdmitVerdicts(allBatch: DataFrame,
      members: org.apache.spark.sql.Dataset[(Int, Long, Array[Double], Double, Boolean)],
      probes: org.apache.spark.sql.Dataset[CellProbe], tau: Double): DataFrame = {
    val spark = allBatch.sparkSession
    import spark.implicits._
    val hits = probes.groupByKey(_.cell).cogroup(members.groupByKey(_._1)) {
      (_: Int, qs: Iterator[CellProbe],
          ms: Iterator[(Int, Long, Array[Double], Double, Boolean)]) =>
        val arr = ms.toArray
        if (arr.isEmpty) Iterator.empty
        else qs.flatMap { q =>
          arr.iterator.filter { case (_, mid, _, _, isBatch) =>
            // corpus: any id; batch cohabitant: seniors only
            if (isBatch) mid < q.query_id else mid != q.query_id
          }.flatMap { case (_, mid, mv, mn, _) =>
            // ascending strict fold — the oracle's list_reduce order
            var acc = 0.0
            var i = 0
            val d = math.min(q.qv.length, mv.length)
            while (i < d) { acc += q.qv(i) * mv(i); i += 1 }
            val sim = acc / (q.qn * mn)
            if (sim >= tau) Iterator.single((q.query_id, mid)) else Iterator.empty
          }
        }
    }.toDF("bid", "mid").distinct() // a pair can cohabit several probed cells
    val matches = hits.groupBy(col("bid"))
      .agg(min(col("mid")).as("matched_id"), count(lit(1)).as("n_matches"))
    allBatch.join(matches, col("vec_id") === col("bid"), "left")
      .select(col("vec_id"),
        col("bid").isNull.cast("int").as("admitted"),
        col("matched_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
      .orderBy("vec_id")
  }

  /** [[incrementalSemAdmit]] with the corpus side PRE-ASSIGNED — the
    * serving face [[graft.streaming.StreamIngest.semAdmitToCorpus]]
    * runs per micro-batch. The batch admission recomputes nothing
    * about the corpus: `centroidVs`/`centroidNs` are the persisted
    * IVF seeds (built once at index creation, the amortization the
    * [[incrementalSemAdmit]] scaladoc names), and `corpusCells` is
    * the standing `(cell, vec_id, v, nrm)` index — in the streaming
    * layout already PRUNED to the batch's probed cell buckets before
    * it reaches this call, so per-batch cost tracks batch size, not
    * corpus size. Verdict semantics are exactly
    * [[incrementalSemAdmit]]'s (shared [[semAdmitVerdicts]] kernel):
    * identical centroids + identical corpus rows ⇒ identical output
    * (StreamIngestSpec pins this equivalence on the live stream). */
  def incrementalSemAdmitIndexed(batch: DataFrame,
      centroidVs: Array[Array[Double]], centroidNs: Array[Double],
      corpusCells: DataFrame, tau: Double, nProbe: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val bv = prepared(batch).select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
    val allBatch = bv.select(col("vec_id"))
    val bcCent = spark.sparkContext.broadcast((centroidVs, centroidNs))
    val corpusMembers = corpusCells
      .select(col("cell").cast("int").as("cell"), col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Long, Array[Double], Double)]
      .map { case (c, id, v, n) => (c, id, v, n, false) }
    val batchMembers = bv.map { p =>
      val (cs, cns) = bcCent.value
      (nearestCell(p.v, p.nrm, cs, cns), p.vec_id, p.v, p.nrm, true)
    }
    val probes = bv.flatMap { p =>
      val (cs, cns) = bcCent.value
      nearestCells(p.v, p.nrm, cs, cns, nProbe)
        .map(c => CellProbe(c, p.vec_id, p.v, p.nrm))
    }
    semAdmitVerdicts(allBatch, corpusMembers.union(batchMembers), probes, tau)
  }

  /** Distinct probed cell ids for `batch` under the given centroids —
    * the pruning key set [[graft.streaming.StreamIngest.semAdmitToCorpus]]
    * turns into a partition filter on the standing index read. The
    * collect is bounded by the centroid count (≤ maxCells), never by
    * the batch or corpus. */
  def probedCells(batch: DataFrame,
      centroidVs: Array[Array[Double]], centroidNs: Array[Double],
      nProbe: Int = 4): Array[Int] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((centroidVs, centroidNs))
    prepared(batch).select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
      .flatMap { p =>
        val (cs, cns) = bc.value
        nearestCells(p.v, p.nrm, cs, cns, nProbe)
      }.distinct().collect().sorted
  }

  /** `(cell, vec_id, v, nrm)` IVF assignment rows for `embeddings`
    * under the given persisted centroids — the index-maintenance map
    * pass [[graft.streaming.StreamIngest.semAdmitToCorpus]] appends
    * for every admitted batch. One narrow map over the batch; no
    * shuffle. */
  def cellAssignments(embeddings: DataFrame,
      centroidVs: Array[Array[Double]], centroidNs: Array[Double]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((centroidVs, centroidNs))
    prepared(embeddings).select(col("vec_id"), col("v"), col("nrm")).as[PreparedVec]
      .map { p =>
        val (cs, cns) = bc.value
        (nearestCell(p.v, p.nrm, cs, cns), p.vec_id, p.v, p.nrm)
      }
      .toDF("cell", "vec_id", "v", "nrm")
  }

  /** E41: embedding-space covariance audit — the top-k off-diagonal
    * covariance magnitudes across dimensions, the anisotropy
    * diagnostic run before whitening / PCA / product quantization
    * (strongly correlated dimension pairs mean the space wastes
    * capacity and PQ subspace splits will cut across correlations;
    * CCA-style whitening decisions start from exactly this table).
    *
    * Exactness recipe (the milli-unit family, applied to second
    * moments): each component quantizes ONCE to integer micro-units
    * (`round(x·10⁶)`, away-from-zero in both engines), so every
    * cross-moment Σ xq_i·xq_j and mean term is exact integer
    * arithmetic under any partitioning — the ranking key
    * `|n·Σxy − Σx·Σy|` is an exact integer (DECIMAL-held), and the
    * only double appears at display (`cov`, rounded). A raw
    * `sum(double)` covariance would be partition-order-dependent and
    * engine-divergent.
    *
    * Scale: the d² pair expansion happens per ROW in the scan
    * projection (explode of a by-construction-bounded d·(d−1)/2
    * array) and collapses immediately via map-side combine to the
    * d·(d−1)/2-row moment table — the shuffle carries ≤ 2016 rows per
    * task regardless of corpus size, the classic one-pass
    * sufficient-statistics shape (linear in n·d², the same work any
    * covariance engine must do; nothing is ever quadratic in n). */
  def embeddingCovariance(embeddings: DataFrame, dims: Int = 64,
      topK: Int = 20): DataFrame =
    covarianceNum(embeddings, dims)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("num")).desc, col("i"), col("j"))))
      .filter(col("rnk") <= topK)
      .select(col("rnk"), col("i"), col("j"), covDisplay)
      .orderBy("rnk")

  /** The full d·(d−1)/2-row covariance table (i < j, display-rounded
    * double) — the standing view [[graft.streaming.StreamIngest]]'s
    * st24 moment fold converges to; [[embeddingCovariance]] is its
    * top-k ranking. */
  def covarianceTable(embeddings: DataFrame, dims: Int = 64): DataFrame =
    covarianceNum(embeddings, dims)
      .select(col("i"), col("j"), covDisplay)
      .orderBy("i", "j")

  /** cov = num / (n²·10¹²), rounded at display — the ONLY double in
    * the covariance family. */
  private def covDisplay: org.apache.spark.sql.Column =
    round(col("num").cast("double") /
      (col("n").cast("double") * col("n")) / 1e12, 8).as("cov")

  /** Shared exact-integer moment pipeline: (i, j, num, n) where
    * num = n·Σxy − Σx·Σy in micro² units (DECIMAL(38,0)-held).
    * `includeDiag` adds the i = j variance moments (needed by the e42
    * power iteration's full symmetric matrix). */
  private[graft] def covarianceNum(embeddings: DataFrame, dims: Int,
      includeDiag: Boolean = false): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // quantize in the scan projection (declarative, codegen'd); NULL
    // embeddings are excluded EXPLICITLY on both sides (oracle: WHERE
    // embedding IS NOT NULL) — without the filter a null row would NPE
    // the kernel while the oracle's count(*) silently kept it
    val q = embeddings.filter(col("embedding").isNotNull).select(expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
      .as("xq")).as[Array[Long]]
    // Per-partition sufficient statistics in one tight pass — the
    // genuine per-partition-imperative case mapPartitions exists for:
    // the d·(d−1)/2 cross-moment accumulator is shared state across a
    // partition's rows, and the declarative alternative (explode 2016
    // tagged product terms per row into a hash aggregate) A/B-measured
    // 3.2 s vs 0.5 s here — the exploder materializes n·d²/2 rows the
    // kernel never needs to exist. Long accumulators flush into BigInt
    // every 4096 rows: |term| ≤ 10¹² (micro² of unit-scale floats), so
    // 4096 terms stay < 2⁶³ by three orders of magnitude, and the
    // flushed BigInt is unbounded — no corpus size can overflow.
    val nPairs = if (includeDiag) dims * (dims + 1) / 2 else dims * (dims - 1) / 2
    val off = if (includeDiag) 0 else 1
    val partials = q.mapPartitions { it =>
      val acc = Array.fill(nPairs)(BigInt(0))
      val accL = new Array[Long](nPairs)
      val sx = new Array[Long](dims)
      var count = 0L
      var sinceFlush = 0
      def flush(): Unit = {
        var k = 0
        while (k < nPairs) { acc(k) += accL(k); accL(k) = 0; k += 1 }
        sinceFlush = 0
      }
      while (it.hasNext) {
        val v = it.next()
        require(v.length == dims, s"expected $dims-dim embedding, got ${v.length}")
        var i = 0
        var k = 0
        while (i < dims) { sx(i) += v(i); i += 1 }
        i = 0
        while (i < dims) {
          var j = i + off
          val vi = v(i)
          while (j < dims) { accL(k) += vi * v(j); k += 1; j += 1 }
          i += 1
        }
        count += 1
        sinceFlush += 1
        if (sinceFlush == 4096) flush()
      }
      flush()
      if (count == 0) Iterator.empty
      else {
        // tagged rows: (i, j, value) with j>0 = cross moment (1-based),
        // j=0 ∧ i>0 = first moment, i=0 = row count; BigInt travels as
        // a string and re-enters exact arithmetic as DECIMAL(38,0)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
        var k = 0
        var i = 0
        while (i < dims) {
          var j = i + off
          while (j < dims) { out += ((i + 1, j + 1, acc(k).toString)); k += 1; j += 1 }
          i += 1
        }
        i = 0
        while (i < dims) { out += ((i + 1, 0, sx(i).toString)); i += 1 }
        out += ((0, 0, count.toString))
        out.iterator
      }
    }.toDF("i", "j", "v")
      // the moment table feeds three consumers (cross moments, first
      // moments, count) — checkpoint it so the corpus scans ONCE; the
      // checkpointed frame is ≤ (d²/2 + d + 1) rows per partition
      .localCheckpoint(true)
    // the shuffle carries only moment rows — never the data
    val sxy = partials.filter(col("j") > 0)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("sxy"))
    val sums = partials.filter(col("j") === 0 && col("i") > 0)
      .groupBy(col("i"))
      .agg(sum(col("v").cast("decimal(38,0)")).cast("decimal(19,0)").as("sx"))
    val n = partials.filter(col("i") === 0)
      .agg(sum(col("v").cast("decimal(38,0)")).cast("long").as("n"))
    val si = sums.select(col("i"), col("sx").as("sx_i"))
    val sj = sums.select(col("i").as("j"), col("sx").as("sx_j"))
    sxy.join(broadcast(si), "i").join(broadcast(sj), "j")
      .crossJoin(broadcast(n))
      .withColumn("num", col("n") * col("sxy") - col("sx_i") * col("sx_j"))
  }

  /** Shared DuckDB moment CTEs (HUGEINT holds the exact cross-moments
    * where Spark uses DECIMAL(38,0); both are exact integers). */
  private def covarianceCteSql(dims: Int, includeDiag: Boolean = false): String = {
    val cmp = if (includeDiag) "<=" else "<"
    s"""WITH comp AS (SELECT vec_id, CAST(i AS INT) AS i,
       |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS xq
       |  FROM embeddings, unnest(range(1, ${dims + 1})) AS u(i)
       |  WHERE embedding IS NOT NULL),
       |sums AS (SELECT i, CAST(sum(xq) AS BIGINT) AS sx FROM comp GROUP BY i),
       |nn AS (SELECT count(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
       |pairs AS (SELECT a.i AS i, b.i AS j, sum(a.xq * b.xq) AS sxy
       |  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i $cmp b.i
       |  GROUP BY 1, 2),
       |cv AS (SELECT pairs.i AS i, pairs.j AS j,
       |    nn.n * sxy - CAST(s1.sx AS HUGEINT) * s2.sx AS num, nn.n AS n
       |  FROM pairs JOIN sums s1 ON s1.i = pairs.i
       |  JOIN sums s2 ON s2.i = pairs.j CROSS JOIN nn)""".stripMargin
  }

  /** Oracle SQL for [[embeddingCovariance]] — the identical integer
    * recipe in DuckDB; only the display column is a double. */
  def embeddingCovarianceSql(dims: Int = 64, topK: Int = 20): String =
    s"""${covarianceCteSql(dims)},
       |r AS (SELECT i, j, num, n,
       |    CAST(row_number() OVER (ORDER BY abs(num) DESC, i, j) AS INT) AS rnk
       |  FROM cv)
       |SELECT rnk, i, j,
       |  round(CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 1e12, 8) AS cov
       |FROM r WHERE rnk <= $topK ORDER BY rnk""".stripMargin

  /** E43: variance-whitened cosine top-k — the covariance family
    * APPLIED: each dimension is rescaled by 1/√(its integer variance
    * moment) before the cosine, so high-variance dimensions stop
    * dominating the similarity (diagonal-Mahalanobis normalization,
    * the cheap four-fifths of full whitening). The per-dim scales come
    * from the same one-pass moment kernel as e41/e42 (exact integers),
    * and the float math after them follows the e1 determinism recipe —
    * identical integer inputs, IEEE sqrt/divide, strict left-fold dot
    * — so the SQL replay hash-matches. Registered at control-corpus
    * scale like e1 (the production serving path whitens THEN goes
    * through IVF/LSH, same as raw vectors). */
  def whitenedTopK(embeddings: DataFrame, dims: Int = 64, k: Int = 5): DataFrame = {
    val w = covarianceNum(embeddings, dims, includeDiag = true)
      .filter(col("i") === col("j"))
      // max(num, 1): a constant dimension has zero variance and would
      // otherwise divide by zero; scale 1 leaves its (all-equal,
      // cosine-irrelevant) values untouched
      .select(col("i"), sqrt(greatest(col("num").cast("double"), lit(1.0))).as("w"))
    val warr = w.agg(expr(
      "transform(sort_array(collect_list(struct(i, w))), s -> s.w)").as("warr"))
    val whitened = embeddings.filter(col("embedding").isNotNull)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        .as("xq"))
      .crossJoin(broadcast(warr))
      .select(col("vec_id"),
        expr("zip_with(xq, warr, (x, w) -> CAST(x AS DOUBLE) / w)").as("embedding"))
      // the whitened frame feeds both kernel sides; without a
      // checkpoint the embeddings scan + moment pass would replay per
      // side (PlanAudit's re-scan flag)
      .localCheckpoint(true)
    // blocked kernel, not the join formulation: bit-identical output
    // (same left-fold dot, same (sim desc, id) order, same HALF_UP-6
    // rounding — the documented cosineTopK ≡ cosineTopKBlocked
    // contract), but the n² pair scoring runs in-register instead of
    // paying ~1µs of join-row machinery per pair (guide §1.2 "per-task
    // work"). Measured 4.0 s → see OPTIMIZATION_r17.md.
    cosineTopKBlocked(whitened, k)
  }

  /** Oracle SQL for [[whitenedTopK]] — moment CTEs, then the e1
    * cosine recipe over the whitened vectors. */
  def whitenedTopKSql(dims: Int = 64, k: Int = 5): String =
    s"""${covarianceCteSql(dims, includeDiag = true)},
       |wv AS (SELECT i, sqrt(greatest(CAST(num AS DOUBLE), 1.0)) AS w
       |  FROM cv WHERE i = j),
       |y AS (SELECT c.vec_id, c.i, CAST(c.xq AS DOUBLE) / wv.w AS y
       |  FROM comp c JOIN wv ON wv.i = c.i),
       |vv AS (SELECT vec_id, list(y ORDER BY i) AS v FROM y GROUP BY vec_id),
       |nrm AS (SELECT vec_id, v,
       |    sqrt(list_reduce(list_apply(range(1, ${dims + 1}), i -> v[i] * v[i]),
       |      (a, b) -> a + b)) AS nrm
       |  FROM vv),
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_apply(range(1, ${dims + 1}), i -> q.v[i] * c.v[i]),
       |      (a, b) -> a + b) / (q.nrm * c.nrm) AS sim
       |  FROM nrm q JOIN nrm c ON q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, round(sim, 6) AS sim,
       |  CAST(rn AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id) AS rn FROM p)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin

  /** Oracle SQL for [[covarianceTable]] — the same moment CTEs, full
    * table, ordered (i, j). */
  def covarianceTableSql(dims: Int = 64): String =
    s"""${covarianceCteSql(dims)}
       |SELECT i, j,
       |  round(CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 1e12, 8) AS cov
       |FROM cv ORDER BY i, j""".stripMargin

  /** E42: top covariance eigenvector by FIXED-ROUND power iteration —
    * the PCA direction a whitening / dimensionality-reduction /
    * anisotropy-removal step starts from. The iteration runs entirely
    * on the d(d+1)/2-row integer moment table [[covarianceNum]]
    * produces (one corpus pass; the matrix never exceeds d² rows), so
    * rounds cost d²-sized joins regardless of corpus size.
    *
    * Determinism: the g1/d7 fixed-round recipe applied to linear
    * algebra. v₀ = (10⁶, …, 10⁶); each round computes the exact
    * integer matrix-vector product wᵢ = Σⱼ numᵢⱼ·vⱼ (DECIMAL-held;
    * HUGEINT in the oracle) and renormalizes in integers:
    * vᵢ ← (wᵢ·10⁶) div max|w| — truncation toward zero in BOTH engines
    * — so the unrolled SQL replay is bit-equal and the result is
    * partitioning-independent. Components are ppm of the largest
    * (max|v| = 10⁶ exactly). Magnitude bound (unit-scale floats):
    * |num| ≤ 2n²·10¹², |w| ≤ d·|num|·10⁶, so w·10⁶ ≤ 2d·n²·10²⁴ —
    * at d = 64 that crosses DECIMAL(38,0)'s 10³⁸ ceiling near
    * n ≈ 8·10⁵ rows. Beyond that, rescale the quantization per round.
    * The asymmetry past the bound is the trap: DuckDB's HUGEINT
    * oracle raises on overflow, but Spark's non-ANSI decimal multiply
    * yields NULL — so instead of silently zeroing the component (a
    * wrong-but-plausible eigenvector), every arithmetic step below
    * raise_errors on an overflow NULL; only the legitimate all-zero-
    * matrix NULL (m = 0) coalesces to 0.
    */
  def powerIteration(embeddings: DataFrame, dims: Int = 64,
      rounds: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    val upper = covarianceNum(embeddings, dims, includeDiag = true)
      .select(col("i"), col("j"), col("num"))
      // d²/2 rows feeding every round — materialize once
      .localCheckpoint(true)
    val sym = upper.union(
      upper.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("num")))
    val v0 = spark.range(1, dims + 1)
      .select(col("id").cast("int").as("i"),
        lit(1000000L).cast("decimal(38,0)").as("v"))
    val overflowMsg = lit("powerIteration: decimal(38,0) overflow in " +
      "w*1000000 — past the n ~ 8e5 unit-scale safe bound; rescale the " +
      "quantization (the DuckDB HUGEINT oracle raises here too)")
    val vFinal = (1 to rounds).foldLeft(v0) { (vk, _) =>
      val w = sym.join(broadcast(vk.select(col("i").as("j"), col("v"))), "j")
        .groupBy(col("i"))
        // every num/v is non-null by construction, so a NULL product
        // (which sum() would silently skip) or a NULL sum can only
        // mean non-ANSI decimal overflow: fail loudly, matching the
        // HUGEINT oracle
        .agg(sum(col("num") * col("v")).as("w"),
          count(when((col("num") * col("v")).isNull, 1)).as("n_overflow"))
        .select(col("i"),
          when(col("n_overflow") > 0 || col("w").isNull,
            raise_error(overflowMsg).cast("decimal(38,0)"))
            .otherwise(col("w")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      // nullif guards the all-zero matrix (w = 0 everywhere → m = 0 →
      // div NULL → coalesce 0); an overflow NULL in w*10⁶ raises
      w.crossJoin(broadcast(m))
        .select(col("i"),
          when(col("w").isNotNull &&
              (col("w") * lit(1000000L).cast("decimal(38,0)")).isNull,
            raise_error(overflowMsg).cast("decimal(38,0)"))
          .otherwise(
            coalesce(expr("(w * 1000000) div nullif(m, 0)"), lit(0L))
              .cast("decimal(38,0)")).as("v"))
    }
    vFinal.select(col("i"), col("v").cast("long").as("component_ppm"))
      .orderBy("i")
  }

  /** Oracle SQL for [[powerIteration]] — the identical unrolled
    * fixed-round recurrence (HUGEINT arithmetic, `//` truncation). */
  def powerIterationSql(dims: Int = 64, rounds: Int = 3): String = {
    val roundsSql = (1 to rounds).map { r =>
      s"""w$r AS (SELECT s.i, sum(s.num * v.v) AS w
         |  FROM sym s JOIN v${r - 1} v ON s.j = v.i GROUP BY s.i),
         |m$r AS (SELECT max(abs(w)) AS m FROM w$r),
         |v$r AS (SELECT i, coalesce((w * 1000000) // nullif(m, 0), 0) AS v
         |  FROM w$r, m$r)""".stripMargin
    }.mkString(",\n")
    s"""${covarianceCteSql(dims, includeDiag = true)},
       |sym AS (SELECT i, j, num FROM cv
       |  UNION ALL SELECT j AS i, i AS j, num FROM cv WHERE i < j),
       |v0 AS (SELECT CAST(i AS INT) AS i, CAST(1000000 AS HUGEINT) AS v
       |  FROM (SELECT unnest(range(1, ${dims + 1})) AS i)),
       |$roundsSql
       |SELECT i, CAST(v AS BIGINT) AS component_ppm
       |FROM v$rounds ORDER BY i""".stripMargin
  }
}
