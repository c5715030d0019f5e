package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}

/** Whole-suite physical-plan audit: walks every registered query and
  * counts the plan shapes that matter at 100 TB — parquet scans (a
  * query re-scanning the same table per union arm is a bug: caught
  * p2's 5× re-parse), shuffle exchanges, sort-merge joins (a fact⋈dim
  * SMJ means a broadcast was missed), and nested-loop/cartesian joins
  * (quadratic by construction — only the two documented O(n²)
  * baselines may carry one).
  *
  *   sbt "runMain graft.PlanAudit [sfDir]"
  *
  * Prints one line per query and a FLAGGED section; exits nonzero if a
  * non-whitelisted query plans a cartesian/nested-loop join, so it can
  * gate CI.
  */
object PlanAudit {

  /** Documented quadratic baselines (SURVEY §2.9 / PLANS.md): the only
    * queries allowed an UNBOUNDED nested-loop or cartesian join. */
  private val quadraticBaselines = Set(
    "d2_ngram_jaccard_pairs", "e1_cosine_topk", "e3_cosine_near_dup",
    // e29/e30 are e1's scan posture over the int8 / binary CODE tiers
    // (the operator demonstrated is the quantized scoring path,
    // exactly oracled); at scale the same codes sit inside IVF cells —
    // the Ann.int8TopK / Ann.hammingTopK scaladocs name the
    // composition (e25 is the composed shape). e31/e32 are their
    // recall MEASUREMENTS and ride the same serving shapes (the e26
    // posture: recall evaluation runs on a sampled corpus in
    // deployment).
    // e37/e38 are the int4 rung of the same ladder (r14).
    "e29_int8_topk", "e30_hamming_topk", "e37_int4_topk",
    "e31_int8_recall", "e32_hamming_recall", "e38_int4_recall",
    // e43 is e1's scan posture over VARIANCE-WHITENED vectors (the
    // operator demonstrated is the diagonal-Mahalanobis rescale from
    // the e41 moment kernel; at scale whitened vectors serve through
    // IVF/LSH exactly like raw ones — Ann.whitenedTopK scaladoc).
    "e43_whitened_topk")

  /** Joins whose broadcast side is bounded by construction in a way
    * the physical plan cannot show (a filter on a key, not a limit):
    * query name → why the build side is small. */
  private val boundedByConstruction = Map(
    "e6_centroid_assign" ->
      "centroid side is `vec_id < k` — exactly k rows by key semantics",
    "e9_kmeans_update" ->
      "same assignment join as e6: broadcast side is the `vec_id < k` centroid slice",
    "e11_ivf_probe_cells" ->
      "same assignment join as e6: broadcast side is the `vec_id < k` centroid slice",
    "e40_ivf_occupancy" ->
      "same assignment join as e6: broadcast side is the `vec_id < k` centroid slice",
    "pipe_embed_curation" ->
      ("composes e8's SemDedup and e6's assignment: both cross joins broadcast the " +
        "`vec_id < 8` centroid slice; the within-cell dedup join is cell-bucketed"),
    "e22_ivf_layout_probe" ->
      "layout build reuses the e6/e11 assignment join: broadcast side is the `vec_id < 8` centroid slice",
    "e17_filtered_ann" ->
      ("documented segment-fits-memory baseline (Ann.cosineTopKAgainst scaladoc): the " +
        "broadcast side is the metadata-FILTERED corpus segment; beyond memory, the " +
        "same filter composes into the IVF/LSH cell scan as in e14"),
    "e36_lsh_ndcg" ->
      ("the exact REFERENCE pass of the NDCG measurement runs the e17 kernel " +
        "(cosineTopKAgainst, broadcastQueries=true) with the BUILD side bounded by " +
        "construction to the 50-query eval workload (vec_id < 50) and the corpus " +
        "STREAMED — 50·n pairs, linear in the corpus; the retriever under " +
        "evaluation (pinned LSH) is the bucketed production shape"),
    "e26_ivfpq_recall" ->
      ("same e36 posture (r14): the exact reference pass broadcasts the 50-query " +
        "workload (vec_id < 50) and streams the corpus — 50·n pairs, linear; the " +
        "retriever under evaluation (IVF-PQ) is the cell-bounded production shape"),
    "e35_ivfpq_residual_recall" ->
      ("same e36 posture (r14): 50-query workload broadcast, corpus streamed — " +
        "linear reference pass; the retriever under evaluation (residual IVFADC) " +
        "is the cell-bounded production shape"),
    "e33_adaptive_recall_sampled" ->
      ("same e36 posture (r14): 50-query workload broadcast, corpus streamed — " +
        "the bounded form of e33 whose reference pass is linear in the corpus; " +
        "the retriever under evaluation is the adaptive-plane LSH production rule"),
    "e18_recall_sampled" ->
      ("same e36 posture (r14): 50-query workload broadcast, corpus streamed — " +
        "the bounded form of e18 (pinned-LSH recall pin)"),
    "e19_recall_sampled" ->
      ("same e36 posture (r14): 50-query workload broadcast, corpus streamed — " +
        "the bounded form of e19 (IVF recall pin)"),
    "w17_rolling_corr" ->
      ("every non-equi/cross join runs on CALENDAR- or KEY-CATALOG-bounded frames, " +
        "never the facts: the span scalar is one aggregated row, the key-pair grid is " +
        "|event types|² (k1 < k2 over the distinct key catalog), and the pair-day " +
        "product joins the |keys|×|days| daily rollup to itself on the day key — " +
        "TimeSeries.rollingCorr scaladoc (volume-invariant: 10× the events changes " +
        "the n values, not the row counts)"))

  /** Queries allowed ≥3 scans of one path, with why the repeats are not
    * repeated work. */
  private val rescanWhitelist = Map(
    "u1_union_offices" ->
      "3 DISJOINT office slices of one table — partition-pruned, one logical pass",
    "a30_window_funnel" ->
      ("the funnel's 3 stage frames are DISJOINT event_type slices of one table " +
        "(view/click/purchase) — each scan carries its pushed type filter (the u1 " +
        "posture); on a type-partitioned layout all three prune to their own files"),
    "d9_decontaminate" ->
      ("train and eval both derive from the harness documents table; the scans are " +
        "1 full output pass + 2 candidate-PRUNED verify scans, different datasets in deployment"),
    "d12_incremental_admit" ->
      ("batch and corpus both derive from the harness documents table; in deployment the " +
        "corpus contributes only its persisted dedupKeys index and a candidate-pruned " +
        "verify fetch — the batch-side scans are over the small arriving batch"),
    "e24_incremental_semdedup" ->
      ("batch and corpus both derive from the harness embeddings table; one scan is the " +
        "corpus membership pass (amortized in deployment: the cell index persists from " +
        "the original build) and the other three are over the SMALL arriving batch " +
        "(seniors-as-members, probes, output spine) — the d12 posture in embedding space"))

  /** Queries allowed a DATA-GRAIN unpartitioned window (the
    * single-partition sort the r17 verdict flagged): each is a
    * documented exact-order control whose scale twin is registered. */
  private val globalWindowControls = Map(
    "w7_ntile" ->
      ("EXACT global ntile is inherently a total order; w7_ntile_approx " +
        "is the registered 100 TB path (sketch cutoffs + projection)"))

  /** r18: an unpartitioned window (`WindowExec` with an empty
    * partitionSpec — the `WindowExec: No Partition Defined` warning)
    * is the one plan shape that cannot scale PAST one task no matter
    * the cluster. It is legitimate only on SUMMARY-grain frames — an
    * aggregation, limit, or literal relation below the window bounds
    * the rows it sorts (day summaries, tier offsets, leaderboard
    * cutoffs). Anything reading raw scan rows into a global window is
    * flagged (the c2/a29 class this round rewrote two-tier). */
  private def summaryGrain(p: SparkPlan): Boolean =
    p.collectFirst {
      case a: HashAggregateExec       => a
      case a: SortAggregateExec       => a
      case a: ObjectHashAggregateExec => a
      case l: GlobalLimitExec         => l
      case t: TakeOrderedAndProjectExec => t
      case l: LocalTableScanExec      => l
    }.isDefined

  /** A nested-loop join is the legitimate scale pattern when its
    * broadcast side is provably bounded: a global aggregate (exactly
    * one row — scalar frames like the top-k cutoff, corpus size, or
    * quantile bounds), an explicit limit (e.g. the ≤√n centroid
    * table), or a literal VALUES relation (e.g. dq6's 5-row quantile
    * spec) — all fixed-size regardless of input scale. Anything else
    * is an accidental cross product. */
  private def boundedBuild(j: BroadcastNestedLoopJoinExec): Boolean = {
    val build: SparkPlan = if (j.buildSide == BuildLeft) j.left else j.right
    build.collectFirst {
      case a: HashAggregateExec if a.groupingExpressions.isEmpty       => ()
      case a: SortAggregateExec if a.groupingExpressions.isEmpty       => ()
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => ()
      case _: TakeOrderedAndProjectExec                                => ()
      case _: GlobalLimitExec                                          => ()
      case _: LocalTableScanExec                                       => ()
    }.isDefined
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = List.empty[String]
    println(f"${"query"}%-32s scans exch smj nlj")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, dir).queryExecution
        val plan = qe.sparkPlan
        // re-scan detection (the p2 bug class): the same parquet path
        // scanned ≥3× in one plan means a shared frame should have been
        // checkpointed (2× is legitimate: self-joins, hist∪live).
        // Scans under canonically-IDENTICAL shuffle exchanges don't
        // count twice: both the non-AQE ReuseExchange rule and AQE
        // stage reuse execute that map stage once and serve every
        // consumer from its shuffle files (d14's 4-consumer weighted
        // posting frame is the r11 case — one scan at runtime).
        // Exchanges only exist post-EnsureRequirements, so the whole
        // re-scan analysis reads the executedPlan — and BOTH the
        // per-path scan counts and the duplicate-exchange credit come
        // from the SAME executedPlan instance of the SAME
        // QueryExecution (the r11 ADVICE: two separate fn() plans can
        // differ in scan multiplicity, letting the subtraction
        // over-suppress a real re-scan; one QueryExecution also means
        // each audited query plans once, not twice). `plan` above stays
        // pre-preparation for the shape counts.
        val execPlan = qe.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        // shape counts read the POST-EnsureRequirements plan: the bare
        // sparkPlan carries only explicit-repartition exchanges (the
        // distribution-required ones are inserted during preparation),
        // so counting there silently underreported every join/agg
        // exchange — the r13 audit of the audit
        val scans = execPlan.collect { case s: FileSourceScanExec => s }.size
        val exch = execPlan.collect { case e: ShuffleExchangeExec => e }.size
        val smj = execPlan.collect { case j: SortMergeJoinExec => j }.size
        val dupExchangeScans = execPlan
          .collect { case e: ShuffleExchangeExec => e }
          .groupBy(_.canonicalized).values.flatMap(_.drop(1))
          .flatMap(_.collect { case s: FileSourceScanExec =>
            s.relation.location.rootPaths.mkString(",") })
          .groupBy(identity).view.mapValues(_.size).toMap
        val scansPerPath = execPlan.collect { case s: FileSourceScanExec =>
          s.relation.location.rootPaths.mkString(",")
        }.groupBy(identity).view.mapValues(_.size).toMap
          .map { case (p, c) => p -> (c - dupExchangeScans.getOrElse(p, 0)) }
        if (!rescanWhitelist.contains(name))
          scansPerPath.filter(_._2 >= 3).foreach { case (path, n) =>
            flagged ::= s"$name: $n scans of the same input ($path) — checkpoint the shared frame"
          }
        val dataGrainGlobalWin = execPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty && !summaryGrain(w.child) => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty && !summaryGrain(w.child) => w
        }.size
        if (dataGrainGlobalWin > 0 && !globalWindowControls.contains(name))
          flagged ::= s"$name: $dataGrainGlobalWin data-grain unpartitioned window(s) — single-task sort at scale; two-tier it (the c2/a29 r18 rewrite) or whitelist the documented control"
        val unbounded = plan.collect {
          case j: BroadcastNestedLoopJoinExec if !boundedBuild(j) => j
          case j: CartesianProductExec => j
        }.size
        val bounded = plan.collect {
          case j: BroadcastNestedLoopJoinExec if boundedBuild(j) => j
        }.size
        println(f"$name%-32s $scans%5d $exch%4d $smj%3d ${unbounded}%3d (+$bounded bounded)")
        if (unbounded > 0 && !quadraticBaselines.contains(name) &&
            !boundedByConstruction.contains(name))
          flagged ::= s"$name: $unbounded unbounded nested-loop/cartesian join(s) outside the documented baselines"
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch {
        case e: Throwable =>
          flagged ::= s"$name: plan construction failed: ${e.getMessage}"
      }
    }
    if (flagged.nonEmpty) {
      println("\nFLAGGED:")
      flagged.foreach(f => println(s"  $f"))
      spark.stop()
      sys.exit(1)
    }
    println("\nno flags")
    spark.stop()
  }
}
