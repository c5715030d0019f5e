package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §2.9 ladder rung (c)): exact
  * per-key top-k WITHOUT sorting — custom `LogicalPlan` → planner
  * `SparkStrategy` → two `SparkPlan`s, the full Catalyst stack.
  *
  * Why the built-ins genuinely can't express this: the declarative
  * formulation is `row_number().over(partitionBy(keys).orderBy(ord))
  * <= k`, which Spark plans as Exchange → **full SortExec of every
  * key's every row** → WindowExec — O(n log n) comparisons and, at
  * 100 TB, a sort-spill of the whole fact table just to discard all
  * but k rows per key. A bounded heap per key needs O(n log k)
  * comparisons and O(keys·k) memory, and — the bigger win at cluster
  * scale — it can run BEFORE the exchange: the shuffle then carries at
  * most `partitions × keys × k` pre-reduced rows instead of the whole
  * input. This partial/final split is exactly what HashAggregate does
  * for `sum`, applied to an operation aggregates can't express (the
  * retained value is whole rows, not a fold).
  *
  * Semantics: rows whose rank under `order` within their key group is
  * ≤ k, ties resolved by the ordering itself — callers wanting a
  * deterministic result make `order` a total order (append a unique
  * tiebreak column), same contract as `row_number`.
  *
  * Memory honesty: the FINAL side holds its partition's result
  * (keys-in-partition × k rows — the output itself). The PARTIAL side
  * would hold one heap per distinct key seen, which for
  * near-unique-key inputs approaches the partition size, so it flushes
  * its map when retained ROWS ([[TopKPerKey.FlushRowsKey]]) or retained
  * BYTES ([[TopKPerKey.FlushBytesKey]] — the wide-row guard) exceed
  * their session-configured thresholds and starts fresh. A flush only
  * ever emits EXTRA candidate rows (any row beaten
  * by k same-key rows within one epoch is beaten by k rows globally),
  * so correctness never depends on the threshold; the final pass
  * reduces whatever survives. Worst case (all keys unique) the partial
  * pass degrades to a pass-through — the window formulation's shuffle,
  * but still never its sort.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "TopKPerKey needs grouping keys; use Dataset.orderBy.limit for global top-k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy: logical node → partial (pre-shuffle) + final
  * (post-shuffle) heap execs. `EnsureRequirements` inserts the
  * key-hash exchange between them, driven by the final exec's
  * `requiredChildDistribution` — the operator never schedules its own
  * shuffle. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      // thresholds resolve from the ACTIVE session's conf at planning
      // time and ride into the exec as constructor fields — per-session
      // (a test override never leaks to a concurrent query), and the
      // same logical plan always executes with the thresholds its
      // session configured (the r9-advice fix for the process-global
      // `var` it replaces)
      val rows = TopKPerKey.confLong(TopKPerKey.FlushRowsKey, TopKPerKey.DefaultFlushRows)
      val bytes = TopKPerKey.confLong(TopKPerKey.FlushBytesKey, TopKPerKey.DefaultFlushBytes)
      val partial = TopKPerKeyExec(keys, order, k, isPartial = true,
        flushRows = rows, flushBytes = bytes, planLater(child))
      TopKPerKeyExec(keys, order, k, isPartial = false,
        flushRows = rows, flushBytes = bytes, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Partial-side flush threshold in retained ROWS — the unique-key
    * degenerate-input bound. */
  val FlushRowsKey = "spark.graft.topk.flushRows"
  /** Partial-side flush threshold in retained BYTES (UnsafeRow sizes,
    * keys included) — the wide-row bound the row count can't see: 4M
    * retained rows of a 1 KB schema is 4 GB of un-spillable heap. The
    * SortExec plan this operator replaces spills under memory
    * pressure; the heap map can't, so it flushes by bytes instead
    * (each flush only emits extra candidates — correctness never
    * depends on either threshold). */
  val FlushBytesKey = "spark.graft.topk.flushBytes"
  val DefaultFlushRows: Long = 1L << 22
  val DefaultFlushBytes: Long = 64L << 20 // 64 MB per task

  private[plans] def confLong(key: String, default: Long): Long = {
    val raw = org.apache.spark.sql.internal.SQLConf.get.getConfString(key, default.toString)
    try math.max(1L, raw.toLong)
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$key must be a positive long, got '$raw'")
    }
  }
}

/** One heap-reduction pass; `isPartial` selects the pre-shuffle
  * (unconstrained distribution, flushing) or post-shuffle (clustered,
  * exact) role. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, isPartial: Boolean, flushRows: Long, flushBytes: Long,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (isPartial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override lazy val metrics = {
    val out = Map("numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"))
    // flushes exist only on the partial side (the final side never
    // flushes structurally — a dead 0 metric would just be UI noise)
    if (isPartial) out + ("numFlushes" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "partial heap-map flushes"))
    else out
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // k <= 0: emit nothing but KEEP the child's partition count — an
    // emptyRDD (0 partitions) would contradict outputPartitioning and
    // break a downstream co-partitioned zip (the API also short-
    // circuits k == 0 before planning; this is the defensive layer)
    if (k <= 0) {
      return child.execute()
        .mapPartitions(_ => Iterator.empty, preservesPartitioning = true)
    }
    val keyExprs = keys
    val childOutput = child.output
    val limit = k
    // serializable; codegens the comparator lazily on each executor
    val ord = new LazilyGeneratedOrdering(order, childOutput)
    // Long.MaxValue sentinel: the final side can never flush, even past
    // 2^31 retained rows (a mid-iterator flush on the FINAL side would
    // emit up to 2k rows for a key). Thresholds were floored at 1 by
    // confLong, so the epoch loop always makes progress.
    val maxRows: Long = if (isPartial) flushRows else Long.MaxValue
    val maxBytes: Long = if (isPartial) flushBytes else Long.MaxValue
    // estimate for non-UnsafeRow children (rare — execute() rows are
    // UnsafeRow in practice): header + 8 bytes per field
    val fallbackRowSize: Long = 64L + 8L * childOutput.size
    val outputRows = longMetric("numOutputRows")
    val flushes = if (isPartial) longMetric("numFlushes") else null
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // heap root = WORST retained row (reverse ordering), so a
      // replacement test is one comparison against peek()
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      def sizeOf(r: InternalRow): Long = r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong + 16L // + object header
        case _            => fallbackRowSize
      }
      new Iterator[InternalRow] {
        private val groups =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var retainedRows = 0L
        // bytes actually HELD by the heap map (keys + retained row
        // copies), the r9-advice flush trigger: a row-count proxy lets
        // wide schemas accumulate gigabytes before the first flush
        private var retainedBytes = 0L
        private var out: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        private def consume(row: InternalRow): Unit = {
          val key = keyProj(row)
          val q = groups.get(key)
          if (q == null) {
            // grow-on-demand capacity: pre-allocating `limit` slots per
            // key costs O(keys × k) memory up front at large k
            val nq = new java.util.PriorityQueue[InternalRow](
              math.max(1, math.min(limit, 16)), worstFirst)
            val c = row.copy()
            nq.add(c)
            groups.put(key.copy(), nq)
            retainedRows += 1
            retainedBytes += key.getSizeInBytes.toLong + 16L + sizeOf(c)
          } else if (q.size < limit) {
            val c = row.copy()
            q.add(c)
            retainedRows += 1
            retainedBytes += sizeOf(c)
          } else if (ord.compare(row, q.peek()) < 0) {
            val evicted = q.poll()
            val c = row.copy()
            q.add(c)
            retainedBytes += sizeOf(c) - sizeOf(evicted)
          }
        }
        private def advance(): Unit =
          while (!out.hasNext && iter.hasNext) {
            groups.clear()
            retainedRows = 0L
            retainedBytes = 0L
            while (iter.hasNext && retainedRows < maxRows && retainedBytes < maxBytes) {
              consume(iter.next())
            }
            if (iter.hasNext && flushes != null) flushes += 1 // mid-partition flush, not EOF
            val buf = new java.util.ArrayList[InternalRow]()
            groups.values.forEach(q => q.forEach(r => buf.add(r)))
            out = buf.iterator()
          }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = {
          advance()
          outputRows += 1 // per emitted row, so early-stopping consumers read true counts
          out.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override def nodeName: String =
    if (isPartial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}
