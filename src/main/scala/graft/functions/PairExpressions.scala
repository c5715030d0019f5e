package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** All unordered pairs (u < v) drawn from one order's item multiset —
  * the per-group kernel that turns a co-occurrence SELF-JOIN into a
  * single aggregation (SURVEY.md §2.9 preference order: this is the
  * "custom Expression" rung; reference behavior is the basket-pair
  * rollup a BI mart materializes nightly).
  *
  * Semantics match `a JOIN b ON same_group AND a.key < b.key` exactly:
  * the input is treated as a MULTISET — for every pair of element
  * INSTANCES with distinct values one (min, max) row is emitted, so a
  * basket {5, 5, 7} yields (5,7) twice, and equal-valued instance
  * pairs yield nothing. Sorting internally makes the output canonical
  * regardless of collect_list's partition-dependent order.
  *
  * Scale: group sizes are basket sizes (bounded small), so the output
  * is ≤ k² per group with tiny k — while the self-join it replaces
  * shuffles the fact table twice. The expansion runs inside the same
  * WholeStageCodegen span as the surrounding projection (the generated
  * code is one static-call delegation, the loop lives in compiled
  * Scala, not interpreted lambda frames).
  */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_sorted_pairs"

  /** The kernel copies via `toLongArray`, which reads null slots as 0
    * (ArrayData's primitive bulk copy ignores the null bitmap) — so a
    * nullable-element array is REJECTED AT ANALYSIS instead of
    * silently pairing phantom zeros. Callers aggregate non-null casts
    * (`collect_list` never emits null slots), so the constraint costs
    * them nothing. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> with non-nullable elements, " +
            s"got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    SortedPairsKernel.expand(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("sortedPairsKernel", SortedPairsKernel,
      SortedPairsKernel.getClass.getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $kernel.expand($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedPairsKernel extends Serializable {
  def expand(arr: ArrayData): ArrayData = {
    val xs = arr.toLongArray()
    java.util.Arrays.sort(xs)
    val n = xs.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * (n - 1) / 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (xs(i) != xs(j)) out += InternalRow(xs(i), xs(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** [[SortedPairs]] with a weight per element: emits every (u < v)
  * id pair with the PRODUCT of the two weights — the per-posting
  * kernel of a term-at-a-time sparse dot product (d14's Σ w_x·w_y per
  * shared shingle). Ids must be distinct within one group (one posting
  * per (doc, term) by construction); output is canonical regardless of
  * collect order. */
case class WeightedPairs(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("p", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_weighted_pairs"

  /** Same analysis-time guard as [[SortedPairs]]: null slots are
    * unreadable by the primitive getters, so both arrays must carry
    * non-nullable elements; a length mismatch is a runtime error in
    * the kernel (the two arrays are parallel by contract). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(DoubleType, false)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<double>) with " +
            s"non-nullable elements, got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    WeightedPairsKernel.expand(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("weightedPairsKernel", WeightedPairsKernel,
      WeightedPairsKernel.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $kernel.expand($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WeightedPairsKernel extends Serializable {
  def expand(idArr: ArrayData, wArr: ArrayData): ArrayData = {
    val n = idArr.numElements()
    require(wArr.numElements() == n,
      s"graft_weighted_pairs: parallel arrays differ in length " +
        s"($n ids vs ${wArr.numElements()} weights)")
    val ids = new Array[Long](n)
    val ws = new Array[Double](n)
    // sort members by id so every pair emits canonically (u < v)
    val order = (0 until n).sortBy(idArr.getLong)
    var i = 0
    while (i < n) {
      ids(i) = idArr.getLong(order(i)); ws(i) = wArr.getDouble(order(i)); i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * (n - 1) / 2)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out += InternalRow(ids(i), ids(j), ws(i) * ws(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** |A ∩ B| of two SORTED, DISTINCT string arrays by a single merge
  * walk — the pair-verify kernel of the set-similarity joins (d16):
  * `size(array_intersect(a, b))` builds a hash set per CALL (one
  * allocation + |A|+|B| string hashes per candidate pair — measured
  * ~30 µs/pair, 2× the whole exploded-index verify), while the merge
  * walk is |A|+|B| binary UTF8String comparisons with zero allocation.
  * Inputs must be ascending in UTF8String binary order (array_sort's
  * StringType order) with distinct elements — exactly what
  * `array_sort(wordShingles(...))` produces; under those preconditions
  * the count equals |A∩B| exactly. Codegen is one static-call
  * delegation, so the walk lives inside the surrounding
  * WholeStageCodegen span (SURVEY.md §2.9 preference order). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect_count"

  /** Element nullability is a caller contract, not an analysis gate
    * (test literals carry containsNull = true even when no slot is
    * null): an actual null slot has no binary order and fails loudly
    * in the kernel (NPE) rather than miscounting. The d16 shingle
    * arrays declare containsNull = false by construction. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<string> inputs, " +
            s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("sortedIntersectKernel", SortedIntersectKernel,
      SortedIntersectKernel.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel.count($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectKernel extends Serializable {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

object PairExpressions {
  /** Column-level basket-pair expansion backed by [[SortedPairs]];
    * input must be array<long> (callers cast). */
  def sortedPairs(items: Column): Column =
    Bridge.column(SortedPairs(Bridge.expression(items)))

  /** Column-level weighted pair expansion backed by [[WeightedPairs]];
    * inputs are parallel array<long> ids and array<double> weights. */
  def weightedPairs(ids: Column, weights: Column): Column =
    Bridge.column(WeightedPairs(Bridge.expression(ids), Bridge.expression(weights)))

  /** Column-level sorted-set intersection count backed by
    * [[SortedIntersectCount]]; both inputs must be array<string>,
    * ascending, distinct, non-null elements. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
