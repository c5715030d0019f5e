package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the inner product of two double
  * arrays, with whole-stage codegen.
  *
  * Why custom (SURVEY.md §2.9 preference order: built-in → Expression →
  * plan node → mapPartitions): the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an intermediate
  * array per row and evaluates three interpreted lambda frames per
  * element — measured 26 s for the 4M-pair ANN query at sf0.1. This
  * expression compiles to a tight `for` loop inside the generated code
  * (no allocation, no virtual calls) and keeps the pair computation
  * inside the same WholeStageCodegen span as the join.
  *
  * Numerics are IDENTICAL to the built-in formulation — a strict left
  * fold starting at 0.0 — so the DuckDB oracle's `list_reduce` fold
  * still matches bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double> — callers cast (VectorExpressions
  // is internal; ExpectsInputTypes' AbstractDataType is private[sql]).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two double arrays — same codegen
  * rationale and strict-left-fold numerics as [[DotProduct]] (the
  * interpreted `aggregate(zip_with(...))` form it replaces evaluated
  * three lambda frames and an array allocation per row in the PQ
  * codebook/ADC scans). `acc += (x−y)²` in element order matches the
  * oracle's `list_reduce` fold bit-for-bit. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All-tables sign-LSH bucket ids of one vector, in a single tight
  * loop: element t of the result is table t's bucket (bit j set iff
  * the projection onto plane j of table t is positive).
  *
  * Why custom: the composed form — nTables × nPlanes `CASE WHEN
  * graft_dot(v, <64-double literal>) > 0` terms summed per table —
  * builds a >1 MB expression tree whose generated whole-stage method
  * blows past the JIT's huge-method limit, leaving the hot loop
  * INTERPRETED bytecode (measured 5.2 s steady-state vs 1.3 s with
  * codegen off at a 20k corpus, np=8). Here the plane signs come from
  * the same per-cell LCG ([[graft.similarity.Ann.planes]]) computed
  * inside the loop, so the expression tree is one node and the
  * signature work is nTables·nPlanes·dim adds in compiled Scala
  * (CodegenFallback — the MinHashSig posture: per-row eval cost
  * dominates, not expression dispatch).
  *
  * Numerics: identical to `bucketOf(v, planes(nPlanes, dim, t))` —
  * the projection is the same strict left fold over d (±1.0·x ≡ ±x in
  * IEEE), same `> 0` sign test, same bit weights — so every LSH oracle
  * and recall pin replays unchanged. */
case class SignLshBuckets(child: Expression, nTables: Int, nPlanes: Int,
    dim: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var j = 0
      while (j < nPlanes) {
        var acc = 0.0
        var d = 0
        while (d < n) {
          // plane sign: bit 16 of the LCG stream, per (table, j, d) —
          // MUST stay identical to Ann.planes
          val x = (1103515245L * (j * dim + d + 1 + t * 7919L) + 12345L) & 0x7FFFFFFFL
          val xd = v.getDouble(d)
          acc += (if (((x >> 16) & 1L) == 1L) xd else -xd)
          d += 1
        }
        if (acc > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level inner product backed by [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column-level squared L2 distance backed by [[L2Squared]]. */
  def l2Squared(a: Column, b: Column): Column =
    Bridge.column(L2Squared(Bridge.expression(a), Bridge.expression(b)))

  /** Per-table sign-LSH buckets (array indexed by table id) backed by
    * [[SignLshBuckets]]. */
  def signLshBuckets(v: Column, nTables: Int, nPlanes: Int, dim: Int): Column =
    Bridge.column(SignLshBuckets(Bridge.expression(v), nTables, nPlanes, dim))
}
