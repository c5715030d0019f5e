package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EqualTo, Expression, Greatest, GreaterThan, If,
  IsNull, Least, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.DataType

/** Deterministic argmax/argmin aggregate — the tie-pinned twin of
  * Spark's `max_by`/`min_by` (SURVEY.md §2.9; a NEW extensibility rung
  * for the engine: custom AGGREGATE function, where the existing
  * native expressions are all scalar).
  *
  * `max_by(arg, ord)` is documented non-deterministic when two rows
  * share the maximal `ord` — which makes it unusable anywhere results
  * are hash-compared (the whole engine posture) or replayed across
  * retries. `ArgExtremum` pins the tie rule: among rows whose `ord`
  * equals the extremum, return the LEAST (`tieLow = true`) or
  * GREATEST `arg`. x15's "blocking supplier" is the motivating shape:
  * the unique-max test `argmax_low(sk) == argmax_high(sk)` replaces a
  * window + tie-count rollup.
  *
  * Why a [[DeclarativeAggregate]] and not a struct trick: the
  * equivalent `max(struct(ord, arg))` carries a STRUCT aggregation
  * buffer, which `HashAggregateExec` cannot hold in its unsafe-row
  * hash map — the plan silently degrades to `SortAggregate` with a
  * full per-partition sort of the fact table. This aggregate's buffer
  * is two ATOMIC fields (`ord`, `arg`), so it hash-aggregates with
  * map-side partial combine, and its update/merge are pure Catalyst
  * expression trees (If/GreaterThan/Least) — codegen'd by the same
  * machinery as the built-in `max`.
  *
  * Null semantics (matches `max_by`): rows with NULL `ord` are
  * ignored; if all rows have NULL `ord` the result is NULL; a NULL
  * `arg` on the extremal row propagates through the tie rule via
  * Least/Greatest's null-skipping.
  */
case class ArgExtremum(ord: Expression, arg: Expression,
    findMax: Boolean, tieLow: Boolean) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, arg)
  override def nullable: Boolean = true
  override def dataType: DataType = arg.dataType
  override def prettyName: String =
    (if (findMax) "graft_argmax" else "graft_argmin") +
      (if (tieLow) "_low" else "_high")

  private lazy val bufOrd =
    AttributeReference("buf_ord", ord.dataType, nullable = true)()
  private lazy val bufArg =
    AttributeReference("buf_arg", arg.dataType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bufOrd, bufArg)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, ord.dataType),
    Literal.create(null, arg.dataType))

  private def beats(challenger: Expression, incumbent: Expression): Expression =
    if (findMax) GreaterThan(challenger, incumbent)
    else LessThan(challenger, incumbent)

  private def tie(a: Expression, b: Expression): Expression =
    if (tieLow) Least(Seq(a, b)) else Greatest(Seq(a, b))

  /** (newOrd, newArg) folded into (bufOrd, bufArg); shared verbatim by
    * update (input row) and merge (partial buffer) — the fold is
    * associative and commutative by construction. */
  private def fold(newOrd: Expression, newArg: Expression): Seq[Expression] = Seq(
    If(IsNull(newOrd), bufOrd,
      If(Or(IsNull(bufOrd), beats(newOrd, bufOrd)), newOrd, bufOrd)),
    If(IsNull(newOrd), bufArg,
      If(Or(IsNull(bufOrd), beats(newOrd, bufOrd)), newArg,
        If(EqualTo(newOrd, bufOrd), tie(bufArg, newArg), bufArg))))

  override lazy val updateExpressions: Seq[Expression] = fold(ord, arg)

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(
      If(IsNull(bufOrd.right), bufOrd.left,
        If(Or(IsNull(bufOrd.left), beats(bufOrd.right, bufOrd.left)),
          bufOrd.right, bufOrd.left)),
      If(IsNull(bufOrd.right), bufArg.left,
        If(Or(IsNull(bufOrd.left), beats(bufOrd.right, bufOrd.left)),
          bufArg.right,
          If(EqualTo(bufOrd.right, bufOrd.left),
            tie(bufArg.left, bufArg.right), bufArg.left))))

  override lazy val evaluateExpression: Expression = bufArg

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), arg = newChildren(1))
}

object AggExpressions {
  private def agg(ord: Column, arg: Column, findMax: Boolean, tieLow: Boolean): Column =
    Bridge.column(
      ArgExtremum(Bridge.expression(ord), Bridge.expression(arg),
        findMax, tieLow).toAggregateExpression())

  /** `arg` of the row with maximal `ord`; ties → least `arg`. */
  def argMax(ord: Column, arg: Column): Column = agg(ord, arg, findMax = true, tieLow = true)

  /** `arg` of the row with maximal `ord`; ties → greatest `arg`. */
  def argMaxHigh(ord: Column, arg: Column): Column = agg(ord, arg, findMax = true, tieLow = false)

  /** `arg` of the row with minimal `ord`; ties → least `arg`. */
  def argMin(ord: Column, arg: Column): Column = agg(ord, arg, findMax = false, tieLow = true)

  /** `arg` of the row with minimal `ord`; ties → greatest `arg`. */
  def argMinHigh(ord: Column, arg: Column): Column = agg(ord, arg, findMax = false, tieLow = false)
}
