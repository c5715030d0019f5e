package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram word shingling: `array<string>` of words → distinct
  * space-joined n-grams, first-occurrence order.
  *
  * Why custom: the built-in formulation
  * `array_distinct(transform(sequence(1, size-n+1), i -> concat_ws(...)))`
  * evaluates an interpreted lambda tree per shingle — measured 13 s just
  * to shingle 5k docs (260k shingles) at sf0.1, i.e. ~50 µs per shingle.
  * This expression does the same work in a tight UTF8String loop
  * (CodegenFallback: the per-row eval is a native method call, which is
  * already 2 orders of magnitude cheaper than the lambda interpreter;
  * the surrounding projection still codegens).
  *
  * Semantics match the built-in chain exactly: fewer than n words ⇒
  * empty array; duplicates collapse keeping first occurrence.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new java.util.LinkedHashSet[UTF8String](len * 2)
      var i = 0
      while (i <= len - n) {
        var s = arr.getUTF8String(i)
        var j = 1
        while (j < n) { s = UTF8String.concat(s, space, arr.getUTF8String(i + j)); j += 1 }
        out.add(s)
        i += 1
      }
      new GenericArrayData(out.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Distinct n-gram shingles of a words array (native, see above). */
  def wordShingles(words: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(words), n))
}
