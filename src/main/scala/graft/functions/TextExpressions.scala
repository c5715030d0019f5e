package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

/** md5-derived hashing shared by the native signature expressions —
  * bit-identical to the builtin chains they replace
  * (`conv(substring(md5(x), 1, k), 16, 10)`, TextAnalysis.hash28/60). */
private object GraftHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md.get(); m.reset(); m.digest(bytes)
  }

  /** First 7 hex chars of md5 (28 bits) as a long. */
  def hash28(s: UTF8String): Long = {
    val d = digest(s.getBytes)
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >>> 4)
  }

  /** First 15 hex chars of md5("salt:" + s) (60 bits) as a long. */
  def hash60(prefix: Array[Byte], s: UTF8String): Long = {
    val sb = s.getBytes
    val in = new Array[Byte](prefix.length + sb.length)
    System.arraycopy(prefix, 0, in, 0, prefix.length)
    System.arraycopy(sb, 0, in, prefix.length, sb.length)
    val d = digest(in)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Native MinHash signature: `array<string>` shingles → `array<long>`
  * of K permutation minima, `h_j = min((a_j * hash28(s) + b_j) % p)`.
  *
  * Why custom: the previous formulation exploded every shingle
  * (~300k rows at sf0.1) and ran a K-way min aggregation — an extra
  * shuffle per signature build. This computes all K minima in one pass
  * over the array, turning signature generation into a pure projection
  * (embarrassingly parallel scan work at 100 TB; the only remaining
  * shuffle in the LSH pipeline is the band-bucket join itself).
  * Empty shingle set ⇒ NULL, mirroring the explode+groupBy dropping
  * shingle-less docs. */
case class MinHashSig(child: Expression, params: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) null
    else {
      val k = params.length
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < len) {
        val base = GraftHash.hash28(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val (a, b) = params(j)
          val h = (a * base + b) % p
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native SimHash signature: `array<string>` words → 60-bit long.
  * Frequency-weighted bit votes (±1 per token occurrence per bit),
  * bit i set iff its vote sum is positive — integer sums, so the
  * result is order-independent and matches the previous
  * explode + 60-conditional-sums aggregation exactly, without the
  * shuffle. */
case class SimHashSig(child: Expression, salt: String)
    extends UnaryExpression with CodegenFallback {

  private val prefix = (salt + ":").getBytes("UTF-8")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < len) {
      val hv = GraftHash.hash60(prefix, arr.getUTF8String(i))
      var b = 0
      while (b < 60) {
        if (((hv >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native BPE-ish token count: maximal `[a-z]+` runs + maximal
  * `[0-9]+` runs + one token per other non-space character — exactly
  * the match count of the regex `[a-z]+|[0-9]+|[^a-z0-9 ]` (greedy
  * alternation ⇒ maximal runs), as a single linear scan. The regex
  * engine costs ~5–10 µs per document; this loop is ~50× cheaper and
  * was the difference between 18.7 s and ~2 s for token counting on
  * the 100× corpus. (Counts chars, not code points — identical on
  * BMP text; the corpus is ASCII.) */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    var i = 0
    var count = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        count += 1
        while (i < len && s.charAt(i) >= 'a' && s.charAt(i) <= 'z') i += 1
      } else if (c >= '0' && c <= '9') {
        count += 1
        while (i < len && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      } else {
        if (c != ' ') count += 1
        i += 1
      }
    }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass intra-document segment dedup (t14): text → struct
  * (clean_text, n_kept, n_segments), where the text's words are tiled
  * into `width`-token segments and duplicate segments collapse keeping
  * first occurrence.
  *
  * Why custom: the Column formulation (split → transform+slice+
  * array_join → array_distinct → array_join) evaluates interpreted
  * higher-order lambdas per segment AND falls out of whole-stage
  * codegen (HOFs have no doGenCode), re-materializing the token array
  * for each of its three consumers. One native walk does all of it;
  * TextAnalysisSpec pins bit-equality against the Column chain on the
  * real corpus plus the empty/trailing-space edges (`split(s, " ", -1)`
  * keeps trailing empties exactly like Spark's `split`).
  */
case class SegmentDedup(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.StructField

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false)))
  override def prettyName: String = "graft_segment_dedup"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length
    val nSeg = (n + width - 1) / width
    val seen = new java.util.HashSet[String](nSeg * 2)
    val out = new java.lang.StringBuilder(input.asInstanceOf[UTF8String].numBytes())
    var kept = 0
    var i = 0
    while (i < nSeg) {
      val from = i * width
      val until = math.min(n, from + width)
      val seg = new java.lang.StringBuilder()
      var j = from
      while (j < until) {
        if (j > from) seg.append(' ')
        seg.append(toks(j))
        j += 1
      }
      val s = seg.toString
      if (seen.add(s)) {
        if (kept > 0) out.append(' ')
        out.append(s)
        kept += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(out.toString), kept, nSeg)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Distinct n-gram shingles of a words array (native, see above). */
  def wordShingles(words: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(words), n))

  /** One-pass intra-doc segment dedup (native, see above). */
  def segmentDedup(text: Column, width: Int): Column =
    Bridge.column(SegmentDedup(Bridge.expression(text), width))

  /** BPE-ish token count of a text column (native, see above). */
  def bpeTokenCount(text: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text)))

  /** K-permutation MinHash signature of a shingle array (native). */
  def minhashSig(shingles: Column, params: Seq[(Long, Long)], p: Long): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), params, p))

  /** 60-bit SimHash of a words array (native). */
  def simhashSig(words: Column, salt: String): Column =
    Bridge.column(SimHashSig(Bridge.expression(words), salt))
}
