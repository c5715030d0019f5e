package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 1-based byte offset of the first JPEG SOF0/SOF2 marker (the frame
  * header carrying height/width), found by the standard segment walk:
  * SOI, then hops of `offset += 2 + BE16(length)` until FFC0/FFC2.
  *
  * Why custom (the SignLshBuckets escape, round 14): the walk as
  * composed Column math duplicates the offset subtree per hop (the
  * next offset embeds the previous one twice — once advanced, once
  * under the length read), so the expression, its generated code, and
  * its evaluation cost all DOUBLE per hop: measured 4 s at 4 hops →
  * 40 s at 8 hops over 5k rows. Here the walk is a JVM loop over the
  * byte array — O(maxSegments) per row, hop count a parameter instead
  * of a plan-size budget. CodegenFallback (the MinHashSig posture):
  * per-row work dominates, not expression dispatch.
  *
  * NULL for non-JPEG bytes (no FFD8 SOI), malformed segment streams
  * (a non-FF byte where a marker must start), truncation, or an SOF
  * deeper than `maxSegments`. FFC4 (DHT) is not a frame header and is
  * correctly hopped over.
  */
case class JpegSofOffset(child: Expression, maxSegments: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_sof"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 4 || b(0) != 0xFF.toByte || b(1) != 0xD8.toByte) null
    else {
      var off = 2
      var i = 0
      while (i < maxSegments) {
        if (off + 3 >= b.length || b(off) != 0xFF.toByte) return null
        val marker = b(off + 1) & 0xFF
        if (marker == 0xC0 || marker == 0xC2) return (off + 1).toLong // 1-based
        off += 2 + (((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF))
        i += 1
      }
      null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaExpressions {
  /** Column-level SOF-offset walk backed by [[JpegSofOffset]]. */
  def jpegSofOffset(content: Column, maxSegments: Int): Column =
    Bridge.column(JpegSofOffset(Bridge.expression(content), maxSegments))
}
