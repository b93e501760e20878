package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: 1-based offset of the first JPEG
  * SOF0/1/2 marker, walking the segment chain from just after SOI —
  * `graft_jpeg_sof(payload, maxSegments)`. Null when the chain is
  * malformed (truncated marker pair, a byte where 0xFF must be) or no
  * SOF appears within `maxSegments` hops.
  *
  * Why a native expression: the same walk as data-dependent SQL
  * (substr + hex + conv per hop) can only be expressed UNROLLED, and
  * each hop's offset embeds the previous hop's offset and length read —
  * the tree grows ~3× per level, and at depth 4 the query pays ~1.5 s of
  * driver-side analysis every time the plan is built (measured round 8).
  * This is one fused loop — the [[PqEncode]] move applied to the byte
  * walk — and it lifts the depth bound for free: real EXIF headers with
  * many APPn segments stop needing a tuned `maxSegments`.
  *
  * Reference counterpart: none (beyond-reference multimodal surface);
  * the JPEG frame layout is ITU T.81 §B.2.2 (marker, u16 length
  * including itself, then the frame header fields).
  */
final case class JpegSofOffset(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"${JpegSofOffset.Name} expects (binary, int), got (${a.simpleString}, ${b.simpleString})")
  }

  override protected def nullSafeEval(bytesAny: Any, maxAny: Any): Any = {
    val r = JpegSofOffset.sofOffset(bytesAny.asInstanceOf[Array[Byte]],
      maxAny.asInstanceOf[Int])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, maxSeg) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.functions.JpegSofOffset.sofOffset($bytes, $maxSeg);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JpegSofOffset =
    copy(left = newLeft, right = newRight)
}

object JpegSofOffset {
  val Name = "graft_jpeg_sof"

  /** The walk itself (also the codegen target — must stay a static
    * method reachable from generated Java). Returns the 1-BASED offset
    * of the SOF marker's 0xFF byte, or −1 for "no SOF / malformed".
    * Matches the prior SQL semantics exactly: the marker pair must be
    * fully present, the first byte must be 0xFF, SOF codes are
    * 0xC0..0xC2, and a non-SOF segment needs its full u16 length to
    * hop over. */
  def sofOffset(bytes: Array[Byte], maxSegments: Int): Long = {
    var off = 2 // 0-based marker start (byte 3 in 1-based terms)
    var remaining = maxSegments
    while (remaining > 0) {
      if (off + 1 >= bytes.length || off < 0) return -1L // truncated / overflowed
      if ((bytes(off) & 0xff) != 0xff) return -1L
      val code = bytes(off + 1) & 0xff
      if (code >= 0xc0 && code <= 0xc2) return (off + 1).toLong
      if (remaining == 1) return -1L
      if (off + 3 >= bytes.length) return -1L
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      off += 2 + len
      remaining -= 1
    }
    -1L
  }

  /** Canonical arity-checked builder (see [[Functions.dotBuilder]]). */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name expects 2 arguments, got ${exprs.length}")
    JpegSofOffset(exprs(0), exprs(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[JpegSofOffset].getName, Name),
      builder)
}
