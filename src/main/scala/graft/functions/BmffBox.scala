package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: 1-based offset of a named ISO BMFF (MP4)
  * box header at the TOP level of a payload —
  * `graft_bmff_box(payload, fourcc, maxBoxes)`, the FourCC packed
  * big-endian into an int. Null when the box chain is malformed (a box
  * shorter than its 8-byte header, a truncated largesize) or the box
  * does not appear within `maxBoxes` hops.
  *
  * Same rationale as [[RiffChunkOffset]]/[[JpegSofOffset]]: the walk is
  * a data-dependent offset chain (each hop embeds the previous box's
  * u32-BE — or u64 largesize — length read), which SQL can only express
  * unrolled at ~3× tree growth per level. Nested searches (mvhd inside
  * moov) compose WITHOUT a start-offset argument: slice the parent's
  * body with substr-on-binary and walk the slice — the codegen'd
  * binary substr is the composition operator.
  *
  * Reference counterpart: none (beyond-reference multimodal surface);
  * the box layout is ISO/IEC 14496-12 §4.2 (u32-BE size including the
  * header, FourCC type, size==1 → u64 largesize follows, size==0 → box
  * extends to end of file).
  */
final case class BmffBoxOffset(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"${BmffBoxOffset.Name} expects (binary, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(bytesAny: Any, fourccAny: Any,
      maxAny: Any): Any = {
    val r = BmffBoxOffset.boxOffset(bytesAny.asInstanceOf[Array[Byte]],
      fourccAny.asInstanceOf[Int], maxAny.asInstanceOf[Int])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, fourcc, maxBoxes) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.functions.BmffBoxOffset.boxOffset($bytes, $fourcc, $maxBoxes);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BmffBoxOffset =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BmffBoxOffset {
  val Name = "graft_bmff_box"

  /** FourCC packers for the boxes the MP4 surface reads. */
  val FtypFourcc: Int = ('f' << 24) | ('t' << 16) | ('y' << 8) | 'p'
  val MoovFourcc: Int = ('m' << 24) | ('o' << 16) | ('o' << 8) | 'v'
  val MvhdFourcc: Int = ('m' << 24) | ('v' << 16) | ('h' << 8) | 'd'

  /** The walk itself (also the codegen target — must stay a static
    * method reachable from generated Java). Returns the 1-BASED offset
    * of the box's size field, or −1 for "absent / malformed". size==1
    * reads the u64 largesize that follows the FourCC; size==0 means
    * "to end of payload" (terminal — nothing can follow, so a miss
    * there is a miss overall); any other size below 8 is malformed. */
  def boxOffset(bytes: Array[Byte], fourcc: Int, maxBoxes: Int): Long = {
    var off = 0L
    var remaining = maxBoxes
    while (remaining > 0) {
      if (off < 0 || off + 8 > bytes.length) return -1L // truncated header
      val o = off.toInt
      val size = (bytes(o) & 0xffL) << 24 | (bytes(o + 1) & 0xffL) << 16 |
        (bytes(o + 2) & 0xffL) << 8 | (bytes(o + 3) & 0xffL)
      val id = ((bytes(o + 4) & 0xff) << 24) | ((bytes(o + 5) & 0xff) << 16) |
        ((bytes(o + 6) & 0xff) << 8) | (bytes(o + 7) & 0xff)
      if (id == fourcc) return off + 1
      val hop =
        if (size == 0L) return -1L // terminal box and not a match
        else if (size == 1L) {
          if (off + 16 > bytes.length) return -1L // truncated largesize
          var ls = 0L
          var i = 0
          while (i < 8) { ls = (ls << 8) | (bytes(o + 8 + i) & 0xffL); i += 1 }
          if (ls < 16L) return -1L // must cover header + largesize
          ls
        } else if (size < 8L) return -1L // malformed: smaller than header
        else size
      off += hop
      remaining -= 1
    }
    -1L
  }

  /** Canonical arity-checked builder (see [[Functions.dotBuilder]]). */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$Name expects 3 arguments, got ${exprs.length}")
    BmffBoxOffset(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[BmffBoxOffset].getName, Name),
      builder)
}
