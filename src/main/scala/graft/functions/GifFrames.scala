package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: frame count of a GIF payload —
  * `graft_gif_frames(payload, maxBlocks)`. Null when the payload is not
  * `GIF87a`/`GIF89a`, the block chain is malformed/truncated, or the
  * trailer is not reached within `maxBlocks` hops.
  *
  * Why a native expression: the GIF data stream is the most
  * data-dependent walk of the container family — every extension and
  * every frame's image data is a CHAIN of length-prefixed sub-blocks
  * (`[len][bytes]…0`), and image descriptors may carry a local color
  * table whose size is read from a packed bit field. Each hop's offset
  * embeds the previous sub-block's length byte, so the SQL form cannot
  * even be unrolled to a fixed depth (sub-block counts are unbounded).
  * Same rationale as [[RiffChunkOffset]]/[[BmffBoxOffset]]: one fused
  * loop, the FIELD reads (width/height u16-LE at fixed offsets) stay in
  * SQL.
  *
  * Reference counterpart: none (beyond-reference multimodal surface);
  * the block layout is the GIF87a/89a spec (logical screen descriptor +
  * optional global color table, 0x21 extensions, 0x2C image
  * descriptors, 0x3B trailer).
  */
final case class GifFrameCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"${GifFrameCount.Name} expects (binary, int), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override protected def nullSafeEval(bytesAny: Any, maxAny: Any): Any = {
    val r = GifFrameCount.frameCount(bytesAny.asInstanceOf[Array[Byte]],
      maxAny.asInstanceOf[Int])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, maxBlocks) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.functions.GifFrameCount.frameCount($bytes, $maxBlocks);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GifFrameCount =
    copy(left = newLeft, right = newRight)
}

object GifFrameCount {
  val Name = "graft_gif_frames"

  /** The walk itself (codegen target — stays a static method reachable
    * from generated Java). Returns the image-descriptor count, or −1
    * for "not a GIF / malformed / trailer not reached in maxBlocks
    * top-level blocks". Sub-block chains hop by their length prefixes;
    * global and local color tables hop by their packed-field sizes. */
  def frameCount(bytes: Array[Byte], maxBlocks: Int): Long = {
    if (bytes.length < 13) return -1L
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') || bytes(5) != 'a')
      return -1L
    var off = 13 // header(6) + logical screen descriptor(7)
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 7) + 1)) // global color table
    // hop a [len][bytes]...0 sub-block chain starting at `o`; -1 if truncated
    def skipSubBlocks(o0: Int): Int = {
      var o = o0
      while (true) {
        if (o >= bytes.length) return -1
        val len = bytes(o) & 0xff
        if (len == 0) return o + 1
        o += 1 + len
      }
      -1 // unreachable
    }
    var frames = 0L
    var remaining = maxBlocks
    while (remaining > 0) {
      if (off >= bytes.length) return -1L // ran past the end before 0x3B
      (bytes(off) & 0xff) match {
        case 0x3b => return frames // trailer
        case 0x21 => // extension: introducer + label + sub-blocks
          off = skipSubBlocks(off + 2)
          if (off < 0) return -1L
        case 0x2c => // image descriptor (10 bytes incl. introducer)
          if (off + 9 >= bytes.length) return -1L
          val ip = bytes(off + 9) & 0xff
          off += 10
          if ((ip & 0x80) != 0) off += 3 * (1 << ((ip & 7) + 1)) // local color table
          off += 1 // LZW minimum code size
          off = skipSubBlocks(off)
          if (off < 0) return -1L
          frames += 1L
        case _ => return -1L
      }
      remaining -= 1
    }
    -1L
  }

  /** Canonical arity-checked builder (see [[Functions.dotBuilder]]). */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name expects 2 arguments, got ${exprs.length}")
    GifFrameCount(exprs(0), exprs(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[GifFrameCount].getName, Name),
      builder)
}
