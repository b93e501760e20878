package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: 1-based offset of a named RIFF chunk's
  * 8-byte header inside a WAV payload —
  * `graft_riff_chunk(payload, fourcc, maxChunks)`, the FourCC packed
  * big-endian into an int (`'f'<<24|'m'<<16|'t'<<8|' '`). Null when the
  * payload is not `RIFF…WAVE`, the chunk chain is truncated mid-header,
  * or the chunk does not appear within `maxChunks` hops.
  *
  * Why a native expression: the chunk walk is the same data-dependent
  * offset chain as the JPEG segment walk ([[JpegSofOffset]]) — each
  * hop's offset embeds the previous hop's u32-LE size read, so the SQL
  * form can only be UNROLLED and the tree grows ~3× per level (measured
  * at ~1.5 s of driver-side analysis per plan build at depth 4 in round
  * 8). One fused loop lifts the depth bound for free: real WAVs carry
  * LIST/INFO/fact/cue chunks in arbitrary order and counts.
  *
  * The FIELD reads stay in SQL (little-endian byte arithmetic over
  * fixed offsets relative to the returned chunk position,
  * [[graft.pipeline.MultiModal.leUInt]]) so only the loop lives here.
  *
  * Reference counterpart: none (beyond-reference multimodal surface);
  * the chunk layout is the RIFF/WAVE container spec (id FourCC, u32-LE
  * size, data, word-aligned — odd sizes pad one byte).
  */
final case class RiffChunkOffset(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"${RiffChunkOffset.Name} expects (binary, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(bytesAny: Any, fourccAny: Any,
      maxAny: Any): Any = {
    val r = RiffChunkOffset.chunkOffset(bytesAny.asInstanceOf[Array[Byte]],
      fourccAny.asInstanceOf[Int], maxAny.asInstanceOf[Int])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, fourcc, maxChunks) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.functions.RiffChunkOffset.chunkOffset($bytes, $fourcc, $maxChunks);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RiffChunkOffset =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RiffChunkOffset {
  val Name = "graft_riff_chunk"

  /** FourCC packers for the chunks the WAV surface reads. */
  val FmtFourcc: Int = ('f' << 24) | ('m' << 16) | ('t' << 8) | ' '
  val DataFourcc: Int = ('d' << 24) | ('a' << 16) | ('t' << 8) | 'a'

  /** The walk itself (also the codegen target — must stay a static
    * method reachable from generated Java). Returns the 1-BASED offset
    * of the chunk's FourCC byte, or −1 for "absent / not WAV /
    * malformed". The RIFF preamble (`RIFF` + u32-LE size + `WAVE`) must
    * be fully present; each hop needs its full 8-byte header; odd chunk
    * sizes skip one pad byte (word alignment). */
  def chunkOffset(bytes: Array[Byte], fourcc: Int, maxChunks: Int): Long = {
    if (bytes.length < 12) return -1L
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F')
      return -1L
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return -1L
    var off = 12 // 0-based first chunk header
    var remaining = maxChunks
    while (remaining > 0) {
      if (off < 0 || off + 7 >= bytes.length) return -1L // truncated header
      val id = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (id == fourcc) return (off + 1).toLong
      val size = (bytes(off + 4) & 0xff).toLong |
        ((bytes(off + 5) & 0xff).toLong << 8) |
        ((bytes(off + 6) & 0xff).toLong << 16) |
        ((bytes(off + 7) & 0xff).toLong << 24)
      val hop = 8L + size + (size & 1L)
      if (off + hop > Int.MaxValue) return -1L
      off += hop.toInt
      remaining -= 1
    }
    -1L
  }

  /** Canonical arity-checked builder (see [[Functions.dotBuilder]]). */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$Name expects 3 arguments, got ${exprs.length}")
    RiffChunkOffset(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[RiffChunkOffset].getName, Name),
      builder)
}
