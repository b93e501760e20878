package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: value of a first-IFD TIFF/EXIF tag —
  * `graft_tiff_tag(payload, tag, maxEntries)`. Returns the integer
  * value of the entry with that tag when its type is SHORT (3) or
  * LONG (4) with count 1; null when the payload is not TIFF, the IFD
  * offset/entry table is truncated, or the tag is absent within
  * `maxEntries` entries.
  *
  * Structurally distinct from the other three walkers
  * ([[JpegSofOffset]] linear segments, [[RiffChunkOffset]] linear
  * chunks, [[BmffBoxOffset]] nested boxes): TIFF is an OFFSET-TABLE
  * format — the header points at an entry directory elsewhere in the
  * file, and every multi-byte read switches on the byte-order mark
  * (`II` little / `MM` big). Both the indirection and the endianness
  * switch live in the fused loop; a SQL formulation would double per
  * conditional read.
  *
  * Reference counterpart: none (beyond-reference multimodal surface);
  * layout per TIFF 6.0 §2: BOM, magic 42, u32 IFD offset; IFD = u16
  * entry count, 12-byte entries (tag u16, type u16, count u32, value
  * left-justified in a 4-byte field), u32 next-IFD offset. */
final case class TiffTag(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"${TiffTag.Name} expects (binary, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override protected def nullSafeEval(bytesAny: Any, tagAny: Any,
      maxAny: Any): Any = {
    val r = TiffTag.tagValue(bytesAny.asInstanceOf[Array[Byte]],
      tagAny.asInstanceOf[Int], maxAny.asInstanceOf[Int])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, tag, maxEntries) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.functions.TiffTag.tagValue($bytes, $tag, $maxEntries);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TiffTag =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TiffTag {
  val Name = "graft_tiff_tag"

  /** The tags the metadata surface reads (TIFF 6.0 baseline). */
  val ImageWidth = 256
  val ImageLength = 257

  /** The walk (static — the codegen target). Returns the tag's value
    * or −1 for absent/not-TIFF/malformed. Every multi-byte read is
    * bounds-checked BEFORE the access; endianness comes from the BOM. */
  def tagValue(bytes: Array[Byte], tag: Int, maxEntries: Int): Long = {
    if (bytes.length < 8) return -1L
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return -1L
    def u16(off: Int): Int =
      if (off < 0 || off + 1 >= bytes.length) -1
      else if (le) (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (off < 0 || off + 3 >= bytes.length) -1L
      else if (le) (bytes(off) & 0xff).toLong | ((bytes(off + 1) & 0xff).toLong << 8) |
        ((bytes(off + 2) & 0xff).toLong << 16) | ((bytes(off + 3) & 0xff).toLong << 24)
      else ((bytes(off) & 0xff).toLong << 24) | ((bytes(off + 1) & 0xff).toLong << 16) |
        ((bytes(off + 2) & 0xff).toLong << 8) | (bytes(off + 3) & 0xff).toLong
    if (u16(2) != 42) return -1L
    val ifd = u32(4)
    if (ifd < 0 || ifd > Int.MaxValue - 2) return -1L
    val n = u16(ifd.toInt)
    if (n < 0) return -1L
    var i = 0
    val lim = math.min(n, maxEntries)
    while (i < lim) {
      val e = ifd.toInt + 2 + 12 * i
      val t = u16(e)
      if (t < 0) return -1L // truncated entry table
      if (t == tag) {
        val typ = u16(e + 2)
        val count = u32(e + 4)
        if (count != 1L) return -1L
        return typ match {
          case 3 => u16(e + 8).toLong // SHORT, left-justified
          case 4 => u32(e + 8)
          case _ => -1L
        }
      }
      i += 1
    }
    -1L
  }

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$Name expects 3 arguments, got ${exprs.length}")
    TiffTag(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[TiffTag].getName, Name),
      builder)
}
