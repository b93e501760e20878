package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression: 2-D Hilbert curve index of two
  * non-negative `order`-bit coordinates (the classic xy→d walk with
  * per-level quadrant rotation).
  *
  * Why native: the rotation makes each level's (x, y) depend on the
  * previous level's BOTH coordinates, so an expression-tree
  * formulation doubles per level — 2¹⁶ nodes at order 16, straight
  * into the janino 64 KB trap ([[PqEncode]]'s lesson). The fused loop
  * is ~10 integer ops per level and joins whole-stage codegen. The
  * DuckDB oracle replays the identical walk as a LINEAR chain of
  * per-level CTEs ([[graft.operators.Layout.hilbertSql]]) — same
  * states, no blowup.
  *
  * Contract: inputs outside [0, 2^order) yield NULL (callers bucket or
  * offset first — rank/day/bucket ids, as with the Morton key); the
  * result is in [0, 4^order), and consecutive indices are ALWAYS
  * Manhattan-adjacent cells — the locality property Z-order lacks and
  * the reason Hilbert clustering prunes better on range predicates in
  * both dimensions (spec-pinned on the full order-3 grid). */
final case class HilbertKey(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1, 31]: $order")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${HilbertKey.Name} expects two bigint coordinates, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    val lim = 1L << order
    if (x < 0 || y < 0 || x >= lim || y >= lim) return null
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b;
         |if ($x < 0L || $y < 0L || $x >= (1L << $order) || $y >= (1L << $order)) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (long $s = 1L << ${order - 1}; $s > 0L; $s >>= 1) {
         |    long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |    long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |    $d += $s * $s * ((3L * $rx) ^ $ry);
         |    if ($ry == 0L) {
         |      if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |      long $t = $x; $x = $y; $y = $t;
         |    }
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  val Name = "graft_hilbert"

  /** graft_hilbert(x, y, order) — order must be a foldable int literal. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$Name expects 3 arguments, got ${exprs.length}")
    val order = exprs(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$Name order must be an int literal, got $other")
    }
    HilbertKey(exprs(0), exprs(1), order)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[HilbertKey].getName, Name),
      builder)

  def hilbert(spark: SparkSession, x: Column, y: Column, order: Int): Column = {
    register(spark)
    call_function(Name, x, y, org.apache.spark.sql.functions.lit(order))
  }
}
