package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression: Σ a[i]·b[i] over two array columns
  * (float or double elements, independently per side), accumulated
  * left-to-right in double.
  *
  * This is the custom-Expression tier of the extension ladder (compose >
  * Expression > custom plan > mapPartitions): the interpreted path and
  * the generated code are a single fused loop over the unsafe array data
  * — no per-element boxing, no 64-node expression tree, and it
  * participates in whole-stage codegen wherever the hot ANN joins run.
  *
  * Determinism contract: the loop accumulates in element order with
  * double arithmetic, bit-identical to the explicit left-associated
  * chains the DuckDB oracle evaluates ([[graft.pipeline.Oracles]]).
  * Null elements are not expected (embedding arrays are dense); a null
  * array yields null via BinaryExpression's null-safe wrapper.
  */
final case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Length mismatch yields NULL (both tiers) rather than silently
    * truncating to the shorter array — an upstream dimension bug should
    * surface as missing similarities, not plausible-but-wrong ones. */
  override def nullable: Boolean = true

  private def elementType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left.dataType), elementType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val xd = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    val yd = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xe = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val ye = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      s += xe * ye
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def elem(arr: String, dt: DataType): String = dt match {
        case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
        case _                        => s"((double) $arr.getFloat($i))"
      }
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${elem(a, left.dataType)} * ${elem(b, right.dataType)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of the engine's native functions (the
  * session-extension injection point, usable on an already-running
  * session). Idempotent: re-registration replaces the prior entry. */
object Functions {
  val DotName = "graft_dot"

  /** The canonical builder, shared by runtime registration and
    * [[graft.GraftExtensions]] injection. Arity-checked: wrong-arity
    * SQL must surface a descriptive analysis error, not an
    * IndexOutOfBoundsException from a pure-SQL client. */
  val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$DotName expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(DotName),
      new ExpressionInfo(classOf[DotProduct].getName, DotName),
      dotBuilder)

  /** Σ a[i]·b[i] as a Column (registers the function on the column's
    * session at first use — call sites pass the owning session). */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(DotName, a, b)
  }

  /** PQ encode as a Column: the cent_id from `cids` whose `books` row
    * minimizes (c·c − 2·sub·c), ties by smaller cent_id ([[PqEncode]]). */
  def pqEncode(spark: SparkSession, sub: Column, books: Column, cids: Column): Column = {
    PqEncode.register(spark)
    call_function(PqEncode.Name, sub, books, cids)
  }

  /** Unicode NFC normalization as a Column ([[NfcNormalize]]). */
  def nfc(spark: SparkSession, s: Column): Column = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(NfcNormalize.Name),
      new ExpressionInfo(classOf[NfcNormalize].getName, NfcNormalize.Name),
      NfcNormalize.builder)
    call_function(NfcNormalize.Name, s)
  }
}
