package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression: Σ a[i]·b[i] over two float-array columns,
  * accumulated left-to-right in double.
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

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
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

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(DotName),
      new ExpressionInfo(classOf[DotProduct].getName, DotName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))

  /** Σ a[i]·b[i] as a Column (registers the function on the column's
    * session at first use — call sites pass the owning session). */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(DotName, a, b)
  }
}
