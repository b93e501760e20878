package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical first step of text curation (the same logical
  * token arrives as precomposed `é` or as `e` + combining acute
  * depending on the crawler/source encoder; un-normalized corpora
  * silently split token statistics, dedup keys, and vocabulary entries
  * across the variants).
  *
  * Spark has no normalization built-in, and a Scala UDF would pay
  * serialization plus a codegen break per row; this is the
  * custom-Expression tier — interpreted and generated paths both run
  * the JDK's NFC quick-check first (`Normalizer.isNormalized`, a scan
  * without allocation for the overwhelmingly-common already-normalized
  * case) and only materialize a new string on actual recomposition.
  * Stays inside whole-stage codegen.
  *
  * Cross-engine contract: java.text.Normalizer and DuckDB's
  * `nfc_normalize` both implement Unicode canonical composition (UAX
  * #15); the oracle compares full normalized text.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${NfcNormalize.Name} expects a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val Name = "graft_nfc"

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$Name expects 1 argument, got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  /** Shared by the interpreted tier and the generated code (the codegen
    * calls this method directly — one virtual call per row, the loop
    * body inside stays a JDK intrinsic path). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
