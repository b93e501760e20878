package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization encoding — the
  * cent_id of the codebook centroid minimizing
  * dist²(v, c) ≡ (c·c) − 2·(v·c), ties by smaller cent_id.
  *
  * `PqEncode(sub, books, cids)`: `sub` is the subvector
  * (array<float|double>), `books` the codebook as array<array<double>>
  * (normally a literal — the trained centroids inlined by the driver),
  * `cids` the parallel array<int> of centroid ids. The v·v term of the
  * true distance is constant across candidates and dropped — see
  * [[graft.pipeline.Ann.pqTopK]]; the oracle SQL drops it identically,
  * and all accumulations are left-associated doubles, so the argmin —
  * including IEEE ties — agrees bit-for-bit across engines.
  *
  * Why a native expression: the same argmin as
  * `array_min(array(struct(d2, cid), …))` over k literal candidates is a
  * k·subDim-term expression tree — at k=32 it overflows janino's 64 KB
  * method limit and drops the whole stage to interpreted eval. This is
  * one fused loop (interpreted AND generated), the [[DotProduct]] move
  * applied to the encode step.
  */
final case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def subElemDouble: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (first.dataType, second.dataType, third.dataType) match {
    case (ArrayType(FloatType | DoubleType, _),
          ArrayType(ArrayType(DoubleType, _), _),
          ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (a, b, c) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<float|double>, array<array<double>>, array<int>), " +
        s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
  }

  override protected def nullSafeEval(subAny: Any, booksAny: Any, cidsAny: Any): Any = {
    val sub = subAny.asInstanceOf[ArrayData]
    val books = booksAny.asInstanceOf[ArrayData]
    val cids = cidsAny.asInstanceOf[ArrayData]
    val d = sub.numElements()
    val k = books.numElements()
    if (k == 0 || cids.numElements() != k) return null
    val subD = subElemDouble
    var best = Double.PositiveInfinity
    var bestCid = Int.MaxValue
    var c = 0
    var found = false
    while (c < k) {
      val ce = books.getArray(c)
      if (ce.numElements() == d) {
        var cc = 0.0
        var vc = 0.0
        var i = 0
        while (i < d) {
          val e = ce.getDouble(i)
          val v = if (subD) sub.getDouble(i) else sub.getFloat(i).toDouble
          cc += e * e
          vc += v * e
          i += 1
        }
        val d2 = cc - 2.0 * vc
        val cid = cids.getInt(c)
        if (!found || d2 < best || (d2 == best && cid < bestCid)) {
          best = d2; bestCid = cid; found = true
        }
      }
      c += 1
    }
    if (!found) null else bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sub, books, cids) => {
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val ce = ctx.freshName("ce")
      val cc = ctx.freshName("cc")
      val vc = ctx.freshName("vc")
      val d2 = ctx.freshName("d2")
      val cid = ctx.freshName("cid")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val e = ctx.freshName("e")
      val subElem = if (subElemDouble) s"$sub.getDouble($i)" else s"((double) $sub.getFloat($i))"
      s"""
         |int $d = $sub.numElements();
         |int $k = $books.numElements();
         |if ($k == 0 || $cids.numElements() != $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestCid = Integer.MAX_VALUE;
         |  boolean $found = false;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $ce = $books.getArray($c);
         |    if ($ce.numElements() == $d) {
         |      double $cc = 0.0;
         |      double $vc = 0.0;
         |      for (int $i = 0; $i < $d; $i++) {
         |        double $e = $ce.getDouble($i);
         |        $cc += $e * $e;
         |        $vc += $subElem * $e;
         |      }
         |      double $d2 = $cc - 2.0 * $vc;
         |      int $cid = $cids.getInt($c);
         |      if (!$found || $d2 < $best || ($d2 == $best && $cid < $bestCid)) {
         |        $best = $d2; $bestCid = $cid; $found = true;
         |      }
         |    }
         |  }
         |  if (!$found) { ${ev.isNull} = true; } else { ${ev.value} = $bestCid; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  val Name = "graft_pq_encode"

  /** Canonical arity-checked builder (see [[Functions.dotBuilder]]). */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$Name expects 3 arguments, got ${exprs.length}")
    PqEncode(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(Name),
      new ExpressionInfo(classOf[PqEncode].getName, Name),
      builder)
}
