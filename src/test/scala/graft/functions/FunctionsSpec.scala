package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_dot: fused loop dot product; length mismatch is NULL, not truncation") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (2L, Array(1f, 2f), Array(1f, 2f, 3f))).toDF("id", "a", "b")
    val out = df.orderBy(col("id"))
      .select(Functions.dot(spark, col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0), "dimension drift must surface as null, not a truncated dot")
    // interpreted tier agrees with the generated code
    val at = ArrayType(FloatType, containsNull = false)
    assert(DotProduct(Literal.create(Array(1f, 2f, 3f), at),
      Literal.create(Array(4f, 5f, 6f), at)).eval() == 32.0)
    assert(DotProduct(Literal.create(Array(1f, 2f), at),
      Literal.create(Array(4f, 5f, 6f), at)).eval() == null)
  }
}
