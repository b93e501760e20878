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

  test("graft_pq_encode: argmin by (dist2, cent_id); mismatched rows skipped; empty book NULL") {
    val at = ArrayType(FloatType, containsNull = false)
    val bt = ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    val it = ArrayType(IntegerType, containsNull = false)
    def enc(sub: Array[Float], books: Array[Array[Double]], cids: Array[Int]): Any =
      PqEncode(Literal.create(sub, at), Literal.create(books, bt),
        Literal.create(cids, it)).eval()
    // centroid (1,0) is nearest to (0.9, 0.1)
    assert(enc(Array(0.9f, 0.1f),
      Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(5.0, 5.0)), Array(7, 3, 1)) == 7)
    // exact tie between two identical centroids → smaller cent_id wins
    assert(enc(Array(1f, 1f),
      Array(Array(2.0, 2.0), Array(2.0, 2.0)), Array(9, 4)) == 4)
    // a wrong-dimension codebook row is skipped, not silently scored
    assert(enc(Array(1f, 1f),
      Array(Array(9.0, 9.0, 9.0), Array(1.0, 1.0)), Array(1, 2)) == 2)
    // empty codebook / all rows mismatched → NULL
    assert(enc(Array(1f, 1f), Array.empty[Array[Double]], Array.empty[Int]) == null)
    assert(enc(Array(1f, 1f), Array(Array(1.0)), Array(1)) == null)
    // the generated code agrees with the interpreted tier on a frame
    val df = Seq((1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 2.0f))).toDF("id", "sub")
    import org.apache.spark.sql.functions.typedlit
    val out = df.orderBy(col("id")).select(Functions.pqEncode(spark, col("sub"),
      typedlit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))), typedlit(Seq(7, 3))).as("c")).collect()
    assert(out(0).getInt(0) == 7 && out(1).getInt(0) == 3)
  }
}
