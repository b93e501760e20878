package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val grid = (for { x <- 0L until 8L; y <- 0L until 8L }
    yield (x, y)).toDF("x", "y")

  test("order-3 curve is a bijection and consecutive keys are always adjacent cells") {
    val keyed = grid.select(col("x"), col("y"),
      Layout.hilbertKey(spark, col("x"), col("y"), order = 3).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(keyed.map(_._1).toSeq == (0L until 64L).toSeq) // bijective onto [0, 4^order)
    keyed.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)") // THE Hilbert property
    }
    // Z-order, by contrast, jumps between quadrants — the locality gap
    val z = grid.select(Layout.zkey(col("x"), col("y")).as("d"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).sortBy(_._1)
    val zAdjacent = z.sliding(2).forall { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(!zAdjacent)
  }

  test("out-of-range coordinates yield null, never a wrong key") {
    val d = Seq((8L, 0L), (0L, -1L), (7L, 7L)).toDF("x", "y")
      .select(Layout.hilbertKey(spark, col("x"), col("y"), order = 3).as("d"))
      .collect()
    assert(d(0).isNullAt(0) && d(1).isNullAt(0))
    assert(!d(2).isNullAt(0))
  }
}
