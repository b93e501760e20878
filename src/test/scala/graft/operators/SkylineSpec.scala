package graft.operators

import graft.SparkTestBase

/** Distributed sort-sweep skyline vs brute-force dominance on
  * randomized inputs, plus tie/duplicate edge cases. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    rows.filterNot { case (_, c, g) =>
      rows.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.toSet

  private def run(rows: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    Skyline.front2d(rows.toDF("id", "cost", "gain"), "cost", "gain")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet

  test("simple frontier: dominated points drop, frontier survives") {
    val rows = Seq(
      (1L, 1.0, 5), // frontier (cheapest)
      (2L, 2.0, 9), // frontier (more gain for more cost)
      (3L, 3.0, 9), // dominated by 2 (same gain, pricier)
      (4L, 2.5, 4), // dominated by 1 and 2
      (5L, 4.0, 12)) // frontier
    assert(run(rows) == brute(rows))
    assert(run(rows).map(_._1) == Set(1L, 2L, 5L))
  }

  test("duplicate frontier points all survive (neither dominates the other)") {
    val rows = Seq((1L, 1.0, 5), (2L, 1.0, 5), (3L, 2.0, 4))
    assert(run(rows) == brute(rows))
    assert(run(rows).map(_._1) == Set(1L, 2L))
  }

  test("equal-gain tie loses to the strictly cheaper holder") {
    val rows = Seq((1L, 1.0, 5), (2L, 2.0, 5))
    assert(run(rows).map(_._1) == Set(1L))
  }

  test("single row and all-identical inputs") {
    assert(run(Seq((1L, 3.0, 3))).map(_._1) == Set(1L))
    val same = Seq((1L, 3.0, 3), (2L, 3.0, 3), (3L, 3.0, 3))
    assert(run(same).map(_._1) == Set(1L, 2L, 3L))
  }

  test("randomized inputs agree with brute-force dominance") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      val rows = (1L to n.toLong).map(i =>
        (i, (rnd.nextInt(40) / 4.0), rnd.nextInt(30)))
      assert(run(rows) == brute(rows), s"trial $trial")
    }
  }
}
