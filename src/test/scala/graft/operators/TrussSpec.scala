package graft.operators

import graft.SparkTestBase

class TrussSpec extends SparkTestBase {
  import spark.implicits._

  test("4-truss keeps K4, sheds a hanging triangle (cascade)") {
    // K4 {1,2,3,4}: every edge in 2 triangles — survives k=4 (support
    // >= 2). Triangle {4,5,6}: each edge in 1 triangle — dies round 1.
    // Edge 4–5 also touches nothing else → support collapses with it.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val r = Truss.peel(edges, k = 4).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(r.values.forall(_ == 2L), r.toString)
  }

  test("cascade: removing weak edges breaks triangles that then fail too") {
    // Two K4s sharing edge 3–4, plus a bridge triangle {4,7,8} whose
    // edges have support 1 at k=4: the bridge peels round 1; the K4s
    // keep every edge (shared edge 3–4 sits in 4 triangles).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (3L, 6L), (4L, 5L), (4L, 6L), (5L, 6L),
      (4L, 7L), (4L, 8L), (7L, 8L)).toDF("a", "b")
    val r = Truss.peel(edges, k = 4).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r.size == 11)
    assert(r((3L, 4L)) == 4L)
    assert(!r.contains((4L, 7L)) && !r.contains((7L, 8L)))
  }

  test("matches a brute-force fixed-round peel on a random graph") {
    val rnd = new scala.util.Random(11)
    val all = for { a <- 1L to 18L; b <- (a + 1) to 18L if rnd.nextDouble() < 0.3 } yield (a, b)
    val k = 4
    def bruteRound(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val s = es
      def adj(x: Long, y: Long) = s.contains((math.min(x, y), math.max(x, y)))
      val sup = es.map { case (a, b) =>
        (a, b) -> (1L to 18L).count(c => c != a && c != b && adj(a, c) && adj(b, c)).toLong
      }.toMap
      sup.filter(_._2 >= k - 2)
    }
    var cur = all.toSet
    var last = Map.empty[(Long, Long), Long]
    for (_ <- 1 to Truss.Rounds) { last = bruteRound(cur); cur = last.keySet }
    val r = Truss.peel(all.toDF("a", "b"), k = k).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r == last)
  }
}
