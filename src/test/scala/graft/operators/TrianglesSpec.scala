package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def countOf(pairs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val edges = Triangles.canonicalEdges(pairs.toDF("x", "y"), "x", "y")
    val r = Triangles.count(edges).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("a single triangle, regardless of input orientation and duplicates") {
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L))) === (3L, 3L, 1L))
  }

  test("a path has no triangles; a square has none; a square with one diagonal has two") {
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === (4L, 3L, 0L))
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === (4L, 4L, 0L))
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))) === (4L, 5L, 2L))
  }

  test("K5 has C(5,3) = 10 triangles; loops are dropped") {
    val k5 = for (i <- 1L to 5L; j <- 1L to 5L if i != j) yield (i, j)
    assert(countOf(k5 ++ Seq((3L, 3L))) === (5L, 10L, 10L))
  }

  test("hub star: high-degree center, zero triangles (the skew case the orientation bounds)") {
    val star = (2L to 500L).map(i => (1L, i))
    assert(countOf(star) === (500L, 499L, 0L))
  }

  test("matches a brute-force count on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val es = pairs.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2))
    val brute = nodes.toSeq.sorted.combinations(3).count {
      case Seq(x, y, z) => es((x, y)) && es((y, z)) && es((x, z))
    }
    assert(countOf(pairs) === (nodes.size.toLong, es.size.toLong, brute.toLong))
  }

  test("plan: equi-joins only — no cartesian/nested-loop node") {
    val edges = Triangles.canonicalEdges(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("x", "y"), "x", "y")
    val plan = Triangles.count(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only BroadcastNestedLoopJoin allowed is the final 1-row × 1-row
    // stat assembly, never over edge data
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl <= 2, s"unexpected nested-loop joins:\n$plan")
  }
}
