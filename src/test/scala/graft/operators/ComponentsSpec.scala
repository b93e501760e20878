package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Large-star/small-star connected components vs a reference union-find
  * on randomized graphs, plus shape edge cases (chains — the diameter
  * killer for plain propagation — cliques, loops, singletons). */
class ComponentsSpec extends SparkTestBase with TableDrivenPropertyChecks {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.labels(
      nodes.toDF("id"),
      if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      else edges.toDF("doc_a", "doc_b"),
      "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // normalize every root to the component MINIMUM id
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap { members =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("chain graph: one component labeled by its minimum") {
    val n = 200L // deep diameter — propagation would need ~200 rounds
    val nodes = (1L to n).toSeq
    val edges = (1L until n).map(i => (i, i + 1))
    val got = run(nodes, edges)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == nodes.toSet)
  }

  test("disjoint cliques + singletons keep separate labels") {
    val cliqueA = for (a <- 10L to 14L; b <- 10L to 14L if a < b) yield (a, b)
    val cliqueB = for (a <- 20L to 22L; b <- 20L to 22L if a < b) yield (a, b)
    val nodes = (10L to 14L) ++ (20L to 22L) ++ Seq(99L)
    val got = run(nodes, cliqueA ++ cliqueB)
    assert((10L to 14L).forall(got(_) == 10L))
    assert((20L to 22L).forall(got(_) == 20L))
    assert(got(99L) == 99L)
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val got = run(Seq(1L, 2L, 3L), Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 3L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge set: every node is its own component") {
    val got = run(Seq(5L, 6L), Seq.empty)
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("randomized graphs agree with union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val nodes = (1L to n.toLong).toSeq
      val edges = Seq.fill(n / 2)((1L + rnd.nextInt(n).toLong, 1L + rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(nodes, edges) == unionFind(nodes, edges), s"trial $trial")
    }
  }
}
