package graft.operators

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** The exact integer recurrence, replayed single-threaded. */
  private def reference(edges: Set[(Long, Long)], iters: Int,
      scale: Long = 1000000000L): Map[Long, Long] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val base = 15L * scale / 100
    var r = adj.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contribs = adj.toSeq.flatMap { case (src, dsts) =>
        val c = r(src) / dsts.size
        dsts.map(_ -> c)
      }.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = r.map { case (v, _) => v -> (base + 85L * contribs.getOrElse(v, 0L) / 100) }
    }
    r
  }

  private def run(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val df = Triangles.canonicalEdges(edges.toSeq.toDF("x", "y"), "x", "y")
    PageRank.ranks(df, iters).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a symmetric pair keeps the full scale mass exactly") {
    // deg 1 both sides: contribution = rank div 1, rank = 0.15s + 0.85s = s
    assert(run(Set((1L, 2L)), 3) === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("matches the single-threaded recurrence on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Set.fill(120) {
      val a = rnd.nextInt(25).toLong; val b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2)
    assert(run(edges, 3) === reference(edges, 3))
  }

  test("star graph: the hub outranks every leaf, leaves tie exactly") {
    val star = (2L to 40L).map(i => (1L, i)).toSet
    val ranks = run(star, 3)
    val leafRanks = (2L to 40L).map(ranks).toSet
    assert(leafRanks.size === 1, "leaves must tie bit-exactly")
    assert(ranks(1L) > leafRanks.head)
    assert(ranks === reference(star, 3))
  }

  test("result is partitioning-invariant (integer arithmetic leaks no sum order)") {
    val rnd = new scala.util.Random(5)
    val pairs = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val df1 = Triangles.canonicalEdges(pairs.toDF("x", "y"), "x", "y")
    val df8 = Triangles.canonicalEdges(pairs.toDF("x", "y").repartition(8), "x", "y")
    val a = PageRank.ranks(df1, 2).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = PageRank.ranks(df8, 2).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("zero iterations returns the uniform start vector") {
    assert(run(Set((1L, 2L), (2L, 3L)), 0) ===
      Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))
  }

  test("plan: equi-joins only — no cartesian/nested-loop node") {
    val df = Triangles.canonicalEdges(Seq((1L, 2L), (2L, 3L)).toDF("x", "y"), "x", "y")
    val plan = PageRank.ranks(df, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
