package graft.operators

import graft.SparkTestBase

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** (key, id, lo, hi) rows → set of (key, id_a, id_b, overlap). */
  private def overlaps(ivs: Seq[(Long, Long, Long, Long)], w: Long): Set[(Long, Long, Long, Long)] =
    IntervalJoin.selfOverlaps(ivs.toDF("k", "id", "lo", "hi"), Seq("k"), "id", "lo", "hi", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def brute(ivs: Seq[(Long, Long, Long, Long)]): Set[(Long, Long, Long, Long)] =
    (for {
      a <- ivs; b <- ivs
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2, math.min(a._4, b._4) - math.max(a._3, b._3))).toSet

  test("overlap, containment, touching, and disjoint — exact measures") {
    val ivs = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L),   // plain overlap, 5
      (1L, 3L, 6L, 8L),                       // contained in both
      (1L, 4L, 20L, 25L),                     // touches id 2 at a point: 0
      (1L, 5L, 100L, 110L))                   // disjoint
    val got = overlaps(ivs, 7L)
    assert(got === brute(ivs))
    assert(got.contains((1L, 1L, 2L, 5L)))
    assert(got.contains((1L, 2L, 4L, 0L)))
    assert(!got.exists(p => p._2 == 5L || p._3 == 5L))
  }

  test("keys partition the space: same spans under different keys never pair") {
    val ivs = Seq((1L, 1L, 0L, 10L), (2L, 2L, 0L, 10L))
    assert(overlaps(ivs, 4L) === Set.empty)
  }

  test("a pair spanning many shared bins is emitted exactly once (count, not set)") {
    val ivs = Seq((1L, 1L, 0L, 100L), (1L, 2L, 0L, 100L))
    val df = IntervalJoin.selfOverlaps(ivs.toDF("k", "id", "lo", "hi"), Seq("k"), "id", "lo", "hi", 5L)
    assert(df.count() === 1L)
    assert(overlaps(ivs, 5L) === Set((1L, 1L, 2L, 100L)))
  }

  test("matches brute force on random intervals across bin widths, incl. negative coords") {
    val rnd = new scala.util.Random(13)
    val ivs = Seq.tabulate(80) { i =>
      val lo = rnd.nextInt(200).toLong - 100
      (rnd.nextInt(3).toLong, i.toLong, lo, lo + rnd.nextInt(30))
    }
    for (w <- Seq(1L, 7L, 64L, 1000L))
      assert(overlaps(ivs, w) === brute(ivs), s"binWidth=$w")
  }

  test("plan: candidates come from the (key, bin) equi-join — no cartesian") {
    val df = IntervalJoin.selfOverlaps(
      Seq((1L, 1L, 0L, 5L)).toDF("k", "id", "lo", "hi"), Seq("k"), "id", "lo", "hi", 4L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("maxPerBin: an adversarial hot (key, bin) bucket is dropped whole, bounded output") {
    // hot key: 500 identical intervals in one bin -> 124,750 pairs uncapped;
    // cold keys: normal pairs that MUST survive the cap untouched
    val hot = Seq.tabulate(500)(i => (9L, i.toLong, 0L, 3L))
    val cold = Seq((1L, 1000L, 0L, 10L), (1L, 1001L, 5L, 15L), (2L, 1002L, 0L, 2L))
    val df = (hot ++ cold).toDF("k", "id", "lo", "hi")
    val capped = IntervalJoin.selfOverlaps(df, Seq("k"), "id", "lo", "hi",
      binWidth = 16L, maxPerBin = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the hot bucket vanished whole; the cold pair is exact
    assert(capped === Set((1L, 1000L, 1001L, 5L)))
    // and an uncapped run on the cold keys alone agrees (cap is a no-op there)
    val uncapped = IntervalJoin.selfOverlaps(cold.toDF("k", "id", "lo", "hi"),
      Seq("k"), "id", "lo", "hi", 16L, maxPerBin = 100L).count()
    assert(uncapped === 1L)
  }
}
